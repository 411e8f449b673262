"""Raw codec-bitstream probes: H.264 Annex-B / NAL / SPS and AAC ADTS.

These push the engine's multimodal boundary one layer below the
container walk (functions/multimodal.py probe_mp4 / probe_mp3): real
H.264 and AAC *bitstream* parsing — start-code scan, emulation-
prevention removal, Exp-Golomb header decode, ADTS frame walk — so a
100 TB corpus pass can route, size, and audit video/audio payloads
(profile/level/resolution/frame mix, sample rate/channels/duration)
without any external codec library.  What stays behind the declared
``_decode_external`` seam (multimodal.py) is pixel/sample
reconstruction only: inter prediction + CABAC/CAVLC residual decode
(H.264) and filterbank synthesis (AAC), which production pipelines
delegate to hardware/libav decoders — see the seam note there.

Reference basis: the reference engine treats opaque media params as
full-replacement scalar fields (/root/reference/deltoid/src/core.rs
primitives); the probe surface here is engine-original, derived from
the public ITU-T H.264 (05/2003) syntax tables (7.3.2.1 seq_parameter
_set_rbsp, 7.3.3 slice_header, 9.1 Exp-Golomb) and the ISO/IEC 13818-7
ADTS header layout.

Everything is deterministic and self-synthesizing: ``build_*`` writers
emit spec-layout bitstreams (the same ones a camera or encoder would)
whose parameters derive from the media id, so DuckDB oracles recompute
every probed value closed-form without touching bytes.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# ----------------------------------------------------------- bit I/O ----


class _BitReader:
    """MSB-first bit reader over an RBSP (emulation bytes removed)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.data[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        """Exp-Golomb unsigned: count leading zeros, read that many
        more bits, value = 2^z - 1 + suffix (H.264 9.1)."""
        z = 0
        while self.u(1) == 0:
            z += 1
            if z > 32:
                raise ValueError("malformed Exp-Golomb code")
        return (1 << z) - 1 + (self.u(z) if z else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 == 1 else -(k // 2)


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def u(self, v: int, n: int) -> "_BitWriter":
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)
        return self

    def ue(self, v: int) -> "_BitWriter":
        k = v + 1
        n = k.bit_length()
        return self.u(0, n - 1).u(k, n)

    def se(self, v: int) -> "_BitWriter":
        return self.ue(2 * v - 1 if v > 0 else -2 * v)

    def rbsp(self) -> bytes:
        """Close with the RBSP stop bit + byte alignment, then insert
        emulation-prevention bytes (00 00 -> 00 00 03 before 00/01/02/03)."""
        bits = self.bits + [1]
        while len(bits) % 8:
            bits.append(0)
        raw = bytes(
            int("".join(map(str, bits[i : i + 8])), 2) for i in range(0, len(bits), 8)
        )
        out = bytearray()
        zeros = 0
        for b in raw:
            if zeros >= 2 and b <= 3:
                out.append(3)
                zeros = 0
            out.append(b)
            zeros = zeros + 1 if b == 0 else 0
        return bytes(out)


def _unescape_rbsp(data: bytes) -> bytes:
    """Remove emulation-prevention bytes: 00 00 03 xx -> 00 00 xx."""
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(data):
        b = data[i]
        if zeros >= 2 and b == 3 and i + 1 < len(data) and data[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


# ------------------------------------------------------ H.264 Annex B ----

_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}


def split_nals(stream: bytes) -> list[bytes]:
    """Split an Annex-B byte stream on 00 00 01 / 00 00 00 01 start
    codes; returns the NAL units (header byte + EBSP payload)."""
    nals = []
    i = 0
    n = len(stream)
    starts = []
    while i + 2 < n:
        if stream[i] == 0 and stream[i + 1] == 0 and stream[i + 2] == 1:
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    if not starts:
        raise ValueError("no Annex-B start codes")
    for j, s in enumerate(starts):
        end = (starts[j + 1] - 3) if j + 1 < len(starts) else n
        while end > s and stream[end - 1] == 0:  # trailing zero padding
            end -= 1
        nals.append(stream[s:end])
    return nals


def parse_sps(nal: bytes) -> dict:
    """Parse seq_parameter_set_rbsp (H.264 7.3.2.1) far enough to
    recover profile, level, and the cropped frame dimensions."""
    if (nal[0] & 0x1F) != 7:
        raise ValueError("not an SPS NAL")
    r = _BitReader(_unescape_rbsp(nal[1:]))
    profile = r.u(8)
    r.u(8)  # constraint flags + reserved
    level = r.u(8)
    r.ue()  # sps_id
    chroma_format_idc = 1
    if profile in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.u(1)  # separate_colour_plane_flag
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            raise ValueError("scaling matrices unsupported in probe")
    r.ue()  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    w_mbs = r.ue() + 1
    h_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    crop = [0, 0, 0, 0]
    if r.u(1):  # frame_cropping_flag
        crop = [r.ue(), r.ue(), r.ue(), r.ue()]
    # 4:2:0 crop units: 2 horizontally, 2 * (2 - frame_mbs_only) vertically
    cw = 1 if chroma_format_idc == 3 else 2
    ch = (1 if chroma_format_idc in (2, 3) else 2) * (2 - frame_mbs_only)
    width = 16 * w_mbs - cw * (crop[0] + crop[1])
    height = 16 * h_units * (2 - frame_mbs_only) - ch * (crop[2] + crop[3])
    return {"profile": profile, "level": level, "width": width, "height": height}


def probe_h264(stream: bytes) -> dict:
    """Walk every NAL in an Annex-B stream: SPS dimensions + the
    IDR / non-IDR / SPS / PPS mix (the audit stats a corpus pass
    records per video payload)."""
    counts = {"idr": 0, "nonidr": 0, "sps": 0, "pps": 0, "other": 0}
    info: dict = {}
    for nal in split_nals(stream):
        t = nal[0] & 0x1F
        if t == 7:
            counts["sps"] += 1
            if not info:
                info = parse_sps(nal)
        elif t == 8:
            counts["pps"] += 1
        elif t == 5:
            counts["idr"] += 1
        elif t == 1:
            counts["nonidr"] += 1
        else:
            counts["other"] += 1
    if not info:
        raise ValueError("stream has no SPS")
    return {**info, **counts, "n_nals": sum(counts.values())}


def build_sps(width: int, height: int, profile: int = 66, level: int = 30) -> bytes:
    """Emit a spec-layout baseline SPS NAL for 16-aligned frame sizes
    with optional right/bottom cropping to hit exact dimensions."""
    w = _BitWriter()
    w.u(profile, 8).u(0, 8).u(level, 8).ue(0)  # ids + flags
    if profile in _HIGH_PROFILES:  # high-profile chroma/bit-depth block
        w.ue(1)  # chroma_format_idc = 4:2:0
        w.ue(0).ue(0)  # bit_depth_luma/chroma_minus8
        w.u(0, 1)  # qpprime_y_zero_transform_bypass_flag
        w.u(0, 1)  # seq_scaling_matrix_present_flag
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type = 2 (no further POC syntax)
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps_in_frame_num_value_allowed_flag
    w_mbs = (width + 15) // 16
    h_units = (height + 15) // 16
    w.ue(w_mbs - 1).ue(h_units - 1)
    w.u(1, 1)  # frame_mbs_only_flag
    w.u(1, 1)  # direct_8x8_inference_flag
    crop_r = (16 * w_mbs - width) // 2
    crop_b = (16 * h_units - height) // 2
    if crop_r or crop_b:
        w.u(1, 1).ue(0).ue(crop_r).ue(0).ue(crop_b)
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui_parameters_present_flag
    return bytes([0x67]) + w.rbsp()  # nal_ref_idc=3, type=7


def build_pps() -> bytes:
    w = _BitWriter()
    w.ue(0).ue(0)  # pps_id, sps_id
    w.u(0, 1)  # entropy_coding_mode_flag (CAVLC)
    w.u(0, 1)  # bottom_field_pic_order_in_frame_present_flag
    w.ue(0)  # num_slice_groups_minus1
    w.ue(0).ue(0)  # num_ref_idx_l0/l1_default_active_minus1
    w.u(0, 1).u(0, 2)  # weighted_pred_flag, weighted_bipred_idc
    w.se(0).se(0).se(0)  # pic_init_qp/qs, chroma_qp_index_offset
    w.u(0, 3)  # deblocking/constrained-intra/redundant-pic flags
    return bytes([0x68]) + w.rbsp()


def build_slice_nal(idr: bool, frame_num: int = 0, payload_bytes: int = 16) -> bytes:
    """A slice NAL with a spec-layout header (7.3.3) and deterministic
    filler macroblock data (the probe parses headers, not residuals)."""
    w = _BitWriter()
    w.ue(0)  # first_mb_in_slice
    w.ue(7 if idr else 5)  # slice_type: I / P (the all-slices variants)
    w.ue(0)  # pps_id
    w.u(frame_num & 0xF, 4)  # frame_num (log2_max_frame_num = 4)
    if idr:
        w.ue(frame_num * 2)  # idr_pic_id
    head = w.rbsp()
    filler = bytes((7 * (frame_num + 1) + i) % 251 + 4 for i in range(payload_bytes))
    return bytes([0x65 if idr else 0x41]) + head + filler


_START = b"\x00\x00\x00\x01"


def build_h264_stream(
    width: int, height: int, n_idr: int, n_p: int, profile: int = 66
) -> bytes:
    """SPS + PPS + an IDR/P GOP pattern — the Annex-B layout every
    camera/encoder emits."""
    nals = [build_sps(width, height, profile=profile), build_pps()]
    frame = 0
    for _ in range(n_idr):
        nals.append(build_slice_nal(True, frame))
        frame += 1
        for _ in range(n_p):
            nals.append(build_slice_nal(False, frame))
            frame += 1
    return b"".join(_START + n for n in nals)


# ----------------------------------------------------------- AAC ADTS ----

_ADTS_RATES = (96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
               16000, 12000, 11025, 8000)


def build_adts_stream(n_frames: int, rate_idx: int = 4, channels: int = 2) -> bytes:
    """ADTS frame sequence (ISO/IEC 13818-7): 7-byte headers framing
    deterministic filler AAC payloads."""
    out = bytearray()
    for i in range(n_frames):
        payload = bytes((11 * (i + 1) + j) % 256 for j in range(64 + (i % 32)))
        flen = 7 + len(payload)
        h = bytearray(7)
        h[0] = 0xFF
        h[1] = 0xF1  # MPEG-4, layer 0, no CRC
        h[2] = (1 << 6) | (rate_idx << 2) | ((channels >> 2) & 1)  # AAC-LC
        h[3] = ((channels & 3) << 6) | ((flen >> 11) & 3)
        h[4] = (flen >> 3) & 0xFF
        h[5] = ((flen & 7) << 5) | 0x1F
        h[6] = 0xFC
        out += h + payload
    return bytes(out)


def probe_adts(stream: bytes) -> dict:
    """Walk ADTS headers: frame count, sample rate, channels, exact
    duration (1024 samples per AAC frame)."""
    i = 0
    n = 0
    rate = channels = None
    while i + 7 <= len(stream):
        if stream[i] != 0xFF or (stream[i + 1] & 0xF6) != 0xF0:
            raise ValueError(f"bad ADTS sync at byte {i}")
        rate_idx = (stream[i + 2] >> 2) & 0xF
        if rate_idx >= len(_ADTS_RATES):
            raise ValueError("reserved sampling_frequency_index")
        r = _ADTS_RATES[rate_idx]
        c = ((stream[i + 2] & 1) << 2) | (stream[i + 3] >> 6)
        if rate is None:
            rate, channels = r, c
        elif (r, c) != (rate, channels):
            raise ValueError("mid-stream parameter change")
        flen = ((stream[i + 3] & 3) << 11) | (stream[i + 4] << 3) | (stream[i + 5] >> 5)
        if flen < 7:
            raise ValueError("ADTS frame_length below header size")
        i += flen
        n += 1
    if i != len(stream) or n == 0:
        raise ValueError("truncated ADTS stream")
    return {
        "n_frames": n, "sample_rate": rate, "channels": channels,
        "duration_ms": n * 1024 * 1000 // rate,
    }


# ------------------------------------------------------- Spark surface ----


def synthesize_bitstream_media(spark, n: int = 48) -> DataFrame:
    """Deterministic REAL H.264 Annex-B and AAC ADTS payloads whose
    probed values are closed-form in the media id (SQL-oracle-able)."""
    from .multimodal import MEDIA_SCHEMA

    rows = []
    for i in range(n):
        if i % 2 == 0:
            w = 320 + 16 * (i % 5)
            h = 240 + 16 * (i % 3)
            n_idr, n_p = 1 + i % 3, 2 + i % 4
            profile = 100 if i % 4 == 0 else 66
            payload = build_h264_stream(w, h, n_idr, n_p, profile=profile)
            rows.append((i, "video", bytearray(payload), w, h, 0))
        else:
            frames = 20 + i % 30
            rate_idx = (4, 7, 11)[i % 3]
            channels = 1 + i % 2
            payload = build_adts_stream(frames, rate_idx, channels)
            rows.append((i, "audio", bytearray(payload), 0, 0, 0))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def bitstream_probe(media: DataFrame) -> DataFrame:
    """Arrow-batched probe over raw codec bitstreams: H.264 NAL walk /
    SPS decode for video payloads, ADTS walk for audio.  Same
    route-and-filter contract as media_probe — a malformed payload
    yields a null-metric row, never a task failure."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(payload)
                try:
                    if p[:3] == b"\x00\x00\x00" or p[:3] == b"\x00\x00\x01":
                        d = probe_h264(p)
                        rows.append((mid, "h264", d["profile"], d["level"],
                                     d["width"], d["height"], d["n_nals"],
                                     d["idr"], d["nonidr"], None, None))
                    elif p[:1] == b"\xff":
                        d = probe_adts(p)
                        rows.append((mid, "aac", None, None, None, None,
                                     d["n_frames"], None, None,
                                     d["sample_rate"], d["duration_ms"]))
                    else:
                        rows.append((mid, "unknown", None, None, None, None,
                                     None, None, None, None, None))
                except (ValueError, IndexError, struct.error):
                    rows.append((mid, "unknown", None, None, None, None,
                                 None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "codec", "profile", "level", "width",
                         "height", "n_units", "n_idr", "n_nonidr",
                         "sample_rate", "duration_ms"],
            )

    return media.mapInPandas(
        kernel,
        "media_id long, codec string, profile int, level int, width int, "
        "height int, n_units long, n_idr long, n_nonidr long, "
        "sample_rate int, duration_ms long",
    )
