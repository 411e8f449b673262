"""H.264 Annex-B / SPS and AAC ADTS bitstream probes: spec-layout
writers, Exp-Golomb round-trips, emulation-prevention edges, corrupt
rejection, and the Spark probe vs the closed-form law."""

import pytest

from deltoid_spark.functions import bitstreams as B


def test_exp_golomb_roundtrip():
    w = B._BitWriter()
    vals = [0, 1, 2, 3, 7, 8, 254, 255, 256, 65534, 10**6]
    svals = [0, 1, -1, 2, -2, 127, -127, 4096, -4096]
    for v in vals:
        w.ue(v)
    for v in svals:
        w.se(v)
    r = B._BitReader(B._unescape_rbsp(w.rbsp()))
    assert [r.ue() for _ in vals] == vals
    assert [r.se() for _ in svals] == svals


def test_emulation_prevention_roundtrip():
    """Long zero runs in the RBSP force 00 00 03 insertion; the
    unescape must recover the exact pre-escape bytes."""
    w = B._BitWriter()
    for _ in range(6):
        w.u(0, 16)  # two zero bytes ...
        w.u(1, 8)  # ... then 0x01: a fake start code without escaping
    esc = w.rbsp()
    assert b"\x00\x00\x03" in esc  # escaping actually happened
    assert b"\x00\x00\x01" not in esc  # and no fake start code survives
    r = B._BitReader(B._unescape_rbsp(esc))
    for _ in range(6):
        assert r.u(16) == 0
        assert r.u(8) == 1


@pytest.mark.parametrize("wh", [(320, 240), (1920, 1080), (176, 144), (322, 242)])
@pytest.mark.parametrize("profile", [66, 100])
def test_sps_dimensions_roundtrip(wh, profile):
    """build_sps emits spec-layout SPS (incl. the high-profile chroma
    block and cropping for non-16-aligned sizes); parse_sps recovers
    the exact dimensions."""
    w, h = wh
    sps = B.build_sps(w, h, profile=profile)
    d = B.parse_sps(sps)
    assert (d["width"], d["height"], d["profile"]) == (w, h, profile)


def test_h264_stream_probe():
    s = B.build_h264_stream(336, 256, n_idr=2, n_p=3)
    d = B.probe_h264(s)
    assert d["width"] == 336 and d["height"] == 256
    assert d["idr"] == 2 and d["nonidr"] == 6
    assert d["sps"] == 1 and d["pps"] == 1 and d["n_nals"] == 10


def test_h264_corrupt_rejected():
    with pytest.raises(ValueError):
        B.probe_h264(b"\x12\x34\x56\x78" * 8)  # no start codes
    with pytest.raises(ValueError):
        B.probe_h264(b"\x00\x00\x01" + bytes([0x41, 0x80]))  # slice, no SPS
    with pytest.raises(ValueError):
        B.parse_sps(bytes([0x41, 0x80]))  # wrong NAL type


def test_adts_probe_and_rejection():
    s = B.build_adts_stream(25, rate_idx=7, channels=1)
    d = B.probe_adts(s)
    assert d == {
        "n_frames": 25, "sample_rate": 22050, "channels": 1,
        "duration_ms": 25 * 1024 * 1000 // 22050,
    }
    with pytest.raises(ValueError):
        B.probe_adts(s[:-3])  # truncated final frame
    with pytest.raises(ValueError):
        B.probe_adts(b"\x12" + s)  # broken sync
    bad = bytearray(s)
    bad[2] = (0xD << 2)  # reserved sampling_frequency_index
    with pytest.raises(ValueError):
        B.probe_adts(bytes(bad))


def test_bitstream_probe_spark(spark):
    """End-to-end mapInPandas probe: every closed-form field matches,
    and a malformed payload degrades to an 'unknown' row."""
    got = {
        r["media_id"]: r
        for r in B.bitstream_probe(B.synthesize_bitstream_media(spark, n=12)).collect()
    }
    for i in range(12):
        r = got[i]
        if i % 2 == 0:
            assert r["codec"] == "h264"
            assert r["width"] == 320 + 16 * (i % 5)
            assert r["height"] == 240 + 16 * (i % 3)
            assert r["profile"] == (100 if i % 4 == 0 else 66)
            assert r["n_idr"] == 1 + i % 3
            assert r["n_nonidr"] == (1 + i % 3) * (2 + i % 4)
        else:
            f = 20 + i % 30
            rate = (44100, 22050, 8000)[i % 3]
            assert r["codec"] == "aac"
            assert r["n_units"] == f
            assert r["sample_rate"] == rate
            assert r["duration_ms"] == f * 1024 * 1000 // rate

    broken = spark.createDataFrame(
        [(99, "video", bytearray(b"\x00\x00\x01\x41\x00"))],
        "media_id long, kind string, payload binary",
    )
    rows = B.bitstream_probe(broken).collect()
    assert rows[0]["codec"] == "unknown" and rows[0]["width"] is None
