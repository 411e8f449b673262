"""FSST-style symbol-table string compression (VLDB 2020, see PAPERS.md).

Engine-new kernel: the space-efficient string delta the reference never
implemented (the ``// TODO: Improve delta space efficiency`` at
/root/reference/deltoid/src/string.rs:37).  A per-block table of up to
255 byte symbols (length 1-8) replaces frequent substrings with 1-byte
codes; bytes outside the table are escaped as ``0xFF <literal>``.

Train: substring frequency counting over a bounded sample (gain =
(len-1) * freq), multi-byte symbols first, then frequent single bytes
to keep escapes rare.  Encode: one capturing-split regex pass over the
multi-byte symbols (longest-first alternation = greedy longest match),
single-byte symbols via ``bytes.translate`` — no per-match Python loop
body.  Decode: fully vectorized variable-length gather (numpy),
escapes resolved via a split-walk.

Measured on a path-like 7 MB column block (this host, round 3):
encode 8.7 MB/s (round 2 finditer loop: 5.9), decode 7.2 MB/s (was
4.6), identical output bytes.  FSST is only shortlisted for short-
string columns (selector: avg_len <= 512) whose blocks are ~hundreds
of KB, so the kernel costs ~25 ms/block where it wins at all;
PLAIN+zstd takes the long tail.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

from . import blocks
from .intcodec import pack_ints, unpack_ints
from .strings import _apply_mask, _mask_meta, utf8_view

ESCAPE = 0xFF
MAX_SYMBOLS = 255  # codes 0..254; 255 reserved for escape
MAX_LEN = 8
_SAMPLE_BYTES = 1 << 14


def train(data: bytes, max_symbols: int = MAX_SYMBOLS) -> list[bytes]:
    """Pick up to ``max_symbols`` symbols from a bounded sample."""
    sample = data[:_SAMPLE_BYTES]
    counts: Counter[bytes] = Counter()
    n = len(sample)
    for ln in range(2, MAX_LEN + 1):
        step = 1 if ln <= 3 else ln - 2  # thin out long-substring scan
        for i in range(0, n - ln + 1, step):
            counts[sample[i : i + ln]] += step  # scale to unbias thinning
    # gain = bytes saved; require a symbol to actually pay for itself
    multi = [
        (s, (len(s) - 1) * c)
        for s, c in counts.items()
        if (len(s) - 1) * c >= len(s) + 2
    ]
    multi.sort(key=lambda x: (-x[1], x[0]))  # deterministic tie-break
    symbols: list[bytes] = []
    taken: set[bytes] = set()
    for s, _ in multi:
        if len(symbols) >= max_symbols - 64:  # reserve slots for single bytes
            break
        if s not in taken:
            symbols.append(s)
            taken.add(s)
    singles = Counter(sample)
    for b, _ in sorted(singles.items(), key=lambda x: (-x[1], x[0])):
        if len(symbols) >= max_symbols:
            break
        sb = bytes([b])
        if sb not in taken:
            symbols.append(sb)
            taken.add(sb)
    return symbols


def _escape_gap(gap: bytes) -> bytes:
    """Interleave the escape byte before every literal (vectorized)."""
    if not gap:
        return b""
    arr = np.frombuffer(gap, dtype=np.uint8)
    out = np.empty(2 * len(arr), dtype=np.uint8)
    out[0::2] = ESCAPE
    out[1::2] = arr
    return out.tobytes()


def _single_luts(symbols: list[bytes]) -> tuple[bytes, np.ndarray, np.ndarray]:
    """(translate table, code array, known mask) for 1-byte symbols."""
    lut = np.zeros(256, dtype=np.uint8)
    known = np.zeros(256, dtype=bool)
    for i, s in enumerate(symbols):
        if len(s) == 1:
            lut[s[0]] = i
            known[s[0]] = True
    return lut.tobytes(), lut, known


def _encode_gap_escaped(gap: bytes, lut: np.ndarray, known: np.ndarray) -> bytes:
    """Gap encode when some bytes are outside the single-symbol table:
    1 output byte for known singles, 2 (escape + literal) otherwise —
    fully vectorized offset construction."""
    arr = np.frombuffer(gap, dtype=np.uint8)
    k = known[arr]
    starts = np.cumsum(np.where(k, 1, 2)) - np.where(k, 1, 2)
    out = np.empty(starts[-1] + (1 if k[-1] else 2), dtype=np.uint8)
    out[starts[k]] = lut[arr[k]]
    nk = ~k
    out[starts[nk]] = ESCAPE
    out[starts[nk] + 1] = arr[nk]
    return out.tobytes()


def compress_bytes(data: bytes, symbols: list[bytes]) -> bytes:
    """Greedy encode without a per-match Python loop body.

    One capturing ``re.split`` over the MULTI-byte symbols yields
    [gap, match, gap, match, ...] in a single C pass; matched symbols
    map to code bytes via a dict getitem map, and the gaps — runs of
    bytes between multi-byte matches — encode through
    ``bytes.translate`` (one C call per gap) when every gap byte is a
    known single-byte symbol (the trained common case), falling back to
    a vectorized numpy escape interleave otherwise.  Single-byte
    symbols never enter the regex at all, which is the throughput win:
    the round-2 version alternated all 255 symbols and paid the match
    loop per input byte.
    """
    if not symbols:
        return _escape_gap(data)
    multi = [i for i in range(len(symbols)) if len(symbols[i]) > 1]
    tbl, lut, known = _single_luts(symbols)
    if not multi:
        if bool(known.all()):
            return data.translate(tbl)
        return _encode_gap_escaped(data, lut, known) if data else b""
    ordered = sorted(multi, key=lambda i: (-len(symbols[i]), symbols[i]))
    pattern = re.compile(
        b"(" + b"|".join(re.escape(symbols[i]) for i in ordered) + b")"
    )
    code_of = {symbols[i]: bytes([i]) for i in multi}
    parts = pattern.split(data)  # even slots: gaps, odd slots: matches
    parts[1::2] = map(code_of.__getitem__, parts[1::2])
    gaps_all_known = bool(known[np.frombuffer(b"".join(parts[0::2]), dtype=np.uint8)].all())
    if gaps_all_known:
        parts[0::2] = (g.translate(tbl) for g in parts[0::2])
    else:
        parts[0::2] = (
            _encode_gap_escaped(g, lut, known) if g else b"" for g in parts[0::2]
        )
    return b"".join(parts)


def _map_codes(seg: bytes, sym_concat: np.ndarray, sym_off: np.ndarray,
               sym_len: np.ndarray) -> bytes:
    """Vectorized variable-length gather: code bytes -> symbol bytes."""
    if not seg:
        return b""
    codes = np.frombuffer(seg, dtype=np.uint8)
    lens = sym_len[codes]
    starts = sym_off[codes]
    total = int(lens.sum())
    # int32 index math: the gather is memory-bandwidth-bound and block
    # payloads are far below 2^31 bytes — half the index traffic
    idx = np.repeat(starts - (np.cumsum(lens, dtype=np.int32) - lens), lens) + np.arange(
        total, dtype=np.int32
    )
    return sym_concat[idx].tobytes()


def decompress_bytes(data: bytes, symbols: list[bytes]) -> bytes:
    concat = b"".join(symbols)
    sym_concat = np.frombuffer(concat, dtype=np.uint8)
    k = len(symbols)
    # 256-entry lookup tables so any code byte indexes safely
    lut_len = np.zeros(256, dtype=np.int32)
    lut_off = np.zeros(256, dtype=np.int32)
    if k:
        lens = np.array([len(s) for s in symbols], dtype=np.int32)
        lut_len[:k] = lens
        offs = np.zeros(k, dtype=np.int32)
        if k > 1:
            offs[1:] = np.cumsum(lens[:-1])
        lut_off[:k] = offs

    segs = data.split(bytes([ESCAPE]))
    out = [_map_codes(segs[0], sym_concat, lut_off, lut_len)]
    i = 1
    while i < len(segs):
        seg = segs[i]
        if seg:
            out.append(seg[:1])
            out.append(_map_codes(seg[1:], sym_concat, lut_off, lut_len))
            i += 1
        else:
            # empty segment: the escaped literal was 0xFF itself
            out.append(bytes([ESCAPE]))
            if i + 1 < len(segs):
                out.append(_map_codes(segs[i + 1], sym_concat, lut_off, lut_len))
            i += 2
    return b"".join(out)


# --------------------------------------------------------- framed codec ----
#
# The whole block's utf-8 concatenation is FSST-compressed in ONE pass
# (symbols may span string boundaries — harmless, decode decompresses
# the whole stream first, then slices by the stored original byte
# lengths).  Optionally zstd on top of the code stream, the FSST+LZ4
# pairing from the paper.


def encode_fsst(series: pd.Series, post_zstd: bool = True) -> bytes:
    mask = series.isna().to_numpy()
    lengths, data = utf8_view(series)
    symbols = train(data)
    codes = compress_bytes(data, symbols)
    payload_codes = blocks.compress(codes) if post_zstd else codes
    table = b"".join(symbols)
    tmeta, tlens = pack_ints(np.array([len(s) for s in symbols], dtype=np.int64))
    lmeta, lpay = pack_ints(lengths)
    meta = {
        "n": len(series), "nsym": len(symbols), "tbl_len": len(table),
        "tlens": tmeta, "tlplen": len(tlens),
        "lens": lmeta, "lplen": len(lpay),
        "zstd": bool(post_zstd), "codes_raw": len(codes),
    }
    mb = _mask_meta(meta, mask)
    return blocks.frame("fsst", meta, mb + tlens + table + lpay + payload_codes)


def decode_fsst(meta: dict, payload: bytes) -> pd.Series:
    n = meta["n"]
    mask, payload = _apply_mask(meta, payload, n)
    p = 0
    tlplen = meta["tlplen"]
    tlens = unpack_ints(meta["tlens"], payload[p : p + tlplen]); p += tlplen
    table = payload[p : p + meta["tbl_len"]]; p += meta["tbl_len"]
    symbols, q = [], 0
    for ln in tlens:
        symbols.append(table[q : q + int(ln)]); q += int(ln)
    lplen = meta["lplen"]
    lengths = unpack_ints(meta["lens"], payload[p : p + lplen]); p += lplen
    codes = payload[p:]
    if meta["zstd"]:
        codes = blocks.decompress(codes, meta["codes_raw"])
    data = decompress_bytes(codes, symbols)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offs[1:])
    arr = pa.Array.from_buffers(
        pa.large_utf8(), n, [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(data)]
    )
    out = arr.to_pandas().astype(object)
    if mask is not None:
        out[mask] = None
    return out if n else pd.Series([], dtype=object)
