"""Frame-of-reference + bit-packing for int64 columns.

Reference basis: deltoid's primitive scalar deltas (full-replacement
``XDelta(Option<T>)``, /root/reference/deltoid/src/core.rs:41-122) are
replaced here by FoR + width-minimal packing over int-like derived
columns (commit ranks, offsets, run lengths), per the VLDB 2024
delta-vs-FoR comparison in PAPERS.md.

Two layers:

* ``pack_ints`` / ``unpack_ints`` — unframed helpers used *inside*
  other codecs (offsets, run lengths, edit indices).  Meta travels in
  the host codec's meta dict.
* ``encode_for`` / ``decode_for`` — a framed standalone block for
  int64 columns with optional nulls.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import blocks


# ------------------------------------------------------------- unframed ----


def pack_ints(values: np.ndarray) -> tuple[dict, bytes]:
    """FoR + bit-pack an int64 array. Returns (meta, payload)."""
    v = np.asarray(values, dtype=np.int64)
    n = len(v)
    if n == 0:
        return {"n": 0, "ref": 0, "w": 0}, b""
    ref = int(v.min())
    deltas = (v - ref).astype(np.uint64)
    w = blocks.bit_width(int(deltas.max()))
    return {"n": n, "ref": ref, "w": w}, blocks.bitpack(deltas, w)


def unpack_ints(meta: dict, payload: bytes) -> np.ndarray:
    n, ref, w = meta["n"], meta["ref"], meta["w"]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    deltas = blocks.bitunpack(payload, n, w)
    return (deltas.astype(np.int64)) + np.int64(ref)


def pack_ints_z(values: np.ndarray, min_bytes: int = 256) -> tuple[dict, bytes]:
    """pack_ints + zstd when it pays (repetitive code/run sequences
    compress well below their bit-packed entropy bound)."""
    meta, pay = pack_ints(values)
    if len(pay) > min_bytes:
        comp = blocks.compress(pay)
        if len(comp) < len(pay):
            return {**meta, "z": len(pay)}, comp
    return meta, pay


def unpack_ints_z(meta: dict, payload: bytes) -> np.ndarray:
    if "z" in meta:
        payload = blocks.decompress(payload, meta["z"])
    return unpack_ints(meta, payload)


# --------------------------------------------------------------- framed ----


def encode_for(series: pd.Series) -> bytes:
    """Encode an int64 column (nullable) as a framed FoR block."""
    mask = series.isna().to_numpy()
    vals = series.fillna(0).to_numpy(dtype=np.int64)
    meta, payload = pack_ints(vals)
    meta["has_null"] = bool(mask.any())
    if meta["has_null"]:
        mb = blocks.pack_mask(mask)
        meta["mask_len"] = len(mb)
        payload = mb + payload
    return blocks.frame("for", meta, payload)


def decode_for(meta: dict, payload: bytes) -> pd.Series:
    n = meta["n"]
    if meta.get("has_null"):
        ml = meta["mask_len"]
        mask = blocks.unpack_mask(payload[:ml], n)
        vals = unpack_ints(meta, payload[ml:])
        out = pd.Series(vals, dtype="Int64")
        out[mask] = pd.NA
        return out
    return pd.Series(unpack_ints(meta, payload), dtype="int64")
