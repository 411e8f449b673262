"""FP codec: fixed-width IEEE float lanes + zstd, null-mask aware.

Reference basis: deltoid's primitive macro covers f32/f64 with
full-replacement deltas (/root/reference/deltoid/src/core.rs:102-122);
the columnar analog is PLAIN over fixed-width lanes.  Nulls are carried
in the packed validity mask.  Note the pandas/Arrow boundary conflates
NaN and null for float columns — both round-trip as null (documented
engine-wide; the mask still makes the encoding itself exact for
whatever the boundary delivered).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import blocks


def encode_fp(series: pd.Series, width: int = 8) -> bytes:
    """Encode a float column; width 4 (float32) or 8 (float64)."""
    mask = series.isna().to_numpy()
    dt = np.float64 if width == 8 else np.float32
    vals = series.to_numpy(dtype=dt, na_value=0.0, copy=True)
    vals[mask] = 0.0  # deterministic bytes under any null payload
    raw = vals.tobytes()
    comp = blocks.compress(raw)
    meta = {"n": len(series), "w": width, "raw": len(raw)}
    meta["has_null"] = bool(mask.any())
    mb = b""
    if meta["has_null"]:
        mb = blocks.pack_mask(mask)
        meta["mask_len"] = len(mb)
    return blocks.frame("fp", meta, mb + comp)


def decode_fp(meta: dict, payload: bytes) -> pd.Series:
    n = meta["n"]
    mask = None
    if meta.get("has_null"):
        ml = meta["mask_len"]
        mask = blocks.unpack_mask(payload[:ml], n)
        payload = payload[ml:]
    raw = blocks.decompress(payload, meta["raw"])
    dt = np.float64 if meta["w"] == 8 else np.float32
    vals = np.frombuffer(raw, dtype=dt).copy()
    out = pd.Series(vals, dtype="Float64" if meta["w"] == 8 else "Float32")
    if mask is not None:
        out[mask] = pd.NA
    return out
