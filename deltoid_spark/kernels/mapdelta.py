"""MAPDELTA codec: keyed Add/Edit/Remove deltas for map-typed columns.

This is the reference's ``HashMap::delta`` / ``apply`` pair
(/root/reference/deltoid/src/collections/hashmap.rs:57-85) realized as
a columnar kernel over chains: within each (key...) group, version 0
(and every K-th version, and any null transition) stores the full map
as puts-into-empty; every other version stores only the keys that were
added/changed (put) or removed (del) relative to the previous version.
Keys are sorted before storage — the BTreeMap determinism requirement
(btreemap.rs:56-84) — so re-encoding identical input is byte-identical.

ARRAY codec: array<string> columns store FoR-packed lengths + the
flattened element stream through PLAIN(+zstd); null list vs empty list
is exact via the validity mask.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import blocks
from .intcodec import pack_ints, pack_ints_z, unpack_ints, unpack_ints_z
from .strings import decode_plain, encode_plain

DEFAULT_KEYFRAME_INTERVAL = 32


def _as_dict(v) -> dict | None:
    """Normalize a cell to dict (Arrow map columns may arrive as a list
    of (k, v) tuples; None/NaN stays None)."""
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return None
    if isinstance(v, dict):
        return v
    return dict(v)


def encode_mapdelta(
    series: pd.Series,
    group_sizes: np.ndarray,
    keyframe_interval: int = DEFAULT_KEYFRAME_INTERVAL,
    level: int | None = None,
) -> bytes:
    n = len(series)
    assert int(np.sum(group_sizes)) == n, "group sizes must cover all rows"
    vals = series.to_numpy(dtype=object)

    is_key = np.zeros(n, dtype=bool)
    is_null = np.zeros(n, dtype=bool)
    put_counts: list[int] = []
    del_counts: list[int] = []
    put_keys: list[str] = []
    put_vals: list = []
    del_keys: list[str] = []

    row = 0
    for gsize in group_sizes:
        prev: dict | None = None
        for v in range(int(gsize)):
            i = row + v
            cur = _as_dict(vals[i])
            if cur is None:
                is_null[i] = True
                is_key[i] = True  # null is an explicit keyframe state
                put_counts.append(0)
                del_counts.append(0)
                prev = None
                continue
            force_key = v % keyframe_interval == 0 or prev is None
            if force_key:
                is_key[i] = True
                ks = sorted(cur)
                put_counts.append(len(ks))
                del_counts.append(0)
                put_keys.extend(ks)
                put_vals.extend(cur[k] for k in ks)
            else:
                puts = sorted(
                    k for k in cur if k not in prev or prev[k] != cur[k]
                )
                dels = sorted(k for k in prev if k not in cur)
                put_counts.append(len(puts))
                del_counts.append(len(dels))
                put_keys.extend(puts)
                put_vals.extend(cur[k] for k in puts)
                del_keys.extend(dels)
            prev = cur
        row += int(gsize)

    gmeta, gpay = pack_ints(np.asarray(group_sizes, dtype=np.int64))
    key_bits = blocks.pack_mask(is_key)
    null_bits = blocks.pack_mask(is_null)
    pmeta, ppay = pack_ints_z(np.array(put_counts, dtype=np.int64))
    dmeta, dpay = pack_ints_z(np.array(del_counts, dtype=np.int64))
    pk_block = encode_plain(pd.Series(put_keys, dtype=object), level)
    pv_block = encode_plain(pd.Series(put_vals, dtype=object), level)
    dk_block = encode_plain(pd.Series(del_keys, dtype=object), level)
    meta = {
        "n": n,
        "groups": gmeta, "gplen": len(gpay),
        "kb_len": len(key_bits), "nb_len": len(null_bits),
        "pc": pmeta, "pclen": len(ppay),
        "dc": dmeta, "dclen": len(dpay),
        "pk_len": len(pk_block), "pv_len": len(pv_block),
    }
    payload = b"".join(
        (gpay, key_bits, null_bits, ppay, dpay, pk_block, pv_block, dk_block)
    )
    return blocks.frame("mapdelta", meta, payload)


def decode_mapdelta(meta: dict, payload: bytes) -> pd.Series:
    n = meta["n"]
    p = 0
    group_sizes = unpack_ints(meta["groups"], payload[p : p + meta["gplen"]]); p += meta["gplen"]
    is_key = blocks.unpack_mask(payload[p : p + meta["kb_len"]], n); p += meta["kb_len"]
    is_null = blocks.unpack_mask(payload[p : p + meta["nb_len"]], n); p += meta["nb_len"]
    put_counts = unpack_ints_z(meta["pc"], payload[p : p + meta["pclen"]]); p += meta["pclen"]
    del_counts = unpack_ints_z(meta["dc"], payload[p : p + meta["dclen"]]); p += meta["dclen"]
    _, m1, p1 = blocks.unframe(payload[p : p + meta["pk_len"]]); p += meta["pk_len"]
    put_keys = decode_plain(m1, p1).tolist()
    _, m2, p2 = blocks.unframe(payload[p : p + meta["pv_len"]]); p += meta["pv_len"]
    put_vals = decode_plain(m2, p2).tolist()
    _, m3, p3 = blocks.unframe(payload[p:])
    del_keys = decode_plain(m3, p3).tolist()

    out = np.empty(n, dtype=object)
    pi = di = 0
    row = 0
    for gsize in group_sizes:
        prev: dict | None = None
        for v in range(int(gsize)):
            i = row + v
            npk, ndk = int(put_counts[i]), int(del_counts[i])
            if is_null[i]:
                out[i] = None
                prev = None
                pi += npk
                di += ndk
                continue
            cur = {} if is_key[i] else dict(prev)
            for k in del_keys[di : di + ndk]:
                cur.pop(k, None)
            di += ndk
            for k, val in zip(put_keys[pi : pi + npk], put_vals[pi : pi + npk]):
                cur[k] = val
            pi += npk
            out[i] = cur
            prev = cur
        row += int(gsize)
    return pd.Series(out, dtype=object)


# ------------------------------------------------------ array<string> ----


def encode_strlist(series: pd.Series, level: int | None = None) -> bytes:
    """array<string> column: FoR-packed lengths + flattened elements."""
    mask = series.isna().to_numpy()
    vals = series.to_numpy(dtype=object)
    lengths = np.array(
        [0 if mask[i] else len(vals[i]) for i in range(len(vals))], dtype=np.int64
    )
    flat: list = []
    for i, v in enumerate(vals):
        if not mask[i]:
            flat.extend(v)
    lmeta, lpay = pack_ints_z(lengths)
    elems = encode_plain(pd.Series(flat, dtype=object), level)
    meta = {"n": len(series), "lens": lmeta, "lplen": len(lpay)}
    meta["has_null"] = bool(mask.any())
    mb = b""
    if meta["has_null"]:
        mb = blocks.pack_mask(mask)
        meta["mask_len"] = len(mb)
    return blocks.frame("strlist", meta, mb + lpay + elems)


def decode_strlist(meta: dict, payload: bytes) -> pd.Series:
    n = meta["n"]
    mask = None
    if meta.get("has_null"):
        ml = meta["mask_len"]
        mask = blocks.unpack_mask(payload[:ml], n)
        payload = payload[ml:]
    lengths = unpack_ints_z(meta["lens"], payload[: meta["lplen"]])
    _, emeta, epay = blocks.unframe(payload[meta["lplen"] :])
    flat = decode_plain(emeta, epay).to_numpy(dtype=object)
    bounds = np.cumsum(lengths)[:-1] if n else np.zeros(0, dtype=np.int64)
    pieces = np.split(flat, bounds)
    out = np.empty(n, dtype=object)
    for i in range(n):
        out[i] = None if (mask is not None and mask[i]) else list(pieces[i])
    return pd.Series(out, dtype=object)
