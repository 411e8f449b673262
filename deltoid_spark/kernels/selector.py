"""Per-column codec auto-selector.

The reference dispatches statically by type (``<T as Core>::Delta``,
/root/reference/deltoid/src/core.rs:9-13); our dynamic analog samples
column statistics (distinct ratio, mean run length, avg length, byte
entropy, hex-ness — north_rule "codec auto-selection") to shortlist
candidates, then trial-encodes a deterministic sample and picks the
smallest output.  Trial-encode on a sample keeps the choice honest
(estimated-size formulas drift; measured bytes don't) while bounding
cost: the sample is capped, the full encode runs once with the winner.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

from . import api, strings

SAMPLE_ROWS = 1024


def _contiguous_sample(series: pd.Series, sample_rows: int) -> pd.Series:
    """~sample_rows drawn as 4 CONTIGUOUS chunks spread over the column.

    A strided sample (every n/1024-th row) destroys exactly the
    structure the run codecs exploit — at real block sizes it made RLE
    look like PLAIN on a column of 4-long runs and hid every shared
    prefix from FRONT, so the trial systematically mis-picked for
    clustered columns (measured: path blocks 2x oversized).  Contiguous
    chunks keep runs and neighbor prefixes intact; four of them spread
    chunk-boundary artifacts (3 artificial run breaks) and still span
    the block for cardinality/entropy."""
    n = len(series)
    if n <= sample_rows:
        return series
    k = 4
    chunk = sample_rows // k
    starts = [round(i * (n - chunk) / (k - 1)) for i in range(k)]
    return pd.concat(
        [series.iloc[s : s + chunk] for s in starts], ignore_index=True
    )


def column_stats(series: pd.Series, sample_rows: int = SAMPLE_ROWS) -> dict:
    n = len(series)
    s = _contiguous_sample(series, sample_rows)
    vals = s.dropna()
    nn = len(vals)
    if nn == 0:
        return {"n": n, "distinct_ratio": 0.0, "mean_run": float(n or 1),
                "avg_len": 0.0, "entropy": 0.0, "hex": False, "null_ratio": 1.0}
    # np.unique, not pandas nunique: pandas' C-string hashing truncates
    # values at embedded NUL bytes and under-counts distincts
    distinct = len(np.unique(vals.to_numpy(dtype=object)))
    arr = s.fillna("\x00NULL").to_numpy(dtype=object)
    changes = 1 + int(np.sum(arr[1:] != arr[:-1])) if len(arr) > 1 else 1
    data = "".join(vals.iloc[:256].tolist()).encode("utf-8")[:65536]
    if data:
        counts = np.array(list(Counter(data).values()), dtype=np.float64)
        p = counts / counts.sum()
        entropy = float(-(p * np.log2(p)).sum())
    else:
        entropy = 0.0
    va = vals.to_numpy(dtype=object)
    asc = float(np.mean(va[1:] >= va[:-1])) if len(va) > 1 else 0.0
    return {
        "n": n,
        "distinct_ratio": distinct / nn,
        "mean_run": len(arr) / changes,
        "avg_len": float(vals.str.len().mean()),
        "entropy": entropy,
        "hex": strings.hex_eligible(vals),
        "null_ratio": 1.0 - nn / max(1, len(s)),
        # fraction of consecutive non-null pairs in sorted order: the
        # shared-prefix signal FRONT exploits (clustered layouts sort
        # by (repo, path, commit), so dimension columns read ~1.0)
        "asc_frac": asc,
    }


def shortlist(stats: dict, series: pd.Series | None = None) -> list[str]:
    cands = ["plain"]
    if stats["hex"]:
        # the stats sample said hex — but encode_hex requires EVERY row
        # to be canonical lowercase even-length hex (bytes.fromhex also
        # accepts uppercase and would silently lowercase on decode), so
        # validate the full column before hex may be chosen
        if series is None or strings.hex_eligible(series.dropna()):
            cands.append("hex")
    if stats["distinct_ratio"] <= 0.5:
        cands.append("dict")
    if stats["mean_run"] >= 1.5:
        cands.append("rle")
    # FRONT pays where consecutive values share byte prefixes: runs
    # (prefix == whole value) or sorted/clustered neighbors.  Hex ids
    # share no meaningful prefixes (uniform), so skip the trial there.
    if (
        stats["avg_len"] >= 6
        and not stats["hex"]
        and (stats["mean_run"] >= 1.2 or stats.get("asc_frac", 0.0) >= 0.6)
    ):
        cands.append("front")
    # FSST pays on short-to-medium redundant strings with sub-maximal
    # entropy; on massively repetitive columns (distinct_ratio <= 0.05)
    # DICT/RLE always win the trial (measured round 4: fixture
    # path/repo/lang blocks — dict/rle 22-27k vs fsst 38k on path), so
    # skip the trial-encode there
    if (
        0 < stats["avg_len"] <= 512
        and stats["entropy"] < 6.5
        and not stats["hex"]
        and stats["distinct_ratio"] > 0.05
    ):
        cands.append("fsst")
    return cands


def select_codec(series: pd.Series, sample_rows: int = SAMPLE_ROWS) -> tuple[str, dict]:
    winner, stats, _buf = select_and_encode(series, sample_rows, want_buffer=False)
    return winner, stats


def select_and_encode(
    series: pd.Series, sample_rows: int = SAMPLE_ROWS, want_buffer: bool = True
) -> tuple[str, dict, bytes | None]:
    """Pick the min-size codec by trial-encoding deterministic samples;
    optionally return the winner's encoded block.

    Block size splits into a fixed part (symbol/dictionary tables, zstd
    headers) and a per-row part; which dominates differs per codec
    (FSST is nearly all table, PLAIN nearly all rows).  Trial-encode at
    two sample sizes, fit ``size(n) = fixed + per_row * n``, and rank
    codecs by the extrapolated full-block size.  For small blocks the
    trials ARE full encodes, so the winning buffer is returned directly
    (no re-encode in the caller).
    """
    stats = column_stats(series, sample_rows)
    cands = shortlist(stats, series)
    n = len(series)
    if n <= sample_rows:
        sizes: dict[str, float] = {}
        bufs: dict[str, bytes] = {}
        for codec in cands:
            try:
                bufs[codec] = api.encode_block(series.reset_index(drop=True), codec)
                sizes[codec] = float(len(bufs[codec]))
            except Exception:
                continue
        winner = min(sizes, key=lambda c: (sizes[c], c))
        stats["trial_sizes"] = sizes
        return winner, stats, (bufs[winner] if want_buffer else None)

    # contiguous chunks, not a stride: the trial must see the same run /
    # shared-prefix structure the full encode will (see _contiguous_sample)
    full = _contiguous_sample(series, sample_rows).reset_index(drop=True)
    half = full.iloc[: max(1, len(full) // 2)]
    est: dict[str, float] = {}
    for codec in cands:
        try:
            s_full = len(api.encode_block(full, codec))
            s_half = len(api.encode_block(half.reset_index(drop=True), codec))
        except Exception:
            continue
        per_row = max(0.0, (s_full - s_half) / max(1, len(full) - len(half)))
        fixed = max(16.0, s_full - per_row * len(full))
        est[codec] = fixed + per_row * n
    # the linear fit can't rank the sub-linear codecs (dict/rle/front
    # are all ~O(runs + distinct) with zstd's nonlinearity on top; their
    # sample sizes barely grow between the half and full trials, so the
    # extrapolation is mostly noise).  Finalists — the leader, plus any
    # sub-linear codec estimating within 2.5x and the next linear codec
    # within 1.35x — get a REAL full encode and measured bytes decide.
    # The extra encodes are metadata-cheap (code streams, not data) and
    # the winning buffer is returned either way (no re-encode later).
    # NOTE (ADVICE r06): a want_buffer=False fast path returning the
    # extrapolation leader without finalist encodes was tried and
    # KILLED: the fit cannot rank the sub-linear codecs (comment
    # above), and the pick then misses the 15% near-optimality
    # contract (test_selector_near_optimal).  Stats-only callers pay
    # the finalist encodes because the measured bytes ARE the picker.
    order = sorted(est, key=lambda c: (est[c], c))  # deterministic
    stats["trial_sizes"] = est
    lead = max(est[order[0]], 1.0)
    cheap = {"dict", "rle", "front"}
    finalists = [order[0]] + [
        c for c in order[1:]
        if (c in cheap and est[c] <= 2.5 * lead)
        or (c not in cheap and est[c] <= 1.35 * lead)
    ][:2]
    bufs = {c: api.encode_block(series, c) for c in finalists}
    winner = min(bufs, key=lambda c: (len(bufs[c]), c))
    return winner, stats, (bufs[winner] if want_buffer else None)
