"""Scalable run-length profiling (segmented scan + boundary stitch).

The RLE codec signal (run coalescing per
/root/reference/deltoid/src/vec.rs:61-64) needs run lengths over a
*global* order — but `SUM(chg) OVER (ORDER BY ...)` with no PARTITION
BY moves the whole table to one task.  This operator computes the same
answer in ONE pass over the data:

1. bucket rows by contiguous key ranges (``floor(key / bucket_size)``),
2. per-bucket window (parallel): local change prefix-sums identify the
   run segment each row belongs to,
3. ``groupBy(bucket, segment)`` collapses the data to one row per run
   segment (cached: it is runs-sized, far smaller than the input, and
   feeds two branches),
4. interior segments are already complete runs; the ≤2 boundary
   segments per bucket flow into a tiny sequential stitch (a run
   crossing k buckets = tail segment + whole single-run buckets + head
   segment) running as one task over one-row-per-bucket-edge data,
5. union + final per-value aggregate.

The only non-parallel step touches the boundary-segment set (≤ 2 rows
per bucket); with 10^6-row buckets a 10^12-row table yields ≤ 2*10^6
stitch rows, and the same stitch applies recursively if even that is
too big.  No join back onto the data, no global row numbering.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.storagelevel import StorageLevel

DEFAULT_BUCKET = 8192


def _stitch_kernel(segs: pd.DataFrame) -> pd.DataFrame:
    """Merge boundary segments across bucket edges (single tiny task).

    Walks buckets in ascending order carrying the run that touches the
    right edge of the previous bucket; a bucket whose head segment has
    the same value extends it, anything else closes it.
    """
    segs = segs.sort_values(["bucket", "min_rn"], kind="mergesort")
    out_vals: list = []
    out_lens: list = []
    open_val, open_len = None, 0

    def emit(v, ln):
        out_vals.append(v)
        out_lens.append(ln)

    for _bucket, sub in segs.groupby("bucket", sort=True):
        rows = sub.to_dict("records")
        head, tail = rows[0], rows[-1]
        if open_len:
            same = (head["value"] == open_val) or (
                pd.isna(head["value"]) and pd.isna(open_val)
            )
            if same:
                head["run_len"] += open_len
            else:
                emit(open_val, open_len)
            open_val, open_len = None, 0
        if len(rows) == 1:  # single segment spans the whole bucket
            open_val, open_len = head["value"], head["run_len"]
        else:
            emit(head["value"], head["run_len"])
            open_val, open_len = tail["value"], tail["run_len"]
    if open_len:
        emit(open_val, open_len)
    return pd.DataFrame({"value": out_vals, "run_len": out_lens})


def run_length_profile(
    df: DataFrame,
    key_col: str,
    seq_col: str,
    value_col: str,
    bucket_size: int = DEFAULT_BUCKET,
) -> DataFrame:
    """Per-value run statistics over rows ordered by (key, seq).

    Output: (value, n_runs, total_rows, max_run) ordered by value —
    identical to the global-window formulation for any bucket_size.
    """
    value_ddl = dict(df.dtypes)[value_col]
    b = df.select(
        F.col(key_col).alias("k"),
        F.col(seq_col).alias("s"),
        F.col(value_col).alias("value"),
        F.floor(F.col(key_col) / bucket_size).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy("k", "s")
    wfull = Window.partitionBy("bucket").orderBy("k", "s").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # ONE window pass over the data tags each row with its in-bucket
    # position, whether it STARTS a run, and the bucket size (a
    # full-frame COUNT in the SAME exchange+sort — this replaces the
    # separate full-scan aggregate + join the round-3 version paid).
    # The buffered frame is bounded by bucket_size DISTINCT KEYS times
    # the max rows per key — floor(key/bucket_size) caps keys, not
    # rows — so the bound is a constant only when rows-per-key is
    # bounded (true for the versioned-table shape this serves: rows
    # per key = version count; q03's lineitem has <= 7 per order).
    # For unbounded rows-per-key inputs, shrink bucket_size or revert
    # to the separate map-side COUNT aggregate.  Everything after the
    # filter below is runs-sized (one row per value change), so no
    # full-data aggregation ever runs.
    rows = b.select(
        "bucket",
        "value",
        F.row_number().over(w).alias("rn"),
        (
            (F.row_number().over(w) == 1)
            | ~F.lag("value").over(w).eqNullSafe(F.col("value"))
        ).alias("starts"),
        F.count("*").over(wfull).alias("bsize"),
    )
    starts = rows.filter("starts")
    ws = Window.partitionBy("bucket").orderBy("rn")
    segs = (
        starts.select(
            "bucket",
            "value",
            "bsize",
            F.col("rn").alias("min_rn"),
            (
                F.coalesce(F.lead("rn").over(ws), F.col("bsize") + 1) - F.col("rn")
            ).alias("run_len"),
        )
        .withColumn("max_rn", F.col("min_rn") + F.col("run_len") - 1)
        # runs-sized and consumed by two branches below — cache instead
        # of recomputing the scan+window
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    flagged = segs.withColumn(
        "is_boundary", (F.col("min_rn") == 1) | (F.col("max_rn") == F.col("bsize"))
    )
    interior = flagged.filter(~F.col("is_boundary")).select("value", "run_len")
    boundary = flagged.filter(F.col("is_boundary")).select(
        "bucket", "min_rn", "value", "run_len"
    )
    stitched = boundary.groupBy(F.pmod(F.col("bucket"), F.lit(1)).alias("g")).applyInPandas(
        lambda pdf: _stitch_kernel(pdf),
        f"value {value_ddl}, run_len long",
    )
    return (
        interior.unionByName(stitched)
        .groupBy("value")
        .agg(
            F.count("*").alias("n_runs"),
            F.sum("run_len").alias("total_rows"),
            F.max("run_len").alias("max_run"),
        )
        .orderBy("value")
    )
