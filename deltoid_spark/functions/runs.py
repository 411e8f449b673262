"""Scalable run-length profiling (segmented scan + boundary stitch).

The RLE codec signal (run coalescing per
/root/reference/deltoid/src/vec.rs:61-64) needs run lengths over a
*global* order — but `SUM(chg) OVER (ORDER BY ...)` with no PARTITION
BY moves the whole table to one task.  This operator computes the same
answer as a segmented scan:

1. bucket rows by contiguous key ranges (``floor(key / bucket_size)``),
2. per-bucket window (parallel): local change flags + local prefix sums,
3. a *tiny* pass over one summary row per bucket stitches boundaries:
   a bucket's first row continues the previous bucket's last run iff
   the value matches across the boundary; bucket run-id offsets are a
   prefix sum over the summaries,
4. broadcast the summaries back and assemble global run ids.

The only non-parallel window runs over the bucket summaries — one row
per bucket, so at 10^12 input rows with 10^6-row buckets that is 10^6
rows (and the same trick applies recursively if even that is too big).
Everything else is bucket-partitioned and map-side combinable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

DEFAULT_BUCKET = 8192


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
    b = df.select(
        F.col(key_col).alias("k"),
        F.col(seq_col).alias("s"),
        F.col(value_col).alias("value"),
        F.floor(F.col(key_col) / bucket_size).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy("k", "s")
    rows = (
        b.select(
            "bucket",
            "value",
            "k",
            "s",
            # change flag vs previous row IN THE SAME BUCKET; the bucket's
            # first row is resolved by the boundary stitch below
            F.when(F.row_number().over(w) == 1, F.lit(0))
            .when(~F.lag("value").over(w).eqNullSafe(F.col("value")), F.lit(1))
            .otherwise(F.lit(0))
            .alias("chg"),
            F.struct("k", "s").alias("ord"),
        )
        .withColumn(
            "local_cum",
            F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .drop("k", "s")
    )

    summaries = rows.groupBy("bucket").agg(
        F.min_by("value", "ord").alias("first_val"),
        F.max_by("value", "ord").alias("last_val"),
        F.sum("chg").alias("n_chg"),
    )
    # one row per bucket: tiny by design (constant partition key keeps
    # Spark from warning about an undefined window partition — the
    # single partition here is over summaries, not data)
    ws = Window.partitionBy(F.lit(0)).orderBy("bucket")
    stitched = (
        summaries.withColumn("prev_last", F.lag("last_val").over(ws))
        .withColumn(
            "first_chg",
            F.when(
                F.lag("bucket").over(ws).isNull()
                | ~F.col("prev_last").eqNullSafe(F.col("first_val")),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "offset",
            F.coalesce(
                F.sum(F.col("n_chg") + F.col("first_chg")).over(
                    ws.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("bucket", "first_chg", "offset")
    )

    runs = (
        rows.join(F.broadcast(stitched), "bucket")
        .select(
            "value",
            (F.col("offset") + F.col("first_chg") + F.col("local_cum")).alias("run_id"),
        )
        .groupBy("value", "run_id")
        .agg(F.count("*").alias("run_len"))
    )
    return (
        runs.groupBy("value")
        .agg(
            F.count("*").alias("n_runs"),
            F.sum("run_len").alias("total_rows"),
            F.max("run_len").alias("max_run"),
        )
        .orderBy("value")
    )
