"""Structured Streaming surface.

The reference's snapshot layer is batch-incremental (a head plus an
append-only delta chain, /root/reference/deltoid/src/snapshot/delta.rs:81-125)
— the streaming analog is an encode *ingest*: a file-source stream of
new code-table rows where every micro-batch runs the J1 encode kernel
and appends blocks + manifest rows tagged with the batch id.  Decode
reads across all batches.  ``availableNow`` triggers give the
batch-incremental semantics the north_rule asks for ("resumable"), with
Spark's checkpoint dir providing exactly-once file-source progress.

Also provides a watermarked tumbling-window aggregation over an event
stream (late-data-tolerant counts) — the standard streaming operator
set, even though the reference itself has no streaming story.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .jobs.partitioning import assign_partitions
from .jobs.pipeline import BLOCK_SCHEMA, ROW_SCHEMA, _decode_partition, make_encode_kernel

INPUT_SCHEMA = ROW_SCHEMA  # the canonical 5-column schema


def stream_encode(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    target_rows: int = 20_000,
    keyframe_interval: int = 16,
    available_now: bool = True,
):
    """Start (and with available_now=True, drain) an encode ingest stream.

    Each micro-batch is partitioned and encoded exactly like a batch J1
    run; blocks land under ``out_dir/blocks`` with a ``batch_id``
    column, so partition identity is (batch_id, part_id) and re-started
    streams never collide with prior batches.
    """
    kernel = make_encode_kernel(keyframe_interval)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        dfp, _n = assign_partitions(batch_df, target_rows)
        blocks = (
            dfp.groupBy("part_id")
            .applyInPandas(kernel, BLOCK_SCHEMA)
            .withColumn("batch_id", F.lit(batch_id))
        )
        blocks.write.mode("append").parquet(os.path.join(out_dir, "blocks"))

    stream = (
        spark.readStream.schema(INPUT_SCHEMA)
        .parquet(input_dir)
        .writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
    )
    if available_now:
        q = stream.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return stream.start()


def decode_stream_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """Reconstruct all rows ingested so far (across micro-batches)."""
    blocks = spark.read.parquet(os.path.join(out_dir, "blocks"))
    return blocks.groupBy("batch_id", "part_id").applyInPandas(
        _decode_partition, ROW_SCHEMA
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type.

    Works on both a static events DataFrame and a stream (the plan is
    identical; on a stream the watermark bounds late-data state).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )
