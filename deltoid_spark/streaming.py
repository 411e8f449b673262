"""Structured Streaming surface.

The reference's snapshot layer is batch-incremental (a head plus an
append-only delta chain, /root/reference/deltoid/src/snapshot/delta.rs:81-125)
— the streaming analog is an encode *ingest*: a file-source stream of
new code-table rows where batch 0 runs the full J1 encode and every
later micro-batch runs the incremental append path, EXTENDING existing
(repo, path) chains past their stored tails instead of restarting
keyframes (delta.rs:108-125 ``push_snapshot``).  Output is the standard
blocks/manifest layout, so ``jobs.decode`` reads across all batches and
compaction/resume work unchanged.  ``availableNow`` triggers give the
batch-incremental semantics the north_rule asks for ("resumable"), with
Spark's checkpoint dir providing exactly-once file-source progress.

Also provides a watermarked tumbling-window aggregation over an event
stream (late-data-tolerant counts) — the standard streaming operator
set, even though the reference itself has no streaming story.
"""

from __future__ import annotations

import os

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .jobs.pipeline import ROW_SCHEMA, _exists, encode, encode_append

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

    Batch 0 establishes the partition map + base fragments; each later
    micro-batch appends continuation fragments under its own run_id and
    manifest generation, so restarted streams never collide with prior
    batches and chains stay delta-encoded across batches.
    """

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        if _exists(spark, os.path.join(out_dir, "manifest")):
            # the micro-batch id keys idempotence: a foreachBatch retry
            # of the same batch skips partitions it already committed
            encode_append(
                spark, batch_df, out_dir,
                keyframe_interval=keyframe_interval,
                batch_id=f"stream-{batch_id}",
            )
        else:
            encode(
                spark, batch_df, out_dir,
                target_rows=target_rows, keyframe_interval=keyframe_interval,
            )

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
    from .jobs.pipeline import decode

    return decode(spark, out_dir)


def chain_head_stream(stream: DataFrame):
    """Custom stateful streaming operator (applyInPandasWithState):
    tracks each (repo, path) chain's running head across micro-batches
    — version count and latest commit — the streaming analog of the
    reference's snapshot head (``DeltaSnapshots.current``,
    /root/reference/deltoid/src/snapshot/delta.rs:81-95).  State lives
    in the query's checkpointed state store, so a restarted stream
    resumes exactly where the head left off.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        n, last = state.get if state.exists else (0, "")
        for pdf in pdfs:
            n += len(pdf)
            batch_max = pdf["commit"].max()
            if batch_max is not None and str(batch_max) > last:
                last = str(batch_max)
        state.update((n, last))
        yield pd.DataFrame(
            {
                "repo": [key[0]],
                "path": [key[1]],
                "n_versions": [n],
                "head_commit": [last],
            }
        )

    return stream.groupBy("repo", "path").applyInPandasWithState(
        update,
        "repo string, path string, n_versions long, head_commit string",
        "n long, last string",
        "update",
        GroupStateTimeout.NoTimeout,
    )


def dedup_stream(
    docs: DataFrame,
    fingerprint_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup for a document ingest: md5 fingerprint +
    ``dropDuplicatesWithinWatermark`` — the training-data "emit each
    document once" operator with state BOUNDED by the watermark (plain
    dropDuplicates on an unbounded stream grows state forever; the
    within-watermark variant evicts fingerprints once no on-time
    duplicate can still arrive).  Works identically on a static frame
    (falls back to dropDuplicates semantics for testing parity).
    """
    fp = docs.withColumn("fp", F.md5(F.col(fingerprint_col)))
    if not docs.isStreaming:
        return fp.dropDuplicates(["fp"])
    return fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["fp"])


def source_cap_stream(docs: DataFrame, k: int):
    """Streaming per-source admission cap (applyInPandasWithState): the
    ingest-side analog of functions/packing.cap_per_source — each
    source admits at most ``k`` documents ACROSS micro-batches, then
    every later arrival from that source is dropped at the door (the
    anti-crawl-domination gate run during collection rather than after
    it).

    State is ONE counter per source — bounded by the number of distinct
    sources, not by rows — and lives in the checkpointed state store,
    so a restarted stream keeps honoring caps it already filled.
    Emits the admitted rows with their per-source admission index
    (1..k; deterministic given arrival order).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        (n,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            if n >= k:
                break
            take = pdf.iloc[: max(0, k - n)]
            if len(take):
                out = pd.DataFrame(
                    {
                        "source": key[0],
                        "doc_id": take["doc_id"].to_numpy(),
                        "admit_idx": np.arange(n + 1, n + len(take) + 1),
                    }
                )
                n += len(take)
                yield out
        state.update((n,))

    return docs.groupBy("source").applyInPandasWithState(
        update,
        "source string, doc_id long, admit_idx long",
        "n long",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def session_counts(
    events: DataFrame,
    gap: str = "6 hours",
    watermark: str = "12 hours",
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Watermarked session-window counts per key (the streaming analog
    of functions/temporal.sessionize): each event extends its session
    window ``gap`` past itself; overlapping windows merge, and the
    watermark lets Spark finalize and evict sessions no on-time event
    can still extend.

    Boundary nit vs the batch operator: session_window closes a session
    when the next gap is >= ``gap`` (window end is exclusive), while
    sessionize splits strictly > ``gap_s`` — identical everywhere except
    an exact-gap tie.  Works on both static frames and streams (same
    plan; state bounding only applies on a stream).
    """
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), gap).alias("w"), key)
        .agg(F.count("*").alias("n_events"))
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    interval: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: pair each click with purchases by
    the same user within ``interval`` AFTER the click (the attribution
    join).  Both sides carry watermarks and the join condition bounds
    event time in both directions, so Spark can evict state for rows no
    on-time match can still reach — the canonical bounded-state
    stream-stream join shape.  Works identically on static frames.

    Inputs need columns (user_id, event_id, ts); output is one row per
    qualifying (click, purchase) pair with the lag between them.
    """
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    return c.join(
        p,
        F.expr(
            f"c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL {interval}"
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_micros(F.col("p_ts").cast("timestamp"))
         - F.unix_micros(F.col("c_ts").cast("timestamp"))).alias("lag_us"),
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
