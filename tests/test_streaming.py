"""Streaming ingest: micro-batch encode -> decode parity across batches."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from deltoid_spark import streaming
from deltoid_spark.fixtures import codegen


def test_stream_encode_two_drops(spark, tmp_path_factory):
    pdf = codegen.generate(2_000)
    half = len(pdf) // 2
    in_dir = str(tmp_path_factory.mktemp("stream_in"))
    out_dir = str(tmp_path_factory.mktemp("stream_out"))

    # drop 1 -> drain -> drop 2 -> drain (two micro-batches)
    pdf.iloc[:half].to_parquet(os.path.join(in_dir, "drop1.parquet"), index=False)
    streaming.stream_encode(spark, in_dir, out_dir, target_rows=500)
    pdf.iloc[half:].to_parquet(os.path.join(in_dir, "drop2.parquet"), index=False)
    streaming.stream_encode(spark, in_dir, out_dir, target_rows=500)

    decoded = streaming.decode_stream_output(spark, out_dir)
    assert decoded.count() == len(pdf)

    # exactly-once file progress: re-draining with no new files adds nothing
    streaming.stream_encode(spark, in_dir, out_dir, target_rows=500)
    assert streaming.decode_stream_output(spark, out_dir).count() == len(pdf)

    # parity on a sample of keys
    got = {
        (r["repo"], r["path"], r["commit"]): r["content"]
        for r in decoded.filter(F.col("repo").startswith("edge/")).collect()
    }
    want = {
        (r.repo, r.path, r.commit): r.content
        for r in pdf[pdf["repo"].str.startswith("edge/")].itertuples()
    }
    assert got == want


def test_windowed_event_counts_static(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = streaming.windowed_event_counts(events, window="1 day", watermark="2 days")
    rows = out.collect()
    assert sum(r["n_events"] for r in rows) == events.count()
    assert all(r["window_start"] is not None for r in rows)


def test_windowed_event_counts_on_a_real_stream(spark, tmp_path_factory):
    """The SAME operator on an actual readStream: availableNow drain
    into a memory sink must agree with the static computation."""
    static_events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path_factory.mktemp("evt_src"))
    static_events.coalesce(2).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(static_events.schema).parquet(src)
    # watermarks need TIMESTAMP (the parquet column is TIMESTAMP_NTZ)
    cast = lambda df: df.withColumn("ts", df["ts"].cast("timestamp"))  # noqa: E731
    out = streaming.windowed_event_counts(cast(stream), window="1 day", watermark="2 days")
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in streaming.windowed_event_counts(
            cast(static_events), window="1 day", watermark="2 days"
        ).collect()
    }
    # append-mode emits only windows closed by the watermark; every
    # emitted window must match the static result exactly
    assert got
    for k, v in got.items():
        assert want[k] == v, k


def test_decode_without_state_errors_clearly(spark, tmp_path_factory):
    import pytest as _pytest

    from deltoid_spark.jobs import decode

    empty = str(tmp_path_factory.mktemp("no_state"))
    with _pytest.raises(Exception):
        decode(spark, empty).collect()


def test_chain_head_state_survives_across_drains(spark, tmp_path_factory):
    """applyInPandasWithState: the per-(repo, path) head carries across
    separate availableNow drains via the checkpointed state store."""
    pdf = codegen.generate(2_000).sort_values(
        ["repo", "path", "commit"], kind="mergesort"
    )
    grp = pdf.groupby(["repo", "path"])
    half = grp.cumcount() < (grp["commit"].transform("size") + 1) // 2
    in_dir = str(tmp_path_factory.mktemp("state_in"))
    ckpt = str(tmp_path_factory.mktemp("state_ckpt"))

    out_dir = str(tmp_path_factory.mktemp("state_out"))

    def drain(batch_pdf, name):
        batch_pdf.to_parquet(os.path.join(in_dir, f"{name}.parquet"), index=False)
        stream = spark.readStream.schema(streaming.INPUT_SCHEMA).parquet(in_dir)

        def sink(df, bid):
            import pyspark.sql.functions as F2

            df.withColumn("bid", F2.lit(bid)).write.mode("append").parquet(out_dir)

        q = (
            streaming.chain_head_stream(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.read.parquet(out_dir).collect()
        latest = {}
        for r in sorted(rows, key=lambda r: r["bid"]):
            latest[(r["repo"], r["path"])] = (r["n_versions"], r["head_commit"], r["bid"])
        max_bid = max(r["bid"] for r in rows)
        return {
            k: (n, h) for k, (n, h, bid) in latest.items() if bid == max_bid
        }

    drain(pdf[half].reset_index(drop=True), "b0")
    heads = drain(pdf[~half].reset_index(drop=True), "b1")

    # groups updated in batch 1 must report TOTALS across both batches
    sizes = pdf.groupby(["repo", "path"]).agg(n=("commit", "size"), mx=("commit", "max"))
    checked = 0
    for (repo, path), (n, head) in heads.items():
        want = sizes.loc[(repo, path)]
        assert n == want["n"], (repo, path, n, want["n"])
        assert head == want["mx"]
        checked += 1
    assert checked > 10


def test_source_cap_stream_admits_k_across_drains(spark, tmp_path_factory):
    """Streaming per-source admission cap: each source admits at most k
    docs ACROSS micro-batches (state = one counter per source in the
    checkpointed store), later arrivals are dropped at the door."""
    import pandas as pd
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("source", T.StringType()),
        T.StructField("doc_id", T.LongType()),
    ])
    in_dir = str(tmp_path_factory.mktemp("cap_in"))
    ckpt = str(tmp_path_factory.mktemp("cap_ckpt"))
    out_dir = str(tmp_path_factory.mktemp("cap_out"))

    def drain(rows, name):
        pd.DataFrame(rows, columns=["source", "doc_id"]).to_parquet(
            os.path.join(in_dir, f"{name}.parquet"), index=False
        )
        stream = spark.readStream.schema(schema).parquet(in_dir)
        q = (
            streaming.source_cap_stream(stream, k=3)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out_dir).collect()

    # batch 0: hot source floods (5 docs), cold sends 1
    drain([("hot", i) for i in range(5)] + [("cold", 100)], "b0")
    # batch 1: hot sends 3 more (all must drop), cold 1 more (admits)
    rows = drain([("hot", i) for i in range(10, 13)] + [("cold", 101)], "b1")
    got = {}
    for r in rows:
        got.setdefault(r["source"], []).append((r["admit_idx"], r["doc_id"]))
    assert len(got["hot"]) == 3          # capped at k=3 despite 8 arrivals
    assert sorted(i for i, _ in got["hot"]) == [1, 2, 3]
    assert sorted(got["cold"]) == [(1, 100), (2, 101)]  # cap spans drains


def test_dedup_stream_emits_each_fingerprint_once(spark, tmp_path_factory):
    """dropDuplicatesWithinWatermark on the md5 fingerprint: duplicated
    docs across micro-batch files surface exactly once in the sink."""
    import datetime

    import pandas as pd

    src = str(tmp_path_factory.mktemp("dedup_src"))
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    for i in range(200):
        rows.append((i, f"doc body {i % 60}", base + datetime.timedelta(seconds=i)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
    # Spark cannot read TIMESTAMP(NANOS) parquet — write microseconds
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.iloc[:100].to_parquet(os.path.join(src, "b0.parquet"), index=False)
    pdf.iloc[100:].to_parquet(os.path.join(src, "b1.parquet"), index=False)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp_ntz")
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))  # watermark needs TIMESTAMP
    )
    out = streaming.dedup_stream(stream, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT fp, count(*) AS n FROM dedup_sink GROUP BY fp").collect()
    assert len(got) == 60  # 60 distinct texts
    assert all(r["n"] == 1 for r in got)  # each emitted exactly once

    # static parity: the same operator on a batch frame
    static = streaming.dedup_stream(spark.createDataFrame(pdf))
    assert static.count() == 60


def test_session_counts_static_matches_batch_sessionize(spark):
    """session_window grouping must agree with the batch sessionize
    operator on real data (no exact-gap ties at microsecond stamps)."""
    from deltoid_spark.functions import temporal

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    sw = streaming.session_counts(events, gap="6 hours", watermark="12 hours")
    batch = temporal.session_stats(events, gap_s=21600)
    a = sorted((r["user_id"], r["n_events"]) for r in sw.collect())
    b = sorted((r["user_id"], r["n_events"]) for r in batch.collect())
    assert a == b
    assert sum(n for _, n in a) == events.count()


def test_session_counts_on_a_real_stream(spark, tmp_path_factory):
    static_events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path_factory.mktemp("sess_src"))
    static_events.coalesce(2).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(static_events.schema).parquet(src)
    cast = lambda df: df.withColumn("ts", df["ts"].cast("timestamp"))  # noqa: E731
    out = streaming.session_counts(cast(stream), gap="6 hours", watermark="12 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_counts").collect()
    }
    static_rows = streaming.session_counts(cast(static_events)).collect()
    want = {(r["user_id"], r["session_start"], r["n_events"]) for r in static_rows}
    # append mode only emits sessions the final watermark has closed:
    # the stream output is the watermark-finalized subset of the static
    # result, and every session that certainly closed must be present
    import datetime

    assert got <= want
    # final watermark = max event time - 12h; session_end already
    # includes the 6h gap, so anchor on max(session_end) - 6h - 12h
    max_ts = max(r["session_end"] for r in static_rows)
    cutoff = max_ts - datetime.timedelta(hours=19)  # 6 + 12 + slack
    closed = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in static_rows
        if r["session_end"] < cutoff
    }
    assert closed <= got and len(got) > 0


def _click_purchase_frames(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    cast = lambda df: df.withColumn("ts", df["ts"].cast("timestamp"))  # noqa: E731
    clicks = cast(ev.filter(ev.event_type == "click"))
    purchases = cast(ev.filter(ev.event_type == "purchase"))
    return ev, clicks, purchases


def test_interval_join_static_matches_plain_join(spark):
    ev, clicks, purchases = _click_purchase_frames(spark)
    out = streaming.interval_join(clicks, purchases, interval="1 hour")
    rows = {(r["click_id"], r["purchase_id"], r["lag_us"]) for r in out.collect()}
    # reference: plain SQL join on the same condition
    ev.createOrReplaceTempView("ev")
    want = {
        tuple(r)
        for r in spark.sql("""
            SELECT c.event_id, p.event_id,
                   unix_micros(CAST(p.ts AS timestamp)) - unix_micros(CAST(c.ts AS timestamp))
            FROM ev c JOIN ev p
              ON c.user_id = p.user_id AND c.event_type = 'click'
             AND p.event_type = 'purchase'
             AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
        """).collect()
    }
    assert rows == want and len(rows) > 0


def test_interval_join_on_real_streams(spark, tmp_path_factory):
    ev, clicks, purchases = _click_purchase_frames(spark)
    csrc = str(tmp_path_factory.mktemp("ij_clicks"))
    psrc = str(tmp_path_factory.mktemp("ij_purch"))
    clicks.coalesce(1).write.mode("overwrite").parquet(csrc)
    purchases.coalesce(1).write.mode("overwrite").parquet(psrc)
    cast = lambda df: df.withColumn("ts", df["ts"].cast("timestamp"))  # noqa: E731
    cs = cast(spark.readStream.schema(clicks.schema).parquet(csrc))
    ps = cast(spark.readStream.schema(purchases.schema).parquet(psrc))
    out = streaming.interval_join(cs, ps, interval="1 hour")
    q = (
        out.writeStream.format("memory")
        .queryName("ij_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["click_id"], r["purchase_id"], r["lag_us"])
        for r in spark.sql("SELECT * FROM ij_out").collect()
    }
    want = {
        (r["click_id"], r["purchase_id"], r["lag_us"])
        for r in streaming.interval_join(clicks, purchases, interval="1 hour").collect()
    }
    # inner interval joins emit matched pairs as both sides arrive; with
    # an availableNow drain over complete inputs the result is exact
    assert got == want and len(got) > 0
