"""Clustered (zero-shuffle) encode mode: parity + bounded ratio cost."""

from __future__ import annotations

import pytest

from deltoid_spark.fixtures import codegen
from deltoid_spark.jobs import decode, encode, metrics_summary, verify


@pytest.fixture(scope="module")
def tiny(spark):
    pdf = codegen.generate(2_000)
    return pdf, spark.createDataFrame(pdf)


def test_clustered_parity(spark, tiny, tmp_path_factory):
    pdf, df = tiny
    out = str(tmp_path_factory.mktemp("clustered"))
    manifest = encode(spark, df, out, target_rows=500, mode="clustered")
    assert metrics_summary(manifest)["rows"] == len(pdf)
    report = verify(spark, df, decode(spark, out))
    assert report["ok"], report


def test_clustered_ratio_close_to_grouped(spark, tiny, tmp_path_factory):
    pdf, df = tiny
    # split the input across several files so fragments really happen
    src = str(tmp_path_factory.mktemp("src"))
    codegen.write_parquet(pdf, src, n_shards=8)
    sdf = spark.read.parquet(src)

    out_g = str(tmp_path_factory.mktemp("g"))
    out_c = str(tmp_path_factory.mktemp("c"))
    g = metrics_summary(encode(spark, sdf, out_g, target_rows=500, mode="grouped"))
    c = metrics_summary(encode(spark, sdf, out_c, target_rows=500, mode="clustered"))
    assert verify(spark, sdf, decode(spark, out_c))["ok"]
    # fragment keyframes + per-fragment tables cost something, but bounded
    assert c["enc_bytes"] < g["enc_bytes"] * 1.6, (c["enc_bytes"], g["enc_bytes"])


def test_clustered_no_shuffle_in_plan(spark, tiny):
    _, df = tiny
    from deltoid_spark.jobs.partitioning import assign_partitions
    from deltoid_spark.jobs.pipeline import BLOCK_SCHEMA, make_fragment_kernel

    dfp, _ = assign_partitions(df, 500)
    blocks = dfp.mapInArrow(make_fragment_kernel(), BLOCK_SCHEMA)
    plan = blocks._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("BroadcastExchange")[0].replace(
        "BroadcastExchange", ""
    ) or "ShuffleExchange" not in plan
    # the only exchange allowed is the broadcast of the giant-repo salt map
    assert "ShuffleExchange" not in plan