"""Head-only / as-of decode (reference ``DeltaSnapshots.current`` and
``to_full_snapshots`` prefix reconstruction, snapshot/delta.rs:81-95,
137-151): decode(latest_only=True) and decode(at_version=k)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

from deltoid_spark.fixtures import codegen
from deltoid_spark.jobs import decode, encode, encode_append


@pytest.fixture(scope="module")
def encoded_dir(spark, tmp_path_factory):
    """Fixture table split mid-chain so key versions SPAN fragments."""
    pdf = codegen.generate(2_000).sort_values(
        ["repo", "path", "commit"], kind="mergesort"
    )
    rank = pdf.groupby(["repo", "path"]).cumcount()
    sizes = pdf.groupby(["repo", "path"])["commit"].transform("size")
    first = rank < (sizes + 1) // 2
    out = str(tmp_path_factory.mktemp("asof"))
    encode(spark, spark.createDataFrame(pdf[first].reset_index(drop=True)), out, target_rows=500)
    encode_append(spark, spark.createDataFrame(pdf[~first].reset_index(drop=True)), out)
    return out, pdf


def _keyed(df):
    return {(r["repo"], r["path"], r["commit"]): r["content"] for r in df.collect()}


def test_latest_only_is_the_chain_head(spark, encoded_dir):
    out, pdf = encoded_dir
    full = decode(spark, out)
    w = Window.partitionBy("repo", "path").orderBy(F.col("commit").desc())
    heads = (
        full.withColumn("rnk", F.dense_rank().over(w))
        .filter(F.col("rnk") == 1)
        .drop("rnk")
    )
    latest = decode(spark, out, latest_only=True)
    n_keys = full.select("repo", "path").distinct().count()
    assert latest.count() == n_keys  # exactly one row per key
    assert _keyed(latest) == _keyed(heads)


def test_at_version_is_the_prefix_row(spark, encoded_dir):
    out, pdf = encoded_dir
    full = decode(spark, out)
    w = Window.partitionBy("repo", "path").orderBy("commit")
    ranked = full.withColumn("v", F.row_number().over(w) - 1)
    for k in (0, 5):
        want = ranked.filter(F.col("v") == k).drop("v")
        got = decode(spark, out, at_version=k)
        assert _keyed(got) == _keyed(want), k
    # version 0 covers every key; deep versions only long chains
    assert decode(spark, out, at_version=0).count() == full.select(
        "repo", "path"
    ).distinct().count()


def test_version_pruning_composes_with_column_pruning(spark, encoded_dir):
    out, _pdf = encoded_dir
    latest = decode(spark, out, latest_only=True, columns=["lang"])
    assert latest.columns == ["lang"]
    assert latest.count() == decode(spark, out, latest_only=True).count()


def test_bad_version_args_rejected(spark, encoded_dir):
    out, _pdf = encoded_dir
    with pytest.raises(ValueError, match="mutually exclusive"):
        decode(spark, out, latest_only=True, at_version=1)
    with pytest.raises(ValueError, match=">= 0"):
        decode(spark, out, at_version=-1)
