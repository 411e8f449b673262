"""End-to-end J1 -> J2 -> J3 on the synthetic fixture (SURVEY.md §5.2).

Gates: 100% sha256 parity, compressed size < reference-semantics
encoder, resume-after-partial-manifest reproduces identical output.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from deltoid_spark import reference_encoder as ref
from deltoid_spark.fixtures import codegen
from deltoid_spark.jobs import assign_partitions, decode, encode, metrics_summary, verify


@pytest.fixture(scope="module")
def tiny_pdf():
    return codegen.generate(2_000)


@pytest.fixture(scope="module")
def tiny_df(spark, tiny_pdf):
    return spark.createDataFrame(tiny_pdf)


def test_partition_assignment_deterministic_and_chain_safe(spark, tiny_df):
    df1, n1 = assign_partitions(tiny_df, target_rows=500)
    df2, n2 = assign_partitions(tiny_df, target_rows=500)
    assert n1 == n2
    a = {(r["repo"], r["path"], r["commit"]): r["part_id"] for r in df1.collect()}
    b = {(r["repo"], r["path"], r["commit"]): r["part_id"] for r in df2.collect()}
    assert a == b
    # chain-safety: a (repo, path) group never spans two partitions
    spans = (
        df1.groupBy("repo", "path")
        .agg(F.countDistinct("part_id").alias("np"))
        .filter(F.col("np") > 1)
        .count()
    )
    assert spans == 0
    # the giant repo is split across several partitions (salting works)
    giant = df1.filter(F.col("repo") == "org0/repo0")
    assert giant.select("part_id").distinct().count() > 1


def test_e2e_parity_and_size(spark, tiny_df, tiny_pdf, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("enc"))
    manifest = encode(spark, tiny_df, out, target_rows=500)
    summary = metrics_summary(manifest)
    assert summary["rows"] == len(tiny_pdf)
    assert summary["partitions"] > 1

    decoded = decode(spark, out)
    report = verify(spark, tiny_df, decoded)
    assert report["ok"], report

    ref_bytes = ref.reference_encoded_bytes(tiny_pdf)
    assert summary["enc_bytes"] < ref_bytes, (summary["enc_bytes"], ref_bytes)
    # and substantially so: chain+zstd should be way under full-replacement JSON
    assert summary["enc_bytes"] < ref_bytes * 0.5


def test_resume_after_partial_manifest(spark, tiny_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("resume"))
    encode(spark, tiny_df, out, target_rows=500)
    full = {
        (r["repo"], r["path"], r["commit"]): r["content"]
        for r in decode(spark, out).collect()
    }

    # simulate a crash: drop half the manifest rows (keep blocks: torn state)
    mpath = os.path.join(out, "manifest")
    m = spark.read.parquet(mpath).collect()
    keep = [r for r in m if r["part_id"] % 2 == 0]
    spark.createDataFrame(keep, spark.read.parquet(mpath).schema).write.mode(
        "overwrite"
    ).parquet(mpath)

    manifest2 = encode(spark, tiny_df, out, target_rows=500)  # resume
    assert manifest2.count() == len(m)  # all partitions committed again
    resumed = {
        (r["repo"], r["path"], r["commit"]): r["content"]
        for r in decode(spark, out).collect()
    }
    assert resumed == full


def test_codec_choices_recorded(spark, tiny_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("codecs"))
    manifest = encode(spark, tiny_df, out, target_rows=500)
    import json

    codec_maps = [json.loads(r["codecs"]) for r in manifest.collect()]
    assert all(set(c) == {"repo", "path", "commit", "lang", "content"} for c in codec_maps)
    # content: the kernel trials CHAIN vs whole-column PLAIN per
    # partition and records the winner (plain can win on tiny partitions
    # where zstd's window spans the whole chain set; CHAIN wins at
    # realistic partition sizes — asserted in test_kernels.py)
    assert all(c["content"] in ("chain", "plain") for c in codec_maps)
    # hex and plain-zstd are near-equivalent on hex ids (zstd's entropy
    # coder also packs nibbles); either is a legitimate min-size pick
    assert all(c["commit"] in ("hex", "plain") for c in codec_maps)


def test_empty_input(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("empty"))
    empty = spark.createDataFrame(
        [], "repo string, path string, commit string, lang string, content string"
    )
    manifest = encode(spark, empty, out, target_rows=100)
    assert manifest.count() == 0
    assert decode(spark, out).count() == 0


def test_encode_output_deterministic_across_runs_and_parallelism(spark, tiny_df, tmp_path_factory):
    """Same input -> byte-identical payload SET regardless of run or
    (for grouped mode) shuffle parallelism — the job-level analog of the
    kernel golden-determinism test (checkpoint resume verifies work by
    hash, so this is a hard invariant)."""
    import hashlib

    def payload_set(out):
        rows = spark.read.parquet(f"{out}/blocks").select(
            "part_id", "frag_id", "column", "payload"
        ).collect()
        return sorted(
            (r["part_id"], r["frag_id"], r["column"],
             hashlib.sha256(bytes(r["payload"])).hexdigest())
            for r in rows
        )

    out1 = str(tmp_path_factory.mktemp("det1"))
    out2 = str(tmp_path_factory.mktemp("det2"))
    encode(spark, tiny_df, out1, target_rows=500)
    encode(spark, tiny_df.repartition(13), out2, target_rows=500)
    assert payload_set(out1) == payload_set(out2)


def test_clustered_failure_isolation(spark, tiny_df, tmp_path_factory):
    """Per-part-group try/except also holds in zero-shuffle mode."""
    from deltoid_spark.jobs import decode as _decode

    out = str(tmp_path_factory.mktemp("clupoison"))
    manifest = encode(
        spark, tiny_df, out, target_rows=500, mode="clustered",
        _fail_inject="org0/repo0",
    )
    rows = manifest.collect()
    assert any(r["status"] == "failed" for r in rows)
    assert any(r["status"] == "committed" for r in rows)
    decoded = _decode(spark, out)
    assert decoded.filter(F.col("repo") == "org0/repo0").count() == 0
    assert decoded.count() > 0


def test_training_data_pipeline_journey(spark, tmp_path_factory):
    """The full user journey over one corpus: encode it as a snapshot
    store, decode it back bit-exact, then run the curation pipeline on
    the decoded frame — near-dup clusters, canonical selection,
    decontamination, packing, splits — asserting the stages compose
    (every keeper is a clustered doc, packs cover every doc exactly
    once, splits partition the corpus)."""
    import pyspark.sql.functions as F

    from deltoid_spark.functions import dedup, packing
    from deltoid_spark.jobs import decode, encode, verify

    out = str(tmp_path_factory.mktemp("journey"))
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumnRenamed("text", "content")
    )
    # snapshot-store leg: documents as a single-version code table
    table = docs.select(
        F.col("source").alias("repo"),
        F.concat_ws("/", F.lit("doc"), F.col("doc_id").cast("string")).alias("path"),
        F.lit("c0").alias("commit"),
        F.col("lang"),
        F.col("content"),
    )
    manifest = encode(spark, table, out, target_rows=200)
    assert all(r["status"] == "committed" for r in manifest.collect())
    decoded = decode(spark, out)
    assert verify(spark, table, decoded)["ok"]

    # curation leg over the DECODED corpus
    corpus = decoded.select(
        F.split(F.col("path"), "/")[1].cast("long").alias("doc_id"),
        F.col("content").alias("text"),
        "lang",
        F.length("content").alias("n_chars"),
    )
    n = corpus.count()
    clusters = dedup.dup_clusters(corpus)
    keep = dedup.dedup_select(corpus)
    clustered = {r["doc_id"] for r in clusters.collect()}
    keepers = {r["keeper"] for r in keep.collect()}
    assert keepers <= clustered  # every keeper is in some cluster

    packs = packing.pack_stats(corpus, budget=2048)
    assert sum(r["n_docs"] for r in packs.collect()) == n  # total coverage

    splits = packing.hash_split(corpus)
    by_split = {r["split"]: r["n"] for r in
                splits.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(by_split.values()) == n  # a partition of the corpus

    bench_docs = corpus.filter(F.col("doc_id") % 10 == 0)
    flags = dedup.contamination(corpus.filter(F.col("doc_id") % 10 != 0), bench_docs)
    assert flags.count() == corpus.filter(F.col("doc_id") % 10 != 0).count()
