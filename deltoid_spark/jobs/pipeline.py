"""The three job entry points (SURVEY.md §3.2):

J1 ``encode``  — table -> compressed blocks + manifest + metrics
J2 ``decode``  — blocks -> table' (bit-identical)
J3 ``verify``  — sha256-parity audit of table vs table'

Dataflow (J1): read parquet -> skew-aware deterministic ``part_id``
(partitioning.py) -> **one planned shuffle** (``groupBy(part_id)``)
-> ``applyInPandas`` encode kernel (executor-local numpy; whole
partition visible so (repo, path) chains are complete) -> blocks
parquet + manifest parquet.

Resume (north_rule "resumable from checkpoint"): the manifest is the
source of truth.  A re-run recomputes part_ids (deterministic),
anti-joins the committed set, and encodes only the remainder; decode
reads only manifest-committed partitions and drops duplicate block
rows from torn writes (re-encoded blocks are byte-identical, so any
surviving duplicate is harmless).  This mirrors the reference's
``DeltaSnapshots.current`` head tracking
(/root/reference/deltoid/src/snapshot/delta.rs:81-125).

Zero per-row Python: the only JVM<->Python boundary is Arrow batches
into the two kernels.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..kernels import api, chain as chain_kernel, selector, strings
from .partitioning import DEFAULT_TARGET_ROWS, assign_partitions

COLUMNS = ["repo", "path", "commit", "lang", "content"]

BLOCK_SCHEMA = (
    "part_id long, frag_id long, column string, codec string, payload binary, "
    "n_rows long, raw_bytes long, enc_bytes long, sha256 string, wall_s double"
)

ROW_SCHEMA = "repo string, path string, commit string, lang string, content string"


# ------------------------------------------------------------- J1 encode ----


def _group_sizes(keys: pd.Series) -> np.ndarray:
    arr = keys.to_numpy(dtype=object)
    n = len(arr)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    starts = np.flatnonzero(np.concatenate(([True], arr[1:] != arr[:-1])))
    return np.diff(np.concatenate((starts, [n]))).astype(np.int64)


def _utf8_bytes(s: pd.Series) -> int:
    if s.empty:
        return 0
    lengths, _ = strings.utf8_view(s)
    return int(lengths.sum())


def _encode_rows(
    pdf: pd.DataFrame, part_id: int, frag_id: int,
    keyframe_interval: int, level: int, t0: float,
) -> list[tuple]:
    """Encode one sorted slice of rows into per-column block rows."""
    out = []
    gsizes = _group_sizes(pdf["repo"] + "\x00" + pdf["path"])
    for col in COLUMNS:
        s = pdf[col]
        raw = _utf8_bytes(s)
        if col == "content" and len(gsizes) < len(s):
            # trial both content strategies, keep the smaller: CHAIN's
            # delta scripts vs whole-column PLAIN+zstd (whose window also
            # dedups adjacent versions) — the winner is data-dependent
            buf = chain_kernel.encode_chain(
                s, gsizes, keyframe_interval=keyframe_interval, level=level
            )
            plain_buf = api.encode_block(s, "plain")
            codec = "chain"
            if len(plain_buf) < len(buf):
                codec, buf = "plain", plain_buf
        else:
            codec, _stats, buf = selector.select_and_encode(s)
        sha = api.sha256_column(s) if col == "content" else None
        out.append(
            (part_id, frag_id, col, codec, buf, len(s), raw, len(buf), sha,
             time.time() - t0)
        )
    return out


_BLOCK_COLS = [
    "part_id", "frag_id", "column", "codec", "payload",
    "n_rows", "raw_bytes", "enc_bytes", "sha256", "wall_s",
]


def make_encode_kernel(keyframe_interval: int = 32, level: int | None = None):
    def encode_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        part_id = int(pdf["part_id"].iloc[0])
        pdf = pdf.sort_values(["repo", "path", "commit"], kind="mergesort").reset_index(drop=True)
        rows = _encode_rows(pdf, part_id, 0, keyframe_interval, level, t0)
        return pd.DataFrame(rows, columns=_BLOCK_COLS)

    return encode_partition


def make_fragment_kernel(keyframe_interval: int = 32, level: int | None = None):
    """mapInArrow kernel for *clustered* mode: encode each input split
    in place (no shuffle).  The split's rows are sorted and grouped by
    part_id locally; each (part_id, split) slice becomes a block
    *fragment*.  Chains crossing split boundaries simply start a new
    keyframe — a bounded ratio cost, zero data movement.
    """

    def encode_split(batches):
        from pyspark import TaskContext

        frag_id = TaskContext.get().partitionId() if TaskContext.get() else 0
        tables = list(batches)
        if not tables:
            return
        t0 = time.time()
        pdf = pa.Table.from_batches(tables).to_pandas()
        pdf = pdf.sort_values(
            ["part_id", "repo", "path", "commit"], kind="mergesort"
        ).reset_index(drop=True)
        rows: list[tuple] = []
        for part_id, sub in pdf.groupby("part_id", sort=True):
            rows.extend(
                _encode_rows(
                    sub.reset_index(drop=True), int(part_id), frag_id,
                    keyframe_interval, level, t0,
                )
            )
        out = pd.DataFrame(rows, columns=_BLOCK_COLS)
        yield pa.RecordBatch.from_pandas(out, schema=_block_arrow_schema())

    return encode_split


def _block_arrow_schema() -> pa.Schema:
    return pa.schema(
        [
            ("part_id", pa.int64()), ("frag_id", pa.int64()),
            ("column", pa.string()), ("codec", pa.string()),
            ("payload", pa.binary()), ("n_rows", pa.int64()),
            ("raw_bytes", pa.int64()), ("enc_bytes", pa.int64()),
            ("sha256", pa.string()), ("wall_s", pa.float64()),
        ]
    )


def encode(
    spark: SparkSession,
    source: DataFrame | str,
    out_dir: str,
    target_rows: int = DEFAULT_TARGET_ROWS,
    keyframe_interval: int = 32,
    resume: bool = True,
    mode: str = "grouped",
) -> DataFrame:
    """Run J1; returns the manifest DataFrame for this run.

    mode="grouped" (default): one shuffle co-locates each part_id, so
    every (repo, path) chain is delta-encoded whole, and resume works at
    partition granularity.  mode="clustered": zero-shuffle map-side
    encode for inputs already clustered by (repo, path) — e.g. re-encode
    of previously written Iceberg state; each input split becomes block
    fragments (chains crossing splits restart at a keyframe).  Shuffle
    traffic drops from raw bytes to zero; use for ingest-bandwidth-bound
    clusters.  Clustered mode resumes at whole-run granularity only.
    """
    df = spark.read.parquet(source) if isinstance(source, str) else source
    df, n_parts = assign_partitions(df.select(*COLUMNS), target_rows)

    blocks_path = os.path.join(out_dir, "blocks")
    manifest_path = os.path.join(out_dir, "manifest")

    if resume and _exists(spark, manifest_path):
        committed = spark.read.parquet(manifest_path).select("part_id").distinct()
        df = df.join(F.broadcast(committed), "part_id", "left_anti")

    kernel = make_encode_kernel(keyframe_interval)
    if mode == "clustered":
        blocks = df.mapInArrow(
            make_fragment_kernel(keyframe_interval), BLOCK_SCHEMA
        )
    else:
        blocks = df.groupBy("part_id").applyInPandas(kernel, BLOCK_SCHEMA)
    blocks.write.mode("append").parquet(blocks_path)

    # manifest from the (tiny) written blocks table: one more scan of
    # metadata-sized data, no re-encode
    # after a resume, re-encoded partitions appear twice in blocks —
    # deterministic encoding makes the copies identical, keep one
    written = spark.read.parquet(blocks_path).dropDuplicates(
        ["part_id", "frag_id", "column"]
    )
    manifest = (
        written.groupBy("part_id")
        .agg(
            F.sum(
                F.when(F.col("column") == "content", F.col("n_rows")).otherwise(0)
            ).alias("n_rows"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
            F.to_json(
                F.create_map(
                    *[
                        part
                        for c in COLUMNS
                        for part in (
                            F.lit(c),
                            F.min(F.when(F.col("column") == c, F.col("codec"))),
                        )
                    ]
                )
            ).alias("codecs"),
            F.max("sha256").alias("content_sha256"),
            F.max("wall_s").alias("wall_s"),
            F.lit("committed").alias("status"),
        )
    )
    manifest.write.mode("overwrite").parquet(manifest_path)
    return spark.read.parquet(manifest_path)


def _exists(spark: SparkSession, path: str) -> bool:
    try:
        spark.read.parquet(path).limit(1).collect()
        return True
    except Exception:
        return False


# ------------------------------------------------------------- J2 decode ----


def _decode_partition(pdf: pd.DataFrame) -> pd.DataFrame:
    # torn-write dedupe: deterministic blocks make duplicates identical.
    # fragments (clustered-mode encode) concatenate in frag_id order —
    # every column of a fragment covers the same row slice, so per-column
    # concatenation keeps rows aligned.
    pdf = pdf.drop_duplicates(subset=["part_id", "frag_id", "column"]).sort_values(
        ["frag_id", "column"], kind="mergesort"
    )
    cols: dict[str, list] = {c: [] for c in COLUMNS}
    for _, row in pdf.iterrows():
        cols[row["column"]].append(api.decode_block(bytes(row["payload"])))
    out = {c: pd.concat(cols[c], ignore_index=True) if cols[c] else pd.Series([], dtype=object)
           for c in COLUMNS}
    n = len(out["repo"])
    return pd.DataFrame(out, index=range(n))


def decode(spark: SparkSession, out_dir: str) -> DataFrame:
    """Run J2: reconstruct the original rows from blocks."""
    blocks = spark.read.parquet(os.path.join(out_dir, "blocks"))
    committed = (
        spark.read.parquet(os.path.join(out_dir, "manifest"))
        .filter(F.col("status") == "committed")
        .select("part_id")
    )
    blocks = blocks.join(F.broadcast(committed), "part_id", "left_semi")
    return blocks.groupBy("part_id").applyInPandas(_decode_partition, ROW_SCHEMA)


# ------------------------------------------------------------- J3 verify ----


def verify(spark: SparkSession, original: DataFrame, decoded: DataFrame) -> dict:
    """sha256-parity audit per row (BASELINE.json per-row invariant).

    Joins on (repo, path, commit) and compares sha2(content) both
    sides; also checks no rows were lost or invented.
    """
    def prep(df, tag):
        # null state is hashed explicitly (a literal sentinel string could
        # collide with real content equal to the sentinel); pre-aggregating
        # per key makes duplicated/lost copies of a key visible in n_<tag>
        # without a separate count() action over each input
        digest = F.concat(
            F.col("content").isNull().cast("string"),
            F.sha2(F.coalesce(F.col("content"), F.lit("")), 256),
        )
        return (
            df.select("repo", "path", "commit", digest.alias("d"))
            .groupBy("repo", "path", "commit")
            .agg(
                F.count("*").alias(f"n_{tag}"),
                F.min("d").alias(f"dmin_{tag}"),
                F.max("d").alias(f"dmax_{tag}"),
            )
        )

    j = prep(original, "a").join(prep(decoded, "b"), ["repo", "path", "commit"], "full")
    bad = (
        (F.col("n_a") != F.col("n_b"))
        | (F.col("dmin_a") != F.col("dmin_b"))
        | (F.col("dmax_a") != F.col("dmax_b"))
    )
    agg = j.agg(
        F.count("*").alias("keys"),
        F.sum(F.when(F.col("n_a").isNull() | F.col("n_b").isNull(), 1).otherwise(0)).alias("missing"),
        F.sum(F.when(bad, 1).otherwise(0)).alias("mismatched"),
        F.sum("n_a").alias("rows_original"),
        F.sum("n_b").alias("rows_decoded"),
    ).collect()[0]
    n_a, n_b = int(agg["rows_original"] or 0), int(agg["rows_decoded"] or 0)
    return {
        "rows": agg["keys"],
        "rows_original": n_a,
        "rows_decoded": n_b,
        "missing": int(agg["missing"] or 0),
        "mismatched": int(agg["mismatched"] or 0),
        "ok": (agg["missing"] or 0) == 0
        and (agg["mismatched"] or 0) == 0
        and n_a == n_b,
    }


# ---------------------------------------------------------------- metrics ----


def metrics_summary(manifest: DataFrame) -> dict:
    row = manifest.agg(
        F.sum("raw_bytes").alias("raw"),
        F.sum("enc_bytes").alias("enc"),
        F.sum("n_rows").alias("rows"),
        F.count("*").alias("partitions"),
    ).collect()[0]
    raw, enc = int(row["raw"] or 0), int(row["enc"] or 0)
    return {
        "rows": int(row["rows"] or 0),
        "partitions": int(row["partitions"] or 0),
        "raw_bytes": raw,
        "enc_bytes": enc,
        "ratio": enc / raw if raw else None,
    }
