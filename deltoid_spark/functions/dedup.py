"""Deduplication operators: exact, shingle-minhash, MinHash-LSH, SimHash.

All deterministic (hash-based, no RNG at query time) and expressed as
DataFrame ops; SimHash uses one Arrow-batched pandas UDF (bit-majority
is genuinely non-relational).  Reference tie-in: exact/keyed dedup is
the engine-side use of the map/set diff semantics (SURVEY.md A7/A9);
everything else is engine-new for the 100 TB training-data use case.

Scale notes: shingling explodes ~|text| rows per doc — at 100 TB this
runs as a map-side explode feeding a partial (map-side combined)
min-aggregate, so the shuffle carries only (doc_id, k mins), not the
shingles.  LSH band join shuffles by (band_id, band_hash), which is
uniform by construction (hash values), so no skew handling is needed.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

N_MINHASH = 8
N_BANDS = 4  # 2 hashes per band
SHINGLE = 16


def exact_dupes(docs: DataFrame) -> DataFrame:
    """Exact dedup: hash-groupBy on md5(text) -> keeper + copy count."""
    return (
        docs.groupBy(F.md5("text").alias("fp"))
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper"))
        .orderBy("fp")
    )


def char_shingles(docs: DataFrame, width: int = SHINGLE) -> DataFrame:
    """Explode each doc into its character shingles (1-indexed substrings)."""
    return docs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.lit(1), F.length("text") - (width - 1)))
        ).alias("i"),
        "text",
    ).select("doc_id", F.expr(f"substring(text, i, {width})").alias("g"))


def minhash_signatures(docs: DataFrame, k: int = N_MINHASH, width: int = SHINGLE) -> DataFrame:
    """k-permutation MinHash over character shingles.

    xxhash64 with k seeds approximates k independent permutations; the
    min aggregate is map-side combinable so only k longs per doc shuffle.
    """
    grams = char_shingles(docs, width)
    aggs = [F.min(F.xxhash64("g", F.lit(i))).alias(f"mh{i}") for i in range(k)]
    return grams.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(docs: DataFrame, bands: int = N_BANDS) -> DataFrame:
    """MinHash-LSH: band the signatures, join within buckets.

    Docs sharing any band bucket become candidate near-dup pairs
    (classic shingle->minhash->band->bucket-join).  Output is the
    deduplicated pair list (a < b).
    """
    sigs = minhash_signatures(docs)
    per_band = N_MINHASH // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[f"mh{b * per_band + j}" for j in range(per_band)]).alias("h"),
        )
        for b in range(bands)
    ]
    banded = sigs.select("doc_id", F.explode(F.array(*band_cols)).alias("bh")).select(
        "doc_id", F.col("bh.band").alias("band"), F.col("bh.h").alias("h")
    )
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def _simhash64(text: str) -> int:
    """Deterministic 64-bit SimHash over whitespace tokens (md5-based)."""
    acc = [0] * 64
    for tok in text.split():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        for b in range(64):
            acc[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(64):
        if acc[b] > 0:
            out |= 1 << b
    return out - (1 << 64) if out >= (1 << 63) else out  # wrap into int64


def simhash(docs: DataFrame) -> DataFrame:
    """SimHash per doc via an Arrow-batched pandas UDF (no per-row Python
    at the Spark boundary; the token loop runs inside the batch)."""

    @F.pandas_udf("long")
    def sh(texts: pd.Series) -> pd.Series:
        return texts.fillna("").map(_simhash64)

    return docs.select("doc_id", sh("text").alias("simhash"))


def simhash_buckets(docs: DataFrame, prefix_bits: int = 16) -> DataFrame:
    """Group docs by SimHash prefix: near-dups collide on high bits."""
    sh = simhash(docs)
    return (
        sh.withColumn("bucket", F.shiftrightunsigned("simhash", 64 - prefix_bits))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_docs") > 1)
        .orderBy("bucket")
    )
