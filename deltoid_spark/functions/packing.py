"""Sequence packing: assign documents to fixed-token-budget training
packs (GPT-style pretraining concatenates the token stream and cuts a
context window every `budget` tokens; the pack id of a document is
which cut its first token falls in).

Scale notes: the natural formulation is a GLOBAL running sum of token
counts in document order — a single-partition window, the classic
scale-killer.  Here it runs as a two-phase distributed prefix sum
instead: (1) an intra-shard running sum, windowed per shard (fully
parallel); (2) shard totals — one row per shard — get the global
running offset on a shards-sized table, then broadcast-join back.
Only the tiny totals table ever passes through an unpartitioned
window (same bounded-stitch pattern as the run-length profile in
functions/runs.py); `shard_size` scales the data-size-to-shard-count
ratio at larger inputs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from . import text


def pack_documents(
    docs: DataFrame,
    budget: int = 4096,
    shard_size: int = 128,
    token_count: Column | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document pack assignment: (doc_id, n_tok, start_off, pack_id)
    where start_off is the document's first-token offset in the
    concatenated corpus stream (ordered by id_col) and
    pack_id = start_off DIV budget."""
    toks = token_count if token_count is not None else text.bpe_token_count()
    d = (
        docs.select(F.col(id_col), toks.alias("n_tok"))
        .withColumn("shard", F.floor(F.col(id_col) / shard_size))
    )
    w_in = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("intra_end", F.sum("n_tok").over(w_in))
    totals = d.groupBy("shard").agg(F.max("intra_end").alias("shard_tot"))
    w_sh = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "offset", F.coalesce(F.sum("shard_tot").over(w_sh), F.lit(0)).cast("long")
    )
    d = d.join(F.broadcast(offsets.select("shard", "offset")), "shard")
    return d.select(
        F.col(id_col),
        F.col("n_tok").cast("long").alias("n_tok"),
        (F.col("offset") + F.col("intra_end") - F.col("n_tok"))
        .cast("long")
        .alias("start_off"),
    ).withColumn("pack_id", F.expr(f"start_off DIV {budget}"))


def hash_split(
    docs: DataFrame,
    key: str = "doc_id",
    weights: dict[str, int] | None = None,
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = first 8 hex
    chars of md5(key) mod 1000, mapped to splits by permille weights.

    Content-stable (a document keeps its split across reruns and
    cluster sizes — no RNG, no row order dependence), pure JVM
    expressions, and reproducible in any engine with md5 + integer
    arithmetic.  Weights are permille and must sum to 1000.
    """
    weights = weights or {"train": 980, "val": 10, "test": 10}
    if sum(weights.values()) != 1000:
        raise ValueError("split weights must sum to 1000 (permille)")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 8), 16, 10).cast(
            "long"
        ),
        F.lit(1000),
    )
    expr: Column | None = None
    hi = 0
    for name, w in weights.items():
        hi += w
        cond = bucket < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return docs.withColumn("split", expr)


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, int],
    stratum_col: str = "lang",
    key: str = "doc_id",
    default_permille: int = 1000,
) -> DataFrame:
    """Deterministic per-stratum downsampling (corpus rebalancing /
    temperature sampling): keep a row iff its md5 bucket — salted with
    the stratum value so strata sample independently — falls under the
    stratum's permille rate.

    Content-stable like hash_split: no RNG, no row-order dependence,
    pure JVM expressions, same keep-set on any cluster size.
    """
    for name, r in rates.items():
        if not 0 <= r <= 1000:
            raise ValueError(f"rate for {name!r} must be 0..1000 permille")
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col(key).cast("string"), F.col(stratum_col))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(1000),
    )
    rate: Column = F.lit(default_permille)
    for name, r in rates.items():
        rate = F.when(F.col(stratum_col) == name, r).otherwise(rate)
    return docs.filter(bucket < rate)


def pack_stats(
    docs: DataFrame, budget: int = 4096, shard_size: int = 128
) -> DataFrame:
    """Per-pack roll-up: document count, token total, first document."""
    p = pack_documents(docs, budget, shard_size)
    return (
        p.groupBy("pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("pack_id")
    )


def cap_per_source(
    docs: DataFrame, k: int, window_target: int = 65536
) -> DataFrame:
    """Per-source document cap (the anti-crawl-domination pass every
    web-corpus build runs: no single domain may contribute more than
    ``k`` documents).  Keeps each source's ``k`` LOWEST doc_ids —
    deterministic, content-stable, no RNG.

    Scale shape: a naive ROW_NUMBER over (source) puts a mega-domain's
    10^9 rows through ONE window partition.  Top-k-by-key is
    associative (the k smallest of a union are among the union of each
    part's k smallest), so this runs a STATIC TREE REDUCTION whose
    every window partition is bounded by ``window_target``:

    * One map-side-combined aggregate finds the largest source's row
      count (a single scalar to the driver — the only data-dependent
      input).
    * Each level salts by ``xxhash64(doc_id, level)`` into
      ``ceil(bound / window_target)`` buckets and keeps k per
      (source, bucket); the per-source bound shrinks from ``bound`` to
      ``k * salts`` per level, so the level count is
      ``log_{window_target/k}(max_n)`` — 2-3 levels for a 10^9-row
      domain, zero levels when every source already fits.
    * The final plain (source) window ranks <= window_target
      candidates.

    A fixed salt count divides a mega-domain by a constant and leaves
    phase-1 partitions data-sized; the derived plan keeps every window
    partition <= ~window_target rows at ANY skew (expectation under
    hash salting; pinned by test_cap_per_source_mega_domain_bounded).
    Results are independent of ``window_target`` (tested), so the
    oracle stays the plain single-window SQL.
    """
    if k >= window_target:
        raise ValueError(f"k={k} must be < window_target={window_target}")
    max_n = (
        docs.groupBy("source")
        .agg(F.count("*").alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
        or 0
    )
    cand = docs
    bound, level = max_n, 0
    while bound > window_target:
        salts = -(-bound // window_target)  # ceil
        w = Window.partitionBy(
            "source",
            F.pmod(F.xxhash64(F.col("doc_id"), F.lit(level)), F.lit(salts)),
        ).orderBy("doc_id")
        cand = (
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )
        new_bound = k * salts
        if new_bound >= bound:  # k ~ window_target: no further progress
            break
        bound, level = new_bound, level + 1
    w2 = Window.partitionBy("source").orderBy("doc_id")
    return (
        cand.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
