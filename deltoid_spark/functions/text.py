"""Text analysis: token stats, quality scoring, language-ID, fingerprints.

Pure built-in-function expressions (JVM-side, whole-stage codegen) —
no Python in the hot path.  Every expression is written to evaluate
identically in Spark SQL and DuckDB (the oracle): no backslash regex
classes (escaping rules differ), integer outputs where float summation
order could differ.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from .hashing import fingerprint_hex, hash60
from .spread import spread


def n_tokens(col: str = "text") -> Column:
    """Whitespace token count via the replace trick (engine-portable):
    collapse each non-space run to one char, drop spaces, take length."""
    return F.length(
        F.regexp_replace(F.regexp_replace(F.col(col), "[^ ]+", "x"), " ", "")
    )


# GPT-2-style pre-tokenizer pattern, constrained to constructs with
# IDENTICAL semantics in Java regex (Spark) and RE2 (DuckDB): no
# lookahead, explicit ASCII classes (\s differs between engines), and
# leftmost-first alternation in both.
BPE_PATTERN = (
    "'(?:[sdmt]|ll|ve|re)"
    "| ?[A-Za-z]+"
    "| ?[0-9]+"
    "| ?[^A-Za-z0-9 \\t\\n\\r]+"
    "|[ \\t\\n\\r]+"
)


def bpe_token_count(col: str = "text") -> Column:
    """BPE-ish token count: how a GPT-2-style pre-tokenizer would split
    the text (contractions, letter runs, digit runs, punct runs,
    whitespace runs) — the budget-relevant unit for training-data
    pipelines, vs the coarser whitespace count of n_tokens()."""
    quoted = BPE_PATTERN.replace("'", "''")
    return F.size(F.expr(f"regexp_extract_all({col}, '{quoted}', 0)"))


def occurrences(col: str, needle: str) -> Column:
    """Count non-overlapping occurrences of a literal (replace-diff trick)."""
    return (
        (F.length(F.col(col)) - F.length(F.regexp_replace(F.col(col), _lit_rx(needle), "")))
        / len(needle)
    ).cast("long")


def _lit_rx(s: str) -> str:
    """Escape a literal for use in a regex (portable subset)."""
    out = []
    for ch in s:
        if ch == "\\":
            out.append("\\\\")  # [\] is invalid in Java regex; escape instead
        elif ch in ".^$*+?()[]{}|":
            out.append("[" + ch + "]")
        else:
            out.append(ch)
    return "".join(out)


STOPWORDS = {"en": " the ", "fr": " le ", "de": " der ", "es": " el ", "zh": "的"}


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-language corpus stats (length + token counts, all integers)."""
    t = spread(docs, "doc_id").select(
        "lang",
        F.length("text").alias("n_chars"),
        n_tokens().alias("n_toks"),
    )
    return (
        t.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_toks").alias("total_tokens"),
            F.max("n_toks").alias("max_tokens"),
        )
        .orderBy("lang")
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Heuristic language-ID: stopword occurrence votes -> confusion matrix
    against the labeled ``lang`` column."""
    c = spread(docs, "doc_id")
    for lang, sw in STOPWORDS.items():
        c = c.withColumn(f"c_{lang}", occurrences("text", sw))
    guess = (
        F.when(F.col("c_zh") > 0, "zh")
        .when(
            (F.col("c_en") >= F.col("c_fr"))
            & (F.col("c_en") >= F.col("c_de"))
            & (F.col("c_en") >= F.col("c_es"))
            & (F.col("c_en") > 0),
            "en",
        )
        .when((F.col("c_fr") >= F.col("c_de")) & (F.col("c_fr") >= F.col("c_es")) & (F.col("c_fr") > 0), "fr")
        .when((F.col("c_de") >= F.col("c_es")) & (F.col("c_de") > 0), "de")
        .when(F.col("c_es") > 0, "es")
        .otherwise("unknown")
    )
    return (
        c.select(guess.alias("guess"), F.col("lang").alias("actual"))
        .groupBy("guess", "actual")
        .agg(F.count("*").alias("n"))
        .orderBy("guess", "actual")
    )


def fingerprints(docs: DataFrame, portable: bool = True) -> DataFrame:
    """Normalized-content fingerprint: hash of lowercased,
    space-collapsed text (the document-identity key for fuzzy-exact
    dedup).  portable switches md5 -> xxhash64 hex (see hashing.py,
    the ONE documented scale switch shared by every hashing operator)."""
    return spread(docs, "doc_id").select(
        "doc_id",
        fingerprint_hex(
            F.lower(F.trim(F.regexp_replace("text", " +", " "))), portable
        ).alias("fp"),
    ).orderBy("doc_id")


def quality_scores(docs: DataFrame) -> DataFrame:
    """Integer quality facets per doc: length, tokens, mean token length
    (x100, integer), stopword hits.  Integer outputs keep the DuckDB
    cross-check exact."""
    t = spread(docs, "doc_id").select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens().alias("n_toks"),
        occurrences("text", " the ").alias("en_stop_hits"),
    )
    return t.select(
        "doc_id", "n_chars", "n_toks",
        F.floor((F.col("n_chars") * 100) / F.greatest(F.col("n_toks"), F.lit(1)))
        .cast("long").alias("chars_per_token_x100"),
        "en_stop_hits",
    ).orderBy("doc_id")


def repetition_metrics(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition quality metrics per document: lexical
    diversity (distinct-word fraction) and the mass of the most
    frequent word / word-bigram — the classic "repeated boilerplate"
    filters for pretraining corpora (Rae et al. 2021 §A1.1 use the
    same family over lines/paragraphs/n-grams).

    All JVM expressions: tokens split once, bigrams built with
    slice+zip_with (no shuffle before the per-doc aggregates, which
    are map-side combinable on doc_id).  Fractions are integer
    permille for cross-engine value-hash exactness.
    """
    toks = F.filter(
        F.split(F.col("text"), "[ \\t\\n\\r]+"), lambda t: t != F.lit("")
    )
    d = spread(docs, "doc_id").select("doc_id", toks.alias("toks"))
    words = d.select("doc_id", F.explode("toks").alias("w"))
    wc = words.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    wstats = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("top_w"),
    )
    n = F.size("toks")
    bigrams = d.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("toks", 1, F.greatest(n - 1, F.lit(0))),
                F.slice("toks", 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bg"),
    )
    bc = bigrams.groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
    bstats = bc.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bg")
    )
    pm = lambda num, den: F.floor(num * 1000 / F.greatest(den, F.lit(1))).cast(  # noqa: E731
        "long"
    )
    return (
        wstats.join(bstats, "doc_id", "left")
        .na.fill({"n_bigrams": 0, "top_bg": 0})
        .select(
            "doc_id",
            F.col("n_words").cast("long").alias("n_words"),
            pm(F.col("n_distinct"), F.col("n_words")).alias("distinct_permille"),
            pm(F.col("top_w"), F.col("n_words")).alias("top_word_permille"),
            pm(F.col("top_bg"), F.col("n_bigrams")).alias("top_bigram_permille"),
        )
        .orderBy("doc_id")
    )


def lm_coverage(
    docs: DataFrame, ref_mod: int = 10, ref_top_k: int = 1_000_000,
    portable: bool = True,
) -> DataFrame:
    """Character-trigram LM coverage score — the CCNet-style quality
    proxy (Wenzek et al. 2020 score documents by an in-domain LM;
    here the "model" is the trigram table of a deterministic in-domain
    reference slice, doc_id % ref_mod == 0, and the score is integer
    coverage/frequency statistics instead of float log-probs, so every
    value is exact in any engine).

    Per doc: n_tri trigram positions, seen_permille (fraction of
    positions whose trigram occurs in the reference), avg_ref_count
    (mean reference frequency of the doc's trigrams — low = far from
    the reference distribution).  Low seen_permille / avg_ref_count
    flags boilerplate, non-language, or out-of-domain text.

    Scale shape: distinct trigrams are alphabet-bounded only for
    narrow charsets (ASCII/code); over a CJK/unicode web corpus they
    are effectively unbounded, so the reference table is HARD-CAPPED
    at the ``ref_top_k`` most frequent trigrams (deterministic
    tie-break: count desc, hash asc) before it broadcasts — at the
    default 1M that is a <=16 MB broadcast of (long, long) rows, and
    the cap is also the model truncation an n-gram LM would apply
    anyway (rare trigrams carry no coverage signal).  The top-K is a
    TakeOrdered (per-partition heaps + one driver merge), never a
    global sort.  The corpus side never shuffles by trigram — one
    map-side-combinable per-doc aggregate is the only exchange.
    Float division appears ONLY after the integer sums, as
    floor(sum/count) with both operands exact — identical doubles in
    Spark and DuckDB.
    """
    # trigrams hash to 60-bit md5-prefix ints BEFORE any join/aggregate
    # (the q26 shuffle-weight cut): the broadcast reference table is
    # (long, long) rows instead of strings — bounded by the distinct-
    # trigram count (|charset|^3), ~2x lighter than string keys
    tri = spread(docs, "doc_id").select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.lit(1), F.length("text") - 2))
        ).alias("i"),
        "text",
    ).select(
        "doc_id",
        hash60(F.expr("substring(text, i, 3)"), portable).alias("g"),
    )
    ref = (
        tri.filter(F.col("doc_id") % ref_mod == 0)
        .groupBy("g")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("g").asc())
        .limit(ref_top_k)
    )
    return (
        tri.join(F.broadcast(ref), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tri"),
            F.floor(
                F.sum(F.when(F.col("c").isNotNull(), 1).otherwise(0))
                * 1000
                / F.count("*")
            ).cast("long").alias("seen_permille"),
            F.floor(F.sum(F.coalesce(F.col("c"), F.lit(0))) / F.count("*"))
            .cast("long")
            .alias("avg_ref_count"),
        )
        .orderBy("doc_id")
    )


# Conservative ASCII patterns with IDENTICAL semantics in Java regex
# (Spark) and RE2 (DuckDB): no \b boundaries, no lookaround, no
# shorthand classes.
EMAIL_RX = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
IPV4_RX = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"


def pii_scrub(docs: DataFrame) -> DataFrame:
    """PII detection + masking (the Dolma/RedPajama pre-release pass):
    count and replace email addresses and IPv4 literals with typed mask
    tokens.  All JVM expressions (regexp_count / regexp_replace inside
    whole-stage codegen, no Python); the scrubbed text's md5 makes the
    full replacement value-checkable without shipping bodies.  Dots are
    written as [.] classes so the pattern strings behave identically
    under Java regex and RE2.
    """
    scrub = F.regexp_replace(
        F.regexp_replace(F.col("text"), EMAIL_RX, "<EMAIL>"), IPV4_RX, "<IP>"
    )
    return spread(docs, "doc_id").select(
        "doc_id",
        F.regexp_count("text", F.lit(EMAIL_RX)).cast("long").alias("n_emails"),
        F.regexp_count("text", F.lit(IPV4_RX)).cast("long").alias("n_ips"),
        F.md5(scrub).alias("scrubbed_md5"),
    ).orderBy("doc_id")


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-document distinctive terms — the keyword-extraction pass of
    a curation pipeline (topic tagging, near-dup triage, cluster
    labeling).  Terms rank by (term frequency DESC, document frequency
    ASC, term ASC): high-tf/low-df is exactly what tf-idf orders, but
    the integer triple is a deterministic total order with NO floating
    log — bit-exact in any engine, no libm parity risk.

    Scale shape: tf is one map-side-combinable (doc_id, term)
    aggregate; df aggregates tf's output (vocabulary-sized, one row
    per distinct term); the tf<-df join shuffles on the term — zipf-hot
    terms ("the") are skewed JOIN keys, which AQE's skew-join splitting
    handles (it is a plain shuffle join, not a window); the final
    per-doc top-k window partitions by doc_id, bounded by per-doc
    vocabulary.  No collect, no unbounded window partitions.
    """
    words = spread(docs, "doc_id").select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower("text"), "[ ]+"), lambda t: t != F.lit("")
            )
        ).alias("w"),
    )
    tf = words.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
    win = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("w").asc()
    )
    return (
        tf.join(dfreq, "w")
        .withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= k)
        .select(
            "doc_id",
            F.col("rk").cast("long").alias("rk"),
            F.col("w").alias("term"),
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
        )
        .orderBy("doc_id", "rk")
    )


def filter_funnel(
    docs: DataFrame,
    min_chars: int = 100,
    max_top_word_permille: int = 200,
    min_seen_permille: int = 300,
) -> DataFrame:
    """Curation filter funnel: every corpus build's keep/drop report.

    Each document gets the FIRST failing reason — too_short (length
    floor), repetitive (Gopher top-word mass), out_of_domain (CCNet
    trigram coverage) — or 'keep'; output is drop counts per reason.
    Composes repetition_metrics and lm_coverage (their scale shapes
    apply unchanged); the joins are doc_id-keyed one-to-one merges.
    Integer thresholds over integer metrics keep the report bit-exact
    cross-engine.
    """
    rep = repetition_metrics(docs).select("doc_id", "top_word_permille")
    cov = lm_coverage(docs).select("doc_id", "seen_permille")
    base = docs.select("doc_id", "n_chars")
    reason = (
        F.when(F.col("n_chars") < min_chars, "too_short")
        .when(F.col("top_word_permille") > max_top_word_permille, "repetitive")
        .when(F.col("seen_permille") < min_seen_permille, "out_of_domain")
        .otherwise("keep")
    )
    return (
        base.join(rep, "doc_id")
        .join(cov, "doc_id")
        .select(reason.alias("reason"))
        .groupBy("reason")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("reason")
    )
