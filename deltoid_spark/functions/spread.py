"""Scale-adaptive parallelism for explode-heavy operators.

A parquet file written as a single row group is unsplittable: Spark
gives its scan ONE task regardless of available cores, so an operator
that expands each row into ~|row| derived rows (character shingles,
whitespace tokens, trigrams, lines) runs its entire map-heavy stage —
the explode, the per-shingle hash, the partial aggregate — on one core
while the rest of the machine idles.

``spread`` repartitions the NARROW upstream (pre-explode bytes — the
cheap side to move, per the optimization guide's "shuffle keys and
metadata instead of payloads" and "explode before a join multiplies the
shuffle" rules) across the session's cores when, and only when, the
scan itself cannot provide that parallelism.

Scale adaptivity (the 100 TB story): at cluster scale inputs arrive as
many files / many row groups, the estimated scan-task count meets or
exceeds ``defaultParallelism``, and ``spread`` is a NO-OP — no shuffle
is added where the scan already parallelises.  The repartition fires
exactly in the degenerate case (one unsplittable file, or fewer input
splits than cores) where a narrow shuffle is strictly cheaper than a
serialised map stage.  Estimation uses ``DataFrame.inputFiles()`` plus
file sizes — public APIs, no RDD materialisation, no job execution.

Partitioning by the downstream grouping key (``doc_id`` for the per-doc
aggregates) lets Spark reuse the exchange for a following
``groupBy(key)`` when the partition counts line up, so the added
shuffle replaces — not precedes — the aggregate's own exchange.
"""

from __future__ import annotations

import math
import os
from urllib.parse import urlparse

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_UNITS = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}


def _parse_bytes(v: str) -> int:
    s = str(v).strip().lower()
    for suffix, mult in _UNITS.items():
        if s.endswith(suffix + "b"):
            s = s[: -len(suffix) - 1]
            return int(float(s) * mult)
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)]) * mult)
    return int(float(s))


def _est_scan_tasks(df: DataFrame) -> int | None:
    """Estimated scan parallelism from the input file list, or None when
    the frame has no file source (in-memory test frames, post-shuffle
    plans — those already carry their own partitioning)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    try:
        mpb = _parse_bytes(
            df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "128m")
        )
    except Exception:
        mpb = 128 * 1024**2
    tasks = 0
    for uri in files:
        parsed = urlparse(uri)
        if parsed.scheme not in ("", "file"):
            # remote storage: size probing is not worth a driver round
            # trip here; many files => enough parallelism anyway
            tasks += 1
            continue
        try:
            size = os.path.getsize(parsed.path or uri)
        except OSError:
            return None
        tasks += max(1, math.ceil(size / mpb))
    return tasks


def spread(df: DataFrame, key: str | None = None) -> DataFrame:
    """Repartition ``df`` across the session's cores iff its scan cannot
    parallelise on its own (see module docstring).  ``key`` hash-spreads
    on a column (pick the downstream grouping key so the exchange is
    reused); ``None`` round-robins."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if target <= 1:
        return df
    est = _est_scan_tasks(df)
    if est is None or est >= target:
        return df
    if key is not None:
        return df.repartition(target, F.col(key))
    return df.repartition(target)
