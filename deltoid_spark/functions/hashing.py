"""The ONE documented scale switch for content hashing.

Every curation operator that hashes content (shingles, lines,
trigrams, fingerprints) takes ``portable: bool = True``:

- ``portable=True`` (default everywhere): hashes derive from md5, so
  any engine with md5 + integer arithmetic — the DuckDB correctness
  oracles, or a second engine auditing a production run — reproduces
  every value bit-for-bit.  This is the verifiability path.
- ``portable=False``: the 100 TB path.  The SAME logical plan with
  seeded xxhash64 (one JVM intrinsic per value; no hex string
  round-trip through conv/substring) — measured 1.65x on LSH
  candidate-pair signatures and ~1.4-2x on 60-bit keyed joins
  (BASELINE.md "portable switch" table).  Values differ from the
  portable ones, so never mix settings within one artifact (a dedup
  table built portable can't be probed non-portable).

Hash quality note: both paths give uniformly-distributed keys, so
bucket-join/groupBy skew behavior is identical; only throughput and
cross-engine reproducibility differ.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def hash60(col, portable: bool = True) -> Column:
    """60-bit non-negative long content hash — the join/aggregate key
    compression (strings leave the shuffle, 8-byte longs ride it).
    portable: first 15 md5 hex digits; scale: xxhash64 >> 4 (both land
    in [0, 2^60), collision odds ~n^2/2^61 — fine for verify-after
    candidate keys)."""
    c = _c(col)
    if portable:
        return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
    return F.shiftrightunsigned(F.xxhash64(c), 4)


def fingerprint_hex(col, portable: bool = True) -> Column:
    """Hex content fingerprint (document-identity key). portable: md5
    (32 hex chars); scale: xxhash64 as 16 hex chars."""
    c = _c(col)
    if portable:
        return F.md5(c)
    return F.lower(F.hex(F.xxhash64(c)))
