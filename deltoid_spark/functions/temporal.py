"""Temporal operators: as-of join and sessionization.

Both are engine-new operators for the event-timeline side of a
training-data pipeline (point-in-time feature lookup, activity
sessionization); Spark has no built-in as-of join (Pandas/DuckDB do),
so it's realized here as a composition of built-in DataFrame ops.

Scale notes: the as-of join is the union-tag-window formulation — tag
the two inputs, union them, and let one window pass per key carry the
most recent right-side row forward.  That is ONE shuffle on the join
key and ONE sort, independent of how many right rows precede each left
row; the naive alternatives (range-join then max-per-key, or a
per-row correlated lookup) explode quadratically on hot keys.
Sessionization is two window expressions over the same (key, ts)
sort — Catalyst evaluates both in a single exchange + sort.  Neither
operator moves any data to the driver.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def micros(col: str | Column) -> Column:
    """Epoch microseconds of a timestamp column.  The testdata parquet
    carries TIMESTAMP_NTZ, which unix_micros rejects; the cast is exact
    because every session here pins spark.sql.session.timeZone=UTC."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    *,
    direction: str = "backward",
    strict: bool = False,
    tolerance_us: int | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """For every left row, attach the temporally nearest right row per
    key: the latest right row with ``right_ts <= left_ts`` (backward,
    the default) or the earliest with ``right_ts >= left_ts``
    (forward).  ``strict=True`` excludes exact timestamp ties;
    ``tolerance_us`` nulls out matches farther than the given gap.

    Right payload columns come back ``prefix``-renamed (nullable —
    left rows with no qualifying right row keep their columns null,
    i.e. LEFT OUTER as-of semantics, matching DuckDB's ASOF LEFT JOIN).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    key = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in key]
    clash = set(prefix + c for c in payload) & set(left.columns)
    if clash:
        raise ValueError(f"prefixed right columns collide with left: {sorted(clash)}")
    reserved = {"__t", "__tag", "__m", "__r"} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(f"reserved column names in inputs: {sorted(reserved)}")

    # Tag order decides tie behavior: with the right row sorting BEFORE
    # the left row at an equal timestamp, the window's running "last
    # right row seen" includes the tie (inclusive); flipping the tags
    # excludes it (strict).
    l_tag, r_tag = (1, 0) if not strict else (0, 1)
    lhs = left.withColumn("__t", F.col(left_ts)).withColumn("__tag", F.lit(l_tag))
    rhs = right.select(
        *key,
        F.col(right_ts).alias("__t"),
        F.lit(r_tag).alias("__tag"),
        F.lit(1).alias("__m"),
        *[F.col(c).alias(prefix + c) for c in payload],
    )
    u = lhs.unionByName(rhs, allowMissingColumns=True)

    order = [F.col("__t"), F.col("__tag")]
    if direction == "forward":
        order = [F.col("__t").desc(), F.col("__tag")]
    w = (
        Window.partitionBy(*key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rstruct = F.when(
        F.col("__m") == 1, F.struct(*[F.col(prefix + c) for c in payload])
    )
    matched = F.last(rstruct, ignorenulls=True).over(w).alias("__r")

    out = (
        u.withColumn("__r", matched)
        .filter(F.col("__tag") == l_tag)
        .select(*left.columns, "__r")
    )
    if tolerance_us is not None:
        gap = F.abs(micros(left_ts) - micros(F.col(f"__r.{prefix}{right_ts}")))
        out = out.withColumn("__r", F.when(gap <= tolerance_us, F.col("__r")))
    return out.select(
        *left.columns,
        *[F.col(f"__r.{prefix}{c}").alias(prefix + c) for c in payload],
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_s: int = 21600,
) -> DataFrame:
    """Assign each event a per-key session index: a new session starts
    whenever the gap to the previous event of the same key exceeds
    ``gap_s`` seconds (first event per key starts session 1).

    Two stacked window expressions (lag -> running sum) over the same
    (key, ts) ordering — one exchange, one sort in the physical plan.
    """
    w = Window.partitionBy(key).orderBy(ts)
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tus = micros(ts)
    prev = F.lag(tus).over(w)
    new_s = (
        F.when(prev.isNull() | (tus - prev > gap_s * 1_000_000), 1)
        .otherwise(0)
        .cast("long")
    )
    return (
        events.withColumn("__new", new_s)
        .withColumn("session_idx", F.sum("__new").over(wc))
        .drop("__new")
    )


def session_stats(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_s: int = 21600,
) -> DataFrame:
    """Per-session roll-up: event count, start, and duration (µs)."""
    s = sessionize(events, key, ts, gap_s)
    tus = micros(ts)
    return (
        s.groupBy(key, "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min(tus).alias("start_us"),
            (F.max(tus) - F.min(tus)).alias("dur_us"),
        )
        .orderBy(key, "session_idx")
    )
