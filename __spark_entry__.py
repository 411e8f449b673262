"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: treats the sf0.001 ``documents`` table as
a single-version code corpus, runs the full J1 encode (codec
auto-selection, skew-aware partitioning), and returns the
per-partition metrics DataFrame.

``queries()`` / ``oracle_sql()`` — the operator catalog from
SURVEY.md §2 (codec-engine analytics + training-data-pipeline ops),
implemented in deltoid_spark.queries.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ship_package(spark: SparkSession) -> None:
    """Prepare a caller-provided session: ship the package zip to the
    Python workers and pin the runtime-settable confs the queries
    assume (UTC windows for oracle parity, Arrow-batched UDFs)."""
    from deltoid_spark.session import package_zip

    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    except Exception:
        pass
    try:
        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass  # already added in this session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    import pyspark.sql.functions as F

    from deltoid_spark.jobs import encode

    _ship_package(spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    code_table = docs.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("docs/"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.md5(F.col("doc_id").cast("string")).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
    out = tempfile.mkdtemp(prefix="ds_entry_")
    return encode(spark, code_table, out, target_rows=200)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from deltoid_spark import queries as q

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in q.queries().items()}


def oracle_sql() -> dict[str, str]:
    from deltoid_spark import queries as q

    return q.oracle_sql()
