"""Source readers for the code table (multi-format ingest).

The reference has no I/O layer (serde is its only "format",
/root/reference/deltoid/src/core.rs:10-12); the engine's canonical
at-rest format is parquet (Iceberg-style directory layout), with CSV /
JSON-lines accepted at ingest.  Every reader enforces the canonical
5-string schema so downstream kernels never see drifting types.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

CODE_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)

COLUMNS = [f.name for f in CODE_SCHEMA.fields]


def read_code_table(spark: SparkSession, path: str, format: str = "parquet") -> DataFrame:
    """Read the code table from parquet / csv / json, canonical schema."""
    if format == "parquet":
        df = spark.read.parquet(path)
    elif format == "csv":
        df = spark.read.schema(CODE_SCHEMA).option("header", "true").option(
            "multiLine", "true"
        ).option("escape", '"').csv(path)
    elif format in ("json", "jsonl"):
        df = spark.read.schema(CODE_SCHEMA).json(path)
    else:
        raise ValueError(f"unsupported format {format!r}")
    return df.select(*[F.col(c).cast("string").alias(c) for c in COLUMNS])


def write_decoded(df: DataFrame, path: str, format: str = "parquet") -> None:
    """Sink for decoded rows (parquet default; csv/json for export)."""
    writer = df.write.mode("overwrite")
    if format == "parquet":
        writer.parquet(path)
    elif format == "csv":
        writer.option("header", "true").option("escape", '"').csv(path)
    elif format in ("json", "jsonl"):
        writer.json(path)
    else:
        raise ValueError(f"unsupported format {format!r}")
