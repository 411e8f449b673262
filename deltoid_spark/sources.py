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
    """Read the code table from parquet / orc / csv / json, canonical schema."""
    if format == "parquet":
        df = spark.read.parquet(path)
    elif format == "orc":
        df = spark.read.orc(path)
    elif format == "csv":
        df = spark.read.schema(CODE_SCHEMA).option("header", "true").option(
            "multiLine", "true"
        ).option("escape", '"').csv(path)
    elif format in ("json", "jsonl"):
        df = spark.read.schema(CODE_SCHEMA).json(path)
    else:
        raise ValueError(f"unsupported format {format!r}")
    return df.select(*[F.col(c).cast("string").alias(c) for c in COLUMNS])


def read_raw_tree(spark: SparkSession, root: str, repo: str, commit: str = "HEAD") -> DataFrame:
    """Ingest an actual source tree: one row per file, path relative to
    ``root`` — how a real corpus build would feed working-tree snapshots
    into the encoder (commit chains then accrue via encode_append).

    Uses Spark's wholetext reader so file contents never split across
    rows; language is inferred from the extension.
    """
    ext_lang = {
        "py": "python", "rs": "rust", "js": "javascript", "java": "java",
        "go": "go", "cc": "cpp", "cpp": "cpp", "c": "c", "rb": "ruby",
        "scala": "scala", "kt": "kotlin", "ts": "typescript", "sh": "shell",
    }
    lang_expr = F.create_map(
        *[x for k, v in ext_lang.items() for x in (F.lit(k), F.lit(v))]
    )
    df = (
        spark.read.option("recursiveFileLookup", "true")
        .text(root, wholetext=True)
        .select(
            F.input_file_name().alias("uri"),
            F.col("value").alias("content"),
        )
    )
    import re as _re

    # input_file_name yields file:///abs/path — normalize the scheme
    # slashes, then strip the root prefix
    norm = F.regexp_replace("uri", "^file:/+", "/")
    rel = F.regexp_replace(norm, "^" + _re.escape(root.rstrip("/")) + "/", "")
    ext = F.element_at(F.split(rel, "\\."), -1)
    return df.select(
        F.lit(repo).alias("repo"),
        rel.alias("path"),
        F.lit(commit).alias("commit"),
        F.coalesce(lang_expr[ext], F.lit("unknown")).alias("lang"),
        "content",
    )


def write_decoded(df: DataFrame, path: str, format: str = "parquet") -> None:
    """Sink for decoded rows (parquet default; csv/json for export)."""
    writer = df.write.mode("overwrite")
    if format == "parquet":
        writer.parquet(path)
    elif format == "orc":
        writer.orc(path)
    elif format == "csv":
        writer.option("header", "true").option("escape", '"').csv(path)
    elif format in ("json", "jsonl"):
        writer.json(path)
    else:
        raise ValueError(f"unsupported format {format!r}")
