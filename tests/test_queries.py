"""Cross-check every SQL-expressible query against its DuckDB oracle,
reproducing the driver's compare: row count + schema width +
order-insensitive value hash with columns sorted by name."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"  # small SF keeps the suite fast
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    # Mirror the driver: NO float coercion — an integer column that
    # surfaces as float64 (e.g. DuckDB HUGEINT through pandas) must
    # hash differently ("23287.0" vs "23287") so type drift is caught.
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x01".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


@pytest.fixture(scope="module")
def oracle_con():
    return _duck(SF_DIR)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, oracle_con, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    # fetch through Arrow; any decimal128 column means the oracle SQL
    # produced a DuckDB HUGEINT (un-cast SUM) — the driver's hash then
    # sees "23287.0" vs Spark's int64 "23287" and fails, so fail HERE.
    dtab = oracle_con.execute(ORACLES[name]).arrow()
    import pyarrow.types as patypes

    hugeint_cols = [
        f.name for f in dtab.schema if patypes.is_decimal(f.type)
    ]
    assert not hugeint_cols, (
        f"{name}: oracle columns {hugeint_cols} are HUGEINT — wrap the "
        "SUM in CAST(... AS BIGINT) (driver hash surfaces these as float)"
    )
    duck_cols = [c.lower() for c in dtab.column_names]
    duck_rows = [
        tuple(row[c] for c in dtab.column_names) for row in dtab.to_pylist()
    ]

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows), (name, len(spark_rows), len(duck_rows))
    sh = _value_hash(spark_rows, spark_cols)
    dh = _value_hash(duck_rows, duck_cols)
    assert sh == dh, f"{name}: value hash mismatch"


def test_no_unoracled_queries_remain():
    """Every catalog query carries a DuckDB oracle (q22 was the last
    rows-only holdout until its deterministic report got a golden
    VALUES oracle) — new queries must ship with one too."""
    assert set(QUERIES) == set(ORACLES), sorted(set(QUERIES) - set(ORACLES))


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
