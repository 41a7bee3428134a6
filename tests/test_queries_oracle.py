"""Mirror of the driver's correctness gate (SURVEY.md §5.2.5): run every
registered query on Spark AND its DuckDB oracle twin on the same
parquet, compare row count + column names + order-insensitive value
hash. Runs at sf0.01 — the exact scale the driver uses."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(val):
    """Normalize a cell so Spark and DuckDB results hash identically."""
    if val is None:
        return "␀"
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return f"{val:.6g}"
    if isinstance(val, bool):
        return str(int(val))
    return str(val)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


SQL_KEYS = sorted(entrymod.oracle_sql())
ROWS_ONLY_KEYS = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("qkey", SQL_KEYS)
def test_sql_oracle_parity(spark, ddb, qkey):
    df = entrymod.queries()[qkey](spark, SF_DIR)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    res = ddb.execute(entrymod.oracle_sql()[qkey])
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(ddb_cols), f"{qkey}: column names differ"
    assert len(spark_rows) == len(ddb_rows), f"{qkey}: row count differs"
    assert _rowset(spark_cols, spark_rows) == _rowset(ddb_cols, ddb_rows), (
        f"{qkey}: value mismatch"
    )


@pytest.mark.parametrize("qkey", ROWS_ONLY_KEYS)
def test_rows_only_queries_run(spark, qkey):
    df = entrymod.queries()[qkey](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
