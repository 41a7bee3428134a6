"""Mirror of the driver's correctness gate (SURVEY.md §5.2.5): run every
registered query on Spark AND its DuckDB oracle twin on the same
parquet, compare row count + column names + order-insensitive value
hash. Runs at sf0.01 — the exact scale the driver uses."""

from __future__ import annotations

import math

import duckdb
import numpy as _np
import pandas as _pd
import pytest

import __spark_entry__ as entrymod

pytestmark = pytest.mark.slow  # multi-minute: deselect with -m "not slow"

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
    if isinstance(val, (list, tuple, _np.ndarray)):
        return "[" + ",".join(_canon(v) for v in val) + "]"
    if val is None or (isinstance(val, float) and math.isnan(val)) or val is _pd.NaT:
        return "␀"
    if isinstance(val, float):
        return f"{val:.6g}"
    if isinstance(val, bool):
        return str(int(val))
    return str(val)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def _dtype_kinds(pdf):
    """Per-column pandas dtype kind, sorted by column name. The driver
    hashes TYPED values (round-1 `group_agg` failed on DuckDB HUGEINT vs
    Spark BIGINT while the stringified compare stayed green) — comparing
    the pandas dtype kind on both sides reproduces that class of failure
    locally. Numeric-with-nulls relaxation: pandas upcasts nullable ints
    to float ('f'/'O') engine-dependently, so int-vs-float mismatches are
    only flagged when NEITHER column has nulls."""
    out = {}
    for c in sorted(pdf.columns):
        kind = pdf[c].dtype.kind
        if kind == "O" and pdf[c].notna().any():
            sample = pdf[c].dropna().iloc[0]
            if isinstance(sample, bool):
                kind = "b"
            elif isinstance(sample, int):
                kind = "i"
            elif isinstance(sample, float):
                kind = "f"
        out[c] = (kind, bool(pdf[c].isna().any()))
    return out


def _assert_kinds_match(qkey, spark_pdf, ddb_pdf):
    sk, dk = _dtype_kinds(spark_pdf), _dtype_kinds(ddb_pdf)
    for c in sk:
        (k1, null1), (k2, null2) = sk[c], dk[c]
        if k1 == k2:
            continue
        numeric = {"i", "u", "f"}
        if k1 in numeric and k2 in numeric and (null1 or null2):
            continue  # nullable-int upcast ambiguity
        raise AssertionError(
            f"{qkey}: column {c!r} dtype kind differs (spark={k1}, oracle={k2})"
        )


SQL_KEYS = sorted(entrymod.oracle_sql())
ROWS_ONLY_KEYS = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("qkey", SQL_KEYS)
def test_sql_oracle_parity(spark, ddb, qkey):
    df = entrymod.queries()[qkey](spark, SF_DIR)
    spark_cols = df.columns
    spark_pdf = df.toPandas()
    spark_rows = list(spark_pdf.itertuples(index=False, name=None))

    ddb_pdf = ddb.execute(entrymod.oracle_sql()[qkey]).df()
    ddb_cols = list(ddb_pdf.columns)
    ddb_rows = list(ddb_pdf.itertuples(index=False, name=None))

    assert sorted(spark_cols) == sorted(ddb_cols), f"{qkey}: column names differ"
    assert len(spark_rows) == len(ddb_rows), f"{qkey}: row count differs"
    _assert_kinds_match(qkey, spark_pdf, ddb_pdf)
    assert _rowset(spark_cols, spark_rows) == _rowset(ddb_cols, ddb_rows), (
        f"{qkey}: value mismatch"
    )


@pytest.mark.parametrize("qkey", ROWS_ONLY_KEYS)
def test_rows_only_queries_run(spark, qkey):
    """Every rows-only qkey must emit >0 rows at sf0.01: a 0-row
    rows-only driver check is indistinguishable from a broken operator
    (round-1 `substr_dedup` lesson). Each registered rows-only op
    semantically must produce output on this input."""
    df = entrymod.queries()[qkey](spark, SF_DIR)
    assert df.count() > 0, f"{qkey}: rows-only qkey produced 0 rows"
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
