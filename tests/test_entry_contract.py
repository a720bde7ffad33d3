"""Mini-driver: run every __spark_entry__ query against its DuckDB oracle
exactly the way the real driver does (row count + column names + values),
at sf0.001 for speed (the driver uses sf0.01; both are shape-identical).
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 7)
    return v


def _rows(pdf):
    cols = sorted(pdf.columns)
    return sorted(
        tuple(_canon(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)
    )


ORACLE_KEYS = sorted(E.oracle_sql())
ROWS_ONLY_KEYS = sorted(set(E.queries()) - set(E.oracle_sql()))


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) > 0


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, con, name):
    q = E.queries()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    duck_pdf = con.execute(E.oracle_sql()[name]).df()
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    a, b = _rows(spark_pdf), _rows(duck_pdf)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    mism = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mism, f"{name}: first diffs {mism[:5]}"


@pytest.mark.parametrize("name", ROWS_ONLY_KEYS)
def test_rows_only_queries_run(spark, name):
    q = E.queries()[name]
    df = q(spark, SF_DIR)
    assert df.count() >= 0 and len(df.columns) > 0
