"""T7: every queries() entry runs; SQL-expressible ones match DuckDB
exactly (row count + order-insensitive values), mimicking the driver's
CORRECTNESS harness at sf0.01."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(rows, cols):
    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 6)
        return v

    return sorted(tuple(norm(r[c]) for c in sorted(cols)) for r in rows)


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_runs_and_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF_DIR)
    cols = df.columns
    spark_rows = [r.asDict() for r in df.collect()]
    assert len(spark_rows) >= 0  # runs with stable schema

    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        assert len(spark_rows) > 0, f"{name}: rows-only query returned nothing"
        return
    oracle = ddb.sql(sql)
    ocols = [d[0] for d in oracle.description]
    assert sorted(cols) == sorted(ocols), f"{name}: column names differ"
    orows = [dict(zip(ocols, r)) for r in oracle.fetchall()]
    assert len(spark_rows) == len(orows), f"{name}: row count {len(spark_rows)} vs {len(orows)}"
    assert _canon(spark_rows, cols) == _canon(orows, ocols), f"{name}: values differ"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"rec_id", "url", "cluster_id"}
