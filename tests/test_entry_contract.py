"""Driver-contract smoke: every queries() entry constructs a DataFrame
(plan only — execution is the oracle harness's job), every oracle_sql()
entry is valid DuckDB SQL over the registered views, and names/columns
line up. Catches entry-file regressions inside pytest instead of at
driver time.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def test_every_query_constructs_a_plan(spark):
    queries = entrymod.queries()
    assert len(queries) >= 42
    for name, fn in queries.items():
        df = fn(spark, SF)
        assert df is not None and df.columns, f"{name} built no plan"


def test_every_oracle_is_valid_sql_with_matching_columns(spark, con):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(queries), "oracle without a query"
    for name, sql in oracles.items():
        rel = con.sql(sql)
        spark_cols = sorted(queries[name](spark, SF).columns)
        assert sorted(rel.columns) == spark_cols, (
            f"{name}: oracle columns {sorted(rel.columns)} != spark {spark_cols}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
