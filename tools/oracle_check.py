"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a scale factor and
compares against its oracle_sql() in DuckDB: row count, sorted column
names, dtypes (loose), and an order-insensitive value comparison.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from lens_spark.session import get_spark, TABLES  # noqa: E402


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).dt.floor("us")
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> str:
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return f"COLS spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
    if len(spark_pdf) != len(oracle_pdf):
        return f"ROWS spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce").astype(float)
            bv = pd.to_numeric(bv, errors="coerce").astype(float)
            both_nan = av.isna() & bv.isna()
            if not bool(((av == bv) | both_nan).all()):
                diff = (av - bv).abs()
                return f"VALS col={c} maxdiff={np.nanmax(diff.values)} n_bad={(~((av==bv)|both_nan)).sum()}"
        else:
            if not bool((av.astype(str) == bv.astype(str)).all()):
                bad = (av.astype(str) != bv.astype(str))
                i = bad[bad].index[0]
                return f"VALS col={c} first_bad: spark={av[i]!r} oracle={bv[i]!r} n_bad={bad.sum()}"
    return "OK"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as exc:
            print(f"{name:28s} SPARK-ERROR {type(exc).__name__}: {str(exc)[:140]}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"{name:28s} rows-only ({len(spark_pdf)} rows)")
            continue
        try:
            oracle_pdf = con.sql(sql).df()
        except Exception as exc:
            print(f"{name:28s} ORACLE-ERROR {type(exc).__name__}: {str(exc)[:140]}")
            failures += 1
            continue
        verdict = compare(name, spark_pdf, oracle_pdf)
        print(f"{name:28s} {verdict}  ({len(spark_pdf)} rows)")
        if verdict != "OK":
            failures += 1
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
