"""Local stand-in for the driver's DuckDB-oracle harness.

Runs every __spark_entry__.queries() entry at sf0.01 on Spark and the
matching oracle_sql() on DuckDB over the same parquet, then compares
row count, column names, and order-insensitive values. Exit code 1 on
any mismatch.

Usage: python scripts/check_oracle.py [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import os

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            continue
        if str(pdf[c].dtype).startswith("float"):
            pdf[c] = pdf[c].round(6)
        if str(pdf[c].dtype).startswith(("int", "uint", "Int")):
            pdf[c] = pdf[c].astype("float64")  # unify int widths
    return pdf.sort_values(by=list(pdf.columns), na_position="first").reset_index(drop=True)


def main() -> int:
    import __spark_entry__
    from neuroner_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("oracle_check", cores=8, shuffle_partitions=8,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs = __spark_entry__.queries()
    oracles = __spark_entry__.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {str(e)[:2000]}")
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(sdf)} (no oracle, rows-only)")
            if len(sdf) == 0:
                failures.append((name, "0 rows with no oracle"))
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error {str(e)[:2000]}")
            continue
        a, b = normalize(sdf), normalize(odf)
        if list(a.columns) != list(b.columns):
            failures.append((name, f"columns {list(a.columns)} vs {list(b.columns)}"))
            print(f"FAIL  {name}: column mismatch {list(a.columns)} vs {list(b.columns)}")
            continue
        if len(a) != len(b):
            failures.append((name, f"rows {len(a)} vs {len(b)}"))
            print(f"FAIL  {name}: row count {len(a)} vs {len(b)}")
            continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-6)
            print(f"ok    {name}: rows={len(a)}")
        except AssertionError as e:
            failures.append((name, "values"))
            print(f"FAIL  {name}: value mismatch\n{str(e)[:1500]}")
            diff = a.compare(b) if a.shape == b.shape else None
            if diff is not None and not diff.empty:
                print(diff.head(10))
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
