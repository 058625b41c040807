"""Schema-parity guard: every oracle pair must produce identical
column names AND pandas dtypes on both engines (limit-0, so this is a
plan-only check — fast). Catches int-width / timestamp-precision
regressions before the driver's schema+value-hash gate does."""

import duckdb
import pytest

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def test_all_oracle_pairs_dtype_aligned(spark):
    import __spark_entry__

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    qs = __spark_entry__.queries()
    oracles = __spark_entry__.oracle_sql()
    # <= 50 so every entry fits the driver's per-round query budget
    # (CORRECTNESS_r01 recorded exactly the first 50 of 54)
    assert 49 <= len(qs) <= 50 and len(oracles) >= len(qs) - 1
    problems = []
    for name, fn in qs.items():
        if name not in oracles:
            continue
        sdf = fn(spark, SF).limit(0).toPandas()
        odf = con.sql(f"SELECT * FROM ({oracles[name]}) AS _q LIMIT 0").df()
        s = {c: str(sdf[c].dtype) for c in sorted(sdf.columns)}
        o = {c: str(odf[c].dtype) for c in sorted(odf.columns)}
        if set(s) != set(o):
            problems.append((name, "columns", sorted(s), sorted(o)))
            continue
        diffs = {c: (s[c], o[c]) for c in s if s[c] != o[c]}
        if diffs:
            problems.append((name, "dtypes", diffs))
    assert problems == [], problems
