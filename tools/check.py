#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out>/<name> parquet (Spark result) and runs the matching SQL
from <out>/oracle_sql.json in DuckDB over the raw parquet tables; compares
schema (column names sorted), row count, and values (rows sorted by all
columns, exact equality; NaN==NaN).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

# The driver's hash compares values AT STORAGE TYPE: an un-cast DuckDB
# SUM(BIGINT) is HUGEINT (int128) and hash-mismatches Spark's int64 even
# when every value is identical (the round-9 failure mode). Only these
# result column types are allowed on the oracle side; anything else
# (HUGEINT, DECIMAL, FLOAT, INTEGER...) must be CAST in the oracle SQL.
ALLOWED_TYPES = {"BIGINT", "DOUBLE", "VARCHAR", "BOOLEAN", "DATE",
                 "TIMESTAMP", "TIMESTAMP WITH TIME ZONE"}

def bad_types(con, sql):
    """Return [(col, type)] for oracle result columns outside ALLOWED_TYPES."""
    rel = con.sql(sql)
    return [(c, str(t)) for c, t in zip(rel.columns, rel.types)
            if str(t) not in ALLOWED_TYPES
            and not str(t).startswith("BIGINT[")
            and not str(t).startswith("DOUBLE[")
            and not str(t).startswith("VARCHAR[")]

def selftest():
    """Guard must flag a deliberately un-cast SUM (HUGEINT) and a raw
    DECIMAL, and accept the driver-safe types."""
    con = duckdb.connect()
    assert bad_types(con, "SELECT SUM(x) AS n FROM (VALUES (CAST(1 AS BIGINT))) t(x)"), \
        "un-cast SUM(BIGINT) (HUGEINT) not flagged"
    assert bad_types(con, "SELECT CAST(1.5 AS DECIMAL(38,8)) AS d"), \
        "DECIMAL not flagged"
    assert not bad_types(con, "SELECT CAST(1 AS BIGINT) AS a, 1.0::DOUBLE AS b, "
                              "'x' AS c, TRUE AS d"), "driver-safe types flagged"
    print("selftest OK: type guard flags HUGEINT/DECIMAL, accepts safe set")

def main():
    if sys.argv[1:] == ["--selftest"]:
        selftest(); return
    out, sf = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            spark_df = pd.read_parquet(f"{out}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); n_fail += 1; continue
        try:
            bt = bad_types(con, sql)
            if bt:
                print(f"FAIL {name}: oracle result type(s) outside the "
                      f"driver-safe set: {bt} — CAST in the oracle SQL")
                n_fail += 1; continue
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); n_fail += 1; continue
        ok = True
        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                    eq = (av.astype(float).fillna(math.nan).values ==
                          bv.astype(float).fillna(math.nan).values)
                    import numpy as np
                    eq = eq | (av.isna().values & bv.isna().values)
                else:
                    eq = (av.astype(object).values == bv.astype(object).values)
                if not eq.all():
                    import numpy as np
                    bad = (~eq).nonzero()[0][:3]
                    print(f"FAIL {name}: col {c} mismatch at rows {bad.tolist()}: "
                          f"spark={av.iloc[bad].tolist()} duck={bv.iloc[bad].tolist()}")
                    ok = False; break
            except Exception as e:
                print(f"FAIL {name}: col {c} compare error {e}"); ok = False; break
        if ok:
            print(f"PASS {name} ({len(a)} rows)"); n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
