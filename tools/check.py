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

def main():
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
