#!/usr/bin/env python3
"""Self-check: mimic the driver's DuckDB-oracle comparison.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
For each query dir under verifyOutDir: load the Spark parquet result,
run the oracle SQL in DuckDB over the sfDir tables, sort columns by
name, sort rows, compare values (floats to 1e-9).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in
                              sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))])
        duck_df = con.execute(sql).df()
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1; continue
        ok = True
        for c in a.columns:
            av, bv = a[c], b[c]
            if str(a[c].dtype) != str(b[c].dtype):
                print(f"  WARN {name}.{c}: dtype {a[c].dtype} vs {b[c].dtype}")
            try:
                import numpy as np
                if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                    bad = ~np.isclose(av.astype(float), bv.astype(float),
                                      rtol=0, atol=1e-9, equal_nan=True)
                else:
                    bad = av.astype(object).ne(bv.astype(object))
                if bad.any():
                    i = bad.idxmax()
                    print(f"FAIL {name}.{c}: first diff row {i}: {av[i]!r} vs {bv[i]!r}")
                    ok = False
            except Exception as e:
                print(f"FAIL {name}.{c}: compare error {e}")
                ok = False
        if ok:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    except Exception as e:
        print(f"FAIL {name}: {e}")
        n_fail += 1

print(f"\n{n_pass} pass / {n_fail} fail")
sys.exit(1 if n_fail else 0)
