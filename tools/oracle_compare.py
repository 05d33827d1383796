#!/usr/bin/env python3
"""Driver-style oracle compare: run oracle_sql.json in DuckDB over the
testdata parquet and diff against the Spark outputs written by graft.Verify.

Usage: oracle_compare.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import pyarrow.parquet as pq

def main(sf, out):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    failures = 0
    spark_dirs = {d for d in os.listdir(out)
                  if os.path.isdir(os.path.join(out, d))}
    for name in sorted(spark_dirs - set(oracle)):
        print(f"{name}: rows-only (no oracle SQL)")
    for name, sql in sorted(oracle.items()):
        pdir = f"{out}/{name}"
        if not os.path.isdir(pdir):
            print(f"{name}: MISSING spark output"); failures += 1; continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR {e}"); failures += 1; continue
        files = glob.glob(pdir + "/*.parquet")
        sdf = pd.concat([pq.read_table(f).to_pandas() for f in files]) \
            if files else pd.DataFrame()
        oc, sc = sorted(odf.columns), sorted(sdf.columns)
        if oc != sc:
            print(f"{name}: SCHEMA MISMATCH oracle={oc} spark={sc}")
            failures += 1; continue
        o = odf[oc].sort_values(oc).reset_index(drop=True)
        s = sdf[oc].sort_values(oc).reset_index(drop=True)
        if len(o) != len(s):
            print(f"{name}: ROWCOUNT oracle={len(o)} spark={len(s)}")
            failures += 1; continue
        try:
            pd.testing.assert_frame_equal(o, s, check_dtype=False,
                                          check_exact=True)
            print(f"{name}: OK ({len(o)} rows)")
        except AssertionError as e:
            print(f"{name}: VALUE MISMATCH {str(e)[:300]}")
            failures += 1
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
