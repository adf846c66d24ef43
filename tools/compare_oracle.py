#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Reads oracle_sql.json + per-query parquet dirs from Verify's outDir, runs
each oracle against the sf tables in DuckDB, and diffs: schema (column
names, sorted), row count, and a hash over column-name-sorted,
row-sorted values.
"""
import json, sys, glob
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize values to strings to sidestep dtype-representation noise
    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "<null>"
        if pd.isna(v) if not isinstance(v, (list, tuple, set, dict)) else False:
            return "<null>"
        if isinstance(v, float):
            return repr(v)
        return str(v)
    out = df.map(cell)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = p.split("/")[-1].replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            expect = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            bad += 1
            continue
        try:
            got = pd.concat([pd.read_parquet(f)
                             for f in glob.glob(f"{out_dir}/{name}/*.parquet")],
                            ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            bad += 1
            continue
        ce, cg = canon(expect), canon(got)
        if list(ce.columns) != list(cg.columns):
            print(f"FAIL {name}: columns {list(cg.columns)} != {list(ce.columns)}")
            bad += 1
            continue
        if len(ce) != len(cg):
            print(f"FAIL {name}: rows {len(cg)} != {len(ce)}")
            bad += 1
            continue
        if not ce.equals(cg):
            diff = (ce != cg).any(axis=1)
            i = diff.idxmax()
            print(f"FAIL {name}: value mismatch at sorted-row {i}:")
            print(f"  oracle: {ce.iloc[i].to_dict()}")
            print(f"  spark : {cg.iloc[i].to_dict()}")
            bad += 1
            continue
        ok += 1
        print(f"OK   {name} ({len(ce)} rows)")
    print(f"\n{ok} ok, {bad} fail")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
