#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <verifyOutDir> <sfDir>

Registers each /root/testdata table as a DuckDB view, runs every
oracle_sql.json entry, and compares against the Spark parquet dump in
<verifyOutDir>/<name>/ — column names sorted, rows sorted, values
compared exactly (floats via repr).
"""
import sys, os, json, glob
import duckdb

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"MISSING  {name}: no spark output dir"); n_fail += 1; continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"ORAERR   {name}: {e}"); n_fail += 1; continue
        sdf = con.execute(
            f"SELECT * FROM '{spark_dir}/*.parquet'").fetchdf()
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"SCHEMA   {name}: oracle={ocols} spark={scols}"); n_fail += 1; continue
        o = odf[ocols].astype(str).apply(tuple, axis=1).sort_values().tolist()
        s = sdf[scols].astype(str).apply(tuple, axis=1).sort_values().tolist()
        if len(o) != len(s):
            print(f"ROWS     {name}: oracle={len(o)} spark={len(s)}"); n_fail += 1; continue
        if o != s:
            diffs = [(a, b) for a, b in zip(o, s) if a != b][:3]
            print(f"HASH     {name}: {len([1 for a,b in zip(o,s) if a!=b])} differing rows, e.g. {diffs}")
            n_fail += 1; continue
        print(f"PASS     {name} ({len(o)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
