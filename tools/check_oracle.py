#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle gate (dev tool only; the
engine itself is pure Scala/Spark — this script just lets us catch SQL
dialect / precision mismatches before the round ends).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <verifyOutDir>/<name>/ parquet (Spark result), runs the
matching oracle_sql.json query in DuckDB over the <sfDir> tables, sorts
columns by name and rows by all columns, and diffs exactly.
"""
import duckdb, glob, json, os, sys

def main(sfdir, outdir):
    con = duckdb.connect()
    for p in sorted(glob.glob(os.path.join(sfdir, "*.parquet"))):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_glob = os.path.join(outdir, name, "*.parquet")
        if not glob.glob(spark_glob):
            print(f"MISS  {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(f"SELECT * FROM read_parquet('{spark_glob}')").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"ERR   {name}: {e}")
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL  {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL  {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        gs = got.astype(str).sort_values(by=list(got.columns)).reset_index(drop=True)
        ws = want.astype(str).sort_values(by=list(want.columns)).reset_index(drop=True)
        if gs.equals(ws):
            print(f"OK    {name} ({len(got)} rows)")
            n_pass += 1
        else:
            diff = (gs != ws).any(axis=1)
            print(f"FAIL  {name}: {int(diff.sum())}/{len(gs)} rows differ; first:")
            idx = diff[diff].index[0]
            print(f"  spark:  {gs.loc[idx].to_dict()}")
            print(f"  oracle: {ws.loc[idx].to_dict()}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
