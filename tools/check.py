#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tooling only —
not part of the engine). Runs each oracle SQL in DuckDB against the same
parquet tables and compares rows/schema/hash with the Verify dump.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import glob
import hashlib
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = qdir.rstrip("/").split("/")[-1]
        if only and name not in only:
            continue
        try:
            sq = con.execute(
                f"SELECT * FROM '{qdir}/*.parquet'")
            s_cols = [d[0] for d in sq.description]
            s_rows = sq.fetchall()
            if name not in oracles:
                print(f"{name:28s} rows-only spark={len(s_rows)}")
                continue
            oq = con.execute(oracles[name])
            o_cols = [d[0] for d in oq.description]
            o_rows = oq.fetchall()
            # Twin-type lint (r15): no HUGEINT/DECIMAL output column may
            # ever ship — DuckDB releases canonicalize them differently
            # (r10 q_pack_sequences, r14 q_graph_pagerank both red from
            # an un-CAST sum promotion).
            bad_types = [
                (r[0], r[1]) for r in con.execute(
                    f"DESCRIBE ({oracles[name]})").fetchall()
                if "HUGEINT" in r[1] or "DECIMAL" in r[1]]
            if bad_types:
                n_fail += 1
                print(f"{name:28s} FAIL twin-type lint: {bad_types}")
                continue
            ok_rows = len(s_rows) == len(o_rows)
            ok_schema = sorted(s_cols) == sorted(o_cols)
            ok_hash = (ok_rows and ok_schema and
                       table_hash(s_rows, s_cols) == table_hash(o_rows, o_cols))
            ok = ok_rows and ok_schema and ok_hash
            n_pass += ok
            n_fail += not ok
            flag = "PASS" if ok else "FAIL"
            print(f"{name:28s} {flag} rows={len(s_rows)}/{len(o_rows)} "
                  f"schema={ok_schema} hash={ok_hash}")
            if not ok_schema:
                print(f"   spark cols: {sorted(s_cols)}")
                print(f"   oracle cols: {sorted(o_cols)}")
            if ok_rows and ok_schema and not ok_hash:
                # show first differing line
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_o = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
                ls = sorted("|".join(canon(r[i]) for i in order_s) for r in s_rows)
                lo = sorted("|".join(canon(r[i]) for i in order_o) for r in o_rows)
                for a, b in zip(ls, lo):
                    if a != b:
                        print(f"   spark : {a[:200]}")
                        print(f"   oracle: {b[:200]}")
                        break
        except Exception as e:
            n_fail += 1
            print(f"{name:28s} ERR  {str(e)[:200]}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
