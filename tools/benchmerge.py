#!/usr/bin/env python3
"""Merge N same-binary bench_out.json sweeps per-query-min (the PERF.md
protocol, CLAUDE.md r7/r8): each query's time is the min across every
rep of every sweep, so a JVM-window artifact in one sweep cannot
inflate the merged number. Also recomputes the oracle/rows-only split
from the merged mins using the first sweep's membership.

Usage: python3 tools/benchmerge.py OUT.json SWEEP1.json [SWEEP2.json ...]
"""
import json
import sys


def main():
    out, sweeps = sys.argv[1], [json.load(open(p)) for p in sys.argv[2:]]
    names = list(sweeps[0]["queries"].keys())
    merged = {}
    for n in names:
        vals = [s["queries"].get(n, -1.0) for s in sweeps]
        vals = [v for v in vals if v is not None and v >= 0]
        merged[n] = min(vals) if vals else -1.0
    base = sweeps[0]
    # membership: a query is oracle-checked iff it contributed to
    # oracle_checked_s in the source sweeps — recovered from the per-sweep
    # split by recomputing with each candidate set is overkill; the
    # sweeps' JSON doesn't carry the set, so derive it from the dumped
    # oracle_sql.json when present, else keep the source totals' split.
    oracle_keys = None
    try:
        oracle_keys = set(json.load(open(".verify_sf01/oracle_sql.json")).keys())
    except OSError:
        try:
            oracle_keys = set(json.load(open(".verify_out/oracle_sql.json")).keys())
        except OSError:
            pass
    total = sum(v for v in merged.values() if v >= 0)
    res = {
        "metric": "total", "value": total, "unit": "sec",
        "queries": merged, "sf": base.get("sf"),
        "merged_from": len(sweeps),
    }
    if oracle_keys is not None:
        res["oracle_checked_s"] = sum(
            v for k, v in merged.items() if v >= 0 and k in oracle_keys)
        res["rows_only_s"] = total - res["oracle_checked_s"]
    json.dump(res, open(out, "w"))
    print("merged %d sweeps -> %s  total=%.1fs oracle=%.1fs rows_only=%.1fs" % (
        len(sweeps), out, total,
        res.get("oracle_checked_s", float("nan")),
        res.get("rows_only_s", float("nan"))))


if __name__ == "__main__":
    main()
