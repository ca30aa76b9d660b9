#!/usr/bin/env python3
"""Merge N same-binary bench_out.json sweeps per-query-min (the PERF.md
protocol, CLAUDE.md r7/r8): each query's time is the min across every
rep of every sweep, so a JVM-window artifact in one sweep cannot
inflate the merged number. The per-query "stats" maps are merged too
(min of mins, max of maxes, summed reps/gc_ms) so benchcmp's rep-spread
column survives the merge, and the oracle/rows-only split is recomputed
from the merged mins.

Usage:
  python3 tools/benchmerge.py [--oracle ORACLE_SQL_JSON] OUT.json SWEEP1.json [SWEEP2.json ...]

The oracle membership comes from --oracle, else ./.verify_sf01/ or
./.verify_out/oracle_sql.json; without any, the split is omitted (the
sweeps carry totals but not membership, so it cannot be recovered).
"""
import json
import sys


def load_oracle_keys(explicit):
    paths = ([explicit] if explicit else
             [".verify_sf01/oracle_sql.json", ".verify_out/oracle_sql.json"])
    for p in paths:
        try:
            return set(json.load(open(p)).keys())
        except (OSError, ValueError):
            continue
    return None


USAGE = ("usage: benchmerge.py [--oracle ORACLE_SQL_JSON] "
         "OUT.json SWEEP1.json [SWEEP2.json ...]")


def main():
    # --oracle accepted anywhere; missing value or too-few positionals
    # fail with the usage string instead of an IndexError (ADVICE r11).
    args = sys.argv[1:]
    explicit_oracle = None
    if "--oracle" in args:
        i = args.index("--oracle")
        if i + 1 >= len(args):
            sys.exit(USAGE + "\nerror: --oracle requires a value")
        explicit_oracle = args[i + 1]
        args = args[:i] + args[i + 2:]
    if len(args) < 2 or any(a.startswith("--") for a in args):
        sys.exit(USAGE)
    out, sweeps = args[0], [json.load(open(p)) for p in args[1:]]
    # Union of keys across ALL sweeps: a query present only in later
    # sweeps (e.g. added mid-round) must not be silently dropped from
    # the merged total — and membership disagreement between sweeps is
    # a same-binary violation worth a loud warning (ADVICE r11).
    names = []
    for s in sweeps:
        for n in s["queries"]:
            if n not in names:
                names.append(n)
    for i, s in enumerate(sweeps):
        missing = [n for n in names if n not in s["queries"]]
        if missing:
            print("warning: sweep %d (%s) lacks %d queries present "
                  "elsewhere (same-binary violation?): %s"
                  % (i + 1, args[1 + i], len(missing),
                     ", ".join(sorted(missing)[:8])), file=sys.stderr)
    merged, stats = {}, {}
    for n in names:
        vals = [s["queries"].get(n, -1.0) for s in sweeps]
        vals = [v for v in vals if v is not None and v >= 0]
        merged[n] = min(vals) if vals else -1.0
        ss = [s.get("stats", {}).get(n) for s in sweeps]
        ss = [x for x in ss if x]
        if ss:
            stats[n] = {
                "min": min(x["min"] for x in ss),
                # lower median OF the sweep medians: the raw reps are not
                # in bench_out.json, so a pooled median is not computable
                # — this is an approximation, biased low to match the
                # min-merge philosophy (a noisy sweep must not inflate it)
                "med": sorted(x["med"] for x in ss)[(len(ss) - 1) // 2],
                "max": max(x["max"] for x in ss),
                "reps": sum(x.get("reps", 0) for x in ss),
                "gc_ms": sum(x.get("gc_ms", 0) for x in ss),
            }
    total = sum(v for v in merged.values() if v >= 0)
    res = {
        "metric": "total", "value": total, "unit": "sec",
        "queries": merged, "stats": stats, "sf": sweeps[0].get("sf"),
        "merged_from": len(sweeps),
    }
    oracle_keys = load_oracle_keys(explicit_oracle)
    split = ""
    if oracle_keys is not None:
        res["oracle_checked_s"] = sum(
            v for k, v in merged.items() if v >= 0 and k in oracle_keys)
        res["rows_only_s"] = total - res["oracle_checked_s"]
        split = " oracle=%.1fs rows_only=%.1fs" % (
            res["oracle_checked_s"], res["rows_only_s"])
    else:
        print("warning: no oracle_sql.json found; split omitted", file=sys.stderr)
    json.dump(res, open(out, "w"))
    print("merged %d sweeps -> %s  total=%.1fs%s" % (len(sweeps), out, total, split))


if __name__ == "__main__":
    main()
