#!/usr/bin/env python3
"""Diff two graft bench JSONs and flag real per-query regressions.

Usage: python3 scripts/bench_diff.py OLD.json NEW.json [--ratio 1.5] [--floor 0.3]

Accepts either the raw one-line Bench output ({"metric":"total",...,
"queries":{...}}) or the driver's BENCH_r{N}.json wrapper (the bench
line is embedded in its "tail" field) — so it can diff any two round
artifacts directly.

A query is flagged when it moved by more than --ratio in either
direction, unless both sides are below --floor seconds (sub-300ms
queries are dominated by job-scheduling noise on local[32]; a 2x move
inside the noise floor is not signal, but a move that ESCAPES the
floor is). Exit code 1 iff any REGRESSION is flagged, so the script
can gate CI.
"""
import argparse
import json
import re
import sys


def load_bench(path):
    """Return (total_sec, {query: sec}) from a bench or driver artifact."""
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        return float(doc.get("value", 0.0)), doc["queries"]
    # driver wrapper: the bench line lives inside "tail" — which keeps
    # only the LAST N chars of output, so the line's head (even the
    # "queries":{ opener) may be cut off. Recover whatever survives by
    # matching the "qNN_name":seconds pairs directly; a half-truncated
    # first pair fails the ^q\d+_ shape and drops out naturally, and the
    # diff below intersects keys anyway.
    tail = doc.get("tail", "")
    m = re.search(r'"value":([0-9.]+)', tail)
    total = float(m.group(1)) if m else 0.0
    queries = {q: float(v) for q, v in
               re.findall(r'"(q\d+_[a-z0-9_]+)":([0-9.]+)', tail)}
    if not queries:
        sys.exit(f"{path}: no bench queries found (neither raw nor driver format)")
    return total, queries


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--ratio", type=float, default=1.5,
                    help="flag moves beyond this factor (default 1.5)")
    ap.add_argument("--floor", type=float, default=0.3,
                    help="ignore queries where both sides are below this "
                         "many seconds (default 0.3)")
    args = ap.parse_args()

    old_total, old_q = load_bench(args.old)
    new_total, new_q = load_bench(args.new)

    print(f"total: {old_total:.3f}s -> {new_total:.3f}s "
          f"({new_total / old_total:.2f}x)" if old_total else
          f"total: ? -> {new_total:.3f}s")

    regressions, improvements = [], []
    for q in sorted(set(old_q) & set(new_q)):
        o, n = float(old_q[q]), float(new_q[q])
        if o <= 0 or (o < args.floor and n < args.floor):
            continue
        r = n / o
        if r > args.ratio:
            regressions.append((q, o, n, r))
        elif r < 1.0 / args.ratio:
            improvements.append((q, o, n, r))

    for name, rows in (("REGRESSION", regressions), ("improvement", improvements)):
        for q, o, n, r in sorted(rows, key=lambda t: -abs(t[3] - 1)):
            print(f"{name:>11} {q:<32} {o:7.3f}s -> {n:7.3f}s  ({r:.2f}x)")

    only_old = sorted(set(old_q) - set(new_q))
    only_new = sorted(set(new_q) - set(old_q))
    if only_old:
        print("removed:", ", ".join(only_old))
    if only_new:
        print("added:  ", ", ".join(only_new))
    if not regressions and not improvements:
        print(f"no per-query move beyond {args.ratio}x (floor {args.floor}s)")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
