#!/usr/bin/env python3
"""Dev-only per-query bench regression diff.

Usage: python3 dev/bench_diff.py <old_bench.json> <new_bench.json>
       [--ratio 1.25] [--abs 0.15]

Compares the per-query seconds of two Bench JSON lines (BENCH_r*.json or
BENCH_LOCAL.json) and reports queries that regressed by BOTH more than
--ratio multiplicatively AND more than --abs seconds absolutely (the
double threshold filters the ±15-20% ambient-load noise SCALING.md
documents — a 0.02 s query doubling is noise, a 1 s query doubling is
not). Exit code 1 iff any regression crosses both bars.

Not part of the shipped engine; the driver snapshots BENCH_r{N}.json per
round, so `python3 dev/bench_diff.py BENCH_r04.json BENCH_LOCAL.json`
answers "did this round regress anything" in one line per offender.
"""
import argparse
import json
import re
import sys


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    # 1) bare Bench output: take the last {"metric":... line
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith('{"metric"'):
            return json.loads(line)
    doc = json.loads(text)
    if "queries" in doc:
        return doc
    # 2) driver round wrapper: the 2000-char "tail" may truncate the JSON
    #    line mid-object — recover whatever "q_name":seconds pairs survive
    tail = doc.get("parsed") or doc.get("tail", "")
    if isinstance(tail, dict):
        return tail
    pairs = re.findall(r'"(q_[a-z0-9_]+)":([0-9.]+|null)', tail)
    if not pairs:
        raise SystemExit(f"{path}: no per-query times found")
    print(f"note: {path} is a truncated driver tail — "
          f"recovered {len(pairs)} per-query times")
    return {"queries": {k: (None if v == "null" else float(v))
                        for k, v in pairs}}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--ratio", type=float, default=1.25)
    ap.add_argument("--abs", dest="abs_s", type=float, default=0.15)
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    regressions, improvements = [], []
    for name in common:
        a, b = oq[name], nq[name]
        if a is None or b is None:
            continue
        if b > a * args.ratio and b - a > args.abs_s:
            regressions.append((name, a, b))
        elif a > b * args.ratio and a - b > args.abs_s:
            improvements.append((name, a, b))
    osum = sum(oq[n] for n in common if oq[n] is not None)
    nsum = sum(nq[n] for n in common if nq[n] is not None)
    print(f"common queries: {len(common)}  sum {osum:.2f}s -> {nsum:.2f}s "
          f"({nsum / osum:.2f}x)" if osum else "no common queries")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    for name, a, b in sorted(improvements, key=lambda t: t[1] - t[2]):
        print(f"  faster  {name}: {a:.2f}s -> {b:.2f}s")
    for name, a, b in sorted(regressions, key=lambda t: t[1] - t[2]):
        print(f"REGRESSED {name}: {a:.2f}s -> {b:.2f}s")
    if not regressions:
        print("no regressions past the noise bar "
              f"(>{args.ratio}x and >{args.abs_s}s)")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
