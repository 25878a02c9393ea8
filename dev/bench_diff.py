#!/usr/bin/env python3
"""Dev-only per-query bench regression diff.

Usage: python3 dev/bench_diff.py <old_bench.json> <new_bench.json>
       [--ratio 1.25] [--abs 0.15]

Compares the per-query seconds of two Bench JSON lines (BENCH_r*.json or
BENCH_LOCAL.json) and reports queries that regressed by BOTH more than
--ratio multiplicatively AND more than --abs seconds absolutely (the
double threshold filters the ±15-20% ambient-load noise SCALING.md
documents — a 0.02 s query doubling is noise, a 1 s query doubling is
not).

Anchor normalization: three consecutive rounds produced ONLY ambient
flags (untouched queries drifting in lockstep with a whole-VM slowdown,
each argued down by the same manual DevTime protocol). The --anchors
queries measure that host drift inside the SAME pair of runs: every new
time is divided by the MEDIAN of the anchors' old→new ratios before the
thresholds apply. The raw table is still printed for the record, but
the exit code follows the NORMALIZED verdict, so a quiet-code round on
a drifting VM exits 0 without human adjudication prose.

Median-of-anchors (round-14): round 13 proved a single scan-shaped
anchor under-tracks shuffle-heavy host drift (gate anchor 1.13x while
the adjudication window ran 2.91x — the band test was honestly declared
near-vacuous). The default anchor set spans the plan shapes host drift
hits differently: scan-agg q_agg_pricing, join q_join_agg, window
q_window_topk, shuffle-heavy q_global_rank, iterative q_kcore. Every
per-anchor drift is printed; an anchor missing from either side or
outside the [0.25x, 4x] sanity range is excluded with a warning (a real
regression in one anchor must not silently rescale the gate — and with
a median, cannot). No usable anchor at all falls back to raw.

Anchor corroboration (round-13): normalization has a blind spot — a
change that slows EVERY query uniformly (a Sessions/AQE config slip)
also slows the anchor, divides itself out, and exits 0. So when the
anchor drifted, the raw common-query sum is corroborated against a
looser --raw-bar (default 1.4x): past it, the gate fails EVEN IF the
normalized table is clean, with instructions to adjudicate in a quiet
window (or pass --allow-raw-drift after doing so). A genuinely ambient
whole-VM slowdown that large deserves a human look anyway.

Full-snapshot preference (round-13): given an old side named
BENCH_r{N}.json (the driver tail, truncated to ~62 recoverable
queries), a committed sibling BENCH_LOCAL_r{N}.json (the full 342-query
map round_check.sh archives each round) is loaded instead, so the diff
covers the whole board.

Not part of the shipped engine; the driver snapshots BENCH_r{N}.json per
round, so `python3 dev/bench_diff.py BENCH_r04.json BENCH_LOCAL.json`
answers "did this round regress anything" in one line per offender.
"""
import argparse
import json
import os
import re
import sys


def load(path: str) -> dict:
    # Prefer the committed full per-round snapshot over the truncated
    # driver tail: BENCH_r12.json -> BENCH_LOCAL_r12.json when present.
    m = re.fullmatch(r"(.*?)BENCH_(r\d+)\.json", path)
    if m:
        full = f"{m.group(1)}BENCH_LOCAL_{m.group(2)}.json"
        if os.path.exists(full):
            print(f"note: using full snapshot {full} instead of {path}")
            path = full
    with open(path) as f:
        text = f.read()
    # 1) bare Bench output: take the last {"metric":... line that carries
    #    the per-query map (round-15 Bench also prints a COMPACT summary
    #    line after each full record for the driver's 2000-byte tail —
    #    skip those here, the diff needs the queries map)
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith('{"metric"') and '"queries"' in line:
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
    ap.add_argument("--anchors",
                    default="q_agg_pricing,q_join_agg,q_window_topk,"
                            "q_global_rank,q_kcore",
                    help="comma-separated host-drift anchor queries "
                         "spanning plan shapes; the MEDIAN of their "
                         "old->new ratios is the normalization factor "
                         "(set '' to disable)")
    ap.add_argument("--raw-bar", type=float, default=1.4,
                    help="corroboration bar on the RAW common-query sum "
                         "ratio when the anchor drifted: past it the gate "
                         "fails even if the normalized table is clean")
    ap.add_argument("--allow-raw-drift", action="store_true",
                    help="accept a raw sum past --raw-bar (use only after "
                         "a quiet-window adjudication, recorded in "
                         "SCALING.md)")
    ap.add_argument("--flags-out", default=None,
                    help="write normalized-regression query names (one per "
                         "line) for the round_check auto-adjudicator")
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)

    # Protocol-bias guard (round-15): a per-query value is the min over
    # that record's completed timed passes, so a record with FEWER passes
    # reads ~10-20% hot against a min-of-3 one on identical code — round
    # 14's single-sample record manufactured 53 false flags against r13's
    # min-of-3 and burned two adjudication windows. When the two records'
    # sample counts differ, the band is not comparing like with like:
    # widen both thresholds (factors chosen on that exact episode — the
    # r13-vs-r14 replay drops from 35 flags to 8 at 1.2x ratio / +0.2s).
    def samples(rec):
        # full passes only; a preempted "sequential2_partial_123q" pass
        # gives SOME queries a second sample, which is per-query coverage
        # the record-level count cannot express — flag it separately
        pw = rec.get("passes_completed") or list(rec.get("pass_walls", {}))
        partial = any("partial" in p for p in pw)
        if "samples_per_query" in rec:
            return rec["samples_per_query"], partial
        timed = [p for p in pw if p != "warmup" and "partial" not in p]
        return (len(timed) if timed else None), partial
    (so, po), (sn, pn) = samples(old), samples(new)
    if (so is not None and sn is not None and so != sn) or po or pn:
        why = (f"sample counts differ (old={so} passes, new={sn})"
               if so != sn else "a record carries a preempted partial pass")
        args.ratio *= 1.2
        args.abs_s += 0.20
        print(f"NOTE: {why} — min-of-N vs min-of-M is not like-for-like; "
              f"band widened to >{args.ratio:.2f}x and >{args.abs_s:.2f}s",
              file=sys.stderr)

    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))

    # Host-drift factor: median over the per-anchor old->new ratios
    # measured in the same pair of windows.
    import statistics
    drift = 1.0
    anchors = [a for a in args.anchors.split(",") if a] if args.anchors else []
    usable = {}
    for a in anchors:
        if not (oq.get(a) and nq.get(a)):
            print(f"WARNING: anchor {a} missing from one side — excluded",
                  file=sys.stderr)
            continue
        ratio = nq[a] / oq[a]
        if not 0.25 <= ratio <= 4.0:
            print(f"WARNING: anchor {a} drifted {ratio:.2f}x (outside "
                  f"[0.25, 4.0]) — excluded as a suspected real "
                  f"regression, see the per-query table", file=sys.stderr)
            continue
        usable[a] = ratio
    if usable:
        drift = statistics.median(usable.values())
        per = "  ".join(f"{a}={r:.2f}x" for a, r in usable.items())
        print(f"anchors ({len(usable)}/{len(anchors)} usable): {per}")
        print(f"host drift = median {drift:.2f}x "
              f"(normalized table divides new times by this)")
        if drift > 1.5:
            print(f"WARNING: median anchor drift {drift:.2f}x > 1.5x — the "
                  f"normalized band test has little discriminating power; "
                  f"corroborate a clean verdict with dev/ab_prev.sh",
                  file=sys.stderr)
    elif anchors:
        print("WARNING: no usable anchor — raw verdict only",
              file=sys.stderr)

    def classify(factor):
        regs, imps = [], []
        for name in common:
            a, b = oq[name], nq[name]
            if a is None or b is None:
                continue
            bn = b / factor
            if bn > a * args.ratio and bn - a > args.abs_s:
                regs.append((name, a, b, bn))
            elif a > bn * args.ratio and a - bn > args.abs_s:
                imps.append((name, a, b, bn))
        return regs, imps

    raw_regs, _ = classify(1.0)
    regressions, improvements = classify(drift)
    osum = sum(oq[n] for n in common if oq[n] is not None)
    nsum = sum(nq[n] for n in common if nq[n] is not None)
    print(f"common queries: {len(common)}  sum {osum:.2f}s -> {nsum:.2f}s "
          f"({nsum / osum:.2f}x raw, {nsum / drift / osum:.2f}x normalized)"
          if osum else "no common queries")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    raw_only = [r for r in raw_regs
                if r[0] not in {n for n, *_ in regressions}]
    for name, a, b in sorted((r[:3] for r in raw_only),
                             key=lambda t: t[1] - t[2]):
        print(f"  raw-flag (absorbed by anchor drift) "
              f"{name}: {a:.2f}s -> {b:.2f}s")
    for name, a, b, bn in sorted(improvements, key=lambda t: t[1] - t[3]):
        print(f"  faster  {name}: {a:.2f}s -> {b:.2f}s "
              f"({bn:.2f}s normalized)")
    for name, a, b, bn in sorted(regressions, key=lambda t: t[1] - t[3]):
        print(f"REGRESSED {name}: {a:.2f}s -> {b:.2f}s "
              f"({bn:.2f}s normalized)")
    if not regressions:
        print("no NORMALIZED regressions past the noise bar "
              f"(>{args.ratio}x and >{args.abs_s}s after /{drift:.2f}x)")
    if args.flags_out is not None:
        with open(args.flags_out, "w") as f:
            f.write("".join(f"{name}\n" for name, *_ in regressions))
    # Anchor corroboration: normalization cannot tell whole-VM host drift
    # from a codebase-wide regression (both slow the anchor too). A raw
    # sum past --raw-bar while normalizing is not self-certifying — fail
    # loudly and demand a quiet-window adjudication.
    if (drift != 1.0 and osum and not args.allow_raw_drift
            and nsum / osum > args.raw_bar):
        print(f"RAW-DRIFT: common-query raw sum {nsum / osum:.2f}x exceeds "
              f"the {args.raw_bar}x corroboration bar while the anchor "
              f"drifted {drift:.2f}x — a uniform codebase-wide regression "
              f"would look exactly like this. Adjudicate in a quiet window "
              f"(DevTime anchor + a spread of untouched queries against the "
              f"old band), record the disposition in SCALING.md, then "
              f"re-run with --allow-raw-drift.", file=sys.stderr)
        return 1
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
