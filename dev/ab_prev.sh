#!/usr/bin/env bash
# Same-VM previous-commit A/B — the bench-drift escalation protocol
# (SCALING.md, round 13). When the raw common-query sum drifts past what
# the anchors absorb AND the flags re-time in-band, the remaining
# question is "did the CODE get uniformly slower, or the HOST?" — which
# anchor normalization cannot answer. This answers it directly: build
# the previous round's closing commit in a worktree and run the same
# whole-board sequential passes (graft.DevPasses) on it and on HEAD, on
# the current host. The code is exonerated iff the old code reads no
# faster than HEAD (round 13: old 516-624 s vs HEAD 395-410 s on a host
# whose archived baseline was 282 s).
#
# Round-14: the disposition is mechanical — the walls are parsed, the
# verdict computed (exonerated iff min(REF wall) >= 0.95 * min(HEAD
# wall), the 5% band absorbing pass-to-pass noise), and the A/B block
# appended to SCALING.md the way dev/adjudicate.py appends its own.
# Exit 0 = exonerated, 1 = the old code ran faster (a REAL uniform
# regression — the gate stays red). round_check.sh invokes this
# automatically when bench_diff trips the RAW-DRIFT bar.
#
# Usage: dev/ab_prev.sh <prev-ref> [passes]   (default passes: 2)
set -euo pipefail
cd "$(dirname "$0")/.."
REF=${1:?usage: dev/ab_prev.sh <prev-ref> [passes]}
PASSES=${2:-2}
WT=/tmp/graft_ab_prev
LOGDIR=$(mktemp -d /tmp/graft_ab_logs.XXXXXX)

JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED \
--add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED \
--add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED \
--add-opens java.base/sun.util.calendar=ALL-UNNAMED"

compile() { # $1 = project dir, $2 = label — log to file, surface on failure
  if ! ( cd "$1" && sbt -batch compile >"$LOGDIR/compile_$2.log" 2>&1 ); then
    echo "ab_prev: FAIL — sbt compile for $2 failed; log: $LOGDIR/compile_$2.log" >&2
    tail -20 "$LOGDIR/compile_$2.log" >&2
    exit 2
  fi
}

passes() { # $1 = project dir, $2 = label
  ( cd "$1" && java $JOPTS -Dspark.ui.enabled=false \
      -Dspark.sql.session.timeZone=UTC -Xmx"${SPARK_DRIVER_MEM:-8g}" \
      -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
      graft.DevPasses "${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" "$PASSES" \
      2>/dev/null | grep '^\[pass' | sed "s/^/[$2] /" )
}

echo "ab_prev: building $REF in $WT"
git worktree remove --force "$WT" 2>/dev/null || true
git worktree add "$WT" "$REF" >/dev/null
# DevPasses may postdate the ref — carry the current tool into the worktree
cp src/main/scala/graft/DevPasses.scala "$WT/src/main/scala/graft/DevPasses.scala"
compile "$WT" "$REF"
# HEAD must run the CURRENT code, not stale target/ classes — an sbt
# compile is a no-op when fresh and cheap when not (ADVICE r13: an
# advisory echo does not enforce freshness).
compile "$(pwd)" HEAD

echo "ab_prev: HEAD passes"
passes "$(pwd)" HEAD | tee "$LOGDIR/walls_head.txt"
echo "ab_prev: $REF passes (same host, same fixtures)"
passes "$WT" "$REF" | tee "$LOGDIR/walls_ref.txt"
git worktree remove --force "$WT"

# Mechanical verdict + SCALING.md disposition block.
python3 - "$REF" "$LOGDIR/walls_head.txt" "$LOGDIR/walls_ref.txt" <<'PY'
import datetime, os, re, sys
ref, head_f, ref_f = sys.argv[1], sys.argv[2], sys.argv[3]
def walls(path):
    ws = [float(m.group(1)) for line in open(path)
          if (m := re.search(r"\[pass \d+\] wall\s+([0-9.]+)\s*s", line))]
    if not ws:
        raise SystemExit(f"ab_prev: no '[pass N] wall' lines parsed from {path}")
    return ws
hw, rw = walls(head_f), walls(ref_f)
# Exonerated iff the old code is no faster than HEAD like-for-like;
# 0.95 absorbs pass-to-pass noise on an otherwise-identical board.
exonerated = min(rw) >= 0.95 * min(hw)
rng = lambda ws: f"{min(ws):.1f}-{max(ws):.1f} s" if len(ws) > 1 else f"{ws[0]:.1f} s"
verdict = ("code EXONERATED — the previous round's code runs no faster than "
           "HEAD on this host, so the raw bench drift is host-borne"
           if exonerated else
           "REAL uniform regression — the previous round's code runs faster "
           "than HEAD like-for-like; the gate stays red")
stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
rnd = os.environ.get("ROUND", "?")
block = (f"\n### Round-{rnd} same-VM previous-commit A/B ({stamp}, mechanical)\n"
         f"\n`dev/ab_prev.sh {ref}` — whole-board DevPasses sequential walls "
         f"on the current host:\n"
         f"- HEAD: {rng(hw)} (passes: {', '.join(f'{w:.1f}' for w in hw)})\n"
         f"- {ref}: {rng(rw)} (passes: {', '.join(f'{w:.1f}' for w in rw)})\n"
         f"- ratio min({ref})/min(HEAD) = {min(rw)/min(hw):.2f}x "
         f"(exoneration bar: >= 0.95)\n"
         f"\nDisposition: {verdict}.\n")
with open("SCALING.md", "a") as f:
    f.write(block)
print(block)
sys.exit(0 if exonerated else 1)
PY
