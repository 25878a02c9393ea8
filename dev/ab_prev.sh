#!/usr/bin/env bash
# Same-VM previous-commit A/B — the bench-drift escalation protocol
# (SCALING.md, round 13). When the raw common-query sum drifts past what
# the anchor absorbs AND the flags re-time in-band, the remaining
# question is "did the CODE get uniformly slower, or the HOST?" — which
# anchor normalization cannot answer. This answers it directly: build
# the previous round's closing commit in a worktree and run the same
# whole-board sequential passes (graft.DevPasses) on it and on HEAD, on
# the current host. The code is exonerated iff the old code reads no
# faster (round 13: old 516-624 s vs HEAD 395-410 s on a host whose
# archived baseline was 282 s).
#
# Usage: dev/ab_prev.sh <prev-ref> [passes]   (default passes: 2)
set -euo pipefail
cd "$(dirname "$0")/.."
REF=${1:?usage: dev/ab_prev.sh <prev-ref> [passes]}
PASSES=${2:-2}
WT=/tmp/graft_ab_prev

JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED \
--add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED \
--add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED \
--add-opens java.base/sun.util.calendar=ALL-UNNAMED"

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
( cd "$WT" && sbt -batch compile >/dev/null 2>&1 )

echo "ab_prev: HEAD passes (current tree must be compiled: sbt compile)"
passes "$(pwd)" HEAD
echo "ab_prev: $REF passes (same host, same fixtures)"
passes "$WT" "$REF"
git worktree remove --force "$WT"
echo "ab_prev: verdict is yours — the code is exonerated iff the $REF walls are no faster than HEAD's"
