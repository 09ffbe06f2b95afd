#!/bin/bash
# Cross-version checkpoint restart (VERDICT r11 task 3): phase 1 of the
# two-process soak runs from an OLDER commit's compiled classes (default:
# d9f097b, the round-11 freeze), is hard-killed via Runtime.halt with all
# six queries' state open, and phase 2 recovers from those on-disk
# checkpoints (offset/commit WALs + RocksDB changelog + keyed state)
# under the CURRENT working tree's classes. Green means a code upgrade
# does not invalidate streaming checkpoints — state-schema compatibility
# across releases, the #1 operational risk of upgrading a Structured
# Streaming deployment at 100 TB (you cannot replay a 100 TB Kafka
# retention window because a new build refuses last week's state).
#
# Usage: scripts/xversion.sh [oldref] [rootDir]   (exit 0 iff all sinks
# equal their batch twins, same gate as soak.sh)
set -e
cd "$(dirname "$0")/.."
REF=${1:-d9f097b}
WT="/tmp/graft_xver_src_$REF"
ROOT=${2:-$(mktemp -d /tmp/graft_xver.XXXXXX)}

# gate the cache on a SUCCESS marker, not the classes dir: sbt writes
# class files incrementally, so a failed compile leaves a partial dir
# that a bare [ -d ] check would treat as a valid old build
if [ ! -f "$WT/.compile_ok" ]; then
  [ -d "$WT" ] || git worktree add -f "$WT" "$REF" >/dev/null
  echo "compiling $REF in $WT ..."
  (cd "$WT" && sbt -batch compile >"$WT/compile.log" 2>&1) \
    || { tail -20 "$WT/compile.log"; exit 3; }
  touch "$WT/.compile_ok"
fi

# mirror clustergate.sh's opens (incl. jdk.internal.ref — RocksDB state
# store needs it on this Spark runtime) and honor $SPARK_HOME (ADVICE r12)
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         jdk.internal.ref sun.nio.ch sun.nio.cs sun.security.action \
         sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run() {
  local cls="$1"; shift
  java $ADD_OPENS -Xmx4g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$cls:${SPARK_HOME:-/opt/spark}/jars/*" graft.apps.Soak "$@"
}

echo "phase1 under $REF classes, root=$ROOT"
run "$WT/target/scala-2.13/classes" phase1 "$ROOT"
echo "phase2 under current HEAD classes"
run "target/scala-2.13/classes" phase2 "$ROOT"
echo "cross-version soak OK: $REF checkpoints recovered by current code"
