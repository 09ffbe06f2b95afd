#!/bin/bash
# Integrated streaming-topology soak, TWO-PROCESS hard-kill form: 6
# concurrent checkpointed queries (traffic windows, UV detail, is_new
# repair, EarlyFire trigger windows, trade join, config-routed DIM
# upsert — with a routing-config CHANGE landing during the outage)
# over two file buses.
# Process 1 drains phase 1 and is KILLED via Runtime.halt (no query
# stop, no shutdown hooks); process 2 recovers purely from the on-disk
# checkpoints, drains phase 2, flushes, and compares every sink to its
# batch twin. Usage: scripts/soak.sh [rootDir]   (exit 0 iff all ≡)
# One-JVM in-process form: scripts/soak.sh --inproc [rootDir]
set -e
cd "$(dirname "$0")/.."
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run() {
  java $ADD_OPENS -Xmx4g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.apps.Soak "$@"
}
runc() {
  java $ADD_OPENS -Xmx4g \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.apps.CorpusSoak "$@"
}
if [ "${1:-}" = "--inproc" ]; then
  shift
  run "$@"
else
  ROOT=${1:-$(mktemp -d /tmp/graft_soak.XXXXXX)}
  run phase1 "$ROOT"
  run phase2 "$ROOT"
  # the lambda-compaction leg (VERDICT r14 task 2): CorpusApp ingest
  # hard-killed and recovered in a fresh JVM, then the q110 MinHash
  # compaction chain over the landed corpus ≡ the same chain over the
  # batch twin (exit 1 inside corpus2 on any mismatch)
  runc corpus1 "$ROOT"
  runc corpus2 "$ROOT"
fi
