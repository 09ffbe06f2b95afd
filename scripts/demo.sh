#!/bin/bash
# One-command layered warehouse demo: ODS log fixture → DWD 5-way split
# → UV detail → DWS 10 s channel windows (dt-partitioned) → serving
# queries, every layer round-tripped through disk (the file bus — the
# sandbox analog of the reference's Kafka topic layering).
# Usage: scripts/demo.sh [outdir]
set -e
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/graft_demo}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS -Xmx4g \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.apps.LayeredDemo "$OUT"
