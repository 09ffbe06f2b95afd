#!/bin/bash
# Local harness: run graft.Verify directly with java (fast; skips sbt JVM
# startup). Usage: scripts/run_verify.sh [sfdir] [outdir] [name-filter]
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_out}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
rm -rf "$OUT"
# GRAFT_CLASSES: run from a class SNAPSHOT so a recompile mid-run can't
# mutate the classpath (the r12 lesson). GRAFT_XMX: raise for larger SFs.
CLASSES=${GRAFT_CLASSES:-target/scala-2.13/classes}
exec java $ADD_OPENS -Xmx"${GRAFT_XMX:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLASSES:${SPARK_HOME:-/opt/spark}/jars/*" \
  graft.Verify "$SF" "$OUT" ${3:+"$3"}
