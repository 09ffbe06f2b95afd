#!/bin/bash
# Interleaved reference bench: run graft.Bench exactly the way the driver
# does (forked JVM, -Xmx8g, local[32], 3 whole-suite rounds, median per
# query) but from a CLASS SNAPSHOT so recompiles can't perturb a running
# series. Usage: scripts/bench3.sh [sfdir] [classdir] [only-substrings]
# Records one JSON line on stdout — keep it in NOTES so every round has
# an interleaved same-machine series to compare the driver's number to.
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.1}
CLS=${2:-target/scala-2.13/classes}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export SPARK_GRAFT_SF_DIR="$SF"
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
export SPARK_GRAFT_BENCH_RUNS=${SPARK_GRAFT_BENCH_RUNS:-3}
[ -n "${3:-}" ] && export SPARK_GRAFT_BENCH_ONLY="$3"
exec java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-8g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CLS:/opt/spark/jars/*" graft.Bench
