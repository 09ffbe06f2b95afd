#!/usr/bin/env bash
# Multi-JVM execution gate (VERDICT r10 task 1): runs graft.ClusterGate,
# which re-executes a 37-query subset under local-cluster[2,2,2048] —
# master + 2 workers in the driver JVM, each executor a SEPARATE spawned
# JVM — and fingerprint-compares every result against a local[4] pass in
# the same process, then runs the in-process streaming soak (6
# checkpointed queries, RocksDB state, restart, twin compare) under the
# same cluster master. Artifact: CLUSTERGATE.json (per-query match rows,
# executor pid@host proof, soak layer counts). Exit non-zero on any
# mismatch, failure, or if the run did not actually cross a JVM boundary.
#
# Usage: scripts/clustergate.sh [queries|soak|all|chaos]   (default: all)
# `chaos` (VERDICT r11 task 1) SIGKILLs real executor JVMs mid-query:
# lineage-complete queries must recompute and match, the localCheckpoint
# path must fail LOUDLY (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND), and the
# reliable-checkpoint escape hatch (spark.graft.reliableCheckpoint) must
# survive total executor turnover and match. Artifact: CHAOS.json.
set -euo pipefail
cd "$(dirname "$0")/.."

MODE="${1:-all}"
export SPARK_HOME="${SPARK_HOME:-/opt/spark}"
# dist layouts carry no launcher build dir; the worker's executor-command
# builder needs the scala version handed to it (bin/spark-class does the
# same via load-spark-env.sh)
export SPARK_SCALA_VERSION="${SPARK_SCALA_VERSION:-2.13}"
export SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}"

CLASSES="target/scala-2.13/classes"
[ -d "$CLASSES" ] || { echo "run 'sbt compile' first" >&2; exit 3; }

OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED
--add-opens=java.base/java.lang.invoke=ALL-UNNAMED
--add-opens=java.base/java.lang.reflect=ALL-UNNAMED
--add-opens=java.base/java.io=ALL-UNNAMED
--add-opens=java.base/java.net=ALL-UNNAMED
--add-opens=java.base/java.nio=ALL-UNNAMED
--add-opens=java.base/java.util=ALL-UNNAMED
--add-opens=java.base/java.util.concurrent=ALL-UNNAMED
--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED
--add-opens=java.base/jdk.internal.ref=ALL-UNNAMED
--add-opens=java.base/sun.nio.ch=ALL-UNNAMED
--add-opens=java.base/sun.nio.cs=ALL-UNNAMED
--add-opens=java.base/sun.security.action=ALL-UNNAMED
--add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

# shellcheck disable=SC2086
exec java -Xmx4g $OPENS \
  -cp "$SPARK_HOME/jars/*:$CLASSES" \
  graft.ClusterGate "$MODE"
