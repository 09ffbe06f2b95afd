#!/bin/bash
# Round-13 freeze ladder: every gate on the FINAL committed code, run
# sequentially from one class state (no sbt invocations after step 1 —
# the classpath the spawned executors read must not change mid-ladder).
# Logs land in /tmp/r13/; artifacts are written into the repo root.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r13
FAIL=0
step() {
  local name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  if "$@" > "/tmp/r13/$name.log" 2>&1; then
    echo "=== $name OK ($(date +%H:%M:%S)) ==="
  else
    echo "=== $name FAILED rc=$? — tail: ==="; tail -5 "/tmp/r13/$name.log"
    FAIL=1
  fi
}

step test            sbt -batch test
# a failed test step must ABORT: everything below re-stamps committable
# artifacts, and stamping them from a build that failed its own test
# gate would be a false green (code-review r13)
[ "$FAIL" -eq 0 ] || { echo "=== ABORT: test step failed ==="; exit 1; }
# class snapshot AFTER the sbt run, BEFORE everything else
rm -rf /tmp/graft_r13_final && cp -r target/scala-2.13/classes /tmp/graft_r13_final

step gate001         env GRAFT_CLASSES=/tmp/graft_r13_final scripts/gate.sh /root/testdata/sf0.01
step gate001_prod    env GRAFT_CLASSES=/tmp/graft_r13_final SPARK_GRAFT_PROFILE=production scripts/gate.sh /root/testdata/sf0.01
step gate01          env GRAFT_CLASSES=/tmp/graft_r13_final GRAFT_XMX=24g SPARK_GRAFT_CPUS=16 GATE_JSON=CORRECTNESS_sf01_r13.json scripts/gate.sh /root/testdata/sf0.1
step gate01_prod     env GRAFT_CLASSES=/tmp/graft_r13_final GRAFT_XMX=24g SPARK_GRAFT_CPUS=16 SPARK_GRAFT_PROFILE=production GATE_JSON=CORRECTNESS_sf01_r13_production.json scripts/gate.sh /root/testdata/sf0.1

step soak            scripts/soak.sh
step xversion_r11    scripts/xversion.sh d9f097b
step xversion_r10    scripts/xversion.sh 88f4e11

step cg_all          scripts/clustergate.sh all
step cg_all_prod     env SPARK_GRAFT_PROFILE=production SPARK_GRAFT_CLUSTERGATE_OUT=CLUSTERGATE_production.json scripts/clustergate.sh all
step cg_chaos        scripts/clustergate.sh chaos
step cg_chaos_prod   env SPARK_GRAFT_PROFILE=production SPARK_GRAFT_CLUSTERGATE_OUT=CHAOS_production.json scripts/clustergate.sh chaos
step cg_wide         scripts/clustergate.sh wide
step cg_wide_prod    env SPARK_GRAFT_PROFILE=production SPARK_GRAFT_CLUSTERGATE_OUT=CLUSTERGATE_wide_production.json scripts/clustergate.sh wide

step bench_def       scripts/bench3.sh /root/testdata/sf0.1 /tmp/graft_r13_final
step bench_prod      env SPARK_GRAFT_PROFILE=production scripts/bench3.sh /root/testdata/sf0.1 /tmp/graft_r13_final
step bench_def2      scripts/bench3.sh /root/testdata/sf0.1 /tmp/graft_r13_final
step bench_prod2     env SPARK_GRAFT_PROFILE=production scripts/bench3.sh /root/testdata/sf0.1 /tmp/graft_r13_final

echo "=== LADDER DONE fail=$FAIL ($(date +%H:%M:%S)) ==="
exit $FAIL
