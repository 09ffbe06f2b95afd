#!/bin/bash
# Round-15 OPTIMIZATION finish pipeline: the ladder steps this round's
# diffs can affect, sequential from one class snapshot. Skipped ladder
# steps (soak, xversion, clustergate, low-mem gates) are adjudicated in
# OPTIMIZATION_r15.md: no streaming/checkpoint/state-store path changed
# this round and their r15-trial/r14 artifacts stand.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r15opt
FAIL=0
step() {
  local name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  if "$@" > "/tmp/r15opt/$name.log" 2>&1; then
    echo "=== $name OK ($(date +%H:%M:%S)) ==="
  else
    echo "=== $name FAILED rc=$? — tail: ==="; tail -5 "/tmp/r15opt/$name.log"
    FAIL=1
  fi
}

step test sbt -batch test
[ "$FAIL" -eq 0 ] || { echo "=== ABORT: test step failed ==="; exit 1; }
scripts/testcount.sh /tmp/r15opt/test.log | tee /tmp/r15opt/testcount.txt || FAIL=1

rm -rf /tmp/graft_r15opt_final /tmp/graft_r15opt_final_test
cp -r target/scala-2.13/classes /tmp/graft_r15opt_final
cp -r target/scala-2.13/test-classes /tmp/graft_r15opt_final_test

step gate001      env GRAFT_CLASSES=/tmp/graft_r15opt_final scripts/gate.sh /root/testdata/sf0.01
step gate001_prod env GRAFT_CLASSES=/tmp/graft_r15opt_final SPARK_GRAFT_PROFILE=production scripts/gate.sh /root/testdata/sf0.01
step gate01       env GRAFT_CLASSES=/tmp/graft_r15opt_final GRAFT_XMX=24g SPARK_GRAFT_CPUS=16 GATE_JSON=CORRECTNESS_sf01_r15.json scripts/gate.sh /root/testdata/sf0.1
step gate01_prod  env GRAFT_CLASSES=/tmp/graft_r15opt_final GRAFT_XMX=24g SPARK_GRAFT_CPUS=16 SPARK_GRAFT_PROFILE=production GATE_JSON=CORRECTNESS_sf01_r15_production.json scripts/gate.sh /root/testdata/sf0.1

step corr_diff      python3 scripts/correctness_compare.py CORRECTNESS_sf01_r14.json CORRECTNESS_sf01_r15.json
step corr_diff_prod python3 scripts/correctness_compare.py CORRECTNESS_sf01_r14_production.json CORRECTNESS_sf01_r15_production.json
cat /tmp/r15opt/corr_diff.log /tmp/r15opt/corr_diff_prod.log > CORRECTNESS_COMPARE_r15.txt

step coverage python3 scripts/coverage_check.py COVERAGE.md CORRECTNESS_sf01_r15.json

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         jdk.internal.ref sun.nio.ch sun.nio.cs sun.security.action \
         sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
step scalelaw env GRAFT_SCALELAW_OUT=SCALELAW_r15.json \
  java $ADD_OPENS -Xmx8g -Dspark.ui.enabled=false \
  -cp "/tmp/graft_r15opt_final_test:/tmp/graft_r15opt_final:${SPARK_HOME:-/opt/spark}/jars/*" \
  graft.ScaleLaw all

step bench_def   env SPARK_GRAFT_BENCH_OUT=BENCH_local_r15.json scripts/bench3.sh /root/testdata/sf0.1 /tmp/graft_r15opt_final
step bench_prod  env SPARK_GRAFT_PROFILE=production SPARK_GRAFT_BENCH_OUT=BENCH_local_r15_production.json scripts/bench3.sh /root/testdata/sf0.1 /tmp/graft_r15opt_final
step bench_def2  env SPARK_GRAFT_BENCH_OUT=BENCH_local_r15_series2.json scripts/bench3.sh /root/testdata/sf0.1 /tmp/graft_r15opt_final
step bench_prod2 env SPARK_GRAFT_PROFILE=production SPARK_GRAFT_BENCH_OUT=BENCH_local_r15_production_series2.json scripts/bench3.sh /root/testdata/sf0.1 /tmp/graft_r15opt_final

step bench_gate      python3 scripts/bench_compare.py --gate BENCH_local_r14.json,BENCH_local_r14_series2.json /tmp/r15opt/bench_def.log,/tmp/r15opt/bench_def2.log
step bench_gate_prod python3 scripts/bench_compare.py --gate BENCH_local_r14_production.json,BENCH_local_r14_production_series2.json /tmp/r15opt/bench_prod.log,/tmp/r15opt/bench_prod2.log
cat /tmp/r15opt/bench_gate.log /tmp/r15opt/bench_gate_prod.log > BENCH_COMPARE_r15.txt

echo "=== R15-OPT FINISH DONE fail=$FAIL ($(date +%H:%M:%S)) ==="
exit $FAIL
