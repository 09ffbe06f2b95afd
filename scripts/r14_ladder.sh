#!/bin/bash
# Round-14 freeze ladder: every gate on the FINAL committed code, run
# sequentially from one class state (no sbt invocations after the test
# step — the classpath the spawned executors read must not change
# mid-ladder). Logs land in /tmp/r14/; artifacts are written into the
# repo root. New in r14 (VERDICT r13 tasks 2/4/5/7): the harness rails
# self-test FIRST, GATE_JSONs in the driver schema, and exit-coded
# correctness / bench / soak round-over-round comparison steps.
# GRAFT_LADDER_SMOKE=fail: selftest hook — replaces the sbt test step
# with `false` to prove the abort rail fires before any artifact stamp.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r14
FAIL=0
step() {
  local name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  if "$@" > "/tmp/r14/$name.log" 2>&1; then
    echo "=== $name OK ($(date +%H:%M:%S)) ==="
  else
    echo "=== $name FAILED rc=$? — tail: ==="; tail -5 "/tmp/r14/$name.log"
    FAIL=1
  fi
}

# rail self-test before anything is stamped (skipped in smoke mode —
# the smoke run IS the selftest's ladder probe; recursing would loop)
if [ "${GRAFT_LADDER_SMOKE:-}" != "fail" ]; then
  step selftest      scripts/selftest.sh
  [ "$FAIL" -eq 0 ] || { echo "=== ABORT: harness rails failed selftest ==="; exit 1; }
  step test          sbt -batch test
else
  step test          false
fi
# a failed test step must ABORT: everything below re-stamps committable
# artifacts, and stamping them from a build that failed its own test
# gate would be a false green (code-review r13)
[ "$FAIL" -eq 0 ] || { echo "=== ABORT: test step failed ==="; exit 1; }
# deep property-fuzz pass (VERDICT r13 task 3): ≥50 trials/property of
# the stateful replay machines — the default suite runs 8. A deep-fuzz
# failure must abort like a test failure: everything below stamps
# committable artifacts (code-review r14)
step fuzz_deep       env GRAFT_FUZZ_N=50 sbt -batch "testOnly graft.streaming.StatefulReplayProperties"
[ "$FAIL" -eq 0 ] || { echo "=== ABORT: deep fuzz failed ==="; exit 1; }
# the committed check counts are GENERATED from this run's summary —
# never by hand (VERDICT r13 watch item 1); exit-checked, the count line
# is a committed claim (code-review r14)
scripts/testcount.sh /tmp/r14/test.log | tee /tmp/r14/testcount.txt \
  || { echo "=== testcount FAILED ==="; FAIL=1; }
# class snapshot AFTER the sbt run, BEFORE everything else
rm -rf /tmp/graft_r14_final && cp -r target/scala-2.13/classes /tmp/graft_r14_final

# preserve the r13 committed artifacts for the round-over-round compares
# BEFORE any step overwrites them in the repo root
for a in CLUSTERGATE.json CLUSTERGATE_production.json; do
  git show "HEAD:$a" > "/tmp/r14/r13_$a" || FAIL=1
done

step gate001         env GRAFT_CLASSES=/tmp/graft_r14_final scripts/gate.sh /root/testdata/sf0.01
step gate001_prod    env GRAFT_CLASSES=/tmp/graft_r14_final SPARK_GRAFT_PROFILE=production scripts/gate.sh /root/testdata/sf0.01
step gate01          env GRAFT_CLASSES=/tmp/graft_r14_final GRAFT_XMX=24g SPARK_GRAFT_CPUS=16 GATE_JSON=CORRECTNESS_sf01_r14.json scripts/gate.sh /root/testdata/sf0.1
step gate01_prod     env GRAFT_CLASSES=/tmp/graft_r14_final GRAFT_XMX=24g SPARK_GRAFT_CPUS=16 SPARK_GRAFT_PROFILE=production GATE_JSON=CORRECTNESS_sf01_r14_production.json scripts/gate.sh /root/testdata/sf0.1

# mechanical green->red diff vs the r13 committed artifacts (exit-coded)
step corr_diff       python3 scripts/correctness_compare.py CORRECTNESS_sf01_r13.json CORRECTNESS_sf01_r14.json
step corr_diff_prod  python3 scripts/correctness_compare.py CORRECTNESS_sf01_r13_production.json CORRECTNESS_sf01_r14_production.json
cat /tmp/r14/corr_diff.log /tmp/r14/corr_diff_prod.log > CORRECTNESS_COMPARE_r14.txt

step soak            scripts/soak.sh
step xversion_r11    scripts/xversion.sh d9f097b
step xversion_r10    scripts/xversion.sh 88f4e11

step cg_all          scripts/clustergate.sh all
step cg_all_prod     env SPARK_GRAFT_PROFILE=production SPARK_GRAFT_CLUSTERGATE_OUT=CLUSTERGATE_production.json scripts/clustergate.sh all
step cg_chaos        scripts/clustergate.sh chaos
step cg_chaos_prod   env SPARK_GRAFT_PROFILE=production SPARK_GRAFT_CLUSTERGATE_OUT=CHAOS_production.json scripts/clustergate.sh chaos
step cg_wide         scripts/clustergate.sh wide
step cg_wide_prod    env SPARK_GRAFT_PROFILE=production SPARK_GRAFT_CLUSTERGATE_OUT=CLUSTERGATE_wide_production.json scripts/clustergate.sh wide

# exit-coded soak trend vs r13 (threshold 50%: the fixtures are tiny —
# single-digit-second phases on a shared machine — so sub-50% swings are
# scheduler noise, documented in NOTES; a real regression shows as 2x+)
step soak_cmp        python3 scripts/bench_compare.py --soak /tmp/r14/r13_CLUSTERGATE.json CLUSTERGATE.json 50
step soak_cmp_prod   python3 scripts/bench_compare.py --soak /tmp/r14/r13_CLUSTERGATE_production.json CLUSTERGATE_production.json 50
cat /tmp/r14/soak_cmp.log /tmp/r14/soak_cmp_prod.log > SOAK_COMPARE_r14.txt

step bench_def       scripts/bench3.sh /root/testdata/sf0.1 /tmp/graft_r14_final
step bench_prod      env SPARK_GRAFT_PROFILE=production scripts/bench3.sh /root/testdata/sf0.1 /tmp/graft_r14_final
step bench_def2      scripts/bench3.sh /root/testdata/sf0.1 /tmp/graft_r14_final
step bench_prod2     env SPARK_GRAFT_PROFILE=production scripts/bench3.sh /root/testdata/sf0.1 /tmp/graft_r14_final

# exit-coded bench regression gate: r13 best-of-two vs r14 best-of-two
# (canary-clean interleaved series from the same machine)
step bench_gate      python3 scripts/bench_compare.py --gate BENCH_local_r13.json,BENCH_local_r13_series2.json /tmp/r14/bench_def.log,/tmp/r14/bench_def2.log
step bench_gate_prod python3 scripts/bench_compare.py --gate BENCH_local_r13_production.json,BENCH_local_r13_production_series2.json /tmp/r14/bench_prod.log,/tmp/r14/bench_prod2.log
cat /tmp/r14/bench_gate.log /tmp/r14/bench_gate_prod.log > BENCH_COMPARE_r14.txt

echo "=== LADDER DONE fail=$FAIL ($(date +%H:%M:%S)) ==="
exit $FAIL
