#!/bin/bash
# Generate the committed test-count line FROM an sbt test log — never by
# hand (VERDICT r13 watch item 1: README said 484 while the suite ran
# 485 after a post-edit commit added a test).
# Usage: scripts/testcount.sh /tmp/r14/test.log
set -eu
LOG=${1:?usage: testcount.sh <sbt-test-log>}
# `|| true` so a missing summary reaches the explicit diagnostic below —
# under set -e a failing grep in the assignment would kill the script
# before the error message (code-review r14)
TOTAL=$(grep -oE 'Passed: Total [0-9]+' "$LOG" | tail -1 | grep -oE '[0-9]+' || true)
ST=$(grep -oE 'Total number of tests run: [0-9]+' "$LOG" | tail -1 | grep -oE '[0-9]+' || true)
SUITES=$(grep -oE 'Suites: completed [0-9]+' "$LOG" | tail -1 | grep -oE '[0-9]+' || true)
FAILED=$(grep -oE 'Passed: Total [0-9]+, Failed [0-9]+' "$LOG" | tail -1 | grep -oE '[0-9]+$' || true)
# FAILED is part of the guard (ADVICE r14): a partial summary that
# matched TOTAL/ST but not the 'Failed N' pattern would otherwise emit
# a malformed line ending in ', failures'
[ -n "$TOTAL" ] && [ -n "$ST" ] && [ -n "$FAILED" ] || { echo "error: no sbt summary lines in $LOG" >&2; exit 1; }
SC=$((TOTAL - ST))
echo "$TOTAL checks ($ST ScalaTest${SUITES:+ across $SUITES suites} + $SC ScalaCheck properties), $FAILED failures"
