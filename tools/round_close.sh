#!/bin/bash
# Round-close gate runner. Serializes the sbt stages (two sbt processes
# conflict on the target-dir lock), then records the round artifacts:
#
#   1. sbt test                      — ScalaTest suite (specs + plan audit)
#   2. Verify @ sf0.01 + DuckDB      — the driver's own correctness gate
#   3. Verify @ sf0.1  + DuckDB      — the 10x robustness sweep. This is a
#      STANDING gate (VERDICT r8 #4): overflow-at-scale divergences (Spark
#      wraps longs silently, DuckDB raises) only surface above the driver's
#      sf0.01 gate scale — the sweep caught the q186 overflow class at r7.
#      Result lands in ORACLE_SF01_r<N>.json for the round record.
#
# Each stage writes its own log; all stage logs are removed up front so a
# failed sbt run can never leave the gate grepping a stale PASS count from
# a previous invocation (a false-green gate — ADVICE r9 medium).
#
# Usage: tools/round_close.sh <round-number>
set -u
cd "$(dirname "$0")/.."
ROUND="${1:?usage: tools/round_close.sh <round-number>}"
FAIL=0
rm -f /tmp/round_close_test.log /tmp/round_close_v001.log /tmp/round_close_o001.log \
      /tmp/round_close_v01.log /tmp/round_close_o01.log

echo "=== 1/3 sbt test ==="
sbt -batch test > /tmp/round_close_test.log 2>&1
RC_TEST=$?
grep -E "Tests: succeeded|All tests passed|TESTS FAILED" /tmp/round_close_test.log | tail -3
[ $RC_TEST -ne 0 ] && { echo "sbt test FAILED (log: /tmp/round_close_test.log)"; FAIL=1; }

echo "=== 2/3 Verify + oracle @ sf0.01 (driver gate scale) ==="
sbt -batch 'runMain graft.Verify /root/testdata/sf0.01 /tmp/rc_v001' \
  > /tmp/round_close_v001.log 2>&1
if [ $? -ne 0 ]; then
  echo "sf0.01 Verify run FAILED (log: /tmp/round_close_v001.log)"; FAIL=1
else
  python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/rc_v001 \
    | tee /tmp/round_close_o001.log | tail -2
  grep -q " 0 fail" /tmp/round_close_o001.log || { echo "sf0.01 oracle FAILED"; FAIL=1; }
fi

echo "=== 3/3 Verify + oracle @ sf0.1 (10x robustness sweep) ==="
sbt -batch 'runMain graft.Verify /root/testdata/sf0.1 /tmp/rc_v01' \
  > /tmp/round_close_v01.log 2>&1
if [ $? -ne 0 ]; then
  echo "sf0.1 Verify run FAILED (log: /tmp/round_close_v01.log)"; FAIL=1
  touch /tmp/round_close_o01.log
else
  python3 tools/check_oracle.py /root/testdata/sf0.1 /tmp/rc_v01 \
    | tee /tmp/round_close_o01.log | tail -2
  grep -q " 0 fail" /tmp/round_close_o01.log || { echo "sf0.1 sweep FAILED"; FAIL=1; }
fi
N_PASS=$(grep -c '^PASS' /tmp/round_close_o01.log)
N_FAIL=$(grep -c '^FAIL' /tmp/round_close_o01.log)
printf '{"round":%s,"sf":"0.1","n_pass":%s,"n_fail":%s,"verify_rc_fail":%s,"fail_names":[%s]}\n' \
  "$ROUND" "$N_PASS" "$N_FAIL" "$FAIL" \
  "$(grep '^FAIL' /tmp/round_close_o01.log | awk '{printf "%s\"%s\"", sep, $2; sep=","}')" \
  > "ORACLE_SF01_r${ROUND}.json"
echo "wrote ORACLE_SF01_r${ROUND}.json"

# BENCH_LOCAL.json is the only full per-query bench record (the driver's
# artifact truncates); keep it committed so cross-round per-query diffs
# survive (VERDICT r9 #2). Staging here makes the round-close commit carry
# it — but ONLY on a green close: a red round must not silently stage its
# artifacts into the next commit (ADVICE r10).
if [ $FAIL -eq 0 ]; then
  [ -f BENCH_LOCAL.json ] && git add BENCH_LOCAL.json 2>/dev/null
  git add ORACLE_SF01_r"${ROUND}".json 2>/dev/null
else
  echo "NOT staging round artifacts: gates red (fix, then re-run the close)"
fi

# Bench-drift adjudication (VERDICT r11 #3): when the working-tree bench
# record runs >1.10x its previous committed epoch on the shared subset,
# re-run the top-10 inflated queries under BOTH commits back-to-back in a
# worktree and record the verdict (BENCH_AB_r<N>.json) — a judge-readable
# artifact instead of a prose adjudication. Cheap when not triggered
# (JSON diff only, no sbt); runs AFTER the sbt gates, so no lock overlap.
echo "=== bench-drift A/B ==="
python3 tools/bench_ab.py "$ROUND" || { echo "bench A/B FAILED"; FAIL=1; }
if [ $FAIL -eq 0 ] && [ -f "BENCH_AB_r${ROUND}.json" ]; then
  git add "BENCH_AB_r${ROUND}.json" 2>/dev/null
fi

[ $FAIL -eq 0 ] && echo "ROUND CLOSE: all gates green" || echo "ROUND CLOSE: FAILURES (see logs)"
exit $FAIL
