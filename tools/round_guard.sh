#!/bin/bash
# Round-record guard (VERDICT r10 #2): refuse to treat a round as closeable
# unless the CURRENT round's sf0.1 sweep record exists in the working tree
# AND is tracked by git — the r10 slip was shipping a round whose
# ORACLE_SF01_r<N>.json was never produced (the judge had to run the sweep).
# Run this before the end-of-round snapshot commit; nonzero exit = do not
# snapshot, run tools/round_close.sh <N> first.
set -u
cd "$(dirname "$0")/.."
ROUND="${1:?usage: tools/round_guard.sh <round-number>}"
F="ORACLE_SF01_r${ROUND}.json"
if [ ! -f "$F" ]; then
  echo "ROUND GUARD: $F missing — run tools/round_close.sh $ROUND before the snapshot commit" >&2
  exit 1
fi
if ! git ls-files --error-unmatch "$F" >/dev/null 2>&1; then
  echo "ROUND GUARD: $F exists but is not tracked — commit the round close first" >&2
  exit 1
fi
# Parse the record as JSON (a literal grep breaks on any formatting change
# and ignores verify_rc_fail — ADVICE r11): green means zero oracle
# failures AND a zero Verify/gate return code. A MISSING verify_rc_fail key
# (records written before the field existed) is a schema gap, not a red
# sweep — name it distinctly (ADVICE r12).
python3 - "$F" <<'PY'
import json, sys
d = json.load(open(sys.argv[1]))
if "verify_rc_fail" not in d:
    sys.exit(2)
sys.exit(0 if d.get("n_fail") == 0 and d.get("verify_rc_fail") == 0 else 1)
PY
case $? in
  1)
    echo "ROUND GUARD: $F records failures (n_fail or verify_rc_fail nonzero) — fix before closing" >&2
    exit 1 ;;
  2)
    echo "ROUND GUARD: $F predates the verify_rc_fail field — regenerate with tools/round_close.sh $ROUND" >&2
    exit 1 ;;
esac
# README query count must match the suite (VERDICT r12 nit #1: a stale
# "N driver-checked queries" line survived a suite growth).
N_QUERIES=$(grep -rhoE '"q[0-9]+_[a-z0-9_]+" *->' src/main/scala/graft/queries/*.scala | sort -u | wc -l)
if [ "$N_QUERIES" -eq 0 ]; then
  # Registration moved out of the literal-map shape — fail loudly, not
  # silently, so the count assertion can't rot into a no-op.
  echo "ROUND GUARD: could not count queries in src/main/scala/graft/queries/ — update the guard's pattern" >&2
  exit 1
fi
if ! grep -q "${N_QUERIES} driver-checked" README.md; then
  echo "ROUND GUARD: README.md does not say \"${N_QUERIES} driver-checked\" — update the README query count" >&2
  exit 1
fi
echo "ROUND GUARD: $F present, tracked, green; README count ${N_QUERIES} consistent"
