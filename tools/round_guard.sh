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
# failures AND a zero Verify/gate return code.
if ! python3 - "$F" <<'PY'
import json, sys
d = json.load(open(sys.argv[1]))
sys.exit(0 if d.get("n_fail") == 0 and d.get("verify_rc_fail") == 0 else 1)
PY
then
  echo "ROUND GUARD: $F records failures (n_fail or verify_rc_fail nonzero) — fix before closing" >&2
  exit 1
fi
echo "ROUND GUARD: $F present, tracked, green"
