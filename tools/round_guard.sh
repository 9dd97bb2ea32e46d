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
if ! grep -q '"n_fail":0' "$F"; then
  echo "ROUND GUARD: $F records failures — the sweep is red, fix before closing" >&2
  exit 1
fi
echo "ROUND GUARD: $F present, tracked, green"
