#!/bin/bash
# Scale-probe runner (VERDICT r12 #1): generate a 10x/100x fixture with
# tools/gen_sf.py, oracle-sweep the banded/bucketed pair tier against
# DuckDB at that scale, then run the full bench with the deliberately-
# exact quadratic tiers excluded (recorded in the output — no silent
# caps). This is the committed form of the r12 sf1 / r13 sf10 probes, so
# the next decade (sf100) is one invocation, not an archaeology dig.
#
# Usage: tools/scale_probe.sh <src-sf-dir> <out-dir> <factor> <tag>
#   e.g. tools/scale_probe.sh /root/testdata/sf0.1 /tmp/sf10 100 sf10
#
# Artifacts: /tmp/<tag>_verify.log, /tmp/<tag>_oracle.log,
# /tmp/<tag>_bench.log (last line = the bench JSON record). The caller
# assembles ORACLE_<TAG>_r<N>.json / BENCH_<TAG>_r<N>.json from these —
# record assembly stays a deliberate, eyeballed step (every super-linear
# outlier must be named and adjudicated, not auto-committed).
#
# Memory: the forked JVMs take SPARK_DRIVER_MEM (default 8g in
# build.sbt) — at factor 100 use 48g. Bench at a non-sf0.1 dir with
# SPARK_GRAFT_BENCH_EXCLUDE set never overwrites BENCH_LOCAL.json.
set -eu
cd "$(dirname "$0")/.."
SRC="${1:?usage: tools/scale_probe.sh <src-sf-dir> <out-dir> <factor> <tag>}"
OUT="${2:?out-dir}"
FACTOR="${3:?factor}"
TAG="${4:?tag}"

# The banded/bucketed scale tier: every pair-generating family's
# bucketed path plus its observability cards. The exact quadratic twins
# (q52/q77/q88/q91/q98/q124/q134) stay out BY CONTRACT — each has an
# enforced runtime guard naming this tier as the scale path, and q88's
# fixture benchmark side scales with sf (corpus-vs-corpus), violating
# the operator's bounded-eval contract.
PAIR_TIER=q26_dedup_exact,q27_minhash,q28_lsh_dedup,q29_simhash,q30_ann_topk,q31_ann_lsh,q85_sharded_dedup,q217_bitext_margin_lsh,q218_knn_propagate_lsh,q220_auto_banded_topk,q221_propagate_coverage,q222_simhash_wide,q223_fingerprint_occupancy,q224_fingerprint_pruned,q225_containment_pruned,q226_pq_topk,q227_pq_recall,q228_ivfpq_topk,q229_pq_index,q230_ivfpq_recall,q231_ivfpq_residual,q232_residual_recall,q233_pq_append,q234_opq_topk,q235_opq_recall,q236_zorder_card
EXACT_TIER=q134_bitext_margin,q91_knn_propagate,q77_jaccard_join,q124_containment,q98_fingerprint_pairs,q52_simhash_near_dup,q88_decontaminate_semantic

export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-48g}"
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"

if [ ! -f "$OUT/lineitem.parquet" ]; then
  echo "=== 1/3 gen_sf.py $SRC -> $OUT (factor $FACTOR) ==="
  python3 tools/gen_sf.py "$SRC" "$OUT" "$FACTOR" > "/tmp/${TAG}_gen.log" 2>&1
else
  echo "=== 1/3 fixture $OUT exists — reusing ==="
fi

echo "=== 2/3 pair-tier oracle sweep @ $OUT ==="
rm -rf "/tmp/v_${TAG}"
sbt -batch "runMain graft.Verify $OUT /tmp/v_${TAG} $PAIR_TIER" \
  > "/tmp/${TAG}_verify.log" 2>&1
echo "verify_rc=$?" >> "/tmp/${TAG}_verify.log"
python3 tools/check_oracle.py "$OUT" "/tmp/v_${TAG}" \
  > "/tmp/${TAG}_oracle.log" 2>&1
echo "oracle_rc=$?" >> "/tmp/${TAG}_oracle.log"
tail -3 "/tmp/${TAG}_oracle.log"

echo "=== 3/3 full bench @ $OUT (exact tier excluded, recorded) ==="
SPARK_GRAFT_SF_DIR="$OUT" SPARK_GRAFT_BENCH_PASSES=1 \
  SPARK_GRAFT_BENCH_EXCLUDE="$EXACT_TIER" \
  sbt -batch "runMain graft.Bench" > "/tmp/${TAG}_bench.log" 2>&1
echo "bench_rc=$?" >> "/tmp/${TAG}_bench.log"
tail -2 "/tmp/${TAG}_bench.log"
