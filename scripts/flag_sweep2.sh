#!/usr/bin/env bash
# XLA/libtpu flag lottery, round 2 — screening pass over candidate flags
# mined from `strings libtpu.so` (scheduler / fusion / layout knobs that
# plausibly move a VPU- and layout-bound small-model serving program).
#
# Screens on the speed config only (0:160:4); any winner gets a full
# re-measure (speed + exact, interleaved) before touching the bench.
# Per-flag persistent-cache dirs: LIBTPU_INIT_ARGS is not part of JAX's
# cache key, so sharing .jax_cache would serve the baseline program.
#
# Usage: bash scripts/flag_sweep2.sh [specs...]   (default: 0:160:4)
set -u -o pipefail
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
SPECS=${@:-"0:160:4"}
declare -A FLAGS=(
  [baseline2]=""
  [ilp]="--xla_tpu_enable_ilp_latency_hiding_scheduler=true"
  [dsr_off]="--xla_tpu_enable_dot_strength_reduction=false"
  [unrollpipe]="--xla_tpu_enable_pipelined_loop_unrolling=true"
  [layoutneg]="--xla_tpu_allow_layout_negotiation=true"
  [rwb_off]="--xla_tpu_rwb_fusion=false"
  [mlnestdot]="--xla_tpu_enable_multi_level_nested_dot_fusion=true"
  [bundlecost]="--xla_tpu_use_bundle_aware_cost_model_for_fusions=true"
  [expfusion]="--xla_tpu_enable_experimental_fusion_cost_model=true"
  [allexpsched]="--xla_tpu_enable_all_experimental_scheduler_features=true"
)
ORDER="baseline2 ilp dsr_off unrollpipe layoutneg rwb_off mlnestdot bundlecost expfusion allexpsched"
for name in $ORDER; do
  echo "=== ${name}: ${FLAGS[$name]} ==="
  LIBTPU_INIT_ARGS="${FLAGS[$name]}" \
  PPF_TPU_CACHE_DIR="/tmp/ppf_cache_${name}" \
    timeout 900 python scripts/r3_sweep.py $SPECS 2>&1 | grep -v WARNING
  rc=${PIPESTATUS[0]}
  [ "$rc" -ne 0 ] && echo "!!! ${name}: run FAILED rc=${rc}"
done
