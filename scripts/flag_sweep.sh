#!/usr/bin/env bash
# XLA/libtpu compiler-flag sweep over the official serving configs.
#
# Each flag setting runs r3_sweep.py in its own process with its own
# persistent-cache dir (LIBTPU_INIT_ARGS is not part of JAX's cache key,
# so sharing .jax_cache across flag settings would silently serve the
# baseline program and null the A/B).
#
# Usage: bash scripts/flag_sweep.sh [specs...]   (default: 0:160:4 1:160:1)
set -u -o pipefail
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
SPECS=${@:-"0:160:4 1:160:1"}
declare -A FLAGS=(
  [baseline]=""
  [vmem48m]="--xla_tpu_scoped_vmem_limit_kib=49152"
  [vmem64m]="--xla_tpu_scoped_vmem_limit_kib=65536"
  [lhs]="--xla_tpu_enable_latency_hiding_scheduler=true"
)
for name in baseline vmem48m vmem64m lhs; do
  echo "=== ${name}: ${FLAGS[$name]} ==="
  LIBTPU_INIT_ARGS="${FLAGS[$name]}" \
  PPF_TPU_CACHE_DIR="/tmp/ppf_cache_${name}" \
    timeout 1200 python scripts/r3_sweep.py $SPECS 2>&1 | grep -v WARNING
  rc=${PIPESTATUS[0]}
  # surface failed/timed-out runs (exit 124) instead of silently moving on
  [ "$rc" -ne 0 ] && echo "!!! ${name}: run FAILED rc=${rc}"
done
