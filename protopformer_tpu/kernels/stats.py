"""Pallas TPU kernel: fused lazy-rollout map statistics.

Computes ``ops.rollout.masked_map_stats`` — the per-map discard threshold
(k-th largest of the flattened map) and the masked row sums — in ONE pass
over the map:

  * the XLA path re-reads the (B, N, N) map from HBM for every bisection
    count pass (15 in speed mode, 31 exact) plus once more for the row
    sums; at production shape that is ~115 us/layer of loop dispatch + HBM;
  * here the (TB, N, N) tile is loaded into VMEM once, the bit-bisection
    runs entirely on the resident tile, and only (TB, 1) + (TB, N) scalars
    go back to HBM.

Numerics: identical to the XLA path. Speed mode bisects the high 16 bits of
the fp32 widening — for bf16 maps the widening is exact, so the result IS
the exact k-th largest of the bf16 map (same contract as
``kth_largest_bf16``). Exact mode runs the full 31-step fp32 search
(``kth_largest``). The rollout is stop-gradient in the model, so no VJP is
needed.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(
    fmap_ref,  # (TB, N, N) fused map (bf16 or fp32)
    t_ref,  # (TB, 1) fp32 threshold
    s_ref,  # (TB, N) fp32 masked row sums
    *,
    keep: int,
    prefix16: bool,
):
    a = fmap_ref[:].astype(jnp.float32)  # exact widening for bf16
    bits = pltpu.bitcast(a, jnp.int32)
    if prefix16:
        bits = jax.lax.shift_right_logical(bits, 16)
        steps = 15  # non-negative >> 16 fits in 15 bits
    else:
        steps = 31  # non-negative fp32 bit patterns < 2^31

    def bisect(_, carry):
        lo, hi = carry
        mid = lo + (hi - lo + 1) // 2
        cnt = jnp.sum(
            jnp.sum((bits >= mid).astype(jnp.int32), axis=2), axis=1
        )[:, None, None]
        ok = cnt >= keep
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid - 1)

    TB = a.shape[0]
    lo0 = jnp.zeros((TB, 1, 1), jnp.int32)
    hi0 = jnp.max(jnp.max(bits, axis=2), axis=1)[:, None, None]
    lo, _ = jax.lax.fori_loop(0, steps, bisect, (lo0, hi0))

    if prefix16:
        lo = jax.lax.shift_left(lo, 16)
    thresh = pltpu.bitcast(lo, jnp.float32)  # (TB, 1, 1)
    t_ref[:] = thresh[:, :, 0]
    s_ref[:] = jnp.sum(jnp.where(a >= thresh, a, 0.0), axis=2)


@functools.partial(
    jax.jit,
    static_argnames=(
        "discard_ratio", "exact_discard", "keep_elements", "interpret"
    ),
)
def fused_map_stats(
    fmap: jax.Array,
    discard_ratio: float = 0.9,
    exact_discard: bool = False,
    keep_elements: int = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused equivalent of ``masked_map_stats`` for square self-attention
    maps.

    Args:
      fmap: (B, N, N) non-negative head-fused map. bf16 in speed mode
        (``exact_discard=False``) or fp32 (exact mode).
      keep_elements: REAL element count per map when the map is padded with
        exact zeros (``masked_map_stats``'s padded-serving contract): the
        keep/discard counts are computed on it instead of N*N. Safe because
        zero pads have bit pattern 0 and every bisection probe is >= 1, so
        pads never enter the counts, and the final threshold is > 0
        whenever discard is active, so pads never enter the row sums.
    Returns:
      (t (B,) threshold in the map dtype, s (B, N) fp32 masked row sums) —
      same contract as ``ops.rollout.masked_map_stats``.
    """
    B, M, N = fmap.shape
    assert M == N, "kernel is for square self-attention maps"
    real = keep_elements if keep_elements is not None else M * N
    keep = real - int(real * discard_ratio)
    if keep >= real:  # no-discard: plain row sums, -inf sentinel
        return (
            jnp.full((B,), -jnp.inf, jnp.float32),
            jnp.sum(fmap.astype(jnp.float32), axis=-1),
        )
    TB = 8 if B % 8 == 0 else (4 if B % 4 == 0 else (2 if B % 2 == 0 else 1))
    kernel = functools.partial(
        _stats_kernel, keep=keep, prefix16=not exact_discard
    )
    t, s = pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec(
                (TB, N, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=[
            pl.BlockSpec((TB, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, N), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, N), jnp.float32),
        ],
        interpret=interpret,
    )(fmap)
    return t[:, 0].astype(fmap.dtype), s
