"""Pallas TPU kernel: fused rollout-map normalization.

One VMEM-resident pass per batch element replacing the XLA chain
head-mean -> k-th-largest (sort) -> threshold -> identity blend ->
row-normalize (ops/rollout.py::normalize_attention_map):

  * the (H, N, N) attention probabilities are loaded once from HBM;
  * the k-th largest of the flattened head-mean is found by a 31-step
    binary search on the fp32 BIT pattern (value order == int bit order for
    non-negative floats) entirely in VMEM/registers — no sort, no extra HBM
    round-trips;
  * threshold/blend/normalize happen on the resident tile and only the
    final (N, N) fp32 map is written back.

Numerics are identical to the JAX path (same fp32 ops in the same order),
so the parity contract is preserved; the rollout is stop-gradient in the
model, so no VJP is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _normalize_kernel(
    probs_ref,  # (TB, H, N, N) attention probabilities (input dtype)
    out_ref,  # (TB, N, N) fp32 normalized maps
    *,
    tile: int,
    keep: int,
    identity_weight: float,
    n_tokens: int,
):
    TB, H, N, _ = probs_ref.shape

    # head mean in fp32
    a = jnp.mean(probs_ref[:].astype(jnp.float32), axis=1)  # (TB, N, N)

    # bit-bisection k-th largest, VECTORIZED across the tile. The carries
    # are (TB, 1, 1); reductions are chained single-axis (Mosaic rejects
    # multi-axis reduce / flat reshapes on this layout). All 31 count passes
    # re-read VMEM, not HBM — the XLA path pays 31 HBM passes per block.
    bits = pltpu.bitcast(a, jnp.int32)

    def bisect(_, carry):
        lo, hi = carry
        mid = lo + (hi - lo + 1) // 2
        cnt = jnp.sum(
            jnp.sum((bits >= mid).astype(jnp.int32), axis=2), axis=1
        )[:, None, None]
        ok = cnt >= keep
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid - 1)

    lo0 = jnp.zeros((TB, 1, 1), jnp.int32)
    hi0 = jnp.max(jnp.max(bits, axis=2), axis=1)[:, None, None]
    lo, _ = jax.lax.fori_loop(0, 31, bisect, (lo0, hi0))

    a = jnp.where(bits >= lo, a, 0.0)
    row = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    eye = ((row == col) & (row < n_tokens)).astype(jnp.float32)
    a = (a + identity_weight * eye) / (1.0 + identity_weight)
    denom = jnp.sum(a, axis=-1, keepdims=True)
    out_ref[:] = a / jnp.where(denom == 0.0, 1.0, denom)


@functools.partial(
    jax.jit, static_argnames=("discard_ratio", "identity_weight", "interpret")
)
def fused_normalize_attention_map(
    probs: jax.Array,
    discard_ratio: float = 0.9,
    identity_weight: float = 0.2,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in fused equivalent of
    ``normalize_attention_map(_fuse_heads(probs, 'mean'))``.

    Args:
      probs: (B, H, N, N) attention probabilities (N >= 2; any float dtype).
    Returns:
      (B, N, N) fp32 normalized maps.
    """
    B, H, N, _ = probs.shape
    keep = N * N - int(N * N * discard_ratio)
    TB = 8 if B % 8 == 0 else (4 if B % 4 == 0 else (2 if B % 2 == 0 else 1))
    kernel = functools.partial(
        _normalize_kernel,
        tile=TB,
        keep=keep,
        identity_weight=identity_weight,
        n_tokens=N,
    )
    return pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec(
                (TB, H, N, N), lambda b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (TB, N, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, N), jnp.float32),
        interpret=interpret,
    )(probs)
