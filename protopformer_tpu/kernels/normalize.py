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
    probs_ref,  # (1, H, N, N) attention probabilities (input dtype)
    out_ref,  # (1, N, N) fp32 normalized map
    *,
    keep: int,
    identity_weight: float,
    n_tokens: int,
):
    H = probs_ref.shape[1]
    N = probs_ref.shape[2]
    # head mean in fp32
    a = jnp.mean(probs_ref[0].astype(jnp.float32), axis=0)  # (N, N)

    # --- k-th largest via bit bisection (all VMEM-resident) ---
    bits = pltpu.bitcast(a, jnp.int32)

    def body(_, carry):
        lo, hi = carry
        mid = lo + (hi - lo + 1) // 2
        cnt = jnp.sum((bits >= mid).astype(jnp.int32))
        ok = cnt >= keep
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid - 1)

    lo, _ = jax.lax.fori_loop(
        0, 31, body, (jnp.int32(0), jnp.max(bits))
    )
    # compare in bit space (scalar bitcast is unsupported; order matches)
    a = jnp.where(bits >= lo, a, 0.0)
    # identity blend + row normalize
    row = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    eye = ((row == col) & (row < n_tokens)).astype(jnp.float32)
    a = (a + identity_weight * eye) / (1.0 + identity_weight)
    # guard the padded tail rows (sum 0) against 0/0
    denom = jnp.sum(a, axis=-1, keepdims=True)
    out_ref[0] = a / jnp.where(denom == 0.0, 1.0, denom)


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
    kernel = functools.partial(
        _normalize_kernel,
        keep=keep,
        identity_weight=identity_weight,
        n_tokens=N,
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, H, N, N), lambda b: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, N, N), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, N), jnp.float32),
        interpret=interpret,
    )(probs)
