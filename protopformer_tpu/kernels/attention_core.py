"""Pallas TPU kernel: fused attention core emitting normalized rollout maps.

The piece XLA handles poorly in the pruning forward is the attention
PROBABILITY tensor: the (B, H, N, N) probs materialize to HBM between the
softmax and the AV matmul, then get re-read, head-meaned, and re-read 31
more times by the discard bisection. This kernel keeps them entirely in
VMEM:

    qkv (from XLA's dense projection) ->
      per head: QK^T -> eps/policy softmax -> AV
      head-mean -> bit-bisection k-th-largest discard -> identity blend ->
      row normalize
    -> (attention output pre-projection, normalized rollout map)

Everything around it (LayerNorms, qkv/proj/MLP denses, residuals) stays in
XLA, which fuses those optimally. Bit-exact vs the reference ops (fp32
softmax/normalize math, exact k-th order statistic).

Mosaic idioms that make this work at N=197 (probed on v5e):
  * batched ``dot_general`` with a leading batch dim is fine; 3Dx2D weight
    contractions are NOT (hence the projections stay outside);
  * the bisection carries are (TB, 1, 1) with CHAINED single-axis
    reductions (multi-axis reduce and (TB, N*N) reshapes are rejected);
  * ``pltpu.bitcast`` must act on the natural (TB, N, N) layout.

Forward-only (the rollout maps are stop-gradient by contract and the eval
path is the deployment surface); training uses the autodiff Flax path.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SOFTMAX_EPS = 1e-6  # ref: tools/deit_models_attn.py:29


def _core_kernel(
    qkv_ref,     # (TB, N, 3C) fp32-accumulated qkv activations
    pol_ref,     # (TB, 1, N) keep-mask f32 (ignored when ones_policy)
    out_ref,     # (TB, N, C) attention output (pre-projection)
    map_ref,     # (TB, N, N) f32 normalized rollout map
    *,
    num_heads: int,
    keep: int,
    identity_weight: float,
    ones_policy: bool,
    compute_dtype=jnp.bfloat16,
):
    TB, N, C3 = qkv_ref.shape
    C = C3 // 3
    H = num_heads
    hd = C // H
    scale = hd ** -0.5
    cd = compute_dtype
    prec = (
        jax.lax.Precision.HIGHEST if cd == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    row = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    eye = (row == col).astype(jnp.float32)

    if not ones_policy:
        pol = pol_ref[:].astype(jnp.float32)  # (TB, 1, N)
        # identity escape: a dropped token still attends to itself
        attn_policy = pol + (1.0 - pol) * eye  # (TB, N, N)

    qk_dims = (((2,), (2,)), ((0,), (0,)))  # contract hd / batch TB
    pv_dims = (((2,), (1,)), ((0,), (0,)))

    probs_mean = jnp.zeros((TB, N, N), jnp.float32)
    head_outs = []
    for hh in range(H):
        q = qkv_ref[:, :, hh * hd:(hh + 1) * hd].astype(cd)
        k = qkv_ref[:, :, C + hh * hd:C + (hh + 1) * hd].astype(cd)
        v = qkv_ref[:, :, 2 * C + hh * hd:2 * C + (hh + 1) * hd].astype(cd)
        logits = jax.lax.dot_general(
            q, k, qk_dims, preferred_element_type=jnp.float32, precision=prec
        ) * scale  # (TB, N, N) f32
        # eps-stabilized (policy) softmax — full-row max like the reference
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        if not ones_policy:
            e = e * attn_policy
        probs = (e + SOFTMAX_EPS / N) / (
            jnp.sum(e, axis=-1, keepdims=True) + SOFTMAX_EPS
        )
        probs_mean = probs_mean + probs * (1.0 / H)
        head_outs.append(
            jax.lax.dot_general(
                probs.astype(cd), v, pv_dims,
                preferred_element_type=jnp.float32, precision=prec,
            )
        )
    out_ref[:] = jnp.concatenate(head_outs, axis=2).astype(out_ref.dtype)

    # --- fused rollout-map normalization (vectorized bisection) -----------
    bits = pltpu.bitcast(probs_mean, jnp.int32)

    def bisect(_, carry):
        lo, hi = carry  # (TB, 1, 1)
        mid = lo + (hi - lo + 1) // 2
        cnt = jnp.sum(
            jnp.sum((bits >= mid).astype(jnp.int32), axis=2), axis=1
        )[:, None, None]
        ok = cnt >= keep
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid - 1)

    lo0 = jnp.zeros((TB, 1, 1), jnp.int32)
    hi0 = jnp.max(jnp.max(bits, axis=2), axis=1)[:, None, None]
    lo, _ = jax.lax.fori_loop(0, 31, bisect, (lo0, hi0))

    a = jnp.where(bits >= lo, probs_mean, 0.0)
    a = (a + identity_weight * eye) / (1.0 + identity_weight)
    denom = jnp.sum(a, axis=-1, keepdims=True)
    map_ref[:] = a / jnp.where(denom == 0.0, 1.0, denom)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "discard_ratio", "identity_weight", "ones_policy",
        "compute_dtype", "interpret",
    ),
)
def fused_attention_core(
    qkv: jax.Array,
    policy: Optional[jax.Array],
    num_heads: int,
    discard_ratio: float = 0.9,
    identity_weight: float = 0.2,
    ones_policy: bool = False,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fused softmax-attention + rollout-map normalization.

    Args:
      qkv: (B, N, 3C) stacked q|k|v activations (XLA's dense output).
      policy: (B, N) keep-mask, or None with ``ones_policy=True``.
      ones_policy: statically all-ones policy (pre-prune blocks).

    Returns:
      (attn_out (B, N, C) pre-projection, norm_map (B, N, N) fp32).
    """
    B, N, C3 = qkv.shape
    C = C3 // 3
    keep = N * N - int(N * N * discard_ratio)
    TB = 8 if B % 8 == 0 else (4 if B % 4 == 0 else (2 if B % 2 == 0 else 1))
    if policy is None:
        policy = jnp.ones((B, N), jnp.float32)
    kernel = functools.partial(
        _core_kernel,
        num_heads=num_heads,
        keep=keep,
        identity_weight=identity_weight,
        ones_policy=ones_policy,
        compute_dtype=compute_dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, N, C3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TB, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, N, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
            jax.ShapeDtypeStruct((B, N, N), jnp.float32),
        ),
        interpret=interpret,
    )(qkv, policy[:, None, :])
