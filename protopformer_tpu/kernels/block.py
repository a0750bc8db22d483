"""Pallas TPU kernel: fully-fused DeiT transformer block.

One kernel invocation per SAMPLE-TILE per block: the entire pre-LN
transformer block — LayerNorm1 -> QKV -> eps-stabilized policy-masked
softmax attention -> output projection -> residual -> LayerNorm2 -> MLP
(exact-erf GELU) -> residual — runs VMEM-resident, plus the rollout-map
post-processing (head mean -> bit-bisection k-th-largest discard ->
identity blend -> row normalization) fused onto the attention
probabilities before they ever touch HBM.

Design notes (v5e):
  * the grid tiles the batch (TILE_B samples/program) so the token matmuls
    see MXU-friendly shapes ((TILE_B*N, C) x (C, 3C) etc.) and the
    bisection loop is vectorized across the tile;
  * attention per head is a batched (TILE_B, N, hd) x (TILE_B, hd, N) dot;
  * HBM traffic per block: read x + weights, write x' + the normalized
    (B, N, N) fp32 map — every other intermediate stays in VMEM.

Numerical semantics mirror the reference exactly where it matters:
  * softmax_with_policy math (full-row max, fp32 exp, identity escape,
    (p + eps/N)/(sum + eps) — ref: tools/deit_models_attn.py:29-43);
  * exact-erf GELU (torch default);
  * LayerNorms in fp32.
Matmuls default to bf16 inputs / fp32 accumulation (the TPU speed mode);
``compute_dtype=jnp.float32`` gives the full-precision variant used by the
interpret-mode correctness tests.

Inference-only (no dropout/drop-path, no VJP) — the training step uses the
autodiff-able Flax path.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SOFTMAX_EPS = 1e-6  # ref: deit_models_attn.py:29


def _layernorm_f32(x, scale, bias, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _block_kernel(
    # inputs
    x_ref,        # (TB, N, C) tokens (bf16 or f32)
    policy_ref,   # (TB, 1, N) keep-mask f32 (middle axis: TPU block tiling)
    ln1_s_ref, ln1_b_ref,   # (1, C)
    wqkv_ref,     # (C, 3C)
    bqkv_ref,     # (1, 3C)
    wproj_ref,    # (C, C)
    bproj_ref,    # (1, C)
    ln2_s_ref, ln2_b_ref,   # (1, C)
    wfc1_ref,     # (C, F)
    bfc1_ref,     # (1, F)
    wfc2_ref,     # (F, C)
    bfc2_ref,     # (1, C)
    # outputs
    out_ref,      # (TB, N, C)
    map_ref,      # (TB, N, N) f32 normalized rollout map
    *,
    num_heads: int,
    ln_eps: float,
    keep: int,
    identity_weight: float,
    compute_dtype=jnp.bfloat16,
):
    TB, N, C = x_ref.shape
    H = num_heads
    hd = C // H
    scale = hd ** -0.5
    cd = compute_dtype
    prec = (
        jax.lax.Precision.HIGHEST if cd == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    x = x_ref[:].astype(jnp.float32).reshape(TB * N, C)
    pol = policy_ref[:, 0, :].astype(jnp.float32)  # (TB, N)

    # --- attention ---------------------------------------------------------
    h = _layernorm_f32(x, ln1_s_ref[0], ln1_b_ref[0], ln_eps)
    qkv = (
        jnp.dot(h.astype(cd), wqkv_ref[:].astype(cd),
                preferred_element_type=jnp.float32, precision=prec)
        + bqkv_ref[0]
    ).reshape(TB, N, 3 * C)

    row = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    eye = (row == col).astype(jnp.float32)
    # identity escape: a dropped token still attends to itself
    attn_policy = pol[:, None, :] + (1.0 - pol[:, None, :]) * eye  # (TB,N,N)

    batched = (((2,), (2,)), ((0,), (0,)))  # contract hd, batch TB
    probs_mean = jnp.zeros((TB, N, N), jnp.float32)
    attn_out = jnp.zeros((TB * N, C), jnp.float32)
    for hh in range(H):
        q = qkv[:, :, hh * hd:(hh + 1) * hd]
        k = qkv[:, :, C + hh * hd:C + (hh + 1) * hd]
        v = qkv[:, :, 2 * C + hh * hd:2 * C + (hh + 1) * hd]
        logits = jax.lax.dot_general(
            q.astype(cd), k.astype(cd), batched,
            preferred_element_type=jnp.float32, precision=prec,
        ) * scale  # (TB, N, N)
        # eps-stabilized policy softmax (full-row max like the reference)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m) * attn_policy
        probs = (e + SOFTMAX_EPS / N) / (
            jnp.sum(e, axis=-1, keepdims=True) + SOFTMAX_EPS
        )
        probs_mean = probs_mean + probs * (1.0 / H)
        o = jax.lax.dot_general(
            probs.astype(cd), v.astype(cd),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (TB, N, hd)
        attn_out = attn_out + jnp.dot(
            o.reshape(TB * N, hd).astype(cd),
            wproj_ref[hh * hd:(hh + 1) * hd, :].astype(cd),
            preferred_element_type=jnp.float32, precision=prec,
        )
    x = x + attn_out + bproj_ref[0]

    # --- MLP ---------------------------------------------------------------
    h2 = _layernorm_f32(x, ln2_s_ref[0], ln2_b_ref[0], ln_eps)
    f1 = (
        jnp.dot(h2.astype(cd), wfc1_ref[:].astype(cd),
                preferred_element_type=jnp.float32, precision=prec)
        + bfc1_ref[0]
    )
    # exact-erf GELU (torch default; NOT the tanh approximation)
    f1 = f1 * 0.5 * (1.0 + jax.lax.erf(f1 * (2.0 ** -0.5)))
    x = x + (
        jnp.dot(f1.astype(cd), wfc2_ref[:].astype(cd),
                preferred_element_type=jnp.float32, precision=prec)
        + bfc2_ref[0]
    )
    out_ref[:] = x.reshape(TB, N, C).astype(out_ref.dtype)

    # --- fused rollout-map normalization (vectorized across the tile) ------
    bits = pltpu.bitcast(probs_mean, jnp.int32)  # (TB, N, N)

    def body(_, carry):
        lo, hi = carry  # (TB, 1, 1)
        mid = lo + (hi - lo + 1) // 2
        cnt = jnp.sum(
            (bits >= mid).astype(jnp.int32), axis=(1, 2), keepdims=True
        )
        ok = cnt >= keep
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid - 1)

    lo0 = jnp.zeros((TB, 1, 1), jnp.int32)
    hi0 = jnp.max(bits, axis=(1, 2), keepdims=True)
    lo, _ = jax.lax.fori_loop(0, 31, body, (lo0, hi0))
    a = jnp.where(bits >= lo, probs_mean, 0.0)
    a = (a + identity_weight * eye) / (1.0 + identity_weight)
    denom = jnp.sum(a, axis=-1, keepdims=True)
    map_ref[:] = a / jnp.where(denom == 0.0, 1.0, denom)


def _block_args(params: Dict[str, Any]):
    """Flatten a Flax Block param subtree into kernel operand order."""
    at = params["attn"]
    return (
        params["norm1"]["scale"][None, :], params["norm1"]["bias"][None, :],
        at["qkv"]["kernel"], at["qkv"]["bias"][None, :],
        at["proj"]["kernel"], at["proj"]["bias"][None, :],
        params["norm2"]["scale"][None, :], params["norm2"]["bias"][None, :],
        params["mlp"]["fc1"]["kernel"], params["mlp"]["fc1"]["bias"][None, :],
        params["mlp"]["fc2"]["kernel"], params["mlp"]["fc2"]["bias"][None, :],
    )


def _pick_tile(B: int, N: int, C: int) -> int:
    """Largest sample tile (<=8) dividing B that keeps the working set
    comfortably inside VMEM (~16 MB)."""
    for tb in (8, 4, 2, 1):
        if B % tb:
            continue
        # rough live-set estimate: qkv + 3x(N,N) maps + mlp hidden, fp32
        live = tb * (N * 3 * C + 3 * N * N + N * 4 * C) * 4
        if live < 10 * 1024 * 1024:
            return tb
    return 1


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "ln_eps", "discard_ratio", "identity_weight",
        "compute_dtype", "interpret",
    ),
)
def fused_deit_block(
    x: jax.Array,
    policy: jax.Array,
    params: Dict[str, Any],
    num_heads: int,
    ln_eps: float = 1e-6,
    discard_ratio: float = 0.9,
    identity_weight: float = 0.2,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Run one fused DeiT block.

    Args:
      x: (B, N, C) tokens.
      policy: (B, N) keep-mask (all-ones before the prune point).
      params: Flax Block param subtree (norm1/attn/norm2/mlp).

    Returns:
      (x_out (B, N, C) same dtype as x,
       norm_map (B, N, N) fp32 normalized rollout map).
    """
    B, N, C = x.shape
    F = params["mlp"]["fc1"]["kernel"].shape[1]
    keep = N * N - int(N * N * discard_ratio)
    TB = _pick_tile(B, N, C)
    kernel = functools.partial(
        _block_kernel,
        num_heads=num_heads,
        ln_eps=ln_eps,
        keep=keep,
        identity_weight=identity_weight,
        compute_dtype=compute_dtype,
    )
    const = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            const(1, C), const(1, C),          # ln1
            const(C, 3 * C), const(1, 3 * C),  # qkv
            const(C, C), const(1, C),          # proj
            const(1, C), const(1, C),          # ln2
            const(C, F), const(1, F),          # fc1
            const(F, C), const(1, C),          # fc2
        ],
        out_specs=(
            pl.BlockSpec((TB, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, N, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, C), x.dtype),
            jax.ShapeDtypeStruct((B, N, N), jnp.float32),
        ),
        interpret=interpret,
    )(x, policy[:, None, :], *_block_args(params))
