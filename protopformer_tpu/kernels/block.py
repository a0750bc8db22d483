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
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SOFTMAX_EPS = 1e-6  # ref: deit_models_attn.py:29


def _erf(x):
    """fp32 erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7) —
    Mosaic has no erf primitive; this stays within the exact-GELU parity
    budget (the reference's torch GELU is erf-exact)."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741
                                   + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _layernorm_f32(x, scale, bias, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _block_kernel(
    # inputs
    x_ref,        # (TB, N, C) tokens (bf16 or f32)
    policy_ref,   # (TB, 1, N) keep-mask f32
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
    seq_len: int,
    tile: int,
    ln_eps: float,
    keep: int,
    identity_weight: float,
    compute_dtype=jnp.bfloat16,
):
    """All tensors stay 2-D inside the kernel (Mosaic cannot reshape across
    the padded 197-token sublane dim); the sample/head structure is unrolled
    as static python loops over 2-D slices."""
    N = seq_len
    TB = tile
    C = x_ref.shape[-1]
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

    wqkv = wqkv_ref[:].astype(cd)
    wproj = wproj_ref[:].astype(cd)
    wfc1 = wfc1_ref[:].astype(cd)
    wfc2 = wfc2_ref[:].astype(cd)

    # sequential per-sample loop over the tile: every tensor op is 2-D
    # (Mosaic cannot reshape/slice across the padded 197-row sublane dim,
    # but leading-dim indexing of 3-D refs is free), and the live set stays
    # at one sample's (N, N) temporaries.
    def sample_body(s, _):
        x = x_ref[s].astype(jnp.float32)  # (N, C)
        pol = policy_ref[s].astype(jnp.float32)  # (1, N)
        # identity escape: a dropped token still attends to itself
        attn_policy = pol + (1.0 - pol) * eye  # (N, N)

        # --- attention ----------------------------------------------------
        h = _layernorm_f32(x, ln1_s_ref[:], ln1_b_ref[:], ln_eps).astype(cd)
        qkv = (
            jnp.dot(h, wqkv, preferred_element_type=jnp.float32,
                    precision=prec)
            + bqkv_ref[:]
        ).astype(cd)  # (N, 3C)
        probs_mean = jnp.zeros((N, N), jnp.float32)
        head_outs = []
        for hh in range(H):
            q = qkv[:, hh * hd:(hh + 1) * hd]
            k = qkv[:, C + hh * hd:C + (hh + 1) * hd]
            v = qkv[:, 2 * C + hh * hd:2 * C + (hh + 1) * hd]
            logits = jnp.dot(
                q, k.T, preferred_element_type=jnp.float32, precision=prec,
            ) * scale  # (N, N)
            # eps-stabilized policy softmax (full-row max, like the ref)
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m) * attn_policy
            probs = (e + SOFTMAX_EPS / N) / (
                jnp.sum(e, axis=-1, keepdims=True) + SOFTMAX_EPS
            )
            probs_mean = probs_mean + probs * (1.0 / H)
            head_outs.append(
                jnp.dot(probs.astype(cd), v,
                        preferred_element_type=jnp.float32,
                        precision=prec).astype(cd)
            )
        attn_out = jnp.concatenate(head_outs, axis=1)  # (N, C)
        x = x + (
            jnp.dot(attn_out, wproj, preferred_element_type=jnp.float32,
                    precision=prec)
            + bproj_ref[:]
        )

        # --- MLP ------------------------------------------------------------
        h2 = _layernorm_f32(x, ln2_s_ref[:], ln2_b_ref[:], ln_eps).astype(cd)
        f1 = (
            jnp.dot(h2, wfc1, preferred_element_type=jnp.float32,
                    precision=prec)
            + bfc1_ref[:]
        )
        # exact-erf GELU (torch default; NOT the tanh approximation)
        f1 = (f1 * 0.5 * (1.0 + _erf(f1 * (2.0 ** -0.5)))).astype(cd)
        x = x + (
            jnp.dot(f1, wfc2, preferred_element_type=jnp.float32,
                    precision=prec)
            + bfc2_ref[:]
        )
        out_ref[s] = x.astype(out_ref.dtype)

        # --- fused rollout-map normalization (scalar bisection) -----------
        bits = pltpu.bitcast(probs_mean, jnp.int32)  # (N, N)

        def bisect(_, carry):
            lo, hi = carry
            mid = lo + (hi - lo + 1) // 2
            cnt = jnp.sum((bits >= mid).astype(jnp.int32))
            ok = cnt >= keep
            return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid - 1)

        lo, _ = jax.lax.fori_loop(
            0, 31, bisect, (jnp.int32(0), jnp.max(bits))
        )
        a = jnp.where(bits >= lo, probs_mean, 0.0)
        a = (a + identity_weight * eye) / (1.0 + identity_weight)
        denom = jnp.sum(a, axis=-1, keepdims=True)
        map_ref[s] = a / jnp.where(denom == 0.0, 1.0, denom)
        return 0

    jax.lax.fori_loop(0, TB, sample_body, 0)


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
    """Samples per program: the leading block dim is unconstrained (the
    tiled dims are the trailing (N, C)/(N, N)); 8 amortizes the per-program
    weight fetch while keeping HBM->VMEM pipelining fine-grained."""
    for tb in (8, 4, 2):
        if B % tb == 0:
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
        seq_len=N,
        tile=TB,
        ln_eps=ln_eps,
        keep=keep,
        identity_weight=identity_weight,
        compute_dtype=compute_dtype,
    )
    const = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    out2, maps = pl.pallas_call(
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
    return out2, maps
