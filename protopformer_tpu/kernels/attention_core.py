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


def _core_kernel_padded(
    qkv_ref,     # (TB, NP, 3C) compute-dtype qkv activations, rows >= real_n zero
    pol_ref,     # (TB, 1, NP) keep-mask f32 (pads ALWAYS zero)
    out_ref,     # (TB, NP, C) attention output (pre-projection)
    map_ref,     # (TB, NP, NP) f32 normalized rollout map (pads zero/diag)
    *,
    num_heads: int,
    real_n: int,
    keep: int,
    identity_weight: float,
    compute_dtype=jnp.bfloat16,
):
    """Lane/sublane-aligned variant of ``_core_kernel``: every tensor is
    padded to NP (= next multiple of 128, typically 256 for N=197) so the
    VPU reductions in the bisection and the MXU dots run on natural tiles —
    the round-1 kernel lost ~0.8 ms/block to misaligned (197,197) reduces
    (docs/DESIGN.md round-2 roadmap item 2).

    Exact-math notes (real entries bit-match the unpadded kernel):
      * the eps-softmax uses eps/real_n, so real columns see the exact
        reference numerator (ref: deit_models_attn.py:29-43);
      * pad columns are masked out of the policy, pad V rows are zeroed
        (no eps-leak into outputs), and the fused map is zeroed outside the
        (real_n, real_n) block before the bisection, so the k-th-largest
        count never sees a pad entry;
      * the identity blend leaves 0.2/1.2 on pad DIAGONALS only — pad map
        columns for real rows are zero, so a CLS-row chain seeded with
        zeros on pads keeps pads at exactly zero through every layer.
    """
    TB, NP, C3 = qkv_ref.shape
    C = C3 // 3
    H = num_heads
    hd = C // H
    scale = hd ** -0.5
    cd = compute_dtype
    prec = (
        jax.lax.Precision.HIGHEST if cd == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    row = jax.lax.broadcasted_iota(jnp.int32, (NP, NP), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (NP, NP), 1)
    eye = (row == col).astype(jnp.float32)
    real_block = ((row < real_n) & (col < real_n)).astype(jnp.float32)
    row_real = (
        jax.lax.broadcasted_iota(jnp.int32, (NP, 1), 0) < real_n
    ).astype(cd)

    pol = pol_ref[:].astype(jnp.float32)  # (TB, 1, NP), pads zero
    # identity escape: a dropped token still attends to itself
    # (ref: deit_models_attn.py:33-39); harmless on pad diagonals
    attn_policy = pol + (1.0 - pol) * eye  # (TB, NP, NP)

    qk_dims = (((2,), (2,)), ((0,), (0,)))  # contract hd / batch TB
    pv_dims = (((2,), (1,)), ((0,), (0,)))

    probs_mean = jnp.zeros((TB, NP, NP), jnp.float32)
    head_outs = []
    for hh in range(H):
        q = qkv_ref[:, :, hh * hd:(hh + 1) * hd].astype(cd)
        k = qkv_ref[:, :, C + hh * hd:C + (hh + 1) * hd].astype(cd)
        v = qkv_ref[:, :, 2 * C + hh * hd:2 * C + (hh + 1) * hd].astype(cd)
        v = v * row_real  # kill the eps/real_n leak through pad values
        logits = jax.lax.dot_general(
            q, k, qk_dims, preferred_element_type=jnp.float32, precision=prec
        ) * scale  # (TB, NP, NP) f32
        # eps-stabilized policy softmax, eps terms on the REAL count
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m) * attn_policy
        probs = (e + SOFTMAX_EPS / real_n) / (
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
    probs_mean = probs_mean * real_block  # pads exactly zero
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
    a = (a + identity_weight * eye * real_block) / (1.0 + identity_weight)
    # pad-diagonal identity kept OUT of real rows; renormalize real rows
    denom = jnp.sum(a, axis=-1, keepdims=True)
    map_ref[:] = a / jnp.where(denom == 0.0, 1.0, denom)


def _mean_kernel_padded(
    qkv_ref,     # (TB, NP, 3C)
    pol_ref,     # (TB, 1, NP) keep-mask f32 (pads ALWAYS zero)
    out_ref,     # (TB, NP, C)
    map_ref,     # (TB, NP, NP) f32 RAW head-fused probabilities, pads zero
    *,
    num_heads: int,
    real_n: int,
    compute_dtype=jnp.bfloat16,
):
    """``_core_kernel_padded`` without the normalize/bisect stage: emits the
    RAW head-fused map for the XLA-side lazy rollout
    (ops/rollout.py::masked_map_stats + rollout_row_scores_lazy), which
    measured faster than the in-kernel bisection."""
    TB, NP, C3 = qkv_ref.shape
    C = C3 // 3
    H = num_heads
    hd = C // H
    scale = hd ** -0.5
    cd = compute_dtype
    prec = (
        jax.lax.Precision.HIGHEST if cd == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    row = jax.lax.broadcasted_iota(jnp.int32, (NP, NP), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (NP, NP), 1)
    eye = (row == col).astype(jnp.float32)
    real_block = ((row < real_n) & (col < real_n)).astype(jnp.float32)
    row_real = (
        jax.lax.broadcasted_iota(jnp.int32, (NP, 1), 0) < real_n
    ).astype(cd)

    pol = pol_ref[:].astype(jnp.float32)
    attn_policy = pol + (1.0 - pol) * eye

    qk_dims = (((2,), (2,)), ((0,), (0,)))
    pv_dims = (((2,), (1,)), ((0,), (0,)))

    probs_mean = jnp.zeros((TB, NP, NP), jnp.float32)
    for hh in range(H):
        q = qkv_ref[:, :, hh * hd:(hh + 1) * hd].astype(cd)
        k = qkv_ref[:, :, C + hh * hd:C + (hh + 1) * hd].astype(cd)
        v = qkv_ref[:, :, 2 * C + hh * hd:2 * C + (hh + 1) * hd].astype(cd)
        v = v * row_real
        logits = jax.lax.dot_general(
            q, k, qk_dims, preferred_element_type=jnp.float32, precision=prec
        ) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m) * attn_policy
        probs = (e + SOFTMAX_EPS / real_n) / (
            jnp.sum(e, axis=-1, keepdims=True) + SOFTMAX_EPS
        )
        probs_mean = probs_mean + probs * (1.0 / H)
        # per-head slice write (no concat list — keeps scoped VMEM under
        # the 16 MB limit)
        out_ref[:, :, hh * hd:(hh + 1) * hd] = jax.lax.dot_general(
            probs.astype(cd), v, pv_dims,
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(out_ref.dtype)
    map_ref[:] = probs_mean * real_block


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "real_n", "block_batch", "compute_dtype",
                     "interpret"),
)
def fused_attention_mean_padded(
    qkv: jax.Array,
    policy: jax.Array,
    num_heads: int,
    real_n: int,
    block_batch: int = 8,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Aligned fused attention emitting (out, RAW head-fused fp32 map)."""
    B, NP, C3 = qkv.shape
    C = C3 // 3
    TB = block_batch
    while B % TB:
        TB //= 2
    kernel = functools.partial(
        _mean_kernel_padded,
        num_heads=num_heads, real_n=real_n, compute_dtype=compute_dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, NP, C3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1, NP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TB, NP, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, NP, NP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, NP, C), qkv.dtype),
            jax.ShapeDtypeStruct((B, NP, NP), jnp.float32),
        ),
        interpret=interpret,
    )(qkv, policy[:, None, :])


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "real_n", "discard_ratio", "identity_weight",
        "block_batch", "compute_dtype", "interpret",
    ),
)
def fused_attention_core_padded(
    qkv: jax.Array,
    policy: jax.Array,
    num_heads: int,
    real_n: int,
    discard_ratio: float = 0.9,
    identity_weight: float = 0.2,
    block_batch: int = 8,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Aligned fused attention core over PRE-PADDED operands.

    Args:
      qkv: (B, NP, 3C) qkv activations with rows >= real_n zero (NP a
        multiple of 128 — the serving path keeps the whole stream at NP).
      policy: (B, NP) keep-mask with pads zero (pre-prune blocks pass the
        real-token mask).
      real_n: the true sequence length (197); eps terms and the discard
        keep-count use it so real entries match the unpadded math exactly.

    Returns:
      (attn_out (B, NP, C) pre-projection, norm_map (B, NP, NP) fp32 with
      zero pad columns on real rows).
    """
    B, NP, C3 = qkv.shape
    C = C3 // 3
    keep = real_n * real_n - int(real_n * real_n * discard_ratio)
    TB = block_batch
    while B % TB:
        TB //= 2
    kernel = functools.partial(
        _core_kernel_padded,
        num_heads=num_heads,
        real_n=real_n,
        keep=keep,
        identity_weight=identity_weight,
        compute_dtype=compute_dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, NP, C3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1, NP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TB, NP, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, NP, NP), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, NP, C), qkv.dtype),
            jax.ShapeDtypeStruct((B, NP, NP), jnp.float32),
        ),
        interpret=interpret,
    )(qkv, policy[:, None, :])


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


def _block_stats_kernel(
    qkv_ref,     # (TB, N, 3C) compute-dtype qkv activations
    out_ref,     # (TB, N, C) attention output (pre-projection)
    map_ref,     # (TB, N, N) head-MEAN map in the rollout storage dtype
    t_ref,       # (TB, 1) f32 discard threshold (kth largest of the map)
    s_ref,       # (TB, N) f32 masked row sums
    *,
    num_heads: int,
    keep: int,
    prefix16: bool,
    compute_dtype=jnp.bfloat16,
):
    """Attention + eps-softmax + head-mean map + in-VMEM bisect + row sums.

    The probability tensors never leave VMEM; the map is written ONCE in
    its storage dtype and the bisection runs on the resident tile —
    replacing the XLA path's per-head probs materialization (3x 12 MB/layer
    at production shape) AND its 15/31 HBM count passes.

    Numerics replicate the XLA speed path bit-for-bit by construction:
      * eps-softmax in the compute dtype with an fp32 row-sum and a
        reciprocal multiply (ops/masking.py::eps_softmax, bf16 branch);
      * the head mean ACCUMULATES fp32 and rounds once at storage;
      * the bisection runs on the STORED (rounded) map via the exact
        fp32 widening (same contract as kth_largest_bf16 /
        kth_largest — kernels/stats.py), Python-unrolled (a Mosaic
        fori_loop's bookkeeping costs as much as a count pass).
    """
    TB, N, C3 = qkv_ref.shape
    C = C3 // 3
    H = num_heads
    hd = C // H
    scale = hd ** -0.5
    cd = compute_dtype
    eps = SOFTMAX_EPS

    qk_dims = (((2,), (2,)), ((0,), (0,)))
    pv_dims = (((2,), (1,)), ((0,), (0,)))

    acc = jnp.zeros((TB, N, N), jnp.float32)
    for hh in range(H):
        q = qkv_ref[:, :, hh * hd:(hh + 1) * hd]
        k = qkv_ref[:, :, C + hh * hd:C + (hh + 1) * hd]
        v = qkv_ref[:, :, 2 * C + hh * hd:2 * C + (hh + 1) * hd]
        # round the f32-accumulated dot to cd FIRST, then scale in cd —
        # the exact rounding order of the XLA path's
        # ``einsum(q, k) * (hd ** -0.5)`` on bf16 operands
        logits = jax.lax.dot_general(
            q, k, qk_dims, preferred_element_type=jnp.float32
        ).astype(cd) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        s = jnp.sum(
            e.astype(jnp.float32), axis=-1, keepdims=True
        ) + eps
        inv = (1.0 / s).astype(cd)
        probs = (e + jnp.asarray(eps / N, cd)) * inv
        acc = acc + probs.astype(jnp.float32) * (1.0 / H)
        out_ref[:, :, hh * hd:(hh + 1) * hd] = jax.lax.dot_general(
            probs, v, pv_dims, preferred_element_type=jnp.float32
        ).astype(out_ref.dtype)

    map_ref[:] = acc.astype(map_ref.dtype)
    # bisect the STORED (rounded) map — exact fp32 widening, so the result
    # is bit-identical to kth_largest_bf16 (bf16 maps) / kth_largest (fp32)
    af = map_ref[:].astype(jnp.float32)
    bits = pltpu.bitcast(af, jnp.int32)
    one = 0x3F800000  # fp32 bit pattern of 1.0 (static value_bound)
    if prefix16:
        bits = jax.lax.shift_right_logical(bits, 16)
        steps, hi0 = 15, one >> 16  # value_bound=1.0 (softmax prob maps)
    else:
        steps, hi0 = 31, one

    lo = jnp.zeros((TB, 1, 1), jnp.int32)
    hi = jnp.full((TB, 1, 1), hi0, jnp.int32)
    for _ in range(steps):
        mid = lo + (hi - lo + 1) // 2
        cnt = jnp.sum(
            jnp.sum((bits >= mid).astype(jnp.int32), axis=2), axis=1
        )[:, None, None]
        ok = cnt >= keep
        lo, hi = jnp.where(ok, mid, lo), jnp.where(ok, hi, mid - 1)

    if prefix16:
        lo = jax.lax.shift_left(lo, 16)
    thresh = pltpu.bitcast(lo, jnp.float32)  # (TB, 1, 1)
    t_ref[:] = thresh[:, :, 0]
    s_ref[:] = jnp.sum(jnp.where(af >= thresh, af, 0.0), axis=2)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "discard_ratio", "exact_discard",
                     "block_batch", "compute_dtype", "interpret"),
)
def fused_attention_block_stats(
    qkv: jax.Array,
    num_heads: int,
    discard_ratio: float = 0.9,
    exact_discard: bool = False,
    block_batch: int = 8,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Fused ones-policy attention emitting (out, map, threshold, row sums).

    One kernel per block replaces: per-head eps-softmax materialization +
    AV dots + head-mean map build + ``masked_map_stats`` (threshold
    bisection + masked row sums). The map is emitted tight (no 128-lane
    padding) in the rollout storage dtype: bf16 in speed mode
    (``exact_discard=False``), fp32 in exact mode — the downstream lazy
    rollout consumes (map, t, s) unchanged (ops/rollout.py).

    Returns:
      out (B, N, C) compute dtype — pre-projection attention output;
      fmap (B, N, N) storage dtype; t (B,) storage dtype; s (B, N) f32.
    """
    B, N, C3 = qkv.shape
    C = C3 // 3
    E = N * N
    keep = E - int(E * discard_ratio)
    assert 0 < keep < E, "fused block kernel requires an active discard"
    map_dtype = jnp.float32 if exact_discard else jnp.bfloat16
    TB = block_batch
    while B % TB:
        TB //= 2
    kernel = functools.partial(
        _block_stats_kernel,
        num_heads=num_heads, keep=keep, prefix16=not exact_discard,
        compute_dtype=compute_dtype,
    )
    out, fmap, t, s = pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((TB, N, C3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TB, N, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, N, N), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, N), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
            jax.ShapeDtypeStruct((B, N, N), map_dtype),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, N), jnp.float32),
        ),
        interpret=interpret,
    )(qkv)
    return out, fmap, t[:, 0].astype(map_dtype), s
