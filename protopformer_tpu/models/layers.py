"""Shared transformer layers (Flax).

These replace the timm layers the reference builds on (PatchEmbed, Mlp,
DropPath, Attention/Block — ref: tools/deit_models_attn.py:17-81). Design
choices for TPU:

  * images are NHWC (TPU-native), patch embedding is a strided conv that XLA
    lowers onto the MXU;
  * attention keeps (B, H, N, hd) layouts and returns its probability tensor
    so the caller can fold it into the incremental rollout; QK^T and AV
    matmuls run at the configured precision (bf16-in/fp32-acc in speed mode,
    HIGHEST in parity mode);
  * softmax is always computed in fp32 and cast back (matches both the
    reference's fp32 ``softmax_with_policy`` and AMP's fp32 softmax);
  * GELU is the exact (erf) variant — torch's default, NOT jax's tanh
    approximation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from protopformer_tpu.ops.activations import gelu_exact, gelu_speed
from protopformer_tpu.ops.masking import (
    class_attn_softmax_with_policy,
    eps_softmax,
    softmax_with_policy,
)
from protopformer_tpu.ops.quant import int8_matmul

Dtype = jnp.dtype


def _matmul_precision(dtype) -> jax.lax.Precision:
    """fp32 compute => HIGHEST (parity mode); bf16 => DEFAULT (MXU speed)."""
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


class QuantDense(nn.Module):
    """Dense layer running on the int8 MXU path (ops/quant.py).

    Param names/shapes/dtypes are IDENTICAL to ``nn.Dense`` (fp32 kernel +
    bias), so checkpoints, the torch converter, and the optimizer see the
    same tree; only the serving matmul is quantized (weights per-column,
    activations per-token, both dynamic)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), jnp.float32,
        )
        y = int8_matmul(x, kernel, out_dtype=jnp.float32)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias
        return y.astype(self.dtype)


def _dense(quant: bool, features: int, dtype, prec, name: str,
           use_bias: bool = True):
    """Dense factory: int8 serving path or the standard fp32/bf16 one."""
    if quant:
        return QuantDense(features, use_bias=use_bias, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype,
                    param_dtype=jnp.float32, precision=prec, name=name)


class _PatchProj(nn.Module):
    """Patch projection as an unfold + ONE big matmul — param-compatible
    with ``nn.Conv(kernel_size=(p,p), strides=(p,p))`` (same 'kernel'/'bias'
    shapes, so checkpoints, the torch converter, and the normalization fold
    are unaffected). For stride==kernel the conv IS this matmul; stating it
    as a dot lets XLA feed the MXU directly instead of the conv lowering
    (measured vs the conv in the bench ablations)."""

    patch_size: int
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.patch_size
        B, H, W, C = x.shape
        gh, gw = H // p, W // p
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (p, p, C, self.embed_dim), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.embed_dim,), jnp.float32
        )
        # (B, gh, p, gw, p, C) -> (B, gh*gw, p*p*C), ordered (kh, kw, in)
        # to match the conv kernel layout
        patches = x.reshape(B, gh, p, gw, p, C).transpose(
            0, 1, 3, 2, 4, 5
        ).reshape(B, gh * gw, p * p * C)
        w = kernel.reshape(p * p * C, self.embed_dim).astype(self.dtype)
        y = jnp.einsum(
            "bnk,kd->bnd", patches.astype(self.dtype), w,
            precision=_matmul_precision(self.dtype),
        )
        return y + bias.astype(self.dtype)


class PatchEmbed(nn.Module):
    """Image -> patch tokens via strided conv (timm PatchEmbed equivalent).

    ``impl='matmul'`` states the (stride==kernel) conv as unfold+matmul
    instead (_PatchProj) — identical params and math, different lowering."""

    patch_size: int
    embed_dim: int
    dtype: Dtype = jnp.float32
    impl: str = "conv"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, H, W, C) NHWC -> (B, N, D)."""
        p = self.patch_size
        if self.impl == "matmul":
            return _PatchProj(
                p, self.embed_dim, dtype=self.dtype, name="proj"
            )(x)
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            precision=_matmul_precision(self.dtype),
            name="proj",
        )(x)
        B, gh, gw, D = x.shape
        return x.reshape(B, gh * gw, D)


class FastLayerNorm(nn.Module):
    """LayerNorm with compute-dtype statistics (speed-mode ablation).

    Param-compatible with ``nn.LayerNorm`` (fp32 'scale'/'bias'). Flax's
    LayerNorm always upcasts the stats reduction to fp32
    (``force_float32_reductions``); this variant keeps mean/E[x^2] in the
    compute dtype — in bf16 that removes the convert + fp32 elementwise
    chain from the per-block stats fusions (profiled at ~0.14 ms x 11 at
    B=160). The C=192 reduction loses ~2 mantissa bits in bf16; gated by
    the speed-mode selection contract test."""

    eps: float = 1e-6
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        xs = x.astype(self.dtype)
        mu = jnp.mean(xs, axis=-1, keepdims=True)
        var = jnp.mean(xs * xs, axis=-1, keepdims=True) - mu * mu
        inv = jax.lax.rsqrt(var + jnp.asarray(self.eps, self.dtype))
        y = (xs - mu) * inv
        return y * scale.astype(self.dtype) + bias.astype(self.dtype)


class MxuLayerNorm(nn.Module):
    """LayerNorm whose stats reductions run on the MXU (speed-mode option).

    The round-5 speed profile puts the 22 LN-stats fusions at 2.79 ms of a
    6.2 ms iteration — 4.8x over HBM roofline, VPU-issue-bound on fp32
    converts + lane-direction reduce chains over awkward C=192 rows
    (docs/DESIGN.md). Here mean and E[x^2] are computed as K=C thin
    matmuls against a constant ones/C vector with fp32 ACCUMULATION
    (``preferred_element_type``): the MXU pass reads x at HBM speed and
    the x*x producer fuses into the second dot's operand. Statistics are
    fp32-accumulated (MORE accurate than FastLayerNorm's bf16 chains; the
    only loss vs nn.LayerNorm is the bf16 rounding of x*x, ~2^-9
    relative); the normalize apply stays in the compute dtype so it fuses
    with neighbors. Param-compatible with ``nn.LayerNorm``.
    """

    eps: float = 1e-6
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        xs = x.astype(self.dtype)
        w = jnp.full((C, 1), 1.0 / C, self.dtype)
        dims = (((xs.ndim - 1,), (0,)), ((), ()))
        mu = jax.lax.dot_general(
            xs, w, dims, preferred_element_type=jnp.float32
        )  # (..., 1) fp32
        msq = jax.lax.dot_general(
            xs * xs, w, dims, preferred_element_type=jnp.float32
        )
        var = msq - mu * mu
        inv = jax.lax.rsqrt(var + jnp.float32(self.eps))
        mu_c = mu.astype(self.dtype)
        inv_c = inv.astype(self.dtype)
        y = (xs - mu_c) * inv_c
        return y * scale.astype(self.dtype) + bias.astype(self.dtype)


class Mlp(nn.Module):
    """Transformer MLP with exact-erf GELU (timm Mlp equivalent)."""

    hidden_dim: int
    out_dim: int
    drop_rate: float = 0.0
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        prec = _matmul_precision(self.dtype)
        x = _dense(self.quant, self.hidden_dim, self.dtype, prec, "fc1")(x)
        # fp32 parity: exact-erf semantics via the fused-friendly A&S erf;
        # bf16 speed: tanh-GELU — the erf rational's ~40 fp32 elementwise
        # ops over the 4C hidden are the hottest fusion in the serving
        # program, and the tanh form's ~1e-3 deviation sits inside bf16
        # rounding (ops/activations.py, speed-mode contract test)
        x = gelu_exact(x) if self.dtype == jnp.float32 else gelu_speed(x)
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        x = _dense(self.quant, self.out_dim, self.dtype, prec, "fc2")(x)
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        return x


class DropPath(nn.Module):
    """Stochastic depth — drop the residual branch per sample, scaling the
    survivors by 1/keep_prob (timm DropPath semantics)."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)


class _SlicedQKV(nn.Module):
    """qkv projection evaluated as per-head kernel-slice dots.

    Owns the SAME param tree as the fused ``nn.Dense(3C, name="qkv")``
    (one (C, 3C) fp32 kernel + (3C,) bias), but contracts each head's
    slice separately so the activations are never sliced along channels
    (see Attention 'headdense' rationale). Returns [(q, k, v)] per head.
    """

    num_heads: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    precision: jax.lax.Precision = jax.lax.Precision.DEFAULT

    @nn.compact
    def __call__(self, x: jax.Array):
        C = x.shape[-1]
        H = self.num_heads
        hd = C // H
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (C, 3 * C),
            jnp.float32,
        ).astype(self.dtype)
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (3 * C,), jnp.float32
            ).astype(self.dtype)
            if self.use_bias else None
        )
        xc = x.astype(self.dtype)

        def dense_slice(off):
            w = jax.lax.slice_in_dim(kernel, off, off + hd, axis=1)
            y = jnp.einsum("bnc,cd->bnd", xc, w, precision=self.precision)
            if bias is not None:
                y = y + jax.lax.slice_in_dim(bias, off, off + hd, axis=0)
            return y

        return [
            (
                dense_slice(h * hd),
                dense_slice(C + h * hd),
                dense_slice(2 * C + h * hd),
            )
            for h in range(H)
        ]


class Attention(nn.Module):
    """Multi-head self-attention returning its probability tensor.

    Mirrors the reference's attention-with-taps (ref: tools/
    deit_models_attn.py:17-60): when ``policy`` is given the probabilities
    come from the fp32 policy-masked softmax; otherwise a plain (fp32)
    softmax. Returns (out, probs (B, H, N, N)).

    ``rollout_norm=(discard_ratio, identity_weight)`` switches the
    deterministic masked path to the fused Pallas attention core
    (kernels/attention_core.py): the probability tensor never leaves VMEM
    and the SECOND return value becomes the normalized (B, N, N) fp32
    rollout map instead of raw probs.
    """

    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32
    rollout_norm: Optional[Tuple[float, float]] = None
    # return the fp32 head-MEAN of the probabilities instead of the
    # (B, H, N, N) tensor — the rollout consumer's contract when
    # head_fusion == 'mean' (the only mode the reference's scripts use).
    # Runs a per-head loop of 3-D dots, which XLA lowers ~15% faster than
    # the 4-D einsum + transpose form (measured, bit-identical).
    fuse_probs: bool = False
    quant: bool = False
    # 'headloop' (per-head 3-D dots) or 'batched' (4-D einsum + transpose):
    # both bit-identical; relative speed is an XLA layout question —
    # measured per release in the bench ablations.
    attn_impl: str = "headloop"
    # dtype of the emitted head-fused rollout map under fuse_probs: fp32
    # (parity / exact-discard) or bf16 (speed mode — the map is stored
    # bf16 downstream, so fp32 staging would only add traffic)
    map_dtype: Dtype = jnp.float32

    def _head_softmax(self, logits: jax.Array, policy) -> jax.Array:
        """Per-head (B, N, N) softmax with the configured masking."""
        if policy is None:
            return jax.nn.softmax(
                logits.astype(jnp.float32), axis=-1
            ).astype(self.dtype)
        if isinstance(policy, str):
            # statically all-ones policy (pre-prune blocks): same math
            # as softmax_with_policy(logits, ones) minus the tensor
            return eps_softmax(logits)
        return softmax_with_policy(logits[:, None], policy)[:, 0]

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        policy: Optional[jax.Array] = None,
        deterministic: bool = True,
        tap: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """``tap=False`` marks a block whose rollout map is never consumed
        (post-prune blocks): the fused block-stats kernel is skipped there
        — XLA dead-code-eliminates an unused map from the plain paths, but
        cannot eliminate work from inside a pallas_call."""
        B, N, C = x.shape
        H = self.num_heads
        hd = C // H
        prec = _matmul_precision(self.dtype)

        if self.fuse_probs and self.attn_impl == "headdense":
            # Per-head kernel slices + 3H small dots on the channel-minor
            # stream. Rationale (profiled): slicing the qkv ACTIVATIONS at
            # 64-channel offsets is lane-misaligned, so XLA flips the whole
            # residual stream to a token-major layout where those slices
            # are sublane-aligned — and that layout cripples every
            # LayerNorm+dense fusion (the top op, 2.8 ms/iter at B=160).
            # (x @ W)[:, s:e] == x @ W[:, s:e] element-wise, so the math is
            # the headloop's; the param tree is the unchanged "qkv" Dense.
            heads = _SlicedQKV(
                num_heads=H, use_bias=self.qkv_bias, dtype=self.dtype,
                precision=prec, name="qkv",
            )(x)
            fused = jnp.zeros((B, N, N), self.map_dtype)
            outs = []
            for q, k, v in heads:
                logits = jnp.einsum(
                    "bnd,bmd->bnm", q, k, precision=prec
                ) * (hd ** -0.5)
                probs = self._head_softmax(logits, policy)
                fused = fused + probs.astype(self.map_dtype) * (
                    jnp.asarray(1.0 / H, self.map_dtype)
                )
                outs.append(
                    jnp.einsum("bnm,bmd->bnd", probs, v, precision=prec)
                )
            out = jnp.concatenate(outs, axis=-1)
            out = _dense(self.quant, C, self.dtype, prec, "proj")(out)
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
            return out, fused

        qkv_flat = _dense(
            self.quant, 3 * C, self.dtype, prec, "qkv",
            use_bias=self.qkv_bias,
        )(x)

        use_core = (
            self.rollout_norm is not None
            and deterministic
            and policy is not None
        )
        if (
            use_core
            and tap
            and isinstance(policy, str)
            and self.dtype != jnp.float32
            and len(self.rollout_norm) == 3
        ):
            # fully-fused block kernel: eps-softmax attention + head-mean
            # map + in-VMEM discard bisection + masked row sums in ONE
            # pallas_call (kernels/attention_core.py::
            # fused_attention_block_stats). Returns the lazy-rollout triple
            # directly — downstream skips masked_map_stats entirely.
            from protopformer_tpu.kernels.attention_core import (
                fused_attention_block_stats,
            )

            ratio, _idw, exact = self.rollout_norm
            out, fmap, t, s = fused_attention_block_stats(
                qkv_flat, H, ratio, exact, compute_dtype=self.dtype
            )
            out = _dense(self.quant, C, self.dtype, prec, "proj")(out)
            out = nn.Dropout(self.proj_drop)(
                out, deterministic=deterministic
            )
            return out, (fmap, t, s)
        if use_core:
            # lane-aligned fused attention emitting the RAW head-fused map
            # (normalize/bisect stay in XLA via the lazy rollout — measured
            # faster than the in-kernel bisection)
            from protopformer_tpu.kernels.attention_core import (
                fused_attention_mean_padded,
            )

            NP = -(-N // 128) * 128  # next multiple of 128
            pol = (
                jnp.ones((B, N), jnp.float32)
                if isinstance(policy, str) else
                policy.reshape(B, N).astype(jnp.float32)
            )
            out, fused_map = fused_attention_mean_padded(
                jnp.pad(qkv_flat, ((0, 0), (0, NP - N), (0, 0))),
                jnp.pad(pol, ((0, 0), (0, NP - N))),
                H,
                real_n=N,
                compute_dtype=self.dtype,
            )
            out = _dense(self.quant, C, self.dtype, prec, "proj")(out[:, :N])
            return out, fused_map[:, :N, :N]

        head_softmax = lambda logits: self._head_softmax(logits, policy)  # noqa: E731

        if self.fuse_probs and self.attn_impl == "headloop":
            # per-head 3-D dots + on-the-fly fp32 mean accumulation: the
            # (B, H, N, N) probability tensor is never materialized for
            # the rollout tap
            acc_dtype = self.map_dtype
            fused = jnp.zeros((B, N, N), acc_dtype)
            outs = []
            for h in range(H):
                q = qkv_flat[:, :, h * hd:(h + 1) * hd]
                k = qkv_flat[:, :, C + h * hd:C + (h + 1) * hd]
                v = qkv_flat[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
                logits = jnp.einsum(
                    "bnd,bmd->bnm", q, k, precision=prec
                ) * (hd ** -0.5)
                probs = head_softmax(logits)
                fused = fused + probs.astype(acc_dtype) * acc_dtype(1.0 / H)
                outs.append(
                    jnp.einsum("bnm,bmd->bnd", probs, v, precision=prec)
                )
            out = jnp.concatenate(outs, axis=-1)
            out = _dense(self.quant, C, self.dtype, prec, "proj")(out)
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
            return out, fused

        if self.fuse_probs and self.attn_impl == "einsum":
            # transpose-free einsum forms: the head axis stays where the
            # qkv Dense produced it and the dots absorb the layouts
            qkv5 = qkv_flat.reshape(B, N, 3, H, hd)
            q, k, v = qkv5[:, :, 0], qkv5[:, :, 1], qkv5[:, :, 2]
            logits = jnp.einsum(
                "bnhd,bmhd->bhnm", q, k, precision=prec
            ) * (hd ** -0.5)
            if policy is None:
                probs = jax.nn.softmax(
                    logits.astype(jnp.float32), axis=-1
                ).astype(self.dtype)
            elif isinstance(policy, str):
                probs = eps_softmax(logits)
            else:
                probs = softmax_with_policy(logits, policy)
            fused = jnp.mean(probs.astype(jnp.float32), axis=1).astype(
                self.map_dtype
            )
            out = jnp.einsum(
                "bhnm,bmhd->bnhd", probs, v, precision=prec
            ).reshape(B, N, C)
            out = _dense(self.quant, C, self.dtype, prec, "proj")(out)
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
            return out, fused

        if self.fuse_probs:
            # batched 4-D dots with head-mean fused map ("batched" impl)
            qkv = qkv_flat.reshape(B, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            logits = jnp.einsum(
                "bhnd,bhmd->bhnm", q, k, precision=prec
            ) * (hd ** -0.5)
            if policy is None:
                probs = jax.nn.softmax(
                    logits.astype(jnp.float32), axis=-1
                ).astype(self.dtype)
            elif isinstance(policy, str):
                probs = eps_softmax(logits)
            else:
                probs = softmax_with_policy(logits, policy)
            fused = jnp.mean(probs.astype(jnp.float32), axis=1).astype(
                self.map_dtype
            )
            out = jnp.einsum("bhnm,bhmd->bhnd", probs, v, precision=prec)
            out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
            out = _dense(self.quant, C, self.dtype, prec, "proj")(out)
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
            return out, fused

        qkv = qkv_flat.reshape(B, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, precision=prec)
        logits = logits * (hd ** -0.5)

        if policy is None:
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            probs = probs.astype(self.dtype)
        elif isinstance(policy, str):
            # statically all-ones policy (pre-prune blocks): same math as
            # softmax_with_policy(logits, ones) without the policy tensor
            probs = eps_softmax(logits)
        else:
            probs = softmax_with_policy(logits, policy)
        probs = nn.Dropout(self.attn_drop)(probs, deterministic=deterministic)

        out = jnp.einsum("bhnm,bhmd->bhnd", probs, v, precision=prec)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = _dense(self.quant, C, self.dtype, prec, "proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out, probs


class Block(nn.Module):
    """Pre-LN transformer block returning (x, attn_probs) — or
    (x, norm_map) under the fused rollout core (see Attention)
    (ref: tools/deit_models_attn.py:63-81)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    layer_norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32
    rollout_norm: Optional[Tuple[float, float]] = None
    fuse_probs: bool = False
    quant: bool = False
    attn_impl: str = "headloop"
    map_dtype: Dtype = jnp.float32
    ln_stats: str = "fp32"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        policy: Optional[jax.Array] = None,
        deterministic: bool = True,
        tap: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        C = x.shape[-1]
        if self.ln_stats == "compute" and self.dtype != jnp.float32:
            def _ln(name):
                return FastLayerNorm(
                    self.layer_norm_eps, dtype=self.dtype, name=name
                )
        elif self.ln_stats == "mxu" and self.dtype != jnp.float32:
            def _ln(name):
                return MxuLayerNorm(
                    self.layer_norm_eps, dtype=self.dtype, name=name
                )
        else:
            def _ln(name):
                return nn.LayerNorm(
                    self.layer_norm_eps, dtype=self.dtype,
                    param_dtype=jnp.float32, name=name,
                )
        h, attn = Attention(
            self.num_heads, self.qkv_bias, self.attn_drop, self.drop_rate,
            dtype=self.dtype, rollout_norm=self.rollout_norm,
            fuse_probs=self.fuse_probs, quant=self.quant,
            attn_impl=self.attn_impl, map_dtype=self.map_dtype, name="attn",
        )(
            _ln("norm1")(x),
            policy,
            deterministic,
            tap,
        )
        x = x + DropPath(self.drop_path, name="drop_path1")(h, deterministic)
        h = Mlp(
            int(C * self.mlp_ratio), C, self.drop_rate, dtype=self.dtype,
            quant=self.quant, name="mlp",
        )(
            _ln("norm2")(x),
            deterministic,
        )
        x = x + DropPath(self.drop_path, name="drop_path2")(h, deterministic)
        return x, attn


class TalkingHeadAttention(nn.Module):
    """CaiT talking-heads attention (ref: tools/cait_models_attn.py:93-132):
    head-mixing linear projections before and after the softmax.

    ``fuse_probs``: return the fp32 head-MEAN of the probabilities instead
    of the (B, H, N, N) tensor (the rollout tap's contract under 'mean'
    fusion) — the per-head tensor must exist for the talking-heads mixing,
    but its fp32 cast never materializes."""

    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32
    fuse_probs: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> Tuple[jax.Array, jax.Array]:
        B, N, C = x.shape
        H = self.num_heads
        hd = C // H
        prec = _matmul_precision(self.dtype)

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=jnp.float32, precision=prec, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
        # NOTE: CaiT scales q BEFORE the matmul (cait_models_attn.py:118)
        q, k, v = qkv[0] * (hd ** -0.5), qkv[1], qkv[2]

        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, precision=prec)
        # talking heads: mix along H pre-softmax (proj_l) and post (proj_w)
        logits = nn.DenseGeneral(
            H, axis=-1, dtype=self.dtype, param_dtype=jnp.float32,
            precision=prec, name="proj_l",
        )(logits.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        probs = probs.astype(self.dtype)
        probs = nn.DenseGeneral(
            H, axis=-1, dtype=self.dtype, param_dtype=jnp.float32,
            precision=prec, name="proj_w",
        )(probs.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
        probs = nn.Dropout(self.attn_drop)(probs, deterministic=deterministic)

        out = jnp.einsum("bhnm,bhmd->bhnd", probs, v, precision=prec)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                       precision=prec, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        if self.fuse_probs:
            return out, jnp.mean(probs.astype(jnp.float32), axis=1)
        return out, probs


class ClassAttention(nn.Module):
    """CaiT class attention: CLS-only query over [CLS; patches]
    (ref: tools/cait_models_attn.py:34-90). Separate q/k/v projections."""

    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        policy: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        B, N, C = x.shape
        H = self.num_heads
        hd = C // H
        prec = _matmul_precision(self.dtype)

        dense = lambda name: nn.Dense(  # noqa: E731
            C, use_bias=self.qkv_bias, dtype=self.dtype,
            param_dtype=jnp.float32, precision=prec, name=name,
        )
        q = dense("q")(x[:, :1]).reshape(B, 1, H, hd).transpose(0, 2, 1, 3)
        k = dense("k")(x).reshape(B, N, H, hd).transpose(0, 2, 1, 3)
        v = dense("v")(x)
        v = v.reshape(B, N, H, hd).transpose(0, 2, 1, 3)

        q = q * (hd ** -0.5)
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, precision=prec)
        if policy is None:
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            probs = probs.astype(self.dtype)
        else:
            probs = class_attn_softmax_with_policy(logits, policy)
        probs = nn.Dropout(self.attn_drop)(probs, deterministic=deterministic)

        out = jnp.einsum("bhnm,bhmd->bhnd", probs, v, precision=prec)
        out = out.transpose(0, 2, 1, 3).reshape(B, 1, C)
        out = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                       precision=prec, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out, probs


class LayerScaleBlock(nn.Module):
    """CaiT self-attention block with LayerScale
    (ref: tools/cait_models_attn.py:135-158)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    init_values: float = 1e-4
    layer_norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32
    fuse_probs: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> Tuple[jax.Array, jax.Array]:
        C = x.shape[-1]
        gamma_1 = self.param(
            "gamma_1", nn.initializers.constant(self.init_values), (C,), jnp.float32
        )
        gamma_2 = self.param(
            "gamma_2", nn.initializers.constant(self.init_values), (C,), jnp.float32
        )
        h, attn = TalkingHeadAttention(
            self.num_heads, self.qkv_bias, self.attn_drop, self.drop_rate,
            dtype=self.dtype, fuse_probs=self.fuse_probs, name="attn",
        )(
            nn.LayerNorm(self.layer_norm_eps, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm1")(x),
            deterministic,
        )
        x = x + DropPath(self.drop_path, name="drop_path1")(
            gamma_1.astype(h.dtype) * h, deterministic
        )
        h = Mlp(int(C * self.mlp_ratio), C, self.drop_rate, dtype=self.dtype,
                name="mlp")(
            nn.LayerNorm(self.layer_norm_eps, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm2")(x),
            deterministic,
        )
        x = x + DropPath(self.drop_path, name="drop_path2")(
            gamma_2.astype(h.dtype) * h, deterministic
        )
        return x, attn


class LayerScaleBlockClassAttn(nn.Module):
    """CaiT class-attention block with LayerScale
    (ref: tools/cait_models_attn.py:161-185). Updates only the CLS token."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    init_values: float = 1e-4
    layer_norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        x_cls: jax.Array,
        policy: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        C = x.shape[-1]
        gamma_1 = self.param(
            "gamma_1", nn.initializers.constant(self.init_values), (C,), jnp.float32
        )
        gamma_2 = self.param(
            "gamma_2", nn.initializers.constant(self.init_values), (C,), jnp.float32
        )
        u = jnp.concatenate([x_cls, x], axis=1)
        h, attn = ClassAttention(
            self.num_heads, self.qkv_bias, dtype=self.dtype, name="attn",
        )(
            nn.LayerNorm(self.layer_norm_eps, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm1")(u),
            policy,
            deterministic,
        )
        x_cls = x_cls + gamma_1.astype(h.dtype) * h
        h = Mlp(int(C * self.mlp_ratio), C, 0.0, dtype=self.dtype, name="mlp")(
            nn.LayerNorm(self.layer_norm_eps, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm2")(x_cls),
            deterministic,
        )
        x_cls = x_cls + gamma_2.astype(h.dtype) * h
        return x_cls, attn
