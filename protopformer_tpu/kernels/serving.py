"""Fused serving path: PPNet inference with a lane-aligned padded stream.

A pure function over the PPNet Flax parameter tree (no module machinery):
patch-embed (XLA conv) -> pad the token stream to NP=256 once -> 12x
[LayerNorm/qkv dense in XLA -> fused Pallas attention emitting the RAW
head-fused rollout map -> proj/MLP in XLA] -> lazy rollout (masked_map_stats
+ CLS-row chain, all on pads-zero maps) -> top-k policy -> masked final
block -> final LayerNorm -> top-k gather -> add-on -> prototype distances ->
dual-branch logits.

Why padding the WHOLE stream: the round-1 fully-fused block lost to XLA
(2.7 vs 2.2 ms/block — Mosaic reshape limits at N=197 forced per-sample
loops), and per-block pad/slice around the kernel costs as much as the
kernel saves. Padding once after patch-embed keeps every op — XLA denses,
the Pallas attention core, the rollout chain — on natural (NP=256) tiles.

STATUS (round 2, measured on v5e-1 at B=96 bf16): 12.9k img/s vs the XLA
Flax path's 15.9k — the +30% dense/MLP work on the 59 pad rows costs more
than the fused attention core saves, and Mosaic still rejects TB=16
(internal compile error) which would amortize the kernel overhead. The
DEFAULT inference path remains the Flax model (fast A&S GELU + lazy rollout
+ VMEM-resident bisection, ops/rollout.py). Kept as a correct, equivalence-
tested baseline for future Mosaic versions; top-81 overlap vs the XLA path
79-81/81 (bf16 selection contract).

Pad-row semantics (proved in kernels/attention_core.py notes): pad keys are
policy-masked, pad V rows zeroed in-kernel, fused maps are exactly zero
outside the (real_n, real_n) block, and the eps-softmax uses eps/real_n —
real entries bit-match the unpadded math; a CLS-row chain seeded with zeros
on pads keeps pads at exactly zero through every layer. Pad rows of the
token stream carry bounded garbage (LN bias) and are never read.

Inference-only by construction (no dropout/drop-path); training uses the
autodiff Flax path. Equivalence-tested against ``PPNet.apply`` in
tests/test_kernels.py.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from protopformer_tpu.core.config import BackboneConfig, PPNetConfig
from protopformer_tpu.kernels.attention_core import (
    fused_attention_mean_padded,
)
from protopformer_tpu.models.ppnet import EvalOutput
from protopformer_tpu.ops.activations import gelu_exact
from protopformer_tpu.ops.distances import prototype_activations
from protopformer_tpu.ops.rollout import (
    masked_map_stats,
    rollout_row_scores_lazy,
)
from protopformer_tpu.ops.tokens import (
    gather_tokens,
    reserve_policy,
    topk_sorted_indices,
)


def _layernorm(x, p, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
    return out.astype(x.dtype)


def _patch_embed(images, p, dtype):
    x = jax.lax.conv_general_dilated(
        images.astype(dtype),
        p["proj"]["kernel"].astype(dtype),
        window_strides=p["proj"]["kernel"].shape[:2],
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    B, gh, gw, D = x.shape
    return x.reshape(B, gh * gw, D) + p["proj"]["bias"].astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=("backbone_cfg", "ppnet_cfg", "interpret"),
)
def ppnet_eval_forward(
    params: Dict[str, Any],
    images: jax.Array,
    backbone_cfg: BackboneConfig,
    ppnet_cfg: PPNetConfig,
    interpret: bool = False,
) -> EvalOutput:
    """Fused-kernel PPNet eval forward (DeiT backbones).

    Args:
      params: PPNet Flax params (as produced by ``PPNet.init`` or the
        checkpoint converter).
      images: (B, H, W, 3) float RGB (normalized).

    Returns:
      EvalOutput with the same contract as ``PPNet.__call__(train=False)``.
    """
    assert backbone_cfg.arch == "deit", "fused serving supports DeiT"
    feat = params["features"]
    cfg = backbone_cfg
    dtype = jnp.bfloat16
    prec = jax.lax.Precision.DEFAULT

    tokens = _patch_embed(images, feat["patch_embed"], dtype)
    B, N, D = tokens.shape
    cls = jnp.broadcast_to(feat["cls_token"].astype(dtype), (B, 1, D))
    x = jnp.concatenate([cls, tokens], axis=1)
    x = x + feat["pos_embed"].astype(dtype)

    seq_len = N + 1
    NP = -(-seq_len // 128) * 128  # 197 -> 256
    x = jnp.pad(x, ((0, 0), (0, NP - seq_len), (0, 0)))
    real_mask = (jnp.arange(NP) < seq_len).astype(jnp.float32)[None, :]
    policy = jnp.broadcast_to(real_mask, (B, NP))

    reserve_map = dict(ppnet_cfg.reserve_layer_nums)
    last_prune = max(reserve_map)
    cls_row = jnp.zeros((B, 1, NP), jnp.float32).at[:, 0, 0].set(1.0)
    fused_maps, thresholds, row_sums = [], [], []
    cls_token_attn = None

    def dense(t, p):
        return (
            jnp.matmul(t, p["kernel"].astype(dtype), precision=prec)
            + p["bias"].astype(dtype)
        )

    for i in range(cfg.depth):
        if i in reserve_map:
            scores = rollout_row_scores_lazy(
                fused_maps, thresholds, row_sums, cls_row,
                cfg.rollout_identity_weight,
            )
            cls_token_attn = scores[:, 0, 1:seq_len]
            pol_real, _ = reserve_policy(
                cls_token_attn, reserve_map[i], seq_len
            )
            policy = jnp.pad(pol_real, ((0, 0), (0, NP - seq_len)))
        bp = feat[f"blocks_{i}"]
        h = _layernorm(x, bp["norm1"], cfg.layer_norm_eps)
        qkv = dense(h, bp["attn"]["qkv"])
        attn_out, fmap = fused_attention_mean_padded(
            qkv, policy, cfg.num_heads, real_n=seq_len,
            compute_dtype=dtype, interpret=interpret,
        )
        x = x + dense(attn_out.astype(dtype), bp["attn"]["proj"])
        h = _layernorm(x, bp["norm2"], cfg.layer_norm_eps)
        x = x + dense(gelu_exact(dense(h, bp["mlp"]["fc1"])), bp["mlp"]["fc2"])
        if i < last_prune:
            fused_maps.append(fmap)
            # the pads-zero map never contributes counts: keep uses the
            # REAL element count so thresholds match the unpadded math
            t, s = masked_map_stats(
                fmap, cfg.rollout_discard_ratio, cfg.rollout_exact_discard,
                keep_elements=seq_len * seq_len,
            )
            thresholds.append(t)
            row_sums.append(s)

    x = _layernorm(x[:, :seq_len], feat["norm"], cfg.layer_norm_eps)

    # final top-k gather + add-on ('regular': Dense + sigmoid)
    idx = topk_sorted_indices(cls_token_attn, ppnet_cfg.final_reserve_num)
    img_tokens = gather_tokens(x[:, 1:], idx)
    cls_tokens = x[:, :1]
    ao = params["add_on_layers"]["layers_0"]
    proj = lambda t: jax.nn.sigmoid(  # noqa: E731
        jnp.dot(t.astype(jnp.float32), ao["kernel"],
                precision=jax.lax.Precision.HIGHEST)
        + ao["bias"]
    )
    img_tokens = proj(img_tokens)
    cls_tokens = proj(cls_tokens)

    hi = jax.lax.Precision.HIGHEST
    local_acts, distances, _ = prototype_activations(
        img_tokens, params["prototype_vectors"],
        ppnet_cfg.prototype_activation_function, ppnet_cfg.epsilon,
    )
    logits_local = jnp.matmul(local_acts, params["last_layer_w"], precision=hi)
    if ppnet_cfg.use_global:
        global_acts, _, _ = prototype_activations(
            cls_tokens, params["prototype_vectors_global"],
            ppnet_cfg.prototype_activation_function, ppnet_cfg.epsilon,
        )
        logits_global = jnp.matmul(
            global_acts.reshape(B, -1), params["last_layer_global_w"],
            precision=hi,
        )
        logits = (
            ppnet_cfg.global_coe * logits_global
            + (1.0 - ppnet_cfg.global_coe) * logits_local
        )
    else:
        logits_global = jnp.zeros_like(logits_local)
        logits = logits_local

    K, P = distances.shape[1], distances.shape[2]
    g = int(round(K ** 0.5))
    return EvalOutput(
        logits=logits,
        cls_token_attn=cls_token_attn,
        distances=distances.transpose(0, 2, 1).reshape(B, P, g, g),
        logits_global=logits_global,
        logits_local=logits_local,
    )
