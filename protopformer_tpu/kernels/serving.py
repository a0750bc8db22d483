"""Fused serving path: PPNet inference built on the fused block kernel.

A pure function over the PPNet Flax parameter tree (no module machinery):
patch-embed (XLA conv) -> 12x fused Pallas blocks (each emitting its
normalized rollout map) -> CLS-row rollout scores -> top-k policy ->
masked final block(s) -> final LayerNorm -> top-k gather -> add-on ->
prototype distances -> dual-branch logits.

STATUS: experimental. On v5e the measured fused block runs ~2.7 ms vs the
XLA path's ~2.2 ms/block at B=256 — Mosaic's reshape/slice limits around the
padded 197-token dim force a per-sample loop that loses XLA's cross-batch
matmul batching, so the DEFAULT inference path remains the Flax model (whose
rollout already uses the CLS-row vector trick and bit-bisection top-k from
ops/rollout.py). Kept as a validated baseline for future kernel iterations;
``tests/test_kernels.py`` checks it against ``PPNet.apply``.

Inference-only by construction (no dropout/drop-path state).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

from protopformer_tpu.core.config import BackboneConfig, PPNetConfig
from protopformer_tpu.kernels.block import fused_deit_block
from protopformer_tpu.models.ppnet import EvalOutput
from protopformer_tpu.ops.distances import prototype_activations
from protopformer_tpu.ops.rollout import rollout_row_scores
from protopformer_tpu.ops.tokens import (
    gather_tokens,
    reserve_policy,
    topk_sorted_indices,
)


def _layernorm(x, p, eps):
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


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

    tokens = _patch_embed(images, feat["patch_embed"], dtype)
    B, N, D = tokens.shape
    cls = jnp.broadcast_to(feat["cls_token"].astype(dtype), (B, 1, D))
    x = jnp.concatenate([cls, tokens], axis=1)
    x = x + feat["pos_embed"].astype(dtype)

    seq_len = N + 1
    reserve_map = dict(ppnet_cfg.reserve_layer_nums)
    last_prune = max(reserve_map)
    policy = jnp.ones((B, seq_len), jnp.float32)
    cls_row = jnp.zeros((B, 1, seq_len), jnp.float32).at[:, 0, 0].set(1.0)
    norm_maps = []
    cls_token_attn = None

    for i in range(cfg.depth):
        if i in reserve_map:
            scores = rollout_row_scores(norm_maps, cls_row)
            cls_token_attn = scores[:, 0, 1:]
            policy, _ = reserve_policy(cls_token_attn, reserve_map[i], seq_len)
        x, m = fused_deit_block(
            x, policy, feat[f"blocks_{i}"],
            num_heads=cfg.num_heads,
            ln_eps=cfg.layer_norm_eps,
            discard_ratio=cfg.rollout_discard_ratio,
            identity_weight=cfg.rollout_identity_weight,
            interpret=interpret,
        )
        if i < last_prune:
            norm_maps.append(m)

    x = _layernorm(x, feat["norm"], cfg.layer_norm_eps)

    # final top-k gather + add-on ('regular': Dense + sigmoid)
    idx = topk_sorted_indices(cls_token_attn, ppnet_cfg.final_reserve_num)
    img_tokens = gather_tokens(x[:, 1:], idx)
    cls_tokens = x[:, :1]
    ao = params["add_on_layers"]["layers_0"]
    proj = lambda t: jax.nn.sigmoid(  # noqa: E731
        jnp.dot(t, ao["kernel"], precision=jax.lax.Precision.HIGHEST)
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
