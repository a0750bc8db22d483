"""CaiT backbone (talking-heads + class-attention) with token pruning.

TPU-native rebuild of the reference's ``MyCait``
(ref: tools/cait_models_attn.py:188-345). Structure: ``depth`` LayerScale
self-attention blocks over the 196 patch tokens (no CLS), then
``depth_token_only`` class-attention blocks that update a separate CLS token
against the frozen patch tokens.

Pruning (ref: forward_feature_mask_train_direct, cait_models_attn.py:314-345):
the self-attention stage runs unmasked while the rollout product accumulates
incrementally; at class-attention block ``i`` in the reserve list, the CLS
scores come from (mean of the normalized class-attention maps so far, CLS
column dropped) x (self-attention rollout), and the resulting top-k policy
masks the class-attention softmax from block ``i`` on.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from protopformer_tpu.core.config import BackboneConfig
from protopformer_tpu.models.layers import (
    LayerScaleBlock,
    LayerScaleBlockClassAttn,
    PatchEmbed,
)
from protopformer_tpu.ops.rollout import (
    _fuse_heads,
    masked_map_stats,
    masked_map_stats_multi,
    normalize_attention_map,
    rollout_row_scores_lazy,
)
from protopformer_tpu.ops.tokens import reserve_policy


class CaiTBackbone(nn.Module):
    """CaiT encoder with attention taps and class-attention token pruning."""

    config: BackboneConfig
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.patch_embed = PatchEmbed(
            cfg.patch_size, cfg.embed_dim, dtype=self.compute_dtype,
            impl=cfg.patch_embed, name="patch_embed",
        )
        self.cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02),
            (1, 1, cfg.embed_dim), jnp.float32,
        )
        # CaiT pos-embed covers patches only; CLS is un-positioned
        # (ref: cait_models_attn.py:303-312)
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, cfg.num_patches, cfg.embed_dim), jnp.float32,
        )
        # constant drop-path across depth (ref: cait_models_attn.py:206)
        self.blocks = [
            LayerScaleBlock(
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                drop_rate=cfg.drop_rate,
                attn_drop=0.0,
                drop_path=cfg.drop_path_rate,
                init_values=cfg.init_scale,
                layer_norm_eps=cfg.layer_norm_eps,
                dtype=self.compute_dtype,
                # 'mean' head fusion: blocks emit the fp32 head-mean map;
                # the (B, H, N, N) fp32 cast never materializes
                fuse_probs=cfg.rollout_head_fusion == "mean",
                name=f"blocks_{i}",
            )
            for i in range(cfg.depth)
        ]
        self.blocks_token_only = [
            LayerScaleBlockClassAttn(
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio_token_only,
                qkv_bias=cfg.qkv_bias,
                init_values=cfg.init_scale,
                layer_norm_eps=cfg.layer_norm_eps,
                dtype=self.compute_dtype,
                name=f"blocks_token_only_{i}",
            )
            for i in range(cfg.depth_token_only)
        ]
        self.norm = nn.LayerNorm(
            cfg.layer_norm_eps, dtype=self.compute_dtype,
            param_dtype=jnp.float32, name="norm",
        )
        self.pos_drop = nn.Dropout(cfg.drop_rate)

    # --- embedding -------------------------------------------------------

    def embed_all(
        self, x: jax.Array, deterministic: bool = True
    ) -> Tuple[jax.Array, jax.Array]:
        """(cls_embed (B,1,D), patch_embed (B,N,D))
        (ref: forward_feature_patch_embed_all, cait_models_attn.py:303-312)."""
        B = x.shape[0]
        tokens = self.patch_embed(x.astype(self.compute_dtype))
        tokens = tokens + self.pos_embed.astype(self.compute_dtype)
        tokens = self.pos_drop(tokens, deterministic=deterministic)
        cls = jnp.broadcast_to(
            self.cls_token.astype(self.compute_dtype),
            (B, 1, self.config.embed_dim),
        )
        return cls, tokens

    # --- forward variants -------------------------------------------------

    def masked_forward(
        self,
        cls_embed: jax.Array,
        x_embed: jax.Array,
        reserve_layer_nums: Sequence[Tuple[int, int]],
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """Pruning forward (ref: cait_models_attn.py:314-345).

        Returns:
          (x (B, 1+N, D) = [CLS; patches] after the final LayerNorm,
           cls_token_attn (B, N) fp32 CLS->patch scores).

        Reserve layer indices refer to the CLASS-ATTENTION blocks and must be
        >= 1 (at index 0 there is no class-attention map to average yet —
        the reference would crash there too).
        """
        B, patch_num, _ = x_embed.shape
        seq_len = 1 + patch_num
        layer_ids = [l for l, _ in reserve_layer_nums]
        reserve_map = dict(reserve_layer_nums)
        assert min(layer_ids) >= 1, "CaiT reserve layer must be >= 1"

        # TPU redesign: only a single row of the SA rollout product is used
        # (the averaged CA row times the product — cait_models_attn.py:259),
        # so keep the LAZY per-layer state (raw fused map + threshold +
        # masked row sums — ops/rollout.py) and contract with that row in
        # reverse order (O(B*N^2)/layer) instead of the reference's
        # O(B*N^3)/layer matrix product over materialized normalized maps.
        cfg = self.config
        x = x_embed
        sa_maps, sa_ts, sa_ss = [], [], []
        for blk in self.blocks:
            x, attn = blk(x, deterministic)
            fmap = jax.lax.stop_gradient(attn)
            if fmap.ndim == 4:  # max/min parity variants
                fmap = _fuse_heads(
                    fmap.astype(jnp.float32), cfg.rollout_head_fusion
                )
            if not cfg.rollout_exact_discard:
                # speed mode: store the map bf16 (same as the DeiT path) —
                # halves the HBM bytes of every count pass and the
                # lazy-rollout reads, and selects the 16-pass bf16 SIGNED
                # bisection (kth_largest_bf16_signed) over the 32-pass
                # fp32 one
                fmap = fmap.astype(jnp.bfloat16)
            sa_maps.append(fmap)
            # signed: post-proj_w talking-heads maps are NOT probabilities —
            # entire maps can be negative (the discard threshold must then
            # be negative too); tests/test_reference_groundtruth.py
            # speed mode: sampled signed counts (round 5) — the quantile
            # estimate from the stratified lane subset is
            # distribution-agnostic, so it composes with the signed key
            # space; 24 signed count chains are CaiT's dominant pruning
            # cost and each reads sample-x fewer bytes
            sample = (
                1 if cfg.rollout_exact_discard
                else cfg.rollout_discard_sample
            )
            if cfg.rollout_stats_batched != "on":
                t, s = masked_map_stats(
                    fmap, cfg.rollout_discard_ratio,
                    cfg.rollout_exact_discard, signed=True, sample=sample,
                )
                sa_ts.append(t)
                sa_ss.append(s)
        if cfg.rollout_stats_batched == "on":
            # ONE batched signed bisection over all 24 SA maps instead of
            # 24 sequential searches (24x 32-pass fp32 count chains are
            # CaiT's dominant pruning cost; bit-identical —
            # ops/rollout.py::masked_map_stats_multi)
            for t, s in masked_map_stats_multi(
                sa_maps, cfg.rollout_discard_ratio,
                cfg.rollout_exact_discard, signed=True, sample=sample,
            ):
                sa_ts.append(t)
                sa_ss.append(s)

        cls_tokens = cls_embed
        policy = jnp.ones((B, seq_len), dtype=jnp.float32)
        ca_norm_sum = jnp.zeros((B, 1, seq_len), dtype=jnp.float32)
        cls_token_attn = None

        for i, blk in enumerate(self.blocks_token_only):
            if i in reserve_map:
                # mean of normalized CA maps so far, CLS column dropped,
                # times the SA rollout (ref: attn_rollout_cait,
                # cait_models_attn.py:250-259)
                cls_mean = jax.lax.stop_gradient(ca_norm_sum) / i
                cls_scores = rollout_row_scores_lazy(
                    sa_maps, sa_ts, sa_ss, cls_mean[:, :, 1:],
                    cfg.rollout_identity_weight,
                )
                cls_token_attn = cls_scores[:, 0]
                policy, _ = reserve_policy(
                    cls_token_attn, reserve_map[i], seq_len
                )
            cls_tokens, attn = blk(x, cls_tokens, policy, deterministic)
            ca_norm_sum = ca_norm_sum + normalize_attention_map(
                _fuse_heads(jax.lax.stop_gradient(attn).astype(jnp.float32),
                            self.config.rollout_head_fusion),
                discard_ratio=self.config.rollout_discard_ratio,
                identity_weight=self.config.rollout_identity_weight,
            )

        x = jnp.concatenate([cls_tokens, x], axis=1)
        x = self.norm(x)
        return x, cls_token_attn

    def forward_features(
        self, x: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        """Unmasked forward, CLS feature (ref: cait_models_attn.py:263-281)."""
        cls_tokens, tokens = self.embed_all(x, deterministic)
        for blk in self.blocks:
            tokens, _ = blk(tokens, deterministic)
        for blk in self.blocks_token_only:
            cls_tokens, _ = blk(tokens, cls_tokens, None, deterministic)
        full = jnp.concatenate([cls_tokens, tokens], axis=1)
        full = self.norm(full)
        return full[:, 0]

    def feature_maps(
        self, x: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        """Unmasked forward, patch features (ref: cait_models_attn.py:283-301)."""
        cls_tokens, tokens = self.embed_all(x, deterministic)
        for blk in self.blocks:
            tokens, _ = blk(tokens, deterministic)
        for blk in self.blocks_token_only:
            cls_tokens, _ = blk(tokens, cls_tokens, None, deterministic)
        full = jnp.concatenate([cls_tokens, tokens], axis=1)
        full = self.norm(full)
        return full[:, 1:]

    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        return self.forward_features(x, deterministic)
