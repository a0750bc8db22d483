"""DeiT backbone with attention-rollout token pruning.

TPU-native rebuild of the reference's ``MyVisionTransformer``
(ref: tools/deit_models_attn.py:84-240). Differences by design:

  * the per-block attention maps are not stacked; the rollout product is
    accumulated incrementally (O(B*N*N) state, see ops/rollout.py);
  * the layer-indexed pruning branch (``if i in layer_ids``) is unrolled at
    trace time — reserve layers are static config, so XLA sees straight-line
    code with fixed shapes;
  * the rollout/top-k/policy computation is under ``stop_gradient`` exactly
    like the reference's ``detach`` (deit_models_attn.py:225).

The pruning forward feeds EVERY block the current policy (initially all
ones), reproducing the reference's eps-stabilized masked softmax even before
the prune point (deit_models_attn.py:218-235).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from protopformer_tpu.core.config import BackboneConfig
from protopformer_tpu.models.layers import Block, PatchEmbed
from protopformer_tpu.ops.rollout import (
    _fuse_heads,
    masked_map_stats,
    masked_map_stats_multi,
    normalize_attention_map,
    rollout_row_scores,
    rollout_row_scores_lazy,
)
from protopformer_tpu.ops.tokens import (
    gather_tokens,
    reserve_policy,
    topk_sorted_indices,
)


def use_pallas_kernels(config: BackboneConfig) -> bool:
    """Resolve the Pallas-kernel gate at trace time."""
    if config.use_pallas == "on":
        return True
    if config.use_pallas == "off":
        return False
    return jax.default_backend() == "tpu"


def use_stats_kernel(config: BackboneConfig) -> bool:
    """Resolve the fused map-stats kernel gate at trace time."""
    mode = getattr(config, "stats_kernel", "off")
    if mode == "on":
        return True
    if mode == "off":
        return False
    return jax.default_backend() == "tpu"


def fused_rollout_core(config: BackboneConfig) -> bool:
    """True when blocks should run the fused Pallas attention core (emitting
    normalized rollout maps directly)."""
    return (
        use_pallas_kernels(config) and config.rollout_head_fusion == "mean"
    )


def normalize_block_attention(
    attn: jax.Array, config: BackboneConfig
) -> jax.Array:
    """One block's probs -> (B, N, N) fp32 normalized rollout map.
    Accepts (B, H, N, N) per-head probs or an already head-fused (B, N, N)
    map (blocks emit the latter under ``fuse_probs``/the Pallas core)."""
    attn = jax.lax.stop_gradient(attn)
    fused = (
        attn.astype(jnp.float32) if attn.ndim == 3
        else _fuse_heads(attn.astype(jnp.float32), config.rollout_head_fusion)
    )
    return normalize_attention_map(
        fused,
        discard_ratio=config.rollout_discard_ratio,
        identity_weight=config.rollout_identity_weight,
        exact_discard=config.rollout_exact_discard,
    )


class DeiTBackbone(nn.Module):
    """DeiT/ViT encoder with attention taps and token pruning."""

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
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, cfg.num_patches + 1, cfg.embed_dim), jnp.float32,
        )
        # stochastic-depth decay 0 -> drop_path_rate (ref: deit_models_attn.py:89)
        depth = cfg.depth
        dpr = [cfg.drop_path_rate * i / max(depth - 1, 1) for i in range(depth)]
        rollout_norm = (
            # 3rd element (exact_discard) selects the map storage dtype of
            # the fused block-stats kernel (layers.Attention)
            (cfg.rollout_discard_ratio, cfg.rollout_identity_weight,
             cfg.rollout_exact_discard)
            if fused_rollout_core(cfg)
            else None
        )
        self.blocks = [
            Block(
                num_heads=cfg.num_heads,
                mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias,
                drop_rate=cfg.drop_rate,
                attn_drop=0.0,  # hardcoded in the reference Block build (:93)
                drop_path=dpr[i],
                layer_norm_eps=cfg.layer_norm_eps,
                dtype=self.compute_dtype,
                rollout_norm=rollout_norm,
                # 'mean' head fusion (the only preset mode): blocks emit the
                # fp32 head-MEAN map directly — per-head probs are never
                # materialized for the rollout tap (layers.Attention)
                fuse_probs=cfg.rollout_head_fusion == "mean",
                quant=getattr(cfg, "quantize", "off") == "int8",
                attn_impl=getattr(cfg, "attn_impl", "headloop"),
                # the head-mean always ACCUMULATES fp32; speed mode rounds
                # once at storage (deeper bf16 accumulation measured ~free
                # but cost one token of the selection contract: 73/81)
                map_dtype=jnp.float32,
                ln_stats=cfg.ln_stats,
                name=f"blocks_{i}",
            )
            for i in range(depth)
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
        """Image -> (cls_embed (B,1,D), patch_embed (B,N,D)) with CLS + pos
        embedding (ref: forward_feature_patch_embed_all,
        deit_models_attn.py:172-181)."""
        B = x.shape[0]
        tokens = self.patch_embed(x.astype(self.compute_dtype))
        cls = jnp.broadcast_to(
            self.cls_token.astype(self.compute_dtype),
            (B, 1, self.config.embed_dim),
        )
        full = jnp.concatenate([cls, tokens], axis=1)
        full = full + self.pos_embed.astype(self.compute_dtype)
        full = self.pos_drop(full, deterministic=deterministic)
        return full[:, :1], full[:, 1:]

    def embed_patches(
        self, x: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        """Patch tokens only, pos-embed without the CLS slot
        (ref: forward_feature_patch_embed, deit_models_attn.py:163-170)."""
        tokens = self.patch_embed(x.astype(self.compute_dtype))
        tokens = tokens + self.pos_embed[:, 1:].astype(self.compute_dtype)
        return self.pos_drop(tokens, deterministic=deterministic)

    # --- forward variants -------------------------------------------------

    def masked_forward(
        self,
        cls_embed: jax.Array,
        x_embed: jax.Array,
        reserve_layer_nums: Sequence[Tuple[int, int]],
        deterministic: bool = True,
        gather_final: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        """Token-pruning forward (ref: forward_feature_mask_train_direct,
        deit_models_attn.py:209-240).

        At each reserve layer the rollout over blocks 0..i-1 (stop_gradient,
        matching the reference's detach) ranks the patches by its CLS row;
        the top-k become the keep-policy and the remaining blocks run with
        the masked softmax.

        TPU redesign: only the CLS ROW of the rollout product is ever used,
        so instead of the reference's running (N, N) matrix product this
        collects the per-layer normalized maps and contracts them with a
        one-hot CLS row in reverse order (ops.rollout.rollout_row_scores) —
        O(B*N^2) per layer instead of O(B*N^3).

        ``gather_final`` (speed mode): at the LAST prune point, physically
        GATHER the kept tokens instead of building a policy mask, and run the
        remaining block(s) on the (B, 1+k, D) sequence. For every KEPT query
        the reference's policy-masked softmax reduces to a plain softmax over
        the kept set (the identity escape only affects dropped rows, whose
        outputs are discarded by the final top-k gather — same scores, same
        indices), so the results differ only in the eps/N stabilizer
        (1e-6-scale, far under bf16 noise). Block 11's attention shrinks
        197^2 -> 82^2 and its denses run on 82 rows.

        Returns:
          (x (B, 1+N, D) — or (B, 1+k, D) under ``gather_final`` — after the
           final LayerNorm,
           cls_token_attn (B, N) fp32 rollout CLS->patch scores from the last
           prune point).
        """
        B, patch_num, _ = x_embed.shape
        seq_len = 1 + patch_num
        reserve_map = dict(reserve_layer_nums)
        last_prune = max(reserve_map)

        x = jnp.concatenate([cls_embed, x_embed], axis=1)
        # static all-ones sentinel until the first prune point (the eps
        # softmax math is identical, minus the policy-tensor broadcast)
        policy = "ones"
        cls_row = jnp.zeros((B, 1, seq_len), jnp.float32).at[:, 0, 0].set(1.0)
        norm_maps = []
        cls_token_attn = None

        # The rollout runs LAZILY: per pre-prune block keep the RAW
        # head-fused fp32 map + its discard threshold + masked row sums
        # (ops/rollout.py::masked_map_stats); the normalized maps are never
        # materialized (rollout_row_scores_lazy). Blocks emit the head-fused
        # map directly under 'mean' fusion (fuse_probs / the Pallas core);
        # max/min parity variants return per-head probs fused here.
        cfg = self.config
        lazy_stats = []
        # batched-stats mode: maps whose threshold search is deferred to
        # the next prune point, where ONE bisection covers them all
        # (bit-identical; ops/rollout.py::masked_map_stats_multi)
        pending_maps = []

        def _flush_pending():
            if pending_maps:
                lazy_stats.extend(masked_map_stats_multi(
                    pending_maps, cfg.rollout_discard_ratio,
                    cfg.rollout_exact_discard, value_bound=1.0,
                    sample=cfg.rollout_discard_sample,
                    stochastic_eps=1e-6,
                ))
                pending_maps.clear()

        for i, blk in enumerate(self.blocks):
            if i in reserve_map:
                _flush_pending()
                scores = rollout_row_scores_lazy(
                    norm_maps, [t for t, _ in lazy_stats],
                    [s for _, s in lazy_stats], cls_row,
                    cfg.rollout_identity_weight,
                )
                cls_token_attn = scores[:, 0, 1:]
                if gather_final and i == last_prune:
                    # same sorted top-k indices the policy (and the caller's
                    # final gather) would use — kept tokens only, CLS first
                    idx = topk_sorted_indices(
                        cls_token_attn, reserve_map[i]
                    )
                    x = jnp.concatenate(
                        [x[:, :1], gather_tokens(x[:, 1:], idx)], axis=1
                    )
                    policy = "ones"
                else:
                    policy, _ = reserve_policy(
                        cls_token_attn, reserve_map[i], seq_len
                    )
            x, aux = blk(x, policy, deterministic, tap=i < last_prune)
            if i < last_prune:
                if isinstance(aux, tuple):
                    # fused block-stats kernel: (map, threshold, row sums)
                    # — the lazy-rollout triple, already in storage dtype;
                    # detached like the reference's rollout
                    fmap, t, s = (jax.lax.stop_gradient(a) for a in aux)
                    norm_maps.append(fmap)
                    lazy_stats.append((t, s))
                    continue
                if aux.ndim == 3:
                    # block emitted the head-fused fp32 map (fuse_probs or
                    # pallas core); rollout is detached like the reference
                    fmap = jax.lax.stop_gradient(aux)
                else:
                    fmap = _fuse_heads(
                        jax.lax.stop_gradient(aux).astype(jnp.float32),
                        cfg.rollout_head_fusion,
                    )
                if not cfg.rollout_exact_discard:
                    # speed mode: store the map bf16 — halves the HBM bytes
                    # of every bisection count pass and the lazy-rollout
                    # reads; the head-mean accumulation above stays fp32
                    fmap = fmap.astype(jnp.bfloat16)
                norm_maps.append(fmap)
                if use_stats_kernel(cfg):
                    # fused kernel: threshold + masked row sums in ONE
                    # HBM pass (kernels/stats.py), same contract
                    from protopformer_tpu.kernels.stats import (
                        fused_map_stats,
                    )

                    lazy_stats.append(fused_map_stats(
                        fmap, cfg.rollout_discard_ratio,
                        cfg.rollout_exact_discard,
                    ))
                elif cfg.rollout_stats_batched == "on":
                    pending_maps.append(fmap)
                else:
                    # value_bound=1.0: DeiT maps are head-fused softmax
                    # probabilities, so the bisection bracket needs no
                    # full-map max pass; stochastic_eps tightens it to the
                    # probability-mass bracket (rows sum to exactly 1 with
                    # the eps floor — ops/masking.py), cutting 2 more
                    # passes in exact mode, bit-identically
                    lazy_stats.append(masked_map_stats(
                        fmap, cfg.rollout_discard_ratio,
                        cfg.rollout_exact_discard, value_bound=1.0,
                        sample=cfg.rollout_discard_sample,
                        stochastic_eps=1e-6,
                    ))

        x = self.norm(x)
        return x, cls_token_attn

    def masked_forward_thresh(
        self,
        cls_embed: jax.Array,
        x_embed: jax.Array,
        token_attn: jax.Array,
        reserve_layer_nums: Sequence[Tuple[int, int]],
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """Threshold-based pruning variant (ref:
        forward_feature_mask_train_thresh, deit_models_attn.py:183-207 —
        present in the reference but unused by its scripts): at each reserve
        layer, keep tokens whose EXTERNAL attention score exceeds
        1/num_patches, and return the rollout over the blocks before the
        first prune point.

        Args:
          token_attn: (B, N) external per-patch scores (the reference passes
            a teacher attention here).

        Returns:
          (x (B, 1+N, D) after the final LayerNorm,
           cls_token_attn (B, N) from the pre-prune rollout).
        """
        B, patch_num, _ = x_embed.shape
        seq_len = 1 + patch_num
        layer_ids = [l for l, _ in reserve_layer_nums]
        first_prune = min(layer_ids)

        x = jnp.concatenate([cls_embed, x_embed], axis=1)
        policy = "ones"
        cls_row = jnp.zeros((B, 1, seq_len), jnp.float32).at[:, 0, 0].set(1.0)
        norm_maps = []

        for i, blk in enumerate(self.blocks):
            if i in layer_ids:
                thresh = 1.0 / patch_num
                keep = (token_attn >= thresh).astype(jnp.float32)
                policy = jnp.concatenate(
                    [jnp.ones((B, 1), jnp.float32), keep], axis=1
                )
            # tap=False: this variant consumes raw maps via
            # normalize_block_attention, not the fused (map, t, s) triple
            x, attn = blk(x, policy, deterministic, tap=False)
            if i < first_prune:
                norm_maps.append(normalize_block_attention(attn, self.config))

        # rollout over the pre-prune blocks only (ref: :202-203)
        cls_token_attn = rollout_row_scores(norm_maps, cls_row)[:, 0, 1:]
        x = self.norm(x)
        return x, cls_token_attn

    def feature_maps(
        self, x: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        """Unmasked forward, patch features only (ref: forward_feature_maps,
        deit_models_attn.py:126-143 — its rollout result is unused there and
        is not computed here)."""
        cls_embed, x_embed = self.embed_all(x, deterministic)
        tokens = jnp.concatenate([cls_embed, x_embed], axis=1)
        for blk in self.blocks:
            tokens, _ = blk(tokens, None, deterministic)
        tokens = self.norm(tokens)
        return tokens[:, 1:]

    def forward_features(
        self, x: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        """Unmasked forward, CLS feature (timm forward_features semantics,
        used by the BaseNet baseline — ref: protopformer.py:438-441)."""
        cls_embed, x_embed = self.embed_all(x, deterministic)
        tokens = jnp.concatenate([cls_embed, x_embed], axis=1)
        for blk in self.blocks:
            tokens, _ = blk(tokens, None, deterministic)
        tokens = self.norm(tokens)
        return tokens[:, 0]

    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        return self.forward_features(x, deterministic)


class DistilledDeiT(nn.Module):
    """DeiT with a distillation token and dual heads
    (ref: DistilledVisionTransformer, tools/deit_models_attn.py:243-282).

    Registered by the reference but not used in the ProtoPFormer pipeline;
    provided for backbone-surface parity. Training returns (cls_logits,
    dist_logits); inference returns their average (ref: :274-282).
    """

    config: BackboneConfig
    num_classes: int = 1000
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
        self.dist_token = self.param(
            "dist_token", nn.initializers.truncated_normal(0.02),
            (1, 1, cfg.embed_dim), jnp.float32,
        )
        # +2 prefix tokens (ref: deit_models_attn.py:247-248)
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, cfg.num_patches + 2, cfg.embed_dim), jnp.float32,
        )
        dpr = [
            cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
            for i in range(cfg.depth)
        ]
        self.blocks = [
            Block(
                num_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
                qkv_bias=cfg.qkv_bias, drop_rate=cfg.drop_rate,
                drop_path=dpr[i], layer_norm_eps=cfg.layer_norm_eps,
                dtype=self.compute_dtype, name=f"blocks_{i}",
            )
            for i in range(cfg.depth)
        ]
        self.norm = nn.LayerNorm(
            cfg.layer_norm_eps, dtype=self.compute_dtype,
            param_dtype=jnp.float32, name="norm",
        )
        self.head = nn.Dense(self.num_classes, param_dtype=jnp.float32,
                             name="head")
        self.head_dist = nn.Dense(self.num_classes, param_dtype=jnp.float32,
                                  name="head_dist")

    def __call__(self, x: jax.Array, train: bool = False):
        B = x.shape[0]
        cfg = self.config
        tokens = self.patch_embed(x.astype(self.compute_dtype))
        cls = jnp.broadcast_to(
            self.cls_token.astype(self.compute_dtype), (B, 1, cfg.embed_dim)
        )
        dist = jnp.broadcast_to(
            self.dist_token.astype(self.compute_dtype), (B, 1, cfg.embed_dim)
        )
        full = jnp.concatenate([cls, dist, tokens], axis=1)
        full = full + self.pos_embed.astype(self.compute_dtype)
        for blk in self.blocks:
            full, _ = blk(full, None, not train)
        full = self.norm(full)
        logits = self.head(full[:, 0].astype(jnp.float32))
        logits_dist = self.head_dist(full[:, 1].astype(jnp.float32))
        if train:
            return logits, logits_dist
        return (logits + logits_dist) / 2.0
