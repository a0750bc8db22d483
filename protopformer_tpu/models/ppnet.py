"""PPNet — the dual-branch prototype network.

TPU-native rebuild of the reference's ``PPNet`` (ref: protopformer.py:12-401).
Key re-designs:

  * tokens stay (B, K, C); the add-on 1x1 convs become Dense layers and the
    prototype "L2 convolution" is one MXU matmul (ops/distances.py);
  * the frozen class-identity heads are parameters initialized to the
    +1 / incorrect_strength pattern and excluded from optimization (the
    reference keeps them as ``requires_grad=False`` Linear weights —
    protopformer.py:126-131, 367-386 — so they live in checkpoints);
  * forward outputs are typed NamedTuples instead of positional tuples; the
    field order documents the reference contract (protopformer.py:301, :335);
  * the broken ``use_global=False`` eval path (reference falls through to
    training code and crashes on a ``None`` distance — protopformer.py:
    220-226, 292-302) is implemented as the documented behavior instead:
    a local-only branch where ``global_coe`` is ignored.

Parity-critical numerics (rollout, masked softmax, distances, log-sim) are
fp32 regardless of the backbone compute dtype.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from protopformer_tpu.core.config import BackboneConfig, PPNetConfig
from protopformer_tpu.models.registry import create_backbone
from protopformer_tpu.ops.distances import prototype_activations
from protopformer_tpu.ops.ppc import ppc_loss
from protopformer_tpu.ops.tokens import gather_tokens, topk_sorted_indices


class EvalOutput(NamedTuple):
    """Eval forward contract (ref: protopformer.py:301 tuple positions)."""

    logits: jax.Array  # (B, num_classes)
    cls_token_attn: jax.Array  # (B, N) rollout CLS->patch scores
    distances: jax.Array  # (B, P, k, k) local prototype distances (grid layout)
    logits_global: jax.Array  # (B, num_classes)
    logits_local: jax.Array  # (B, num_classes)


class TrainOutput(NamedTuple):
    """Train forward contract (ref: protopformer.py:335 tuple positions)."""

    logits: jax.Array  # (B, num_classes)
    attn_loss: jax.Array  # scalar 0.0 (kept for contract parity, ref: :331)
    total_proto_act: jax.Array  # (B, P, k, k) activation maps (grid layout)
    cls_attn_rollout: jax.Array  # (B, N) detached rollout scores
    original_fea_len: int  # N (static)


class PushOutput(NamedTuple):
    """push_forward contract (ref: protopformer.py:337-344)."""

    cls_token_attn: jax.Array  # (B, N)
    proto_acts: jax.Array  # (B, P, k, k)


def _class_identity_init(
    num_prototypes: int, num_classes: int, incorrect: float
):
    """Frozen head weights: +1 for the prototype's class, ``incorrect`` for
    the rest (ref: set_last_layer_incorrect_connection,
    protopformer.py:367-386). Stored (P, num_classes) for ``acts @ W``."""

    per_class = num_prototypes // num_classes

    def init(key, shape, dtype=jnp.float32):
        assert shape == (num_prototypes, num_classes)
        eye = np.full(shape, incorrect, np.float32)
        for j in range(num_prototypes):
            eye[j, j // per_class] = 1.0
        return jnp.asarray(eye, dtype)

    return init


class AddOnLayers(nn.Module):
    """Add-on projection into prototype space (ref: protopformer.py:90-113).

    'regular' (the trained config, main.py:49): Dense(proto_dim) + sigmoid.
    'bottleneck': halving Dense+ReLU stack ending in Dense+sigmoid.
    Operates on (B, K, C) tokens; the reference's 1x1 convs over NCHW grids
    are pointwise, so Dense over the channel axis is the same map.
    """

    in_dim: int
    proto_dim: int
    kind: str = "regular"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        prec = (
            jax.lax.Precision.HIGHEST
            if self.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        if self.kind == "regular":
            h = nn.Dense(
                self.proto_dim, dtype=self.dtype, param_dtype=jnp.float32,
                precision=prec, kernel_init=kaiming, name="layers_0",
            )(tokens)
            return jax.nn.sigmoid(h.astype(jnp.float32))
        if self.kind == "bottleneck":
            h = tokens
            current = self.in_dim
            idx = 0
            while current > self.proto_dim or idx == 0:
                out = max(self.proto_dim, current // 2)
                h = nn.Dense(out, dtype=self.dtype, param_dtype=jnp.float32,
                             precision=prec, kernel_init=kaiming,
                             name=f"layers_{idx}")(h)
                h = jax.nn.relu(h)
                h = nn.Dense(out, dtype=self.dtype, param_dtype=jnp.float32,
                             precision=prec, kernel_init=kaiming,
                             name=f"layers_{idx + 1}")(h)
                if out > self.proto_dim:
                    h = jax.nn.relu(h)
                else:
                    h = jax.nn.sigmoid(h.astype(jnp.float32))
                current = current // 2
                idx += 2
            return h
        raise ValueError(f"unknown add_on_layers_type: {self.kind}")


class PPNet(nn.Module):
    """Dual-branch prototype classifier over a pruning ViT backbone."""

    backbone_config: BackboneConfig
    config: PPNetConfig
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        # the reference rejects non-instrumented backbones by class-name
        # prefix (protopformer.py:78-86); distilled variants are standalone
        # classifiers, not feature extractors
        if getattr(self.backbone_config, "distilled", False):
            raise ValueError(
                "PPNet requires an attention-tap backbone; distilled "
                "variants are standalone classifiers (ref: "
                "deit_models_attn.py:243-282)"
            )
        self.features = create_backbone(
            self.backbone_config, compute_dtype=self.compute_dtype
        )
        self.add_on = AddOnLayers(
            in_dim=self.backbone_config.embed_dim,
            proto_dim=cfg.proto_dim,
            kind=cfg.add_on_layers_type,
            dtype=self.compute_dtype,
            name="add_on_layers",
        )
        # uniform(0,1) init like torch.rand (ref: protopformer.py:115-119)
        self.prototype_vectors = self.param(
            "prototype_vectors", nn.initializers.uniform(scale=1.0),
            (cfg.num_prototypes, cfg.proto_dim), jnp.float32,
        )
        if cfg.use_global:
            self.prototype_vectors_global = self.param(
                "prototype_vectors_global", nn.initializers.uniform(scale=1.0),
                (cfg.num_prototypes_global, cfg.proto_dim), jnp.float32,
            )
        self.last_layer_w = self.param(
            "last_layer_w",
            _class_identity_init(
                cfg.num_prototypes, cfg.num_classes,
                cfg.incorrect_class_connection,
            ),
            (cfg.num_prototypes, cfg.num_classes), jnp.float32,
        )
        if cfg.use_global:
            self.last_layer_global_w = self.param(
                "last_layer_global_w",
                _class_identity_init(
                    cfg.num_prototypes_global, cfg.num_classes,
                    cfg.incorrect_class_connection,
                ),
                (cfg.num_prototypes_global, cfg.num_classes), jnp.float32,
            )

    # --- feature extraction ------------------------------------------------

    def conv_features(
        self, x: jax.Array, deterministic: bool = True
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Backbone pruning forward + final top-k gather + add-on projection
        (ref: PPNet.conv_features, protopformer.py:141-173).

        Returns:
          (cls_tokens (B, 1, proto_dim), img_tokens (B, k, proto_dim),
           cls_token_attn (B, N) fp32).
        """
        cfg = self.config
        cls_embed, x_embed = self.features.embed_all(x, deterministic)
        gather_final = self._gather_at_prune()
        tokens, cls_token_attn = self.features.masked_forward(
            cls_embed, x_embed, cfg.reserve_layer_nums, deterministic,
            **({"gather_final": True} if gather_final else {}),
        )
        if gather_final:
            # the backbone already gathered the kept set (sorted top-k of
            # cls_token_attn == exactly the second gather below)
            img_tokens = tokens[:, 1:]
        else:
            # second top-k gather of the final reserve set (ref: :156-162)
            idx = topk_sorted_indices(cls_token_attn, cfg.final_reserve_num)
            img_tokens = gather_tokens(tokens[:, 1:], idx)
        cls_tokens = tokens[:, :1]
        return self.add_on(cls_tokens), self.add_on(img_tokens), cls_token_attn

    def _gather_at_prune(self) -> bool:
        """Resolve BackboneConfig.prune_gather at trace time: only the DeiT
        masked forward supports it, and only when the final reserve count
        equals the last prune count (so the gathered set IS the final set)."""
        cfg = self.config
        bcfg = self.backbone_config
        if bcfg.arch != "deit" or not cfg.reserve_layer_nums:
            return False
        rmap = dict(cfg.reserve_layer_nums)
        if rmap[max(rmap)] != cfg.final_reserve_num:
            return False
        mode = getattr(bcfg, "prune_gather", "off")
        if mode == "on":
            return True
        if mode == "off":
            return False
        return self.compute_dtype != jnp.float32

    # --- forward variants ---------------------------------------------------

    def _branch_logits(self, cls_tokens, img_tokens):
        cfg = self.config
        hi = jax.lax.Precision.HIGHEST
        # serving speed mode (bf16 compute): the prototype contraction runs
        # on the bf16 MXU path with fp32 accumulation; fp32 mode keeps the
        # HIGHEST-precision dot the 1e-4 map-parity budget requires
        speed = self.compute_dtype != jnp.float32
        local_acts, distances, act_maps = prototype_activations(
            img_tokens, self.prototype_vectors,
            cfg.prototype_activation_function, cfg.epsilon, speed=speed,
        )
        logits_local = jnp.matmul(local_acts, self.last_layer_w, precision=hi)
        if cfg.use_global:
            global_acts, _, _ = prototype_activations(
                cls_tokens, self.prototype_vectors_global,
                cfg.prototype_activation_function, cfg.epsilon, speed=speed,
            )
            global_acts = global_acts.reshape(global_acts.shape[0], -1)
            logits_global = jnp.matmul(
                global_acts, self.last_layer_global_w, precision=hi
            )
            logits = (
                cfg.global_coe * logits_global
                + (1.0 - cfg.global_coe) * logits_local
            )
        else:
            logits_global = jnp.zeros_like(logits_local)
            logits = logits_local
        return logits, logits_global, logits_local, distances, act_maps

    def _to_grid(self, maps: jax.Array) -> jax.Array:
        """(B, K, P) token layout -> (B, P, k, k) reference grid layout."""
        B, K, P = maps.shape
        g = int(round(K ** 0.5))
        return maps.transpose(0, 2, 1).reshape(B, P, g, g)

    def __call__(
        self, x: jax.Array, train: bool = False
    ):
        """Forward. ``train=False`` -> EvalOutput (ref: protopformer.py:
        292-301); ``train=True`` -> TrainOutput (ref: :304-335)."""
        cfg = self.config
        cls_tokens, img_tokens, cls_token_attn = self.conv_features(
            x, deterministic=not train
        )
        logits, logits_global, logits_local, distances, act_maps = (
            self._branch_logits(cls_tokens, img_tokens)
        )
        if not train:
            return EvalOutput(
                logits=logits,
                cls_token_attn=cls_token_attn,
                distances=self._to_grid(distances),
                logits_global=logits_global,
                logits_local=logits_local,
            )
        return TrainOutput(
            logits=logits,
            attn_loss=jnp.zeros((), jnp.float32),
            total_proto_act=self._to_grid(act_maps),
            cls_attn_rollout=jax.lax.stop_gradient(cls_token_attn),
            original_fea_len=cls_token_attn.shape[-1],
        )

    def push_forward(self, x: jax.Array) -> PushOutput:
        """Offline analysis forward (ref: protopformer.py:337-344)."""
        cls_tokens, img_tokens, cls_token_attn = self.conv_features(
            x, deterministic=True
        )
        _, _, _, _, act_maps = self._branch_logits(cls_tokens, img_tokens)
        return PushOutput(
            cls_token_attn=cls_token_attn, proto_acts=self._to_grid(act_maps)
        )

    def get_ppc_loss(
        self,
        total_proto_act: jax.Array,
        cls_attn_rollout: jax.Array,
        label: jax.Array,
    ) -> Tuple[jax.Array, jax.Array]:
        """PPC loss on the train-forward outputs (ref: protopformer.py:259-288).

        ``total_proto_act`` may be (B, P, k, k) grid layout (the forward
        contract) or (B, P, K) token layout.
        """
        cfg = self.config
        if total_proto_act.ndim == 4:
            B, P = total_proto_act.shape[:2]
            total_proto_act = total_proto_act.reshape(B, P, -1)
        grid_size = int(round(cls_attn_rollout.shape[-1] ** 0.5))
        return ppc_loss(
            total_proto_act,
            cls_attn_rollout,
            label,
            cfg.num_classes,
            cfg.num_prototypes_per_class,
            grid_size,
            cfg.ppc_cov_thresh,
            cfg.ppc_mean_thresh,
        )


class BaseNet(nn.Module):
    """Plain backbone + linear head ablation baseline
    (ref: protopformer.py:404-452)."""

    backbone_config: BackboneConfig
    num_classes: int = 200
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.features = create_backbone(
            self.backbone_config, compute_dtype=self.compute_dtype
        )
        self.last_layer = nn.Dense(
            self.num_classes, dtype=jnp.float32, param_dtype=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            name="last_layer",
        )

    def __call__(self, x: jax.Array, train: bool = False):
        feat = self.features.forward_features(x, deterministic=not train)
        return self.last_layer(feat.astype(jnp.float32)), None

    def push_forward(self, x: jax.Array) -> jax.Array:
        """(B, C, h, w) grid features (ref: protopformer.py:428-436)."""
        maps = self.features.feature_maps(x, deterministic=True)
        B, K, C = maps.shape
        g = int(round(K ** 0.5))
        return maps.transpose(0, 2, 1).reshape(B, C, g, g)


def construct_ppnet(
    backbone: BackboneConfig,
    ppnet: PPNetConfig,
    compute_dtype: jnp.dtype = jnp.float32,
) -> PPNet:
    """Factory mirroring ``construct_PPNet`` (ref: protopformer.py:455-487).
    Pretrained-weight loading is a separate, explicit step
    (checkpoint.torch_convert / checkpoint.manager)."""
    return PPNet(
        backbone_config=backbone, config=ppnet, compute_dtype=compute_dtype
    )
