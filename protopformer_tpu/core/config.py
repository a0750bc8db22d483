"""Typed configuration for ProtoPFormer-TPU.

The reference uses a single flat argparse namespace with ~90 flags
(ref: main.py:34-206) threaded everywhere and pickled into checkpoints.
Here the same knobs are grouped into frozen dataclasses; field names mirror
the reference flags so shell-script presets translate 1:1
(ref: scripts/train_cub.sh:19-63).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


@dataclass(frozen=True)
class BackboneConfig:
    """ViT backbone hyperparameters.

    Presets mirror the reference registrations:
      deit_tiny_patch16_224  — patch 16, embed 192, depth 12, heads 3
                               (ref: tools/deit_models_attn.py:287-289)
      deit_small_patch16_224 — embed 384, heads 6 (ref: deit_models_attn.py:302-304)
      cait_xxs24_224         — embed 192, depth 24, heads 4, init_scale 1e-5,
                               2 class-attention blocks
                               (ref: tools/cait_models_attn.py:202-220,373)
    """

    name: str = "deit_tiny_patch16_224"
    arch: str = "deit"  # "deit" | "cait"
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 3
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0  # ref: main.py:81 --drop
    drop_path_rate: float = 0.1  # ref: main.py:83 --drop_path
    layer_norm_eps: float = 1e-6
    # distillation-token variant (ref: DistilledVisionTransformer,
    # deit_models_attn.py:243-282 — registered by the reference but unused
    # by its ProtoPFormer pipeline; kept for backbone-surface parity)
    distilled: bool = False
    # CaiT-only knobs (ignored for deit):
    depth_token_only: int = 2  # class-attention blocks (ref: cait_models_attn.py:202)
    init_scale: float = 1e-5  # LayerScale init (ref: cait_models_attn.py:373)
    mlp_ratio_token_only: float = 4.0
    # attention-rollout knobs (ref: deit_models_attn.py:99 defaults)
    rollout_discard_ratio: float = 0.9
    rollout_identity_weight: float = 0.2
    rollout_head_fusion: str = "mean"
    # exact reference-parity discard threshold (True, default) vs the
    # bf16-prefix speed variant (False; keeps boundary-prefix ties)
    rollout_exact_discard: bool = True
    # SPEED MODE ONLY (requires rollout_exact_discard=False): run the
    # discard-threshold count passes on a lane-contiguous 1/N subset of
    # each map (1 = exact counts; 2/4 = sampled-quantile estimate —
    # ops/rollout.py::masked_map_stats). The count passes are the serving
    # profile's second-hottest region; the sampled threshold's rank error
    # (~3% of the keep count at 4) sits inside the speed-mode selection
    # contract. DeiT pruning path only (CaiT maps are not probabilities).
    rollout_discard_sample: int = 1
    # ONE batched k-th-statistic bisection over ALL pre-prune layers'
    # (sampled) maps instead of a per-layer search ("on"/"off") — the
    # searches are row-independent so the results are bit-identical
    # (ops/rollout.py::masked_map_stats_multi); the count passes run once
    # over an L-fold bigger stack, amortizing per-pass dispatch overhead.
    rollout_stats_batched: str = "off"
    # Pallas kernels for the rollout normalize: opt-in ("on"/"auto"/"off").
    # Default OFF: on v5e the XLA path (batch-vectorized bit-bisection,
    # ops/rollout.py) measured faster than the per-sample Pallas grid; the
    # kernels remain available for larger-batch/multi-core regimes.
    use_pallas: str = "off"
    # attention lowering under 'mean' prob fusion — all four bit-identical;
    # the faster one is an XLA layout question, re-measured in the bench
    # ablations: 'headloop' (per-head 3-D dots, the default), 'batched'
    # (4-D einsum + transposes), 'headdense' (per-head KERNEL slices so
    # activations are never channel-sliced), 'einsum' (transpose-free
    # einsum forms). Validated in __post_init__.
    attn_impl: str = "headloop"
    # Fused Pallas kernel for the lazy-rollout map statistics
    # ("on"/"auto"/"off"): one VMEM-resident pass per map instead of
    # 15-31 HBM count passes (kernels/stats.py). Default OFF — measured
    # SLOWER end-to-end on v5e (8.58 vs 6.24 ms at B=96: Mosaic's lowering
    # of the resident count passes loses more than the saved HBM reads);
    # kept as a validated ablation for future Mosaic versions.
    stats_kernel: str = "off"
    # int8 dynamic quantization of the dense/MLP stack ("int8"/"off").
    # SERVING feature: the v5e MXU runs int8 at 2x the bf16 rate; weights
    # are quantized per output column and activations per token at trace
    # time from the same fp32 params (ops/quant.py). Default off — bf16 is
    # the AMP-analogous speed mode; int8 is a further opted-in trade with
    # its own selection-contract test.
    quantize: str = "off"
    # Gather the kept tokens at the final prune point and run the remaining
    # block(s) on the (B, 1+k, D) sequence instead of policy-masking the full
    # one ("on"/"auto"/"off"). For kept queries the masked softmax equals the
    # softmax over the kept set up to the 1e-6 eps stabilizer, and dropped
    # rows are discarded by the final gather anyway — "auto" enables it in
    # bf16 speed mode and keeps the reference policy-mask path in fp32
    # parity mode.
    prune_gather: str = "auto"

    # patch-embedding lowering: 'conv' (strided nn.Conv) or 'matmul'
    # (unfold + one MXU dot — same params/math, see layers._PatchProj);
    # the faster one is re-measured in the bench ablations
    patch_embed: str = "conv"
    # LayerNorm statistics lowering: 'fp32' (flax default, parity),
    # 'compute' (stats in the compute dtype — layers.FastLayerNorm;
    # measured null round-3), or 'mxu' (mean/E[x^2] as fp32-accumulated
    # K=C thin matmuls against a ones vector — layers.MxuLayerNorm; the
    # LN-stats fusions are 45% of the round-5 speed profile at 4.8x over
    # HBM roofline). 'compute'/'mxu' are ignored in fp32 compute.
    ln_stats: str = "fp32"

    def __post_init__(self):
        # a typo'd mode string must error, not silently change the lowering
        _check = {
            "attn_impl": (self.attn_impl,
                          ("headloop", "batched", "headdense", "einsum")),
            "use_pallas": (self.use_pallas, ("on", "off", "auto")),
            "stats_kernel": (self.stats_kernel, ("on", "off", "auto")),
            "rollout_stats_batched": (self.rollout_stats_batched,
                                      ("on", "off")),
            "quantize": (self.quantize, ("off", "int8")),
            "prune_gather": (self.prune_gather, ("on", "off", "auto")),
            "patch_embed": (self.patch_embed, ("conv", "matmul")),
            "ln_stats": (self.ln_stats, ("fp32", "compute", "mxu")),
            "rollout_head_fusion": (self.rollout_head_fusion,
                                    ("mean", "max", "min")),
        }
        for name, (value, allowed) in _check.items():
            if value not in allowed:
                raise ValueError(
                    f"BackboneConfig.{name}={value!r} not in {allowed}"
                )
        if self.rollout_discard_sample not in (1, 2, 4, 8):
            raise ValueError(
                "BackboneConfig.rollout_discard_sample="
                f"{self.rollout_discard_sample!r} not in (1, 2, 4, 8)"
            )
        if self.rollout_discard_sample != 1 and self.rollout_exact_discard:
            raise ValueError(
                "rollout_discard_sample > 1 is a speed-mode approximation;"
                " it requires rollout_exact_discard=False"
            )

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size


BACKBONE_PRESETS: Dict[str, BackboneConfig] = {
    "deit_tiny_patch16_224": BackboneConfig(
        name="deit_tiny_patch16_224", arch="deit",
        embed_dim=192, depth=12, num_heads=3,
    ),
    "deit_small_patch16_224": BackboneConfig(
        name="deit_small_patch16_224", arch="deit",
        embed_dim=384, depth=12, num_heads=6,
    ),
    "deit_base_patch16_224": BackboneConfig(
        name="deit_base_patch16_224", arch="deit",
        embed_dim=768, depth=12, num_heads=12,
    ),
    "cait_xxs24_224": BackboneConfig(
        name="cait_xxs24_224", arch="cait",
        embed_dim=192, depth=24, num_heads=4, init_scale=1e-5,
    ),
    "cait_s24_224": BackboneConfig(
        name="cait_s24_224", arch="cait",
        embed_dim=384, depth=24, num_heads=8, init_scale=1e-5,
    ),
    "deit_base_patch16_384": BackboneConfig(
        name="deit_base_patch16_384", arch="deit", img_size=384,
        embed_dim=768, depth=12, num_heads=12,
    ),
    # distilled variants (ref: deit_models_attn.py:330-404)
    "deit_tiny_distilled_patch16_224": BackboneConfig(
        name="deit_tiny_distilled_patch16_224", arch="deit",
        embed_dim=192, depth=12, num_heads=3, distilled=True,
    ),
    "deit_small_distilled_patch16_224": BackboneConfig(
        name="deit_small_distilled_patch16_224", arch="deit",
        embed_dim=384, depth=12, num_heads=6, distilled=True,
    ),
    "deit_base_distilled_patch16_224": BackboneConfig(
        name="deit_base_distilled_patch16_224", arch="deit",
        embed_dim=768, depth=12, num_heads=12, distilled=True,
    ),
    "deit_base_distilled_patch16_384": BackboneConfig(
        name="deit_base_distilled_patch16_384", arch="deit", img_size=384,
        embed_dim=768, depth=12, num_heads=12, distilled=True,
    ),
    # Tiny-image variants used for smoke tests (ref: deit_models_attn.py:405-434)
    "deit_tiny_patch2_32": BackboneConfig(
        name="deit_tiny_patch2_32", arch="deit",
        img_size=32, patch_size=2, embed_dim=192, depth=12, num_heads=3,
    ),
    "deit_tiny_patch2_28": BackboneConfig(
        name="deit_tiny_patch2_28", arch="deit",
        img_size=28, patch_size=2, embed_dim=192, depth=12, num_heads=3,
    ),
    # micro config for CI smoke tests (CPU-fast; not a reference model)
    "deit_micro_test": BackboneConfig(
        name="deit_micro_test", arch="deit",
        img_size=32, patch_size=8, embed_dim=24, depth=3, num_heads=2,
    ),
    "cait_micro_test": BackboneConfig(
        name="cait_micro_test", arch="cait",
        img_size=32, patch_size=8, embed_dim=24, depth=3, num_heads=2,
        depth_token_only=2,
    ),
}


def backbone_preset(name: str, **overrides: Any) -> BackboneConfig:
    cfg = BACKBONE_PRESETS[name]
    return dataclasses.replace(cfg, **overrides) if overrides else cfg


@dataclass(frozen=True)
class PPNetConfig:
    """Prototype-network hyperparameters (ref: protopformer.py:14-139,455-487).

    ``prototype_shape`` keeps the reference's 4-tuple form (P, C, 1, 1) for CLI
    parity; internally prototypes are a (P, C) matrix.
    """

    prototype_shape: Tuple[int, int, int, int] = (2000, 192, 1, 1)
    num_classes: int = 200
    reserve_layers: Tuple[int, ...] = (11,)
    reserve_token_nums: Tuple[int, ...] = (81,)
    use_global: bool = True
    use_ppc_loss: bool = True
    ppc_cov_thresh: float = 1.0
    ppc_mean_thresh: float = 2.0
    global_coe: float = 0.5  # logits = coe*global + (1-coe)*local (ref: protopformer.py:300)
    global_proto_per_class: int = 10
    prototype_activation_function: str = "log"  # 'log' | 'linear'
    add_on_layers_type: str = "regular"  # 'regular' | 'bottleneck' (ref: main.py:49)
    epsilon: float = 1e-4  # log-similarity eps (ref: protopformer.py:41)
    incorrect_class_connection: float = -0.5  # frozen head off-class weight (ref: protopformer.py:401)
    ppc_start_epoch: int = 20  # PPC loss gated on epoch>=20 (ref: tools/engine_proto.py:63-64)
    ppc_cov_coe: float = 0.1
    ppc_mean_coe: float = 0.5

    @property
    def num_prototypes(self) -> int:
        return self.prototype_shape[0]

    @property
    def proto_dim(self) -> int:
        return self.prototype_shape[1]

    @property
    def num_prototypes_global(self) -> int:
        return self.num_classes * self.global_proto_per_class

    @property
    def num_prototypes_per_class(self) -> int:
        assert self.num_prototypes % self.num_classes == 0  # ref: protopformer.py:57
        return self.num_prototypes // self.num_classes

    @property
    def reserve_layer_nums(self) -> Tuple[Tuple[int, int], ...]:
        return tuple(zip(self.reserve_layers, self.reserve_token_nums))

    @property
    def final_reserve_num(self) -> int:
        return self.reserve_token_nums[-1]


@dataclass(frozen=True)
class OptimConfig:
    """Optimizer/schedule knobs (ref: main.py:92-130, tools/create_optimizer.py:27-100).

    Three trainable parameter groups, each with its own LR; the frozen
    class-identity heads are excluded from optimization
    (ref: create_optimizer.py:31-39, protopformer.py:130-131).
    """

    opt: str = "adamw"
    opt_eps: float = 1e-8
    opt_betas: Tuple[float, float] = (0.9, 0.999)
    momentum: float = 0.9
    weight_decay: float = 0.05  # applied to the prototype group (see create_optimizer.py:78)
    group_weight_decay: float = 1e-3  # features/add_on groups (ref: create_optimizer.py:31-32)
    clip_grad: Optional[float] = None
    features_lr: float = 1e-4
    add_on_layers_lr: float = 3e-3
    prototype_vectors_lr: float = 3e-3
    sched: str = "cosine"
    epochs: int = 200
    warmup_epochs: int = 5
    warmup_lr: float = 1e-4
    min_lr: float = 1e-5
    decay_epochs: float = 10
    decay_rate: float = 0.1
    cooldown_epochs: int = 10
    model_ema: bool = True
    model_ema_decay: float = 0.99996
    # timm LR-noise options (ref: main.py:110-114, create_scheduler.py:7-16;
    # unused by every reference preset — carried for scheduler parity).
    # lr_noise: epoch fractions — one value = noise from that epoch on,
    # two = [start, end) window (timm noise_range_t semantics).
    lr_noise: Optional[Tuple[float, ...]] = None
    lr_noise_pct: float = 0.67
    lr_noise_std: float = 1.0
    # the reference seeds the noise with the TRAIN seed (create_scheduler.py:31)
    noise_seed: int = 42
    # timm cycle_limit (create_scheduler.py:26 getattr default 1)
    lr_cycle_limit: int = 1


@dataclass(frozen=True)
class DataConfig:
    """Dataset/augmentation knobs (ref: main.py:132-181, tools/datasets.py)."""

    data_set: str = "CUB2011U"
    data_path: str = "./datasets/cub200_cropped/"
    input_size: int = 224
    batch_size: int = 256
    color_jitter: float = 0.4
    aa: str = "rand-m9-mstd0.5-inc1"
    train_interpolation: str = "bicubic"
    reprob: float = 0.25
    remode: str = "pixel"
    recount: int = 1
    smoothing: float = 0.0
    enable_smoothing: bool = False
    mixup: float = 0.0
    cutmix: float = 1.0
    mixup_prob: float = 1.0
    mixup_switch_prob: float = 0.5
    mixup_mode: str = "batch"
    enable_mixup: bool = False
    num_workers: int = 10


@dataclass(frozen=True)
class TrainConfig:
    """Run-level knobs (ref: main.py:175-206)."""

    seed: int = 1028
    output_dir: str = "output/"
    resume: str = ""
    start_epoch: int = 0
    eval_only: bool = False
    save_ep_freq: int = 400
    dist_eval: bool = False
    # dtype policy: params fp32; compute dtype for the backbone matmuls.
    # "float32" gives bit-parity with the fp32 reference; "bfloat16" is the
    # TPU speed mode (replaces the reference's AMP fp16, engine_proto.py:48).
    compute_dtype: str = "bfloat16"
    # parity-critical paths (rollout, policy softmax, prototype distances)
    # are always fp32 regardless of compute_dtype.


@dataclass(frozen=True)
class ExperimentConfig:
    backbone: BackboneConfig = field(default_factory=BackboneConfig)
    ppnet: PPNetConfig = field(default_factory=PPNetConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    def replace(self, **kw: Any) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)
