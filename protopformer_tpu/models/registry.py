"""Backbone registry.

Replaces the reference's timm-registry shadowing trick (it re-registers stock
timm names so ``create_model`` yields the instrumented classes —
ref: tools/deit_models_attn.py:285-316, tools/cait_models_attn.py:371-382,
tools/deit_features.py:65-91). Here backbones are constructed directly from
typed presets; the same names resolve to the same architectures.
"""

from __future__ import annotations

from typing import Union

import jax.numpy as jnp

from protopformer_tpu.core.config import BACKBONE_PRESETS, BackboneConfig, backbone_preset
from protopformer_tpu.models.cait import CaiTBackbone
from protopformer_tpu.models.deit import DeiTBackbone, DistilledDeiT

BACKBONE_REGISTRY = tuple(BACKBONE_PRESETS)


def create_backbone(
    name_or_config: Union[str, BackboneConfig],
    compute_dtype: jnp.dtype = jnp.float32,
    **overrides,
):
    """Build a backbone module from a preset name or explicit config.

    Equivalent surface to the reference's ``base_architecture_to_features``
    (protopformer.py:8-10) + factory functions (deit_features.py:65-91,
    cait_features.py:4-26). Pretrained-weight ingestion is handled separately
    by ``checkpoint.torch_convert`` (no network fetch on TPU hosts).
    """
    if isinstance(name_or_config, str):
        cfg = backbone_preset(name_or_config, **overrides)
    else:
        cfg = name_or_config
    if cfg.arch == "deit":
        if getattr(cfg, "distilled", False):
            # standalone dual-head classifier (ref: deit_models_attn.py:
            # 243-282) — registered for surface parity; NOT a PPNet
            # feature extractor (the reference pipeline never uses it)
            return DistilledDeiT(cfg, compute_dtype=compute_dtype)
        return DeiTBackbone(cfg, compute_dtype=compute_dtype)
    if cfg.arch == "cait":
        return CaiTBackbone(cfg, compute_dtype=compute_dtype)
    raise ValueError(f"unknown backbone arch: {cfg.arch}")
