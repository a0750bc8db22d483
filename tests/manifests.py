"""Expected timm checkpoint key/shape manifests for every architecture the
reference registers (ref: tools/deit_models_attn.py:285-434 DeiT configs,
tools/cait_models_attn.py:357-382 CaiT configs).

These are derived INDEPENDENTLY from the reference's registration
hyperparameters and timm's module layout (Linear weight (out, in), Conv2d
(out, in, kh, kw)) — no real ``.pth`` exists in this egress-less
environment, so the manifests pin exactly what the converter must consume:
every key accounted for, every shape as published.
"""

from __future__ import annotations

from typing import Dict, Tuple

Shape = Tuple[int, ...]

IMAGENET_CLASSES = 1000


def deit_manifest(
    embed_dim: int,
    depth: int = 12,
    img: int = 224,
    distilled: bool = False,
    patch: int = 16,
    mlp_ratio: int = 4,
) -> Dict[str, Shape]:
    """timm DeiT/ViT checkpoint layout (FB deit releases)."""
    d = embed_dim
    n_tokens = (img // patch) ** 2 + (2 if distilled else 1)
    m: Dict[str, Shape] = {
        "cls_token": (1, 1, d),
        "pos_embed": (1, n_tokens, d),
        "patch_embed.proj.weight": (d, 3, patch, patch),
        "patch_embed.proj.bias": (d,),
        "norm.weight": (d,),
        "norm.bias": (d,),
        "head.weight": (IMAGENET_CLASSES, d),
        "head.bias": (IMAGENET_CLASSES,),
    }
    if distilled:
        m["dist_token"] = (1, 1, d)
        m["head_dist.weight"] = (IMAGENET_CLASSES, d)
        m["head_dist.bias"] = (IMAGENET_CLASSES,)
    h = d * mlp_ratio
    for i in range(depth):
        p = f"blocks.{i}"
        m.update({
            f"{p}.norm1.weight": (d,), f"{p}.norm1.bias": (d,),
            f"{p}.attn.qkv.weight": (3 * d, d),
            f"{p}.attn.qkv.bias": (3 * d,),
            f"{p}.attn.proj.weight": (d, d),
            f"{p}.attn.proj.bias": (d,),
            f"{p}.norm2.weight": (d,), f"{p}.norm2.bias": (d,),
            f"{p}.mlp.fc1.weight": (h, d), f"{p}.mlp.fc1.bias": (h,),
            f"{p}.mlp.fc2.weight": (d, h), f"{p}.mlp.fc2.bias": (d,),
        })
    return m


def cait_manifest(
    embed_dim: int,
    depth: int = 24,
    num_heads: int = 4,
    depth_token_only: int = 2,
    img: int = 224,
    patch: int = 16,
    mlp_ratio: int = 4,
) -> Dict[str, Shape]:
    """timm CaiT checkpoint layout (LayerScale gammas, talking heads,
    separate q/k/v class attention)."""
    d = embed_dim
    h = d * mlp_ratio
    m: Dict[str, Shape] = {
        "cls_token": (1, 1, d),
        "pos_embed": (1, (img // patch) ** 2, d),  # CaiT: NO CLS slot
        "patch_embed.proj.weight": (d, 3, patch, patch),
        "patch_embed.proj.bias": (d,),
        "norm.weight": (d,),
        "norm.bias": (d,),
        "head.weight": (IMAGENET_CLASSES, d),
        "head.bias": (IMAGENET_CLASSES,),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        m.update({
            f"{p}.gamma_1": (d,), f"{p}.gamma_2": (d,),
            f"{p}.norm1.weight": (d,), f"{p}.norm1.bias": (d,),
            f"{p}.attn.qkv.weight": (3 * d, d),
            f"{p}.attn.qkv.bias": (3 * d,),
            f"{p}.attn.proj.weight": (d, d), f"{p}.attn.proj.bias": (d,),
            f"{p}.attn.proj_l.weight": (num_heads, num_heads),
            f"{p}.attn.proj_l.bias": (num_heads,),
            f"{p}.attn.proj_w.weight": (num_heads, num_heads),
            f"{p}.attn.proj_w.bias": (num_heads,),
            f"{p}.norm2.weight": (d,), f"{p}.norm2.bias": (d,),
            f"{p}.mlp.fc1.weight": (h, d), f"{p}.mlp.fc1.bias": (h,),
            f"{p}.mlp.fc2.weight": (d, h), f"{p}.mlp.fc2.bias": (d,),
        })
    for i in range(depth_token_only):
        p = f"blocks_token_only.{i}"
        m.update({
            f"{p}.gamma_1": (d,), f"{p}.gamma_2": (d,),
            f"{p}.norm1.weight": (d,), f"{p}.norm1.bias": (d,),
            f"{p}.attn.q.weight": (d, d), f"{p}.attn.q.bias": (d,),
            f"{p}.attn.k.weight": (d, d), f"{p}.attn.k.bias": (d,),
            f"{p}.attn.v.weight": (d, d), f"{p}.attn.v.bias": (d,),
            f"{p}.attn.proj.weight": (d, d), f"{p}.attn.proj.bias": (d,),
            f"{p}.norm2.weight": (d,), f"{p}.norm2.bias": (d,),
            f"{p}.mlp.fc1.weight": (h, d), f"{p}.mlp.fc1.bias": (h,),
            f"{p}.mlp.fc2.weight": (d, h), f"{p}.mlp.fc2.bias": (d,),
        })
    return m


# every architecture the reference registers and the repo's registry carries
# (ref configs: deit_models_attn.py:287-289 tiny, :302-304 small, base/384
# and distilled variants :315-434; cait_models_attn.py:371-382)
ALL_MANIFESTS: Dict[str, Dict[str, Shape]] = {
    "deit_tiny_patch16_224": deit_manifest(192),
    "deit_small_patch16_224": deit_manifest(384),
    "deit_base_patch16_224": deit_manifest(768),
    "deit_base_patch16_384": deit_manifest(768, img=384),
    "deit_tiny_distilled_patch16_224": deit_manifest(192, distilled=True),
    "deit_small_distilled_patch16_224": deit_manifest(384, distilled=True),
    "deit_base_distilled_patch16_224": deit_manifest(768, distilled=True),
    "deit_base_distilled_patch16_384": deit_manifest(
        768, img=384, distilled=True
    ),
    "cait_xxs24_224": cait_manifest(192, num_heads=4),
    "cait_s24_224": cait_manifest(384, num_heads=8),
}
