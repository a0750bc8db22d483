"""PyTorch (timm) checkpoint -> JAX pytree conversion.

The reference fine-tunes from FB-hosted timm DeiT/CaiT checkpoints
(ref: tools/deit_models_attn.py:292-296, tools/cait_models_attn.py:22-31,
348-354) and saves its own ``{model, optimizer, ...}`` dicts
(ref: main.py:439-447). This module maps those state dicts onto the Flax
parameter trees of ``models.deit.DeiTBackbone`` / ``models.cait.CaiTBackbone``
/ ``models.ppnet.PPNet`` with exact transposition conventions:

  torch Linear weight (out, in)      -> flax Dense kernel (in, out)  [.T]
  torch Conv2d weight (out, in, h, w)-> flax Conv kernel (h, w, in, out)
  torch LayerNorm weight/bias        -> flax scale/bias
  prototype (P, C, 1, 1)             -> (P, C)
  frozen head Linear weight (cls, P) -> (P, cls)  [.T]

Loading uses ``torch.load`` only to deserialize; all math is numpy. torch is
an optional dependency of this module alone — the training path never
imports it.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional

import numpy as np

Array = np.ndarray
Tree = Dict[str, Any]


def _t(x) -> Array:
    arr = np.asarray(x, dtype=np.float32)
    return arr


def _linear(sd: Mapping[str, Any], prefix: str, bias: bool = True) -> Tree:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd: Mapping[str, Any], prefix: str) -> Tree:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _patch_embed(sd: Mapping[str, Any], prefix: str = "patch_embed.proj") -> Tree:
    w = _t(sd[f"{prefix}.weight"])  # (D, C, p, p)
    return {
        "proj": {
            "kernel": w.transpose(2, 3, 1, 0),  # (p, p, C, D)
            "bias": _t(sd[f"{prefix}.bias"]),
        }
    }


def load_torch_checkpoint(path: str) -> Dict[str, Array]:
    """Deserialize a ``.pth`` file to a flat numpy state dict.

    Handles the reference's wrapping conventions: a top-level ``model`` key
    (timm checkpoints + the reference's own saves, main.py:439-441) and
    ``module.``-prefixed keys from DataParallel
    (ref: tools/cait_models_attn.py:348-354).
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k.replace("module.", "")] = v.detach().cpu().numpy()
    return out


def resize_pos_embed(
    pos_embed: Array, new_num_patches: int, num_prefix_tokens: int = 1
) -> Array:
    """Bicubic positional-embedding resize for input-size changes
    (ref: tools/deit_features.py:40-58 — dead code there, live here).

    Args:
      pos_embed: (1, prefix + N, D).
      new_num_patches: target patch count (must be a square).
    """
    prefix, grid = pos_embed[:, :num_prefix_tokens], pos_embed[0, num_prefix_tokens:]
    n_old = grid.shape[0]
    g_old = int(round(n_old ** 0.5))
    g_new = int(round(new_num_patches ** 0.5))
    if g_old == g_new:
        return pos_embed
    import jax
    import jax.numpy as jnp

    grid = grid.reshape(g_old, g_old, -1)
    resized = jax.image.resize(
        jnp.asarray(grid), (g_new, g_new, grid.shape[-1]), method="bicubic"
    )
    resized = np.asarray(resized).reshape(1, g_new * g_new, -1)
    return np.concatenate([prefix, resized], axis=1)


def convert_deit_state_dict(
    sd: Mapping[str, Any],
    depth: int,
    num_patches: Optional[int] = None,
    include_heads: bool = False,
) -> Tree:
    """timm DeiT/ViT state dict -> DeiTBackbone params tree.

    ``include_heads=False`` (default) drops the classifier heads that every
    real timm checkpoint carries — the reference deletes ``head`` and loads
    with strict=False (deit_models_attn.py:97, :292-296); the plain
    ``DeiTBackbone`` has no head module. Pass True for ``DistilledDeiT``.
    """
    num_prefix = 2 if "dist_token" in sd else 1
    pos_embed = _t(sd["pos_embed"])
    if num_patches is not None:
        pos_embed = resize_pos_embed(pos_embed, num_patches, num_prefix)
    params: Tree = {
        "cls_token": _t(sd["cls_token"]),
        "pos_embed": pos_embed,
        "patch_embed": _patch_embed(sd),
        "norm": _layernorm(sd, "norm"),
    }
    # distilled variants (ref: deit_models_attn.py:243-282)
    if "dist_token" in sd:
        params["dist_token"] = _t(sd["dist_token"])
    if include_heads:
        for head in ("head", "head_dist"):
            if f"{head}.weight" in sd:
                params[head] = _linear(sd, head)
    for i in range(depth):
        p = f"blocks.{i}"
        params[f"blocks_{i}"] = {
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "attn": {
                "qkv": _linear(sd, f"{p}.attn.qkv"),
                "proj": _linear(sd, f"{p}.attn.proj"),
            },
            "mlp": {
                "fc1": _linear(sd, f"{p}.mlp.fc1"),
                "fc2": _linear(sd, f"{p}.mlp.fc2"),
            },
        }
    return params


def convert_cait_state_dict(
    sd: Mapping[str, Any], depth: int, depth_token_only: int = 2
) -> Tree:
    """timm CaiT state dict -> CaiTBackbone params tree.

    CaiT specifics: per-block LayerScale gammas, talking-head ``proj_l`` /
    ``proj_w``, and separate q/k/v in the class-attention blocks
    (ref: tools/cait_models_attn.py:34-132)."""
    params: Tree = {
        "cls_token": _t(sd["cls_token"]),
        "pos_embed": _t(sd["pos_embed"]),
        "patch_embed": _patch_embed(sd),
        "norm": _layernorm(sd, "norm"),
    }
    for i in range(depth):
        p = f"blocks.{i}"
        params[f"blocks_{i}"] = {
            "gamma_1": _t(sd[f"{p}.gamma_1"]),
            "gamma_2": _t(sd[f"{p}.gamma_2"]),
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "attn": {
                "qkv": _linear(sd, f"{p}.attn.qkv"),
                "proj": _linear(sd, f"{p}.attn.proj"),
                "proj_l": _linear(sd, f"{p}.attn.proj_l"),
                "proj_w": _linear(sd, f"{p}.attn.proj_w"),
            },
            "mlp": {
                "fc1": _linear(sd, f"{p}.mlp.fc1"),
                "fc2": _linear(sd, f"{p}.mlp.fc2"),
            },
        }
    for i in range(depth_token_only):
        p = f"blocks_token_only.{i}"
        params[f"blocks_token_only_{i}"] = {
            "gamma_1": _t(sd[f"{p}.gamma_1"]),
            "gamma_2": _t(sd[f"{p}.gamma_2"]),
            "norm1": _layernorm(sd, f"{p}.norm1"),
            "norm2": _layernorm(sd, f"{p}.norm2"),
            "attn": {
                "q": _linear(sd, f"{p}.attn.q"),
                "k": _linear(sd, f"{p}.attn.k"),
                "v": _linear(sd, f"{p}.attn.v"),
                "proj": _linear(sd, f"{p}.attn.proj"),
            },
            "mlp": {
                "fc1": _linear(sd, f"{p}.mlp.fc1"),
                "fc2": _linear(sd, f"{p}.mlp.fc2"),
            },
        }
    return params


def load_pretrained_backbone(path: str, backbone_cfg) -> Tree:
    """One-call pretrained ingestion (the ``--pretrained_ckpt`` path):
    resolve a registered arch name / URL / local path (cached download —
    checkpoint/pretrained.py), deserialize the timm/FB ``.pth``, unwrap
    ``{"model": ...}`` / ``module.`` conventions, convert to the backbone
    params tree, and bicubic-resize the pos-embed if the configured input
    size differs (replaces the reference's torch.hub download +
    strict=False load — ref: tools/deit_features.py:10-62,
    deit_models_attn.py:292-296)."""
    from protopformer_tpu.checkpoint.pretrained import resolve_pretrained

    sd = load_torch_checkpoint(resolve_pretrained(path))
    if backbone_cfg.arch == "deit":
        return convert_deit_state_dict(
            sd, backbone_cfg.depth, backbone_cfg.num_patches
        )
    if backbone_cfg.arch == "cait":
        return convert_cait_state_dict(
            sd, backbone_cfg.depth, backbone_cfg.depth_token_only
        )
    raise ValueError(f"unknown backbone arch: {backbone_cfg.arch}")


def convert_ppnet_state_dict(
    sd: Mapping[str, Any],
    arch: str,
    depth: int,
    depth_token_only: int = 2,
    use_global: bool = True,
) -> Tree:
    """Reference PPNet checkpoint -> PPNet params tree.

    Reference key layout (protopformer.py:76-131): backbone under
    ``features.``, ``add_on_layers.{i}`` 1x1 convs, ``prototype_vectors``
    (P, C, 1, 1), frozen ``last_layer.weight`` (cls, P).
    """
    feat_sd = {
        k[len("features."):]: v for k, v in sd.items() if k.startswith("features.")
    }
    if arch == "deit":
        features = convert_deit_state_dict(feat_sd, depth)
    elif arch == "cait":
        features = convert_cait_state_dict(feat_sd, depth, depth_token_only)
    else:
        raise ValueError(arch)

    add_on: Tree = {}
    conv_idxs = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"add_on_layers\.(\d+)\.weight", k))
        }
    )
    for j, i in enumerate(conv_idxs):
        w = _t(sd[f"add_on_layers.{i}.weight"])  # (out, in, 1, 1)
        add_on[f"layers_{j}"] = {
            "kernel": w[:, :, 0, 0].T,
            "bias": _t(sd[f"add_on_layers.{i}.bias"]),
        }

    params: Tree = {
        "features": features,
        "add_on_layers": add_on,
        "prototype_vectors": _t(sd["prototype_vectors"])[:, :, 0, 0],
        "last_layer_w": _t(sd["last_layer.weight"]).T,
    }
    if use_global and "prototype_vectors_global" in sd:
        params["prototype_vectors_global"] = _t(
            sd["prototype_vectors_global"]
        )[:, :, 0, 0]
        params["last_layer_global_w"] = _t(sd["last_layer_global.weight"]).T
    return params


# --- inverse direction: JAX pytree -> reference-layout torch state dict ---

def _inv_linear(tree: Mapping[str, Any], prefix: str, out: Dict[str, Array]):
    out[f"{prefix}.weight"] = _t(tree["kernel"]).T
    if "bias" in tree:
        out[f"{prefix}.bias"] = _t(tree["bias"])


def _inv_layernorm(tree: Mapping[str, Any], prefix: str, out: Dict[str, Array]):
    out[f"{prefix}.weight"] = _t(tree["scale"])
    out[f"{prefix}.bias"] = _t(tree["bias"])


def _inv_patch_embed(tree: Mapping[str, Any], out: Dict[str, Array]):
    k = _t(tree["proj"]["kernel"])  # (p, p, C, D) -> (D, C, p, p)
    out["patch_embed.proj.weight"] = k.transpose(3, 2, 0, 1)
    out["patch_embed.proj.bias"] = _t(tree["proj"]["bias"])


def export_deit_state_dict(params: Mapping[str, Any], depth: int) -> Dict[str, Array]:
    """DeiTBackbone/DistilledDeiT params tree -> timm-layout state dict.

    Exact inverse of ``convert_deit_state_dict`` (same transposition
    conventions, reversed) so trained JAX checkpoints can be consumed by
    the reference's torch tooling (``strict=False`` loads —
    ref: main_visualize.py:289-291)."""
    sd: Dict[str, Array] = {
        "cls_token": _t(params["cls_token"]),
        "pos_embed": _t(params["pos_embed"]),
    }
    _inv_patch_embed(params["patch_embed"], sd)
    _inv_layernorm(params["norm"], "norm", sd)
    if "dist_token" in params:
        sd["dist_token"] = _t(params["dist_token"])
    for head in ("head", "head_dist"):
        if head in params:
            _inv_linear(params[head], head, sd)
    for i in range(depth):
        blk = params[f"blocks_{i}"]
        p = f"blocks.{i}"
        _inv_layernorm(blk["norm1"], f"{p}.norm1", sd)
        _inv_layernorm(blk["norm2"], f"{p}.norm2", sd)
        _inv_linear(blk["attn"]["qkv"], f"{p}.attn.qkv", sd)
        _inv_linear(blk["attn"]["proj"], f"{p}.attn.proj", sd)
        _inv_linear(blk["mlp"]["fc1"], f"{p}.mlp.fc1", sd)
        _inv_linear(blk["mlp"]["fc2"], f"{p}.mlp.fc2", sd)
    return sd


def export_cait_state_dict(
    params: Mapping[str, Any], depth: int, depth_token_only: int = 2
) -> Dict[str, Array]:
    """CaiTBackbone params tree -> timm-layout state dict (inverse of
    ``convert_cait_state_dict``)."""
    sd: Dict[str, Array] = {
        "cls_token": _t(params["cls_token"]),
        "pos_embed": _t(params["pos_embed"]),
    }
    _inv_patch_embed(params["patch_embed"], sd)
    _inv_layernorm(params["norm"], "norm", sd)
    for i in range(depth):
        blk = params[f"blocks_{i}"]
        p = f"blocks.{i}"
        sd[f"{p}.gamma_1"] = _t(blk["gamma_1"])
        sd[f"{p}.gamma_2"] = _t(blk["gamma_2"])
        _inv_layernorm(blk["norm1"], f"{p}.norm1", sd)
        _inv_layernorm(blk["norm2"], f"{p}.norm2", sd)
        for lin in ("qkv", "proj", "proj_l", "proj_w"):
            _inv_linear(blk["attn"][lin], f"{p}.attn.{lin}", sd)
        _inv_linear(blk["mlp"]["fc1"], f"{p}.mlp.fc1", sd)
        _inv_linear(blk["mlp"]["fc2"], f"{p}.mlp.fc2", sd)
    for i in range(depth_token_only):
        blk = params[f"blocks_token_only_{i}"]
        p = f"blocks_token_only.{i}"
        sd[f"{p}.gamma_1"] = _t(blk["gamma_1"])
        sd[f"{p}.gamma_2"] = _t(blk["gamma_2"])
        _inv_layernorm(blk["norm1"], f"{p}.norm1", sd)
        _inv_layernorm(blk["norm2"], f"{p}.norm2", sd)
        for lin in ("q", "k", "v", "proj"):
            _inv_linear(blk["attn"][lin], f"{p}.attn.{lin}", sd)
        _inv_linear(blk["mlp"]["fc1"], f"{p}.mlp.fc1", sd)
        _inv_linear(blk["mlp"]["fc2"], f"{p}.mlp.fc2", sd)
    return sd


def export_ppnet_state_dict(
    params: Mapping[str, Any],
    arch: str,
    depth: int,
    depth_token_only: int = 2,
    global_proto_per_class: int = 10,
) -> Dict[str, Array]:
    """PPNet params tree -> reference-layout checkpoint state dict
    (inverse of ``convert_ppnet_state_dict``).

    A trained TPU checkpoint exported this way loads into the reference's
    ``construct_PPNet`` model with STRICT ``load_state_dict`` (the tools'
    loading mode — ref: eval_interpretability.py:156, main.py:399): the
    conv add-on layers are re-emitted at the reference's Sequential indices
    0, 2, 4... matching both the 'regular' and 'bottleneck' stacks
    (ref: protopformer.py:90-113), and the keys the reference model ALWAYS
    registers are always emitted —

      * ``ones``: the frozen all-ones (P, C, 1, 1) parameter
        (ref: protopformer.py:123-124);
      * ``last_layer_global.weight``: created unconditionally even when
        ``use_global`` is off (ref: protopformer.py:128-131) and frozen at
        the +1/-0.5 class-identity pattern (ref: :380-386) — synthesized
        from ``global_proto_per_class`` (reserve the reference preset's
        value) when the TPU model carries no global branch."""
    feats = (
        export_deit_state_dict(params["features"], depth)
        if arch == "deit"
        else export_cait_state_dict(
            params["features"], depth, depth_token_only
        )
    )
    sd: Dict[str, Array] = {f"features.{k}": v for k, v in feats.items()}
    add_on = params["add_on_layers"]
    for j in range(len(add_on)):
        layer = add_on[f"layers_{j}"]
        w = _t(layer["kernel"]).T[:, :, None, None]  # (out, in, 1, 1)
        sd[f"add_on_layers.{2 * j}.weight"] = w
        sd[f"add_on_layers.{2 * j}.bias"] = _t(layer["bias"])
    protos = _t(params["prototype_vectors"])
    sd["prototype_vectors"] = protos[:, :, None, None]
    sd["ones"] = np.ones(protos.shape + (1, 1), np.float32)
    sd["last_layer.weight"] = _t(params["last_layer_w"]).T
    if "prototype_vectors_global" in params:
        sd["prototype_vectors_global"] = _t(
            params["prototype_vectors_global"]
        )[:, :, None, None]
        sd["last_layer_global.weight"] = _t(
            params["last_layer_global_w"]
        ).T
    else:
        # no global branch trained: synthesize the frozen identity pattern
        # the reference model holds in this key regardless (it is never
        # trained — requires_grad=False, ref: protopformer.py:131)
        num_classes = _t(params["last_layer_w"]).shape[1]
        n_global = num_classes * global_proto_per_class
        w = np.full((num_classes, n_global), -0.5, np.float32)
        for j in range(n_global):
            w[j // global_proto_per_class, j] = 1.0
        sd["last_layer_global.weight"] = w
    return sd


def save_torch_checkpoint(path: str, sd: Mapping[str, Array]) -> None:
    """Serialize a state dict as a reference-loadable ``.pth``
    (wrapped in the ``{"model": ...}`` convention — ref: main.py:439-441)."""
    import torch

    torch.save(
        {"model": {k: torch.from_numpy(np.array(v, np.float32, copy=True))
                   for k, v in sd.items()}},
        path,
    )
