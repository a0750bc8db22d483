"""Converter key-manifest conformance for every registered architecture.

No real timm ``.pth`` exists in this environment (no egress), so these
tests pin the next-best contract: for each of the reference's registered
architectures (tests/manifests.py records the full expected key/shape
inventory derived from the reference configs), the converter must

  * consume EVERY key the checkpoint carries, except the documented drops
    (the ImageNet classifier heads the reference deletes —
    ref: deit_models_attn.py:97, cait_models_attn.py:366-367);
  * never invent keys (a missing checkpoint key is a KeyError, not a
    silently random-init parameter);
  * produce a tree whose structure and shapes EXACTLY match the Flax
    module's init tree (checked via jax.eval_shape — no device compute);
  * resize the pos-embed correctly, including the distilled 2-prefix case.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from protopformer_tpu.checkpoint.torch_convert import (
    convert_cait_state_dict,
    convert_deit_state_dict,
)
from protopformer_tpu.core.config import backbone_preset
from protopformer_tpu.models.registry import create_backbone
from tests.manifests import ALL_MANIFESTS


class _TrackingSD(dict):
    """State dict recording which keys the converter consumed."""

    def __init__(self, manifest):
        super().__init__(
            {k: np.zeros(shape, np.float32) for k, shape in manifest.items()}
        )
        self.consumed = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)


def _tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_tree_shapes(v, path))
        else:
            out[path] = tuple(v.shape)
    return out


def _convert(name, sd):
    cfg = backbone_preset(name)
    if cfg.arch == "deit":
        return cfg, convert_deit_state_dict(
            sd, cfg.depth, cfg.num_patches, include_heads=cfg.distilled
        )
    return cfg, convert_cait_state_dict(sd, cfg.depth, cfg.depth_token_only)


@pytest.mark.parametrize("name", sorted(ALL_MANIFESTS))
def test_converter_consumes_manifest_exactly(name):
    manifest = ALL_MANIFESTS[name]
    sd = _TrackingSD(manifest)
    cfg, params = _convert(name, sd)

    # the classifier heads are the ONLY keys the converter may drop for
    # feature backbones; distilled variants keep theirs (include_heads)
    dropped = set(manifest) - sd.consumed
    expected_drops = (
        set() if cfg.distilled else {"head.weight", "head.bias"}
    )
    assert dropped == expected_drops, f"{name}: unvisited keys {dropped}"

    # converted tree == the Flax module's init tree, structure and shapes
    model = create_backbone(cfg)
    init_shapes = _tree_shapes(
        jax.eval_shape(
            lambda rng: model.init(
                rng, jnp.zeros((1, cfg.img_size, cfg.img_size, 3))
            )["params"],
            jax.random.key(0),
        )
    )
    got_shapes = _tree_shapes(params)
    assert got_shapes == init_shapes, (
        f"{name}: tree mismatch\nonly in converted: "
        f"{set(got_shapes) - set(init_shapes)}\nonly in init: "
        f"{set(init_shapes) - set(got_shapes)}\nshape diffs: "
        f"{ {k: (got_shapes[k], init_shapes[k]) for k in got_shapes if k in init_shapes and got_shapes[k] != init_shapes[k]} }"
    )


def test_converter_rejects_missing_keys():
    """A truncated checkpoint must fail loudly, not random-init the gap."""
    manifest = dict(ALL_MANIFESTS["deit_tiny_patch16_224"])
    del manifest["blocks.7.attn.qkv.weight"]
    sd = {k: np.zeros(s, np.float32) for k, s in manifest.items()}
    with pytest.raises(KeyError, match="blocks.7.attn.qkv.weight"):
        convert_deit_state_dict(sd, 12, 196)


@pytest.mark.parametrize(
    "name", ["deit_tiny_distilled_patch16_224", "deit_tiny_patch16_224"]
)
def test_pos_embed_resize_224_to_384(name):
    """A 224-trained checkpoint loaded into a 384 config must bicubically
    resize the GRID part of the pos-embed while passing the 1 or 2 prefix
    rows (CLS / CLS+dist) through untouched
    (ref: tools/deit_features.py:40-58)."""
    manifest = ALL_MANIFESTS[name]
    cfg = backbone_preset(name)
    n_prefix = 2 if cfg.distilled else 1
    sd = {k: np.zeros(s, np.float32) for k, s in manifest.items()}
    # distinctive prefix rows + smooth grid so the resize is checkable
    pe = np.zeros(manifest["pos_embed"], np.float32)
    pe[0, :n_prefix] = np.arange(1, n_prefix + 1)[:, None]
    g = 14
    grid = np.linspace(0, 1, g * g, dtype=np.float32).reshape(g, g)
    pe[0, n_prefix:, 0] = grid.reshape(-1)
    sd["pos_embed"] = pe

    params = convert_deit_state_dict(
        sd, cfg.depth, num_patches=(384 // 16) ** 2,
        include_heads=cfg.distilled,
    )
    out = params["pos_embed"]
    assert out.shape == (1, 24 * 24 + n_prefix, cfg.embed_dim)
    np.testing.assert_array_equal(out[0, :n_prefix], pe[0, :n_prefix])
    got_grid = out[0, n_prefix:, 0].reshape(24, 24)
    # bicubic upsample of a linear ramp stays a ramp: monotone rows, ends
    # near the original range
    assert abs(got_grid[0, 0] - grid[0, 0]) < 0.05
    assert abs(got_grid[-1, -1] - grid[-1, -1]) < 0.05
    assert np.all(np.diff(got_grid[12]) > -1e-4)
