"""Tools tests: visualization primitives + interpretability scoring on
synthetic data (no real CUB required)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from protopformer_tpu.core.config import BackboneConfig, PPNetConfig
from protopformer_tpu.data.local_parts import CubPartAnnotations
from protopformer_tpu.models import construct_ppnet
from protopformer_tpu.tools.eval_interpretability import (
    ConsistencyConfig,
    consistency_score,
    part_hits_for_image,
)
from protopformer_tpu.tools.visualize import (
    VisualizationConfig,
    discard_mask_image,
    find_high_activation_crop,
    gaussian_params,
    jet_overlay,
    multivariate_gaussian_surface,
    scatter_activations_to_grid,
    visualize_prototypes,
)

BK = BackboneConfig(
    name="tiny-test", arch="deit", img_size=32, patch_size=8,
    embed_dim=24, depth=3, num_heads=2, drop_path_rate=0.0,
)
PP = PPNetConfig(
    prototype_shape=(8, 16, 1, 1), num_classes=4,
    reserve_layers=(2,), reserve_token_nums=(9,),
    use_global=True, global_proto_per_class=2,
)


def test_find_high_activation_crop():
    act = np.zeros((32, 32), np.float32)
    act[10:18, 20:28] = 1.0  # 64/1024 = 6.25% > the 5% percentile tail
    y0, y1, x0, x1 = find_high_activation_crop(act, 95.0)
    assert (y0, y1, x0, x1) == (10, 18, 20, 28)


def test_gaussian_params_and_surface():
    act = np.zeros((20, 20))
    act[5, 7] = 1.0
    mu, cov = gaussian_params(act)
    np.testing.assert_allclose(mu, [5, 7], atol=1e-6)
    surf = multivariate_gaussian_surface(
        np.array([75.0, 75.0]), np.diag([100.0, 50.0]), size=150
    )
    assert surf.shape == (150, 150)
    assert np.unravel_index(surf.argmax(), surf.shape) == (75, 75)


def test_scatter_and_overlay_and_mask(rng):
    B, P, K, N = 1, 4, 9, 16
    acts = rng.uniform(size=(B, P, K)).astype(np.float32)
    cls_attn = rng.uniform(size=(B, N)).astype(np.float32)
    grid = scatter_activations_to_grid(acts, cls_attn, N)
    assert grid.shape == (B, P, 4, 4)

    img = rng.integers(0, 255, size=(32, 32, 3)).astype(np.uint8)
    over = jet_overlay(img, rng.uniform(size=(32, 32)).astype(np.float32))
    assert over.shape == img.shape and over.dtype == np.uint8

    masked = discard_mask_image(img, cls_attn[0], reserve_num=9, patch_size=8)
    # 16 patches, 9 kept -> 7 blacked out
    black = sum(
        (masked[y * 8:(y + 1) * 8, x * 8:(x + 1) * 8] == 0).all()
        for y in range(4) for x in range(4)
    )
    assert black == 7


def test_visualize_prototypes_writes_files(tmp_path, rng):
    model = construct_ppnet(BK, PP)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), x)["params"]
    views = (rng.uniform(0, 255, size=(4, 32, 32, 3))).astype(np.uint8)
    batch = {"image": x, "label": jnp.asarray([0, 1, 0, 1])}
    cfg = VisualizationConfig(
        output_dir=str(tmp_path / "vis"), vis_classes=(0, 1),
        imgs_per_class=2, use_gauss=True,
    )
    written = visualize_prototypes(
        model, params, [(batch, views)], PP, cfg, patch_size=8
    )
    assert len(written) > 0
    assert all(os.path.isfile(p) for p in written)
    assert any("gauss" in p for p in written)
    assert any("discard_mask" in p for p in written)


def test_part_hits_for_image():
    ppc, g = 2, 4
    maps = np.zeros((ppc, g, g), np.float32)
    maps[0, 0, 0] = 1.0  # argmax upsamples near (0, 0)
    maps[1, 3, 3] = 1.0  # near (223, 223)
    cfg = ConsistencyConfig(half_size=36, img_size=224)
    parts = [(1, 10.0, 10.0), (2, 500.0, 500.0), (3, 0.0, 0.0)]
    bbox = (0.0, 0.0, 600.0, 600.0)
    hits, visible = part_hits_for_image(
        maps, parts, bbox, 224 / 600, 224 / 600, cfg
    )
    assert visible[:3].tolist() == [1.0, 1.0, 1.0]
    assert hits[0, 0] == 1.0 and hits[0, 2] == 1.0  # parts near origin
    assert hits[0, 1] == 0.0
    assert hits[1, 1] == 1.0  # part near the far corner
    assert hits[1, 0] == 0.0


def test_consistency_score_synthetic(rng):
    """A model whose class-prototype activations always peak at the same
    grid cell should be ~100% consistent when the part sits there."""
    model = construct_ppnet(BK, PP)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), x)["params"]

    ids = np.arange(1, 5)
    annotations = CubPartAnnotations(
        id_to_path={i: f"img{i}.jpg" for i in ids},
        id_to_bbox={i: (0.0, 0.0, 64.0, 64.0) for i in ids},
        # one visible part dead center of every image
        id_to_part_loc={i: [(1, 32.0, 32.0)] for i in ids},
    )
    image_sizes = {i: (64, 64) for i in ids}

    def loader():
        yield {
            "image": x,
            "label": np.asarray([0, 1, 2, 3]),
            "valid": np.ones(4, np.float32),
            "position": np.arange(4),
        }

    score = consistency_score(
        model, params, loader(), annotations, ids, image_sizes, PP,
        ConsistencyConfig(half_size=16, img_size=32, part_thresh=0.8),
    )
    # a 32x32 box at any argmax of a 32px image always contains the center
    assert score >= 50.0  # every evaluated prototype hits; unseen ones don't
