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
    """slim_gaussian writes the full output set under <out>/slim_gaussian/
    (ref: main_visualize.py:440-475)."""
    model = construct_ppnet(BK, PP)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), x)["params"]
    views = (rng.uniform(0, 255, size=(4, 32, 32, 3))).astype(np.uint8)
    batch = {"image": x, "label": jnp.asarray([0, 1, 0, 1])}
    cfg = VisualizationConfig(
        output_dir=str(tmp_path / "vis"), vis_classes=(0, 1),
        imgs_per_class=2, use_gauss=True, visual_type="slim_gaussian",
    )
    written = visualize_prototypes(
        model, params, [(batch, views)], PP, cfg, patch_size=8
    )
    assert len(written) > 0
    assert all(os.path.isfile(p) for p in written)
    assert all(f"vis{os.sep}slim_gaussian{os.sep}" in p for p in written)
    assert any("gauss" in p for p in written)
    assert any("discard_mask" in p for p in written)
    assert any("overlay" in p for p in written)


def test_visualize_heatmap_flavor_reference_semantics(tmp_path, rng):
    """'heatmap' (the reference DEFAULT) writes ONLY the optional Gaussian
    figures — the reference has no imwrite outside the slim_gaussian branch
    (ref: main_visualize.py:440 is the only write branch)."""
    model = construct_ppnet(BK, PP)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), x)["params"]
    views = (rng.uniform(0, 255, size=(4, 32, 32, 3))).astype(np.uint8)
    batch = {"image": x, "label": jnp.asarray([0, 1, 0, 1])}

    cfg = VisualizationConfig(
        output_dir=str(tmp_path / "vis"), vis_classes=(0,),
        imgs_per_class=1, use_gauss=True, visual_type="heatmap",
    )
    written = visualize_prototypes(
        model, params, [(batch, views)], PP, cfg, patch_size=8
    )
    assert len(written) > 0
    assert all(f"vis{os.sep}heatmap{os.sep}" in p for p in written)
    assert all("gauss" in p for p in written)  # nothing but gaussian figs

    # without use_gauss, heatmap writes nothing (reference behavior)
    cfg2 = VisualizationConfig(
        output_dir=str(tmp_path / "vis2"), vis_classes=(0,),
        imgs_per_class=1, use_gauss=False, visual_type="heatmap",
    )
    assert visualize_prototypes(
        model, params, [(batch, views)], PP, cfg2, patch_size=8
    ) == []

    with pytest.raises(ValueError):
        visualize_prototypes(
            model, params, [(batch, views)], PP,
            VisualizationConfig(output_dir=str(tmp_path), visual_type="bogus"),
            patch_size=8,
        )


def test_part_hits_for_image():
    ppc, g = 2, 4
    maps = np.zeros((ppc, g, g), np.float32)
    maps[0, 0, 0] = 1.0  # argmax upsamples near (0, 0)
    maps[1, 3, 3] = 1.0  # near (223, 223)
    cfg = ConsistencyConfig(half_size=36, img_size=224)
    parts = [(1, 10, 10), (2, 500, 500), (3, 0, 0)]
    hits, visible = part_hits_for_image(maps, parts, 600, 600, cfg)
    assert visible[:3].tolist() == [1.0, 1.0, 1.0]
    assert hits[0, 0] == 1.0 and hits[0, 2] == 1.0  # parts near origin
    assert hits[0, 1] == 0.0
    assert hits[1, 1] == 1.0  # part near the far corner
    assert hits[1, 0] == 0.0


def _reference_score_port(act_grids, labels, part_locs_by_img, sizes,
                          ppc, num_classes, cfg):
    """Straight-line numpy port of the reference scoring loop
    (ref: eval_interpretability.py:229-337), used as the protocol oracle."""
    import cv2

    class_proto_effect = []
    proto_to_part_all = {}
    for c in range(num_classes):
        idxs = np.nonzero(labels == c)[0]
        all_ptp, all_mask = [], []
        for i in idxs:
            w, h = sizes[i]
            part_labels, part_mask = [], np.zeros(15)
            for part_id, x, y in part_locs_by_img[i]:
                pid = part_id - 1
                part_mask[pid] = 1
                part_labels.append(
                    [pid, int(cfg.img_size * (x / w)),
                     int(cfg.img_size * (y / h))]
                )
            ptp = np.zeros((ppc, 15))
            for j in range(ppc):
                up = cv2.resize(
                    act_grids[i, j], dsize=(cfg.img_size, cfg.img_size),
                    interpolation=cv2.INTER_CUBIC,
                )
                mi = np.where(up == up.max())
                mi = (mi[0][0], mi[1][0])
                box = (max(0, mi[0] - cfg.half_size),
                       min(cfg.img_size, mi[0] + cfg.half_size),
                       max(0, mi[1] - cfg.half_size),
                       min(cfg.img_size, mi[1] + cfg.half_size))
                for pid, lx, ly in part_labels:
                    if box[0] <= ly <= box[1] and box[2] <= lx <= box[3]:
                        ptp[j, pid] = 1
            all_ptp.append(ptp)
            all_mask.append(part_mask)
            proto_to_part_all[int(i)] = ptp
        all_ptp = np.stack(all_ptp).transpose(1, 0, 2)
        all_mask = np.stack(all_mask)
        for j in range(ppc):
            s = all_ptp[j].sum(axis=0)
            ms = all_mask.sum(axis=0)
            ms = np.where(ms == 0, ms + 1, ms)
            class_proto_effect.append(
                1 if ((s / ms) >= cfg.part_thresh).astype(np.int32).sum()
                else 0
            )
    return 100.0 * float(np.mean(class_proto_effect)), proto_to_part_all


def test_consistency_protocol_matches_reference_port():
    """part_hits_for_image + aggregate_score must produce bit-identical
    per-image hit matrices AND the identical final score vs the straight
    numpy port of the reference loop on a random synthetic fixture."""
    from protopformer_tpu.tools.eval_interpretability import aggregate_score

    rng = np.random.default_rng(1028)
    n_img, ppc, num_classes, g = 16, 2, 4, 14
    cfg = ConsistencyConfig(half_size=36, img_size=224, part_thresh=0.8)
    act_grids = rng.normal(size=(n_img, ppc, g, g)).astype(np.float32)
    labels = (np.arange(n_img) % num_classes).astype(np.int64)
    sizes = [(int(rng.integers(100, 640)), int(rng.integers(100, 640)))
             for _ in range(n_img)]
    part_locs = {}
    for i in range(n_img):
        w, h = sizes[i]
        vis = rng.choice(15, size=rng.integers(3, 15), replace=False)
        part_locs[i] = [
            (int(p) + 1, int(rng.integers(0, w)), int(rng.integers(0, h)))
            for p in vis
        ]

    want_score, want_ptp = _reference_score_port(
        act_grids, labels, part_locs, sizes, ppc, num_classes, cfg
    )

    P = num_classes * ppc
    hit_sum = np.zeros((P, 15))
    vis_sum = np.zeros((P, 15))
    for i in range(n_img):
        w, h = sizes[i]
        hits, vis = part_hits_for_image(act_grids[i], part_locs[i], w, h, cfg)
        np.testing.assert_array_equal(hits, want_ptp[i])
        base = labels[i] * ppc
        hit_sum[base:base + ppc] += hits
        vis_sum[base:base + ppc] += vis[None, :]
    got_score = aggregate_score(hit_sum, vis_sum, cfg.part_thresh)
    assert got_score == want_score


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


def test_consistency_score_mesh_and_workers_bit_neutral(rng):
    """The scaled path (data-mesh push_forward + thread-pool matching +
    one-deep device/host pipeline) must produce the IDENTICAL score to the
    inline single-device loop — every image's contribution is an
    independent additive term."""
    from protopformer_tpu.parallel.mesh import make_mesh

    model = construct_ppnet(BK, PP)
    images = jnp.asarray(rng.normal(size=(16, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), images[:1])["params"]

    ids = np.arange(1, 17)
    rs = np.random.default_rng(7)
    annotations = CubPartAnnotations(
        id_to_path={i: f"img{i}.jpg" for i in ids},
        id_to_bbox={i: (0.0, 0.0, 64.0, 64.0) for i in ids},
        id_to_part_loc={
            i: [
                (int(p) + 1, float(rs.integers(0, 64)),
                 float(rs.integers(0, 64)))
                for p in rs.choice(15, size=rs.integers(2, 6), replace=False)
            ]
            for i in ids
        },
    )
    image_sizes = {i: (64, 64) for i in ids}
    labels = np.asarray([0, 1, 2, 3] * 4)

    def loader():
        for s in range(0, 16, 8):
            yield {
                "image": images[s:s + 8],
                "label": labels[s:s + 8],
                "valid": np.ones(8, np.float32),
                "position": np.arange(s, s + 8),
            }

    ccfg = ConsistencyConfig(half_size=16, img_size=32, part_thresh=0.8)
    want = consistency_score(
        model, params, loader(), annotations, ids, image_sizes, PP, ccfg
    )
    got = consistency_score(
        model, params, loader(), annotations, ids, image_sizes, PP, ccfg,
        mesh=make_mesh(), host_workers=4,
    )
    assert got == want
