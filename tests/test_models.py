"""Model-level tests on tiny configurations (fast on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from protopformer_tpu.core.config import BackboneConfig, PPNetConfig
from protopformer_tpu.models import (
    DeiTBackbone,
    CaiTBackbone,
    PPNet,
    BaseNet,
    EvalOutput,
    TrainOutput,
    construct_ppnet,
)

TINY_DEIT = BackboneConfig(
    name="tiny-test", arch="deit", img_size=32, patch_size=8,
    embed_dim=24, depth=3, num_heads=2, drop_path_rate=0.1,
)
TINY_CAIT = BackboneConfig(
    name="tiny-cait-test", arch="cait", img_size=32, patch_size=8,
    embed_dim=24, depth=3, num_heads=2, depth_token_only=2, init_scale=1e-5,
)
TINY_PPNET = PPNetConfig(
    prototype_shape=(40, 16, 1, 1), num_classes=4,
    reserve_layers=(2,), reserve_token_nums=(9,),
    use_global=True, global_proto_per_class=3,
)


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))


def test_deit_masked_forward_shapes(images):
    model = DeiTBackbone(TINY_DEIT)
    params = model.init(jax.random.key(0), images)["params"]

    def run(x):
        return model.apply(
            {"params": params}, x,
            method=lambda m, x: m.masked_forward(
                *m.embed_all(x), [(2, 9)]
            ),
        )

    x, cls_attn = jax.jit(run)(images)
    assert x.shape == (2, 17, 24)
    assert cls_attn.shape == (2, 16)
    assert cls_attn.dtype == jnp.float32
    # rollout rows are stochastic -> CLS scores sum to <= 1 over patches
    total = np.asarray(cls_attn).sum(-1)
    assert (total > 0).all() and (total <= 1.0 + 1e-5).all()


def test_cait_masked_forward_shapes(images):
    model = CaiTBackbone(TINY_CAIT)
    params = model.init(jax.random.key(0), images)["params"]

    def run(x):
        return model.apply(
            {"params": params}, x,
            method=lambda m, x: m.masked_forward(
                *m.embed_all(x), [(1, 9)]
            ),
        )

    x, cls_attn = jax.jit(run)(images)
    assert x.shape == (2, 17, 24)
    assert cls_attn.shape == (2, 16)
    assert np.isfinite(np.asarray(x)).all()


def test_ppnet_over_cait(images):
    """PPNet with the CaiT backbone (Cars-style geometry, reserve CA block 1)."""
    cfg = PPNetConfig(
        prototype_shape=(40, 16, 1, 1), num_classes=4,
        reserve_layers=(1,), reserve_token_nums=(9,),
        use_global=True, global_proto_per_class=3,
    )
    model = construct_ppnet(TINY_CAIT, cfg)
    params = model.init(jax.random.key(0), images)["params"]
    out = model.apply({"params": params}, images)
    assert out.logits.shape == (2, 4)
    assert out.distances.shape == (2, 40, 3, 3)
    assert np.isfinite(np.asarray(out.logits)).all()
    # train contract too
    tout = model.apply(
        {"params": params}, images, train=True,
        rngs={"droppath": jax.random.key(1)},
    )
    assert tout.total_proto_act.shape == (2, 40, 3, 3)
    assert tout.original_fea_len == 16


def test_ppnet_train_forward_contract(images):
    model = construct_ppnet(TINY_DEIT, TINY_PPNET)
    params = model.init(jax.random.key(0), images)["params"]
    out = jax.jit(
        lambda x: model.apply(
            {"params": params}, x, train=True,
            rngs={"droppath": jax.random.key(1), "dropout": jax.random.key(2)},
        )
    )(images)
    assert isinstance(out, TrainOutput)
    assert out.logits.shape == (2, 4)
    assert out.total_proto_act.shape == (2, 40, 3, 3)
    assert out.cls_attn_rollout.shape == (2, 16)
    assert out.original_fea_len == 16
    assert float(out.attn_loss) == 0.0


def test_ppnet_local_only_branch(images):
    cfg = PPNetConfig(
        prototype_shape=(40, 16, 1, 1), num_classes=4,
        reserve_layers=(2,), reserve_token_nums=(9,),
        use_global=False,
    )
    model = construct_ppnet(TINY_DEIT, cfg)
    params = model.init(jax.random.key(0), images)["params"]
    out = model.apply({"params": params}, images)
    np.testing.assert_allclose(
        np.asarray(out.logits), np.asarray(out.logits_local), atol=0
    )
    assert (np.asarray(out.logits_global) == 0).all()


def test_ppnet_push_forward(images):
    model = construct_ppnet(TINY_DEIT, TINY_PPNET)
    params = model.init(jax.random.key(0), images)["params"]
    out = model.apply(
        {"params": params}, images, method=lambda m, x: m.push_forward(x)
    )
    assert out.cls_token_attn.shape == (2, 16)
    assert out.proto_acts.shape == (2, 40, 3, 3)


def test_ppnet_ppc_loss_from_forward(images):
    model = construct_ppnet(TINY_DEIT, TINY_PPNET)
    params = model.init(jax.random.key(0), images)["params"]
    out = model.apply(
        {"params": params}, images, train=True,
        rngs={"droppath": jax.random.key(1), "dropout": jax.random.key(2)},
    )
    label = jnp.asarray([0, 3])
    cov, mean = model.apply(
        {"params": params}, out.total_proto_act, out.cls_attn_rollout, label,
        method=lambda m, a, c, l: m.get_ppc_loss(a, c, l),
    )
    assert np.isfinite(float(cov)) and np.isfinite(float(mean))


def test_ppnet_gradients_flow_and_rollout_detached(images):
    """Gradients reach backbone/add_on/prototypes; frozen heads and the
    rollout path stay gradient-free (ref detach at deit_models_attn.py:225)."""
    model = construct_ppnet(TINY_DEIT, TINY_PPNET)
    params = model.init(jax.random.key(0), images)["params"]
    label = jnp.asarray([0, 1])

    def loss_fn(p):
        out = model.apply({"params": p}, images, train=True,
                          rngs={"droppath": jax.random.key(1)})
        logp = jax.nn.log_softmax(out.logits)
        return -jnp.mean(jnp.take_along_axis(logp, label[:, None], 1))

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    norms = {jax.tree_util.keystr(k): float(jnp.abs(v).max()) for k, v in flat}
    assert norms["['prototype_vectors']"] > 0
    assert norms["['prototype_vectors_global']"] > 0
    assert norms["['add_on_layers']['layers_0']['kernel']"] > 0
    # (the frozen heads DO get mathematical gradients — freezing is the
    # optimizer's job, matching the reference's requires_grad=False params)
    qkv = norms["['features']['blocks_0']['attn']['qkv']['kernel']"]
    assert np.isfinite(qkv) and qkv > 0
    assert all(np.isfinite(v) for v in norms.values())


def test_basenet(images):
    model = BaseNet(TINY_DEIT, num_classes=4)
    params = model.init(jax.random.key(0), images)["params"]
    logits, aux = model.apply({"params": params}, images)
    assert logits.shape == (2, 4)
    assert aux is None
    maps = model.apply(
        {"params": params}, images, method=lambda m, x: m.push_forward(x)
    )
    assert maps.shape == (2, 24, 4, 4)


def test_deit_masked_forward_thresh(images):
    """Threshold-policy variant: tokens below 1/num_patches are masked."""
    model = DeiTBackbone(TINY_DEIT)
    params = model.init(jax.random.key(0), images)["params"]
    rng = np.random.default_rng(1)
    token_attn = jnp.asarray(
        rng.uniform(0, 2.0 / 16, size=(2, 16)).astype(np.float32)
    )
    x, cls_attn = model.apply(
        {"params": params}, images,
        method=lambda m, im: m.masked_forward_thresh(
            *m.embed_all(im), token_attn, [(2, 9)]
        ),
    )
    assert x.shape == (2, 17, 24)
    assert cls_attn.shape == (2, 16)
    assert np.isfinite(np.asarray(x)).all()


def test_distilled_deit(images):
    from protopformer_tpu.models import DistilledDeiT

    import dataclasses

    cfg = dataclasses.replace(TINY_DEIT, drop_path_rate=0.0)
    model = DistilledDeiT(cfg, num_classes=5)
    params = model.init(jax.random.key(0), images)["params"]
    avg = model.apply({"params": params}, images)
    assert avg.shape == (2, 5)
    cls_l, dist_l = model.apply(
        {"params": params}, images, train=True,
        rngs={"droppath": jax.random.key(1)},
    )
    np.testing.assert_allclose(
        np.asarray(avg), (np.asarray(cls_l) + np.asarray(dist_l)) / 2,
        atol=1e-5,
    )


def test_pruning_masks_attention(images):
    """After the prune layer, dropped tokens receive ~zero attention from
    kept tokens (identity escape only lets them attend to themselves)."""
    model = construct_ppnet(TINY_DEIT, TINY_PPNET)
    params = model.init(jax.random.key(0), images)["params"]
    out = model.apply({"params": params}, images)
    # 9 of 16 patches kept; CLS attn of dropped patches should carry
    # no *final* distance mass — proxy: top-9 indices are within range
    idx = np.argsort(-np.asarray(out.cls_token_attn), axis=-1)[:, :9]
    assert (idx < 16).all()


def test_registry_surface_parity(images):
    """Every reference registration resolves to a constructible preset
    (ref: deit_models_attn.py:285-434, cait_models_attn.py:371-382)."""
    from protopformer_tpu.core.config import BACKBONE_PRESETS
    from protopformer_tpu.models.registry import create_backbone

    ref_names = [
        "deit_tiny_patch16_224", "deit_small_patch16_224",
        "deit_base_patch16_224", "deit_tiny_distilled_patch16_224",
        "deit_small_distilled_patch16_224", "deit_base_distilled_patch16_224",
        "deit_base_patch16_384", "deit_base_distilled_patch16_384",
        "deit_tiny_patch2_32", "deit_tiny_patch2_28",
        "cait_xxs24_224", "cait_s24_224",
    ]
    for name in ref_names:
        assert name in BACKBONE_PRESETS, name
        create_backbone(name)  # constructs a module (no init — cheap)


def test_distilled_preset_dispatch(images):
    """Distilled presets resolve to DistilledDeiT; PPNet rejects them like
    the reference's class-name check (protopformer.py:78-86)."""
    import dataclasses

    from protopformer_tpu.models import DistilledDeiT, construct_ppnet
    from protopformer_tpu.models.registry import create_backbone

    cfg = dataclasses.replace(
        TINY_DEIT, distilled=True, drop_path_rate=0.0
    )
    model = create_backbone(cfg)
    assert isinstance(model, DistilledDeiT)
    params = model.init(jax.random.key(0), images)["params"]
    assert model.apply({"params": params}, images).shape == (2, 1000)

    with pytest.raises(ValueError, match="distilled"):
        construct_ppnet(cfg, TINY_PPNET).init(jax.random.key(0), images)


def test_backbone_config_rejects_unknown_mode_strings():
    """A typo'd lowering-mode string must raise, not silently fall through
    to a different code path (attn_impl et al. are trace-time switches)."""
    import dataclasses

    import pytest

    for field, bad in [
        ("attn_impl", "headlop"), ("use_pallas", "yes"),
        ("stats_kernel", "enable"), ("quantize", "int4"),
        ("prune_gather", "1"), ("rollout_head_fusion", "avg"),
    ]:
        with pytest.raises(ValueError, match=field):
            dataclasses.replace(TINY_DEIT, **{field: bad})
    # all documented values construct fine
    for impl in ("headloop", "batched", "headdense", "einsum"):
        dataclasses.replace(TINY_DEIT, attn_impl=impl)


@pytest.mark.parametrize("exact", [False, True])
def test_deit_masked_forward_fused_block_stats(images, exact):
    """``use_pallas='on'`` + bf16 compute routes pre-prune blocks through
    the fully-fused block-stats kernel; ``masked_forward`` consumes the
    (map, t, s) triple directly. Selections and outputs must agree with the
    XLA bf16 path (identical params)."""
    import dataclasses
    from jax.experimental.pallas import tpu as pltpu

    cfg_off = dataclasses.replace(
        TINY_DEIT, drop_path_rate=0.0, use_pallas="off",
        rollout_exact_discard=exact,
    )
    cfg_on = dataclasses.replace(cfg_off, use_pallas="on")

    def run(cfg, x):
        model = DeiTBackbone(cfg, compute_dtype=jnp.bfloat16)
        params = model.init(jax.random.key(0), x)["params"]
        return model.apply(
            {"params": params}, x,
            method=lambda m, x: m.masked_forward(
                *m.embed_all(x), [(2, 9)]
            ),
        )

    want_x, want_attn = run(cfg_off, images)
    with pltpu.force_tpu_interpret_mode():
        got_x, got_attn = run(cfg_on, images)

    assert got_x.shape == want_x.shape == (2, 17, 24)
    assert np.isfinite(np.asarray(got_x, np.float32)).all()
    # the kernel accumulates the head mean in fp32 (XLA headloop: storage
    # dtype) — near-ties may swap, but the selected token SETS must agree
    for b in range(2):
        got_set = set(np.argsort(-np.asarray(got_attn, np.float32))[b, :9])
        want_set = set(np.argsort(-np.asarray(want_attn, np.float32))[b, :9])
        assert len(got_set & want_set) >= 8, (got_set, want_set)
    np.testing.assert_allclose(
        np.asarray(got_x, np.float32), np.asarray(want_x, np.float32),
        atol=0.15,
    )
