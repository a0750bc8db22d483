"""Training subsystem tests: optimizer groups, schedules, train/eval steps,
data-parallel sharding on the virtual 8-device CPU mesh, and a smoke train
that overfits the synthetic dataset."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from protopformer_tpu.core.config import (
    BackboneConfig,
    DataConfig,
    ExperimentConfig,
    OptimConfig,
    PPNetConfig,
    TrainConfig,
)
from protopformer_tpu.models import construct_ppnet
from protopformer_tpu.parallel import make_mesh, shard_batch
from protopformer_tpu.train import (
    create_train_state,
    cross_entropy_loss,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from protopformer_tpu.train.scheduler import cosine_epoch_schedule

TINY_BK = BackboneConfig(
    name="tiny-test", arch="deit", img_size=32, patch_size=8,
    embed_dim=24, depth=3, num_heads=2, drop_path_rate=0.1,
)
TINY_PP = PPNetConfig(
    prototype_shape=(40, 16, 1, 1), num_classes=4,
    reserve_layers=(2,), reserve_token_nums=(9,),
    use_global=True, global_proto_per_class=3, use_ppc_loss=True,
)
OPT = OptimConfig(epochs=10, warmup_epochs=2, warmup_lr=1e-4,
                  features_lr=1e-3, add_on_layers_lr=3e-3,
                  prototype_vectors_lr=3e-3, model_ema=True)


def _setup(mesh=None):
    model = construct_ppnet(TINY_BK, TINY_PP)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    tx = make_optimizer(OPT, params, steps_per_epoch=4)
    state = create_train_state(params, tx, with_ema=True)
    return model, state


def _batch(B=8):
    rng = np.random.default_rng(0)
    return {
        "image": rng.normal(size=(B, 32, 32, 3)).astype(np.float32),
        "label": (np.arange(B) % 4).astype(np.int32),
    }


def test_cosine_schedule_timm_semantics():
    sched = cosine_epoch_schedule(
        base_lr=1e-3, epochs=10, warmup_epochs=2, warmup_lr=1e-4,
        min_lr=1e-5, steps_per_epoch=5,
    )
    # warmup: epoch 0 -> warmup_lr; epoch 1 -> halfway
    assert np.isclose(float(sched(0)), 1e-4)
    assert np.isclose(float(sched(5)), 1e-4 + (1e-3 - 1e-4) / 2)
    # cosine from epoch 2: lr = min + 0.5*(base-min)*(1+cos(pi*t/T))
    t = 2
    want = 1e-5 + 0.5 * (1e-3 - 1e-5) * (1 + np.cos(np.pi * t / 10))
    assert np.isclose(float(sched(2 * 5)), want, rtol=1e-6)
    # staircase: constant within an epoch
    assert float(sched(10)) == float(sched(14))
    # past the end: min_lr
    assert np.isclose(float(sched(10 * 5 + 3)), 1e-5)


def test_step_schedule_timm_semantics():
    from protopformer_tpu.train.scheduler import step_epoch_schedule

    sched = step_epoch_schedule(
        base_lr=1e-3, decay_epochs=10, decay_rate=0.1, steps_per_epoch=4
    )
    assert np.isclose(float(sched(0)), 1e-3)
    assert np.isclose(float(sched(9 * 4)), 1e-3)  # epoch 9 still base
    assert np.isclose(float(sched(10 * 4)), 1e-4)  # epoch 10 decayed
    assert np.isclose(float(sched(20 * 4)), 1e-5)


def test_group_lr_ratio_reflected_in_updates():
    """prototype group (lr 3e-3) must move ~30x more than features (1e-4)
    relative to gradient scale on the first Adam step (updates are
    ~lr-sized after Adam normalization)."""
    import dataclasses

    opt = dataclasses.replace(
        OPT, features_lr=1e-4, prototype_vectors_lr=3e-3,
        warmup_epochs=0, epochs=10, warmup_lr=1e-4,
    )
    model = construct_ppnet(TINY_BK, TINY_PP)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    tx = make_optimizer(opt, params, steps_per_epoch=4)
    state = create_train_state(params, tx, with_ema=False)
    train_step = make_train_step(model, TINY_PP, opt, donate=False)
    state2, _ = train_step(state, _batch(), jax.random.key(0), jnp.float32(0.0))

    dproto = np.abs(
        np.asarray(state2.params["prototype_vectors"])
        - np.asarray(state.params["prototype_vectors"])
    ).max()
    dfeat = np.abs(
        np.asarray(state2.params["features"]["blocks_0"]["attn"]["qkv"]["kernel"])
        - np.asarray(state.params["features"]["blocks_0"]["attn"]["qkv"]["kernel"])
    ).max()
    # first Adam step magnitude ~= lr (sign-like update); ratio ~30
    assert 10 < dproto / dfeat < 100, (dproto, dfeat)


def test_optimizer_freezes_heads_and_updates_groups():
    model, state = _setup()
    train_step = make_train_step(model, TINY_PP, OPT)
    batch = _batch()
    before = jax.tree_util.tree_map(np.asarray, state.params)
    state2, metrics = train_step(
        state, batch, jax.random.key(0), jnp.float32(1.0)
    )
    after = jax.tree_util.tree_map(np.asarray, state2.params)
    # frozen class-identity heads unchanged
    np.testing.assert_array_equal(
        before["last_layer_w"], after["last_layer_w"]
    )
    np.testing.assert_array_equal(
        before["last_layer_global_w"], after["last_layer_global_w"]
    )
    # everything else moved
    assert not np.allclose(
        before["prototype_vectors"], after["prototype_vectors"]
    )
    assert not np.allclose(
        before["features"]["blocks_0"]["attn"]["qkv"]["kernel"],
        after["features"]["blocks_0"]["attn"]["qkv"]["kernel"],
    )
    assert np.isfinite(float(metrics["loss"]))
    assert "ppc_cov_loss" in metrics
    # EMA moved toward params but isn't equal
    assert state2.ema_params is not None
    assert int(state2.step) == 1


def test_ppc_gate_zero_vs_one():
    model, state = _setup()
    train_step = make_train_step(model, TINY_PP, OPT, donate=False)
    batch = _batch()
    _, m0 = train_step(state, batch, jax.random.key(0), jnp.float32(0.0))
    _, m1 = train_step(state, batch, jax.random.key(0), jnp.float32(1.0))
    # same CE, different total loss when the PPC terms are active
    np.testing.assert_allclose(
        float(m0["ce_loss"]), float(m1["ce_loss"]), rtol=1e-6
    )
    assert float(m1["loss"]) >= float(m0["loss"])


def test_cross_entropy_soft_and_smoothing():
    logits = jnp.asarray([[2.0, 0.0, -1.0]])
    hard = cross_entropy_loss(logits, jnp.asarray([0]))
    soft = cross_entropy_loss(logits, jax.nn.one_hot(jnp.asarray([0]), 3))
    np.testing.assert_allclose(float(hard), float(soft), rtol=1e-6)
    smoothed = cross_entropy_loss(logits, jnp.asarray([0]), smoothing=0.1)
    assert float(smoothed) > float(hard)


def test_train_step_with_mixup():
    from protopformer_tpu.data import MixupCutmix

    model, state = _setup()
    mixup = MixupCutmix(mixup_alpha=0.8, cutmix_alpha=1.0, num_classes=4)
    train_step = make_train_step(model, TINY_PP, OPT, mixup=mixup,
                                 donate=False)
    state2, metrics = train_step(
        state, _batch(), jax.random.key(3), jnp.float32(0.0)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_train_step_on_8_device_mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(jax.devices()[:8])
    model, state = _setup()
    from jax.sharding import NamedSharding, PartitionSpec as P

    state = jax.device_put(state, NamedSharding(mesh, P()))
    train_step = make_train_step(model, TINY_PP, OPT, mesh=mesh, donate=False)
    batch = shard_batch(_batch(B=16), mesh)
    state2, metrics = train_step(
        state, batch, jax.random.key(0), jnp.float32(1.0)
    )
    assert np.isfinite(float(metrics["loss"]))
    # params stay replicated
    p = state2.params["prototype_vectors"]
    assert p.sharding.is_fully_replicated

    eval_step = make_eval_step(model, True, mesh=mesh)
    ebatch = dict(batch)
    ebatch["valid"] = jax.device_put(
        np.ones(16, np.float32),
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data")),
    )
    em = eval_step(state2.params, ebatch)
    assert float(em["n"]) == 16.0
    assert 0.0 <= float(em["correct1"]) <= 16.0


def test_auto_layout_step_matches_default():
    """compile_train_step_auto is the SAME program as make_train_step with
    compiler-chosen state layouts — one step from identical state/batch/rng
    must produce identical metrics and updated params (fp32 CPU: bitwise)."""
    from protopformer_tpu.train.steps import compile_train_step_auto

    model, state = _setup()
    batch = _batch()
    rng = jax.random.key(3)
    default_step = make_train_step(model, TINY_PP, OPT, donate=False)
    s_ref, m_ref = default_step(state, batch, rng, jnp.float32(1.0))

    model2, state2 = _setup()
    auto_step, staged = compile_train_step_auto(
        model2, TINY_PP, OPT, state2, batch, rng
    )
    s_auto, m_auto = auto_step(staged, batch, rng, jnp.float32(1.0))
    assert np.allclose(float(m_auto["loss"]), float(m_ref["loss"]), atol=0)
    np.testing.assert_array_equal(
        np.asarray(s_auto.params["prototype_vectors"]),
        np.asarray(s_ref.params["prototype_vectors"]),
    )
    # the staged state is donated; the returned state must chain
    s_auto2, m2 = auto_step(s_auto, batch, rng, jnp.float32(1.0))
    assert np.isfinite(float(m2["loss"]))
    assert int(s_auto2.step) == 2


def test_auto_layout_step_on_8_device_mesh():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from protopformer_tpu.train.steps import compile_train_step_auto

    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(jax.devices()[:8])
    model, state = _setup()
    state = jax.device_put(state, NamedSharding(mesh, P()))
    batch = _batch(B=16)
    step, staged = compile_train_step_auto(
        model, TINY_PP, OPT, state, batch, jax.random.key(0), mesh=mesh
    )
    # host numpy batches must be accepted (the step stages them itself)
    state2, metrics = step(staged, batch, jax.random.key(0), 1.0)
    assert np.isfinite(float(metrics["loss"]))
    assert state2.params["prototype_vectors"].sharding.is_fully_replicated


def test_eval_step_valid_mask():
    model, state = _setup()
    eval_step = make_eval_step(model, True)
    batch = _batch(B=8)
    batch["valid"] = np.asarray([1, 1, 1, 1, 0, 0, 0, 0], np.float32)
    m = eval_step(state.params, batch)
    assert float(m["n"]) == 4.0
    assert float(m["correct1"]) <= 4.0


def test_smoke_train_overfits_synthetic():
    """End-to-end: tiny PPNet overfits 32 synthetic images in a few epochs
    (the reference's CIFAR/MNIST smoke role, tools/datasets.py:170-181)."""
    from protopformer_tpu.data import (
        HostDataLoader,
        build_dataset_index,
    )

    index = build_dataset_index("synthetic", "", train=True,
                                num_samples=32, num_classes=4, image_size=32)
    transform = lambda img, rng: np.asarray(img, np.float32) / 255.0  # noqa
    loader = HostDataLoader(index, transform, batch_size=16, shuffle=True,
                            seed=0, drop_last=True, num_workers=2)
    model, state = _setup()
    train_step = make_train_step(model, TINY_PP, OPT)
    rng = jax.random.key(0)
    losses = []
    for epoch in range(6):
        loader.set_epoch(epoch)
        for batch in loader:
            b = {"image": batch["image"], "label": batch["label"]}
            state, metrics = train_step(state, b, rng, jnp.float32(0.0))
            losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    # final train accuracy should be well above chance (25%)
    eval_step = make_eval_step(model, True)
    loader.set_epoch(0)
    correct = n = 0
    for batch in loader:
        m = eval_step(state.params, batch)
        correct += float(m["correct1"]); n += float(m["n"])
    assert correct / n > 0.5, f"train acc {correct / n}"


def test_train_one_epoch_batched_sync_aborts_on_nonfinite():
    """The loop must NOT fetch metrics per step (each fetch is a host round
    trip that defeats async dispatch) yet still abort on a non-finite loss
    within sync_every steps of its occurrence."""
    import dataclasses

    from protopformer_tpu.core.config import DataConfig, ExperimentConfig, TrainConfig
    from protopformer_tpu.train.loop import NonFiniteLossError, train_one_epoch

    cfg = ExperimentConfig(
        backbone=TINY_BK, ppnet=TINY_PP,
        optim=dataclasses.replace(OPT, epochs=1),
        data=DataConfig(), train=TrainConfig(),
    )

    class FakeLoader:
        def __init__(self, n):
            self.n = n

        def set_epoch(self, e):
            pass

        def __len__(self):
            return self.n

        def __iter__(self):
            for _ in range(self.n):
                yield {
                    "image": np.zeros((2, 32, 32, 3), np.float32),
                    "label": np.zeros((2,), np.int32),
                    "valid": np.ones((2,), np.float32),
                }

    fetches = []
    bad_at = 7

    def fake_step(state, batch, rng, gate):
        i = len(fetches)
        fetches.append(i)
        loss = jnp.float32(np.nan if i == bad_at else 1.0)
        return state, {"loss": loss, "ce_loss": loss}

    with pytest.raises(NonFiniteLossError, match="iter 7"):
        train_one_epoch(
            fake_step, None, FakeLoader(40), epoch=0,
            rng=jax.random.key(0), cfg=cfg, sync_every=5,
        )
    # the bad step was dispatched at iter 7; the abort must land at the
    # next drain (iter 9 inclusive) — i.e. at most 4 extra dispatches
    assert bad_at < len(fetches) <= bad_at + 5, len(fetches)

    # a clean epoch drains the tail: every step's metrics reach the stats
    calls = []

    def ok_step(state, batch, rng, gate):
        calls.append(1)
        return state, {"loss": jnp.float32(2.0)}

    _, stats, it = train_one_epoch(
        ok_step, None, FakeLoader(13), epoch=0,
        rng=jax.random.key(0), cfg=cfg, sync_every=5,
    )
    assert it == 13 and len(calls) == 13
    assert stats["loss"] == 2.0


def test_lr_noise_matches_timm_algorithm():
    """timm schedule-noise parity: the per-epoch noise table must replicate
    timm Scheduler._add_noise exactly — torch.Generator(seed + t), rejected
    normal draw, applied multiplicatively, only inside the noise window
    (ref: create_scheduler.py:7-16,28-31)."""
    import torch

    from protopformer_tpu.train.scheduler import (
        cosine_epoch_schedule,
        timm_noise_table,
    )

    epochs, seed, pct, std = 20, 1028, 0.67, 1.0
    # window [0.5, 0.8) of total epochs, timm list semantics
    table = timm_noise_table(epochs, [0.5 * epochs, 0.8 * epochs],
                             pct, std, seed)
    for t in range(epochs):
        if 10 <= t < 16:
            g = torch.Generator()
            g.manual_seed(seed + t)
            while True:
                want = torch.randn(1, generator=g).item() * std
                if abs(want) < pct:
                    break
            assert table[t] == np.float32(want), t
            assert abs(table[t]) < pct
        else:
            assert table[t] == 0.0, t

    # applied multiplicatively to the staircase lr
    base = cosine_epoch_schedule(1e-3, epochs, 0, 1e-6, 1e-5, 10)
    noisy = cosine_epoch_schedule(1e-3, epochs, 0, 1e-6, 1e-5, 10,
                                  noise=table)
    for t in (5, 12, 18):
        lr0 = float(base(jnp.asarray(t * 10)))
        lr1 = float(noisy(jnp.asarray(t * 10)))
        np.testing.assert_allclose(lr1, lr0 * (1.0 + table[t]), rtol=1e-6)


def test_cosine_cycle_limit():
    """cycle_limit > 1 restarts the cosine per cycle and parks at min_lr
    after the last cycle (timm CosineLRScheduler cycle arithmetic)."""
    from protopformer_tpu.train.scheduler import cosine_epoch_schedule

    sched = cosine_epoch_schedule(1e-3, 10, 0, 1e-6, 1e-5, 1, cycle_limit=2)
    # epoch 10 = start of cycle 2 -> back at base lr
    np.testing.assert_allclose(float(sched(jnp.asarray(10))), 1e-3, rtol=1e-5)
    # beyond 2 cycles -> min_lr
    np.testing.assert_allclose(float(sched(jnp.asarray(20))), 1e-5, rtol=1e-6)
    # single-cycle default unchanged: epoch >= epochs -> min_lr
    one = cosine_epoch_schedule(1e-3, 10, 0, 1e-6, 1e-5, 1)
    np.testing.assert_allclose(float(one(jnp.asarray(15))), 1e-5, rtol=1e-6)
