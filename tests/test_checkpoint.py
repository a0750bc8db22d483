"""Checkpoint manager round-trip + converter edge cases."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from protopformer_tpu.checkpoint.manager import (
    CheckpointManager,
    load_params,
    save_params,
)
from protopformer_tpu.checkpoint.torch_convert import resize_pos_embed
from protopformer_tpu.core.config import BackboneConfig, OptimConfig, PPNetConfig
from protopformer_tpu.models import construct_ppnet
from protopformer_tpu.train import create_train_state, make_optimizer


def _tiny_state():
    bk = BackboneConfig(
        name="t", arch="deit", img_size=32, patch_size=8,
        embed_dim=24, depth=2, num_heads=2,
    )
    pp = PPNetConfig(
        prototype_shape=(8, 16, 1, 1), num_classes=4,
        reserve_layers=(1,), reserve_token_nums=(9,),
        use_global=True, global_proto_per_class=2,
    )
    model = construct_ppnet(bk, pp)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    tx = make_optimizer(OptimConfig(epochs=2), params, steps_per_epoch=2)
    return create_train_state(params, tx, with_ema=True)


def test_manager_save_restore_roundtrip(tmp_path):
    state = _tiny_state()
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(0, state, {"val_acc1": 12.5})
    mgr.save(1, state.replace(step=state.step + 5), {"val_acc1": 20.0})
    assert mgr.latest_epoch() == 1

    template = _tiny_state()
    restored, meta = mgr.restore(template)
    assert int(restored.step) == 5
    assert meta["val_acc1"] == 20.0
    np.testing.assert_array_equal(
        np.asarray(restored.params["prototype_vectors"]),
        np.asarray(state.params["prototype_vectors"]),
    )
    np.testing.assert_array_equal(
        np.asarray(restored.ema_params["prototype_vectors"]),
        np.asarray(state.ema_params["prototype_vectors"]),
    )


def test_params_only_roundtrip(tmp_path):
    state = _tiny_state()
    path = str(tmp_path / "params")
    save_params(path, state.params)
    restored = load_params(path, state.params)
    flat_a = jax.tree_util.tree_leaves(state.params)
    flat_b = jax.tree_util.tree_leaves(restored)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resize_pos_embed_identity_and_bicubic():
    pe = np.random.default_rng(0).normal(size=(1, 1 + 16, 8)).astype(np.float32)
    same = resize_pos_embed(pe, 16)
    np.testing.assert_array_equal(same, pe)
    bigger = resize_pos_embed(pe, 64)
    assert bigger.shape == (1, 1 + 64, 8)
    # prefix token untouched
    np.testing.assert_array_equal(bigger[:, 0], pe[:, 0])
