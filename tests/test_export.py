"""Inverse-converter tests: JAX params -> reference-layout torch state dict.

The export path lets reference users consume TPU-trained checkpoints with
their existing torch tooling (ref: main_visualize.py:287-291 loads
``{"model": ...}`` .pth files). Contract: export is the exact inverse of
the import converter, and a torch model loaded from an exported dict
reproduces the JAX model's outputs to fp32 tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from protopformer_tpu.checkpoint import (
    convert_ppnet_state_dict,
    export_ppnet_state_dict,
    load_torch_checkpoint,
    save_torch_checkpoint,
)
from protopformer_tpu.core.config import BackboneConfig, PPNetConfig
from protopformer_tpu.data.preprocess import normalize_images
from protopformer_tpu.models import construct_ppnet
from tests.torch_reference import RefDeiT, RefPPNet

BK = BackboneConfig(
    name="tiny-test", arch="deit", img_size=32, patch_size=8,
    embed_dim=24, depth=3, num_heads=2, drop_path_rate=0.0,
    rollout_discard_ratio=0.0,
)
PP = PPNetConfig(
    prototype_shape=(40, 16, 1, 1), num_classes=4,
    reserve_layers=(2,), reserve_token_nums=(9,),
    use_global=True, global_proto_per_class=3,
)


def _tree_equal(a, b, path=""):
    assert set(a) == set(b), (path, set(a) ^ set(b))
    for k in a:
        if isinstance(a[k], dict):
            _tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
                err_msg=f"{path}/{k}",
            )


def test_export_roundtrip_exact():
    """convert(export(params)) == params bitwise."""
    model = construct_ppnet(BK, PP)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3))
    )["params"]
    sd = export_ppnet_state_dict(params, arch="deit", depth=3)
    back = convert_ppnet_state_dict(sd, arch="deit", depth=3)
    _tree_equal(jax.tree_util.tree_map(np.asarray, params), back)


def test_exported_checkpoint_drives_torch_reference(tmp_path):
    """A TPU-side PPNet, exported and torch.load-ed into the reference-
    layout torch model, reproduces logits/maps on the same input."""
    model = construct_ppnet(BK, PP)
    params = model.init(
        jax.random.key(3), jnp.zeros((1, 32, 32, 3))
    )["params"]
    path = str(tmp_path / "export.pth")
    save_torch_checkpoint(
        path, export_ppnet_state_dict(params, arch="deit", depth=3)
    )

    sd = load_torch_checkpoint(path)
    ref = RefPPNet(
        RefDeiT(img_size=32, patch_size=8, dim=24, depth=3, heads=2),
        num_prototypes=40, proto_dim=16, num_classes=4,
        reserve_layer_nums=[(2, 9)], global_per_class=3,
        discard_ratio=0.0,
    )
    # strict load: every exported key must land
    ref.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=True
    )
    ref.eval()

    rng = np.random.default_rng(5)
    x = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
    out = model.apply({"params": params}, normalize_images(jnp.asarray(x)))
    with torch.no_grad():
        xt = torch.from_numpy(
            np.asarray(normalize_images(jnp.asarray(x)))
        ).permute(0, 3, 1, 2)
        logits_t, cls_attn_t, d_local_t, *_ = ref(xt)
    np.testing.assert_allclose(
        np.asarray(out.logits), logits_t.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.cls_token_attn), cls_attn_t.numpy(), atol=1e-5
    )


def test_export_roundtrip_cait():
    """CaiT export/convert round trip (talking-heads, LayerScale, separate
    q/k/v class attention) is bitwise exact."""
    bk = BackboneConfig(
        name="tiny-cait", arch="cait", img_size=32, patch_size=8,
        embed_dim=24, depth=3, num_heads=2, depth_token_only=2,
        init_scale=1e-5, rollout_discard_ratio=0.0,
    )
    pp = PPNetConfig(
        prototype_shape=(40, 16, 1, 1), num_classes=4,
        reserve_layers=(1,), reserve_token_nums=(9,),
        use_global=True, global_proto_per_class=3,
    )
    model = construct_ppnet(bk, pp)
    params = model.init(
        jax.random.key(1), jnp.zeros((1, 32, 32, 3))
    )["params"]
    sd = export_ppnet_state_dict(
        params, arch="cait", depth=3, depth_token_only=2
    )
    back = convert_ppnet_state_dict(
        sd, arch="cait", depth=3, depth_token_only=2
    )
    _tree_equal(jax.tree_util.tree_map(np.asarray, params), back)


def test_main_export_cli(tmp_path):
    """main_export.py restores an Orbax checkpoint and writes a .pth whose
    converted-back params equal the saved ones."""
    from main_export import main as export_main
    from main_train import get_args_parser
    from protopformer_tpu.checkpoint.manager import CheckpointManager
    from protopformer_tpu.core.config import OptimConfig
    from protopformer_tpu.train import create_train_state, make_optimizer

    model = construct_ppnet(BK, PP)
    params = model.init(
        jax.random.key(2), jnp.zeros((1, 32, 32, 3))
    )["params"]
    tx = make_optimizer(OptimConfig(), params, steps_per_epoch=1)
    state = create_train_state(params, tx, with_ema=True)
    ckpt_dir = str(tmp_path / "checkpoints")
    CheckpointManager(ckpt_dir).save(0, state)

    parser = get_args_parser()
    parser.add_argument("--export_path", default="")
    parser.add_argument("--use_ema", action="store_true")
    out = str(tmp_path / "export.pth")
    args = parser.parse_args([
        "--base_architecture", "deit_tiny_patch16_224",
        "--img_size", "32",
        "--prototype_shape", "40", "16", "1", "1",
        "--reserve_layers", "2", "--reserve_token_nums", "9",
        "--global_proto_per_class", "3",
        "--resume", ckpt_dir, "--export_path", out,
    ])
    # the tiny test geometry is not a named preset; patch the config hook
    import main_export

    orig = main_export.config_from_args
    try:
        main_export.config_from_args = (
            lambda a: orig(a).replace(backbone=BK, ppnet=PP)
        )
        export_main(args)
    finally:
        main_export.config_from_args = orig

    sd = load_torch_checkpoint(out)
    back = convert_ppnet_state_dict(sd, arch="deit", depth=3)
    _tree_equal(jax.tree_util.tree_map(np.asarray, params), back)


def test_export_emits_reference_mandatory_keys_without_global():
    """The reference PPNet ALWAYS registers 'ones' and 'last_layer_global'
    (protopformer.py:123-131) and its tools load with strict=True
    (eval_interpretability.py:156) — so the export must emit both even for
    a use_global=False model, with the frozen +1/-0.5 identity pattern in
    the synthesized global head."""
    import dataclasses

    pp_local = dataclasses.replace(PP, use_global=False)
    model = construct_ppnet(BK, pp_local)
    params = model.init(
        jax.random.key(3), jnp.zeros((1, 32, 32, 3))
    )["params"]
    sd = export_ppnet_state_dict(
        params, arch="deit", depth=3, global_proto_per_class=3
    )
    assert "prototype_vectors_global" not in params
    np.testing.assert_array_equal(
        sd["ones"], np.ones((40, 16, 1, 1), np.float32)
    )
    wg = sd["last_layer_global.weight"]
    assert wg.shape == (4, 12)
    for j in range(12):
        expected = np.full((4,), -0.5, np.float32)
        expected[j // 3] = 1.0
        np.testing.assert_array_equal(wg[:, j], expected)
