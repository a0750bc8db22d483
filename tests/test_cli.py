"""End-to-end CLI smoke test: 2 epochs of training on the synthetic dataset
through main_train.main (args -> config -> data -> model -> optimizer ->
epoch loop -> eval -> checkpoints), on the 8-device CPU mesh."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import main_train


def test_main_train_synthetic_smoke(tmp_path):
    parser = main_train.get_args_parser()
    args = parser.parse_args([
        "--base_architecture=deit_micro_test",
        "--data_set=synthetic",
        "--data_path=",
        "--img_size=32",
        "--input_size=32",
        "--batch_size=8",
        "--epochs=2",
        "--warmup-epochs=1",
        "--prototype_shape", "8", "16", "1", "1",
        "--reserve_layers", "2",
        "--reserve_token_nums", "9",
        "--use_global=True",
        "--use_ppc_loss=True",
        "--global_proto_per_class=2",
        "--num_workers=2",
        "--compute_dtype=float32",
        f"--output_dir={tmp_path}/out",
        "--save_ep_freq=1",
    ])
    stats = main_train.main(args)
    assert "best_acc1" in stats
    assert np.isfinite(stats["best_acc1"])
    # checkpoints + metrics written
    assert os.path.isdir(f"{tmp_path}/out/checkpoints")
    assert os.path.isfile(f"{tmp_path}/out/metrics.jsonl")
    with open(f"{tmp_path}/out/metrics.jsonl") as f:
        lines = [json.loads(l) for l in f]
    assert any("epoch/val_acc1" in l for l in lines)


def test_main_train_eval_only_resume(tmp_path):
    parser = main_train.get_args_parser()
    base = [
        "--base_architecture=deit_micro_test",
        "--data_set=synthetic",
        "--data_path=",
        "--img_size=32", "--input_size=32",
        "--batch_size=8", "--epochs=1", "--warmup-epochs=1",
        "--prototype_shape", "8", "16", "1", "1",
        "--reserve_layers", "2",
        "--reserve_token_nums", "9",
        "--use_global=True", "--global_proto_per_class=2",
        "--num_workers=2", "--compute_dtype=float32",
        f"--output_dir={tmp_path}/out", "--save_ep_freq=1",
    ]
    main_train.main(parser.parse_args(base))
    stats = main_train.main(
        parser.parse_args(base + ["--eval", "--resume=latest"])
    )
    assert "acc1" in stats


def test_main_train_resume_explicit_path_and_reject(tmp_path):
    """--resume honors an explicit checkpoint directory (ref: main.py:393-407
    loads from the given path) and fails FAST on a bogus one."""
    parser = main_train.get_args_parser()
    base = [
        "--base_architecture=deit_micro_test",
        "--data_set=synthetic",
        "--data_path=",
        "--img_size=32", "--input_size=32",
        "--batch_size=8", "--epochs=1", "--warmup-epochs=1",
        "--prototype_shape", "8", "16", "1", "1",
        "--reserve_layers", "2",
        "--reserve_token_nums", "9",
        "--use_global=True", "--global_proto_per_class=2",
        "--num_workers=2", "--compute_dtype=float32",
        "--save_ep_freq=1",
    ]
    main_train.main(parser.parse_args(
        base + [f"--output_dir={tmp_path}/run_a"]
    ))
    # resume from run_a's checkpoint ROOT into a different output dir
    stats = main_train.main(parser.parse_args(
        base + [f"--output_dir={tmp_path}/run_b", "--eval",
                f"--resume={tmp_path}/run_a/checkpoints"]
    ))
    assert "acc1" in stats
    # a specific <root>/<epoch> step dir also works
    import os as _os

    steps = [d for d in _os.listdir(f"{tmp_path}/run_a/checkpoints")
             if d.isdigit()]
    stats = main_train.main(parser.parse_args(
        base + [f"--output_dir={tmp_path}/run_c", "--eval",
                f"--resume={tmp_path}/run_a/checkpoints/{steps[0]}"]
    ))
    assert "acc1" in stats
    with pytest.raises(FileNotFoundError):
        main_train.main(parser.parse_args(
            base + [f"--output_dir={tmp_path}/run_d", "--eval",
                    "--resume=/nonexistent/ckpt"]
        ))


def test_parity_flags_accepted(tmp_path):
    """--finetune / --dist_eval / --native_decode parse like the reference
    surface and do not break a run."""
    parser = main_train.get_args_parser()
    args = parser.parse_args([
        "--base_architecture=deit_micro_test",
        "--data_set=synthetic", "--data_path=",
        "--img_size=32", "--input_size=32",
        "--batch_size=8", "--epochs=1", "--warmup-epochs=1",
        "--prototype_shape", "8", "16", "1", "1",
        "--reserve_layers", "2", "--reserve_token_nums", "9",
        "--use_global=True", "--global_proto_per_class=2",
        "--num_workers=2", "--compute_dtype=float32",
        f"--output_dir={tmp_path}/out", "--save_ep_freq=1",
        "--finetune=some.pth", "--dist_eval=True", "--native_decode=True",
    ])
    assert args.finetune == "some.pth" and args.dist_eval is True
    stats = main_train.main(args)
    assert "best_acc1" in stats


def test_main_train_resume_torch_file_and_url(tmp_path):
    """--resume accepts a reference-side torch .pth (model weights via the
    converter, epoch honored) and an http:// URL (downloaded to a local
    cache first — ref: main.py:394-396 load_state_dict_from_url)."""
    import functools
    import http.server
    import threading

    import jax
    import jax.numpy as jnp
    import torch

    from protopformer_tpu.checkpoint.torch_convert import (
        export_ppnet_state_dict,
    )
    from protopformer_tpu.core.config import PPNetConfig, backbone_preset
    from protopformer_tpu.models import construct_ppnet

    bk = backbone_preset("deit_micro_test", drop_path_rate=0.0)
    pp = PPNetConfig(
        prototype_shape=(8, 16, 1, 1), num_classes=4,
        reserve_layers=(2,), reserve_token_nums=(9,),
        use_global=True, global_proto_per_class=2,
    )
    model = construct_ppnet(bk, pp)
    params = model.init(jax.random.key(3), jnp.zeros((1, 32, 32, 3)))["params"]
    sd = {
        k: torch.from_numpy(np.asarray(v))
        for k, v in export_ppnet_state_dict(
            params, bk.arch, bk.depth, global_proto_per_class=2
        ).items()
    }
    ckpt_path = tmp_path / "ref_ckpt.pth"
    torch.save({"model": sd, "epoch": 0}, str(ckpt_path))

    base = [
        "--base_architecture=deit_micro_test",
        "--data_set=synthetic", "--data_path=",
        "--img_size=32", "--input_size=32",
        "--batch_size=8", "--epochs=1", "--warmup-epochs=1",
        "--prototype_shape", "8", "16", "1", "1",
        "--reserve_layers", "2", "--reserve_token_nums", "9",
        "--use_global=True", "--global_proto_per_class=2",
        "--num_workers=2", "--compute_dtype=float32",
    ]
    parser = main_train.get_args_parser()

    # file form
    stats = main_train.main(parser.parse_args(
        base + [f"--output_dir={tmp_path}/o1", "--eval",
                f"--resume={ckpt_path}"]
    ))
    assert "acc1" in stats

    # URL form, served from localhost
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(tmp_path)
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/ref_ckpt.pth"
        stats2 = main_train.main(parser.parse_args(
            base + [f"--output_dir={tmp_path}/o2", "--eval",
                    f"--resume={url}"]
        ))
    finally:
        srv.shutdown()
    assert "acc1" in stats2
    # identical weights -> identical eval
    assert stats2["acc1"] == stats["acc1"]
