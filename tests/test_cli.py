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
