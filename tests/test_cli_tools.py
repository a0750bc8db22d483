"""End-to-end CLI drives of the offline tools on a synthetic CUB tree.

The tool LOGIC is fixture-tested in test_tools.py; these tests drive the
actual ``main_visualize.py`` / ``main_eval_interpretability.py`` entry
points (arg parsing -> data loading -> checkpoint restore -> tool -> file
outputs) the way a user runs them.
"""

import json
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from protopformer_tpu.checkpoint.manager import save_params
from protopformer_tpu.core.config import PPNetConfig, backbone_preset
from protopformer_tpu.models import construct_ppnet

# micro geometry compatible with the hardcoded 200-class CUB head:
# 400 local prototypes (2/class), 200 global (1/class), 3x3 reserve grid
PP_ARGS = [
    "--base_architecture", "deit_micro_test",
    "--prototype_shape", "400", "16", "1", "1",
    "--reserve_layers", "2", "--reserve_token_nums", "9",
    "--global_proto_per_class", "1",
]


def _make_cub_tree(tmp_path, n_imgs=4, size=(60, 40)):
    base = tmp_path / "CUB_200_2011"
    (base / "images" / "001.Black_footed_Albatross").mkdir(parents=True)
    (base / "parts").mkdir()
    rng = np.random.default_rng(0)
    names = []
    for i in range(1, n_imgs + 1):
        name = f"001.Black_footed_Albatross/img_{i}.jpg"
        arr = (rng.uniform(size=(size[1], size[0], 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(base / "images" / name)
        names.append(name)
    (base / "images.txt").write_text(
        "".join(f"{i} {n}\n" for i, n in enumerate(names, 1))
    )
    (base / "image_class_labels.txt").write_text(
        "".join(f"{i} 1\n" for i in range(1, n_imgs + 1))
    )
    # half train, half test
    (base / "train_test_split.txt").write_text(
        "".join(
            f"{i} {1 if i <= n_imgs // 2 else 0}\n"
            for i in range(1, n_imgs + 1)
        )
    )
    (base / "bounding_boxes.txt").write_text(
        "".join(f"{i} 5 5 50 30\n" for i in range(1, n_imgs + 1))
    )
    (base / "parts" / "part_locs.txt").write_text(
        "".join(
            f"{i} {p} {10 + p} {10} {1 if p < 9 else 0}\n"
            for i in range(1, n_imgs + 1) for p in range(1, 16)
        )
    )
    return base


@pytest.fixture(scope="module")
def params_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt")
    bk = backbone_preset("deit_micro_test", drop_path_rate=0.0)
    pp = PPNetConfig(
        prototype_shape=(400, 16, 1, 1), num_classes=200,
        reserve_layers=(2,), reserve_token_nums=(9,),
        use_global=True, global_proto_per_class=1,
    )
    model = construct_ppnet(bk, pp)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3))
    )["params"]
    path = str(d / "params")
    save_params(path, params)
    return path


def test_main_visualize_cli(tmp_path, params_dir, monkeypatch):
    import main_visualize

    _make_cub_tree(tmp_path)
    out = tmp_path / "vis"
    monkeypatch.setattr(
        sys, "argv",
        ["main_visualize.py", *PP_ARGS,
         "--data_set", "CUB2011", "--data_path", str(tmp_path),
         "--resume", params_dir, "--output_dir", str(out),
         "--vis_classes", "0", "--imgs_per_class", "2",
         "--batch_size", "2", "--visual_type", "slim_gaussian"],
    )
    main_visualize.main()
    written = list(out.rglob("*.png")) + list(out.rglob("*.jpg"))
    assert written, "visualization CLI wrote no images"


def test_main_eval_interpretability_cli(tmp_path, params_dir, monkeypatch,
                                        capsys):
    import main_eval_interpretability

    _make_cub_tree(tmp_path)
    monkeypatch.setattr(
        sys, "argv",
        ["main_eval_interpretability.py", *PP_ARGS,
         "--data_path", str(tmp_path / "CUB_200_2011"),
         "--resume", params_dir, "--batch_size", "2",
         "--half_size", "6"],
    )
    main_eval_interpretability.main()
    outputs = capsys.readouterr().out
    line = [ln for ln in outputs.splitlines() if ln.startswith("{")]
    assert line, f"no JSON score line in output: {outputs!r}"
    score = json.loads(line[-1])
    assert "consistency_score" in score
    assert 0.0 <= score["consistency_score"] <= 100.0
