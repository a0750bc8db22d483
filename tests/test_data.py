"""Data layer tests: transforms, loader determinism/padding, mixup, parsers."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from protopformer_tpu.data import (
    HostDataLoader,
    MixupCutmix,
    build_dataset_index,
    build_eval_transform,
    build_train_transform,
    build_view_transform,
    normalize_images,
    unnormalize_images,
)
from protopformer_tpu.data.datasets import build_cub_index
from protopformer_tpu.data.local_parts import in_bbox, load_cub_parts


def test_eval_transform_geometry():
    t = build_eval_transform(224)
    img = Image.new("RGB", (500, 400), (255, 0, 0))
    out = t(img)
    assert out.shape == (224, 224, 3)
    assert out.dtype == np.float32
    assert 0.99 <= out[..., 0].max() <= 1.0 and out[..., 1].max() == 0.0


def test_train_transform_shapes_and_determinism():
    t = build_train_transform(64)
    rng_img = np.random.default_rng(0)
    img = rng_img.integers(0, 255, size=(100, 80, 3)).astype(np.uint8)
    a = t(img, np.random.default_rng(42))
    b = t(img, np.random.default_rng(42))
    c = t(img, np.random.default_rng(43))
    assert a.shape == (64, 64, 3)
    np.testing.assert_array_equal(a, b)  # same seed -> same augmentation
    assert not np.array_equal(a, c)


def test_view_transform_uint8():
    t = build_view_transform(32)
    img = Image.new("RGB", (64, 48), (10, 200, 30))
    out = t(img)
    assert out.dtype == np.uint8 and out.shape == (32, 32, 3)


def test_normalize_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 4, 4, 3)),
                    jnp.float32)
    y = unnormalize_images(normalize_images(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_loader_padding_and_epochs():
    index = build_dataset_index("synthetic", "", train=True,
                                num_samples=10, num_classes=3, image_size=16)
    t = lambda img, rng: np.asarray(img, np.float32) / 255.0  # noqa: E731
    loader = HostDataLoader(index, t, batch_size=4, shuffle=True, seed=7,
                            num_workers=2)
    assert len(loader) == 3
    batches = list(loader)
    assert len(batches) == 3
    assert batches[-1]["valid"].sum() == 2  # 10 = 4+4+2
    assert batches[0]["image"].shape == (4, 16, 16, 3)
    # epoch changes order; same epoch reproduces it
    order0 = np.concatenate([b["label"] for b in batches])
    loader.set_epoch(1)
    order1 = np.concatenate([b["label"] for b in list(loader)])
    loader.set_epoch(0)
    order0b = np.concatenate([b["label"] for b in list(loader)])
    np.testing.assert_array_equal(order0, order0b)
    assert not np.array_equal(order0, order1)


def test_mixup_soft_labels():
    mix = MixupCutmix(mixup_alpha=0.8, cutmix_alpha=1.0, num_classes=5)
    batch = {
        "image": jnp.asarray(
            np.random.default_rng(0).uniform(size=(4, 16, 16, 3)), jnp.float32
        ),
        "label": jnp.asarray([0, 1, 2, 3]),
    }
    out = mix(jax.random.key(0), batch)
    assert out["label"].shape == (4, 5)
    np.testing.assert_allclose(np.asarray(out["label"]).sum(-1), 1.0,
                               atol=1e-5)
    assert out["image"].shape == batch["image"].shape


def test_imagefolder_index_and_loader(tmp_path):
    """ImageFolder tree -> index -> loader with real JPEG decode."""
    from protopformer_tpu.data.datasets import build_imagefolder_index

    rng = np.random.default_rng(0)
    for cls in ("alpha", "beta"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            Image.fromarray(
                rng.integers(0, 255, size=(40, 50, 3)).astype(np.uint8)
            ).save(d / f"img{i}.jpg")
    index = build_imagefolder_index(str(tmp_path))
    assert len(index) == 6 and index.num_classes == 2
    assert index.labels.tolist() == [0, 0, 0, 1, 1, 1]

    t = build_eval_transform(32)
    loader = HostDataLoader(index, t, batch_size=4, shuffle=False,
                            num_workers=2)
    batches = list(loader)
    assert batches[0]["image"].shape == (4, 32, 32, 3)
    assert batches[0]["image"].dtype == np.float32
    assert batches[1]["valid"].sum() == 2


def test_cifar_and_mnist_parsers(tmp_path):
    import pickle
    import struct

    # fake cifar-10 tree
    base = tmp_path / "cifar-10-batches-py"
    base.mkdir()
    rng = np.random.default_rng(0)
    for i in range(1, 6):
        data = {
            b"data": rng.integers(0, 255, size=(4, 3072)).astype(np.uint8),
            b"labels": [0, 1, 2, 3],
        }
        with open(base / f"data_batch_{i}", "wb") as f:
            pickle.dump(data, f)
    from protopformer_tpu.data.datasets import (
        build_cifar_index,
        build_mnist_index,
    )

    idx = build_cifar_index(str(tmp_path), train=True)
    assert len(idx) == 20 and idx.num_classes == 10
    assert idx.images.shape == (20, 32, 32, 3)

    # fake mnist idx files
    n, h, w = 6, 28, 28
    with open(tmp_path / "train-images-idx3-ubyte", "wb") as f:
        f.write(struct.pack(">IIII", 2051, n, h, w))
        f.write(rng.integers(0, 255, size=(n * h * w,)).astype(np.uint8).tobytes())
    with open(tmp_path / "train-labels-idx1-ubyte", "wb") as f:
        f.write(struct.pack(">II", 2049, n))
        f.write(np.arange(n, dtype=np.uint8).tobytes())
    midx = build_mnist_index(str(tmp_path), train=True)
    assert len(midx) == 6 and midx.images.shape == (6, 28, 28, 3)
    assert midx.labels.tolist() == [0, 1, 2, 3, 4, 5]


def test_cub_index_and_parts(tmp_path):
    # synthesize a minimal CUB metadata tree
    base = tmp_path / "CUB_200_2011"
    (base / "images" / "001.Black_footed_Albatross").mkdir(parents=True)
    (base / "parts").mkdir()
    img = Image.new("RGB", (60, 40))
    names = []
    for i in range(1, 5):
        name = f"001.Black_footed_Albatross/img_{i}.jpg"
        img.save(base / "images" / name)
        names.append(name)
    (base / "images.txt").write_text(
        "".join(f"{i} {n}\n" for i, n in enumerate(names, 1))
    )
    (base / "image_class_labels.txt").write_text(
        "".join(f"{i} 1\n" for i in range(1, 5))
    )
    (base / "train_test_split.txt").write_text(
        "1 1\n2 1\n3 0\n4 0\n"
    )
    (base / "bounding_boxes.txt").write_text(
        "".join(f"{i} 5 5 50 30\n" for i in range(1, 5))
    )
    (base / "parts" / "part_locs.txt").write_text(
        "".join(
            f"{i} {p} {10 + p} {10} {1 if p < 3 else 0}\n"
            for i in range(1, 5) for p in range(1, 16)
        )
    )
    train = build_cub_index(str(tmp_path), train=True)
    test = build_cub_index(str(tmp_path), train=False)
    assert len(train) == 2 and len(test) == 2
    assert train.labels.tolist() == [0, 0]
    assert os.path.isfile(train.paths[0])

    parts = load_cub_parts(str(base))
    assert len(parts.id_to_part_loc[1]) == 2  # only visible parts
    assert in_bbox(10, 10, parts.id_to_bbox[1])
    assert not in_bbox(0, 0, parts.id_to_bbox[1])


def test_stanford_cars_index(tmp_path):
    from scipy.io import savemat

    from protopformer_tpu.data.datasets import build_stanford_cars_index

    (tmp_path / "devkit").mkdir()
    (tmp_path / "cars_train").mkdir()

    def anno(fname, cls):
        return (
            np.array([[1]]), np.array([[2]]), np.array([[30]]),
            np.array([[40]]), np.array([[cls]]), np.array([fname]),
        )

    dt = [("bbox_x1", "O"), ("bbox_y1", "O"), ("bbox_x2", "O"),
          ("bbox_y2", "O"), ("class", "O"), ("fname", "O")]
    annos = np.array([anno("car_a.jpg", 3), anno("car_b.jpg", 196)], dtype=dt)
    savemat(str(tmp_path / "devkit" / "cars_train_annos.mat"),
            {"annotations": annos.reshape(1, -1)})
    idx = build_stanford_cars_index(str(tmp_path), train=True)
    assert len(idx) == 2 and idx.num_classes == 196
    assert idx.labels.tolist() == [2, 195]
    assert idx.paths[0].endswith("cars_train/car_a.jpg")


def test_stanford_dogs_index(tmp_path):
    from scipy.io import savemat

    from protopformer_tpu.data.datasets import build_stanford_dogs_index

    files = np.empty((2, 1), dtype=object)
    files[0, 0] = np.array(["n02085620-Chihuahua/img1.jpg"])
    files[1, 0] = np.array(["n02085936-Maltese_dog/img2.jpg"])
    savemat(str(tmp_path / "train_list.mat"),
            {"file_list": files, "labels": np.array([[1], [120]])})
    idx = build_stanford_dogs_index(str(tmp_path), train=True)
    assert len(idx) == 2 and idx.num_classes == 120
    assert idx.labels.tolist() == [0, 119]
    assert idx.paths[1].endswith("Images/n02085936-Maltese_dog/img2.jpg")


def test_aircraft_index(tmp_path):
    from protopformer_tpu.data.datasets import build_aircraft_index

    (tmp_path / "variants.txt").write_text("707-320\nA310\n")
    (tmp_path / "images_variant_trainval.txt").write_text(
        "0034309 707-320\n0034958 A310\n"
    )
    idx = build_aircraft_index(str(tmp_path), train=True)
    assert len(idx) == 2 and idx.num_classes == 2
    assert idx.labels.tolist() == [0, 1]
    assert idx.paths[0].endswith("images/0034309.jpg")


def test_inat_index(tmp_path):
    import json as _json

    from protopformer_tpu.data.datasets import build_inat_index

    (tmp_path / "train2019.json").write_text(_json.dumps({
        "images": [{"id": 1, "file_name": "a.jpg"},
                   {"id": 2, "file_name": "b.jpg"}],
        "annotations": [{"image_id": 1, "category_id": 10},
                        {"image_id": 2, "category_id": 20}],
    }))
    (tmp_path / "categories2019.json").write_text(_json.dumps([
        {"id": 10, "name": "sp_a"}, {"id": 20, "name": "sp_b"},
    ]))
    idx = build_inat_index(str(tmp_path), train=True, year=2019)
    assert len(idx) == 2 and idx.num_classes == 2
    assert sorted(idx.labels.tolist()) == [0, 1]


def test_cub_cropped_index(tmp_path):
    from protopformer_tpu.data.datasets import build_cub_cropped_index

    for sub, n in (("train_cropped_augmented", 3), ("test_cropped", 2)):
        for cname in ("001.A", "002.B"):
            d = tmp_path / sub / cname
            d.mkdir(parents=True)
            for i in range(n):
                Image.new("RGB", (8, 8)).save(d / f"{i}.jpg")
    train = build_cub_cropped_index(str(tmp_path), train=True)
    test = build_cub_cropped_index(str(tmp_path), train=False)
    assert len(train) == 6 and len(test) == 4
    assert train.num_classes == 2


def test_stanford_dogs_cropped_index(tmp_path):
    """cropped=True: one sample PER annotated bndbox (reference flattens
    multi-dog images into per-box samples, tools/datasets.py:695-701) and
    the loader crops the box before the transform (:844-845)."""
    from PIL import Image
    from scipy.io import savemat

    from protopformer_tpu.data.datasets import build_stanford_dogs_index
    from protopformer_tpu.data.loader import HostDataLoader

    breed = "n02085620-Chihuahua"
    (tmp_path / "Images" / breed).mkdir(parents=True)
    (tmp_path / "Annotation" / breed).mkdir(parents=True)
    # image with distinct quadrants so the crop is pixel-checkable
    arr = np.zeros((40, 40, 3), np.uint8)
    arr[:20, :20] = 255  # top-left white
    arr[20:, 20:] = 128
    Image.fromarray(arr).save(tmp_path / "Images" / breed / "img1.jpg",
                              quality=100, subsampling=0)

    def obj(x0, y0, x1, y1):
        return (f"<object><bndbox><xmin>{x0}</xmin><ymin>{y0}</ymin>"
                f"<xmax>{x1}</xmax><ymax>{y1}</ymax></bndbox></object>")

    (tmp_path / "Annotation" / breed / "img1").write_text(
        f"<annotation>{obj(0, 0, 20, 20)}{obj(20, 20, 40, 40)}</annotation>"
    )
    files = np.empty((1, 1), dtype=object)
    files[0, 0] = np.array([f"{breed}/img1.jpg"])
    savemat(str(tmp_path / "train_list.mat"),
            {"file_list": files, "labels": np.array([[1]])})

    idx = build_stanford_dogs_index(str(tmp_path), train=True, cropped=True)
    assert len(idx) == 2  # two boxes -> two samples of the same image
    assert idx.labels.tolist() == [0, 0]
    assert idx.crop_boxes.tolist() == [[0, 0, 20, 20], [20, 20, 40, 40]]

    loader = HostDataLoader(
        idx, lambda im, rng: np.asarray(im, np.float32) / 255.0,
        batch_size=2, shuffle=False, num_workers=1,
    )
    batch = next(iter(loader))
    assert batch["image"].shape == (2, 20, 20, 3)
    # sample 0 = white top-left crop; sample 1 = gray bottom-right crop
    assert batch["image"][0].mean() > 0.9
    assert abs(batch["image"][1].mean() - 128 / 255) < 0.05
