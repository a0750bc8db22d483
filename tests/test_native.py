"""Native C++ image pipeline tests (skipped when the toolchain is absent)."""

import io

import numpy as np
import pytest
from PIL import Image

from protopformer_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native library unavailable"
)


def _jpeg(w=200, h=150, seed=0, quality=95):
    rng = np.random.default_rng(seed)
    img = Image.fromarray(
        rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
    )
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def test_dims_and_decode_match_pil():
    jb = _jpeg()
    assert native.jpeg_dims(jb) == (200, 150)
    dec = native.decode(jb)
    pil = np.asarray(Image.open(io.BytesIO(jb)).convert("RGB"))
    np.testing.assert_array_equal(dec, pil)  # libjpeg == PIL's libjpeg


def test_eval_transform_close_to_pil():
    from protopformer_tpu.data.transforms import build_eval_transform

    # smooth natural-image-like gradient (random noise is a worst case for
    # the DCT-scaled decode and says nothing about real photos)
    ys, xs = np.mgrid[0:300, 0:400]
    img = np.stack([
        (ys * 255 / 300), (xs * 255 / 400), ((ys + xs) * 255 / 700)
    ], -1).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=95)
    jb = buf.getvalue()
    nat = native.eval_transform(jb, 256, 224)
    pil = build_eval_transform(224)(Image.open(io.BytesIO(jb)))
    assert nat.shape == (224, 224, 3)
    assert np.abs(nat - pil).mean() < 0.05  # DCT-scaled decode differs a bit
    assert 0.0 <= nat.min() and nat.max() <= 1.0


def test_train_crop_resize_flip():
    jb = _jpeg(100, 80)
    a = native.train_crop_resize(jb, 10, 5, 60, 60, 32, False)
    b = native.train_crop_resize(jb, 10, 5, 60, 60, 32, True)
    assert a.shape == (32, 32, 3)
    np.testing.assert_allclose(a, b[:, ::-1], atol=1e-6)
    with pytest.raises(ValueError):
        native.train_crop_resize(jb, 90, 5, 60, 60, 32, False)  # OOB crop


def _smooth_jpeg_file(path, w=300, h=240):
    ys, xs = np.mgrid[0:h, 0:w]
    img = np.stack([
        (ys * 255 / h), (xs * 255 / w), ((ys + xs) * 255 / (h + w))
    ], -1).astype(np.uint8)
    Image.fromarray(img).save(path, "JPEG", quality=95)


def test_host_loader_native_path(tmp_path):
    """The HostDataLoader integration: path_transform (native decode) must
    produce batches matching the PIL pipeline within decoder tolerance, and
    per-sample fall back to PIL on undecodable (non-JPEG) files."""
    from protopformer_tpu.data.datasets import DatasetIndex
    from protopformer_tpu.data.loader import HostDataLoader
    from protopformer_tpu.data.transforms import build_eval_transform

    paths = []
    for i in range(6):
        p = str(tmp_path / f"img{i}.jpg")
        _smooth_jpeg_file(p, 300 + 10 * i, 240)
        paths.append(p)
    index = DatasetIndex(paths=paths,
                         labels=np.arange(6, dtype=np.int32) % 3,
                         num_classes=3)

    kw = dict(batch_size=6, shuffle=False, num_workers=2)
    pil_loader = HostDataLoader(index, build_eval_transform(64), **kw)
    nat_loader = HostDataLoader(
        index, build_eval_transform(64), path_transform=native
        .build_native_eval_transform(64), **kw,
    )
    (pil_batch,) = list(pil_loader)
    (nat_batch,) = list(nat_loader)
    np.testing.assert_array_equal(pil_batch["label"], nat_batch["label"])
    assert np.abs(pil_batch["image"] - nat_batch["image"]).mean() < 0.05

    # a PNG masquerading among the samples: native decode fails, PIL
    # fallback keeps the batch correct
    png = str(tmp_path / "img0.png")
    Image.open(paths[0]).save(png, "PNG")
    index2 = DatasetIndex(paths=[png] + paths[1:],
                          labels=index.labels, num_classes=3)
    nat2 = HostDataLoader(
        index2, build_eval_transform(64), path_transform=native
        .build_native_eval_transform(64), **kw,
    )
    with pytest.warns(UserWarning, match="falling back to PIL"):
        (batch2,) = list(nat2)
    assert np.abs(batch2["image"] - pil_batch["image"]).mean() < 0.05


def test_native_square_transform_matches_pil(tmp_path):
    from protopformer_tpu.data.transforms import build_square_transform

    p = str(tmp_path / "sq.jpg")
    _smooth_jpeg_file(p, 320, 200)
    nat = native.build_native_square_transform(112)(p)
    pil = build_square_transform(112)(Image.open(p))
    assert nat.shape == (112, 112, 3)
    assert np.abs(nat - pil).mean() < 0.05


def test_native_train_transform_geometry_matches_pil(tmp_path):
    """With the stochastic color ops disabled, the native train path must
    sample the SAME crop box + flip as the PIL pipeline (identical rng draw
    order) and produce a close image (bicubic implementations differ)."""
    from protopformer_tpu.data.transforms import build_train_transform

    p = str(tmp_path / "tr.jpg")
    _smooth_jpeg_file(p, 320, 260)
    nat_tf = native.build_native_train_transform(
        96, color_jitter=0.0, aa=None, reprob=0.0
    )
    pil_tf = build_train_transform(96, color_jitter=0.0, aa=None, reprob=0.0)
    for seed in range(4):
        nat = nat_tf(p, np.random.default_rng(seed))
        pil = pil_tf(Image.open(p), np.random.default_rng(seed))
        assert nat.shape == (96, 96, 3)
        assert np.abs(nat - pil).mean() < 0.06, f"seed {seed}"


def test_native_train_transform_full_pipeline(tmp_path):
    """Full augmentation stack (RandAug + jitter + erasing) through the
    native decoder: deterministic per-rng, valid range, actually augmented."""
    p = str(tmp_path / "tr2.jpg")
    _smooth_jpeg_file(p, 300, 240)
    tf = native.build_native_train_transform(64)
    a = tf(p, np.random.default_rng(7))
    b = tf(p, np.random.default_rng(7))
    c = tf(p, np.random.default_rng(8))
    np.testing.assert_array_equal(a, b)  # deterministic in the rng
    assert a.shape == (64, 64, 3)
    assert np.abs(a - c).mean() > 1e-4  # different stream -> different aug
    assert np.isfinite(a).all()
