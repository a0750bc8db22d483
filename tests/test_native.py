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
