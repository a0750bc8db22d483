"""Host-side image transforms (PIL + numpy).

Replaces the reference's timm ``create_transform`` pipeline
(ref: main.py:133-156, tools/datasets.py:280-335):

  train: RandomResizedCrop(224, bicubic) + HFlip + RandAugment
         'rand-m9-mstd0.5-inc1' + color-jitter 0.4 + RandomErasing(0.25,
         'pixel') — the timm recipe the reference trains with.
  eval:  resize to 256/224 * size (bicubic) + center-crop + [0,1] floats.
  view:  eval geometry WITHOUT normalization (uint8), for overlays
         (ref: build_dataset_view / build_dataset_noaug,
         tools/datasets.py:77-164).

Normalization itself happens ON DEVICE (data/preprocess.py) so host output
is plain float32 RGB in [0,1] (or uint8 for views).

RandAugment here follows the timm policy semantics (2 ops per image,
magnitude 9 of 31 with sigma-0.5 gaussian jitter, 'inc1' increasing-severity
transforms) without bit-level claims — augmentation randomness is not a
parity surface.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

_MAX_LEVEL = 31.0
_FILL = (124, 116, 104)


def _rrc_params(w, h, scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3), rng=None):
    area = w * h
    for _ in range(10):
        target = rng.uniform(*scale) * area
        log_r = rng.uniform(np.log(ratio[0]), np.log(ratio[1]))
        ar = np.exp(log_r)
        cw = int(round(np.sqrt(target * ar)))
        ch = int(round(np.sqrt(target / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            x = rng.integers(0, w - cw + 1)
            y = rng.integers(0, h - ch + 1)
            return x, y, cw, ch
    # fallback: center crop
    s = min(w, h)
    return (w - s) // 2, (h - s) // 2, s, s


# --- RandAugment ops (timm 'inc1' increasing-severity variants) -----------

def _shear_x(img, level):
    return img.transform(img.size, Image.AFFINE, (1, level, 0, 0, 1, 0),
                         Image.BICUBIC, fillcolor=_FILL)


def _shear_y(img, level):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, level, 1, 0),
                         Image.BICUBIC, fillcolor=_FILL)


def _translate_x(img, level):
    pixels = level * img.size[0]
    return img.transform(img.size, Image.AFFINE, (1, 0, pixels, 0, 1, 0),
                         Image.BICUBIC, fillcolor=_FILL)


def _translate_y(img, level):
    pixels = level * img.size[1]
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, pixels),
                         Image.BICUBIC, fillcolor=_FILL)


def _enhance(factory):
    def op(img, level):
        return factory(img).enhance(1.0 + level)

    return op


def _posterize(img, bits):
    return ImageOps.posterize(img, max(1, int(bits)))


def _solarize(img, thresh):
    return ImageOps.solarize(img, int(thresh))


def _solarize_add(img, add, thresh=128):
    arr = np.asarray(img).astype(np.int32)
    arr = np.where(arr < thresh, np.clip(arr + int(add), 0, 255), arr)
    return Image.fromarray(arr.astype(np.uint8))


def _rotate(img, degrees):
    return img.rotate(degrees, Image.BICUBIC, fillcolor=_FILL)


# (name, apply(img, magnitude_fraction in [-1,1]))
def _randaug_ops():
    def signed(scale):
        return lambda m: m * scale

    return [
        ("AutoContrast", lambda im, m: ImageOps.autocontrast(im)),
        ("Equalize", lambda im, m: ImageOps.equalize(im)),
        ("Invert", lambda im, m: ImageOps.invert(im)),
        ("Rotate", lambda im, m: _rotate(im, m * 30.0)),
        # 'inc1': PosterizeIncreasing — more magnitude = fewer bits
        ("Posterize", lambda im, m: _posterize(im, 4 - abs(m) * 4 * 0.999 + 0.5)),
        # SolarizeIncreasing: more magnitude = lower threshold
        ("Solarize", lambda im, m: _solarize(im, 256 - abs(m) * 256)),
        ("SolarizeAdd", lambda im, m: _solarize_add(im, abs(m) * 110)),
        ("Color", lambda im, m: _enhance(ImageEnhance.Color)(im, m * 0.9)),
        ("Contrast", lambda im, m: _enhance(ImageEnhance.Contrast)(im, m * 0.9)),
        ("Brightness", lambda im, m: _enhance(ImageEnhance.Brightness)(im, m * 0.9)),
        ("Sharpness", lambda im, m: _enhance(ImageEnhance.Sharpness)(im, m * 0.9)),
        ("ShearX", lambda im, m: _shear_x(im, m * 0.3)),
        ("ShearY", lambda im, m: _shear_y(im, m * 0.3)),
        ("TranslateX", lambda im, m: _translate_x(im, m * 0.45)),
        ("TranslateY", lambda im, m: _translate_y(im, m * 0.45)),
    ]


class RandAugment:
    """timm-style RandAugment: ``num_ops`` random ops at gaussian-jittered
    magnitude, each applied with prob 0.5."""

    def __init__(self, num_ops=2, magnitude=9, magnitude_std=0.5):
        self.num_ops = num_ops
        self.magnitude = magnitude
        self.magnitude_std = magnitude_std
        self.ops = _randaug_ops()

    def __call__(self, img: Image.Image, rng: np.random.Generator):
        for _ in range(self.num_ops):
            if rng.uniform() > 0.5:
                continue
            name, op = self.ops[rng.integers(len(self.ops))]
            mag = rng.normal(self.magnitude, self.magnitude_std)
            mag = float(np.clip(mag, 0, _MAX_LEVEL)) / _MAX_LEVEL
            if rng.uniform() < 0.5:
                mag = -mag
            img = op(img, mag)
        return img


class RandomErasing:
    """timm RandomErasing, 'pixel' mode: replace a random rectangle of the
    float image with per-pixel gaussian noise (applied post-scaling)."""

    def __init__(self, prob=0.25, scale=(0.02, 1 / 3), ratio=(0.3, 3.3)):
        self.prob = prob
        self.scale = scale
        self.ratio = ratio

    def __call__(self, arr: np.ndarray, rng: np.random.Generator):
        if rng.uniform() > self.prob:
            return arr
        h, w = arr.shape[:2]
        area = h * w
        for _ in range(10):
            target = rng.uniform(*self.scale) * area
            log_r = rng.uniform(np.log(self.ratio[0]), np.log(self.ratio[1]))
            ar = np.exp(log_r)
            eh = int(round(np.sqrt(target / ar)))
            ew = int(round(np.sqrt(target * ar)))
            if eh < h and ew < w:
                y = rng.integers(0, h - eh + 1)
                x = rng.integers(0, w - ew + 1)
                arr[y:y + eh, x:x + ew] = rng.normal(
                    0.5, 0.25, size=(eh, ew, arr.shape[2])
                ).astype(arr.dtype)
                break
        return arr


def build_train_transform(
    input_size: int = 224,
    color_jitter: float = 0.4,
    aa: Optional[str] = "rand-m9-mstd0.5-inc1",
    reprob: float = 0.25,
    interpolation=Image.BICUBIC,
) -> Callable:
    """(PIL or uint8 array, np rng) -> float32 (H, W, 3) in [0,1]."""
    randaug = None
    if aa and aa.startswith("rand"):
        # parse 'rand-m9-mstd0.5-inc1'
        mag, mstd = 9, 0.5
        for tok in aa.split("-")[1:]:
            if tok.startswith("mstd"):
                mstd = float(tok[4:])
            elif tok.startswith("m"):
                mag = int(tok[1:])
        randaug = RandAugment(num_ops=2, magnitude=mag, magnitude_std=mstd)
    erasing = RandomErasing(prob=reprob) if reprob > 0 else None

    def transform(img, rng: np.random.Generator) -> np.ndarray:
        if isinstance(img, np.ndarray):
            img = Image.fromarray(img)
        img = img.convert("RGB")
        x, y, cw, ch = _rrc_params(*img.size, rng=rng)
        img = img.resize(
            (input_size, input_size), interpolation,
            box=(x, y, x + cw, y + ch),
        )
        if rng.uniform() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if randaug is not None:
            img = randaug(img, rng)
        if color_jitter:
            for enh in (ImageEnhance.Brightness, ImageEnhance.Contrast,
                        ImageEnhance.Color):
                f = 1.0 + rng.uniform(-color_jitter, color_jitter)
                img = enh(img).enhance(f)
        arr = np.asarray(img, np.float32) / 255.0
        if erasing is not None:
            arr = erasing(arr, rng)
        return arr

    return transform


def build_eval_transform(
    input_size: int = 224, crop_pct: Optional[float] = None,
    interpolation=Image.BICUBIC,
) -> Callable:
    """Resize shorter side to size/crop_pct + center crop
    (ref: tools/datasets.py:322-335 — resize int(256/224*size))."""
    if crop_pct is None:
        crop_pct = 224 / 256 if input_size <= 224 else 1.0
    resize_to = int(round(input_size / crop_pct))

    def transform(img, rng=None) -> np.ndarray:
        if isinstance(img, np.ndarray):
            img = Image.fromarray(img)
        img = img.convert("RGB")
        w, h = img.size
        if w <= h:
            nw, nh = resize_to, int(round(h * resize_to / w))
        else:
            nw, nh = int(round(w * resize_to / h)), resize_to
        img = img.resize((nw, nh), interpolation)
        left = (nw - input_size) // 2
        top = (nh - input_size) // 2
        img = img.crop((left, top, left + input_size, top + input_size))
        return np.asarray(img, np.float32) / 255.0

    return transform


def build_square_transform(
    input_size: int = 224, interpolation=Image.BILINEAR
) -> Callable:
    """Plain square resize, NO crop — the interpretability-eval protocol's
    transform (ref: eval_interpretability.py:173-176
    ``transforms.Resize((img_size, img_size))``; torchvision Resize defaults
    to bilinear). Output: float32 (H, W, 3) in [0,1]."""

    def transform(img, rng=None) -> np.ndarray:
        if isinstance(img, np.ndarray):
            img = Image.fromarray(img)
        img = img.convert("RGB")
        img = img.resize((input_size, input_size), interpolation)
        return np.asarray(img, np.float32) / 255.0

    return transform


def build_view_transform(input_size: int = 224) -> Callable:
    """Unnormalized uint8 view images for overlays (ref: build_dataset_view,
    tools/datasets.py:77-119)."""
    eval_t = build_eval_transform(input_size)

    def transform(img, rng=None) -> np.ndarray:
        return (eval_t(img) * 255.0).astype(np.uint8)

    return transform
