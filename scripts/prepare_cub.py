"""Prepare CUB-200-2011 for ProtoPFormer training: bbox crop + offline aug.

The reference trains its CUB preset on the ProtoPNet-style pre-cropped
tree (``cub200_cropped/train_cropped_augmented`` + ``test_cropped`` —
ref: tools/datasets.py:186-200 'CUB2011U'), which the reference repo does
not generate itself; it inherits ProtoPNet's preprocessing:

  1. crop every image to its ``bounding_boxes.txt`` box,
  2. split into train/test per ``train_test_split.txt``,
  3. offline-augment the train split 30x (10 random rotations <=15deg,
     10 random skews of magnitude 0.2, 10 random shears <=10deg, each with
     a 50% horizontal flip — ProtoPNet img_aug.py's Augmentor pipeline,
     re-created here with PIL affine/perspective transforms).

The consistency-score eval (reference README.md:111-126) runs on the RAW
``CUB_200_2011`` tree instead (part annotations live there) — keep both.

Usage:
  python scripts/prepare_cub.py --cub_root datasets/CUB_200_2011 \
      --out datasets/cub200_cropped [--augment] [--seed 1028]
"""

from __future__ import annotations

import argparse
import os
import random

from PIL import Image


def _read_table(path):
    with open(path) as f:
        return [line.split() for line in f if line.strip()]


def crop_split(cub_root: str, out_root: str):
    """Stage the bbox-cropped train/test ImageFolder trees."""
    images = {int(r[0]): r[1] for r in _read_table(
        os.path.join(cub_root, "images.txt"))}
    boxes = {int(r[0]): tuple(float(v) for v in r[1:5]) for r in _read_table(
        os.path.join(cub_root, "bounding_boxes.txt"))}
    split = {int(r[0]): int(r[1]) for r in _read_table(
        os.path.join(cub_root, "train_test_split.txt"))}

    n = {"train": 0, "test": 0}
    for img_id, rel in sorted(images.items()):
        part = "train_cropped" if split[img_id] == 1 else "test_cropped"
        cls = os.path.dirname(rel)
        dst_dir = os.path.join(out_root, part, cls)
        os.makedirs(dst_dir, exist_ok=True)
        dst = os.path.join(dst_dir, os.path.basename(rel))
        if os.path.exists(dst):
            continue
        x, y, w, h = boxes[img_id]
        with Image.open(os.path.join(cub_root, "images", rel)) as im:
            im.convert("RGB").crop(
                (int(x), int(y), int(x + w), int(y + h))
            ).save(dst, "JPEG", quality=95)
        n["train" if part == "train_cropped" else "test"] += 1
    return n


def _rand_flip(im: Image.Image, rng: random.Random) -> Image.Image:
    return im.transpose(Image.FLIP_LEFT_RIGHT) if rng.random() < 0.5 else im


def _skew(im: Image.Image, magnitude: float, rng: random.Random):
    """Random corner skew of the given magnitude (Augmentor's skew op:
    displace one randomly-chosen corner by magnitude*min(w,h))."""
    w, h = im.size
    d = magnitude * min(w, h)
    src = [(0, 0), (w, 0), (w, h), (0, h)]
    dst = [list(p) for p in src]
    corner = rng.randrange(4)
    dst[corner][0] += rng.uniform(-d, d)
    dst[corner][1] += rng.uniform(-d, d)
    coeffs = _perspective_coeffs(src, dst)
    return im.transform((w, h), Image.PERSPECTIVE, coeffs, Image.BICUBIC)


def _perspective_coeffs(src, dst):
    import numpy as np

    a = []
    for (sx, sy), (dx, dy) in zip(src, dst):
        a.append([dx, dy, 1, 0, 0, 0, -sx * dx, -sx * dy])
        a.append([0, 0, 0, dx, dy, 1, -sy * dx, -sy * dy])
    a = np.asarray(a, float)
    b = np.asarray([c for p in src for c in p], float)
    return np.linalg.solve(a, b).tolist()


def augment_train(out_root: str, seed: int = 1028, per_op: int = 10):
    """ProtoPNet-style 30x offline augmentation of the cropped train split
    into ``train_cropped_augmented/`` (originals included)."""
    src_root = os.path.join(out_root, "train_cropped")
    dst_root = os.path.join(out_root, "train_cropped_augmented")
    rng = random.Random(seed)
    n = 0
    for cls in sorted(os.listdir(src_root)):
        sdir, ddir = os.path.join(src_root, cls), os.path.join(dst_root, cls)
        os.makedirs(ddir, exist_ok=True)
        for fname in sorted(os.listdir(sdir)):
            stem, _ = os.path.splitext(fname)
            with Image.open(os.path.join(sdir, fname)) as im:
                im = im.convert("RGB")
                im.save(os.path.join(ddir, fname), "JPEG", quality=95)
                for i in range(per_op):
                    _rand_flip(
                        im.rotate(rng.uniform(-15, 15), Image.BICUBIC), rng
                    ).save(os.path.join(ddir, f"{stem}_rot{i}.jpg"),
                           "JPEG", quality=95)
                for i in range(per_op):
                    _rand_flip(_skew(im, 0.2, rng), rng).save(
                        os.path.join(ddir, f"{stem}_skew{i}.jpg"),
                        "JPEG", quality=95)
                for i in range(per_op):
                    shear = rng.uniform(-10, 10)
                    import math

                    t = math.tan(math.radians(shear))
                    _rand_flip(
                        im.transform(
                            im.size, Image.AFFINE,
                            (1, t, -t * im.size[1] / 2, 0, 1, 0),
                            Image.BICUBIC,
                        ), rng
                    ).save(os.path.join(ddir, f"{stem}_shear{i}.jpg"),
                           "JPEG", quality=95)
            n += 1 + 3 * per_op
    return n


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cub_root", required=True,
                    help="raw CUB_200_2011 tree (images.txt etc.)")
    ap.add_argument("--out", required=True,
                    help="output root, e.g. datasets/cub200_cropped")
    ap.add_argument("--augment", action="store_true",
                    help="also build train_cropped_augmented (30x)")
    ap.add_argument("--seed", type=int, default=1028)
    ap.add_argument("--per_op", type=int, default=10,
                    help="augmented variants per op class (default 10)")
    args = ap.parse_args()

    n = crop_split(args.cub_root, args.out)
    print(f"cropped: {n}")
    if args.augment:
        total = augment_train(args.out, seed=args.seed, per_op=args.per_op)
        print(f"augmented train images: {total}")


if __name__ == "__main__":
    main()
