"""Normalization constants and on-device (un)normalization.

Mirrors tools/preprocess.py:3-33: ImageNet mean/std, preprocess/
undo_preprocess. On TPU, normalization runs on-device as part of the jitted
step (images travel to the device as uint8/float RGB and are normalized
there, keeping the host pipeline at line rate)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def normalize_images(x: jax.Array) -> jax.Array:
    """(..., H, W, 3) float RGB in [0,1] -> normalized (NHWC)."""
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


def unnormalize_images(x: jax.Array) -> jax.Array:
    """Inverse of normalize_images (ref: undo_preprocess)."""
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return x * std + mean
