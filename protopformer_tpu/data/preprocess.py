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


def fold_normalization_into_patch_embed(
    params, mean=IMAGENET_MEAN, std=IMAGENET_STD, input_scale: float = 1.0
):
    """Fold the per-channel input normalization into the patch-embed conv.

    The patch embedding is linear in the image, so for kernel W (p, p, 3, D)
    and bias b:

        conv((a*x - m) / s; W) + b  ==  conv(x; W a/s) + (b - sum_hwc W m/s)

    — the normalize pass (a full fp32 read+write of the batch) disappears
    from the serving program and the model consumes RAW pixels directly.
    With ``input_scale=1/255`` the serving input can be uint8 RGB (4x less
    input traffic than fp32 [0,1]). Exact in fp32; in bf16 compute the
    folded kernel rounds once where the unfolded path rounded the
    normalized image once (equivalent-magnitude quantization, covered by
    the speed-mode selection contract test).

    Args:
      params: the model's ``params`` pytree (any PPNet/BaseNet/backbone tree
        containing a ``patch_embed/proj`` Conv with fp32 kernel+bias).
      mean / std: per-channel constants (ImageNet by default).
      input_scale: multiplier mapping the raw input to [0,1] (1.0 for float
        [0,1] inputs, 1/255 for uint8).

    Returns:
      A new params pytree with the folded kernel/bias. The original tree is
      untouched.
    """
    from collections.abc import Mapping

    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    def fold(tree):
        if not isinstance(tree, Mapping):
            return tree
        out = {}
        for k, v in tree.items():
            if (
                k == "patch_embed" and isinstance(v, Mapping)
                and "proj" in v and "bias" in v["proj"]
            ):
                proj = dict(v["proj"])
                kernel = jnp.asarray(proj["kernel"], jnp.float32)
                shift = jnp.einsum(
                    "hwcd,c->d", kernel, mean / std,
                    precision=jax.lax.Precision.HIGHEST,
                )
                proj["kernel"] = (
                    kernel * (input_scale / std)[None, None, :, None]
                )
                proj["bias"] = jnp.asarray(proj["bias"], jnp.float32) - shift
                out[k] = {**v, "proj": proj}
            else:
                out[k] = fold(v)
        return out

    return fold(params)
