"""Mixup / CutMix (timm-semantics, host- or device-side).

The reference wires timm's Mixup but ships with it disabled
(``enable_mixup=False`` default — ref: main.py:41,159-171,
tools/engine_proto.py:45-46). Provided for flag parity; operates on device
arrays inside jit so it costs nothing on the host.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


class MixupCutmix:
    """Batch-mode mixup/cutmix returning soft labels.

    mixup_alpha / cutmix_alpha / prob / switch_prob mirror the reference
    flags (main.py:159-171). Call inside the jitted train step with an rng.
    """

    def __init__(
        self,
        mixup_alpha: float = 0.0,
        cutmix_alpha: float = 1.0,
        prob: float = 1.0,
        switch_prob: float = 0.5,
        label_smoothing: float = 0.0,
        num_classes: int = 200,
    ):
        self.mixup_alpha = mixup_alpha
        self.cutmix_alpha = cutmix_alpha
        self.prob = prob
        self.switch_prob = switch_prob
        self.label_smoothing = label_smoothing
        self.num_classes = num_classes

    def _one_hot(self, labels: jax.Array, lam: jax.Array) -> jax.Array:
        off = self.label_smoothing / self.num_classes
        on = 1.0 - self.label_smoothing + off
        y = jax.nn.one_hot(labels, self.num_classes) * (on - off) + off
        y_flip = jnp.flip(y, axis=0)
        return y * lam + y_flip * (1.0 - lam)

    def _cutmix_box(
        self, rng: jax.Array, h: int, w: int, lam: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        ratio = jnp.sqrt(1.0 - lam)
        cut_h = (h * ratio).astype(jnp.int32)
        cut_w = (w * ratio).astype(jnp.int32)
        r1, r2 = jax.random.split(rng)
        cy = jax.random.randint(r1, (), 0, h)
        cx = jax.random.randint(r2, (), 0, w)
        y0 = jnp.clip(cy - cut_h // 2, 0, h)
        y1 = jnp.clip(cy + cut_h // 2, 0, h)
        x0 = jnp.clip(cx - cut_w // 2, 0, w)
        x1 = jnp.clip(cx + cut_w // 2, 0, w)
        ys = jnp.arange(h)[:, None]
        xs = jnp.arange(w)[None, :]
        mask = ((ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1))
        lam_adj = 1.0 - ((y1 - y0) * (x1 - x0)) / (h * w)
        return mask.astype(jnp.float32), lam_adj.astype(jnp.float32)

    def __call__(
        self, rng: jax.Array, batch: Dict[str, jax.Array]
    ) -> Dict[str, jax.Array]:
        images, labels = batch["image"], batch["label"]
        B, H, W, C = images.shape
        r_apply, r_switch, r_lam, r_box = jax.random.split(rng, 4)

        use_cutmix = (
            jax.random.uniform(r_switch) < self.switch_prob
            if self.mixup_alpha > 0 and self.cutmix_alpha > 0
            else jnp.asarray(self.cutmix_alpha > 0)
        )
        alpha = jnp.where(use_cutmix, self.cutmix_alpha or 1.0,
                          self.mixup_alpha or 1.0)
        lam = jax.random.beta(r_lam, alpha, alpha)
        apply = jax.random.uniform(r_apply) < self.prob
        lam = jnp.where(apply, lam, 1.0)

        flipped = jnp.flip(images, axis=0)
        mix_images = images * lam + flipped * (1.0 - lam)
        mask, lam_cut = self._cutmix_box(r_box, H, W, lam)
        cut_images = jnp.where(mask[None, :, :, None] > 0, flipped, images)
        lam_final = jnp.where(use_cutmix, jnp.where(apply, lam_cut, 1.0), lam)
        out_images = jnp.where(use_cutmix, cut_images, mix_images)
        out_images = jnp.where(apply, out_images, images)

        soft = self._one_hot(labels, lam_final)
        return {**batch, "image": out_images, "label": soft}
