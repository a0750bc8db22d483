"""Epoch-granular LR schedules (timm-faithful).

The reference steps a timm ``CosineLRScheduler`` once per EPOCH
(ref: tools/create_scheduler.py:4-37, main.py:434), so the LR is a staircase:
constant within an epoch. Each parameter group scales the same schedule shape
from its own base LR (timm keeps per-group base_values).

Semantics (timm CosineLRScheduler with warmup_prefix=False, cycles=1):
  warmup (t < warmup_epochs):
      lr = warmup_lr + t * (base - warmup_lr) / warmup_epochs
  cosine (warmup_epochs <= t < epochs):
      lr = min_lr + 0.5 * (base - min_lr) * (1 + cos(pi * t / epochs))
  beyond epochs (cooldown): lr = min_lr.

'step' mirrors timm StepLRScheduler: base * decay_rate ** (t // decay_epochs)
(ref: create_scheduler.py:34-36).

Schedules are returned as step->lr callables (for optax, which is
step-driven) given a static steps_per_epoch.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

from protopformer_tpu.core.config import OptimConfig

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def cosine_epoch_schedule(
    base_lr: float,
    epochs: int,
    warmup_epochs: int,
    warmup_lr: float,
    min_lr: float,
    steps_per_epoch: int,
) -> Schedule:
    def schedule(step):
        epoch = jnp.asarray(step) // steps_per_epoch
        t = epoch.astype(jnp.float32)
        warm = warmup_lr + t * (base_lr - warmup_lr) / max(warmup_epochs, 1)
        cos = min_lr + 0.5 * (base_lr - min_lr) * (
            1.0 + jnp.cos(jnp.pi * t / epochs)
        )
        lr = jnp.where(t < warmup_epochs, warm, cos)
        return jnp.where(t >= epochs, min_lr, lr)

    return schedule


def step_epoch_schedule(
    base_lr: float, decay_epochs: float, decay_rate: float, steps_per_epoch: int
) -> Schedule:
    def schedule(step):
        epoch = (jnp.asarray(step) // steps_per_epoch).astype(jnp.float32)
        return base_lr * decay_rate ** jnp.floor(epoch / decay_epochs)

    return schedule


def make_group_schedules(
    cfg: OptimConfig, steps_per_epoch: int
) -> Dict[str, Schedule]:
    """One schedule per parameter group, scaled from that group's base LR
    (ref: tools/create_optimizer.py:31-39 group LRs;
    scripts/train_cub.sh:19-24 preset values)."""
    bases = {
        "features": cfg.features_lr,
        "add_on": cfg.add_on_layers_lr,
        "prototypes": cfg.prototype_vectors_lr,
    }
    out = {}
    for name, base in bases.items():
        if cfg.sched == "cosine":
            out[name] = cosine_epoch_schedule(
                base, cfg.epochs, cfg.warmup_epochs, cfg.warmup_lr,
                cfg.min_lr, steps_per_epoch,
            )
        elif cfg.sched == "step":
            out[name] = step_epoch_schedule(
                base, cfg.decay_epochs, cfg.decay_rate, steps_per_epoch
            )
        else:
            raise ValueError(f"unknown sched: {cfg.sched}")
    return out
