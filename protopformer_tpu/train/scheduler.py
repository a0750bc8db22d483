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

from typing import Callable, Dict, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from protopformer_tpu.core.config import OptimConfig

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def timm_noise_table(
    epochs_total: int,
    noise_range: Optional[Sequence[float]],
    noise_pct: float,
    noise_std: float,
    seed: int,
) -> Optional[np.ndarray]:
    """Per-epoch multiplicative LR noise, bit-matching timm's
    ``Scheduler._add_noise`` (timm/scheduler/scheduler.py; driven via
    ref create_scheduler.py:7-16,28-31).

    timm draws ``torch.randn`` from ``Generator(seed + t)`` and rejects
    until ``|noise| < noise_pct`` ('normal' noise type, the timm default).
    Epochs are static, so the exact torch draws are precomputed on host —
    the jitted schedule just indexes the table. Returns None when noise is
    disabled (lr used as-is).
    """
    if noise_range is None:
        return None
    import torch

    lo, hi = (
        (noise_range[0], noise_range[1])
        if len(noise_range) > 1
        else (noise_range[0], float("inf"))
    )
    out = np.zeros((max(epochs_total, 1),), np.float32)
    for t in range(epochs_total):
        if not (lo <= t < hi):
            continue
        g = torch.Generator()
        g.manual_seed(seed + t)
        while True:
            n = torch.randn(1, generator=g).item() * noise_std
            if abs(n) < noise_pct:
                break
        out[t] = n
    return out


def cosine_epoch_schedule(
    base_lr: float,
    epochs: int,
    warmup_epochs: int,
    warmup_lr: float,
    min_lr: float,
    steps_per_epoch: int,
    cycle_limit: int = 1,
    noise: Optional[np.ndarray] = None,
) -> Schedule:
    noise_t = None if noise is None else jnp.asarray(noise)

    def schedule(step):
        epoch = jnp.asarray(step) // steps_per_epoch
        t = epoch.astype(jnp.float32)
        warm = warmup_lr + t * (base_lr - warmup_lr) / max(warmup_epochs, 1)
        # timm CosineLRScheduler with t_mul=1, decay_rate=1: cycle i covers
        # t in [i*epochs, (i+1)*epochs); cycles beyond cycle_limit hold
        # min_lr (timm _get_lr cycle arithmetic, create_scheduler.py:26)
        t_cyc = jnp.mod(t, float(epochs))
        cos = min_lr + 0.5 * (base_lr - min_lr) * (
            1.0 + jnp.cos(jnp.pi * t_cyc / epochs)
        )
        lr = jnp.where(t < warmup_epochs, warm, cos)
        lr = jnp.where(t >= epochs * cycle_limit, min_lr, lr)
        if noise_t is not None:
            idx = jnp.clip(epoch, 0, noise_t.shape[0] - 1)
            lr = lr + lr * noise_t[idx]
        return lr

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
    # timm noise_range_t = lr_noise fractions x total epochs
    # (ref: create_scheduler.py:7-16); one shared table — timm seeds by
    # (seed + t) only, so every group gets the same noise
    noise = timm_noise_table(
        cfg.epochs * getattr(cfg, "lr_cycle_limit", 1) + cfg.cooldown_epochs,
        None if cfg.lr_noise is None
        else [n * cfg.epochs for n in cfg.lr_noise],
        cfg.lr_noise_pct, cfg.lr_noise_std, cfg.noise_seed,
    )
    out = {}
    for name, base in bases.items():
        if cfg.sched == "cosine":
            out[name] = cosine_epoch_schedule(
                base, cfg.epochs, cfg.warmup_epochs, cfg.warmup_lr,
                cfg.min_lr, steps_per_epoch,
                cycle_limit=cfg.lr_cycle_limit, noise=noise,
            )
        elif cfg.sched == "step":
            out[name] = step_epoch_schedule(
                base, cfg.decay_epochs, cfg.decay_rate, steps_per_epoch
            )
        else:
            raise ValueError(f"unknown sched: {cfg.sched}")
    return out
