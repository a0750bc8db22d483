"""Multi-group optimizer (optax).

The reference builds 3 AdamW parameter groups — backbone features (wd 1e-3),
add-on layers (wd 1e-3), and prototype vectors local+global (wd =
args.weight_decay, 0.05 by default, because their group dict carries no
explicit weight_decay and inherits the optimizer-level one) — each with its
own LR; the frozen class-identity heads are excluded entirely
(ref: tools/create_optimizer.py:27-100, scripts/train_cub.sh:19-24).

Here: ``optax.multi_transform`` over path-derived labels, with per-group
AdamW chains driven by the epoch-staircase schedules; frozen params get
``optax.set_to_zero()``. Gradient clipping (``--clip_grad``) is prepended
when configured.
"""

from __future__ import annotations

from typing import Any

import jax
import optax

from protopformer_tpu.core.config import OptimConfig
from protopformer_tpu.train.scheduler import make_group_schedules


def param_group_label(path: tuple) -> str:
    """Map a parameter path to its optimizer group.

    PPNet param tree roots: features/ add_on_layers/ prototype_vectors
    prototype_vectors_global last_layer_w last_layer_global_w.
    """
    root = path[0].key if hasattr(path[0], "key") else str(path[0])
    if root == "features":
        return "features"
    if root == "add_on_layers":
        return "add_on"
    if root in ("prototype_vectors", "prototype_vectors_global"):
        return "prototypes"
    if root in ("last_layer_w", "last_layer_global_w"):
        return "frozen"
    # BaseNet / other heads train with the features group
    return "features"


def make_optimizer(
    cfg: OptimConfig, params: Any, steps_per_epoch: int
) -> optax.GradientTransformation:
    schedules = make_group_schedules(cfg, steps_per_epoch)
    b1, b2 = cfg.opt_betas

    def adamw(schedule, weight_decay):
        if cfg.opt == "adamw":
            return optax.adamw(
                schedule, b1=b1, b2=b2, eps=cfg.opt_eps,
                weight_decay=weight_decay,
            )
        if cfg.opt == "adam":
            # torch Adam treats weight decay as L2 in-gradient; optax adamw
            # with decay 0 + add_decayed_weights matches torch semantics only
            # for decay 0 — reference presets use adamw, so plain adam here
            # means no decoupled decay (parity with torch.optim.Adam default
            # weight_decay applied as L2):
            tx = optax.adam(schedule, b1=b1, b2=b2, eps=cfg.opt_eps)
            if weight_decay:
                tx = optax.chain(
                    optax.add_decayed_weights(weight_decay), tx
                )
            return tx
        if cfg.opt in ("sgd", "nesterov"):
            # the reference enables Nesterov for BOTH spellings:
            # `if opt_lower == 'sgd' or opt_lower == 'nesterov': ...
            # optim.SGD(..., nesterov=True)` (ref: create_optimizer.py:86-88)
            return optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.sgd(schedule, momentum=cfg.momentum, nesterov=True),
            )
        raise ValueError(f"unknown opt: {cfg.opt}")

    transforms = {
        "features": adamw(schedules["features"], cfg.group_weight_decay),
        "add_on": adamw(schedules["add_on"], cfg.group_weight_decay),
        "prototypes": adamw(schedules["prototypes"], cfg.weight_decay),
        "frozen": optax.set_to_zero(),
    }
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: param_group_label(path), params
    )
    tx = optax.multi_transform(transforms, labels)
    if cfg.clip_grad is not None:
        tx = optax.chain(optax.clip_by_global_norm(cfg.clip_grad), tx)
    return tx
