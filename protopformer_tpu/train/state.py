"""Train state pytree.

Bundles what the reference checkpoints as ``{model, optimizer, lr_scheduler,
epoch, model_ema, scaler, args}`` (ref: main.py:439-447). There is no
GradScaler: bf16 needs no loss scaling, and the schedule state is just the
step counter.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_params: Optional[Any] = None

    def apply_gradients(self, grads, ema_decay: Optional[float] = None):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None and ema_decay is not None:
            # timm ModelEma: ema = decay * ema + (1 - decay) * model
            # (ref: main.py:355-362, decay 0.99996)
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p.astype(e.dtype) * (1.0 - ema_decay),
                new_ema,
                new_params,
            )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )


def create_train_state(
    params: Any, tx: optax.GradientTransformation, with_ema: bool = True
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if with_ema else None,
        tx=tx,
    )
