"""Orbax checkpoint save/restore.

Replaces the reference's rank-0 ``torch.save`` of ``{model, optimizer,
lr_scheduler, epoch, model_ema, scaler, args}`` (ref: main.py:436-447,
tools/utils.py:242-244) and the ``--resume`` path (main.py:393-407).

Orbax handles multi-host coordination natively (the reference's
``save_on_master`` gating is unnecessary); the scaler has no TPU equivalent
(bf16 needs no loss scaling) and the schedule state is the step counter
inside opt_state.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

from protopformer_tpu.train.state import TrainState


class CheckpointManager:
    """Epoch-granular checkpoints + best-model tracking
    (ref: main.py:436-447 periodic saves, :460-471 epoch-best)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(
        self,
        epoch: int,
        state: TrainState,
        extra: Optional[Dict[str, Any]] = None,
    ) -> None:
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        if state.ema_params is not None:
            payload["ema_params"] = state.ema_params
        self._mgr.save(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(payload),
                meta=ocp.args.JsonSave(
                    {"epoch": epoch, **(extra or {})}
                ),
            ),
        )
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self, state: TrainState, epoch: Optional[int] = None
    ) -> tuple[TrainState, Dict[str, Any]]:
        """Restore into the given (template) state; returns (state, meta)."""
        if epoch is None:
            epoch = self._mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        template = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        if state.ema_params is not None:
            template["ema_params"] = state.ema_params
        restored = self._mgr.restore(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(template),
                meta=ocp.args.JsonRestore(),
            ),
        )
        payload = restored["state"]
        new_state = state.replace(
            params=payload["params"],
            opt_state=payload["opt_state"],
            step=payload["step"],
            ema_params=payload.get("ema_params", state.ema_params),
        )
        return new_state, dict(restored["meta"])


def save_params(path: str, params: Any) -> None:
    """One-shot params-only save (offline tools load these —
    ref: main_visualize.py:287-291 strict=False load)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()


def load_params(path: str, template: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
