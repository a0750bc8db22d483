"""Epoch driver: the reference's main-loop orchestration, TPU-shaped.

Covers main.py:417-479: per-epoch train, periodic + best checkpointing,
eval every epoch, TB/JSONL scalars, and engine_proto.py:24-185's loop
bodies. Differences by design:

  * the per-batch body is ONE jitted program (train/steps.py); the host loop
    only feeds batches and reads scalar metrics;
  * the PPC epoch gate (epoch >= ppc_start) is a traced 0/1 scalar;
  * metric fetches are BATCHED every ``sync_every`` steps instead of per
    step: the reference syncs every iteration (engine_proto.py:79
    cuda.synchronize + per-iter scalar reads), which serializes host and
    device — on TPU a per-step ``float(metrics['loss'])`` is a full host
    round trip that defeats XLA's async dispatch (measured: the round-2
    loop lost ~30 ms/step through the remote tunnel to exactly this);
  * non-finite loss aborts like the reference (engine_proto.py:68-70) but
    raises instead of sys.exit so callers can handle it — within
    ``sync_every`` steps of the bad step (contract-tested);
  * LR is recomputed host-side per epoch purely for logging — the schedule
    itself lives inside optax.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from protopformer_tpu.core.config import ExperimentConfig
from protopformer_tpu.train.scheduler import make_group_schedules
from protopformer_tpu.utils.metrics import MetricLogger


class NonFiniteLossError(RuntimeError):
    pass


def train_one_epoch(
    train_step,
    state,
    loader,
    epoch: int,
    rng,
    cfg: ExperimentConfig,
    writer=None,
    logger=None,
    global_iter: int = 0,
    sync_every: int = 20,
) -> tuple:
    """Run one training epoch; returns (state, stats dict, next_global_iter).

    ``sync_every``: steps between host metric fetches (each fetch is one
    device round trip covering the whole window; dispatch stays async in
    between). Non-finite loss still aborts, at most ``sync_every - 1``
    steps late. (ref: tools/engine_proto.py:24-113)"""
    metric_logger = MetricLogger(logger=logger)
    loader.set_epoch(epoch)
    ppc_gate = jnp.float32(
        1.0 if (cfg.ppnet.use_ppc_loss and epoch >= cfg.ppnet.ppc_start_epoch)
        else 0.0
    )
    # host-side LR for logging (the real schedule is inside optax)
    steps_per_epoch = max(len(loader), 1)
    sched = make_group_schedules(cfg.optim, steps_per_epoch)
    lr_now = float(sched["features"](epoch * steps_per_epoch))
    metric_logger.update(lr=lr_now)

    it = global_iter
    pending = []  # (iter index, device metrics) awaiting one batched fetch

    def _drain():
        if not pending:
            return
        fetched = jax.device_get([m for _, m in pending])
        for (i, _), dm in zip(pending, fetched):
            host_metrics = {k: float(v) for k, v in dm.items()}
            if not math.isfinite(host_metrics["loss"]):
                raise NonFiniteLossError(
                    f"Loss is {host_metrics['loss']} at epoch {epoch} "
                    f"iter {i}, stopping training"
                )
            metric_logger.update(**host_metrics)
            if writer is not None:
                writer.write(
                    i, {f"train/{k}": v for k, v in host_metrics.items()}
                )
        pending.clear()

    for batch in metric_logger.log_every(
        loader, 30, header=f"Epoch: [{epoch}]"
    ):
        # drop the eval-only valid mask (train drops ragged batches instead)
        batch = {"image": batch["image"], "label": batch["label"]}
        state, metrics = train_step(state, batch, rng, ppc_gate)
        pending.append((it, metrics))
        if len(pending) >= max(1, sync_every):
            _drain()
        it += 1
    _drain()

    stats = metric_logger.averages()
    if logger is not None:
        logger.info(f"Averaged stats: {metric_logger}")
    return state, stats, it


def evaluate(
    eval_step, params, loader, logger=None, use_global: bool = True
) -> Dict[str, float]:
    """Full-dataset evaluation; exact aggregation over the padded last batch
    via the valid mask (ref: tools/engine_proto.py:143-185)."""
    totals: Dict[str, float] = {}
    for batch in loader:
        metrics = eval_step(params, batch)
        for k, v in metrics.items():
            totals[k] = totals.get(k, 0.0) + float(v)
    n = max(totals.pop("n", 0.0), 1.0)
    out = {
        "loss": totals.get("loss_sum", 0.0) / n,
        "acc1": 100.0 * totals.get("correct1", 0.0) / n,
        "acc5": 100.0 * totals.get("correct5", 0.0) / n,
    }
    if use_global and "global_correct1" in totals:
        out["global_acc1"] = 100.0 * totals["global_correct1"] / n
        out["local_acc1"] = 100.0 * totals["local_correct1"] / n
    if logger is not None:
        logger.info(
            f"* Acc@1 {out['acc1']:.3f} Acc@5 {out['acc5']:.3f} "
            f"loss {out['loss']:.3f}"
        )
    return out
