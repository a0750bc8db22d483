"""Logging + metric writers.

Replaces the reference's three channels (ref: main.py:209-238,
tools/utils.py:272-291): TensorBoard SummaryWriter, python file+console
logging, and print-gating by rank. TensorBoard is optional — if no writer
backend is importable, scalars also land in a JSONL file that tooling can
tail (and that survives environments without TB installed)."""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

import jax

_LOG_FORMAT = (
    "%(asctime)s - %(funcName)s - %(name)s - %(levelname)s - %(message)s"
)


def get_logger(
    name: str, output_dir: Optional[str] = None, file_name: str = "train.log"
) -> logging.Logger:
    """File + console logger (ref: tools/utils.py:272-291); emits only on
    process 0 in multi-host runs (ref print-gating: utils.py:203-215)."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.propagate = False
    if logger.handlers:
        return logger
    is_main = jax.process_index() == 0
    fmt = logging.Formatter(_LOG_FORMAT)
    if is_main:
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(output_dir, file_name))
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    else:
        logger.addHandler(logging.NullHandler())
    return logger


class MetricWriter:
    """Scalar writer: TensorBoard if available, always JSONL.

    Mirrors the reference's per-iteration train scalars + per-epoch val
    scalars (ref: tools/engine_proto.py:86-107, main.py:432,452-457)."""

    def __init__(self, output_dir: str):
        self.output_dir = output_dir
        self._tb = None
        self._jsonl = None
        if jax.process_index() != 0:
            return
        os.makedirs(output_dir, exist_ok=True)
        self._jsonl = open(
            os.path.join(output_dir, "metrics.jsonl"), "a", buffering=1
        )
        try:  # optional TB backend
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(
                log_dir=os.path.join(output_dir, "tf-logs"), flush_secs=1
            )
        except Exception:
            self._tb = None

    def write(self, step: int, scalars: Dict[str, float]) -> None:
        if self._jsonl is None:
            return
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
