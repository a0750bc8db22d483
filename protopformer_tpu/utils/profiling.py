"""Tracing / profiling hooks.

The reference has no profiler (SURVEY.md §5.1) — its closest machinery is
MetricLogger wall-clock timing + cuda max-memory. Here:

  * ``trace(dir)`` — context manager around ``jax.profiler.trace`` writing a
    TensorBoard-compatible device trace (XLA op timeline, HBM usage);
  * ``annotate(name)`` — named host span (``jax.profiler.TraceAnnotation``)
    so epoch/step phases show up in the timeline;
  * ``device_memory_stats()`` — per-device live-bytes snapshot (the TPU
    equivalent of ``torch.cuda.max_memory_allocated`` in
    tools/utils.py:168-170).
"""

from __future__ import annotations

import contextlib
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Profile the enclosed region to ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named span visible in the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    """Live/peak bytes per device, in MiB where available."""
    out: Dict[str, Dict[str, float]] = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats() or {}
        except Exception:
            stats = {}
        out[str(d)] = {
            k: v / (1024 ** 2)
            for k, v in stats.items()
            if isinstance(v, (int, float)) and "bytes" in k
        }
    return out
