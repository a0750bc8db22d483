"""Persistent XLA compilation cache.

Compiles through the remote-TPU tunnel take 2-15 MINUTES depending on the
tunnel's load (measured); the persistent cache turns a repeat compile into
a ~30 s deserialize (158 -> 34 s on a 20-matmul probe). Every entry point
(bench, training CLI, driver entry) enables it so cold runs of unchanged
programs never pay the tunnel compile twice.
"""

from __future__ import annotations

import os


def enable_compilation_cache(directory: str = None) -> str:
    """Enable JAX's persistent compilation cache (idempotent).

    Args:
      directory: cache dir; defaults to $PPF_TPU_CACHE_DIR or
        ``.jax_cache`` next to the repo root (kept inside the workspace).
    Returns:
      The cache directory in effect.
    """
    import jax

    directory = (
        directory
        or os.environ.get("PPF_TPU_CACHE_DIR")
        or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)
            ))),
            ".jax_cache",
        )
    )
    os.makedirs(directory, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", directory)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs: harmless no-op
    return directory
