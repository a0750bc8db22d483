"""Seeding.

The reference seeds python/numpy/torch(+cuda) per rank and flips cuDNN to
deterministic (ref: main.py:241-249,254-255). In JAX, determinism is the
default — all device randomness flows from explicit PRNG keys — so this
reduces to seeding the host-side numpy/python generators used by the data
pipeline and returning the root jax key."""

from __future__ import annotations

import random

import numpy as np
import jax


def set_seed(seed: int) -> jax.Array:
    """Seed host RNGs; fold in the process index (multi-host equivalent of
    the reference's seed+rank, main.py:254). Returns the root jax PRNG key."""
    seed = int(seed) + jax.process_index()
    random.seed(seed)
    np.random.seed(seed % (2 ** 32))
    return jax.random.key(seed)
