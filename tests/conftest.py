"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding is exercised
without TPU hardware (the driver separately dry-runs the multichip path).
These env vars must be set before jax is imported anywhere.
"""

import os
import sys

# Environment-variable routes (JAX_PLATFORMS / XLA_FLAGS) are overridden by
# the remote-TPU plugin in this image; the config API wins. Must run before
# any backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent compilation cache: the suite is compile-dominated (~9 min
# cold); repeat runs deserialize instead (utils/cache.py)
from protopformer_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1028)
