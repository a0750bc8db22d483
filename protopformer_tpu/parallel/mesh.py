"""Device mesh and sharding helpers.

The reference's only parallelism is data-parallel DDP over NCCL
(ref: main.py:370, tools/utils.py:247-269). The TPU-native equivalent is a
1-D ``jax.sharding.Mesh`` over all chips with the batch sharded on the
``data`` axis and parameters replicated; XLA inserts the gradient
all-reduces over ICI automatically under jit. Metric reduction is likewise a
jnp.mean inside the jitted step (replacing utils.py:53-64's manual
all_reduce).

The model is 5–22M params — TP/PP/SP/EP are documented non-goals
(SURVEY.md §2.3); this module deliberately exposes just the DP mesh, while
keeping the axis name pluggable so a 2-D (data, model) mesh can be layered
in later without touching call sites.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None, axis_name: str = "data"
) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Device-put a host batch with the leading axis sharded across chips.

    Replaces the reference's DistributedSampler + per-rank H2D copies
    (ref: main.py:286-297, tools/engine_proto.py:42-43): one logical array,
    physically split over the mesh.
    """
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
