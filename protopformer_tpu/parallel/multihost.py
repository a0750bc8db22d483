"""Multi-host (multi-slice) initialization and data sharding.

TPU-native replacement for the reference's NCCL bootstrap
(ref: tools/utils.py:247-269 ``init_distributed_mode``: env/SLURM rank
discovery, ``dist.init_process_group('nccl')``, barrier, print-gating).

JAX is single-controller-per-host: ``jax.distributed.initialize`` discovers
the coordinator from the TPU metadata (or explicit args, mirroring the
reference's env:// rendezvous), after which ``jax.devices()`` spans all
hosts and the SAME data-parallel mesh code (parallel/mesh.py) drives
multi-host training — gradient all-reduces ride ICI within a slice and DCN
across slices, placed by XLA.

Host-side responsibilities that replace DistributedSampler
(ref: main.py:286-297): each process loads only its shard of the sample
index (``shard_index_for_process``) and assembles its LOCAL batch shard
into the global sharded array with ``assemble_global_batch``
(jax.make_array_from_process_local_data). ``parallel.mesh.shard_batch``
is the single-process fast path — it requires the full global batch on
the host and must not be fed per-process shards.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from protopformer_tpu.data.datasets import DatasetIndex


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime (no-op for single process).

    On Cloud TPU pods all arguments are discovered automatically; explicit
    args cover the reference's env:// / SLURM style rendezvous
    (tools/utils.py:248-254)."""
    if num_processes == 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # already initialized, or single-host environment
        pass


def is_main_process() -> bool:
    """Print/checkpoint gating (ref: tools/utils.py:203-215, 242-244)."""
    return jax.process_index() == 0


def assemble_global_batch(
    local_batch, mesh, axis_name: str = "data"
):
    """Assemble per-process LOCAL batch shards into one global sharded
    array tree (the multi-host half of DistributedSampler+DDP semantics,
    ref: main.py:286-297): every process passes its own (local_B, ...)
    arrays; the result is a (global_B, ...) jax.Array laid out on the
    mesh's data axis. Single-process: equivalent to mesh.shard_batch."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis_name))
    nproc = jax.process_count()

    def put(x):
        global_shape = (x.shape[0] * nproc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x), global_shape
        )

    return jax.tree_util.tree_map(put, local_batch)


def shard_index_for_process(
    index: DatasetIndex,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    even: bool = True,
) -> DatasetIndex:
    """Per-host shard of a dataset index (DistributedSampler equivalent,
    ref: main.py:286-288).

    With ``even=True`` every process gets the same sample count (the last
    samples wrap around, like DistributedSampler's padding) so global batch
    shapes stay static across hosts.
    """
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count() if process_count is None else process_count
    if n == 1:
        return index
    total = len(index)
    per = (total + n - 1) // n if even else None
    if even:
        ids = (np.arange(per) * n + p) % total
    else:
        ids = np.arange(p, total, n)
    return DatasetIndex(
        paths=[index.paths[i] for i in ids],
        labels=index.labels[ids],
        num_classes=index.num_classes,
        image_ids=(
            index.image_ids[ids] if index.image_ids is not None else None
        ),
        images=index.images[ids] if index.images is not None else None,
    )
