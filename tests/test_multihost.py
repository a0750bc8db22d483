"""Multi-host helpers (single-process semantics + index sharding math)."""

import numpy as np
import jax

from protopformer_tpu.data.datasets import build_synthetic_index
from protopformer_tpu.parallel import (
    is_main_process,
    shard_index_for_process,
)


def test_is_main_process_single():
    assert is_main_process()


def test_shard_index_even_split():
    index = build_synthetic_index(num_samples=10, num_classes=2, image_size=8)
    shards = [
        shard_index_for_process(index, process_index=p, process_count=4)
        for p in range(4)
    ]
    # even=True: every shard the same length (ceil(10/4) = 3, wrapping)
    assert all(len(s) == 3 for s in shards)
    # every original sample appears in some shard
    covered = set()
    for p, s in enumerate(shards):
        for path in s.paths:
            covered.add(path)
    assert covered == set(index.paths)
    # labels track paths through the shuffle
    for s in shards:
        for path, label, img in zip(s.paths, s.labels, s.images):
            i = int(path.split("://")[1])
            assert label == index.labels[i]
            np.testing.assert_array_equal(img, index.images[i])


def test_shard_index_process_count_one_is_identity():
    index = build_synthetic_index(num_samples=7, num_classes=2, image_size=8)
    out = shard_index_for_process(index, process_index=0, process_count=1)
    assert out.paths == index.paths
