from protopformer_tpu.parallel.mesh import (
    make_mesh,
    replicated_sharding,
    batch_sharding,
    shard_batch,
)
