from protopformer_tpu.parallel.mesh import (
    make_mesh,
    replicated_sharding,
    batch_sharding,
    shard_batch,
)
from protopformer_tpu.parallel.multihost import (
    assemble_global_batch,
    initialize_multihost,
    is_main_process,
    shard_index_for_process,
)
