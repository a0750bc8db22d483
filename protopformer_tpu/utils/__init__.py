from protopformer_tpu.utils.metrics import SmoothedValue, MetricLogger
from protopformer_tpu.utils.logging import get_logger, MetricWriter
from protopformer_tpu.utils.seeding import set_seed
from protopformer_tpu.utils.profiling import (
    trace,
    annotate,
    device_memory_stats,
)
from protopformer_tpu.utils.cache import enable_compilation_cache
