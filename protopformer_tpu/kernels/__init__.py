"""Pallas TPU kernels (opt-in, config-gated — docs/DESIGN.md).

Shipped kernels are the config-reachable ones: the padded attention core +
fused block-stats kernel (attention_core.py, ``use_pallas``) and the fused
map-stats kernel (stats.py, ``stats_kernel``). The round-1/2 ablation
kernels that measured slower than XLA on every axis (standalone normalize,
whole-block fusion, whole-forward serving fusion) were DELETED in round 3 —
their implementations live in git history and their measurements in
docs/DESIGN.md.
"""

from protopformer_tpu.kernels.attention_core import (
    fused_attention_block_stats,
    fused_attention_core,
    fused_attention_mean_padded,
)
from protopformer_tpu.kernels.stats import fused_map_stats

__all__ = [
    "fused_attention_block_stats",
    "fused_attention_core",
    "fused_attention_mean_padded",
    "fused_map_stats",
]
