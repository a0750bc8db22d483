from protopformer_tpu.ops.masking import (
    softmax_with_policy,
    class_attn_softmax_with_policy,
)
from protopformer_tpu.ops.rollout import (
    normalize_attention_map,
    rollout_step,
    attn_rollout,
    attn_rollout_cait,
)
from protopformer_tpu.ops.distances import (
    l2_distances,
    log_similarity,
    distance_to_similarity,
    prototype_activations,
)
from protopformer_tpu.ops.tokens import (
    topk_sorted_indices,
    gather_tokens,
    scatter_tokens_to_grid,
    reserve_policy,
)
from protopformer_tpu.ops.ppc import (
    weighted_spatial_stats,
    ppc_loss,
)
