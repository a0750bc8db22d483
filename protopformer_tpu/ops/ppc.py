"""Prototypical Part Concentration (PPC) loss.

The reference scatters the label's ``proto_per_class`` local-prototype
activation maps from the k reserved tokens back onto the full 14x14 grid and
penalizes (a) large activation-weighted spatial covariance and (b) small
pairwise separation of the activation-weighted spatial means
(ref: protopformer.py:249-288 ``batch_cov`` / ``get_PPC_loss``; applied from
epoch 20, tools/engine_proto.py:63-64).

TPU redesign: the reference builds (B*10, 196, 2, 2) outer products with
``bmm`` — here the covariance is a single einsum over the fixed coordinate
lattice, and the scatter is a one-hot matmul (see ops.tokens). Everything is
fp32 (loss-side numerics).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from protopformer_tpu.ops.tokens import scatter_tokens_to_grid, topk_sorted_indices


def _coordinate_lattice(grid_size: int) -> jax.Array:
    """(N, 2) points [[x, y] for x in range(g) for y in range(g)]
    (ref: protopformer.py:262)."""
    x = jax.lax.broadcasted_iota(jnp.float32, (grid_size, grid_size), 0)
    y = jax.lax.broadcasted_iota(jnp.float32, (grid_size, grid_size), 1)
    return jnp.stack([x.reshape(-1), y.reshape(-1)], axis=-1)


def weighted_spatial_stats(
    weights: jax.Array, grid_size: int
) -> Tuple[jax.Array, jax.Array]:
    """Activation-weighted mean and covariance over the coordinate lattice.

    Mirrors ``PPNet.batch_cov`` (ref: protopformer.py:249-257): weights are
    normalized to sum to N, the mean uses ``.mean(dim=1)`` (i.e. divide by N),
    and the covariance divides by (N - 1).

    Args:
      weights: (M, N) nonnegative weights, N == grid_size**2.
    Returns:
      (mean (M, 2), cov (M, 2, 2)) fp32.
    """
    w = weights.astype(jnp.float32)
    N = w.shape[-1]
    pts = _coordinate_lattice(grid_size)  # (N, 2)
    w = w / jnp.sum(w, axis=-1, keepdims=True) * N
    hi = jax.lax.Precision.HIGHEST
    mean = jnp.einsum("mn,nd->md", w, pts, precision=hi) / N  # (M, 2)
    diffs = pts[None, :, :] - mean[:, None, :]  # (M, N, 2)
    cov = jnp.einsum("mn,mni,mnj->mij", w, diffs, diffs, precision=hi) / (N - 1)
    return mean, cov


def ppc_loss(
    total_proto_act: jax.Array,
    cls_attn_rollout: jax.Array,
    label: jax.Array,
    num_classes: int,
    proto_per_class: int,
    grid_size: int,
    cov_thresh: float,
    mean_thresh: float,
) -> Tuple[jax.Array, jax.Array]:
    """PPC covariance + mean-separation losses (ref: protopformer.py:259-288).

    Args:
      total_proto_act: (B, P, K) per-reserved-token activation maps in token
        layout (the reference's (B, P, 9, 9) flattened).
      cls_attn_rollout: (B, N) CLS->patch rollout scores (N = grid_size**2);
        its top-K sorted indices locate the reserved tokens on the grid —
        the same selection the backbone made (ref: protopformer.py:273-275).
      label: (B,) int class labels.

    Returns:
      (ppc_cov_loss, ppc_mean_loss) scalars (un-weighted; the engine applies
      ppc_cov_coe / ppc_mean_coe — ref: tools/engine_proto.py:61-62).
    """
    B, P, K = total_proto_act.shape
    N = grid_size * grid_size

    # the label's proto_per_class local prototypes (ref: :268-271)
    proto_idx = label[:, None] * proto_per_class + jnp.arange(proto_per_class)
    act = jnp.take_along_axis(
        total_proto_act.astype(jnp.float32), proto_idx[:, :, None], axis=1
    )  # (B, ppc, K)

    # scatter onto the grid at the reserved-token positions (ref: :273-276)
    reserve_idx = topk_sorted_indices(cls_attn_rollout, K)  # (B, K)
    grid_w = scatter_tokens_to_grid(act, reserve_idx, N)  # (B, ppc, N)

    mean, cov = weighted_spatial_stats(
        grid_w.reshape(B * proto_per_class, N), grid_size
    )

    # cov loss: relu(trace/2 - thresh).mean (ref: :280-281)
    cov_loss = jnp.mean(jax.nn.relu((cov[:, 0, 0] + cov[:, 1, 1]) / 2.0 - cov_thresh))

    # mean loss: relu((thresh - pairwise dist) * offdiag).mean over the FULL
    # (B, ppc, ppc) matrix including the zero diagonal (ref: :283-286)
    mean = mean.reshape(B, proto_per_class, 2)
    diff = mean[:, :, None, :] - mean[:, None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    offdiag = 1.0 - jnp.eye(proto_per_class, dtype=jnp.float32)
    mean_loss = jnp.mean(jax.nn.relu((mean_thresh - dist) * offdiag))

    return cov_loss, mean_loss
