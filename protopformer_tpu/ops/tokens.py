"""Top-k token selection, gather, and grid scatter.

The reference prunes tokens via ``torch.topk`` over CLS-attention scores,
sorts the indices, gathers them, and (for the PPC loss / visualization)
scatters per-token values back onto the 14x14 grid with ``scatter_``
(ref: tools/deit_models_attn.py:229-234, protopformer.py:156-162,273-276).

On TPU:
  * top-k and gather have static shapes (k is 81/121 from config) — XLA loves
    this. Tie-breaking caveat: torch and jax ``top_k`` break EXACT-VALUE ties
    differently (observed on exact-zero rollout scores at toy scale); at
    production scale the 11-layer rollout densifies the scores and ties do
    not occur — asserted by the real-scale parity test
    (tests/test_parity.py), see docs/DESIGN.md "Precision policy".
  * the in-place ``scatter_`` becomes a one-hot matmul
    (values (B, P, K) x onehot (B, K, N) -> (B, P, N)), which rides the MXU
    instead of generating a scatter op.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def topk_sorted_indices(scores: jax.Array, k: int) -> jax.Array:
    """Indices of the k largest scores, sorted ascending.

    Mirrors ``topk(...)[1].sort(dim=-1)[0]`` (ref: deit_models_attn.py:229-230,
    protopformer.py:157-158).

    Args:
      scores: (..., N) scores.
    Returns:
      (..., k) int32 sorted indices.
    """
    _, idx = jax.lax.top_k(scores, k)
    return jnp.sort(idx, axis=-1)


def gather_tokens(tokens: jax.Array, indices: jax.Array) -> jax.Array:
    """Gather tokens at per-batch indices, as a one-hot MXU matmul.

    A ``take_along_axis`` gather forces the residual stream through an
    index-major layout (the round-5 profile shows a {1,2,0}<->{2,0,1}
    transpose pair around the prune-point gather); the 0/1 selection
    matmul rides the MXU in the stream's preferred layout instead.
    Measured interleaved min-of-3 at B=160 (scripts/r5_gather_ab.py):
    exact 8.41 vs 8.60 ms (+2.3%), speed 6.91 vs 6.95 (docs/DESIGN.md
    round-5). Selection by one-hot matmul is EXACT in any dtype — each
    output element is one value times 1.0 plus true zeros — and HIGHEST
    precision pins the fp32 path away from the backend's truncating
    DEFAULT fp32 matmul (docs/DESIGN.md "Precision policy"); the VJP is
    the transposed one-hot matmul, value-equal to the gather's scatter.

    Args:
      tokens: (B, N, C).
      indices: (B, K) int indices into the N axis.
    Returns:
      (B, K, C).
    """
    onehot = jax.nn.one_hot(indices, tokens.shape[1], dtype=tokens.dtype)
    return jnp.einsum(
        "bkn,bnc->bkc", onehot, tokens,
        precision=jax.lax.Precision.HIGHEST,
    )


def scatter_tokens_to_grid(
    values: jax.Array, indices: jax.Array, grid_len: int
) -> jax.Array:
    """Scatter per-token values back onto the full token grid.

    Functional replacement for ``discrete_weights.scatter_(2, idx, vals)``
    (ref: protopformer.py:273-276) and the visualization-side scatter
    (main_visualize.py:381-388), expressed as a one-hot matmul so it maps to
    the MXU.

    Args:
      values: (B, P, K) per-reserved-token values.
      indices: (B, K) grid positions of the reserved tokens.
      grid_len: N, total grid cells (e.g. 196).

    Returns:
      (B, P, N) with zeros at non-reserved positions.
    """
    onehot = jax.nn.one_hot(indices, grid_len, dtype=values.dtype)  # (B, K, N)
    # HIGHEST keeps the one-hot contraction an exact copy (default matmul
    # precision would round the values through a lower-precision multiply)
    return jnp.einsum(
        "bpk,bkn->bpn", values, onehot, precision=jax.lax.Precision.HIGHEST
    )


def reserve_policy(
    cls_token_attn: jax.Array, reserve_num: int, seq_len: int
) -> Tuple[jax.Array, jax.Array]:
    """Build the keep-policy from CLS-attention scores.

    Mirrors the reference's policy construction at the prune layer
    (ref: deit_models_attn.py:228-234): top-k patch indices (sorted), shifted
    by +1 to skip CLS, scattered into a zeros mask whose CLS slot is 1.

    Args:
      cls_token_attn: (B, N-1) CLS->patch rollout scores.
      reserve_num: number of patch tokens to keep.
      seq_len: N, full sequence length including CLS.

    Returns:
      (policy (B, N) in {0,1}, patch_indices (B, reserve_num) sorted, into
      the patch axis — NOT shifted by the CLS offset).
    """
    B = cls_token_attn.shape[0]
    idx = topk_sorted_indices(cls_token_attn, reserve_num)  # (B, k)
    patch_keep = jnp.sum(
        jax.nn.one_hot(idx, seq_len - 1, dtype=jnp.float32), axis=1
    )  # (B, N-1); indices are unique so sum == scatter of ones
    policy = jnp.concatenate(
        [jnp.ones((B, 1), dtype=jnp.float32), patch_keep], axis=1
    )
    return policy, idx
