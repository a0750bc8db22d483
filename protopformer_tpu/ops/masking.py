"""Policy-masked softmax (token-pruning attention).

The reference prunes background tokens mid-network by multiplying the
attention probabilities with a 0/1 keep-mask ("policy") inside a numerically
stabilized fp32 softmax (ref: tools/deit_models_attn.py:29-43 for the DeiT
self-attention variant; tools/cait_models_attn.py:50-69 for CaiT class
attention).

TPU notes: both variants are pure element-wise + row-reduction work that XLA
fuses into the surrounding attention matmuls; they are written in fp32
regardless of the compute dtype because the reference forces fp32 here "for
stable training" and parity requires it.

Semantics to preserve exactly:
  * The row max is taken over the FULL row (not the masked row) before exp.
  * A dropped token still attends to itself via an identity escape
    (``policy + (1-policy) * I``) in the DeiT variant.
  * The CaiT class-attention variant has NO identity escape: its query rows
    are the CLS token only and the CLS column of the policy is always 1.
  * The normalization is ``(p + eps/N) / (sum(p) + eps)`` with eps=1e-6, so
    even fully masked rows are finite.
  * These masked softmaxes are used for EVERY block in the pruning forward —
    the pre-prune blocks just see an all-ones policy, which is *not* bitwise
    identical to a plain softmax because of the eps terms
    (ref: deit_models_attn.py:218-235: policy starts as ones and is always
    passed to the block).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_with_policy(
    logits: jax.Array, policy: jax.Array, eps: float = 1e-6
) -> jax.Array:
    """DeiT self-attention masked softmax (ref: tools/deit_models_attn.py:29-43).

    Args:
      logits: (B, H, N, N) pre-softmax attention scores (any float dtype).
      policy: (B, N) or (B, N, 1) keep-mask in {0, 1}; 1 = token kept.
      eps: stabilizer, reference uses 1e-6.

    Returns:
      (B, H, N, N) attention probabilities in ``logits.dtype``.
    """
    B, H, N, _ = logits.shape
    pol = policy.reshape(B, 1, 1, N).astype(jnp.float32)
    eye = jnp.eye(N, dtype=jnp.float32)
    # identity escape: a dropped token may still attend to itself
    attn_policy = pol + (1.0 - pol) * eye  # (B, 1, N, N)
    max_att = jnp.max(logits, axis=-1, keepdims=True)
    attn = jnp.exp((logits - max_att).astype(jnp.float32)) * attn_policy
    attn = (attn + eps / N) / (jnp.sum(attn, axis=-1, keepdims=True) + eps)
    return attn.astype(logits.dtype)


def eps_softmax(logits: jax.Array, eps: float = 1e-6) -> jax.Array:
    """``softmax_with_policy`` specialized to an all-ones policy.

    The pruning forward feeds EVERY block the masked softmax, but before the
    prune point the policy is statically all-ones (ref:
    deit_models_attn.py:218-235) — the identity-escape tensor and the policy
    multiply reduce to no-ops, leaving only the eps stabilizers:
    ``(exp(l - max) + eps/N) / (sum exp(l - max) + eps)``.

    fp32 logits: bit-identical to ``softmax_with_policy(logits, ones)``
    (the parity path). bf16 logits (speed mode): the elementwise exp/divide
    stay in bf16 with an fp32 row-sum — the output is bf16 either way, and
    skipping the fp32 materialization of the (B, H, N, N) tensor saves
    ~1.5 ms/block of HBM traffic at B=256.
    """
    N = logits.shape[-1]
    max_att = jnp.max(logits, axis=-1, keepdims=True)
    if logits.dtype == jnp.float32:
        e = jnp.exp(logits - max_att)
        return (e + eps / N) / (jnp.sum(e, axis=-1, keepdims=True) + eps)
    e = jnp.exp(logits - max_att)
    s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32) + eps
    inv = (1.0 / s).astype(logits.dtype)
    return (e + jnp.asarray(eps / N, logits.dtype)) * inv


def class_attn_softmax_with_policy(
    logits: jax.Array, policy: jax.Array, eps: float = 1e-6
) -> jax.Array:
    """CaiT class-attention masked softmax (ref: tools/cait_models_attn.py:50-69).

    Unlike the DeiT variant there is no identity escape — the query rows are
    CLS-only (M=1) and the reference keeps the CLS column via policy[:, 0]=1
    (the eye-escape code there is computed and then discarded at
    cait_models_attn.py:58-59).

    Args:
      logits: (B, H, M, N) with M the number of query rows (1 for CLS).
      policy: (B, N) or (B, N, 1) keep-mask in {0, 1}.

    Returns:
      (B, H, M, N) attention probabilities in ``logits.dtype``.
    """
    B, H, M, N = logits.shape
    pol = policy.reshape(B, 1, 1, N).astype(jnp.float32)
    max_att = jnp.max(logits, axis=-1, keepdims=True)
    attn = jnp.exp((logits - max_att).astype(jnp.float32)) * pol
    attn = (attn + eps / N) / (jnp.sum(attn, axis=-1, keepdims=True) + eps)
    return attn.astype(logits.dtype)
