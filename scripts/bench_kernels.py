"""Kernel ablation bench (developer tool, run manually on the TPU).

Measures per-block attention+rollout-map time for:
  * the XLA path (eps-softmax + normalize_attention_map),
  * the round-1 fused core (N=197),
  * the padded fused core (NP=256) at several tile sizes.

Timing uses the chained-accumulator pattern (docs/DESIGN.md tunnel
pitfalls): iterations are serialized through a scalar so the final host
sync covers all of them; subtract nothing here — relative numbers only.
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np
import jax
import jax.numpy as jnp

B, N, NP, C, H = 256, 197, 256, 192, 3
ITERS = 30


def chain_time(fn, *args):
    @jax.jit
    def step(acc, *a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return acc + sum(jnp.sum(x).astype(jnp.float32) for x in leaves)

    acc = jnp.float32(0)
    np.asarray(step(acc, *args))  # compile+warm
    t0 = time.perf_counter()
    for _ in range(ITERS):
        acc = step(acc, *args)
    np.asarray(acc)
    return (time.perf_counter() - t0 - 0.031) / ITERS


def main():
    rng = jax.random.key(0)
    qkv = jax.random.normal(rng, (B, N, 3 * C), jnp.bfloat16) * 0.5
    qkv_pad = jnp.pad(qkv, ((0, 0), (0, NP - N), (0, 0)))
    pol = jnp.ones((B, N), jnp.float32)
    pol_pad = jnp.pad(pol, ((0, 0), (0, NP - N)))

    from protopformer_tpu.ops.masking import softmax_with_policy
    from protopformer_tpu.ops.rollout import normalize_attention_map

    def xla_path(qkv, pol):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        sh = (B, N, H, C // H)
        q = q.reshape(sh).transpose(0, 2, 1, 3)
        k = k.reshape(sh).transpose(0, 2, 1, 3)
        v = v.reshape(sh).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k) * ((C // H) ** -0.5)
        probs = softmax_with_policy(logits, pol)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
        m = normalize_attention_map(
            jnp.mean(probs.astype(jnp.float32), axis=1)
        )
        return out.transpose(0, 2, 1, 3).reshape(B, N, C), m

    t = chain_time(xla_path, qkv, pol)
    print(f"XLA attention+normalize:      {t*1e3:7.2f} ms/block")

    from protopformer_tpu.kernels.attention_core import (
        fused_attention_core,
        fused_attention_core_padded,
    )

    if "--skip-old" not in sys.argv:
        t = chain_time(
            lambda qkv, pol: fused_attention_core(qkv, pol, H), qkv, pol
        )
        print(f"round-1 core (N=197, TB=8):   {t*1e3:7.2f} ms/block")

    for tb in (8, 16, 32):
        try:
            t = chain_time(
                lambda qkv, pol, tb=tb: fused_attention_core_padded(
                    qkv, pol, H, N, block_batch=tb
                ),
                qkv_pad, pol_pad,
            )
            print(f"padded core (NP=256, TB={tb:2d}):  {t*1e3:7.2f} ms/block")
        except Exception as e:
            print(f"padded core (NP=256, TB={tb:2d}):  FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
