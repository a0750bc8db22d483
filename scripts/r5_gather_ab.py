"""A/B: one-hot-matmul token gather vs take_along_axis (round 5).

The round-5 speed profile attributes ~0.37 ms/iter to prune-point
relayout copies, including a 0.12 ms {1,2,0}<->{2,0,1} transpose pair
around the top-81 token gather (docs/DESIGN.md). Hypothesis: expressing
the (B, K, C) <- (B, N, C) selection as a one-hot (B, K, N) x (B, N, C)
batched matmul keeps the residual stream in its MXU-preferred layout (the
same trick scatter_tokens_to_grid already uses) instead of forcing the
gather's index-major layout. Selection by 0/1 matmul is EXACT in any
dtype (one nonzero per output element).

Patches gather_tokens at TRACE time (the jitted modules look the name up
in their module namespace when traced), builds baseline and patched
variants of the official serving recipe, and times them interleaved.

    python scripts/r5_gather_ab.py
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from protopformer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from r3_sweep import build, time_once  # noqa: E402

import protopformer_tpu.models.deit as deit_mod  # noqa: E402
import protopformer_tpu.models.ppnet as ppnet_mod  # noqa: E402


def gather_tokens_onehot(tokens: jax.Array, indices: jax.Array) -> jax.Array:
    onehot = jax.nn.one_hot(indices, tokens.shape[1], dtype=tokens.dtype)
    return jnp.einsum("bkn,bnc->bkc", onehot, tokens)


def main():
    configs = []
    for name, patch in (("take", False), ("onehot", True)):
        if patch:
            deit_mod.gather_tokens = gather_tokens_onehot
            ppnet_mod.gather_tokens = gather_tokens_onehot
        for spec in ("speed", "exact"):
            exact = spec == "exact"
            b = build(exact, 160, 1 if exact else 8)
            configs.append((f"{name}:{spec}", b))
            print(f"built {name}:{spec}", flush=True)
    best = {k: (1e9, 0.0) for k, _ in configs}
    for rep in range(3):
        for k, b in configs:
            ms, rate = time_once(*b)
            if ms < best[k][0]:
                best[k] = (ms, rate)
            print(f"rep{rep} {k:14s} {ms:6.2f} ms  {rate:8.0f} img/s",
                  flush=True)
    print("--- min-of-3 ---")
    for k, _ in configs:
        ms, rate = best[k]
        print(f"{k:14s} {ms:6.2f} ms  {rate:8.0f} img/s")


if __name__ == "__main__":
    main()
