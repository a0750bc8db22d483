"""Perf sweep on the real TPU: batch-size sweep + serving-path ablations.

Run from the repo root (ONE TPU job at a time — the tunnel serializes):

    python scripts/perf_sweep.py ablate   # feature ablations at B=96
    python scripts/perf_sweep.py sweep    # batch-size sweep
    python scripts/perf_sweep.py int8     # int8 serving mode comparison

Timing uses the chained-accumulator pattern (see bench.py) — through the
remote tunnel, independent dispatches under-measure.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from protopformer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from protopformer_tpu.core.config import PPNetConfig, backbone_preset
from protopformer_tpu.models import construct_ppnet
from protopformer_tpu.data.preprocess import (
    fold_normalization_into_patch_embed,
    normalize_images,
)

PP = PPNetConfig(
    prototype_shape=(2000, 192, 1, 1), num_classes=200,
    reserve_layers=(11,), reserve_token_nums=(81,),
    use_global=True, global_proto_per_class=10,
)


def measure(batch, fold=True, iters=40, name="deit_tiny_patch16_224",
            **bb_overrides):
    kw = {"rollout_exact_discard": False}
    kw.update(bb_overrides)
    bb = backbone_preset(name, **kw)
    model = construct_ppnet(bb, PP, compute_dtype=jnp.bfloat16)
    rng = jax.random.key(1028)
    params = model.init(rng, jnp.zeros((1, 224, 224, 3)))["params"]
    x = jax.random.uniform(rng, (batch, 224, 224, 3), jnp.float32)
    if fold:
        params = fold_normalization_into_patch_embed(params)

        @jax.jit
        def fwd(acc, p, im):
            out = model.apply({"params": p}, im, train=False)
            return acc + out.logits.sum().astype(jnp.float32)
    else:
        @jax.jit
        def fwd(acc, p, im):
            out = model.apply(
                {"params": p}, normalize_images(im), train=False
            )
            return acc + out.logits.sum().astype(jnp.float32)

    np.asarray(fwd(jnp.float32(0), params, x))
    acc = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = fwd(acc, params, x)
    np.asarray(acc)
    dt = time.perf_counter() - t0
    return batch * iters / dt, dt / iters * 1e3


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "ablate"
    if mode == "ablate":
        for label, kw in [
            ("all-on (fold+gather+bf16maps)", {}),
            ("no-fold", {"fold": False}),
            ("no-gather", {"prune_gather": "off"}),
            ("exact-discard (fp32 maps)", {"rollout_exact_discard": True}),
            ("batched attention", {"attn_impl": "batched"}),
            ("pallas stats kernel", {"stats_kernel": "on"}),
        ]:
            r, ms = measure(96, **kw)
            print(f"{label:34s} B=96  {ms:6.2f} ms  {r:8.0f} img/s")
    elif mode == "sweep":
        for b in (64, 96, 128, 160, 192, 256):
            r, ms = measure(b)
            print(f"sweep B={b:<4d} {ms:6.2f} ms  {r:8.0f} img/s")
    elif mode == "int8":
        for label, name, b, kw in [
            ("bf16 deit_tiny", "deit_tiny_patch16_224", 96, {}),
            ("int8 deit_tiny", "deit_tiny_patch16_224", 96,
             {"quantize": "int8"}),
            ("bf16 deit_small", "deit_small_patch16_224", 64, {}),
            ("int8 deit_small", "deit_small_patch16_224", 64,
             {"quantize": "int8"}),
        ]:
            r, ms = measure(b, name=name, **kw)
            print(f"{label:20s} B={b:<4d} {ms:6.2f} ms  {r:8.0f} img/s")


if __name__ == "__main__":
    main()
