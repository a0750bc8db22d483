"""Round-5 train-step sweep: batch sizes + backbone overrides, AUTO layouts.

Measures the production train step (fwd + CE + PPC + bwd + 3-group AdamW
+ EMA as ONE jitted program, compiler-chosen state layouts — exactly what
bench.py's train record runs) for each ``batch[:k=v,...]`` spec on argv,
interleaved min-of-3 x 20-step chains:

    python scripts/r5_train_sweep.py 192 256 320
    python scripts/r5_train_sweep.py 256 256:ln_stats=mxu

ONE TPU job at a time — the tunnel serializes concurrent processes.
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

from protopformer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from protopformer_tpu.core.config import (
    OptimConfig, PPNetConfig, backbone_preset,
)
from protopformer_tpu.models import construct_ppnet
from protopformer_tpu.train.optimizer import make_optimizer
from protopformer_tpu.train.state import create_train_state
from protopformer_tpu.train.steps import (
    compile_train_step_auto, make_train_step,
)

PP = PPNetConfig(
    prototype_shape=(2000, 192, 1, 1), num_classes=200,
    reserve_layers=(11,), reserve_token_nums=(81,),
    use_global=True, use_ppc_loss=True, global_proto_per_class=10,
)
ITERS = 20


def build(batch_size, **bb_overrides):
    backbone = backbone_preset(
        "deit_tiny_patch16_224",
        rollout_exact_discard=False, rollout_discard_sample=8,
        **bb_overrides,
    )
    optim_cfg = OptimConfig()
    model = construct_ppnet(backbone, PP, compute_dtype=jnp.bfloat16)
    rng = jax.random.key(1028)
    params = model.init(rng, jnp.zeros((1, 224, 224, 3)))["params"]
    tx = make_optimizer(optim_cfg, params, steps_per_epoch=100)
    state = create_train_state(params, tx, with_ema=optim_cfg.model_ema)
    batch = {
        "image": jax.random.uniform(
            rng, (batch_size, 224, 224, 3), jnp.float32
        ),
        "label": jax.random.randint(
            rng, (batch_size,), 0, 200, dtype=jnp.int32
        ),
    }
    gate = jnp.float32(1.0)
    try:
        step, wstate = compile_train_step_auto(
            model, PP, optim_cfg, state, batch, rng
        )
        wstate, m = step(wstate, batch, rng, gate)  # validate by EXECUTION
        np.asarray(m["loss"])
        mode = "auto"
    except Exception:
        step = make_train_step(model, PP, optim_cfg)
        wstate = state
        wstate, m = step(wstate, batch, rng, gate)
        np.asarray(m["loss"])
        mode = "default"
    return step, wstate, batch, rng, gate, batch_size, mode


def time_once(built):
    step, state, batch, rng, gate, bs, _ = built
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = step(state, batch, rng, gate)
    np.asarray(m["loss"])
    dt = time.perf_counter() - t0
    built[1] = state  # carry the updated state across reps
    return dt / ITERS * 1e3, bs * ITERS / dt


def main():
    specs = sys.argv[1:] or ["256"]
    built = []
    for s in specs:
        parts = s.split(":")
        bs = int(parts[0])
        overrides = {}
        if len(parts) > 1 and parts[1]:
            for kv in parts[1].split(","):
                k, v = kv.split("=")
                overrides[k] = v
        b = list(build(bs, **overrides))
        built.append((s, b))
        print(f"built {s} (layouts={b[6]})", flush=True)
    best = {s: (1e9, 0.0) for s, _ in built}
    for rep in range(3):
        for s, b in built:
            ms, rate = time_once(b)
            if ms < best[s][0]:
                best[s] = (ms, rate)
            print(f"rep{rep} {s:22s} {ms:7.2f} ms/step {rate:8.0f} img/s",
                  flush=True)
    print("--- min-of-3 ---")
    for s, _ in built:
        ms, rate = best[s]
        print(f"{s:22s} {ms:7.2f} ms/step {rate:8.0f} img/s")


if __name__ == "__main__":
    main()
