"""A/B: host-chained dispatches vs ONE on-device lax.fori_loop chain.

The official bench (bench.py) times ``iters`` separate dispatches of the
compiled serving step, chained through a scalar accumulator, with one
host sync at the end. Dispatches pipeline asynchronously, so in theory
the device never starves — but each execute call is still an RPC through
the remote-TPU tunnel, and any host-side dispatch jitter shows up as
device idle. This script measures the alternative: the whole 40-iter
chain as ONE jitted ``lax.fori_loop`` body (zero host involvement after
dispatch). If the fori_loop rate is materially higher, the official
methodology is under-measuring the chip; if equal, dispatch pipelining
is confirmed free and the wall-clock residual is on-device fusion
scheduling (docs/DESIGN.md round-3 floors).

LICM guard: with a loop-invariant batch, XLA hoists the ENTIRE forward
out of the fori_loop (first run measured 175k img/s — 2.2x the bf16
roofline for DeiT-Ti on v5e, i.e. 39 of 40 forwards eliminated). The
body therefore selects between TWO device-resident batches (identical
content, distinct buffers) by loop parity: the forward depends on ``i``,
so it cannot be hoisted, and the per-iter select costs only one ~24 MB
VMEM-rate copy.

Run: PYTHONPATH=.:$PYTHONPATH python scripts/scan_chain_ab.py [exact]
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
from protopformer_tpu.data.preprocess import fold_normalization_into_patch_embed

EXACT = bool(int(sys.argv[1])) if len(sys.argv) > 1 else False
B, ITERS, REPS = 160, 40, 3

PP = PPNetConfig(
    prototype_shape=(2000, 192, 1, 1), num_classes=200,
    reserve_layers=(11,), reserve_token_nums=(81,),
    use_global=True, global_proto_per_class=10,
)
bb = backbone_preset(
    "deit_tiny_patch16_224",
    rollout_exact_discard=EXACT,
    rollout_discard_sample=1 if EXACT else 4,
)
model = construct_ppnet(bb, PP, compute_dtype=jnp.bfloat16)
rng = jax.random.key(1028)
params = model.init(rng, jnp.zeros((1, 224, 224, 3)))["params"]
params = fold_normalization_into_patch_embed(params, input_scale=1.0 / 255.0)
x = (jax.random.uniform(rng, (B, 224, 224, 3), jnp.float32) * 255.0).astype(
    jnp.uint8
)


def forward(acc, p, im):
    out = model.apply({"params": p}, im, train=False)
    return acc + out.logits.sum().astype(jnp.float32)


from jax.experimental.layout import Format, Layout

fwd = jax.jit(forward, in_shardings=Format(Layout.AUTO))
compiled = fwd.lower(jnp.float32(0), params, x).compile()
_, params_f, x_f = compiled.input_formats[0]
params = jax.tree_util.tree_map(
    lambda a, f: jax.device_put(np.asarray(a), f), params, params_f
)
x = jax.device_put(np.asarray(x), x_f)
np.asarray(compiled(jnp.float32(0), params, x))  # warm

# the fori_loop variant compiles the SAME step body, iterated on device;
# inputs staged with the same AUTO formats the step program chose. Two
# identical-content batches selected by loop parity defeat LICM (module
# docstring).
x2 = jax.device_put(np.asarray(x), x_f)


def chain(acc0, p, im_a, im_b):
    def body(i, acc):
        im = jax.lax.cond(
            i % 2 == 0, lambda: im_a, lambda: im_b
        )
        return forward(acc, p, im)

    return jax.lax.fori_loop(0, ITERS, body, acc0)


chain_c = (
    jax.jit(chain)
    .lower(jnp.float32(0), params, x, x2)
    .compile()
)
np.asarray(chain_c(jnp.float32(0), params, x, x2))  # warm

rows = []
for rep in range(REPS):
    # A: host-chained dispatches
    acc = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        acc = compiled(acc, params, x)
    np.asarray(acc)
    dt_a = time.perf_counter() - t0
    # B: one on-device chain
    t0 = time.perf_counter()
    np.asarray(chain_c(jnp.float32(0), params, x, x2))
    dt_b = time.perf_counter() - t0
    rows.append((dt_a, dt_b))
    print(
        f"rep{rep}  dispatch-chain {dt_a / ITERS * 1e3:6.2f} ms/iter "
        f"({B * ITERS / dt_a:8.0f} img/s)   fori_loop "
        f"{dt_b / ITERS * 1e3:6.2f} ms/iter ({B * ITERS / dt_b:8.0f} img/s)",
        flush=True,
    )
best_a = min(r[0] for r in rows)
best_b = min(r[1] for r in rows)
print(
    f"min-of-{REPS}: dispatch {B * ITERS / best_a:.0f} img/s, "
    f"fori_loop {B * ITERS / best_b:.0f} img/s "
    f"({(best_a / best_b - 1) * 100:+.1f}%)"
)
