"""A/B: train-step throughput with default vs compiler-chosen (AUTO) layouts.

The round-3 train-step profile attributed ~1.7 ms/step to pure layout
copies in the VJP (fc2 / drop_path transposes — docs/DESIGN.md round-3
roadmap #4). AUTO input layouts removed the analogous copies from the
serving program (the staged params arrive in the layouts the program
wants). This script measures whether the same trick moves the TRAIN
step: variant A is the production `make_train_step` (default layouts,
donated state); variant B jits the same raw step with
`Format(Layout.AUTO)` on inputs AND outputs (donation requires the
state's input/output formats to agree, which AUTO-on-both satisfies)
and stages state/batch in the compiler-chosen formats.

Run: PYTHONPATH=.:$PYTHONPATH python scripts/train_layout_ab.py [batch]
"""

import sys
import time

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
from protopformer_tpu.train.steps import make_train_step

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
REPS, ITERS = 3, 20

backbone = backbone_preset(
    "deit_tiny_patch16_224",
    rollout_exact_discard=False, rollout_discard_sample=4,
)
ppnet_cfg = PPNetConfig(
    prototype_shape=(2000, 192, 1, 1), num_classes=200,
    reserve_layers=(11,), reserve_token_nums=(81,),
    use_global=True, use_ppc_loss=True, global_proto_per_class=10,
)
optim_cfg = OptimConfig()
model = construct_ppnet(backbone, ppnet_cfg, compute_dtype=jnp.bfloat16)

rng = jax.random.key(1028)
params = model.init(rng, jnp.zeros((1, 224, 224, 3)))["params"]
tx = make_optimizer(optim_cfg, params, steps_per_epoch=100)

# the timed steps DONATE the state, which deletes its buffers — keep a
# host-side copy and rebuild fresh device arrays for every chain
host_params = jax.tree_util.tree_map(np.asarray, params)


def fresh_state():
    dev = jax.tree_util.tree_map(jnp.asarray, host_params)
    return create_train_state(dev, tx, with_ema=optim_cfg.model_ema)


batch = {
    "image": np.asarray(
        jax.random.uniform(rng, (B, 224, 224, 3), jnp.float32)
    ),
    "label": np.asarray(jax.random.randint(rng, (B,), 0, 200)),
}
# variant A's batch must be DEVICE-RESIDENT (default layouts): a host
# numpy batch re-crosses the tunnel every step (154 MB at tunnel rate =
# ~17 s/step measured — that A/B run was void)
batch_dev = jax.tree_util.tree_map(jnp.asarray, batch)
gate = jnp.float32(1.0)


# ---- A: production step (default layouts) -------------------------------
step_a = make_train_step(model, ppnet_cfg, optim_cfg)
sa = fresh_state()
sa, m = step_a(sa, batch_dev, rng, gate)  # compile + warm
np.asarray(m["loss"])

rows_a = []
for _ in range(REPS):
    state = fresh_state()
    state, m = step_a(state, batch_dev, rng, gate)  # re-warm post-donation
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = step_a(state, batch_dev, rng, gate)
    np.asarray(m["loss"])
    rows_a.append(time.perf_counter() - t0)

# ---- B: AUTO layouts on inputs and outputs ------------------------------
from jax.experimental.layout import Format, Layout

raw = make_train_step(model, ppnet_cfg, optim_cfg, jit=False)
# AUTO layouts on the STATE only (donated + loop-carried — where the VJP
# transpose copies live). The batch stays default-layout: device_put
# cannot honor the exotic tiling AUTO picks for the f32 image through
# this plugin (measured: required (1,2,3,0)/(4,128), transfer delivered
# (1,3,2,0)/(8,128) and the call raised), and a per-step image relayout
# is the same ~0.25 ms in both variants anyway.
step_b = jax.jit(
    raw,
    in_shardings=(Format(Layout.AUTO), None, None, None),
    out_shardings=(Format(Layout.AUTO), None),
    donate_argnums=(0,),
)
state0 = fresh_state()
lowered = step_b.lower(state0, batch_dev, rng, gate)
compiled = lowered.compile()
state_f = compiled.input_formats[0][0]


def stage_state():
    return jax.tree_util.tree_map(
        lambda a, f: jax.device_put(np.asarray(a), f),
        fresh_state(), state_f,
    )


batch_b = batch_dev
sb = stage_state()
sb, m = compiled(sb, batch_b, rng, gate)  # warm
np.asarray(m["loss"])

rows_b = []
for _ in range(REPS):
    state = stage_state()
    state, m = compiled(state, batch_b, rng, gate)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = compiled(state, batch_b, rng, gate)
    np.asarray(m["loss"])
    rows_b.append(time.perf_counter() - t0)

for rep, (da, db) in enumerate(zip(rows_a, rows_b)):
    print(
        f"rep{rep}  default {da / ITERS * 1e3:6.2f} ms/step "
        f"({B * ITERS / da:7.0f} img/s)   AUTO {db / ITERS * 1e3:6.2f} "
        f"ms/step ({B * ITERS / db:7.0f} img/s)",
        flush=True,
    )
best_a, best_b = min(rows_a), min(rows_b)
print(
    f"min-of-{REPS}: default {B * ITERS / best_a:.0f} img/s, "
    f"AUTO {B * ITERS / best_b:.0f} img/s "
    f"({(best_a / best_b - 1) * 100:+.1f}%)"
)
