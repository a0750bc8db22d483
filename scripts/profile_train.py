"""Op-level TPU profile of the full jitted train step (fwd+CE+PPC+bwd+
3-group AdamW+EMA) — the backward-attack measurement loop (VERDICT r4 #8).

Usage: python scripts/profile_train.py [B] [default|auto]

``auto`` (default) profiles the production compile_train_step_auto program
(compiler-chosen state layouts, +4.8% round-4); ``default`` profiles the
default-layout step for layout-attribution diffs. Reuses the xplane
aggregation from profile_serving.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import re
import tempfile
import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

from protopformer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from profile_serving import aggregate  # noqa: E402


def build(batch_size: int, auto: bool):
    from protopformer_tpu.core.config import (
        OptimConfig, PPNetConfig, backbone_preset,
    )
    from protopformer_tpu.models import construct_ppnet
    from protopformer_tpu.train.optimizer import make_optimizer
    from protopformer_tpu.train.state import create_train_state
    from protopformer_tpu.train.steps import (
        compile_train_step_auto, make_train_step,
    )

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
    state = create_train_state(params, tx, with_ema=optim_cfg.model_ema)
    batch = {
        "image": jax.random.uniform(
            rng, (batch_size, 224, 224, 3), jnp.float32
        ),
        "label": jax.random.randint(
            rng, (batch_size,), 0, 200, dtype=jnp.int32
        ),
    }
    if auto:
        step, state = compile_train_step_auto(
            model, ppnet_cfg, optim_cfg, state, batch, rng
        )
    else:
        step = make_train_step(model, ppnet_cfg, optim_cfg)
    return step, state, batch, rng


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    mode = sys.argv[2] if len(sys.argv) > 2 else "auto"
    iters = 10
    step, state, batch, rng = build(B, mode == "auto")
    gate = jnp.float32(1.0)
    state, m = step(state, batch, rng, gate)  # compile + warm
    np.asarray(m["loss"])

    xdir = tempfile.mkdtemp(prefix=f"prof_train_{mode}_")
    t0 = time.perf_counter()
    with jax.profiler.trace(xdir):
        for _ in range(iters):
            state, m = step(state, batch, rng, gate)
        np.asarray(m["loss"])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"train mode={mode} B={B}: {dt:.2f} ms/step wall "
          f"({B / dt * 1e3:.0f} img/s)")

    per_op = aggregate(xdir, iters)
    sync = {k: v for k, v in per_op.items()
            if "-start" not in k.split(" = ")[0]}
    total = sum(sync.values())
    print(f"attributed (sync ops): {total:.2f} ms/step over {len(sync)} ops")
    fams = defaultdict(float)
    for name, ms in sync.items():
        fam = re.sub(r"[.\d]+ =.*", "", name.lstrip("%"))
        fams[fam] += ms
    print("-- by op family --")
    for fam, ms in sorted(fams.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {ms:7.3f} ms  {100 * ms / total:5.1f}%  {fam}")
    print("-- top individual sync ops --")
    for name, ms in sorted(sync.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {ms:7.3f} ms  {100 * ms / total:5.1f}%  {name[:120]}")
    print(f"xplane dir: {xdir}")


if __name__ == "__main__":
    main()
