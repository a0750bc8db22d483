"""Round-3 perf sweep under the FINAL serving recipe (bench.py parity).

Each config is measured exactly the way bench.py measures the official
number: uint8 input, /255 + ImageNet normalization folded into the
patch-embed, compiler-chosen (AUTO) input layouts, chained-accumulator
timing (the remote tunnel under-measures independent dispatches).

Configs are given as ``exact:batch:sample`` specs on argv; all configs
are compiled first, then timed in INTERLEAVED reps (min-of-reps per
config) so thermal / tunnel drift hits every config equally:

    python scripts/r3_sweep.py 0:160:4 0:192:4 0:256:4   # batch sweep
    python scripts/r3_sweep.py 0:160:4 0:160:8           # sample A/B

ONE TPU job at a time — the tunnel serializes concurrent processes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from protopformer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from protopformer_tpu.core.config import PPNetConfig, backbone_preset
from protopformer_tpu.models import construct_ppnet
from protopformer_tpu.data.preprocess import fold_normalization_into_patch_embed

PP = PPNetConfig(
    prototype_shape=(2000, 192, 1, 1), num_classes=200,
    reserve_layers=(11,), reserve_token_nums=(81,),
    use_global=True, global_proto_per_class=10,
)
# CaiT prunes at class-attention block 1 (ref: scripts/train_cub.sh:53-56)
PP_CAIT = PPNetConfig(
    prototype_shape=(2000, 192, 1, 1), num_classes=200,
    reserve_layers=(1,), reserve_token_nums=(81,),
    use_global=True, global_proto_per_class=10,
)


def build(exact, batch, sample, arch="deit_tiny_patch16_224",
          **bb_overrides):
    pp = PP_CAIT if arch.startswith("cait") else PP
    bb = backbone_preset(
        arch,
        rollout_exact_discard=exact,
        rollout_discard_sample=sample,
        **bb_overrides,
    )
    model = construct_ppnet(bb, pp, compute_dtype=jnp.bfloat16)
    rng = jax.random.key(1028)
    params = model.init(rng, jnp.zeros((1, 224, 224, 3)))["params"]
    params = fold_normalization_into_patch_embed(params, input_scale=1.0 / 255.0)
    x = (
        jax.random.uniform(rng, (batch, 224, 224, 3), jnp.float32) * 255.0
    ).astype(jnp.uint8)

    def forward(acc, p, im):
        out = model.apply({"params": p}, im, train=False)
        return acc + out.logits.sum().astype(jnp.float32)

    from jax.experimental.layout import Format, Layout

    from protopformer_tpu.utils.layouts import true_input_formats

    fwd = jax.jit(forward, in_shardings=Format(Layout.AUTO))
    compiled = fwd.lower(jnp.float32(0), params, x).compile()
    # layouts from the EXECUTABLE — input_formats can lie and lie-stamped
    # arrays are silently resharded per dispatch, poisoning the timing
    # (utils/layouts.py; docs/DESIGN.md round-5)
    _, params_f, x_f = true_input_formats(compiled)
    params = jax.tree_util.tree_map(
        lambda a, f: jax.device_put(np.asarray(a), f), params, params_f
    )
    x = jax.device_put(np.asarray(x), x_f)
    np.asarray(compiled(jnp.float32(0), params, x))  # warm
    return compiled, params, x, batch


def time_once(compiled, params, x, batch, iters=40):
    acc = jnp.float32(0)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = compiled(acc, params, x)
    np.asarray(acc)
    dt = time.perf_counter() - t0
    return dt / iters * 1e3, batch * iters / dt


def main():
    specs = sys.argv[1:] or ["0:160:4"]
    built = []
    for s in specs:
        parts = s.split(":")
        exact, batch, sample = (int(v) for v in parts[:3])
        # optional 4th field: comma-separated BackboneConfig overrides,
        # e.g. 0:160:4:quantize=int8,use_pallas=on; 'arch=' selects the
        # backbone preset (cait presets use reserve layer 1)
        overrides = {}
        if len(parts) > 3 and parts[3]:
            for kv in parts[3].split(","):
                k, v = kv.split("=")
                overrides[k] = v
        built.append((s, build(bool(exact), batch, sample, **overrides)))
        print(f"built {s}", flush=True)
    best = {s: (1e9, 0.0) for s, _ in built}
    for rep in range(3):
        for s, b in built:
            ms, rate = time_once(*b)
            if ms < best[s][0]:
                best[s] = (ms, rate)
            print(f"rep{rep} {s:10s} {ms:6.2f} ms  {rate:8.0f} img/s", flush=True)
    print("--- min-of-3 ---")
    for s, _ in built:
        ms, rate = best[s]
        print(f"{s:10s} {ms:6.2f} ms  {rate:8.0f} img/s")


if __name__ == "__main__":
    main()
