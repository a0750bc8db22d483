"""Capture an op-level TPU profile of the serving iteration and print the
top XLA ops by total device time.

Usage: python scripts/profile_serving.py [speed|exact] [B]

Aggregates the device-plane events of the captured .xplane.pb (xprof
wire format) over the steady-state iterations; prints ms/iter per op
(top 25) plus the total attributed time. This is the measurement loop
behind DESIGN.md's per-component tables.
"""

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tempfile
import time
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp


def build(exact: bool, B: int):
    from protopformer_tpu.core.config import PPNetConfig, backbone_preset
    from protopformer_tpu.models import construct_ppnet
    from protopformer_tpu.data.preprocess import (
        fold_normalization_into_patch_embed,
    )

    pp = PPNetConfig(
        prototype_shape=(2000, 192, 1, 1), num_classes=200,
        reserve_layers=(11,), reserve_token_nums=(81,),
        use_global=True, global_proto_per_class=10,
    )
    bb = backbone_preset(
        "deit_tiny_patch16_224",
        rollout_exact_discard=exact,
        rollout_discard_sample=1 if exact else 4,
    )
    model = construct_ppnet(bb, pp, compute_dtype=jnp.bfloat16)
    rng = jax.random.key(1028)
    params = model.init(rng, jnp.zeros((1, 224, 224, 3)))["params"]
    params = fold_normalization_into_patch_embed(params, input_scale=1 / 255.0)
    x = (
        jax.random.uniform(rng, (B, 224, 224, 3), jnp.float32) * 255.0
    ).astype(jnp.uint8)

    def step(acc, p, im):
        out = model.apply({"params": p}, im, train=False)
        return acc + out.logits.sum().astype(jnp.float32)

    # the official serving recipe: AUTO input layouts, staged operands
    from jax.experimental.layout import Format, Layout

    fwd = jax.jit(step, in_shardings=Format(Layout.AUTO))
    compiled = fwd.lower(jnp.float32(0), params, x).compile()
    _, params_f, x_f = compiled.input_formats[0]
    params = jax.tree_util.tree_map(
        lambda a, f: jax.device_put(np.asarray(a), f), params, params_f
    )
    x = jax.device_put(np.asarray(x), x_f)
    return compiled, params, x


def aggregate(xdir: str, iters: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(xdir, "**", "*.xplane.pb"), recursive=True)
    assert paths, f"no xplane under {xdir}"
    spaces = xplane_pb2.XSpace()
    spaces.ParseFromString(open(paths[0], "rb").read())
    tot = defaultdict(float)
    for plane in spaces.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            # XLA Ops line carries per-op events; 'Steps' etc. skipped
            if line.name not in ("XLA Ops", "XLA Modules") and "Ops" not in line.name:
                continue
            if "Modules" in line.name:
                continue
            for ev in line.events:
                tot[ev_meta.get(ev.metadata_id, "?")] += ev.duration_ps / 1e9
    return {k: v / iters for k, v in tot.items()}  # ms/iter


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "speed"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 160
    iters = 20
    from protopformer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    fwd, params, x = build(which == "exact", B)
    np.asarray(fwd(jnp.float32(0), params, x))  # compile

    xdir = tempfile.mkdtemp(prefix=f"prof_{which}_")
    acc = jnp.float32(0)
    t0 = time.perf_counter()
    with jax.profiler.trace(xdir):
        for _ in range(iters):
            acc = fwd(acc, params, x)
        np.asarray(acc)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"mode={which} B={B}: {dt:.2f} ms/iter wall ({B/dt*1e3:.0f} img/s)")

    per_op = aggregate(xdir, iters)
    # async *-start events span their whole in-flight window (they overlap
    # compute), so they double-count — report them separately
    sync = {k: v for k, v in per_op.items() if "-start" not in k.split(" = ")[0]}
    total = sum(sync.values())
    print(f"attributed (sync ops): {total:.2f} ms/iter over {len(sync)} ops")

    import re

    fams = defaultdict(float)
    for name, ms in sync.items():
        fam = re.sub(r"[.\d]+ =.*", "", name.lstrip("%"))
        fams[fam] += ms
    print("-- by op family --")
    for fam, ms in sorted(fams.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {ms:7.3f} ms  {100*ms/total:5.1f}%  {fam}")
    print("-- top individual sync ops --")
    for name, ms in sorted(sync.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {ms:7.3f} ms  {100*ms/total:5.1f}%  {name[:120]}")
    print(f"xplane dir: {xdir}")


if __name__ == "__main__":
    main()
