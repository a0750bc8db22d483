"""Consistency-score eval at BASELINE scale on synthetic CUB-shaped data.

BASELINE config #5 asks for the full CUB test sweep (5,794 images) at
bs=256; no CUB data exists in this environment, so this drives the REAL
pipeline (tools/eval_interpretability.py::consistency_score — jitted
push_forward + pipelined host box/part matching) over a synthetic fixture
with exactly the CUB test-set shape: 5,794 images, 200 classes, 15
annotated parts with per-image random visibility, 500x375 originals.

Reported (docs/DESIGN.md):
  * end-to-end wall time + img/s for the full sweep;
  * device-only wall time (same batches, dispatch + fetch, no host
    matching) — the difference over the pipelined run is the device idle
    fraction attributable to the host half.

Run (real TPU, ~3 min incl. compile):
    python scripts/consistency_at_scale.py [n_images] [bs]
"""

import os
import sys
import time

# NOT via PYTHONPATH: overriding it wholesale unregisters the axon TPU
# plugin (sitecustomize on /root/.axon_site — docs/DESIGN.md pitfalls)
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np
import jax
import jax.numpy as jnp

from protopformer_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from protopformer_tpu.core.config import PPNetConfig, backbone_preset
from protopformer_tpu.data.local_parts import CubPartAnnotations
from protopformer_tpu.data.preprocess import normalize_images
from protopformer_tpu.models import construct_ppnet
from protopformer_tpu.tools.eval_interpretability import (
    ConsistencyConfig,
    consistency_score,
)

N_IMAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 5794
BS = int(sys.argv[2]) if len(sys.argv) > 2 else 256
W, H = 500, 375


def synthetic_fixture(rng):
    labels = rng.integers(0, 200, N_IMAGES).astype(np.int32)
    id_to_part_loc = {}
    for i in range(N_IMAGES):
        visible = rng.uniform(size=15) < 0.7
        id_to_part_loc[i + 1] = [
            (p + 1, int(rng.integers(0, W)), int(rng.integers(0, H)))
            for p in range(15) if visible[p]
        ]
    ann = CubPartAnnotations(
        id_to_path={i + 1: f"synthetic/{i + 1}.jpg" for i in range(N_IMAGES)},
        id_to_bbox={i + 1: (0.0, 0.0, W, H) for i in range(N_IMAGES)},
        id_to_part_loc=id_to_part_loc,
    )
    sizes = {i + 1: (W, H) for i in range(N_IMAGES)}
    ids = np.arange(1, N_IMAGES + 1, dtype=np.int64)
    return labels, ann, sizes, ids


def batches(labels, rng):
    """CUB-shaped [0,1] float batches, final batch zero-padded + masked."""
    for s in range(0, N_IMAGES, BS):
        n = min(BS, N_IMAGES - s)
        img = rng.uniform(size=(BS, 224, 224, 3)).astype(np.float32)
        lab = np.zeros(BS, np.int32)
        lab[:n] = labels[s:s + n]
        valid = np.zeros(BS, np.float32)
        valid[:n] = 1
        pos = np.minimum(np.arange(s, s + BS), N_IMAGES - 1)
        yield {"image": img, "label": lab, "valid": valid, "position": pos}


def main():
    rng = np.random.default_rng(1028)
    labels, ann, sizes, ids = synthetic_fixture(rng)

    backbone = backbone_preset("deit_tiny_patch16_224")
    pp = PPNetConfig(
        prototype_shape=(2000, 192, 1, 1), num_classes=200,
        reserve_layers=(11,), reserve_token_nums=(81,),
        use_global=True, global_proto_per_class=10,
    )
    model = construct_ppnet(backbone, pp, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))[
        "params"
    ]

    # pre-generate the batches once so both timed runs see identical data
    data = list(batches(labels, np.random.default_rng(7)))
    print(f"{N_IMAGES} images, {len(data)} batches of {BS}", flush=True)

    # ---- device-only floor: dispatch + fetch the (gathered) outputs,
    # no host matching (same jitted program consistency_score builds)
    ppc = pp.num_prototypes_per_class

    def _push(p, im, lab):
        out = model.apply(
            {"params": p}, normalize_images(im),
            method=lambda m, x: m.push_forward(x),
        )
        idx = lab[:, None] * ppc + jnp.arange(ppc)[None, :]
        sel = jnp.take_along_axis(
            out.proto_acts, idx[:, :, None, None], axis=1
        )
        return out.cls_token_attn, sel

    push = jax.jit(_push)
    o = push(params, data[0]["image"], data[0]["label"])
    np.asarray(o[1])  # compile + warm
    t0 = time.perf_counter()
    inflight = None
    for b in data:
        out = push(params, b["image"], b["label"])
        if inflight is not None:
            np.asarray(inflight[0]), np.asarray(inflight[1])
        inflight = out
    np.asarray(inflight[0]), np.asarray(inflight[1])
    dev_wall = time.perf_counter() - t0
    print(
        f"device-only: {dev_wall:.2f} s "
        f"({N_IMAGES / dev_wall:.0f} img/s)", flush=True
    )

    # ---- full pipelined eval
    t0 = time.perf_counter()
    score = consistency_score(
        model, params, iter(data), ann, ids, sizes, pp,
        ConsistencyConfig(), host_workers=8,
    )
    wall = time.perf_counter() - t0
    idle = max(0.0, wall - dev_wall) / wall
    print(
        f"full eval: {wall:.2f} s ({N_IMAGES / wall:.0f} img/s), "
        f"score={score:.2f} (synthetic data — the score itself is "
        f"meaningless), host-attributable idle fraction={idle:.1%}",
        flush=True,
    )


if __name__ == "__main__":
    main()
