"""Benchmark: DeiT-Ti@224 PPNet inference throughput (images/sec/chip).

Runs the flagship configuration (BASELINE config #1 geometry: DeiT-Tiny/16
@224, 2000x192 prototypes, reserve 81, use_global=True) in bf16 on the
available accelerator and prints ONE JSON line.

``vs_baseline`` is the ratio to an A100 PyTorch-AMP estimate for the same
model (~5000 img/s for DeiT-Ti@224 inference — the reference publishes no
throughput numbers, BASELINE.md; the driver's north star is >=5x this).
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

A100_BASELINE_IMG_PER_SEC = 5000.0


def _measure_mode(exact: bool, batch_size: int = 160, reps: int = 3,
                  rep_iters: int = 40):
    """(best, mean) img/s for one discard mode (B=160, the measured v5e
    sweet spot), using the production serving recipe: uint8 input,
    normalization folded into the patch-embed, compiler-chosen (AUTO)
    input layouts.

    The steps are chained through a scalar accumulator so every iteration
    must execute before the final host sync — through the remote-TPU
    tunnel, block_until_ready alone under-measures (fixed ~30ms RTT, and
    independent dispatches may be elided).

    Methodology (recorded in the JSON "timing" field): ``reps``
    independent chains of ``rep_iters`` jitted steps each; one host sync
    per rep. 40-iter reps for BOTH modes — the round-3 record used 13-iter
    reps for exact mode, whose ~30ms tunnel sync was ~25% of the window
    and depressed the exact record vs the (40-iter) sweep methodology
    (ADVICE r3; docs/DESIGN.md round-4). ``best`` is the min-of-reps rate
    (the sweep's A/B methodology — excludes transient tunnel stalls);
    ``mean`` is the all-reps average (comparable to the round-2 record)."""
    from protopformer_tpu.core.config import PPNetConfig, backbone_preset
    from protopformer_tpu.models import construct_ppnet
    from protopformer_tpu.data.preprocess import (
        fold_normalization_into_patch_embed,
    )

    # speed mode (exact=False): bf16-bitspace discard threshold counted on
    # a lane-contiguous 1/8 sample of each map — the top-81 selection
    # contract vs the fp32 oracle is measurably identical to the exact
    # bisection (77-81/81 overlap, drops confined to the borderline tail —
    # tests/test_parity.py selection-contract tests pin every mode;
    # sample=8 measured +0.5% over sample=4 in two consecutive rounds with
    # an equal contract — docs/DESIGN.md round-5).
    # exact mode (exact=True): bit-exact reference-parity threshold.
    backbone = backbone_preset(
        "deit_tiny_patch16_224",
        rollout_exact_discard=exact,
        rollout_discard_sample=1 if exact else 8,
    )
    ppnet_cfg = PPNetConfig(
        prototype_shape=(2000, 192, 1, 1),
        num_classes=200,
        reserve_layers=(11,),
        reserve_token_nums=(81,),
        use_global=True,
        global_proto_per_class=10,
    )
    model = construct_ppnet(backbone, ppnet_cfg, compute_dtype=jnp.bfloat16)

    rng = jax.random.key(1028)
    params = model.init(rng, jnp.zeros((1, 224, 224, 3)))["params"]
    # host contract: raw uint8 RGB (what a JPEG decode actually produces —
    # 4x less input traffic than fp32). The /255 AND the ImageNet
    # normalization are FOLDED into the patch-embed conv (exact linear
    # algebra, data/preprocess.py): the serving program computes the
    # normalized model with zero extra passes over the batch.
    params = fold_normalization_into_patch_embed(
        params, input_scale=1.0 / 255.0
    )
    x = (
        jax.random.uniform(rng, (batch_size, 224, 224, 3), jnp.float32)
        * 255.0
    ).astype(jnp.uint8)

    def forward(acc, params, images):
        out = model.apply({"params": params}, images, train=False)
        return acc + out.logits.sum().astype(jnp.float32)

    # compiler-chosen input layouts (the ServingEngine recipe): the params
    # and the input chunk are STAGED in the layouts the program wants, so
    # the in-program u8 relayout copy and the frozen-head layout traffic
    # disappear (H2D transfers write tiled layouts for free). Layouts are
    # read from the EXECUTABLE (utils/layouts.py — compiled.input_formats
    # can lie, docs/DESIGN.md round-5) and the warm dispatch runs INSIDE
    # the guard so any residual mismatch falls back to default layouts.
    host_params = jax.tree_util.tree_map(np.asarray, params)
    host_x = np.asarray(x)
    try:
        from jax.experimental.layout import Format, Layout

        from protopformer_tpu.utils.layouts import true_input_formats

        fwd = jax.jit(forward, in_shardings=Format(Layout.AUTO))
        compiled = fwd.lower(jnp.float32(0), params, x).compile()
        _, params_f, x_f = true_input_formats(compiled)
        params = jax.tree_util.tree_map(
            lambda a, f: jax.device_put(a, f), host_params, params_f
        )
        x = jax.device_put(host_x, x_f)
        fwd = compiled
        np.asarray(fwd(jnp.float32(0), params, x))  # compile + warm
    except Exception:
        fwd = jax.jit(forward)
        params = jax.tree_util.tree_map(jnp.asarray, host_params)
        x = jnp.asarray(host_x)
        np.asarray(fwd(jnp.float32(0), params, x))  # compile + warm
    dts = []
    for _ in range(reps):
        acc = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(rep_iters):
            acc = fwd(acc, params, x)
        np.asarray(acc)
        dts.append(time.perf_counter() - t0)
    per_rep_imgs = batch_size * rep_iters
    return (per_rep_imgs / min(dts),
            per_rep_imgs * len(dts) / sum(dts))


def main(_retries: int = 4):
    from protopformer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # the remote-TPU tunnel throws transient "TPU backend error (Internal)"
    # and goes through multi-minute outages ("Unable to initialize backend")
    # — retry with backoff rather than lose the record
    try:
        img_per_sec, mean_img_per_sec = _measure_mode(exact=False)
    except Exception:
        if _retries <= 0:
            raise
        time.sleep(10 * 2 ** (4 - _retries))  # 10s..80s, ~2.5min total
        return main(_retries - 1)

    # secondary record: the bit-exact reference-parity discard mode on the
    # same serving recipe (headline stays the speed mode — the analogue of
    # the reference's own AMP eval; the exact mode is what reproduction
    # runs should use). Non-fatal: the headline must survive a tunnel
    # hiccup here.
    try:
        exact_img_per_sec, exact_mean = _measure_mode(exact=True)
    except Exception:
        exact_img_per_sec = exact_mean = None

    record = {
        "metric": "deit_tiny_ppnet_inference_throughput",
        "value": round(img_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / A100_BASELINE_IMG_PER_SEC, 3),
        # methodology marker (ADVICE r3): value = min-of-reps; the mean
        # fields are the all-reps average, comparable to the round-2 record
        "timing": "min-of-3x40iter-chained-reps",
        "mean_img_per_sec": round(mean_img_per_sec, 1),
    }
    if exact_img_per_sec is not None:
        record["exact_mode_img_per_sec"] = round(exact_img_per_sec, 1)
        record["exact_mode_vs_baseline"] = round(
            exact_img_per_sec / A100_BASELINE_IMG_PER_SEC, 3
        )
        record["exact_mode_mean_img_per_sec"] = round(exact_mean, 1)

    # driver-visible train + serving records (VERDICT r4 #2): extra fields
    # in the ONE JSON line so BENCH_r{N}.json tracks them round-over-round.
    # Each is non-fatal — the inference headline must survive a tunnel
    # hiccup in either.
    try:
        train_best, train_mean = _measure_train()
        record["train_img_per_sec"] = round(train_best, 1)
        record["train_mean_img_per_sec"] = round(train_mean, 1)
        record["train_vs_baseline"] = round(
            train_best / A100_TRAIN_BASELINE_IMG_PER_SEC, 3
        )
    except Exception:
        pass
    try:
        # 16 chunks (not the standalone probe's 64): the chunks are staged
        # over the tunnel's network H2D up front, and the driver's bench
        # window is bounded (round-3: worst case ~10 min incl. retries)
        probe = _measure_serving(n_images=2560)
        record["serving_img_per_sec"] = round(probe["img_per_sec"], 1)
        record["serving_vs_raw"] = round(
            probe["img_per_sec"] / img_per_sec, 3
        )
        record["serving_n_images"] = probe["n_images"]
    except Exception:
        pass
    print(json.dumps(record))


A100_TRAIN_BASELINE_IMG_PER_SEC = 1700.0


def _measure_train(batch_size: int = 256, reps: int = 3, rep_iters: int = 20):
    """(best, mean) img/s for the flagship training step: DeiT-Ti@224
    PPNet, B=256, PPC loss ON, bf16 compute / fp32 params, 3-group AdamW +
    EMA — the whole fwd+CE+PPC+bwd+update as ONE jitted program
    (train/steps.py).

    Timing methodology matches the inference bench: the state threads
    through the jitted step, so ``reps`` chains of ``rep_iters`` steps each
    sync once per rep; min-of-reps is the record, mean also reported.

    AUTO-layout caveat (docs/DESIGN.md round-5): after other AUTO-layout
    programs have compiled in the same process, a later AUTO program's
    ``input_formats`` can DISAGREE with the executable's true required
    layouts ("Computation was compiled for input layouts that disagree
    ..."), so the AUTO path is validated by EXECUTION — the warm step runs
    inside the guard and a failure falls back to the default-layout step
    (the pristine ``state`` is untouched: compile_train_step_auto stages a
    copy, and only the staged copy is donated)."""
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
    gate = jnp.float32(1.0)
    # AUTO layouts on the loop-carried state (+4.8% measured — the same
    # program main_train.py runs); validated by EXECUTION (see docstring),
    # default-layout fallback keeps the bench runnable regardless
    try:
        step, wstate = compile_train_step_auto(
            model, ppnet_cfg, optim_cfg, state, batch, rng
        )
        wstate, m = step(wstate, batch, rng, gate)  # compile + warm
        np.asarray(m["loss"])
    except Exception:
        step = make_train_step(model, ppnet_cfg, optim_cfg)
        wstate = state
        wstate, m = step(wstate, batch, rng, gate)
        np.asarray(m["loss"])

    dts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(rep_iters):
            wstate, m = step(wstate, batch, rng, gate)
        np.asarray(m["loss"])
        dts.append(time.perf_counter() - t0)
    per_rep_imgs = batch_size * rep_iters
    return (per_rep_imgs / min(dts),
            per_rep_imgs * len(dts) / sum(dts))


def bench_train(batch_size: int = 256, reps: int = 3, rep_iters: int = 20):
    """Training-step throughput record. Run: ``python bench.py train``.

    ``vs_baseline`` anchors to ~1700 img/s: the A100-AMP DeiT-Ti train rate
    implied by the same V100 timm measurement chain as the inference anchor
    (BASELINE.md) at the usual ~1/3 train:inference ratio (fwd+bwd ~3x fwd
    FLOPs, optimizer+EMA extra bytes). Estimate, not a measurement — no
    A100 here."""
    best, mean = _measure_train(batch_size, reps, rep_iters)
    print(json.dumps({
        "metric": "deit_tiny_ppnet_train_throughput",
        "value": round(best, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(best / A100_TRAIN_BASELINE_IMG_PER_SEC, 3),
        "timing": f"min-of-{reps}x{rep_iters}step-chained-reps",
        "mean_img_per_sec": round(mean, 1),
        "batch_size": batch_size,
    }))
    return best


def _measure_serving(n_images: int = 10240, batch_size: int = 160):
    """ServingEngine sustained-rate probe dict for a chunked device-resident
    request (VERDICT r3 #7): the engine's full pipeline — per-chunk
    dispatches with the ordering token, tail pad/unpad, on-device concat,
    one fetch — without the dev tunnel's network H2D (which binds any
    end-to-end number here but not on a real TPU host; serving.py module
    docstring)."""
    from protopformer_tpu.core.config import PPNetConfig, backbone_preset
    from protopformer_tpu.models import construct_ppnet
    from protopformer_tpu.serving import ServingEngine

    backbone = backbone_preset(
        "deit_tiny_patch16_224",
        rollout_exact_discard=False, rollout_discard_sample=8,
    )
    ppnet_cfg = PPNetConfig(
        prototype_shape=(2000, 192, 1, 1), num_classes=200,
        reserve_layers=(11,), reserve_token_nums=(81,),
        use_global=True, global_proto_per_class=10,
    )
    rng = jax.random.key(1028)
    model = construct_ppnet(backbone, ppnet_cfg, compute_dtype=jnp.bfloat16)
    params = model.init(rng, jnp.zeros((1, 224, 224, 3)))["params"]
    engine = ServingEngine(
        backbone, ppnet_cfg, params, batch_size=batch_size,
        compute_dtype=jnp.bfloat16,
    )
    return engine.throughput_probe(n_images=n_images)


def bench_serve(n_images: int = 10240, batch_size: int = 160):
    """Serving-at-rate record. Run: ``python bench.py serve``.

    ``vs_baseline`` is the ratio to the official bench.py headline path
    (same model/recipe as ``main()``): >=0.9 means the serving wrapper
    costs <=10% over the raw jitted forward."""
    probe = _measure_serving(n_images=n_images, batch_size=batch_size)
    # the raw jitted-forward rate measured the same way (official headline)
    raw, _ = _measure_mode(exact=False, batch_size=batch_size)
    print(json.dumps({
        "metric": "deit_tiny_ppnet_serving_throughput",
        "value": round(probe["img_per_sec"], 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(probe["img_per_sec"] / raw, 3),
        "best_img_per_sec": round(probe["best_img_per_sec"], 1),
        "raw_forward_img_per_sec": round(raw, 1),
        "n_images": probe["n_images"],
        "chunks": probe["chunks"],
    }))


def bench_host(n_images: int = 512, size=(500, 375), num_workers: int = 8):
    """Host data-pipeline line rate (img/s) for the PIL and native C++
    eval paths on CUB-resolution JPEGs. Run: ``python bench.py host``.
    (The device target is ~25k img/s/chip; the host must keep up across
    its worker threads — SURVEY hard part #7.)"""
    import os
    import tempfile

    from PIL import Image

    from protopformer_tpu.data import native
    from protopformer_tpu.data.datasets import DatasetIndex
    from protopformer_tpu.data.loader import HostDataLoader
    from protopformer_tpu.data.transforms import build_eval_transform

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as td:
        paths = []
        ys, xs = np.mgrid[0:size[1], 0:size[0]]
        base = np.stack([ys * 255 / size[1], xs * 255 / size[0],
                         (ys + xs) * 127 / (size[0] + size[1])], -1)
        for i in range(n_images):
            img = np.clip(base + rng.normal(0, 8, base.shape), 0, 255)
            p = os.path.join(td, f"{i}.jpg")
            Image.fromarray(img.astype(np.uint8)).save(p, "JPEG", quality=90)
            paths.append(p)
        index = DatasetIndex(paths=paths,
                             labels=np.zeros(n_images, np.int32),
                             num_classes=1)

        def rate(path_transform):
            loader = HostDataLoader(
                index, build_eval_transform(224), batch_size=64,
                shuffle=False, num_workers=num_workers,
                path_transform=path_transform,
            )
            t0 = time.perf_counter()
            n = sum(int(b["valid"].sum()) for b in loader)
            return n / (time.perf_counter() - t0)

        pil_rate = rate(None)
        nat_rate = (
            rate(native.build_native_eval_transform(224))
            if native.is_available() else 0.0
        )

        # train-path line rate: RRC/flip in C++ (native) vs full PIL; the
        # RandAug/jitter color ops run through PIL on the 224^2 crop in
        # both cases (data/native.py::build_native_train_transform)
        from protopformer_tpu.data.transforms import build_train_transform

        def train_rate(path_transform):
            loader = HostDataLoader(
                index, build_train_transform(224), batch_size=64,
                shuffle=True, num_workers=num_workers,
                path_transform=path_transform,
            )
            t0 = time.perf_counter()
            n = sum(int(b["valid"].sum()) for b in loader)
            return n / (time.perf_counter() - t0)

        pil_train_rate = train_rate(None)
        nat_train_rate = (
            train_rate(native.build_native_train_transform(224))
            if native.is_available() else 0.0
        )
    print(json.dumps({
        "metric": "host_eval_decode_line_rate",
        "value": round(nat_rate or pil_rate, 1),
        "unit": "images/sec",
        "vs_baseline": round((nat_rate or pil_rate) / max(pil_rate, 1e-9), 3),
        "pil_img_per_sec": round(pil_rate, 1),
        "native_img_per_sec": round(nat_rate, 1),
        "train_pil_img_per_sec": round(pil_train_rate, 1),
        "train_native_img_per_sec": round(nat_train_rate, 1),
    }))


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "host":
        bench_host()
    elif len(sys.argv) > 1 and sys.argv[1] == "train":
        from protopformer_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        bench_train()
    elif len(sys.argv) > 1 and sys.argv[1] == "serve":
        from protopformer_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        bench_serve()
    else:
        # outer retry: backend-INIT failures (tunnel outage) raise before
        # main()'s inner compile/run retry loop is reached
        for attempt in range(3):
            try:
                main()
                break
            except Exception:
                if attempt == 2:
                    raise
                time.sleep(60 * (attempt + 1))
