"""Training/eval CLI — flag-compatible with the reference's main.py.

Usage mirrors the reference (ref: main.py:34-206 argparse surface;
scripts/train_cub.sh presets):

    python main_train.py --base_architecture=deit_tiny_patch16_224 \
        --data_set=CUB2011U --data_path=datasets \
        --prototype_shape 2000 192 1 1 --reserve_layers 11 \
        --reserve_token_nums 81 --use_global=True --use_ppc_loss=True ...

Orchestration (ref: main.py:252-483): seed, mesh setup, data, model,
optimizer, schedule, [resume], epoch loop with eval + checkpointing.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def str2bool(v) -> bool:
    """Shell-friendly boolean flags (ref: tools/utils.py:26-32)."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("boolean value expected")


def get_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        "ProtoPFormer-TPU training and evaluation", add_help=False
    )
    # ProtoPFormer block (ref: main.py:44-73)
    p.add_argument("--base_architecture", type=str,
                   default="deit_tiny_patch16_224")
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--prototype_shape", nargs="+", type=int,
                   default=[2000, 192, 1, 1])
    p.add_argument("--prototype_activation_function", type=str, default="log")
    p.add_argument("--add_on_layers_type", type=str, default="regular")
    p.add_argument("--reserve_layers", nargs="+", type=int, default=[11])
    p.add_argument("--reserve_token_nums", nargs="+", type=int, default=[81])
    p.add_argument("--use_global", type=str2bool, default=True)
    p.add_argument("--use_ppc_loss", type=str2bool, default=False)
    p.add_argument("--ppc_cov_thresh", type=float, default=1.0)
    p.add_argument("--ppc_mean_thresh", type=float, default=2.0)
    p.add_argument("--global_coe", type=float, default=0.5)
    p.add_argument("--global_proto_per_class", type=int, default=5)
    p.add_argument("--ppc_cov_coe", type=float, default=0.1)
    p.add_argument("--ppc_mean_coe", type=float, default=0.5)
    # LRs (ref: main.py:64-67)
    p.add_argument("--features_lr", type=float, default=1e-4)
    p.add_argument("--add_on_layers_lr", type=float, default=3e-3)
    p.add_argument("--prototype_vectors_lr", type=float, default=3e-3)
    # model/EMA (ref: main.py:75-90)
    p.add_argument("--model", type=str, default="deit_tiny_patch16_224")
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--save_ep_freq", type=int, default=400)
    p.add_argument("--drop", type=float, default=0.0)
    p.add_argument("--drop_path", type=float, default=0.1)
    p.add_argument("--model_ema", type=str2bool, default=True)
    p.add_argument("--model_ema_decay", type=float, default=0.99996)
    # optimizer (ref: main.py:92-104)
    p.add_argument("--opt", type=str, default="adamw")
    p.add_argument("--opt-eps", dest="opt_eps", type=float, default=1e-8)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--clip_grad", type=float, default=None)
    # schedule (ref: main.py:105-130)
    p.add_argument("--sched", type=str, default="cosine")
    p.add_argument("--warmup-lr", dest="warmup_lr", type=float, default=1e-6)
    p.add_argument("--min-lr", dest="min_lr", type=float, default=1e-5)
    p.add_argument("--warmup-epochs", dest="warmup_epochs", type=int, default=5)
    p.add_argument("--decay-epochs", dest="decay_epochs", type=float, default=30)
    p.add_argument("--decay-rate", "--dr", dest="decay_rate", type=float,
                   default=0.1)
    p.add_argument("--cooldown-epochs", dest="cooldown_epochs", type=int,
                   default=10)
    # timm schedule noise (ref: main.py:110-114; unused by the presets)
    p.add_argument("--lr-noise", dest="lr_noise", type=float, nargs="+",
                   default=None)
    p.add_argument("--lr-noise-pct", dest="lr_noise_pct", type=float,
                   default=0.67)
    p.add_argument("--lr-noise-std", dest="lr_noise_std", type=float,
                   default=1.0)
    # augmentation (ref: main.py:132-171)
    p.add_argument("--color-jitter", dest="color_jitter", type=float,
                   default=0.4)
    p.add_argument("--aa", type=str, default="rand-m9-mstd0.5-inc1")
    p.add_argument("--smoothing", type=float, default=0.0)
    p.add_argument("--enable_smoothing", type=str2bool, default=False)
    p.add_argument("--train-interpolation", dest="train_interpolation",
                   type=str, default="bicubic")
    p.add_argument("--reprob", type=float, default=0.25)
    p.add_argument("--remode", type=str, default="pixel")
    p.add_argument("--recount", type=int, default=1)
    p.add_argument("--mixup", type=float, default=0.0)
    p.add_argument("--cutmix", type=float, default=1.0)
    p.add_argument("--mixup-prob", dest="mixup_prob", type=float, default=1.0)
    p.add_argument("--mixup-switch-prob", dest="mixup_switch_prob",
                   type=float, default=0.5)
    p.add_argument("--enable_mixup", type=str2bool, default=False)
    # data / run (ref: main.py:173-206)
    p.add_argument("--finetune", default="",
                   help="accepted for flag parity; DEAD in the reference "
                        "too (parsed at main.py:173, its only use is "
                        "commented out at :427) — use --pretrained_ckpt "
                        "for backbone weights or --resume for full state")
    p.add_argument("--dist_eval", type=str2bool, default=False,
                   help="accepted for flag parity (ref: main.py:289-297 "
                        "shards val across ranks, with a padding-bias "
                        "warning); this build always evaluates the exact "
                        "full set, sharded over the mesh with a validity "
                        "mask, so the flag is a no-op")
    p.add_argument("--data_set", default="CUB2011U")
    p.add_argument("--data_path", type=str,
                   default="./datasets/cub200_cropped/")
    p.add_argument("--output_dir", default="output/")
    p.add_argument("--seed", default=1028, type=int)
    p.add_argument("--resume", default="")
    p.add_argument("--start_epoch", default=0, type=int)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--eval_ema", action="store_true",
                   help="evaluate the EMA weights instead of the live ones")
    p.add_argument("--num_workers", default=10, type=int)
    p.add_argument("--pretrained_ckpt", default="",
                   help="backbone weights to convert+load: a .pth path, an "
                        "http(s):// URL, or a registered architecture name "
                        "(e.g. deit_tiny_patch16_224 — fetches the stock "
                        "FB weights into the cache like the reference's "
                        "pretrained=True; ref: tools/deit_features.py:10-62)")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--native_decode", type=str2bool, default=False,
                   help="decode+resize eval JPEGs with the native C++ "
                        "pipeline (native/image_pipeline.cpp); per-sample "
                        "PIL fallback for non-JPEG files")
    return p


def config_from_args(args) -> "ExperimentConfig":
    from protopformer_tpu.core.config import (
        DataConfig,
        ExperimentConfig,
        OptimConfig,
        PPNetConfig,
        TrainConfig,
        backbone_preset,
    )
    from protopformer_tpu.data.datasets import NUM_CLASSES

    backbone = backbone_preset(
        args.base_architecture,
        img_size=args.img_size,
        drop_rate=args.drop,
        drop_path_rate=args.drop_path,
    )
    num_classes = NUM_CLASSES.get(args.data_set, 200)
    ppnet = PPNetConfig(
        prototype_shape=tuple(args.prototype_shape),
        num_classes=num_classes,
        reserve_layers=tuple(args.reserve_layers),
        reserve_token_nums=tuple(args.reserve_token_nums),
        use_global=args.use_global,
        use_ppc_loss=args.use_ppc_loss,
        ppc_cov_thresh=args.ppc_cov_thresh,
        ppc_mean_thresh=args.ppc_mean_thresh,
        global_coe=args.global_coe,
        global_proto_per_class=args.global_proto_per_class,
        prototype_activation_function=args.prototype_activation_function,
        add_on_layers_type=args.add_on_layers_type,
        ppc_cov_coe=args.ppc_cov_coe,
        ppc_mean_coe=args.ppc_mean_coe,
    )
    optim = OptimConfig(
        opt=args.opt,
        opt_eps=args.opt_eps,
        momentum=args.momentum,
        weight_decay=args.weight_decay,
        clip_grad=args.clip_grad,
        features_lr=args.features_lr,
        add_on_layers_lr=args.add_on_layers_lr,
        prototype_vectors_lr=args.prototype_vectors_lr,
        sched=args.sched,
        epochs=args.epochs,
        warmup_epochs=args.warmup_epochs,
        warmup_lr=args.warmup_lr,
        min_lr=args.min_lr,
        decay_epochs=args.decay_epochs,
        decay_rate=args.decay_rate,
        cooldown_epochs=args.cooldown_epochs,
        model_ema=args.model_ema,
        model_ema_decay=args.model_ema_decay,
        lr_noise=None if args.lr_noise is None else tuple(args.lr_noise),
        lr_noise_pct=args.lr_noise_pct,
        lr_noise_std=args.lr_noise_std,
        noise_seed=args.seed,
    )
    data = DataConfig(
        data_set=args.data_set,
        data_path=args.data_path,
        input_size=args.input_size,
        batch_size=args.batch_size,
        color_jitter=args.color_jitter,
        aa=args.aa,
        smoothing=args.smoothing,
        enable_smoothing=args.enable_smoothing,
        reprob=args.reprob,
        mixup=args.mixup,
        cutmix=args.cutmix,
        enable_mixup=args.enable_mixup,
        num_workers=args.num_workers,
    )
    train = TrainConfig(
        seed=args.seed,
        output_dir=args.output_dir,
        resume=args.resume,
        start_epoch=args.start_epoch,
        eval_only=args.eval,
        save_ep_freq=args.save_ep_freq,
        compute_dtype=args.compute_dtype,
    )
    return ExperimentConfig(
        backbone=backbone, ppnet=ppnet, optim=optim, data=data, train=train
    )


def main(args) -> dict:
    from protopformer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from protopformer_tpu.checkpoint.manager import CheckpointManager
    from protopformer_tpu.checkpoint.torch_convert import (
        load_pretrained_backbone,
    )
    from protopformer_tpu.data import (
        HostDataLoader,
        build_dataset_index,
        build_eval_transform,
        build_train_transform,
    )
    from protopformer_tpu.models import construct_ppnet
    from protopformer_tpu.parallel import make_mesh
    from protopformer_tpu.train import (
        create_train_state,
        make_eval_step,
        make_optimizer,
        make_train_step,
    )
    from protopformer_tpu.train.loop import evaluate, train_one_epoch
    from protopformer_tpu.utils import MetricWriter, get_logger, set_seed

    cfg = config_from_args(args)
    # fail fast on an unusable --resume before minutes of init/compile
    if cfg.train.resume and cfg.train.resume not in ("latest", "true", "1") \
            and not cfg.train.resume.startswith(("http://", "https://")) \
            and not os.path.isdir(cfg.train.resume) \
            and not os.path.isfile(cfg.train.resume):
        raise FileNotFoundError(
            f"--resume={cfg.train.resume!r} is not a checkpoint directory, "
            f".pth file, or URL (expected an Orbax root, a <root>/<epoch> "
            f"step dir, a torch checkpoint, or http(s)://)"
        )
    out_dir = cfg.train.output_dir
    logger = get_logger("train", os.path.join(out_dir, "train-logs"))
    writer = MetricWriter(out_dir)
    rng = set_seed(cfg.train.seed)
    mesh = make_mesh()
    logger.info(f"devices: {jax.devices()}  mesh: {mesh}")

    compute_dtype = (
        jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
    )
    model = construct_ppnet(cfg.backbone, cfg.ppnet, compute_dtype)

    # data
    train_index = build_dataset_index(cfg.data.data_set, cfg.data.data_path,
                                      train=True)
    val_index = build_dataset_index(cfg.data.data_set, cfg.data.data_path,
                                    train=False)
    img_size = cfg.backbone.img_size
    train_tf = build_train_transform(
        img_size, cfg.data.color_jitter, cfg.data.aa, cfg.data.reprob
    )
    eval_tf = build_eval_transform(img_size)
    n_dev = len(jax.devices())

    def _round_to_devices(bs: int) -> int:
        return max(n_dev, (bs // n_dev) * n_dev)

    eval_path_tf = None
    train_path_tf = None
    if args.native_decode:
        from protopformer_tpu.data import native

        if native.is_available():
            eval_path_tf = native.build_native_eval_transform(img_size)
            train_path_tf = native.build_native_train_transform(
                img_size, cfg.data.color_jitter, cfg.data.aa, cfg.data.reprob
            )
            logger.info("native C++ decode enabled for train + eval pipelines")
        else:
            logger.warning("--native_decode requested but libppf_image is "
                           "unavailable; using PIL")
    train_bs = _round_to_devices(cfg.data.batch_size)
    train_loader = HostDataLoader(
        train_index, train_tf, train_bs, shuffle=True,
        seed=cfg.train.seed, drop_last=True,
        num_workers=cfg.data.num_workers, mesh=mesh,
        path_transform=train_path_tf,
    )
    # val batch = 1.5x train batch (ref: main.py:312), device-divisible
    val_loader = HostDataLoader(
        val_index, eval_tf, _round_to_devices(int(1.5 * cfg.data.batch_size)),
        shuffle=False, seed=cfg.train.seed,
        num_workers=cfg.data.num_workers, mesh=mesh,
        path_transform=eval_path_tf,
    )
    logger.info(
        f"train: {len(train_index)} samples / val: {len(val_index)} samples"
    )

    # model init (+ pretrained backbone)
    params = model.init(
        rng, jnp.zeros((1, img_size, img_size, 3))
    )["params"]
    if args.pretrained_ckpt:
        params = dict(params)
        params["features"] = load_pretrained_backbone(
            args.pretrained_ckpt, cfg.backbone
        )
        logger.info(f"loaded pretrained backbone from {args.pretrained_ckpt}")

    steps_per_epoch = len(train_loader)
    tx = make_optimizer(cfg.optim, params, steps_per_epoch)
    state = create_train_state(params, tx, with_ema=cfg.optim.model_ema)
    from jax.sharding import NamedSharding, PartitionSpec as P

    state = jax.device_put(state, NamedSharding(mesh, P()))

    smoothing = cfg.data.smoothing if cfg.data.enable_smoothing else 0.0
    mixup = None
    if cfg.data.enable_mixup and (cfg.data.mixup > 0 or cfg.data.cutmix > 0):
        from protopformer_tpu.data import MixupCutmix

        mixup = MixupCutmix(
            mixup_alpha=cfg.data.mixup, cutmix_alpha=cfg.data.cutmix,
            prob=cfg.data.mixup_prob, switch_prob=cfg.data.mixup_switch_prob,
            label_smoothing=smoothing, num_classes=cfg.ppnet.num_classes,
        )
    train_step = make_train_step(model, cfg.ppnet, cfg.optim,
                                 smoothing=0.0 if mixup else smoothing,
                                 mixup=mixup, mesh=mesh)
    eval_step = make_eval_step(model, cfg.ppnet.use_global, mesh=mesh)

    if args.finetune:
        logger.warning(
            "--finetune is accepted for flag parity but dead in the "
            "reference (main.py:173, use commented at :427); "
            "use --pretrained_ckpt or --resume"
        )

    ckpt_mgr = CheckpointManager(os.path.join(out_dir, "checkpoints"))
    start_epoch = cfg.train.start_epoch
    if cfg.train.resume:
        # Honor the --resume value like the reference's torch.load(path)
        # (ref: main.py:393-407). Accepted forms: an Orbax checkpoint root
        # (restore latest), a specific `<root>/<epoch>` step dir, or the
        # literal "latest" for this run's own output_dir.
        resume = cfg.train.resume
        epoch_arg = None
        if resume.startswith(("http://", "https://", "file://")):
            # URL checkpoints (ref: main.py:394-396
            # torch.hub.load_state_dict_from_url): download once into the
            # shared cache, then ingest as a reference .pth below
            from protopformer_tpu.checkpoint import download_to_cache

            resume = download_to_cache(resume, progress_logger=logger)
        if os.path.isfile(resume):
            # reference-side torch checkpoint file (ref: main.py:397-407):
            # restore the MODEL via the converter; torch optimizer moments
            # do not map onto the optax tree, so optimization restarts
            import torch as _torch

            from protopformer_tpu.checkpoint.torch_convert import (
                convert_ppnet_state_dict,
            )

            try:
                # plain-tensor checkpoints load under the safe
                # weights_only path (torch >= 2.6 default)
                ckpt = _torch.load(resume, map_location="cpu",
                                   weights_only=True)
            except Exception:
                logger.warning(
                    "weights_only load failed; falling back to full "
                    "unpickling — only resume checkpoints you trust"
                )
                ckpt = _torch.load(resume, map_location="cpu",
                                   weights_only=False)
            sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
            sd = {k: v for k, v in sd.items()}
            new_params = convert_ppnet_state_dict(
                sd, cfg.backbone.arch, cfg.backbone.depth,
                depth_token_only=cfg.backbone.depth_token_only,
                use_global=cfg.ppnet.use_global,
            )
            state = state.replace(params=jax.device_put(
                new_params, jax.tree_util.tree_leaves(state.params)[0].sharding
            ))
            if isinstance(ckpt, dict) and "epoch" in ckpt:
                start_epoch = int(ckpt["epoch"]) + 1
            logger.warning(
                "resumed MODEL weights from torch checkpoint "
                f"{cfg.train.resume}; optimizer/EMA state restarts "
                "(torch moments do not map onto the optax tree)"
            )
        else:
            if os.path.isdir(resume):
                base = os.path.basename(os.path.normpath(resume))
                if base.isdigit():
                    epoch_arg = int(base)
                    resume_mgr = CheckpointManager(os.path.dirname(
                        os.path.normpath(resume)))
                else:
                    resume_mgr = CheckpointManager(resume)
            elif resume in ("latest", "true", "1"):
                resume_mgr = ckpt_mgr
            else:
                raise FileNotFoundError(
                    f"--resume={resume!r} is not a checkpoint directory, "
                    f".pth file, or URL (expected an Orbax root, a "
                    f"<root>/<epoch> step dir, a torch checkpoint, or "
                    f"http(s)://)"
                )
            state, meta = resume_mgr.restore(state, epoch=epoch_arg)
            start_epoch = int(meta.get("epoch", -1)) + 1
            logger.info(f"resumed from epoch {start_epoch - 1} ({resume})")

    if cfg.train.eval_only:
        eval_params = (
            state.ema_params
            if args.eval_ema and state.ema_params is not None
            else state.params
        )
        stats = evaluate(eval_step, eval_params, val_loader, logger,
                         cfg.ppnet.use_global)
        print(json.dumps(stats))
        return stats

    # Re-compile the train step with compiler-chosen (AUTO) layouts on the
    # loop-carried state and stage the (possibly just-restored) state in
    # them: +4.8% step throughput on v5e (train/steps.py helper docstring).
    # Same program semantics; falls back to the default-layout step on
    # backends without the layout API.
    try:
        from protopformer_tpu.train.steps import compile_train_step_auto

        example_batch = {
            "image": np.zeros((train_bs, img_size, img_size, 3), np.float32),
            "label": np.zeros((train_bs,), np.int32),
        }
        train_step, state = compile_train_step_auto(
            model, cfg.ppnet, cfg.optim, state, example_batch, rng,
            smoothing=0.0 if mixup else smoothing, mixup=mixup, mesh=mesh,
        )
    except Exception as e:  # pragma: no cover - backend-dependent
        logger.warning(f"AUTO-layout train step unavailable ({e!r}); "
                       "using default layouts")

    best_acc = 0.0
    global_iter = 0
    step_rng = jax.random.fold_in(rng, 17)
    for epoch in range(start_epoch, cfg.optim.epochs):
        t0 = time.time()
        state, train_stats, global_iter = train_one_epoch(
            train_step, state, train_loader, epoch, step_rng, cfg,
            writer, logger, global_iter,
        )
        val_stats = evaluate(eval_step, state.params, val_loader, logger,
                             cfg.ppnet.use_global)
        writer.write(epoch, {
            "epoch/train_loss": train_stats.get("loss", 0.0),
            "epoch/val_acc1": val_stats["acc1"],
            "epoch/val_acc5": val_stats["acc5"],
            "epoch/val_loss": val_stats["loss"],
            **({"epoch/val_global_acc1": val_stats["global_acc1"],
                "epoch/val_local_acc1": val_stats["local_acc1"]}
               if "global_acc1" in val_stats else {}),
        })
        periodic = (epoch + 1) % cfg.train.save_ep_freq == 0
        is_best = val_stats["acc1"] > best_acc
        if is_best:
            best_acc = val_stats["acc1"]
        if periodic or is_best:
            ckpt_mgr.save(
                epoch, state,
                {"val_acc1": val_stats["acc1"], "best": is_best},
            )
        logger.info(
            f"epoch {epoch} done in {time.time() - t0:.1f}s "
            f"acc1={val_stats['acc1']:.3f} best={best_acc:.3f}"
        )
    writer.close()
    return {"best_acc1": best_acc}


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        "ProtoPFormer-TPU", parents=[get_args_parser()]
    )
    main(parser.parse_args())
