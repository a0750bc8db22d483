"""Export a trained TPU checkpoint as a reference-loadable torch ``.pth``.

Interop path for users of the PyTorch reference: train on TPU with
``main_train.py``, export with this tool, and keep using the reference's
own offline tooling (``main_visualize.py`` / ``eval_interpretability.py``
load ``{"model": ...}`` .pth dicts — ref: main_visualize.py:287-291,
eval_interpretability.py:154-156).

Usage (same model flags as main_train.py, plus):

    python main_export.py --base_architecture deit_tiny_patch16_224 \
        --prototype_shape 2000 192 1 1 --reserve_layers 11 \
        --reserve_token_nums 81 \
        --resume output/checkpoints --export_path export.pth [--use_ema]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from main_train import config_from_args, get_args_parser


def main(args) -> str:
    from protopformer_tpu.checkpoint import (
        export_ppnet_state_dict,
        save_torch_checkpoint,
    )
    from protopformer_tpu.checkpoint.manager import CheckpointManager
    from protopformer_tpu.core.config import OptimConfig
    from protopformer_tpu.models import construct_ppnet
    from protopformer_tpu.train import create_train_state, make_optimizer

    cfg = config_from_args(args)
    model = construct_ppnet(
        cfg.backbone, cfg.ppnet, compute_dtype=jnp.float32
    )
    params = model.init(
        jax.random.key(0),
        jnp.zeros((1, cfg.backbone.img_size, cfg.backbone.img_size, 3)),
    )["params"]
    tx = make_optimizer(OptimConfig(), params, steps_per_epoch=1)
    template = create_train_state(params, tx, with_ema=True)

    ckpt_dir = args.resume or f"{args.output_dir}/checkpoints"
    state, meta = CheckpointManager(ckpt_dir).restore(template)
    source = state.ema_params if args.use_ema else state.params
    sd = export_ppnet_state_dict(
        source,
        arch=cfg.backbone.arch,
        depth=cfg.backbone.depth,
        depth_token_only=cfg.backbone.depth_token_only,
    )
    save_torch_checkpoint(args.export_path, sd)
    print(
        f"exported epoch={meta.get('epoch')} "
        f"({'EMA' if args.use_ema else 'raw'} params, "
        f"{len(sd)} tensors) -> {args.export_path}"
    )
    return args.export_path


if __name__ == "__main__":
    parser = get_args_parser()
    parser.add_argument(
        "--export_path", default="export.pth",
        help="destination .pth (reference {'model': ...} layout)",
    )
    parser.add_argument(
        "--use_ema", action="store_true",
        help="export the EMA parameters instead of the raw ones",
    )
    main(parser.parse_args())
