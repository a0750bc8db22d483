"""Prototype-activation visualization CLI.

Mirrors the reference's main_visualize.py surface (ref: main_visualize.py:
133-214 args; scripts/visualize.sh): load a trained PPNet checkpoint, pick
classes, write heatmap overlays / bboxes / discard masks (and optional
Gaussian 3-D surfaces) under --output_dir.
"""

from __future__ import annotations

import argparse

import numpy as np


def get_args():
    p = argparse.ArgumentParser("ProtoPFormer-TPU visualization")
    p.add_argument("--base_architecture", type=str,
                   default="deit_tiny_patch16_224")
    p.add_argument("--data_set", default="CUB2011U")
    p.add_argument("--data_path", type=str, default="datasets/cub200_cropped")
    p.add_argument("--prototype_shape", nargs="+", type=int,
                   default=[2000, 192, 1, 1])
    p.add_argument("--reserve_layers", nargs="+", type=int, default=[11])
    p.add_argument("--reserve_token_nums", nargs="+", type=int, default=[81])
    p.add_argument("--global_proto_per_class", type=int, default=10)
    p.add_argument("--use_global", default=True)
    p.add_argument("--resume", type=str, required=True,
                   help="orbax params dir (checkpoint.manager.save_params)")
    p.add_argument("--output_dir", type=str, default="vis")
    p.add_argument("--vis_classes", nargs="+", type=int,
                   default=list(range(10)))
    p.add_argument("--imgs_per_class", type=int, default=20)
    p.add_argument("--use_gauss", action="store_true")
    p.add_argument("--use_train_imgs", action="store_true",
                   help="visualize over the TRAIN split (the reference "
                        "hardcodes use_train_imgs=False at "
                        "main_visualize.py:297; exposed here as a flag "
                        "with the same default)")
    p.add_argument("--visual_type", type=str, default="heatmap",
                   choices=["heatmap", "slim_gaussian"],
                   help="reference default 'heatmap' writes only the "
                        "optional Gaussian figures; 'slim_gaussian' writes "
                        "the full overlay/bbox/mask set "
                        "(ref: main_visualize.py:143,440)")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--seed", type=int, default=1028)
    return p.parse_args()


def main():
    args = get_args()
    import jax
    import jax.numpy as jnp

    from protopformer_tpu.checkpoint.manager import load_params
    from protopformer_tpu.core.config import PPNetConfig, backbone_preset
    from protopformer_tpu.data import (
        HostDataLoader,
        build_dataset_index,
        build_eval_transform,
        build_view_transform,
    )
    from protopformer_tpu.data.datasets import NUM_CLASSES
    from protopformer_tpu.models import construct_ppnet
    from protopformer_tpu.tools.visualize import (
        VisualizationConfig,
        visualize_prototypes,
    )
    from protopformer_tpu.utils import set_seed

    set_seed(args.seed)
    backbone = backbone_preset(args.base_architecture, drop_path_rate=0.0)
    ppnet_cfg = PPNetConfig(
        prototype_shape=tuple(args.prototype_shape),
        num_classes=NUM_CLASSES.get(args.data_set, 200),
        reserve_layers=tuple(args.reserve_layers),
        reserve_token_nums=tuple(args.reserve_token_nums),
        use_global=bool(args.use_global),
        global_proto_per_class=args.global_proto_per_class,
    )
    model = construct_ppnet(backbone, ppnet_cfg)
    template = model.init(
        jax.random.key(0), jnp.zeros((1, backbone.img_size, backbone.img_size, 3))
    )["params"]
    params = load_params(args.resume, template)

    # paired normalized + raw-view loaders (ref: main_visualize.py:223-267;
    # split switch ref: :297-299)
    index = build_dataset_index(
        args.data_set, args.data_path, train=args.use_train_imgs
    )
    eval_tf = build_eval_transform(backbone.img_size)
    view_tf = build_view_transform(backbone.img_size)
    loader = HostDataLoader(index, eval_tf, args.batch_size, shuffle=False,
                            num_workers=8)

    def pairs():
        view_loader = HostDataLoader(
            index, lambda im, rng: view_tf(im).astype(np.float32),
            args.batch_size, shuffle=False, num_workers=8,
        )
        for batch, vbatch in zip(loader, view_loader):
            yield batch, vbatch["image"].astype(np.uint8)

    vis_cfg = VisualizationConfig(
        output_dir=args.output_dir,
        vis_classes=args.vis_classes,
        imgs_per_class=args.imgs_per_class,
        use_gauss=args.use_gauss,
        visual_type=args.visual_type,
    )
    written = visualize_prototypes(
        model, params, pairs(), ppnet_cfg, vis_cfg,
        patch_size=backbone.patch_size,
    )
    print(f"wrote {len(written)} files under {args.output_dir}")


if __name__ == "__main__":
    main()
