"""Worker for the true multi-process distributed test (test_multihost.py).

Run as: python tests/_mp_worker.py <process_id> <num_processes> <port> [ckpt_dir]

Each process: initializes jax.distributed (gloo CPU collectives), takes its
per-host shard of a deterministic synthetic dataset
(shard_index_for_process), assembles its LOCAL batch into the global
sharded array (assemble_global_batch), and runs ONE data-parallel train
step. With ``ckpt_dir``, it then SAVES the updated state as a multihost
Orbax checkpoint (all processes participate; Orbax gates the metadata
write on process 0 — the reference's ``save_on_master``,
tools/utils.py:242-244) and RESTORES it into the pre-step state template,
asserting the round trip reproduces the post-step state on every process.
Prints one JSON line with the metrics and its shard composition so
the parent can assert cross-process agreement and coverage.

This exercises the real process-boundary path the in-process 8-device mesh
tests cannot: per-host index sharding -> local host arrays -> global array
assembly -> XLA cross-process collectives (ref equivalent:
torch.distributed.launch + DistributedSampler + DDP, main.py:286-316).
"""

import json
import sys


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    import jax

    jax.config.update("jax_platforms", "cpu")
    # nproc==1 is the single-process EMULATION of the 2-process run: same
    # 4-device mesh, same global batch composition — its metrics are the
    # ground truth the distributed run must reproduce.
    jax.config.update("jax_num_cpu_devices", 2 if nproc > 1 else 4)
    if nproc > 1:
        jax.distributed.initialize(
            f"localhost:{port}", num_processes=nproc, process_id=pid
        )

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from protopformer_tpu.core.config import (
        BackboneConfig, OptimConfig, PPNetConfig,
    )
    from protopformer_tpu.data.datasets import build_synthetic_index
    from protopformer_tpu.models import construct_ppnet
    from protopformer_tpu.parallel import (
        assemble_global_batch,
        is_main_process,
        make_mesh,
        shard_index_for_process,
    )
    from protopformer_tpu.train import (
        create_train_state, make_optimizer, make_train_step,
    )

    index = build_synthetic_index(num_samples=16, num_classes=4,
                                  image_size=32)
    mesh = make_mesh()  # spans ALL processes' devices

    def local_slice(shard):
        # first 4 samples of a host's shard, decoded exactly like
        # HostDataLoader would (synthetic images are inline uint8)
        ids = np.arange(4)
        return {
            "image": shard.images[ids].astype(np.float32) / 255.0,
            "label": shard.labels[ids].astype(np.int32),
        }

    if nproc > 1:
        local = shard_index_for_process(index)
        batch = assemble_global_batch(local_slice(local), mesh)
    else:
        # emulate the 2-process global batch: concat both shards' slices
        from protopformer_tpu.parallel import shard_batch

        local = index
        parts = [
            local_slice(shard_index_for_process(index, p, 2))
            for p in range(2)
        ]
        batch = shard_batch({
            k: np.concatenate([p[k] for p in parts]) for k in parts[0]
        }, mesh)

    backbone = BackboneConfig(
        name="mp-test", arch="deit", img_size=32, patch_size=8,
        embed_dim=24, depth=2, num_heads=2, drop_path_rate=0.0,
    )
    ppnet_cfg = PPNetConfig(
        prototype_shape=(8, 16, 1, 1), num_classes=4,
        reserve_layers=(1,), reserve_token_nums=(9,),
        use_global=True, global_proto_per_class=2, use_ppc_loss=True,
    )
    optim_cfg = OptimConfig(epochs=2, warmup_epochs=1, model_ema=False)

    model = construct_ppnet(backbone, ppnet_cfg)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    tx = make_optimizer(optim_cfg, params, steps_per_epoch=2)
    state = jax.device_put(
        create_train_state(params, tx, with_ema=False),
        NamedSharding(mesh, P()),
    )
    train_step = make_train_step(
        model, ppnet_cfg, optim_cfg, mesh=mesh, donate=False
    )
    state2, metrics = train_step(
        state, batch, jax.random.key(1), jnp.float32(1.0)
    )
    # a parameter delta proves the (cross-process) gradient reduction ran
    delta = float(jnp.abs(
        state2.params["prototype_vectors"] - state.params["prototype_vectors"]
    ).max())

    ckpt = {}
    ckpt_dir = sys.argv[4] if len(sys.argv) > 4 else None
    if ckpt_dir:
        from protopformer_tpu.checkpoint.manager import CheckpointManager

        mgr = CheckpointManager(ckpt_dir, max_to_keep=1)
        mgr.save(0, state2, extra={"val_acc": 0.5})
        # restore into the PRE-step state (different values) so a no-op
        # restore cannot pass; every process must get the post-step values
        restored, meta = mgr.restore(state)

        def _local(x):
            return np.asarray(x.addressable_data(0))

        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(_local(a) - _local(b)).max()),
            restored.params, state2.params,
        )
        ckpt = {
            "ckpt_roundtrip_delta": max(
                jax.tree_util.tree_leaves(diffs)
            ),
            "ckpt_meta": meta,
            "ckpt_step": int(_local(restored.step)),
        }

    print(json.dumps({
        **ckpt,
        "pid": pid,
        "is_main": bool(is_main_process()),
        "n_local_devices": len(jax.local_devices()),
        "n_global_devices": len(jax.devices()),
        "global_batch": int(batch["label"].shape[0]),
        "shard_labels": local.labels.tolist(),
        "loss": float(metrics["loss"]),
        "ce_loss": float(metrics["ce_loss"]),
        "param_delta": delta,
    }))


if __name__ == "__main__":
    main()
