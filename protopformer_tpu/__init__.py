"""ProtoPFormer-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of zju-vipa/ProtoPFormer.

The reference implementation (mounted read-only at /root/reference) is a
PyTorch/timm research codebase. This package is a ground-up redesign for TPU:

- Backbones (DeiT / CaiT) are Flax modules whose attention blocks feed an
  *incremental* attention-rollout accumulator (a scan-carried 197x197 product)
  instead of materializing per-block B x H x N x N attention stacks in HBM.
- The prototype head expresses the L2 "convolution" as a single MXU matmul
  (``|x|^2 - 2 x.p + |p|^2``) over token layouts, not NCHW convs.
- Training is a jit-compiled ``train_step`` over a ``jax.sharding.Mesh``
  (1-D data-parallel axis, the only parallelism the reference has — DDP in
  main.py:370) with XLA-inserted collectives instead of NCCL.
- bf16 compute / fp32 params replaces AMP + GradScaler (bf16 needs no loss
  scaling); rollout and prototype distances stay fp32 for parity.

Layout:
    core/        config dataclasses, dtype policy
    ops/         pure-JAX numeric ops (masking, rollout, distances, ppc, ...)
    models/      Flax backbones + PPNet
    kernels/     Pallas TPU kernels for the hot ops
    parallel/    mesh & sharding helpers
    train/       optimizer, schedules, train/eval steps, loop, metrics
    data/        dataset index builders, transforms, host loader
    checkpoint/  torch->JAX converter, Orbax save/restore
    tools/       visualization + interpretability eval
"""

__version__ = "0.1.0"
