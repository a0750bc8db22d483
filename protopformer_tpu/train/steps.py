"""jit-compiled train/eval steps.

TPU-native replacement for the reference's per-batch loop body
(ref: tools/engine_proto.py:24-113,143-185): the entire forward + loss + PPC
+ backward + optimizer update + EMA + metric reduction is ONE compiled XLA
program over the data-parallel mesh. AMP autocast + GradScaler
(engine_proto.py:48,76-77) are replaced by bf16 compute / fp32 params, which
needs no loss scaling.

The PPC loss epoch gate (``epoch >= 20`` — engine_proto.py:63-64) enters as a
traced scalar ``ppc_gate`` in [0, 1] so flipping it does not recompile.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from protopformer_tpu.core.config import OptimConfig, PPNetConfig
from protopformer_tpu.data.preprocess import normalize_images
from protopformer_tpu.ops.ppc import ppc_loss
from protopformer_tpu.train.state import TrainState


def cross_entropy_loss(
    logits: jax.Array, labels: jax.Array, smoothing: float = 0.0
) -> jax.Array:
    """CE with optional label smoothing; accepts int labels or soft (mixup)
    label distributions (ref: main.py:320-334 criterion selection)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    n = logits.shape[-1]
    if labels.ndim == logits.ndim:  # soft labels
        target = labels.astype(jnp.float32)
    else:
        target = jax.nn.one_hot(labels, n, dtype=jnp.float32)
    if smoothing:
        target = target * (1.0 - smoothing) + smoothing / n
    return -jnp.mean(jnp.sum(target * logp, axis=-1))


def _hard_labels(labels: jax.Array) -> jax.Array:
    return jnp.argmax(labels, -1) if labels.ndim == 2 else labels


def make_train_step(
    model,
    ppnet_cfg: Optional[PPNetConfig],
    optim_cfg: OptimConfig,
    smoothing: float = 0.0,
    mixup=None,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    normalize: bool = True,
    jit: bool = True,
) -> Callable:
    """Build the jitted train step.

    Signature of the returned function:
      (state, batch {'image': (B,H,W,C), 'label': (B,) or (B,cls)},
       rng, ppc_gate scalar) -> (state, metrics dict)

    ``normalize``: ImageNet-normalize the batch images on device. The host
    pipeline emits raw [0,1] float RGB (data/transforms.py contract); the
    reference normalizes on the host inside every transform stack
    (ref: tools/datasets.py:333-334, tools/preprocess.py:3-17). Disable only
    for unit tests that feed pre-normalized feature-space tensors.

    ``mixup``: optional data.mixup.MixupCutmix applied on-device inside the
    step (ref wires timm Mixup in the loop body — tools/engine_proto.py:45-46).
    Mixup runs on the raw images; normalize is affine, so the order is
    equivalent to the reference's normalize-then-mix.

    With ``mesh`` given, the step is jitted with state/rng replicated and the
    batch sharded on the data axis; XLA inserts gradient all-reduces.
    """
    use_ppc = ppnet_cfg is not None and ppnet_cfg.use_ppc_loss
    ema_decay = optim_cfg.model_ema_decay if optim_cfg.model_ema else None

    def train_step(state: TrainState, batch, rng, ppc_gate):
        step_rng = jax.random.fold_in(rng, state.step)
        drop_rng, dropout_rng = jax.random.split(step_rng)
        if mixup is not None:
            mix_rng = jax.random.fold_in(step_rng, 7)
            batch = mixup(mix_rng, batch)
        images = (
            normalize_images(batch["image"]) if normalize else batch["image"]
        )

        def loss_fn(params):
            out = model.apply(
                {"params": params}, images, train=True,
                rngs={"droppath": drop_rng, "dropout": dropout_rng},
            )
            ce = cross_entropy_loss(out.logits, batch["label"], smoothing)
            metrics = {"ce_loss": ce}
            loss = ce
            if use_ppc:
                B, Pn = out.total_proto_act.shape[:2]
                cov, mean = ppc_loss(
                    out.total_proto_act.reshape(B, Pn, -1),
                    out.cls_attn_rollout,
                    _hard_labels(batch["label"]),
                    ppnet_cfg.num_classes,
                    ppnet_cfg.num_prototypes_per_class,
                    int(round(out.cls_attn_rollout.shape[-1] ** 0.5)),
                    ppnet_cfg.ppc_cov_thresh,
                    ppnet_cfg.ppc_mean_thresh,
                )
                cov = ppnet_cfg.ppc_cov_coe * cov
                mean = ppnet_cfg.ppc_mean_coe * mean
                # epoch gate as a traced multiplier (no recompile per epoch)
                loss = loss + ppc_gate * (cov + mean)
                metrics["ppc_cov_loss"] = cov
                metrics["ppc_mean_loss"] = mean
            metrics["loss"] = loss
            acc = jnp.mean(
                (jnp.argmax(out.logits, -1) == _hard_labels(batch["label"]))
                .astype(jnp.float32)
            )
            metrics["train_acc1"] = acc * 100.0
            return loss, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, ema_decay)
        return new_state, metrics

    if not jit:
        # raw step for callers that wrap it themselves (e.g. the layout
        # A/B in scripts/train_layout_ab.py jits with AUTO input formats)
        return train_step

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        train_step,
        in_shardings=(repl, {"image": data, "label": data}, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def compile_train_step_auto(
    model,
    ppnet_cfg: Optional[PPNetConfig],
    optim_cfg: OptimConfig,
    state: TrainState,
    example_batch,
    rng,
    smoothing: float = 0.0,
    mixup=None,
    mesh: Optional[Mesh] = None,
    normalize: bool = True,
):
    """Compile the train step with compiler-chosen (AUTO) layouts on the
    STATE and return ``(step, staged_state)``.

    The state is the donated, loop-carried operand — its layouts are where
    the VJP's transpose copies live (fc2/drop_path — docs/DESIGN.md round-3
    roadmap #4). Letting the compiler pick them and STAGING the state in
    those layouts measured +4.8%% train throughput on v5e
    (scripts/train_layout_ab.py; docs/DESIGN.md round-4). AUTO on inputs
    AND outputs keeps the donated state's in/out formats consistent.

    The batch keeps default layouts: host numpy arrives per step, and
    ``jax.device_put`` cannot honor the exotic tilings AUTO picks for
    large f32 inputs on every backend (measured failure on the axon
    plugin), while the in-program relayout it avoids costs the same in
    both variants.

    The returned ``step`` has the ``make_train_step`` signature
    ``(state, batch, rng, ppc_gate) -> (state, metrics)`` and stages each
    host batch itself, so it is a drop-in for ``train_one_epoch``.
    """
    from jax.experimental.layout import Format, Layout

    raw = make_train_step(
        model, ppnet_cfg, optim_cfg, smoothing=smoothing, mixup=mixup,
        normalize=normalize, jit=False,
    )
    auto = Format(Layout.AUTO)
    if mesh is None:
        in_sh = (auto, None, None, None)
        out_sh = (auto, None)
    else:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        auto = Format(Layout.AUTO, repl)
        in_sh = (auto, {"image": data, "label": data}, repl, repl)
        out_sh = (auto, repl)
    gate = jnp.float32(0.0)
    # lower against abstract state args: AUTO layouts reject concrete
    # jax.Arrays (which already carry a layout) when a sharding is attached
    state_abs = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
        state,
    )
    compiled = (
        jax.jit(raw, in_shardings=in_sh, out_shardings=out_sh,
                donate_argnums=(0,))
        .lower(state_abs, example_batch, rng, gate)
        .compile()
    )
    from protopformer_tpu.utils.layouts import true_input_formats

    # layouts read from the EXECUTABLE, not compiled.input_formats —
    # input_formats can lie (utils/layouts.py; docs/DESIGN.md round-5)
    state_f, batch_f = true_input_formats(compiled)[:2]
    # ... and still validate by EXECUTION before staging the real state:
    # the mismatch only surfaces at dispatch. The probe state is an
    # on-device ZEROS tree built directly in the AUTO formats — not a
    # device_put copy of ``state``, because device_put is a no-op alias
    # when the layout already matches and the probe's donation would
    # then delete the pristine state's buffers. A probe failure
    # propagates to the caller's default-layout fallback.
    probe_state = jax.jit(
        lambda: jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), state_abs
        ),
        out_shardings=state_f,
    )()
    probe_batch = jax.tree_util.tree_map(
        lambda a, f: jax.device_put(a, f), dict(example_batch), batch_f
    )
    _, probe_metrics = compiled(
        probe_state, probe_batch, rng, jnp.float32(0.0)
    )
    np.asarray(probe_metrics["loss"])
    # stage the real state the same way the probe state was built: an
    # identity program with the AUTO formats as OUTPUT shardings. A
    # ``jax.device_put(a, format)`` would stamp the array with the
    # (possibly lying) input_formats metadata and dispatch then rejects
    # it against the executable's true layouts (observed on the training
    # CLI: the probe passed but device_put-staged params failed); arrays
    # MATERIALIZED by an XLA program carry truthful layouts.
    staged = jax.jit(lambda s: s, out_shardings=state_f)(state)

    def step(state, batch, rng, ppc_gate):
        batch = jax.tree_util.tree_map(
            lambda a, f: jax.device_put(a, f), dict(batch), batch_f
        )
        return compiled(state, batch, rng, jnp.float32(ppc_gate))

    return step, staged


def make_eval_step(
    model,
    use_global: bool = True,
    mesh: Optional[Mesh] = None,
    normalize: bool = True,
) -> Callable:
    """Build the jitted eval step.

    Returns per-batch sums (correct counts + loss sums) so the host can
    aggregate exactly over a ragged last batch; mirrors evaluate's acc1/acc5
    + per-branch accuracy metrics (ref: tools/engine_proto.py:143-185).
    ``normalize``: on-device ImageNet normalize of the [0,1] host batch
    (ref transform contract: tools/datasets.py:322-335).
    """

    def eval_step(params, batch):
        images = (
            normalize_images(batch["image"]) if normalize else batch["image"]
        )
        out = model.apply({"params": params}, images, train=False)
        labels = batch["label"]
        valid = batch.get(
            "valid", jnp.ones(labels.shape[0], dtype=jnp.float32)
        )
        logits = out.logits.astype(jnp.float32)
        loss_per = -jnp.take_along_axis(
            jax.nn.log_softmax(logits, -1), labels[:, None], 1
        )[:, 0]

        def topk_correct(lg, k):
            _, idx = jax.lax.top_k(lg, min(k, lg.shape[-1]))
            return jnp.sum(
                jnp.any(idx == labels[:, None], axis=-1).astype(jnp.float32)
                * valid
            )

        metrics = {
            "n": jnp.sum(valid),
            "loss_sum": jnp.sum(loss_per * valid),
            "correct1": topk_correct(logits, 1),
            "correct5": topk_correct(logits, 5),
        }
        if use_global and hasattr(out, "logits_global"):
            metrics["global_correct1"] = topk_correct(
                out.logits_global.astype(jnp.float32), 1
            )
            metrics["local_correct1"] = topk_correct(
                out.logits_local.astype(jnp.float32), 1
            )
        return metrics

    if mesh is None:
        return jax.jit(eval_step)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        eval_step,
        in_shardings=(
            repl,
            {"image": data, "label": data, "valid": data},
        ),
        out_shardings=repl,
    )
