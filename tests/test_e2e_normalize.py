"""End-to-end image -> transform -> step -> logits contract.

Pins the full input pipeline against the torch oracle INCLUDING ImageNet
normalization (ref: tools/datasets.py:322-335 eval transform +
tools/preprocess.py:3-17 mean/std). The round-1 suite compared both sides on
the same random tensors, so a missing normalize stage was invisible; these
tests feed raw [0,1] host images to the JAX steps (which normalize on
device) and normalized tensors to the torch oracle — if either side drops
the normalize, the losses/logits diverge by ~1e0 and the test fails loudly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F
import pytest

from protopformer_tpu.core.config import BackboneConfig, OptimConfig, PPNetConfig
from protopformer_tpu.checkpoint import convert_ppnet_state_dict
from protopformer_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD
from protopformer_tpu.data.transforms import build_eval_transform
from protopformer_tpu.models import construct_ppnet
from protopformer_tpu.train import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from tests.torch_reference import RefDeiT, RefPPNet

BK = BackboneConfig(
    name="tiny-test", arch="deit", img_size=32, patch_size=8,
    embed_dim=24, depth=3, num_heads=2, drop_path_rate=0.0,
    rollout_discard_ratio=0.0,
)
PP = PPNetConfig(
    prototype_shape=(40, 16, 1, 1), num_classes=4,
    reserve_layers=(2,), reserve_token_nums=(9,),
    use_global=True, global_proto_per_class=3,
)


@pytest.fixture(scope="module")
def pipeline():
    """(jax model, converted params, torch oracle, [0,1] images, labels)."""
    from PIL import Image

    torch.manual_seed(1028)
    ref_bk = RefDeiT(img_size=32, patch_size=8, dim=24, depth=3, heads=2)
    ref = RefPPNet(
        ref_bk, num_prototypes=40, proto_dim=16, num_classes=4,
        reserve_layer_nums=((2, 9),), global_per_class=3, global_coe=0.5,
        discard_ratio=0.0,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_ppnet_state_dict(sd, arch="deit", depth=3)
    model = construct_ppnet(BK, PP)

    # raw "photos" of assorted sizes through the real eval transform
    rng = np.random.default_rng(42)
    tf = build_eval_transform(32)
    images = np.stack([
        tf(Image.fromarray(
            rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        ))
        for h, w in [(48, 40), (37, 64), (32, 32), (100, 80)]
    ])  # (4, 32, 32, 3) float32 in [0,1]
    assert images.min() >= 0.0 and images.max() <= 1.0
    labels = np.array([0, 1, 2, 3], np.int32)
    return model, params, ref, images, labels


def _torch_logits(ref, images: np.ndarray) -> torch.Tensor:
    """Oracle forward on host-normalized images (the reference's transform
    stack ends in transforms.Normalize — tools/datasets.py:333-334)."""
    x = (images - IMAGENET_MEAN) / IMAGENET_STD
    with torch.no_grad():
        logits, *_ = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    return logits


def test_eval_step_normalizes_on_device(pipeline):
    model, params, ref, images, labels = pipeline
    want_logits = _torch_logits(ref, images)
    want_loss = F.cross_entropy(
        want_logits, torch.from_numpy(labels.astype(np.int64)),
        reduction="sum",
    ).item()

    eval_step = make_eval_step(model, use_global=True)
    batch = {
        "image": images, "label": labels,
        "valid": np.ones(len(labels), np.float32),
    }
    m = eval_step(params, batch)
    np.testing.assert_allclose(float(m["loss_sum"]), want_loss, atol=1e-4)
    want_c1 = (want_logits.argmax(-1).numpy() == labels).sum()
    assert float(m["correct1"]) == want_c1


def test_missing_normalize_would_fail(pipeline):
    """The loud-failure property: skipping the normalize moves prototype
    activation maps and logits by ~0.4 (>>1e-4 parity tolerance), so the
    round-1 bug cannot reappear silently. (Loss-level CE softmax washes the
    shift out at random init, hence the activation-level check.)"""
    model, params, ref, images, labels = pipeline
    x = (images - IMAGENET_MEAN) / IMAGENET_STD
    with torch.no_grad():
        _, want_acts = ref.push_forward(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        )
    raw = model.apply(
        {"params": params}, jnp.asarray(images),  # NO normalize
        method=lambda m, x: m.push_forward(x),
    )
    got = np.asarray(raw.proto_acts).reshape(want_acts.shape)
    assert np.abs(got - want_acts.numpy()).max() > 1e-2


def test_train_step_ce_matches_oracle(pipeline):
    """The train path normalizes too: ce_loss at step 0 (drop_path=0,
    no mixup) equals the oracle's mean CE on normalized inputs."""
    model, params, ref, images, labels = pipeline
    want_logits = _torch_logits(ref, images)
    want_ce = F.cross_entropy(
        want_logits, torch.from_numpy(labels.astype(np.int64))
    ).item()

    opt = OptimConfig(epochs=4, warmup_epochs=1, model_ema=False)
    tx = make_optimizer(opt, params, steps_per_epoch=2)
    state = create_train_state(params, tx, with_ema=False)
    train_step = make_train_step(model, None, opt, donate=False)
    _, metrics = train_step(
        state, {"image": images, "label": labels},
        jax.random.key(0), jnp.float32(0.0),
    )
    np.testing.assert_allclose(float(metrics["ce_loss"]), want_ce, atol=1e-5)


def test_push_forward_tools_normalize(pipeline):
    """The offline tools' jitted push closure must normalize as well
    (ref: eval_interpretability.py:170-176 transform includes Normalize)."""
    model, params, ref, images, labels = pipeline
    x = (images - IMAGENET_MEAN) / IMAGENET_STD
    with torch.no_grad():
        want_attn, want_acts = ref.push_forward(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        )

    from protopformer_tpu.data.preprocess import normalize_images

    # the exact closure shape used by tools/visualize.py and
    # tools/eval_interpretability.py
    push = jax.jit(
        lambda p, im: model.apply(
            {"params": p}, normalize_images(im),
            method=lambda m, x: m.push_forward(x),
        )
    )
    out = push(params, images)
    np.testing.assert_allclose(
        np.asarray(out.cls_token_attn), want_attn.numpy(), atol=1e-5
    )
    got = np.asarray(out.proto_acts).reshape(want_acts.shape)
    np.testing.assert_allclose(got, want_acts.numpy(), atol=1e-4, rtol=1e-4)
