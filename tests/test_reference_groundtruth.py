"""Ground-truth parity: the ACTUAL reference code vs this repo.

Every other parity test compares against a builder-written torch oracle
(tests/oracle_deit.py, oracle_cait.py). These tests close the remaining
gap: they import the real ``/root/reference`` modules (via
tests/reference_loader.py — CPU shims only, zero math changes), build the
real ``PPNet`` at production scale (DeiT-Ti@224 / CaiT-XXS24@224, 2000
prototypes, reserve 81), convert its seeded ``state_dict()`` with the
repo's checkpoint converter, and assert output parity on the same inputs:

  * eval forward   — (logits, cls_token_attn, distances, logits_global,
                      logits_local)  (ref: protopformer.py:290-301)
  * train forward  — (logits, total_proto_act, cls_attn_rollout)
                      (ref: protopformer.py:304-335)
  * get_PPC_loss   — cov + mean losses (ref: protopformer.py:259-288)
  * push_forward   — (cls_token_attn, proto_acts) (ref: protopformer.py:337-344)

A shared misreading of the reference (softmax_with_policy, rollout
discard, PPC covariance) would pass the oracle tests but fail here.

Tolerances: rollout scores use atol=5e-5 (not the oracle tests' 1e-5) —
the real reference's 11-layer rollout matmul chain runs in a different
torch-CPU reduction order than the oracle's, compounding ~1.7e-5 of fp32
noise on identical math; the top-81 SELECTION is asserted set-identical,
which is the contract that matters.

Train-mode determinism: the factory hardcodes drop_path=0.1
(tools/deit_features.py:65); drop_prob is zeroed on every DropPath module
after construction so both sides' train forwards are deterministic
(all other drop rates default to 0).
"""

import numpy as np
import pytest
import torch

from tests.reference_loader import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not present"
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from protopformer_tpu.checkpoint import convert_ppnet_state_dict  # noqa: E402
from protopformer_tpu.core.config import PPNetConfig, backbone_preset  # noqa: E402
from protopformer_tpu.models import construct_ppnet  # noqa: E402
from protopformer_tpu.ops.ppc import ppc_loss  # noqa: E402

B = 2
PP_KW = dict(
    prototype_shape=[2000, 192, 1, 1], num_classes=200, use_global=True,
    use_ppc_loss=True, ppc_cov_thresh=1.0, ppc_mean_thresh=2.0,
    global_coe=0.5, global_proto_per_class=10,
    prototype_activation_function="log", add_on_layers_type="regular",
)
# production prune points (scripts/train_cub.sh:47-56): deit prunes at
# block 11; cait's policy gates class-attention block 1
ARCH = {
    "deit": ("deit_tiny_patch16_224", [11], 12),
    "cait": ("cait_xxs24_224", [1], 24),
}


def _zero_drop_path(net):
    for m in net.modules():
        if hasattr(m, "drop_prob"):
            m.drop_prob = 0.0


def _build_pair(arch):
    """(reference PPNet, repo model, repo params) from one seeded state."""
    ppf = load_reference()
    preset, reserve_layers, depth = ARCH[arch]
    torch.manual_seed(1028)
    ref = ppf.construct_PPNet(
        preset, pretrained=False, img_size=224,
        reserve_layers=reserve_layers, reserve_token_nums=[81], **PP_KW,
    )
    _zero_drop_path(ref)
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_ppnet_state_dict(sd, arch=arch, depth=depth)

    bk = backbone_preset(preset, drop_path_rate=0.0)
    pp = PPNetConfig(
        prototype_shape=(2000, 192, 1, 1), num_classes=200,
        reserve_layers=tuple(reserve_layers), reserve_token_nums=(81,),
        use_global=True, use_ppc_loss=True, ppc_cov_thresh=1.0,
        ppc_mean_thresh=2.0, global_coe=0.5, global_proto_per_class=10,
    )
    return ref, construct_ppnet(bk, pp), params


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(11)
    return rng.normal(size=(B, 3, 224, 224)).astype(np.float32)


@pytest.fixture(scope="module", params=["deit", "cait"])
def pair(request, batch):
    """(arch, ref outputs dict, repo outputs dict) — one forward each."""
    arch = request.param
    ref, model, params = _build_pair(arch)
    x_t = torch.from_numpy(batch)
    x_j = jnp.asarray(batch.transpose(0, 2, 3, 1))

    out = {}
    with torch.no_grad():
        logits, aux = ref(x_t)
        out["ref_eval"] = (logits.numpy(), *(a.numpy() for a in aux))
        ta, pa = ref.push_forward(x_t)
        out["ref_push"] = (ta.numpy(), pa.numpy())
        ref.train()
        logits, aux = ref(x_t)
        out["ref_train"] = (
            logits.numpy(), aux[2].numpy(), aux[3].numpy(), aux[4]
        )
        ref.eval()
    label = torch.from_numpy(np.asarray([3, 137], np.int64))
    cov, mean = ref.get_PPC_loss(
        torch.from_numpy(out["ref_train"][1]),
        torch.from_numpy(out["ref_train"][2]),
        out["ref_train"][3], label,
    )
    out["ref_ppc"] = (float(cov), float(mean))

    out["jax_eval"] = model.apply({"params": params}, x_j)
    out["jax_push"] = model.apply(
        {"params": params}, x_j, method=lambda m, x: m.push_forward(x)
    )
    out["jax_train"] = model.apply({"params": params}, x_j, train=True)
    jc, jm = model.apply(
        {"params": params},
        out["jax_train"].total_proto_act,
        out["jax_train"].cls_attn_rollout,
        jnp.asarray([3, 137]),
        method=lambda m, a, r, l: m.get_ppc_loss(a, r, l),
    )
    out["jax_ppc"] = (float(jc), float(jm))
    return arch, out


def test_eval_forward_groundtruth(pair):
    arch, out = pair
    logits, attn, dist, lg, ll = out["ref_eval"]
    got = out["jax_eval"]
    # identical token selection first (set equality of the final top-81)
    for b in range(B):
        want_set = set(np.argsort(-attn[b])[:81])
        got_set = set(np.argsort(-np.asarray(got.cls_token_attn)[b])[:81])
        assert want_set == got_set, f"{arch}: token selection diverged"
    np.testing.assert_allclose(
        np.asarray(got.cls_token_attn), attn, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.distances), dist, atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.logits_global), lg, atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.logits_local), ll, atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.logits), logits, atol=1e-4, rtol=1e-4
    )
    # the BASELINE 1e-4 activation-map contract, against the real reference
    got_act = np.log((np.asarray(got.distances) + 1) / (np.asarray(got.distances) + 1e-4))
    want_act = np.log((dist + 1) / (dist + 1e-4))
    np.testing.assert_allclose(got_act, want_act, atol=1e-4)


def test_train_forward_groundtruth(pair):
    arch, out = pair
    logits, proto_act, rollout, fea_len = out["ref_train"]
    got = out["jax_train"]
    assert got.original_fea_len == fea_len
    np.testing.assert_allclose(
        np.asarray(got.cls_attn_rollout), rollout, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.total_proto_act), proto_act, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(got.logits), logits, atol=1e-4,
                               rtol=1e-4)


def test_ppc_loss_groundtruth(pair):
    arch, out = pair
    (rc, rm), (jc, jm) = out["ref_ppc"], out["jax_ppc"]
    # each side's loss on its own (already parity-checked) forward outputs
    np.testing.assert_allclose(jc, rc, atol=1e-5)
    np.testing.assert_allclose(jm, rm, atol=1e-5)


def test_ppc_loss_isolated_groundtruth(pair):
    """Repo ppc_loss on the REFERENCE's own maps — isolates the PPC math
    from forward-path numerics (ref: protopformer.py:259-288)."""
    arch, out = pair
    _, proto_act, rollout, fea_len = out["ref_train"]
    Bsz, P = proto_act.shape[:2]
    jc, jm = ppc_loss(
        jnp.asarray(proto_act.reshape(Bsz, P, -1)),
        jnp.asarray(rollout),
        jnp.asarray([3, 137]),
        num_classes=200, proto_per_class=10,
        grid_size=int(round(fea_len ** 0.5)),
        cov_thresh=1.0, mean_thresh=2.0,
    )
    np.testing.assert_allclose(float(jc), out["ref_ppc"][0], atol=1e-6)
    np.testing.assert_allclose(float(jm), out["ref_ppc"][1], atol=1e-6)


def test_push_forward_groundtruth(pair):
    arch, out = pair
    ta, pa = out["ref_push"]
    got = out["jax_push"]
    np.testing.assert_allclose(np.asarray(got.cls_token_attn), ta, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(got.proto_acts), pa, atol=1e-4
    )


# --- gradient-level ground truth (VERDICT r4 #3) -------------------------
#
# Forward parity cannot catch a shared misreading of backward-relevant
# semantics: the rollout detach (ref: tools/deit_models_attn.py:225), PPC's
# gather/scatter VJP (ref: protopformer.py:268-276), and the frozen-head
# grad exclusion (ref: protopformer.py:126-131). These tests run torch
# autograd on the REAL reference modules and compare against jax.grad of
# the same loss (CE + 0.1*cov + 0.5*mean — the engine's composition,
# ref: tools/engine_proto.py:51-64) through the converter mapping.
#
# The torch gradient dict is mapped to the jax params layout by
# convert_ppnet_state_dict itself: the converter is a pure element
# permutation (transposes / reshapes / qkv splits), so it maps gradients
# exactly as it maps weights.

LABELS = np.asarray([3, 137], np.int64)


@pytest.fixture(scope="module", params=["deit", "cait"])
def grad_pair(request, batch):
    """(arch, torch-grads-as-jax-tree, frozen/nograd key lists, jax grads)."""
    arch = request.param
    _, reserve_layers, depth = ARCH[arch]
    ref, model, params = _build_pair(arch)

    # --- torch side: real reference modules, autograd ---
    ref.train()
    x_t = torch.from_numpy(batch)
    label = torch.from_numpy(LABELS)
    logits, aux = ref(x_t)
    ce = torch.nn.functional.cross_entropy(logits, label)
    cov, mean = ref.get_PPC_loss(aux[2], aux[3], aux[4], label)
    loss = ce + 0.1 * cov + 0.5 * mean
    loss.backward()
    ref_loss = float(loss.detach())

    frozen, nograd, grad_sd = [], [], {}
    for k, p in ref.named_parameters():
        if not p.requires_grad:
            frozen.append(k)
            grad_sd[k] = np.zeros(tuple(p.shape), np.float32)
        elif p.grad is None:
            nograd.append(k)
            grad_sd[k] = np.zeros(tuple(p.shape), np.float32)
        else:
            grad_sd[k] = p.grad.detach().numpy()
    want = convert_ppnet_state_dict(grad_sd, arch=arch, depth=depth)

    # --- jax side: the production loss composition on converted params ---
    x_j = jnp.asarray(batch.transpose(0, 2, 3, 1))
    labels_j = jnp.asarray(LABELS)

    from protopformer_tpu.train.steps import cross_entropy_loss

    def loss_fn(p):
        out = model.apply({"params": p}, x_j, train=True)
        ce = cross_entropy_loss(out.logits, labels_j)
        Bs, Pn = out.total_proto_act.shape[:2]
        cov, mean = ppc_loss(
            out.total_proto_act.reshape(Bs, Pn, -1),
            out.cls_attn_rollout, labels_j,
            num_classes=200, proto_per_class=10,
            grid_size=int(round(out.cls_attn_rollout.shape[-1] ** 0.5)),
            cov_thresh=1.0, mean_thresh=2.0,
        )
        return ce + 0.1 * cov + 0.5 * mean

    jax_loss, got = jax.value_and_grad(loss_fn)(params)
    return arch, want, frozen, nograd, got, float(jax_loss), ref_loss


def test_gradient_groundtruth_frozen_heads(grad_pair):
    """The reference freezes last_layer / last_layer_global
    (requires_grad=False, ref: protopformer.py:126-131); torch must report
    NO grads for exactly those (plus any genuinely unused params)."""
    arch, _, frozen, nograd, _, _, _ = grad_pair
    # 'ones' is the reference's frozen all-ones constant for the L2-conv
    # identity (ref: protopformer.py:202) — a constant, not a weight
    assert set(frozen) == {
        "ones", "last_layer.weight", "last_layer_global.weight"
    }, frozen
    # every trainable parameter of the reference receives a gradient
    assert nograd == [], f"{arch}: unexpectedly grad-less params: {nograd}"


def test_gradient_groundtruth_values(grad_pair):
    """jax.grad through the full model (backbone included) must match torch
    autograd on the real reference, per tensor, to fp32 reduction-order
    noise. A missing stop_gradient on the rollout/top-k path, or a PPC
    scatter VJP mismatch, shows up here as structural (not noise-level)
    divergence in the block 0..10 gradients."""
    arch, want, _, _, got, jax_loss, ref_loss = grad_pair
    np.testing.assert_allclose(jax_loss, ref_loss, atol=1e-4, rtol=1e-4)

    import jax.tree_util as jtu

    want_leaves = dict(jtu.tree_flatten_with_path(want)[0])
    got_leaves = dict(jtu.tree_flatten_with_path(got)[0])
    assert set(want_leaves) == set(got_leaves)
    for path in sorted(want_leaves, key=str):
        name = jtu.keystr(path)
        w = np.asarray(want_leaves[path], np.float32)
        g = np.asarray(got_leaves[path], np.float32)
        if "last_layer" in name:
            # frozen heads: torch has no grad (zero-filled above); the jax
            # grads exist but the optimizer masks them — asserted in
            # test_train.py::test_optimizer_freezes_heads_and_updates_groups
            continue
        scale = max(float(np.max(np.abs(w))), 1e-8)
        np.testing.assert_allclose(
            g, w, atol=2e-3 * scale, rtol=0,
            err_msg=f"{arch}: grad mismatch at {name}",
        )
