"""End-to-end parity: converted torch weights -> identical JAX outputs.

The north-star parity contract (BASELINE.md): top-1 within 0.1%, prototype
activation maps within 1e-4. These tests check the stronger property that
logits and distance maps from a randomly initialized torch reference model,
converted with checkpoint.torch_convert, match the JAX model to fp32
tolerance on the same inputs.

Note on top-k ties: the rollout's 90% discard creates exact zeros; on TINY
configs (2-layer rollout over 17 tokens) the CLS scores stay sparse and
torch/jax break the zero-ties differently. At the real scale (11-layer
rollout over 197 tokens) the product densifies and scores are tie-free, so
the tiny tests run with discard disabled (its numerics are oracle-tested in
test_ops) and ``test_deit_tiny_real_scale_parity`` covers the full path at
the production shape.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from protopformer_tpu.core.config import (
    BackboneConfig, PPNetConfig, backbone_preset,
)
from protopformer_tpu.checkpoint import (
    convert_deit_state_dict,
    convert_ppnet_state_dict,
)
from protopformer_tpu.models import DeiTBackbone, construct_ppnet
from tests.torch_reference import RefDeiT, RefPPNet

torch.manual_seed(1028)

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
def batch():
    rng = np.random.default_rng(7)
    return rng.normal(size=(2, 3, 32, 32)).astype(np.float32)


def test_deit_backbone_parity(batch):
    ref = RefDeiT(img_size=32, patch_size=8, dim=24, depth=3, heads=2).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_deit_state_dict(sd, depth=3)
    model = DeiTBackbone(BK)
    x_jax = jnp.asarray(batch.transpose(0, 2, 3, 1))

    with torch.no_grad():
        t, cls_attn = ref.masked_forward(
            *ref.embed_all(torch.from_numpy(batch)), [(2, 9)], 0.0
        )
    got_t, got_attn = model.apply(
        {"params": params}, x_jax,
        method=lambda m, x: m.masked_forward(*m.embed_all(x), [(2, 9)]),
    )
    np.testing.assert_allclose(
        np.asarray(got_attn), cls_attn.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(got_t), t.numpy(), atol=1e-4)


def test_ppnet_full_parity(batch):
    ref_bk = RefDeiT(img_size=32, patch_size=8, dim=24, depth=3, heads=2)
    ref = RefPPNet(
        ref_bk, num_prototypes=40, proto_dim=16, num_classes=4,
        reserve_layer_nums=((2, 9),), global_per_class=3, global_coe=0.5,
        discard_ratio=0.0,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_ppnet_state_dict(sd, arch="deit", depth=3)

    model = construct_ppnet(BK, PP)
    init_params = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3))
    )["params"]
    init_paths = {jax.tree_util.keystr(k) for k, _ in
                  jax.tree_util.tree_flatten_with_path(init_params)[0]}
    conv_paths = {jax.tree_util.keystr(k) for k, _ in
                  jax.tree_util.tree_flatten_with_path(params)[0]}
    assert init_paths == conv_paths

    with torch.no_grad():
        w_logits, w_attn, w_dist, w_lg, w_ll = ref(torch.from_numpy(batch))

    out = model.apply(
        {"params": params}, jnp.asarray(batch.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(out.cls_token_attn), w_attn.numpy(), atol=1e-5
    )
    got_d = np.asarray(out.distances).reshape(w_dist.shape)
    np.testing.assert_allclose(got_d, w_dist.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.logits_global), w_lg.numpy(), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.logits_local), w_ll.numpy(), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.logits), w_logits.numpy(), atol=1e-4, rtol=1e-4
    )
    # activation-map parity (the BASELINE 1e-4 contract)
    got_act = np.log((got_d + 1) / (got_d + 1e-4))
    want_act = np.log((w_dist.numpy() + 1) / (w_dist.numpy() + 1e-4))
    np.testing.assert_allclose(got_act, want_act, atol=1e-4)


def test_cait_backbone_parity(batch):
    """CaiT: talking-heads SA, LayerScale, class-attention pruning
    (dense rollout; discard path covered at op level + real-scale DeiT)."""
    from protopformer_tpu.checkpoint import convert_cait_state_dict
    from protopformer_tpu.models import CaiTBackbone
    from tests.torch_reference import RefCait

    torch.manual_seed(5)
    ref = RefCait(img_size=32, patch_size=8, dim=24, depth=3, heads=2,
                  depth_token_only=2).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_cait_state_dict(sd, depth=3, depth_token_only=2)

    cfg = BackboneConfig(
        name="tiny-cait", arch="cait", img_size=32, patch_size=8,
        embed_dim=24, depth=3, num_heads=2, depth_token_only=2,
        drop_path_rate=0.0, rollout_discard_ratio=0.0,
    )
    model = CaiTBackbone(cfg)
    with torch.no_grad():
        t, cls_attn = ref.masked_forward(
            *ref.embed_all(torch.from_numpy(batch)), [(1, 9)], 0.0
        )
    got_t, got_attn = model.apply(
        {"params": params}, jnp.asarray(batch.transpose(0, 2, 3, 1)),
        method=lambda m, x: m.masked_forward(*m.embed_all(x), [(1, 9)]),
    )
    np.testing.assert_allclose(
        np.asarray(got_attn), cls_attn.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(got_t), t.numpy(), atol=1e-4)


def test_ppnet_over_cait_parity(batch):
    """Full PPNet over the CaiT backbone vs the torch oracle (Cars-style
    reserve at class-attention block 1, dense rollout)."""
    from protopformer_tpu.models import construct_ppnet as _ctor
    from tests.torch_reference import RefCait

    torch.manual_seed(9)
    ref_bk = RefCait(img_size=32, patch_size=8, dim=24, depth=3, heads=2,
                     depth_token_only=2)
    ref = RefPPNet(
        ref_bk, num_prototypes=40, proto_dim=16, num_classes=4,
        reserve_layer_nums=((1, 9),), global_per_class=3, global_coe=0.5,
        discard_ratio=0.0,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_ppnet_state_dict(
        sd, arch="cait", depth=3, depth_token_only=2
    )
    bk = BackboneConfig(
        name="tiny-cait", arch="cait", img_size=32, patch_size=8,
        embed_dim=24, depth=3, num_heads=2, depth_token_only=2,
        drop_path_rate=0.0, rollout_discard_ratio=0.0,
    )
    pp = PPNetConfig(
        prototype_shape=(40, 16, 1, 1), num_classes=4,
        reserve_layers=(1,), reserve_token_nums=(9,),
        use_global=True, global_proto_per_class=3,
    )
    model = _ctor(bk, pp)
    with torch.no_grad():
        w_logits, w_attn, w_dist, w_lg, w_ll = ref(torch.from_numpy(batch))
    out = model.apply(
        {"params": params}, jnp.asarray(batch.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(out.cls_token_attn), w_attn.numpy(), atol=1e-5
    )
    got_d = np.asarray(out.distances).reshape(w_dist.shape)
    np.testing.assert_allclose(got_d, w_dist.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.logits), w_logits.numpy(), atol=1e-4, rtol=1e-4
    )


def test_deit_tiny_real_scale_parity():
    """Full production shape — DeiT-Tiny/16 @ 224, 12 blocks, prune at 11,
    reserve 81, discard 0.9 — validates the discard/top-k path end-to-end
    (BASELINE config #1 geometry)."""
    torch.manual_seed(3)
    ref = RefDeiT(img_size=224, patch_size=16, dim=192, depth=12, heads=3)
    ref = ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_deit_state_dict(sd, depth=12)
    model = DeiTBackbone(
        BackboneConfig(
            name="deit_tiny_patch16_224", arch="deit",
            embed_dim=192, depth=12, num_heads=3, drop_path_rate=0.0,
        )
    )
    rng = np.random.default_rng(11)
    batch = rng.normal(size=(1, 3, 224, 224)).astype(np.float32)

    with torch.no_grad():
        t, cls_attn = ref.masked_forward(
            *ref.embed_all(torch.from_numpy(batch)), [(11, 81)], 0.9
        )
    got_t, got_attn = model.apply(
        {"params": params}, jnp.asarray(batch.transpose(0, 2, 3, 1)),
        method=lambda m, x: m.masked_forward(*m.embed_all(x), [(11, 81)]),
    )
    # identical token selection requires identical top-81 sets
    ti = np.argsort(-cls_attn.numpy(), axis=-1)[:, :81]
    ji = np.argsort(-np.asarray(got_attn), axis=-1)[:, :81]
    assert set(ti[0]) == set(ji[0])
    np.testing.assert_allclose(
        np.asarray(got_attn), cls_attn.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(got_t), t.numpy(), atol=2e-4)


@pytest.mark.parametrize(
    "exact_discard,ln_stats,sample,min_overlap,min_rank", [
        (True, "fp32", 1, 74, 64),
        (False, "fp32", 1, 74, 64),
        # FastLayerNorm (compute-dtype stats) perturbs slightly more:
        # measured 78-79/81 with drops at fp32 rank >= 61 on this fixture;
        # bounds leave margin for backend-numerics drift
        (False, "compute", 1, 73, 55),
        # sampled discard counts (the bench speed config): the threshold's
        # ~3%-of-keep rank error only moves borderline map entries;
        # measured 77-80/81 with drops at fp32 rank >= 69 on this fixture
        (False, "fp32", 4, 73, 60),
        # 1/8 sampling: measured 77-78/81 with drops at fp32 rank >= 65 on
        # this fixture — contract-equal to sample=4 (the rank error grows
        # ~sqrt(2)x but stays far inside the borderline tail)
        (False, "fp32", 8, 73, 60),
    ])
def test_deit_tiny_bf16_speed_mode_selection_contract(
    exact_discard, ln_stats, sample, min_overlap, min_rank
):
    """Quantified selection contract for the SHIPPED bench configuration
    (compute_dtype=bfloat16 — bench.py, script presets) at production shape.

    bf16 block compute quantizes the attention probabilities feeding the
    (fp32) rollout, so the top-81 set is NOT bit-identical to the fp32
    reference — writing this test disproved the round-1 DESIGN.md prose
    claim. (The reference itself evaluates under AMP autocast —
    engine_proto.py:48 — so bit-identical fp32 selection is not its
    behavior either; exact parity is covered by the fp32-mode test above.)
    The honest, measured contract pinned here:
      * >= 74/81 overlap with the fp32 selection per sample, and
      * every dropped token sits in the borderline tail (fp32 rank >= 64)
        — a confidently-foreground token is never lost.
    Measured at random init (the adversarial case — trained rollouts are
    peakier): overlaps 76-81/81, dropped ranks all >= 68. The bf16-prefix
    discard (``rollout_exact_discard=False`` — the bench's speed mode) is
    contract-identical: 77-80/81, drops at rank >= 69."""
    torch.manual_seed(3)
    ref = RefDeiT(img_size=224, patch_size=16, dim=192, depth=12, heads=3)
    ref = ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_deit_state_dict(sd, depth=12)
    model = DeiTBackbone(
        BackboneConfig(
            name="deit_tiny_patch16_224", arch="deit",
            embed_dim=192, depth=12, num_heads=3, drop_path_rate=0.0,
            rollout_exact_discard=exact_discard, ln_stats=ln_stats,
            rollout_discard_sample=sample,
        ),
        compute_dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(11)
    batch = rng.normal(size=(4, 3, 224, 224)).astype(np.float32)

    with torch.no_grad():
        _, cls_attn = ref.masked_forward(
            *ref.embed_all(torch.from_numpy(batch)), [(11, 81)], 0.9
        )
    _, got_attn = model.apply(
        {"params": params}, jnp.asarray(batch.transpose(0, 2, 3, 1)),
        method=lambda m, x: m.masked_forward(*m.embed_all(x), [(11, 81)]),
    )
    fp32_order = np.argsort(-cls_attn.numpy(), axis=-1)
    ji = np.argsort(-np.asarray(got_attn, np.float32), axis=-1)[:, :81]
    for b in range(batch.shape[0]):
        want = set(fp32_order[b, :81])
        got = set(ji[b])
        overlap = len(want & got)
        assert overlap >= min_overlap, f"sample {b}: only {overlap}/81 overlap"
        rank_of = {tok: r for r, tok in enumerate(fp32_order[b])}
        dropped_ranks = sorted(rank_of[t] for t in want - got)
        assert all(r >= min_rank for r in dropped_ranks), (
            f"sample {b}: bf16 dropped a confident token "
            f"(fp32 ranks {dropped_ranks})"
        )


@pytest.mark.parametrize("sample,min_overlap,min_rank", [
    # measured on this fixture: sample=1 -> 79-80/81, drops at fp32 rank
    # >= 79; sample=8 -> 79/81, drops at rank >= 67 — the sampled signed
    # quantile estimate is contract-equal to the unsampled bisection
    (1, 76, 60),
    (8, 76, 60),
])
def test_cait_speed_mode_sampled_selection_contract(
    sample, min_overlap, min_rank
):
    """Round-5 selection contract for CaiT speed mode with SAMPLED signed
    counts (rollout_discard_sample composed with signed=True — the
    sampled quantile estimate is distribution-agnostic, so CaiT's
    mixed-sign talking-heads maps qualify; ops/rollout.py). Production
    cait_xxs24_224 geometry, seeded init: the bf16 speed path's top-81
    CA-prune selection vs the fp32 exact-signed reference ordering must
    keep >= min_overlap of 81 and only ever drop borderline-tail tokens
    (fp32 rank >= min_rank)."""
    from protopformer_tpu.models import CaiTBackbone

    rng = np.random.default_rng(17)
    raw = rng.normal(size=(2, 3, 224, 224)).astype(np.float32)
    x = jnp.asarray(raw.transpose(0, 2, 3, 1))
    base = backbone_preset("cait_xxs24_224", drop_path_rate=0.0)
    params = CaiTBackbone(base).init(
        jax.random.key(2), jnp.zeros((1, 224, 224, 3))
    )["params"]

    def run(cfg, dtype):
        m = CaiTBackbone(cfg, compute_dtype=dtype)
        _, attn = m.apply(
            {"params": params}, x,
            method=lambda mm, xx: mm.masked_forward(
                *mm.embed_all(xx), [(1, 81)]
            ),
        )
        return np.asarray(attn, np.float32)

    ref = run(base, jnp.float32)
    speed = run(
        backbone_preset(
            "cait_xxs24_224", drop_path_rate=0.0,
            rollout_exact_discard=False, rollout_discard_sample=sample,
        ),
        jnp.bfloat16,
    )
    order = np.argsort(-ref, axis=-1)
    sel = np.argsort(-speed, axis=-1)[:, :81]
    for b in range(raw.shape[0]):
        want, got = set(order[b, :81]), set(sel[b])
        overlap = len(want & got)
        assert overlap >= min_overlap, (
            f"sample {b}: only {overlap}/81 overlap"
        )
        rank_of = {t: r for r, t in enumerate(order[b])}
        dropped = sorted(rank_of[t] for t in want - got)
        assert all(r >= min_rank for r in dropped), (
            f"sample {b}: sampled-signed drop of a confident token "
            f"(fp32 ranks {dropped})"
        )


def test_cait_parity_with_discard(batch):
    """CaiT masked forward WITH the 0.9 discard active — exercises the
    k-th-largest threshold on the talking-heads maps, which carry NEGATIVE
    entries (the round-1 tiny tests ran dense-rollout only, so this path
    was never parity-checked; kth_largest is exact while the k-th value is
    non-negative, which keep-top-10% guarantees here)."""
    from protopformer_tpu.checkpoint import convert_cait_state_dict
    from protopformer_tpu.models import CaiTBackbone
    from tests.torch_reference import RefCait

    torch.manual_seed(5)
    ref = RefCait(img_size=32, patch_size=8, dim=24, depth=3, heads=2,
                  depth_token_only=2).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_cait_state_dict(sd, depth=3, depth_token_only=2)

    cfg = BackboneConfig(
        name="tiny-cait", arch="cait", img_size=32, patch_size=8,
        embed_dim=24, depth=3, num_heads=2, depth_token_only=2,
        drop_path_rate=0.0, rollout_discard_ratio=0.9,
    )
    model = CaiTBackbone(cfg)
    with torch.no_grad():
        t, cls_attn = ref.masked_forward(
            *ref.embed_all(torch.from_numpy(batch)), [(1, 9)], 0.9
        )
    got_t, got_attn = model.apply(
        {"params": params}, jnp.asarray(batch.transpose(0, 2, 3, 1)),
        method=lambda m, x: m.masked_forward(*m.embed_all(x), [(1, 9)]),
    )
    np.testing.assert_allclose(
        np.asarray(got_attn), cls_attn.numpy(), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(got_t), t.numpy(), atol=1e-4)


def test_ppnet_gradient_parity(batch):
    """BACKWARD parity: d(CE loss)/d(params) matches torch autograd through
    the full PPNet graph (masked forward incl. the detached rollout, policy
    top-k, dual-branch head). Forward parity alone cannot catch a wrong
    stop_gradient boundary or a broken custom-op VJP; this pins the
    training graph end-to-end. Gradients are mapped into the JAX tree with
    the SAME converter as the weights (gradients transform covariantly
    under the transpose-only layout mapping)."""
    ref_bk = RefDeiT(img_size=32, patch_size=8, dim=24, depth=3, heads=2)
    ref = RefPPNet(
        ref_bk, num_prototypes=40, proto_dim=16, num_classes=4,
        reserve_layer_nums=[(2, 9)], global_per_class=3,
        discard_ratio=0.0,
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_ppnet_state_dict(sd, arch="deit", depth=3)
    model = construct_ppnet(BK, PP)

    labels = np.asarray([0, 2])
    logits_t, *_ = ref(torch.from_numpy(batch))
    loss_t = torch.nn.functional.cross_entropy(
        logits_t, torch.from_numpy(labels).long()
    )
    loss_t.backward()
    grad_sd = {
        k: p.grad.detach().numpy()
        for k, p in ref.named_parameters() if p.grad is not None
    }
    # missing grads (unreached params) -> zeros so the converter can map
    for k, v in sd.items():
        grad_sd.setdefault(k, np.zeros_like(v))
    grads_ref = convert_ppnet_state_dict(grad_sd, arch="deit", depth=3)

    def loss_fn(p):
        out = model.apply(
            {"params": p}, jnp.asarray(batch.transpose(0, 2, 3, 1)),
            train=True,
            rngs={"droppath": jax.random.key(0), "dropout": jax.random.key(1)},
        )
        onehot = jax.nn.one_hot(jnp.asarray(labels), 4)
        return -jnp.mean(
            jnp.sum(jax.nn.log_softmax(out.logits) * onehot, axis=-1)
        )

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(
        float(loss_j), float(loss_t.detach()), atol=1e-5
    )

    flat_ref = jax.tree_util.tree_leaves_with_path(grads_ref)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(grads))
    checked = 0
    for path, g_ref in flat_ref:
        g_got = flat_got[path]
        scale = max(np.abs(np.asarray(g_ref)).max(), 1e-8)
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_ref), atol=2e-4 * scale + 1e-7,
            err_msg=str(path),
        )
        checked += 1
    assert checked >= 30  # every param leaf compared


def test_ppnet_over_cait_gradient_parity(batch):
    """CaiT-family backward parity: CE-loss gradients through the
    talking-heads mixing, LayerScale gammas, policy-masked class attention,
    and the dual-branch head match torch autograd on every param leaf
    (complement of test_ppnet_gradient_parity for the second backbone)."""
    from tests.torch_reference import RefCait

    torch.manual_seed(17)
    ref_bk = RefCait(img_size=32, patch_size=8, dim=24, depth=3, heads=2,
                     depth_token_only=2)
    ref = RefPPNet(
        ref_bk, num_prototypes=40, proto_dim=16, num_classes=4,
        reserve_layer_nums=((1, 9),), global_per_class=3,
        discard_ratio=0.0,
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_ppnet_state_dict(
        sd, arch="cait", depth=3, depth_token_only=2
    )
    bk = BackboneConfig(
        name="tiny-cait", arch="cait", img_size=32, patch_size=8,
        embed_dim=24, depth=3, num_heads=2, depth_token_only=2,
        drop_path_rate=0.0, rollout_discard_ratio=0.0,
    )
    pp = PPNetConfig(
        prototype_shape=(40, 16, 1, 1), num_classes=4,
        reserve_layers=(1,), reserve_token_nums=(9,),
        use_global=True, global_proto_per_class=3,
    )
    model = construct_ppnet(bk, pp)

    labels = np.asarray([1, 3])
    logits_t, *_ = ref(torch.from_numpy(batch))
    loss_t = torch.nn.functional.cross_entropy(
        logits_t, torch.from_numpy(labels).long()
    )
    loss_t.backward()
    grad_sd = {
        k: p.grad.detach().numpy()
        for k, p in ref.named_parameters() if p.grad is not None
    }
    for k, v in sd.items():
        grad_sd.setdefault(k, np.zeros_like(v))
    grads_ref = convert_ppnet_state_dict(
        grad_sd, arch="cait", depth=3, depth_token_only=2
    )

    def loss_fn(p):
        out = model.apply(
            {"params": p}, jnp.asarray(batch.transpose(0, 2, 3, 1)),
            train=True,
            rngs={"droppath": jax.random.key(0), "dropout": jax.random.key(1)},
        )
        onehot = jax.nn.one_hot(jnp.asarray(labels), 4)
        return -jnp.mean(
            jnp.sum(jax.nn.log_softmax(out.logits) * onehot, axis=-1)
        )

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(
        float(loss_j), float(loss_t.detach()), atol=1e-5
    )
    flat_ref = jax.tree_util.tree_leaves_with_path(grads_ref)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(grads))
    for path, g_ref in flat_ref:
        g_got = flat_got[path]
        scale = max(np.abs(np.asarray(g_ref)).max(), 1e-8)
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_ref), atol=2e-4 * scale + 1e-7,
            err_msg=str(path),
        )
