"""Unit tests for the core numeric ops against NumPy/torch oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from protopformer_tpu.ops import (
    softmax_with_policy,
    class_attn_softmax_with_policy,
    normalize_attention_map,
    attn_rollout,
    attn_rollout_cait,
    l2_distances,
    log_similarity,
    prototype_activations,
    topk_sorted_indices,
    gather_tokens,
    scatter_tokens_to_grid,
    reserve_policy,
    weighted_spatial_stats,
    ppc_loss,
)
from tests import oracles


def test_softmax_with_policy_matches_oracle(rng):
    B, H, N = 2, 3, 17
    logits = rng.normal(size=(B, H, N, N)).astype(np.float32)
    keep = (rng.uniform(size=(B, N)) > 0.4).astype(np.float32)
    keep[:, 0] = 1.0  # CLS always kept

    got = np.asarray(softmax_with_policy(jnp.asarray(logits), jnp.asarray(keep)))
    want = oracles.softmax_with_policy_torch(
        torch.from_numpy(logits), torch.from_numpy(keep)[:, :, None]
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_softmax_with_policy_all_ones_is_eps_softmax(rng):
    # all-ones policy is NOT a plain softmax: the eps terms shift it slightly.
    B, H, N = 1, 2, 9
    logits = rng.normal(size=(B, H, N, N)).astype(np.float32)
    ones = np.ones((B, N), np.float32)
    got = np.asarray(softmax_with_policy(jnp.asarray(logits), jnp.asarray(ones)))
    plain = jax.nn.softmax(jnp.asarray(logits), axis=-1)
    np.testing.assert_allclose(got, np.asarray(plain), atol=1e-5)
    assert not np.allclose(got, np.asarray(plain), atol=1e-9)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)


def test_class_attn_softmax_with_policy(rng):
    B, H, N = 2, 4, 13
    logits = rng.normal(size=(B, H, 1, N)).astype(np.float32)
    keep = (rng.uniform(size=(B, N)) > 0.5).astype(np.float32)
    keep[:, 0] = 1.0
    got = np.asarray(
        class_attn_softmax_with_policy(jnp.asarray(logits), jnp.asarray(keep))
    )
    want = oracles.softmax_with_policy_torch(
        torch.from_numpy(logits), torch.from_numpy(keep)[:, :, None],
        identity_escape=False,
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)
    # masked columns contribute only the eps floor
    masked = got[0, 0, 0][keep[0] == 0]
    assert (masked < 1e-5).all()


def test_normalize_attention_map_matches_oracle(rng):
    B, N = 3, 29
    # softmax rows so values are realistic attention probabilities (no ties)
    a = rng.normal(size=(B, N, N)).astype(np.float32)
    a = np.exp(a) / np.exp(a).sum(-1, keepdims=True)
    got = np.asarray(normalize_attention_map(jnp.asarray(a)))
    want = oracles.normalize_map_torch(torch.from_numpy(a)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_attn_rollout_matches_oracle(rng):
    L, B, H, N = 5, 2, 3, 19
    attn = rng.normal(size=(L, B, H, N, N)).astype(np.float32)
    attn = np.exp(attn) / np.exp(attn).sum(-1, keepdims=True)
    got = np.asarray(attn_rollout(jnp.asarray(attn)))
    want = oracles.attn_rollout_torch([torch.from_numpy(a) for a in attn]).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
    # rows of the rollout product stay stochastic (each factor is row-stochastic)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-4)


def test_attn_rollout_cait_shapes_and_rows(rng):
    L_sa, L_ca, B, H, P = 4, 2, 2, 3, 16
    sa = rng.normal(size=(L_sa, B, H, P, P)).astype(np.float32)
    sa = np.exp(sa) / np.exp(sa).sum(-1, keepdims=True)
    ca = rng.normal(size=(L_ca, B, H, 1, P + 1)).astype(np.float32)
    ca = np.exp(ca) / np.exp(ca).sum(-1, keepdims=True)
    roll, cls = attn_rollout_cait(jnp.asarray(sa), jnp.asarray(ca))
    assert roll.shape == (B, P, P)
    assert cls.shape == (B, 1, P)
    np.testing.assert_allclose(np.asarray(roll).sum(-1), 1.0, atol=1e-4)
    assert (np.asarray(cls) >= 0).all()


def test_l2_distances_matches_torch_conv(rng):
    B, K, C, P = 2, 81, 192, 50
    tokens = rng.normal(size=(B, K, C)).astype(np.float32)
    protos = rng.uniform(size=(P, C)).astype(np.float32)
    got = np.asarray(l2_distances(jnp.asarray(tokens), jnp.asarray(protos)))
    want = oracles.l2_distances_torch(
        torch.from_numpy(tokens), torch.from_numpy(protos)
    ).numpy()
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-5)
    # exact identity check against direct computation
    direct = ((tokens[:, :, None, :] - protos[None, None]) ** 2).sum(-1)
    np.testing.assert_allclose(got, direct, atol=2e-3, rtol=1e-5)


def test_log_similarity():
    d = jnp.asarray([0.0, 1.0, 10.0], jnp.float32)
    got = np.asarray(log_similarity(d))
    want = np.log((np.asarray(d) + 1) / (np.asarray(d) + 1e-4))
    # fp32 log vs float64 numpy reference; parity budget is 1e-4
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_prototype_activations_max_pool(rng):
    B, K, C, P = 2, 9, 16, 8
    tokens = rng.normal(size=(B, K, C)).astype(np.float32)
    protos = rng.uniform(size=(P, C)).astype(np.float32)
    pooled, d, maps = prototype_activations(jnp.asarray(tokens), jnp.asarray(protos))
    assert pooled.shape == (B, P)
    assert d.shape == (B, K, P)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(maps).max(axis=1))


def test_topk_sorted_and_gather_match_torch(rng):
    B, N, k, C = 3, 196, 81, 7
    scores = rng.normal(size=(B, N)).astype(np.float32)
    tokens = rng.normal(size=(B, N, C)).astype(np.float32)
    idx = np.asarray(topk_sorted_indices(jnp.asarray(scores), k))
    t_idx = torch.topk(torch.from_numpy(scores), k=k, dim=-1)[1].sort(dim=-1)[0]
    np.testing.assert_array_equal(idx, t_idx.numpy())
    got = np.asarray(gather_tokens(jnp.asarray(tokens), jnp.asarray(idx)))
    want = np.take_along_axis(tokens, idx[:, :, None], axis=1)
    np.testing.assert_array_equal(got, want)


def test_scatter_tokens_to_grid_roundtrip(rng):
    B, P, K, N = 2, 5, 9, 49
    vals = rng.normal(size=(B, P, K)).astype(np.float32)
    idx = np.stack([rng.choice(N, size=K, replace=False) for _ in range(B)])
    idx.sort(axis=-1)
    grid = np.asarray(
        scatter_tokens_to_grid(jnp.asarray(vals), jnp.asarray(idx), N)
    )
    assert grid.shape == (B, P, N)
    for b in range(B):
        np.testing.assert_allclose(grid[b][:, idx[b]], vals[b], atol=1e-6)
        mask = np.ones(N, bool)
        mask[idx[b]] = False
        assert (grid[b][:, mask] == 0).all()


def test_reserve_policy(rng):
    B, N, k = 2, 197, 81
    scores = rng.normal(size=(B, N - 1)).astype(np.float32)
    policy, idx = reserve_policy(jnp.asarray(scores), k, N)
    policy = np.asarray(policy)
    assert policy.shape == (B, N)
    assert (policy[:, 0] == 1).all()
    assert policy.sum() == B * (k + 1)
    for b in range(B):
        assert set(np.flatnonzero(policy[b, 1:])) == set(np.asarray(idx)[b])


def test_weighted_spatial_stats_matches_oracle(rng):
    M, g = 6, 14
    w = rng.uniform(size=(M, g * g)).astype(np.float32)
    mean, cov = weighted_spatial_stats(jnp.asarray(w), g)
    pts = torch.tensor(
        [[float(x), float(y)] for x in range(g) for y in range(g)]
    )[None].repeat(M, 1, 1)
    want_mean, want_cov = oracles.batch_cov_torch(pts, torch.from_numpy(w))
    np.testing.assert_allclose(np.asarray(mean), want_mean.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(cov), want_cov.numpy(), atol=1e-3)


def test_ppc_loss_matches_oracle(rng):
    B, num_classes, ppc, K, g = 4, 10, 10, 81, 14
    P = num_classes * ppc
    act = rng.uniform(size=(B, P, K)).astype(np.float32) * 9.0
    cls_attn = rng.uniform(size=(B, g * g)).astype(np.float32)
    label = rng.integers(0, num_classes, size=(B,))
    got_cov, got_mean = ppc_loss(
        jnp.asarray(act), jnp.asarray(cls_attn), jnp.asarray(label),
        num_classes, ppc, g, cov_thresh=1.0, mean_thresh=2.0,
    )
    want_cov, want_mean = oracles.ppc_loss_torch(
        torch.from_numpy(act), torch.from_numpy(cls_attn),
        torch.from_numpy(np.asarray(label)), ppc, g, 1.0, 2.0,
    )
    np.testing.assert_allclose(float(got_cov), float(want_cov), atol=1e-4)
    np.testing.assert_allclose(float(got_mean), float(want_mean), atol=1e-5)


def test_ppc_loss_grad_is_finite(rng):
    """The sqrt in the pairwise-mean distance must not produce NaN grads at
    the zero diagonal."""
    B, num_classes, ppc, K, g = 2, 4, 5, 9, 7
    P = num_classes * ppc
    act = jnp.asarray(rng.uniform(size=(B, P, K)).astype(np.float32))
    cls_attn = jnp.asarray(rng.uniform(size=(B, g * g)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, num_classes, size=(B,)))

    def f(a):
        c, m = ppc_loss(a, cls_attn, label, num_classes, ppc, g, 1.0, 2.0)
        return c + m

    grad = jax.grad(f)(act)
    assert np.isfinite(np.asarray(grad)).all()


def test_lazy_rollout_matches_eager(rng):
    """rollout_row_scores_lazy (raw map + threshold + row sums; the hot
    eval path) must match the eager normalize-then-multiply chain."""
    from protopformer_tpu.ops.rollout import (
        masked_map_stats,
        normalize_attention_map,
        rollout_row_scores,
        rollout_row_scores_lazy,
    )

    B, N, L = 3, 24, 4
    maps, norm_maps, ts, ss = [], [], [], []
    for i in range(L):
        raw = jnp.asarray(
            jax.nn.softmax(rng.normal(size=(B, N, N)).astype(np.float32) * 2)
        )
        maps.append(raw)
        norm_maps.append(normalize_attention_map(raw, 0.9, 0.2))
        t, s = masked_map_stats(raw, 0.9)
        ts.append(t)
        ss.append(s)
    seed = jnp.zeros((B, 1, N), jnp.float32).at[:, 0, 0].set(1.0)
    want = rollout_row_scores(norm_maps, seed)
    got = rollout_row_scores_lazy(maps, ts, ss, seed, 0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-5)


def test_masked_map_stats_padded_keep_elements(rng):
    """A map padded with exact zeros + keep_elements=real count must give
    the identical threshold/row sums as the unpadded map (the padded
    serving path's contract)."""
    from protopformer_tpu.ops.rollout import masked_map_stats

    B, N, NP = 2, 24, 32
    raw = jnp.asarray(
        jax.nn.softmax(rng.normal(size=(B, N, N)).astype(np.float32) * 2)
    )
    padded = jnp.zeros((B, NP, NP)).at[:, :N, :N].set(raw)
    t1, s1 = masked_map_stats(raw, 0.9)
    t2, s2 = masked_map_stats(padded, 0.9, keep_elements=N * N)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2[:, :N]))
    assert np.asarray(s2[:, N:]).max() == 0.0


def test_gelu_exact_matches_reference(rng):
    """A&S-erf GELU (the model-wide activation) vs scipy's exact erf —
    must stay inside the 1e-4 parity budget by a wide margin."""
    import scipy.special as ss

    from protopformer_tpu.ops.activations import gelu_exact

    x = rng.normal(size=(4096,)).astype(np.float32) * 4
    want = x * 0.5 * (1.0 + ss.erf(x / np.sqrt(2.0)))
    got = np.asarray(gelu_exact(jnp.asarray(x)))
    assert np.abs(got - want).max() < 2e-6
    # bf16 in/out path returns bf16
    got16 = gelu_exact(jnp.asarray(x, jnp.bfloat16))
    assert got16.dtype == jnp.bfloat16
    # grad exists and is finite
    g = jax.grad(lambda v: jnp.sum(gelu_exact(v)))(jnp.asarray(x))
    assert np.isfinite(np.asarray(g)).all()


def test_kth_largest_mixed_sign(rng):
    """CaiT's talking-heads maps carry NEGATIVE entries; kth_largest must
    still be exact while the k-th largest value is non-negative (the
    rollout's keep-top-10% regime)."""
    from protopformer_tpu.ops.rollout import kth_largest

    x = jnp.asarray((rng.normal(size=(4, 999)) * 0.1 + 0.02).astype(np.float32))
    for keep in (10, 100, int((np.asarray(x) >= 0).sum(-1).min())):
        want = jax.lax.top_k(x, keep)[0][:, -1]
        got = kth_largest(x, keep)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_kth_largest_signed_any_sign_pattern(rng):
    """kth_largest_signed must be exact for ANY sign pattern — including
    all-negative maps (measured on real CaiT talking-heads maps, where
    10/24 layers were entirely negative on seeded weights; caught by
    tests/test_reference_groundtruth.py)."""
    from protopformer_tpu.ops.rollout import (
        kth_largest_bf16_signed,
        kth_largest_signed,
    )

    cases = [
        rng.normal(size=(4, 999)).astype(np.float32),          # mixed
        -np.abs(rng.normal(size=(4, 999))).astype(np.float32),  # all-neg
        np.abs(rng.normal(size=(4, 999))).astype(np.float32),   # all-pos
    ]
    for x in cases:
        xj = jnp.asarray(x)
        for keep in (1, 10, 100, 999):
            want = jax.lax.top_k(xj, keep)[0][:, -1]
            got = kth_largest_signed(xj, keep)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        xb = xj.astype(jnp.bfloat16)
        for keep in (10, 100):
            want = jax.lax.top_k(xb.astype(jnp.float32), keep)[0][:, -1]
            got = kth_largest_bf16_signed(xb, keep).astype(jnp.float32)
            # bf16 ties: the returned threshold keeps >= keep elements
            cnt = jnp.sum(
                (xb.astype(jnp.float32) >= got[:, None]).astype(np.int32),
                axis=-1,
            )
            assert (np.asarray(cnt) >= keep).all()
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-2
            )


def test_masked_map_stats_signed_all_negative(rng):
    """masked_map_stats(signed=True) on an all-negative map must keep the
    top-10% (least-negative) entries, like torch's topk-scatter."""
    import torch

    from protopformer_tpu.ops.rollout import masked_map_stats

    x = -np.abs(rng.normal(size=(2, 196, 196))).astype(np.float32)
    t, s = masked_map_stats(jnp.asarray(x), 0.9, True, signed=True)
    # torch reference semantics (cait_models_attn.py:234-237)
    ref = torch.from_numpy(x.copy())
    flat = ref.view(2, -1)
    _, idx = flat.topk(int(flat.shape[-1] * 0.9), -1, False)
    flat.scatter_(1, idx, 0)
    want_s = ref.sum(-1).numpy()
    np.testing.assert_allclose(np.asarray(s), want_s, atol=1e-5)
    assert (np.asarray(t) < 0).all()


def test_kth_largest_static_bound_bit_identical(rng):
    """A static ``bound`` shrinks the unrolled pass count (1.0 -> 30/14
    passes for fp32/bf16); the result must stay BIT-identical to top_k —
    including at adversarial tie/zero/denormal-heavy rows."""
    from protopformer_tpu.ops.rollout import (
        kth_largest,
        kth_largest_bf16,
        kth_largest_prefix16,
    )

    x = rng.uniform(0.0, 1.0, size=(6, 4099)).astype(np.float32)
    x[1, :64] = 0.5           # ties at the threshold
    x[2] = 0.0                # all-but-few zero
    x[2, :10] = 1e-30         # denormal-range survivors
    x[3, ::7] = 1.0           # ties at the bound itself
    xj = jnp.asarray(x)
    for keep in (1, 41, 409, 4099):
        want = jax.lax.top_k(xj, keep)[0][:, -1]
        for b in (None, 1.0):
            got = kth_largest(xj, keep, bound=b)
            np.testing.assert_array_equal(
                np.asarray(got), np.asarray(want), err_msg=f"bound={b}"
            )
    xb = xj.astype(jnp.bfloat16)
    for keep in (1, 409):
        want = jax.lax.top_k(xb.astype(jnp.float32), keep)[0][:, -1]
        got = kth_largest_bf16(xb, keep, bound=1.0).astype(jnp.float32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # prefix16 contract: the bf16-floor of the exact k-th value
    want16 = (
        np.asarray(jax.lax.top_k(xj, 409)[0][:, -1]).view(np.int32)
        >> 16 << 16
    )
    got16 = np.asarray(kth_largest_prefix16(xj, 409, bound=1.0))
    np.testing.assert_array_equal(got16.view(np.int32), want16)


def test_masked_map_stats_sampled_counts(rng):
    """sample>1 (speed mode): the sampled-quantile threshold's kept-count
    must stay within a few percent of the exact keep count, and the row
    sums must be exactly the sums of the values the threshold keeps."""
    from protopformer_tpu.ops.rollout import masked_map_stats

    B, N = 4, 197
    base = rng.dirichlet(np.ones(N) * 0.05, (B, N)).astype(np.float32)
    # adversarial spatial peak: concentrate the mass OUTSIDE the sampling
    # window (bottom-right queries, last keys) for one batch element
    base[3] = np.roll(base[3], (N - 20, N - 20), axis=(0, 1))
    raw = jnp.asarray(base).astype(jnp.bfloat16)
    keep = N * N - int(N * N * 0.9)
    for sample in (2, 4):
        t, s = masked_map_stats(
            raw, 0.9, exact_discard=False, value_bound=1.0, sample=sample
        )
        flat = np.asarray(raw, np.float32).reshape(B, -1)
        kept = (flat >= np.asarray(t, np.float32)[:, None]).sum(-1)
        np.testing.assert_allclose(kept, keep, rtol=0.15)
        want_s = np.where(
            np.asarray(raw, np.float32)
            >= np.asarray(t, np.float32)[:, None, None],
            np.asarray(raw, np.float32), 0.0,
        ).sum(-1)
        np.testing.assert_allclose(np.asarray(s), want_s, rtol=1e-6)
    # guards: exact mode and padded maps must reject sampling
    with pytest.raises(ValueError):
        masked_map_stats(raw.astype(jnp.float32), 0.9, sample=4)
    with pytest.raises(ValueError):
        masked_map_stats(
            raw, 0.9, exact_discard=False, keep_elements=N * N - 5, sample=4
        )


def test_masked_map_stats_mass_bracket_bit_identical(rng):
    """``stochastic_eps`` derives a static (floor, cap) bisection bracket
    from the eps-softmax row-mass invariants (rows sum to EXACTLY 1,
    every element >= (eps/N)/(N+eps)); the threshold must stay
    BIT-identical to the unbracketed search in every mode — including a
    hyper-concentrated map whose k-th value sits right at the eps floor,
    and a uniform map whose k-th value sits near the mass cap."""
    from protopformer_tpu.ops.masking import eps_softmax
    from protopformer_tpu.ops.rollout import kth_largest, masked_map_stats

    B, H, N = 3, 3, 197
    logits = rng.normal(size=(B, H, N, N)).astype(np.float32) * 2.0
    # row 0 of batch 1: one token takes everything -> other probs at the
    # eps floor (the bracket's lo edge)
    logits[1, :, :, 0] = 60.0
    # batch 2: uniform logits -> kth near 1/N (the cap side for small keep)
    logits[2] = 0.0
    probs = np.asarray(eps_softmax(jnp.asarray(logits)))
    fmap32 = jnp.asarray(probs.mean(1))  # (B, N, N) head-mean, fp32

    keep = N * N - int(N * N * 0.9)
    # exact fp32 mode: bit-identical to the top_k oracle AND to the
    # bound=1.0 search
    t_ref, s_ref = masked_map_stats(fmap32, 0.9, True, value_bound=1.0)
    t_brk, s_brk = masked_map_stats(
        fmap32, 0.9, True, value_bound=1.0, stochastic_eps=1e-6
    )
    want = jax.lax.top_k(fmap32.reshape(B, -1), keep)[0][:, -1]
    np.testing.assert_array_equal(np.asarray(t_brk), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(t_brk), np.asarray(t_ref))
    np.testing.assert_array_equal(np.asarray(s_brk), np.asarray(s_ref))

    # the floor/cap really bracket the kth for these maps
    eps = 1e-6
    floor = eps / N / (N + eps) * 0.98
    cap = N / keep * 1.02
    assert float(want.min()) >= floor and float(want.max()) <= cap

    # bf16 speed mode, exact and sampled counts: threshold unchanged by
    # the bracket
    fmap16 = fmap32.astype(jnp.bfloat16)
    for sample in (1, 4):
        t0, _ = masked_map_stats(
            fmap16, 0.9, False, value_bound=1.0, sample=sample
        )
        t1, _ = masked_map_stats(
            fmap16, 0.9, False, value_bound=1.0, sample=sample,
            stochastic_eps=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(t0, np.float32), np.asarray(t1, np.float32),
            err_msg=f"sample={sample}",
        )

    # direct (lo, hi) bracket on kth_largest: edges inclusive
    x = jnp.asarray(rng.uniform(0.25, 0.75, size=(4, 513)).astype(np.float32))
    for keep2 in (1, 100, 513):
        want2 = jax.lax.top_k(x, keep2)[0][:, -1]
        got2 = kth_largest(x, keep2, bound=(0.25, 0.75))
        np.testing.assert_array_equal(np.asarray(got2), np.asarray(want2))


def test_lazy_rollout_negative_maps(rng):
    """The no-discard sentinel must keep negative entries (regression: a 0
    threshold silently masked them, breaking CaiT's dense-rollout parity)."""
    from protopformer_tpu.ops.rollout import (
        masked_map_stats,
        normalize_attention_map,
        rollout_row_scores,
        rollout_row_scores_lazy,
    )

    B, N, L = 2, 16, 3
    maps = [
        jnp.asarray(rng.normal(size=(B, N, N)).astype(np.float32) * 0.1 + 0.05)
        for _ in range(L)
    ]
    seed = jnp.asarray(rng.uniform(size=(B, 1, N)).astype(np.float32))
    for ratio in (0.0, 0.9):
        norm = [normalize_attention_map(m, ratio, 0.2) for m in maps]
        want = rollout_row_scores(norm, seed)
        ts, ss = zip(*[masked_map_stats(m, ratio) for m in maps])
        got = rollout_row_scores_lazy(maps, list(ts), list(ss), seed, 0.2)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5,
            err_msg=f"ratio={ratio}",
        )


def test_gelu_speed_deviation_bound(rng=np.random.default_rng(12)):
    """tanh-GELU (the bf16 speed-mode activation) stays within ~1e-3 of
    exact-erf GELU — under bf16 resolution (~4e-3 relative), which is why
    speed mode may use it (layers.Mlp; fp32 parity keeps gelu_exact)."""
    from protopformer_tpu.ops.activations import gelu_exact, gelu_speed

    x = jnp.asarray(
        np.concatenate([
            rng.normal(0, 3, 20000),
            np.linspace(-8, 8, 1000),
        ]).astype(np.float32)
    )
    exact = np.asarray(gelu_exact(x))
    fast = np.asarray(gelu_speed(x))
    assert np.abs(fast - exact).max() < 2.5e-3
    # and in bf16 the two are mostly indistinguishable
    eb = np.asarray(gelu_exact(x.astype(jnp.bfloat16)).astype(jnp.float32))
    fb = np.asarray(gelu_speed(x.astype(jnp.bfloat16)).astype(jnp.float32))
    denom = np.maximum(np.abs(eb), 1e-2)
    assert np.median(np.abs(fb - eb) / denom) < 4e-3



def test_masked_map_stats_multi_bit_identical(rng):
    """The batched cross-layer search (rollout_stats_batched) must return
    BIT-identical (t, s) per layer to sequential masked_map_stats calls in
    every mode combination — the bisection is row-independent, so stacking
    the layers cannot change any row's result."""
    from protopformer_tpu.ops.rollout import (
        masked_map_stats,
        masked_map_stats_multi,
    )

    B, N = 3, 197
    L = 4
    probs = [
        jnp.asarray(
            rng.dirichlet(np.ones(N) * 0.05, (B, N)).astype(np.float32)
        )
        for _ in range(L)
    ]
    signed_maps = [
        jnp.asarray(rng.normal(size=(B, 196, 196)).astype(np.float32) - i)
        for i in range(L)
    ]

    cases = [
        # (maps, kwargs) — DeiT exact, DeiT speed bf16+sampled, CaiT signed
        (probs, dict(exact_discard=True, value_bound=1.0,
                     stochastic_eps=1e-6)),
        ([p.astype(jnp.bfloat16) for p in probs],
         dict(exact_discard=False, value_bound=1.0, sample=4,
              stochastic_eps=1e-6)),
        (signed_maps, dict(exact_discard=True, signed=True)),
        ([m.astype(jnp.bfloat16) for m in signed_maps],
         dict(exact_discard=False, signed=True)),
        # round-5: sampled signed counts (CaiT speed mode) — the quantile
        # estimate is distribution-agnostic, so sample composes with the
        # signed key space
        ([m.astype(jnp.bfloat16) for m in signed_maps],
         dict(exact_discard=False, signed=True, sample=4)),
    ]
    for maps, kw in cases:
        want = [masked_map_stats(m, 0.9, **kw) for m in maps]
        got = masked_map_stats_multi(maps, 0.9, **kw)
        assert len(got) == L
        for (wt, ws), (gt, gs) in zip(want, got):
            np.testing.assert_array_equal(np.asarray(wt), np.asarray(gt))
            np.testing.assert_array_equal(np.asarray(ws), np.asarray(gs))

    # single-map delegation + guard parity with the sequential path
    (gt, gs), = masked_map_stats_multi(
        probs[:1], 0.9, exact_discard=True, value_bound=1.0
    )
    wt, ws = masked_map_stats(probs[0], 0.9, value_bound=1.0)
    np.testing.assert_array_equal(np.asarray(wt), np.asarray(gt))
    with pytest.raises(ValueError):
        # probability-only shortcuts stay rejected for signed maps
        masked_map_stats_multi(signed_maps, 0.9, signed=True,
                               value_bound=1.0)
    with pytest.raises(ValueError):
        masked_map_stats_multi(probs, 0.9, exact_discard=True, sample=4)
