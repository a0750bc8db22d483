"""Pallas kernel tests (interpret mode on CPU) vs the pure-JAX reference ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from protopformer_tpu.kernels import fused_normalize_attention_map
from protopformer_tpu.ops.rollout import _fuse_heads, normalize_attention_map


@pytest.mark.parametrize("N", [17, 197])
def test_fused_normalize_matches_jax(rng, N):
    B, H = 2, 3
    logits = rng.normal(size=(B, H, N, N)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    probs = jnp.asarray(probs)

    want = normalize_attention_map(_fuse_heads(probs, "mean"))
    got = fused_normalize_attention_map(probs, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-6
    )


def test_fused_block_matches_flax(rng):
    """Fused block (f32 compute) vs the Flax Block, including the emitted
    normalized rollout map."""
    from flax import linen as nn

    from protopformer_tpu.core.config import BackboneConfig
    from protopformer_tpu.kernels import fused_deit_block
    from protopformer_tpu.models.layers import Block

    B, N, C, H = 2, 17, 24, 2
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    keep = (rng.uniform(size=(B, N)) > 0.4).astype(np.float32)
    keep[:, 0] = 1.0
    policy = jnp.asarray(keep)

    block = Block(num_heads=H, drop_path=0.0)
    params = block.init(jax.random.key(0), x, policy)["params"]
    want_x, want_attn = block.apply({"params": params}, x, policy, True)
    want_map = normalize_attention_map(
        _fuse_heads(want_attn.astype(jnp.float32), "mean")
    )

    got_x, got_map = fused_deit_block(
        x, policy, params, num_heads=H, compute_dtype=jnp.float32,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got_x), np.asarray(want_x), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_map), np.asarray(want_map), atol=1e-5
    )


def test_fused_serving_matches_model(rng):
    """Full fused serving forward vs PPNet.apply (f32 path vs bf16 kernels:
    check agreement of selections and coarse numerics)."""
    from protopformer_tpu.core.config import BackboneConfig, PPNetConfig
    from protopformer_tpu.kernels import ppnet_eval_forward
    from protopformer_tpu.models import construct_ppnet

    bk = BackboneConfig(
        name="tiny-test", arch="deit", img_size=32, patch_size=8,
        embed_dim=24, depth=3, num_heads=2, drop_path_rate=0.0,
        rollout_discard_ratio=0.0, use_pallas="off",
    )
    pp = PPNetConfig(
        prototype_shape=(40, 16, 1, 1), num_classes=4,
        reserve_layers=(2,), reserve_token_nums=(9,),
        use_global=True, global_proto_per_class=3,
    )
    model = construct_ppnet(bk, pp)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), x)["params"]
    want = model.apply({"params": params}, x)
    got = ppnet_eval_forward(params, x, bk, pp, interpret=True)
    # bf16 kernels vs f32 reference: selected token SETS must mostly agree
    # (near-ties may swap at bf16 precision on random init weights)
    for b in range(2):
        got_set = set(np.argsort(-np.asarray(got.cls_token_attn))[b, :9])
        want_set = set(np.argsort(-np.asarray(want.cls_token_attn))[b, :9])
        assert len(got_set & want_set) >= 8, (got_set, want_set)
    np.testing.assert_allclose(
        np.asarray(got.logits), np.asarray(want.logits), atol=0.2, rtol=0.1
    )
    assert got.distances.shape == want.distances.shape


@pytest.mark.parametrize("ones", [True, False])
def test_fused_attention_core_matches_jax(rng, ones):
    """Fused attention core vs the flax Attention + normalize chain (fp32)."""
    from protopformer_tpu.kernels.attention_core import fused_attention_core
    from protopformer_tpu.models.layers import Attention

    B, N, C, H = 4, 17, 24, 2
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    if ones:
        policy = "ones"
        kern_policy, kern_ones = None, True
    else:
        keep = (rng.uniform(size=(B, N)) > 0.4).astype(np.float32)
        keep[:, 0] = 1.0
        policy = jnp.asarray(keep)
        kern_policy, kern_ones = policy, False

    attn_mod = Attention(num_heads=H, dtype=jnp.float32)
    params = attn_mod.init(jax.random.key(0), x, policy)["params"]
    want_out, want_probs = attn_mod.apply({"params": params}, x, policy, True)
    want_map = normalize_attention_map(
        _fuse_heads(want_probs.astype(jnp.float32), "mean")
    )

    # feed the same qkv activations into the kernel
    qkv = x @ params["qkv"]["kernel"] + params["qkv"]["bias"]
    got_pre, got_map = fused_attention_core(
        qkv, kern_policy, H, ones_policy=kern_ones,
        compute_dtype=jnp.float32, interpret=True,
    )
    got_out = got_pre @ params["proj"]["kernel"] + params["proj"]["bias"]
    np.testing.assert_allclose(
        np.asarray(got_out), np.asarray(want_out), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_map), np.asarray(want_map), atol=1e-6
    )


def test_fused_normalize_bf16_input(rng):
    B, H, N = 2, 3, 33
    logits = rng.normal(size=(B, H, N, N)).astype(np.float32)
    probs = jnp.asarray(
        np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    ).astype(jnp.bfloat16)
    # model semantics: cast to fp32 BEFORE the head mean (deit.py/cait.py)
    want = normalize_attention_map(
        _fuse_heads(probs.astype(jnp.float32), "mean")
    )
    got = fused_normalize_attention_map(probs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got).sum(-1), 1.0, atol=1e-5)


@pytest.mark.parametrize("ones", [True, False])
def test_fused_attention_mean_padded_matches_jax(rng, ones):
    """Padded mean kernel (raw fused map out) vs flax Attention + head-mean:
    real entries exact in fp32, pads exactly zero."""
    from protopformer_tpu.kernels.attention_core import (
        fused_attention_mean_padded,
    )
    from protopformer_tpu.models.layers import Attention

    B, N, NP, C, H = 4, 17, 128, 24, 2
    x = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    if ones:
        policy = "ones"
        pol_arr = np.ones((B, N), np.float32)
    else:
        keep = (rng.uniform(size=(B, N)) > 0.4).astype(np.float32)
        keep[:, 0] = 1.0
        policy = jnp.asarray(keep)
        pol_arr = keep

    attn_mod = Attention(num_heads=H, dtype=jnp.float32)
    params = attn_mod.init(jax.random.key(0), x, policy)["params"]
    want_out, want_probs = attn_mod.apply({"params": params}, x, policy, True)
    want_map = _fuse_heads(want_probs.astype(jnp.float32), "mean")

    qkv = x @ params["qkv"]["kernel"] + params["qkv"]["bias"]
    qkv_pad = jnp.pad(qkv, ((0, 0), (0, NP - N), (0, 0)))
    pol_pad = jnp.pad(jnp.asarray(pol_arr), ((0, 0), (0, NP - N)))
    got_pre, got_map = fused_attention_mean_padded(
        qkv_pad, pol_pad, H, real_n=N,
        compute_dtype=jnp.float32, interpret=True,
    )
    got_out = got_pre[:, :N] @ params["proj"]["kernel"] + params["proj"]["bias"]
    np.testing.assert_allclose(
        np.asarray(got_out), np.asarray(want_out), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_map[:, :N, :N]), np.asarray(want_map), atol=1e-6
    )
    # pads are EXACT zeros (the lazy-rollout/bisect contract)
    assert np.abs(np.asarray(got_map[:, N:])).max() == 0.0
    assert np.abs(np.asarray(got_map[:, :, N:])).max() == 0.0


@pytest.mark.parametrize("exact", [True, False])
def test_fused_map_stats_matches_masked_map_stats(rng, exact):
    """Interpret-mode parity of the fused stats kernel vs the XLA path it
    claims to mirror (same (threshold, masked row sums) contract), for both
    the exact-fp32 and 16-bit-prefix bisections, on both map dtypes."""
    from protopformer_tpu.kernels.stats import fused_map_stats
    from protopformer_tpu.ops.rollout import masked_map_stats

    B, N = 4, 24
    maps = rng.uniform(size=(B, N, N)).astype(np.float32)
    maps /= maps.sum(-1, keepdims=True)  # softmax-like probabilities
    fmap = jnp.asarray(maps)
    if not exact:
        fmap = fmap.astype(jnp.bfloat16)

    want_t, want_s = masked_map_stats(fmap, 0.9, exact_discard=exact)
    got_t, got_s = fused_map_stats(
        fmap, 0.9, exact_discard=exact, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
    np.testing.assert_allclose(
        np.asarray(got_s), np.asarray(want_s), atol=1e-6
    )


def test_fused_map_stats_padded_keep_elements(rng):
    """The padded-map contract (keep_elements with exact-zero pads) must
    match masked_map_stats: counts on the REAL element count, pads never
    crossing the threshold or entering the row sums."""
    from protopformer_tpu.kernels.stats import fused_map_stats
    from protopformer_tpu.ops.rollout import masked_map_stats

    B, NR, NP = 4, 17, 24  # real 17x17 map padded to 24x24 with zeros
    maps = np.zeros((B, NP, NP), np.float32)
    maps[:, :NR, :NR] = rng.uniform(size=(B, NR, NR)).astype(np.float32)
    fmap = jnp.asarray(maps)

    want_t, want_s = masked_map_stats(
        fmap, 0.9, exact_discard=True, keep_elements=NR * NR
    )
    got_t, got_s = fused_map_stats(
        fmap, 0.9, exact_discard=True, keep_elements=NR * NR, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
    np.testing.assert_allclose(
        np.asarray(got_s), np.asarray(want_s), atol=1e-6
    )
    assert float(np.asarray(got_t).min()) > 0.0  # pads stay below threshold
