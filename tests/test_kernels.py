"""Pallas kernel tests (interpret mode on CPU) vs the pure-JAX reference ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from protopformer_tpu.ops.rollout import _fuse_heads, normalize_attention_map


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


@pytest.mark.parametrize("exact", [True, False])
def test_fused_attention_block_stats_contract(rng, exact):
    """Interpret-mode checks of the fully-fused block-stats kernel:

    1. (t, s) EXACTLY equal ``masked_map_stats(map)`` on the emitted map —
       the lazy-rollout contract the downstream consumer relies on;
    2. out/map match a plain-JAX replication of the kernel's documented
       numerics (bf16 eps-softmax, fp32-accumulated head mean) within bf16
       tolerance.
    """
    from protopformer_tpu.kernels.attention_core import (
        fused_attention_block_stats,
    )
    from protopformer_tpu.ops.masking import eps_softmax
    from protopformer_tpu.ops.rollout import masked_map_stats

    B, N, C, H = 4, 24, 16, 2
    hd = C // H
    qkv = jnp.asarray(
        rng.normal(size=(B, N, 3 * C)).astype(np.float32)
    ).astype(jnp.bfloat16)

    got_out, got_map, got_t, got_s = fused_attention_block_stats(
        qkv, H, 0.9, exact_discard=exact, interpret=True
    )
    map_dtype = jnp.float32 if exact else jnp.bfloat16
    assert got_map.dtype == map_dtype

    # (1) the stats are EXACTLY what masked_map_stats computes on the map
    want_t, want_s = masked_map_stats(got_map, 0.9, exact_discard=exact)
    np.testing.assert_array_equal(
        np.asarray(got_t, np.float32), np.asarray(want_t, np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(got_s), np.asarray(want_s), atol=1e-6
    )

    # (2) plain-JAX replication (fp32-accumulated dots as the kernel does)
    acc = jnp.zeros((B, N, N), jnp.float32)
    outs = []
    for h in range(H):
        q = qkv[:, :, h * hd:(h + 1) * hd]
        k = qkv[:, :, C + h * hd:C + (h + 1) * hd]
        v = qkv[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16) * (hd ** -0.5)
        probs = eps_softmax(logits)
        acc = acc + probs.astype(jnp.float32) * (1.0 / H)
        outs.append(
            jax.lax.dot_general(
                probs, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        )
    np.testing.assert_allclose(
        np.asarray(got_map, np.float32),
        np.asarray(acc.astype(map_dtype), np.float32),
        atol=1e-2,
    )
    np.testing.assert_allclose(
        np.asarray(got_out, np.float32),
        np.asarray(jnp.concatenate(outs, -1), np.float32),
        atol=5e-2,
    )


def test_patch_embed_matmul_matches_conv(rng):
    """The unfold+matmul patch projection is param-tree identical to the
    strided conv (same 'proj/kernel' + 'proj/bias' shapes) and numerically
    equal in fp32."""
    from protopformer_tpu.models.layers import PatchEmbed

    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    conv = PatchEmbed(8, 24, dtype=jnp.float32, impl="conv")
    mm = PatchEmbed(8, 24, dtype=jnp.float32, impl="matmul")
    params = conv.init(jax.random.key(0), x)["params"]
    shapes = jax.tree.map(lambda a: a.shape, params)
    assert shapes == jax.tree.map(
        lambda a: a.shape, mm.init(jax.random.key(0), x)["params"]
    )
    want = conv.apply({"params": params}, x)
    got = mm.apply({"params": params}, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5
    )
