"""ServingEngine tests: fixed-batch padding discipline + numeric parity
with the plain model forward."""

import numpy as np
import jax
import jax.numpy as jnp

from protopformer_tpu.core.config import BackboneConfig, PPNetConfig
from protopformer_tpu.data.preprocess import normalize_images
from protopformer_tpu.models import construct_ppnet
from protopformer_tpu.serving import ServingEngine

BK = BackboneConfig(
    name="tiny-test", arch="deit", img_size=32, patch_size=8,
    embed_dim=24, depth=3, num_heads=2, drop_path_rate=0.1,
)
PP = PPNetConfig(
    prototype_shape=(40, 16, 1, 1), num_classes=4,
    reserve_layers=(2,), reserve_token_nums=(9,),
    use_global=True, global_proto_per_class=3,
)


def test_serving_engine_matches_model_and_handles_partial_batches():
    model = construct_ppnet(BK, PP)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3))
    )["params"]
    rng = np.random.default_rng(4)
    # 11 images with batch_size=4: three chunks, last one padded by 1
    imgs = (rng.uniform(size=(11, 32, 32, 3)) * 255).astype(np.uint8)

    engine = ServingEngine(
        BK, PP, params, batch_size=4,
        compute_dtype=jnp.float32, with_attn=True,
    )
    engine.warmup()
    res = engine(imgs)
    assert res.logits.shape == (11, 4)
    assert res.top_class.shape == (11,)
    assert res.cls_token_attn.shape == (11, 16)

    # reference: plain model on normalized fp32 images
    want = model.apply(
        {"params": params},
        normalize_images(jnp.asarray(imgs, jnp.float32) / 255.0),
    )
    np.testing.assert_allclose(
        res.logits, np.asarray(want.logits), rtol=0, atol=1e-4
    )
    np.testing.assert_allclose(
        res.cls_token_attn, np.asarray(want.cls_token_attn),
        rtol=0, atol=1e-5,
    )
    np.testing.assert_array_equal(
        res.top_class, np.argmax(np.asarray(want.logits), -1)
    )


def test_serving_engine_chunk_pad_mask_at_production_batch():
    """Pin the chunk/pad/mask math at the PRODUCTION chunk size B=160
    (VERDICT r3 #7): a ragged 397-image request = 2 full chunks + a
    77-image tail padded by 83; padding rows must never leak into the
    output, and the staged-chunk window must respect stage_window."""
    model = construct_ppnet(BK, PP)
    params = model.init(
        jax.random.key(2), jnp.zeros((1, 32, 32, 3))
    )["params"]
    rng = np.random.default_rng(9)
    imgs = (rng.uniform(size=(397, 32, 32, 3)) * 255).astype(np.uint8)

    engine = ServingEngine(
        BK, PP, params, batch_size=160,
        compute_dtype=jnp.float32, with_attn=True, stage_window=2,
    )
    res = engine(imgs)
    assert res.logits.shape == (397, 4)
    assert res.cls_token_attn.shape == (397, 16)
    assert engine.last_peak_staged <= 2

    # the tail rows must equal a direct forward on JUST those images
    # (zero-pad rows present in the compiled chunk, sliced off after)
    want = model.apply(
        {"params": params},
        normalize_images(jnp.asarray(imgs[320:], jnp.float32) / 255.0),
    )
    np.testing.assert_allclose(
        res.logits[320:], np.asarray(want.logits), rtol=0, atol=1e-4
    )

    # a single-chunk request through the same engine agrees with the
    # multi-chunk result on the shared images (chunking is invisible)
    res160 = engine(imgs[:160])
    np.testing.assert_allclose(
        res.logits[:160], res160.logits, rtol=0, atol=1e-5
    )


def test_serving_throughput_probe_counts_and_runs():
    """throughput_probe must execute the real chunk pipeline (on-device
    concat + one post-concat unpad slice) and report sane accounting."""
    model = construct_ppnet(BK, PP)
    params = model.init(
        jax.random.key(3), jnp.zeros((1, 32, 32, 3))
    )["params"]
    engine = ServingEngine(BK, PP, params, batch_size=8,
                           compute_dtype=jnp.float32)
    out = engine.throughput_probe(n_images=20, reps=2)
    assert out["n_images"] == 20
    assert out["chunks"] == 3  # 8 + 8 + 4(padded)
    assert out["img_per_sec"] > 0
    assert out["best_img_per_sec"] >= out["img_per_sec"] * 0.99


def test_serving_engine_dispatch_count_contract():
    """The structural line-rate contract (docs/DESIGN.md round-4): every
    chunk forward is chained through the ordering token, and the ONLY
    un-chained dispatch a request issues is the final concat+slice per
    output stream (one for logits; +1 for cls_token_attn). Per-chunk unpad
    slices would each serialize at one tunnel RTT — this pins they never
    come back."""
    model = construct_ppnet(BK, PP)
    params = model.init(
        jax.random.key(5), jnp.zeros((1, 32, 32, 3))
    )["params"]
    rng = np.random.default_rng(11)
    imgs = (rng.uniform(size=(11, 32, 32, 3)) * 255).astype(np.uint8)

    engine = ServingEngine(BK, PP, params, batch_size=4,
                           compute_dtype=jnp.float32)
    calls = []
    inner = engine._forward
    engine._forward = lambda p, x, tok: calls.append(x.shape) or inner(
        p, x, tok
    )
    engine(imgs)
    assert len(calls) == 3  # 4 + 4 + 3(padded): one chained dispatch each
    assert all(s == (4, 32, 32, 3) for s in calls)  # full-chunk, no slices
    assert engine.last_unchained_dispatches == 1  # final concat+slice only

    # with_attn adds exactly one more stream (its own concat+slice)
    engine2 = ServingEngine(BK, PP, params, batch_size=4,
                            compute_dtype=jnp.float32, with_attn=True)
    engine2(imgs)
    assert engine2.last_unchained_dispatches == 2

    # the probe pipeline honors the same contract
    out = engine.throughput_probe(n_images=11, reps=1)
    assert out["chunks"] == 3
    assert engine.last_unchained_dispatches == 1


def test_serving_engine_rejects_float_input():
    model = construct_ppnet(BK, PP)
    params = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3))
    )["params"]
    engine = ServingEngine(BK, PP, params, batch_size=2,
                           compute_dtype=jnp.float32)
    try:
        engine(np.zeros((2, 32, 32, 3), np.float32))
    except ValueError as e:
        assert "uint8" in str(e)
    else:
        raise AssertionError("float input must be rejected")


def test_serving_engine_multichip_bit_identical_to_single_device():
    """Mesh serving scale-out (replicated params, request chunks sharded on
    the data axis): ragged request sizes across several chunks must match
    the single-device engine.

    Tolerance note: the sharded program compiles per-shard (B/8) shapes, so
    XLA groups fp32 reductions differently than the single-device (B) shape
    — measured <=2e-6 on logits. Bit-identity across different compiled
    shapes is not an XLA contract; argmax classes must still be EQUAL."""
    from protopformer_tpu.parallel import make_mesh

    model = construct_ppnet(BK, PP)
    params = model.init(
        jax.random.key(1), jnp.zeros((1, 32, 32, 3))
    )["params"]
    rng = np.random.default_rng(7)

    mesh = make_mesh()  # 8 virtual CPU devices (conftest)
    assert mesh.size == 8
    single = ServingEngine(
        BK, PP, params, batch_size=16,
        compute_dtype=jnp.float32, with_attn=True,
    )
    multi = ServingEngine(
        BK, PP, params, batch_size=2,  # per chip -> same 16-image chunk
        compute_dtype=jnp.float32, with_attn=True, mesh=mesh,
        stage_window=2,
    )
    assert multi.batch_size == 16
    for n in (1, 16, 37):  # sub-chunk, exact, ragged multi-chunk
        imgs = (rng.uniform(size=(n, 32, 32, 3)) * 255).astype(np.uint8)
        a = single(imgs)
        b = multi(imgs)
        np.testing.assert_allclose(a.logits, b.logits, rtol=0, atol=1e-5)
        np.testing.assert_array_equal(a.top_class, b.top_class)
        np.testing.assert_allclose(
            a.cls_token_attn, b.cls_token_attn, rtol=0, atol=1e-6
        )
