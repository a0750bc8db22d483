"""int8 quantized-serving contract tests (ops/quant.py, layers.QuantDense).

The int8 path is an opt-in SERVING mode (BackboneConfig.quantize="int8").
Measured on v5e it is currently SLOWER than bf16 for DeiT-Ti/S (the
dynamic-quantization VPU work outweighs the int8 MXU rate at these widths;
see docs/DESIGN.md), so nothing defaults to it — but the contract is
pinned so the mode stays usable where it wins.
"""

import numpy as np
import jax
import jax.numpy as jnp

from protopformer_tpu.core.config import BackboneConfig, PPNetConfig
from protopformer_tpu.data.preprocess import normalize_images
from protopformer_tpu.models import construct_ppnet
from protopformer_tpu.ops.quant import (
    int8_matmul,
    quantize_colwise,
    quantize_rowwise,
)

TINY = dict(
    name="tiny-test", arch="deit", img_size=32, patch_size=8,
    embed_dim=24, depth=3, num_heads=2, drop_path_rate=0.0,
)
TINY_PPNET = PPNetConfig(
    prototype_shape=(40, 16, 1, 1), num_classes=4,
    reserve_layers=(2,), reserve_token_nums=(9,),
    use_global=True, global_proto_per_class=3,
)


def test_int8_matmul_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(7, 33, 48)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(48, 21)).astype(np.float32))
    got = int8_matmul(x, w)
    want = jnp.einsum("bnk,km->bnm", x, w)
    # per-element error bound: ~|x|_max |w|_max K / 127 scale-quantization
    denom = jnp.abs(want).max()
    rel = float(jnp.abs(got - want).max() / denom)
    assert rel < 0.05, rel


def test_quantize_roundtrip_scales():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(5, 16)).astype(np.float32)) * 3.7
    q, s = quantize_rowwise(x)
    assert q.dtype == jnp.int8
    back = q.astype(jnp.float32) * s
    assert float(jnp.abs(back - x).max()) <= float(s.max()) * 0.5 + 1e-6
    w = x.T
    qw, sw = quantize_colwise(w)
    backw = qw.astype(jnp.float32) * sw
    assert float(jnp.abs(backw - w).max()) <= float(sw.max()) * 0.5 + 1e-6


def test_int8_model_same_param_tree_and_selection():
    """quantize='int8' consumes the SAME params and keeps the top-k
    selection close to the fp32 model (contract: >= k-2 overlap at tiny
    scale, random init — the adversarial case)."""
    images = jnp.asarray(
        np.random.default_rng(7).uniform(size=(3, 32, 32, 3)).astype(
            np.float32
        )
    )
    m = construct_ppnet(BackboneConfig(**TINY), TINY_PPNET)
    mq = construct_ppnet(
        BackboneConfig(**TINY, quantize="int8"), TINY_PPNET,
        compute_dtype=jnp.bfloat16,
    )
    params = m.init(jax.random.key(0), images)["params"]
    x = normalize_images(images)
    o = m.apply({"params": params}, x)
    oq = mq.apply({"params": params}, x)  # identical tree
    s, sq = np.asarray(o.cls_token_attn), np.asarray(oq.cls_token_attn)
    k = 9
    for i in range(s.shape[0]):
        a = set(np.argsort(-s[i])[:k].tolist())
        b = set(np.argsort(-sq[i])[:k].tolist())
        assert len(a & b) >= k - 2, (i, len(a & b))
    corr = np.corrcoef(
        np.asarray(o.logits).ravel(), np.asarray(oq.logits).ravel()
    )[0, 1]
    assert corr > 0.98, corr
