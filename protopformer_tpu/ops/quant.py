"""Dynamic int8 quantization for the serving path.

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 FLOP rate
(394 vs 197 TOPS), and the dense/MLP stack is the largest single cost of
the PPNet serving forward. This module implements the standard
weights-per-column / activations-per-row dynamic scheme:

    y = (x_q @ w_q) * s_x * s_w,   x_q = round(x / s_x), s_x = max|x|/127

Weights are quantized from the fp32 params at trace time (kernels are tiny
next to the batch work, and keeping fp32 params means checkpoints, the
torch converter, and the optimizer are untouched). Activations are
quantized per token — one fused abs-max pass per matmul.

This is a SERVING feature, off by default (``BackboneConfig.quantize``):
the reference's own AMP-fp16 eval is the precision analogue of bf16 mode;
int8 is a further, explicitly-opted trade documented by its contract test
(top-k selection overlap vs the fp32 oracle, tests/test_quant.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_rowwise(x: jax.Array):
    """Per-row (last-axis) symmetric int8 quantization.

    Args:
      x: (..., K) float array.
    Returns:
      (x_q int8 (..., K), scale fp32 (..., 1)) with x ~= x_q * scale.
    """
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(ax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def quantize_colwise(w: jax.Array):
    """Per-output-column symmetric int8 quantization of a (K, M) matrix."""
    aw = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    scale = jnp.maximum(aw, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_matmul(x: jax.Array, w: jax.Array, out_dtype=jnp.float32):
    """``x @ w`` on the int8 MXU path with dynamic activation scales.

    Args:
      x: (..., K) activations (any float dtype).
      w: (K, M) fp32 weights.
    Returns:
      (..., M) in ``out_dtype``.
    """
    xq, sx = quantize_rowwise(x)
    wq, sw = quantize_colwise(w)
    acc = jax.lax.dot_general(
        xq, wq,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * sx * sw).astype(out_dtype)
