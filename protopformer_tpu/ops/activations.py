"""Activation functions tuned for TPU/XLA lowering.

``gelu_exact``: exact-erf GELU semantics (torch's ``nn.GELU`` default — the
reference's activation, timm Mlp) WITHOUT ``lax.erf``: XLA's erf lowering on
TPU costs ~2.3 ms per 12-block DeiT-Ti stack at B=96 (measured; it defeats
fusion), while the Abramowitz & Stegun 7.1.26 rational approximation
(max |erf err| 1.5e-7, max |gelu err| < 1e-6 — inside the 1e-4 parity
budget) fuses into the surrounding denses and saves ~1.3 ms of the stack.
Differentiable everywhere except x=0 (sign/abs), like relu.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def erf_as(x: jax.Array) -> jax.Array:
    """fp32 erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7)."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741
                                   + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


@jax.custom_jvp
def gelu_exact(x: jax.Array) -> jax.Array:
    """Exact-erf GELU (torch default) with the fast erf; computes in fp32
    and returns ``x.dtype``.

    The JVP is the ANALYTIC gelu derivative Phi(x) + x*phi(x) (phi the
    standard-normal pdf) rather than autodiff through the A&S polynomial —
    both more accurate and ~1.1 ms faster per 12-block fwd+bwd at B=96."""
    xf = x.astype(jnp.float32)
    out = xf * 0.5 * (1.0 + erf_as(xf * (2.0 ** -0.5)))
    return out.astype(x.dtype)


@gelu_exact.defjvp
def _gelu_exact_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    xf = x.astype(jnp.float32)
    cdf = 0.5 * (1.0 + erf_as(xf * (2.0 ** -0.5)))
    pdf = jnp.exp(-0.5 * xf * xf) * 0.3989422804014327  # 1/sqrt(2*pi)
    grad = (cdf + xf * pdf).astype(x.dtype)
    return gelu_exact(x), grad * dx


def gelu_speed(x: jax.Array) -> jax.Array:
    """tanh-approximation GELU for the bf16 SPEED path.

    The exact-erf rational costs ~40 fp32 elementwise ops (incl. divide +
    exp) over the (B, N, 4C) hidden — the hottest fusion in the whole
    serving program (docs/DESIGN.md round-2 profile). The tanh form is the
    cheapest lowering measured (2.8 vs 3.8 ms per isolated 12-block stack)
    and its deviation from exact GELU (max ~1e-3 absolute) sits inside
    bf16 rounding noise — pinned by the speed-mode selection contract
    test. fp32 parity mode always uses ``gelu_exact``.
    """
    xf = x.astype(jnp.float32)
    inner = 0.7978845608028654 * (xf + 0.044715 * xf * xf * xf)
    return (xf * 0.5 * (1.0 + jnp.tanh(inner))).astype(x.dtype)
