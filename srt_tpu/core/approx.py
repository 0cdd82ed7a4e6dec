"""Shared special-function approximations (reference ``common.h:16-78``).

The reference evaluates erf with the A&S 7.1.26 polynomial
(``common.h:26-45``) and erfinv with the Giles single-precision rational
fit (``common.h:47-78``); this module provides the same approximations as
pure jnp elementwise math. They serve two purposes:

* reference fidelity — the Beckmann VNDF inversion consumes *these*
  curves in the C++, not libm's;
* backend agreement — the fused-bounce Pallas kernel
  (``pallas/bounce.py``) cannot lower ``lax.erf``/``asin``/``acos``
  (unimplemented in Mosaic), and using one shared implementation on both
  the XLA and Pallas paths keeps their Beckmann sample streams aligned —
  otherwise ulp-level disagreement in the inversion seeds chaotic path
  divergence and images decorrelate sample-by-sample.

All functions are elementwise jnp and safe inside Pallas kernels.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def erf_as(x):
    """A&S 7.1.26 erf (reference ``common.h:26-45``); |err| <= 1.5e-7."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
                - 0.284496736) * t + 0.254829592) * t * jnp.exp(-ax * ax)
    return s * y


def erf_reference_buggy(x):
    """The reference's Erf *as implemented* (``common.h:40-44``) — NOT erf.

    The A&S 7.1.26 evaluation contains a typo: the final term reads
    ``1 - poly(t)*t + exp(-x*x)`` — the exponential is ADDED instead of
    multiplying the polynomial. Result: Erf(0) ~= 1.00004, Erf(0.29)
    ~= 1.178, monotone up to ~2 at x~1.6. This broken curve is the
    bisection bound and CDF normalization of the reference's Beckmann
    VNDF inversion (microfacet_distribution.h:55-71), so it *shapes
    every Beckmann highlight* the reference renders; ref-parity sampling
    must use it (physically-correct mode uses :func:`erf_as`).
    """
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly_t = (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
               - 0.284496736) * t + 0.254829592) * t
    return s * (1.0 - poly_t + jnp.exp(-ax * ax))


def erfinv_giles(x):
    """Giles (2010) single-precision erfinv (reference ``common.h:47-78``)."""
    x = jnp.clip(x, -0.99999, 0.99999)
    w = -jnp.log(jnp.maximum((1.0 - x) * (1.0 + x), 1e-30))
    # central branch (w < 5)
    wc = w - 2.5
    p = jnp.float32(2.81022636e-08)
    for c in (3.43273939e-07, -3.5233877e-06, -4.39150654e-06,
              0.00021858087, -0.00125372503, -0.00417768164,
              0.246640727, 1.50140941):
        p = jnp.float32(c) + p * wc
    # tail branch
    wt = jnp.sqrt(jnp.maximum(w, 1e-30)) - 3.0
    q = jnp.float32(-0.000200214257)
    for c in (0.000100950558, 0.00134934322, -0.00367342844,
              0.00573950773, -0.0076224613, 0.00943887047,
              1.00167406, 2.83297682):
        q = jnp.float32(c) + q * wt
    return jnp.where(w < 5.0, p, q) * x


def acos_as(x):
    """A&S 4.4.45 acos via reflection; |err| <= 6.7e-5 rad."""
    ax = jnp.clip(jnp.abs(x), 0.0, 1.0)
    p = jnp.sqrt(1.0 - ax) * (1.5707288 + ax * (-0.2121144
                                                + ax * (0.0742610
                                                        - 0.0187293 * ax)))
    return jnp.where(x >= 0.0, p, np.float32(np.pi) - p)


def asin_as(x):
    return np.float32(0.5 * np.pi) - acos_as(x)


def atan2_poly(z, x):
    """Quadrant-correct atan2 from an odd minimax atan on [0, 1];
    |err| ~ 1e-5 rad."""
    ax, az = jnp.abs(x), jnp.abs(z)
    hi = jnp.maximum(ax, az)
    lo = jnp.minimum(ax, az)
    r = lo / jnp.maximum(hi, 1e-30)
    r2 = r * r
    a = r * (0.9998660 + r2 * (-0.3302995 + r2 * (0.1801410
                                                  + r2 * (-0.0851330
                                                          + 0.0208351 * r2))))
    a = jnp.where(az > ax, np.float32(0.5 * np.pi) - a, a)
    a = jnp.where(x < 0.0, np.float32(np.pi) - a, a)
    return jnp.where(z < 0.0, -a, a)


def cbrt_pos(x):
    """Cube root for non-negative arguments (Mosaic has no cbrt)."""
    return jnp.exp(jnp.log(jnp.maximum(x, 1e-30)) * np.float32(1.0 / 3.0))
