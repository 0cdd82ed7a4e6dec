"""Film: sample accumulation and tone mapping.

The reference's writeback is mean -> sqrt gamma -> clamp [0,255]
(``Raytracing_n.cpp:848-867``); reproduced here as pure array ops, plus a
linear (pre-gamma) output for the differentiable pipeline, where losses
should be computed in linear radiometric space.
"""
from __future__ import annotations

import jax.numpy as jnp


def tonemap(linear):
    """sqrt gamma + clamp to [0, 1] (``Raytracing_n.cpp:850-862``)."""
    return jnp.clip(jnp.sqrt(jnp.maximum(linear, 0.0)), 0.0, 1.0)


def to_uint8(img01):
    """255.99 quantization as in ``Raytracing_n.cpp:853-855``."""
    return jnp.clip((255.99 * img01), 0.0, 255.0).astype(jnp.uint8)
