"""Ray pytree: SoA batch of rays (reference: ``Raytracing_n/ray.h:6-19``)."""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Ray(NamedTuple):
    """A batch of rays. All fields share a leading batch shape ``(...,)``.

    ``direction`` is kept unit-length by construction everywhere in this
    framework (the reference normalizes in ``camera::get_ray``,
    ``camera.h:57``, so all primary rays are unit too; keeping the invariant
    lets intersection code drop per-primitive renormalization).
    """
    origin: jnp.ndarray      # (..., 3)
    direction: jnp.ndarray   # (..., 3), unit
    time: jnp.ndarray        # (...,) shutter time in [t0, t1]

    def at(self, t):
        """Point at parameter t (reference ``ray.h:14``)."""
        return self.origin + t[..., None] * self.direction
