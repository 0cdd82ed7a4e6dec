"""Per-phase timing: raygen / intersect / media / shade split (SURVEY §5).

Times each pipeline phase in isolation on a fixed wavefront by jitting
progressively larger prefixes of one bounce and differencing:

  raygen           camera.rays for W lanes
  + intersect      intersect_scene (spheres/rects + BVH/Pallas kernels)
  + full bounce    bounce_step (adds media, emission, NEE mixture, shading)

Each prefix is timed with host-transfer sync (block_until_ready does not
block under the tunneled axon TPU). Prints one JSON line.

Usage: python tools/phases.py [--scene ball_scenes] [--lanes 65536]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="ball_scenes")
    ap.add_argument("--lanes", type=int, default=1 << 16)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from srt_tpu.utils.cache import enable as enable_cache
    enable_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from srt_tpu.core.rng import RaySampler
    from srt_tpu.render.integrator import bounce_step
    from srt_tpu.render.intersect import intersect_scene
    from srt_tpu.scene.ir import SceneFlags
    from srt_tpu.scene.library import get_scene

    scene, camera, _ = get_scene(args.scene, aspect=1.0)
    flags = SceneFlags.of(scene)
    n = args.lanes
    pix = jnp.arange(n, dtype=jnp.int32) % (512 * 512)
    samp = jnp.zeros((n,), jnp.int32)
    sampler = RaySampler.create(0, pix, samp)

    @jax.jit
    def raygen(seed):
        s = RaySampler.create(seed, pix, samp)
        u = (pix % 512).astype(jnp.float32) / 512
        v = (pix // 512).astype(jnp.float32) / 512
        return camera.rays(u, v, s.uniform(32), s.uniform(33),
                           s.uniform(34))

    rays0 = raygen(0)

    @jax.jit
    def isect(scene, rays):
        h = intersect_scene(scene, rays, 1e-3, 3.0e38, flags)
        return h.t, h.mat

    @jax.jit
    def bounce(scene, rays, salt):
        st = dict(o=rays.origin, d=rays.direction, time=rays.time,
                  beta=jnp.ones((n, 3), jnp.float32),
                  radiance=jnp.zeros((n, 3), jnp.float32),
                  alive=jnp.ones((n,), bool), salt=salt,
                  depth=jnp.zeros((n,), jnp.int32))
        out = bounce_step(scene, st, 50, 1 << 30, flags)
        return out["radiance"], out["beta"], out["d"]

    def timeit(fn, *a):
        np.asarray(jax.tree.leaves(fn(*a))[0])  # compile+warm
        t0 = time.time()
        for _ in range(args.reps):
            np.asarray(jax.tree.leaves(fn(*a))[0])
        return (time.time() - t0) / args.reps

    t_raygen = timeit(raygen, 1)
    t_isect = timeit(isect, scene, rays0)
    t_bounce = timeit(bounce, scene, rays0, sampler.salt)

    out = {
        "metric": "phase_seconds_per_wavefront",
        "scene": args.scene, "lanes": n,
        "device": jax.devices()[0].device_kind,
        "raygen_s": round(t_raygen, 5),
        "intersect_s": round(t_isect, 5),
        "bounce_s": round(t_bounce, 5),
        "shade_s(est bounce - intersect)": round(t_bounce - t_isect, 5),
        "lanes_per_sec_bounce": round(n / t_bounce, 1),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
