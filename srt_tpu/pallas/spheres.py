"""Pallas TPU kernel: fused sphere sweep (static + moving + env spheres).

The XLA path (``render/intersect.py:intersect_spheres``) evaluates the
quadratic for every (ray, sphere) pair as a chain of ~dozens of fused VPU
ops per sphere chunk; per PERF.md the regen engine at ball_scenes scale is
launch/occupancy-bound, not flop-bound, so folding the whole sweep into
ONE kernel per wavefront removes most of the per-bounce op overhead for
sphere-heavy scenes (ball_scenes 123, random_scene 990, final 1176).

The kernel returns only the winning sphere index per ray (+ its t for
selection); the caller re-derives t *differentiably* in XLA for the single
winning sphere, so sphere-geometry gradients match the XLA path (the
discrete winner is detached, exactly like argmin's).

Sphere data lives as broadcast VMEM planes (ceil(S/128), 128); the kernel
walks spheres with a ``fori_loop`` + one-hot scalar fetches, slab-free:
~40 VPU ops per sphere per 8x128-ray tile.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = np.float32(3.0e38)
_TILE = 8 * 128

# Engage only when the sweep is wide enough to beat per-launch overhead.
MIN_SPHERES = 8

# Measured on 1 TPU v5e (PERF.md): the fori_loop-over-spheres kernel with
# one-hot scalar fetches LOSES to XLA's batched (rays x spheres) sweep —
# ball_scenes 2.31M vs 2.37M rays/s, random_scene (990 spheres) 263k vs
# 334k. XLA parallelizes over the sphere axis; the kernel serializes it.
# Kept as an opt-in experiment (the one-hot fetch pattern only pays for
# data-dependent tree walks, not dense sweeps).
def pallas_spheres_available(scene, interpret: bool = False) -> bool:
    import os
    if not os.environ.get("SRT_TPU_SPHERE_KERNEL"):
        return False
    if scene.n_spheres < MIN_SPHERES:
        return False
    if interpret:
        return True
    return jax.default_backend() == "tpu"


def _plane(x, dtype):
    k = x.shape[0]
    rows = -(-k // 128)
    return jnp.pad(jnp.asarray(x, dtype),
                   (0, rows * 128 - k)).reshape(rows, 128)


@functools.partial(jax.jit, static_argnames=("interpret", "t_min"))
def sphere_winner_pallas(scene, ray, t_min, interpret: bool = False):
    """(t, sphere_index) closest-hit per ray; index -1 on miss.

    Semantics of ``render/intersect.py:_sphere_chunk`` (sphere.h:36-66,
    moving_sphere.h:24-51, env_sphere.h:27-38) with first-minimum ties.
    """
    n = ray.origin.shape[0]
    s = int(scene.sph_radius.shape[0])

    c0 = scene.sph_center0
    delta = scene.sph_center1 - scene.sph_center0
    tt0 = scene.sph_times[:, 0]
    inv_dt = 1.0 / jnp.maximum(scene.sph_times[:, 1] - scene.sph_times[:, 0],
                               1e-20)
    planes = [
        _plane(c0[:, 0], jnp.float32), _plane(c0[:, 1], jnp.float32),
        _plane(c0[:, 2], jnp.float32),
        _plane(delta[:, 0], jnp.float32), _plane(delta[:, 1], jnp.float32),
        _plane(delta[:, 2], jnp.float32),
        _plane(tt0, jnp.float32), _plane(inv_dt, jnp.float32),
        _plane(scene.sph_radius ** 2, jnp.float32),
        _plane(scene.sph_env.astype(jnp.int32), jnp.int32),
    ]

    n_pad = -(-n // _TILE) * _TILE
    grid = n_pad // _TILE

    def tiled(x, fill):
        return jnp.pad(jnp.asarray(x, jnp.float32), (0, n_pad - n),
                       constant_values=fill).reshape(grid * 8, 128)

    rx = tiled(ray.origin[:, 0], 0.0)
    ry = tiled(ray.origin[:, 1], 0.0)
    rz = tiled(ray.origin[:, 2], 0.0)
    dx = tiled(ray.direction[:, 0], 0.0)
    dy = tiled(ray.direction[:, 1], 0.0)
    dz = tiled(ray.direction[:, 2], 1.0)
    tm = tiled(ray.time, 0.0)

    kernel = functools.partial(_kernel, n_spheres=s, t_min=float(t_min))
    ray_spec = pl.BlockSpec((8, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((8, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    t, idx = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[ray_spec] * 7 + [full] * len(planes),
        out_specs=(out_spec, pl.BlockSpec((8, 128), lambda i: (i, 0),
                                          memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((grid * 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((grid * 8, 128), jnp.int32),
        ),
        interpret=interpret,
    )(rx, ry, rz, dx, dy, dz, tm, *planes)

    flat = lambda a: a.reshape(-1)[:n]  # noqa: E731
    return flat(t), flat(idx)


def _kernel(rx_ref, ry_ref, rz_ref, dx_ref, dy_ref, dz_ref, tm_ref,
            cx_ref, cy_ref, cz_ref, ex_ref, ey_ref, ez_ref,
            tt0_ref, idt_ref, r2_ref, env_ref,
            t_ref, idx_ref, *, n_spheres: int, t_min: float):
    ox, oy, oz = rx_ref[:], ry_ref[:], rz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    rt = tm_ref[:]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def fetch(ref, i, zero):
        row = ref[pl.ds(i // 128, 1), :]
        return jnp.sum(jnp.where(lane == (i % 128), row, zero))

    def body(i, carry):
        t_best, i_best = carry
        cx = fetch(cx_ref, i, 0.0)
        cy = fetch(cy_ref, i, 0.0)
        cz = fetch(cz_ref, i, 0.0)
        ex = fetch(ex_ref, i, 0.0)
        ey = fetch(ey_ref, i, 0.0)
        ez = fetch(ez_ref, i, 0.0)
        tt0 = fetch(tt0_ref, i, 0.0)
        idt = fetch(idt_ref, i, 0.0)
        r2 = fetch(r2_ref, i, 0.0)
        env = fetch(env_ref, i, 0) > 0

        # Motion lerp per lane (moving_sphere.h:19-21).
        f = (rt - tt0) * idt
        ocx = ox - (cx + ex * f)
        ocy = oy - (cy + ey * f)
        ocz = oz - (cz + ez * f)
        b = ocx * dx + ocy * dy + ocz * dz
        c = ocx * ocx + ocy * ocy + ocz * ocz - r2
        disc = b * b - c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t0 = -b - sq
        t1 = -b + sq
        ok = disc > 0.0
        valid0 = ok & (t0 > t_min) & (t0 < _BIG)
        valid1 = ok & (t1 > t_min) & (t1 < _BIG)
        t = jnp.where(valid0, t0, jnp.where(valid1, t1, _BIG))
        # env_sphere always "hits" at the far crossing (env_sphere.h:27-38).
        t = jnp.where(env, jnp.where(t1 > t_min, t1, _BIG), t)

        better = t < t_best
        return (jnp.where(better, t, t_best),
                jnp.where(better, i, i_best))

    shape = ox.shape
    init = (jnp.full(shape, _BIG, jnp.float32),
            jnp.full(shape, -1, jnp.int32))
    t_best, i_best = jax.lax.fori_loop(0, n_spheres, body, init)
    t_ref[:] = t_best
    idx_ref[:] = i_best
