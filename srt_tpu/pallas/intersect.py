"""Pallas TPU kernel: tile-coherent BVH traversal + triangle intersection.

The XLA fallback (``render/intersect.py:intersect_tris``) advances a
*per-ray* node cursor in one global ``lax.while_loop``: every step costs two
(N,)-wide HBM gathers of node data and the loop runs until the slowest ray
of the entire wavefront finishes. This kernel restructures the traversal
for the TPU's vector memory instead:

* The wavefront is split into 8x128-ray tiles (one grid program each).
* Each tile walks the skip-link BVH with a **single scalar cursor**: one
  traversal step loads one node (dynamic-sublane row loads from
  VMEM-resident component arrays — no gathers) and slab-tests it against
  all 1024 rays at once. The tile descends iff *any* live ray wants to
  (per-lane ``t_best`` pruning keeps the test tight); leaves run masked
  Möller–Trumbore against the leaf's contiguous triangles for every lane.
* A tile therefore visits the *union* of the nodes its rays need — cheap
  for coherent tiles (primary rays, which the regeneration engine keeps
  adjacent by construction), bounded by the whole tree for incoherent
  ones; different tiles finish independently instead of in global
  lockstep.

Node/triangle scalars live as ``(ceil(K/128), 128)`` f32/i32 planes so a
scalar fetch is a (1, 128) sublane load + one-hot lane extract — the
layout that avoids the TPU's unsupported dynamic *lane* indexing while
wasting no VMEM on padding.

Scope: scenes whose BVH + triangles fit in VMEM (~bunny scale, <= ~2 MB);
``pallas_available`` gates dispatch and everything falls back to the XLA
path otherwise. Bit-compatibility: same traversal order and the same
arithmetic as the XLA path up to fma/reassociation differences.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = np.float32(3.0e38)
_TILE = 8 * 128  # rays per grid program

# VMEM budget for scene data (nodes + tris), bytes. Leaves headroom for
# the ray tile, carries, and double-buffering out of ~16 MB.
_VMEM_SCENE_BUDGET = 6 * 1024 * 1024


def pallas_available(scene, interpret: bool = False) -> bool:
    """True when the scene's mesh data fits the kernel's VMEM budget."""
    if scene.n_tris == 0:
        return False
    node_bytes = scene.n_bvh_nodes * (6 * 4 + 3 * 4)
    tri_bytes = scene.n_tris * 9 * 4
    if node_bytes + tri_bytes > _VMEM_SCENE_BUDGET:
        return False
    if interpret:
        return True
    return jax.default_backend() == "tpu"


def _plane(x, dtype):
    """(K,) -> (ceil(K/128), 128) plane, padded with zeros."""
    k = x.shape[0]
    rows = -(-k // 128)
    pad = rows * 128 - k
    return jnp.pad(jnp.asarray(x, dtype), (0, pad)).reshape(rows, 128)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "t_min", "leaf_size"))
def intersect_tris_pallas(scene, ray, t_min, interpret: bool = False,
                          leaf_size: int = 4):
    """Closest-hit over the triangle BVH -> (t, u, v, tri_index) per ray.

    Caller (``render/intersect.py``) assembles the Hit record (uv/normal/
    material gathers stay in XLA, where gathers are fine).
    """
    n = ray.origin.shape[0]
    n_nodes = int(scene.n_bvh_nodes)
    n_tris = int(scene.n_tris)

    # --- scene planes (VMEM-resident, replicated across the grid) --------
    planes_f = [
        _plane(scene.bvh_lo[:, 0], jnp.float32),
        _plane(scene.bvh_lo[:, 1], jnp.float32),
        _plane(scene.bvh_lo[:, 2], jnp.float32),
        _plane(scene.bvh_hi[:, 0], jnp.float32),
        _plane(scene.bvh_hi[:, 1], jnp.float32),
        _plane(scene.bvh_hi[:, 2], jnp.float32),
    ]
    planes_i = [
        _plane(scene.bvh_skip, jnp.int32),
        _plane(scene.bvh_first, jnp.int32),
        _plane(scene.bvh_count, jnp.int32),
    ]
    tri_planes = []
    for comp in (scene.tri_p0, scene.tri_p1, scene.tri_p2):
        for a in range(3):
            tri_planes.append(_plane(comp[:, a], jnp.float32))

    # --- ray tiles -------------------------------------------------------
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
    dz = tiled(ray.direction[:, 2], 1.0)  # pad rays point +z from origin

    kernel = functools.partial(_kernel, n_nodes=n_nodes,
                               t_min=float(t_min), leaf_size=leaf_size)

    ray_spec = pl.BlockSpec((8, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((8, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    t, u, v, idx = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[ray_spec] * 6 + [full] * (len(planes_f) + len(planes_i)
                                            + len(tri_planes)),
        out_specs=(out_spec, out_spec, out_spec,
                   pl.BlockSpec((8, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((grid * 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((grid * 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((grid * 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((grid * 8, 128), jnp.int32),
        ),
        interpret=interpret,
    )(rx, ry, rz, dx, dy, dz, *planes_f, *planes_i, *tri_planes)

    flat = lambda a: a.reshape(-1)[:n]  # noqa: E731
    return flat(t), flat(u), flat(v), flat(idx)


def _kernel(rx_ref, ry_ref, rz_ref, dx_ref, dy_ref, dz_ref,
            lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
            skip_ref, first_ref, count_ref,
            ax_ref, ay_ref, az_ref, bx_ref, by_ref, bz_ref,
            cx_ref, cy_ref, cz_ref,
            t_ref, u_ref, v_ref, idx_ref, *, n_nodes: int, t_min: float,
            leaf_size: int = 4):
    ox, oy, oz = rx_ref[:], ry_ref[:], rz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)

    ivx, ivy, ivz = safe_inv(dx), safe_inv(dy), safe_inv(dz)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def fetch_f(ref, i):
        row = ref[pl.ds(i // 128, 1), :]                    # (1, 128)
        return jnp.sum(jnp.where(lane == (i % 128), row, 0.0))

    def fetch_i(ref, i):
        row = ref[pl.ds(i // 128, 1), :]
        return jnp.sum(jnp.where(lane == (i % 128), row, 0))

    def tri_fetch(i):
        """Nine scalars of triangle ``i``."""
        return [fetch_f(r, i) for r in
                (ax_ref, ay_ref, az_ref, bx_ref, by_ref, bz_ref,
                 cx_ref, cy_ref, cz_ref)]

    def moller(i, t_best, u_best, v_best, i_best, lane_ok):
        """Masked Möller–Trumbore of scalar-broadcast triangle ``i``
        against the whole tile (math of render/intersect.py:_tri_intersect,
        triangle.h:117-188)."""
        p0x, p0y, p0z, p1x, p1y, p1z, p2x, p2y, p2z = tri_fetch(i)
        e1x, e1y, e1z = p1x - p0x, p1y - p0y, p1z - p0z
        e2x, e2y, e2z = p2x - p0x, p2y - p0y, p2z - p0z
        # pvec = d x e2  (per-lane direction, scalar edge)
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
        valid = ((jnp.abs(det) > 1e-10) & (u >= 0.0) & (v >= 0.0)
                 & (u + v <= 1.0) & (t > t_min) & (t < t_best))
        better = lane_ok & valid
        return (jnp.where(better, t, t_best),
                jnp.where(better, u, u_best),
                jnp.where(better, v, v_best),
                jnp.where(better, i, i_best))

    def cond(carry):
        return carry[0] < n_nodes

    def body(carry):
        cursor, t_best, u_best, v_best, i_best = carry
        lo_x = fetch_f(lox_ref, cursor)
        lo_y = fetch_f(loy_ref, cursor)
        lo_z = fetch_f(loz_ref, cursor)
        hi_x = fetch_f(hix_ref, cursor)
        hi_y = fetch_f(hiy_ref, cursor)
        hi_z = fetch_f(hiz_ref, cursor)
        skip = fetch_i(skip_ref, cursor)
        first = fetch_i(first_ref, cursor)
        count = fetch_i(count_ref, cursor)

        # Slab test (aabb.h:10-62) for all 1024 rays against this node.
        t0x = (lo_x - ox) * ivx
        t1x = (hi_x - ox) * ivx
        t0y = (lo_y - oy) * ivy
        t1y = (hi_y - oy) * ivy
        t0z = (lo_z - oz) * ivz
        t1z = (hi_z - oz) * ivz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.minimum(t0z, t1z))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.maximum(t0z, t1z))
        box_hit = (tf >= jnp.maximum(tn, t_min)) & (tn < t_best)
        any_hit = jnp.any(box_hit)
        is_leaf = first >= 0

        def leaf_fn(args):
            t_b, u_b, v_b, i_b = args
            for j in range(leaf_size):  # static leaf width (SceneFlags.bvh_leaf)
                tri = jnp.minimum(first + j, count + first - 1)
                tri = jnp.maximum(tri, 0)
                lane_ok = box_hit & (j < count)
                t_b, u_b, v_b, i_b = moller(tri, t_b, u_b, v_b, i_b,
                                            lane_ok)
            return t_b, u_b, v_b, i_b

        do_leaf = any_hit & is_leaf
        t_best, u_best, v_best, i_best = jax.lax.cond(
            do_leaf, leaf_fn, lambda a: a, (t_best, u_best, v_best, i_best))

        descend = any_hit & (~is_leaf)
        nxt = jnp.where(descend, cursor + 1, skip)
        return nxt, t_best, u_best, v_best, i_best

    shape = ox.shape
    init = (jnp.int32(0),
            jnp.full(shape, _BIG, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.int32))
    _, t_best, u_best, v_best, i_best = jax.lax.while_loop(cond, body, init)

    t_ref[:] = t_best
    u_ref[:] = u_best
    v_ref[:] = v_best
    idx_ref[:] = i_best
