"""Pallas TPU kernel: two-level BVH traversal for meshes beyond VMEM.

The single-level kernel (``pallas/intersect.py``) requires the whole BVH +
triangles resident in VMEM (~bunny scale). This kernel removes the cap
(VERDICT round-2 item 2): the scene build cuts the flat skip-link BVH into
a small **top-level tree** over fixed-size **clusters**
(``accel/cluster.py``). Per 8x128-ray tile:

* the top tree (a few KB) is VMEM-resident and walked with one scalar
  cursor exactly like the single-level kernel;
* when the tile wants a cluster leaf, the cluster's padded node/triangle
  block is DMA'd from HBM into a VMEM scratch slot
  (``pltpu.make_async_copy`` with a dynamic leading index) and traversed
  locally — slab tests and masked Möller–Trumbore against all 1024 lanes.

A cluster visit costs one ~27 KB DMA (~μs) against thousands of VPU cycles
of traversal work, so blocking DMA is fine; the win over the XLA lockstep
``while_loop`` (``render/intersect.py:intersect_tris``) is the same as the
small kernel's: node data is broadcast from VMEM instead of gathered from
HBM per ray, and tiles finish independently.
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

# Top-tree VMEM budget: 7 planes x 4 B; 64k nodes ~ 1.8 MB is plenty.
_TOP_BUDGET_NODES = 64 * 1024


def pallas_big_available(scene, interpret: bool = False) -> bool:
    """True when the scene carries a clustered BVH the kernel can traverse."""
    if getattr(scene, "cl_tris", None) is None or scene.n_tris == 0:
        return False
    if scene.top_skip.shape[0] > _TOP_BUDGET_NODES:
        return False
    if interpret:
        return True
    return jax.default_backend() == "tpu"


def _plane(x, dtype):
    k = x.shape[0]
    rows = -(-k // 128)
    return jnp.pad(jnp.asarray(x, dtype),
                   (0, rows * 128 - k)).reshape(rows, 128)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "t_min", "leaf_size"))
def intersect_tris_pallas_big(scene, ray, t_min, interpret: bool = False,
                              leaf_size: int = 4):
    """Closest-hit -> (t, u, v, global_tri_index) per ray."""
    n = ray.origin.shape[0]
    n_top = int(scene.top_skip.shape[0])
    node_rows = scene.cl_nodes_f.shape[2]
    tri_rows = scene.cl_tris.shape[2]

    top_f = [
        _plane(scene.top_lo[:, 0], jnp.float32),
        _plane(scene.top_lo[:, 1], jnp.float32),
        _plane(scene.top_lo[:, 2], jnp.float32),
        _plane(scene.top_hi[:, 0], jnp.float32),
        _plane(scene.top_hi[:, 1], jnp.float32),
        _plane(scene.top_hi[:, 2], jnp.float32),
    ]
    top_i = [
        _plane(scene.top_skip, jnp.int32),
        _plane(scene.top_cluster, jnp.int32),
        _plane(scene.top_tri_base, jnp.int32),
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

    kernel = functools.partial(
        _kernel, n_top=n_top, t_min=float(t_min), leaf_size=leaf_size,
        node_cap=node_rows * 128)

    ray_spec = pl.BlockSpec((8, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm_full = pl.BlockSpec(memory_space=pltpu.ANY)
    out_spec = pl.BlockSpec((8, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    t, u, v, idx = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[ray_spec] * 6 + [vmem_full] * 9 + [hbm_full] * 3,
        out_specs=(out_spec, out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((grid * 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((grid * 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((grid * 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((grid * 8, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((6, node_rows, 128), jnp.float32),
            pltpu.VMEM((3, node_rows, 128), jnp.int32),
            pltpu.VMEM((9, tri_rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(rx, ry, rz, dx, dy, dz, *top_f, *top_i,
      scene.cl_nodes_f, scene.cl_nodes_i, scene.cl_tris)

    flat = lambda a: a.reshape(-1)[:n]  # noqa: E731
    return flat(t), flat(u), flat(v), flat(idx)


def _kernel(rx_ref, ry_ref, rz_ref, dx_ref, dy_ref, dz_ref,
            tlx_ref, tly_ref, tlz_ref, thx_ref, thy_ref, thz_ref,
            tskip_ref, tcl_ref, tbase_ref,
            clf_hbm, cli_hbm, clt_hbm,
            t_ref, u_ref, v_ref, idx_ref,
            scr_f, scr_i, scr_t, sems,
            *, n_top: int, t_min: float, leaf_size: int, node_cap: int):
    ox, oy, oz = rx_ref[:], ry_ref[:], rz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    def safe_inv(d):
        return 1.0 / jnp.where(jnp.abs(d) < 1e-20, 1e-20, d)

    ivx, ivy, ivz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def fetch(ref, i, zero):
        row = ref[pl.ds(i // 128, 1), :]
        return jnp.sum(jnp.where(lane == (i % 128), row, zero))

    def fetch3(ref, comp, i, zero):
        """Scalar i of plane ``comp`` of a (C, rows, 128) scratch ref."""
        row = ref[comp, pl.ds(i // 128, 1), :]
        return jnp.sum(jnp.where(lane == (i % 128), row, zero))

    def slab(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z, t_best):
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
        return (tf >= jnp.maximum(tn, t_min)) & (tn < t_best)

    def moller(k, base, t_best, u_best, v_best, i_best, lane_ok):
        """Masked Möller–Trumbore of scratch triangle ``k`` (local id)."""
        p0x = fetch3(scr_t, 0, k, 0.0)
        p0y = fetch3(scr_t, 1, k, 0.0)
        p0z = fetch3(scr_t, 2, k, 0.0)
        p1x = fetch3(scr_t, 3, k, 0.0)
        p1y = fetch3(scr_t, 4, k, 0.0)
        p1z = fetch3(scr_t, 5, k, 0.0)
        p2x = fetch3(scr_t, 6, k, 0.0)
        p2y = fetch3(scr_t, 7, k, 0.0)
        p2z = fetch3(scr_t, 8, k, 0.0)
        e1x, e1y, e1z = p1x - p0x, p1y - p0y, p1z - p0z
        e2x, e2y, e2z = p2x - p0x, p2y - p0y, p2z - p0z
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
                jnp.where(better, k + base, i_best))

    def visit_cluster(cluster_id, tri_base, box_hit, bests):
        """DMA the cluster block, then walk its local skip-link tree."""
        cp_f = pltpu.make_async_copy(clf_hbm.at[cluster_id], scr_f,
                                     sems.at[0])
        cp_i = pltpu.make_async_copy(cli_hbm.at[cluster_id], scr_i,
                                     sems.at[1])
        cp_t = pltpu.make_async_copy(clt_hbm.at[cluster_id], scr_t,
                                     sems.at[2])
        cp_f.start()
        cp_i.start()
        cp_t.start()
        cp_f.wait()
        cp_i.wait()
        cp_t.wait()

        def cond(carry):
            return carry[0] < node_cap

        def body(carry):
            cur, t_b, u_b, v_b, i_b = carry
            lo_x = fetch3(scr_f, 0, cur, 0.0)
            lo_y = fetch3(scr_f, 1, cur, 0.0)
            lo_z = fetch3(scr_f, 2, cur, 0.0)
            hi_x = fetch3(scr_f, 3, cur, 0.0)
            hi_y = fetch3(scr_f, 4, cur, 0.0)
            hi_z = fetch3(scr_f, 5, cur, 0.0)
            skip = fetch3(scr_i, 0, cur, 0)
            first = fetch3(scr_i, 1, cur, 0)
            count = fetch3(scr_i, 2, cur, 0)

            hit = slab(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z, t_b) & box_hit
            any_hit = jnp.any(hit)
            is_leaf = first >= 0

            def leaf_fn(args):
                t2, u2, v2, i2 = args
                for j in range(leaf_size):
                    k = jnp.maximum(jnp.minimum(first + j,
                                                first + count - 1), 0)
                    lane_ok = hit & (j < count)
                    t2, u2, v2, i2 = moller(k, tri_base, t2, u2, v2, i2,
                                            lane_ok)
                return t2, u2, v2, i2

            t_b, u_b, v_b, i_b = jax.lax.cond(
                any_hit & is_leaf, leaf_fn, lambda a: a,
                (t_b, u_b, v_b, i_b))

            descend = any_hit & (~is_leaf)
            nxt = jnp.where(descend, cur + 1, skip)
            return nxt, t_b, u_b, v_b, i_b

        t_b, u_b, v_b, i_b = bests
        _, t_b, u_b, v_b, i_b = jax.lax.while_loop(
            cond, body, (jnp.int32(0), t_b, u_b, v_b, i_b))
        return t_b, u_b, v_b, i_b

    def cond(carry):
        return carry[0] < n_top

    def body(carry):
        cursor, t_best, u_best, v_best, i_best = carry
        lo_x = fetch(tlx_ref, cursor, 0.0)
        lo_y = fetch(tly_ref, cursor, 0.0)
        lo_z = fetch(tlz_ref, cursor, 0.0)
        hi_x = fetch(thx_ref, cursor, 0.0)
        hi_y = fetch(thy_ref, cursor, 0.0)
        hi_z = fetch(thz_ref, cursor, 0.0)
        skip = fetch(tskip_ref, cursor, 0)
        cluster = fetch(tcl_ref, cursor, 0)
        tri_base = fetch(tbase_ref, cursor, 0)

        box_hit = slab(lo_x, lo_y, lo_z, hi_x, hi_y, hi_z, t_best)
        any_hit = jnp.any(box_hit)
        is_cluster = cluster >= 0

        t_best, u_best, v_best, i_best = jax.lax.cond(
            any_hit & is_cluster,
            lambda a: visit_cluster(cluster, tri_base, box_hit, a),
            lambda a: a,
            (t_best, u_best, v_best, i_best))

        descend = any_hit & (~is_cluster)
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
