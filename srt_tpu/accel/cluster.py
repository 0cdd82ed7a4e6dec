"""Two-level BVH clustering for the big-mesh Pallas traversal kernel.

The single-level kernel (``srt_tpu/pallas/intersect.py``) keeps the whole
BVH + triangle set VMEM-resident, which caps it at bunny-scale meshes
(VERDICT round 2). This module cuts the flat skip-link BVH
(:class:`srt_tpu.accel.bvh.FlatBVH`) into

* a small **top-level tree** whose leaves are *clusters* (subtrees whose
  node/triangle counts fit fixed VMEM caps), kept VMEM-resident, and
* per-cluster **node/triangle blocks**, padded to the caps and laid out
  contiguously in HBM so one cluster visit is one async DMA into a VMEM
  scratch slot (``pltpu.make_async_copy`` with a dynamic leading index).

The DFS skip-link layout makes the cut trivial: a subtree rooted at ``n``
occupies the contiguous node range ``[n, skip[n])`` and (because leaves are
emitted in DFS order) a contiguous triangle range — so a cluster is a
node-range slice with re-based skip links plus a triangle-range slice.

Everything here is host-side numpy, run once at scene build.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

from srt_tpu.accel.bvh import FlatBVH

# Fixed per-cluster caps (DMA shapes must be static). 256 nodes bound
# 128+ leaves; TRI_CAP covers leaves of the default width 4 with room for
# wider leaves. Rows of 128 lanes match the kernel's plane layout.
NODE_CAP = 256            # 2 rows of 128
TRI_CAP = 512             # 4 rows of 128


class ClusteredBVH(NamedTuple):
    # Top-level skip-link tree; leaves point at clusters.
    top_lo: np.ndarray        # (Bt, 3) f32
    top_hi: np.ndarray        # (Bt, 3) f32
    top_skip: np.ndarray      # (Bt,) i32
    top_cluster: np.ndarray   # (Bt,) i32 cluster id for leaves, -1 internal
    top_tri_base: np.ndarray  # (Bt,) i32 first global triangle of the
                              #   cluster (leaves), 0 internal
    # Cluster blocks, padded to the caps, one DMA unit per cluster:
    # f-planes: lo.x lo.y lo.z hi.x hi.y hi.z  -> (Nc, 6, NODE_CAP//128, 128)
    # i-planes: skip first count               -> (Nc, 3, NODE_CAP//128, 128)
    # tri planes: p0.xyz p1.xyz p2.xyz         -> (Nc, 9, TRI_CAP//128, 128)
    cl_nodes_f: np.ndarray
    cl_nodes_i: np.ndarray
    cl_tris: np.ndarray

    @property
    def n_clusters(self) -> int:
        return self.cl_tris.shape[0]

    @property
    def n_top(self) -> int:
        return self.top_skip.shape[0]


def _plane(x: np.ndarray, cap: int, dtype) -> np.ndarray:
    out = np.zeros((cap,), dtype)
    out[: x.shape[0]] = x
    return out.reshape(cap // 128, 128)


def build_clusters(bvh: FlatBVH, tri_p0: np.ndarray, tri_p1: np.ndarray,
                   tri_p2: np.ndarray,
                   node_cap: int = NODE_CAP,
                   tri_cap: int = TRI_CAP) -> ClusteredBVH:
    """Partition ``bvh`` (triangles already in BVH order) into clusters."""
    n = bvh.skip.shape[0]
    skip = bvh.skip
    first = bvh.first
    count = bvh.count

    # Per-node subtree triangle range [tri_lo, tri_hi): leaves are emitted
    # in DFS order, so the range is first-of-first-leaf .. end-of-last-leaf.
    # Sweep leaves once; for internal node i the subtree is [i, skip[i]).
    is_leaf = first >= 0
    # cumulative tris before each node's subtree: prefix over leaf counts
    leaf_counts = np.where(is_leaf, count, 0)
    pref = np.concatenate([[0], np.cumsum(leaf_counts)])  # (n+1,)
    # tris inside subtree [i, skip[i]) = pref[skip[i]] - pref[i]
    sub_tris = pref[skip] - pref[np.arange(n)]
    sub_nodes = skip - np.arange(n)
    # For the DFS layout, pref[i] equals the number of tris emitted before
    # node i's subtree, and triangles were reordered to DFS emission order,
    # so node i's subtree triangles are [pref[i], pref[i] + sub_tris[i]).
    tri_begin = pref[:n]

    # --- choose cut nodes (iterative DFS; children of i are i+1 and
    # skip[i+1]) ---------------------------------------------------------
    cuts: list[int] = []
    stack = [0]
    while stack:
        i = stack.pop()
        if (sub_nodes[i] <= node_cap and sub_tris[i] <= tri_cap):
            cuts.append(i)
            continue
        left = i + 1
        right = skip[left]
        stack.append(int(right))
        stack.append(int(left))
    cuts_arr = np.sort(np.asarray(cuts, np.int64))
    nc = len(cuts_arr)

    # --- cluster blocks --------------------------------------------------
    rows_n, rows_t = node_cap // 128, tri_cap // 128
    cl_f = np.zeros((nc, 6, rows_n, 128), np.float32)
    cl_i = np.zeros((nc, 3, rows_n, 128), np.int32)
    cl_t = np.zeros((nc, 9, rows_t, 128), np.float32)
    for ci, root in enumerate(cuts_arr):
        lo_n, hi_n = int(root), int(skip[root])
        t0 = int(tri_begin[root])
        nn = hi_n - lo_n
        # Re-base: node ids -> local, skip beyond subtree -> nn (= done,
        # padded region nodes keep skip 0 < nn? no — padding skip = nn so
        # the local loop terminates immediately if ever reached).
        l_skip = np.minimum(skip[lo_n:hi_n] - lo_n, nn)
        l_first = np.where(first[lo_n:hi_n] >= 0,
                           first[lo_n:hi_n] - t0, -1)
        cl_f[ci, 0] = _plane(bvh.lo[lo_n:hi_n, 0], node_cap, np.float32)
        cl_f[ci, 1] = _plane(bvh.lo[lo_n:hi_n, 1], node_cap, np.float32)
        cl_f[ci, 2] = _plane(bvh.lo[lo_n:hi_n, 2], node_cap, np.float32)
        cl_f[ci, 3] = _plane(bvh.hi[lo_n:hi_n, 0], node_cap, np.float32)
        cl_f[ci, 4] = _plane(bvh.hi[lo_n:hi_n, 1], node_cap, np.float32)
        cl_f[ci, 5] = _plane(bvh.hi[lo_n:hi_n, 2], node_cap, np.float32)
        # The last real node's skip is nn (the first padding node), so
        # padding IS reached once per cluster walk: padding skips point
        # past the whole padded block to terminate immediately.
        pad_skip = np.full((node_cap,), node_cap, np.int32)
        pad_skip[:nn] = l_skip
        cl_i[ci, 0] = pad_skip.reshape(rows_n, 128)
        cl_i[ci, 1] = _plane(l_first, node_cap, np.int32)
        cl_i[ci, 2] = _plane(count[lo_n:hi_n], node_cap, np.int32)
        t1 = t0 + int(sub_tris[root])
        for a in range(3):
            cl_t[ci, 0 + a] = _plane(tri_p0[t0:t1, a], tri_cap, np.float32)
            cl_t[ci, 3 + a] = _plane(tri_p1[t0:t1, a], tri_cap, np.float32)
            cl_t[ci, 6 + a] = _plane(tri_p2[t0:t1, a], tri_cap, np.float32)

    # --- top-level tree: original tree with cut subtrees as leaves -------
    cut_set = {int(c) for c in cuts_arr}
    old2new: dict[int, int] = {}
    t_lo, t_hi, t_skip_old, t_cluster, t_base = [], [], [], [], []
    i = 0
    while i < n:
        old2new[i] = len(t_lo)
        t_lo.append(bvh.lo[i])
        t_hi.append(bvh.hi[i])
        t_skip_old.append(int(skip[i]))   # old-id; remap after
        if i in cut_set:
            ci = int(np.searchsorted(cuts_arr, i))
            t_cluster.append(ci)
            t_base.append(int(tri_begin[i]))
            i = int(skip[i])              # skip the whole subtree
        else:
            t_cluster.append(-1)
            t_base.append(0)
            i += 1
    old2new[n] = len(t_lo)
    top_skip = np.asarray([old2new[s] for s in t_skip_old], np.int32)

    return ClusteredBVH(
        top_lo=np.asarray(t_lo, np.float32).reshape(-1, 3),
        top_hi=np.asarray(t_hi, np.float32).reshape(-1, 3),
        top_skip=top_skip,
        top_cluster=np.asarray(t_cluster, np.int32),
        top_tri_base=np.asarray(t_base, np.int32),
        cl_nodes_f=cl_f, cl_nodes_i=cl_i, cl_tris=cl_t)
