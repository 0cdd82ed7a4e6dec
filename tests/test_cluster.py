"""Two-level BVH clustering (accel/cluster.py): structural invariants and a
scalar numpy traversal of the clustered layout vs brute-force closest hit."""
import numpy as np

from srt_tpu.accel.bvh import build_bvh
from srt_tpu.accel.cluster import build_clusters


def _random_tris(n, seed=0, spread=10.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, (n, 1, 3))
    tris = base + rng.uniform(-0.5, 0.5, (n, 3, 3))
    return tris.astype(np.float32)


def _brute_hit(tris, o, d, t_min=1e-3):
    """Scalar closest-hit Möller–Trumbore over all tris."""
    best_t, best_i = np.inf, -1
    for i, (p0, p1, p2) in enumerate(tris):
        e1, e2 = p1 - p0, p2 - p0
        pv = np.cross(d, e2)
        det = np.dot(e1, pv)
        if abs(det) < 1e-10:
            continue
        inv = 1.0 / det
        tv = o - p0
        u = np.dot(tv, pv) * inv
        qv = np.cross(tv, e1)
        v = np.dot(d, qv) * inv
        t = np.dot(e2, qv) * inv
        if u >= 0 and v >= 0 and u + v <= 1 and t > t_min and t < best_t:
            best_t, best_i = t, i
    return best_t, best_i


def _clustered_hit(cl, o, d, t_min=1e-3):
    """Scalar traversal of the two-level structure (kernel semantics)."""
    inv = 1.0 / np.where(np.abs(d) < 1e-20, 1e-20, d)

    def slab(lo, hi, t_best):
        t0 = (lo - o) * inv
        t1 = (hi - o) * inv
        tn = np.minimum(t0, t1).max()
        tf = np.maximum(t0, t1).min()
        return tf >= max(tn, t_min) and tn < t_best

    best_t, best_i = np.inf, -1
    cur = 0
    n_top = cl.n_top
    while cur < n_top:
        hit = slab(cl.top_lo[cur], cl.top_hi[cur], best_t)
        ci = cl.top_cluster[cur]
        if hit and ci >= 0:
            base = cl.top_tri_base[cur]
            nf = cl.cl_nodes_f[ci].reshape(6, -1)
            ni = cl.cl_nodes_i[ci].reshape(3, -1)
            tp = cl.cl_tris[ci].reshape(9, -1)
            lcur = 0
            nn = nf.shape[1]
            while lcur < nn:
                lo = nf[0:3, lcur]
                hi = nf[3:6, lcur]
                lskip, lfirst, lcount = ni[0, lcur], ni[1, lcur], ni[2, lcur]
                lhit = slab(lo, hi, best_t)
                if lhit and lfirst >= 0:
                    for j in range(lcount):
                        k = lfirst + j
                        p0 = tp[0:3, k]
                        p1 = tp[3:6, k]
                        p2 = tp[6:9, k]
                        t, i = _brute_hit(
                            np.asarray([[p0, p1, p2]]), o, d, t_min)
                        if t < best_t:
                            best_t, best_i = t, base + k
                if lhit and lfirst < 0:
                    lcur += 1
                else:
                    lcur = lskip
        if hit and ci < 0:
            cur += 1
        else:
            cur = cl.top_skip[cur]
    return best_t, best_i


def test_cluster_structure():
    tris = _random_tris(3000, seed=1)
    bvh, order = build_bvh(tris)
    tris = tris[order]
    cl = build_clusters(bvh, tris[:, 0], tris[:, 1], tris[:, 2],
                        node_cap=128, tri_cap=256)
    assert cl.n_clusters >= 2
    # Every triangle appears in exactly one cluster: total padded-in tris
    # equals the mesh size.
    total = 0
    leaves = cl.top_cluster >= 0
    assert leaves.sum() == cl.n_clusters
    # tri_base of the ci-th cluster leaf is nondecreasing and the counts
    # partition the mesh.
    counts = []
    for t in range(cl.n_clusters):
        ni = cl.cl_nodes_i[t].reshape(3, -1)
        counts.append(int(ni[2][ni[1] >= 0].sum()))
    assert sum(counts) == len(tris)
    bases = cl.top_tri_base[leaves]
    cids = cl.top_cluster[leaves]
    order2 = np.argsort(cids)
    bases_sorted = bases[order2]
    np.testing.assert_array_equal(
        bases_sorted, np.concatenate([[0], np.cumsum(counts)[:-1]]))


def test_clustered_traversal_matches_brute_force():
    tris = _random_tris(1200, seed=2)
    bvh, order = build_bvh(tris)
    tris = tris[order]
    cl = build_clusters(bvh, tris[:, 0], tris[:, 1], tris[:, 2],
                        node_cap=128, tri_cap=256)
    rng = np.random.default_rng(3)
    for _ in range(40):
        o = rng.uniform(-15, 15, 3).astype(np.float32)
        d = rng.normal(size=3).astype(np.float32)
        d /= np.linalg.norm(d)
        bt, bi = _brute_hit(tris, o, d)
        ct, ci = _clustered_hit(cl, o, d)
        if bi < 0:
            assert ci < 0, (ci, ct)
        else:
            assert ci == bi or abs(ct - bt) < 1e-5, (bi, bt, ci, ct)
