"""Pallas BVH-traversal kernel vs the XLA reference path (interpret mode).

On CPU the kernel runs through the Pallas interpreter — same program, same
semantics, no TPU required (the SURVEY §4 fake-backend strategy applied to
kernels). On a real TPU the compiled kernel is exercised by bench.py.
"""
import os

import numpy as np
import pytest

from srt_tpu.core.ray import Ray
from srt_tpu.io.mesh import TriMesh
from srt_tpu.render.intersect import (intersect_tris,
                                      intersect_tris_via_pallas)
from srt_tpu.scene.build import SceneBuilder


def _soup_scene(t=300, seed=0):
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    mat = b.lambertian(b.constant((0.5, 0.5, 0.5)))
    tris = rng.standard_normal((t, 3, 3)).astype(np.float32)
    b.trimesh(TriMesh(positions=tris, uvs=None, normals=None), mat)
    return b.build(), rng


def _rays(rng, n):
    o = rng.standard_normal((n, 3)).astype(np.float32) * 3
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Ray(origin=o, direction=d, time=np.zeros(n, np.float32))


@pytest.mark.parametrize("n_tris,n_rays", [(37, 257), (300, 2000)])
def test_pallas_matches_xla_traversal(n_tris, n_rays):
    scene, rng = _soup_scene(n_tris)
    ray = _rays(rng, n_rays)
    hx = intersect_tris(scene, ray, 1e-3, 3e38)
    hp = intersect_tris_via_pallas(scene, ray, 1e-3, interpret=True)
    a, b = np.asarray(hx.hit), np.asarray(hp.hit)
    np.testing.assert_array_equal(a, b)
    both = a & b
    np.testing.assert_allclose(np.asarray(hx.t)[both],
                               np.asarray(hp.t)[both], rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(hx.mat)[both],
                                  np.asarray(hp.mat)[both])
    # Barycentric uv agreement where hit.
    np.testing.assert_allclose(np.asarray(hx.uv)[both],
                               np.asarray(hp.uv)[both], rtol=1e-4, atol=1e-4)


def test_pallas_full_render_matches(monkeypatch):
    """End-to-end render with the kernel on the intersect path."""
    from srt_tpu import RenderConfig, render
    from srt_tpu.scene.library import cornell_boxes

    scene, cam, _ = cornell_boxes(aspect=1.0)
    cfg = RenderConfig(width=12, height=12, spp=2, max_depth=3)
    ref = np.asarray(render(scene, cam, cfg))

    monkeypatch.setenv("SRT_TPU_PALLAS", "interpret")
    img = np.asarray(render(scene, cam, cfg))
    # Traversal order identical; only fma/reassociation noise differs.
    np.testing.assert_allclose(ref, img, rtol=1e-4, atol=1e-4)


def test_pallas_gating():
    from srt_tpu.pallas import pallas_available

    scene, _ = _soup_scene(10)
    assert pallas_available(scene, interpret=True)
    # Over-budget scenes must fall back (here: shrink the budget).
    import srt_tpu.pallas.intersect as pi
    old = pi._VMEM_SCENE_BUDGET
    try:
        pi._VMEM_SCENE_BUDGET = 10
        assert not pallas_available(scene, interpret=True)
    finally:
        pi._VMEM_SCENE_BUDGET = old


@pytest.mark.parametrize("n_tris,n_rays", [(1500, 2000)])
def test_pallas_big_matches_xla_traversal(n_tris, n_rays, monkeypatch):
    """Two-level DMA kernel (interpret mode) vs the XLA lockstep loop."""
    # small caps so this mesh splits into several clusters
    monkeypatch.setenv("SRT_TPU_CLUSTER_NODE_CAP", "128")
    monkeypatch.setenv("SRT_TPU_CLUSTER_TRI_CAP", "256")
    scene, rng = _soup_scene(n_tris, seed=3)
    assert scene.cl_tris is not None and scene.cl_tris.shape[0] >= 2, \
        "mesh too small to exercise multiple clusters"
    ray = _rays(rng, n_rays)
    hx = intersect_tris(scene, ray, 1e-3, 3e38)
    hp = intersect_tris_via_pallas(scene, ray, 1e-3, interpret=True,
                                   big=True)
    a, b = np.asarray(hx.hit), np.asarray(hp.hit)
    np.testing.assert_array_equal(a, b)
    both = a & b
    np.testing.assert_allclose(np.asarray(hx.t)[both],
                               np.asarray(hp.t)[both], rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(hx.mat)[both],
                                  np.asarray(hp.mat)[both])
    np.testing.assert_allclose(np.asarray(hx.uv)[both],
                               np.asarray(hp.uv)[both], rtol=1e-4, atol=1e-4)


def test_pallas_big_gating():
    from srt_tpu.pallas import pallas_big_available

    scene, _ = _soup_scene(10)
    assert pallas_big_available(scene, interpret=True)
    assert not pallas_big_available(scene._replace(cl_tris=None),
                                    interpret=True)


def test_pallas_sphere_sweep_matches_xla():
    """Fused sphere kernel (interpret) vs the XLA chunk sweep: static,
    moving, env, and flipped spheres in one scene."""
    from srt_tpu.core.ray import Ray as R2
    from srt_tpu.render.intersect import (intersect_spheres,
                                          intersect_spheres_via_pallas)

    rng = np.random.default_rng(11)
    b = SceneBuilder()
    m = b.lambertian(b.constant((0.5, 0.5, 0.5)))
    for i in range(20):
        c = rng.uniform(-4, 4, 3)
        if i % 4 == 0:  # moving
            b.sphere(c, 0.5, m, center1=c + rng.uniform(-1, 1, 3))
        elif i % 4 == 1:  # flipped
            b.sphere(c, 0.5, m, flip=True)
        else:
            b.sphere(c, 0.5, m)
    b.sphere((0, 0, 0), 50.0, b.diffuse_light(b.constant((1, 1, 1))),
             env=True)
    scene = b.build()

    n = 1500
    o = rng.standard_normal((n, 3)).astype(np.float32) * 2
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ray = R2(origin=o, direction=d,
             time=rng.uniform(0, 1, n).astype(np.float32))

    hx = intersect_spheres(scene, ray, 1e-3, 3e38)
    hp = intersect_spheres_via_pallas(scene, ray, 1e-3, interpret=True)
    np.testing.assert_array_equal(np.asarray(hx.hit), np.asarray(hp.hit))
    both = np.asarray(hx.hit)
    np.testing.assert_allclose(np.asarray(hx.t)[both],
                               np.asarray(hp.t)[both], rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(hx.mat)[both],
                                  np.asarray(hp.mat)[both])
    np.testing.assert_allclose(np.asarray(hx.normal)[both],
                               np.asarray(hp.normal)[both],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(hx.uv)[both],
                               np.asarray(hp.uv)[both], rtol=2e-4, atol=2e-4)


def test_pallas_sphere_render_matches(monkeypatch):
    """End-to-end ball_scenes-style render with the sphere kernel on."""
    from srt_tpu import RenderConfig, render
    from srt_tpu.scene.library import ball_scenes

    scene, cam, _ = ball_scenes(aspect=1.0, max_tex=16)
    cfg = RenderConfig(width=12, height=12, spp=2, max_depth=3)
    ref = np.asarray(render(scene, cam, cfg))
    monkeypatch.setenv("SRT_TPU_PALLAS", "interpret")
    monkeypatch.setenv("SRT_TPU_SPHERE_KERNEL", "1")  # opt-in experiment
    img = np.asarray(render(scene, cam, cfg))
    np.testing.assert_allclose(ref, img, rtol=2e-4, atol=2e-4)
