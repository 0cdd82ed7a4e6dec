"""The XLA lockstep triangle fallback must refuse big meshes cleanly.

Meshes >= ~139k triangles reproducibly crash the TPU worker process when
run through the lockstep ``while_loop`` fallback (PERF.md); the gate in
``intersect_tris`` turns that into an immediate, explanatory error on
TPU backends. On CPU (this CI) the gate is inert — exercised here by
monkeypatching the backend probe.
"""
from __future__ import annotations

import numpy as np
import pytest

from srt_tpu.core.ray import Ray
from srt_tpu.render import intersect as isect


def _big_mesh_scene(n_tris: int):
    from srt_tpu.scene.build import SceneBuilder
    b = SceneBuilder()
    mat = b.lambertian(b.constant((0.5, 0.5, 0.5)))
    rng = np.random.default_rng(0)
    p0 = rng.random((n_tris, 3), np.float32)
    tris = np.stack([p0, p0 + (0.01, 0, 0), p0 + (0, 0.01, 0)], axis=1)
    b.triangles(tris, mat)
    return b.build()


def test_big_mesh_fallback_refuses_on_tpu(monkeypatch):
    scene = _big_mesh_scene(isect._XLA_TRIS_MAX + 1)
    ray = Ray(origin=np.zeros((8, 3), np.float32),
              direction=np.tile(np.array([0, 0, 1], np.float32), (8, 1)),
              time=np.zeros((8,), np.float32))
    monkeypatch.setattr(isect.jax, "default_backend", lambda: "tpu")
    with pytest.raises(RuntimeError, match="refused"):
        isect.intersect_tris(scene, ray, 1e-3, 1e9)
    # override escape hatch must trace (no dispatch needed to validate)
    monkeypatch.setenv("SRT_TPU_FORCE_XLA_TRIS", "1")
    import jax
    jax.eval_shape(lambda s, r: isect.intersect_tris(s, r, 1e-3, 1e9),
                   scene, ray)


def test_small_mesh_fallback_still_traces(monkeypatch):
    scene = _big_mesh_scene(64)
    ray = Ray(origin=np.zeros((8, 3), np.float32),
              direction=np.tile(np.array([0, 0, 1], np.float32), (8, 1)),
              time=np.zeros((8,), np.float32))
    monkeypatch.setattr(isect.jax, "default_backend", lambda: "tpu")
    import jax
    jax.eval_shape(lambda s, r: isect.intersect_tris(s, r, 1e-3, 1e9),
                   scene, ray)
