"""Multi-chip / multi-host rendering via jax.sharding + shard_map.

TPU-native replacement for the reference's only parallel layer — 8 CPU
threads pulling pixels off a mutex-guarded counter
(``Raytracing_n.cpp:815-879``). Design (SURVEY §2.3):

* The **ray wavefront** (pixels × samples) is the data-parallel axis: pixel
  batches are sharded over every chip of a 1-D ``Mesh``. Static tiling
  replaces dynamic stealing — each Sobol batch costs the same, so there is
  no load imbalance to steal from.
* The **scene + BVH are replicated** (broadcast once per scene build). This
  mirrors the reference's shared heap scene graph, minus the races.
* The only communication is image assembly (an implicit all-gather of pixel
  strips) and, in training, a gradient ``psum`` — both ride ICI within a
  slice; multi-host runs add ``jax.distributed.initialize`` and the same
  program runs over DCN unchanged.
* One-chip and N-chip renders are **bit-identical** because the RNG is a
  pure function of (seed, pixel, sample, bounce, dim) — asserted in
  ``tests/test_dist.py``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from srt_tpu.render.api import RenderConfig, _render_chunk
from srt_tpu.scene.ir import Scene


def make_mesh(n_devices: int | None = None, axis: str = "rays") -> Mesh:
    """1-D device mesh over the first ``n_devices`` local devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def replicate_scene(scene: Scene, mesh: Mesh) -> Scene:
    """Place every scene buffer fully-replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), scene)


def render_sharded(scene: Scene, camera, config: RenderConfig, mesh: Mesh,
                   sobol_file: str | None = None) -> jnp.ndarray:
    """Render with the pixel axis sharded over ``mesh``; returns (H, W, 3).

    The per-shard program is the same ``_render_chunk`` used single-chip;
    XLA partitions it over the batch dim (embarrassingly parallel — zero
    collectives until the host gathers the image).
    """
    from srt_tpu.core.sobol import sobol_points

    w, h, spp = config.width, config.height, config.spp
    n_pixels = w * h
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]

    # Pad the pixel axis to a multiple of the device count.
    pad = (-n_pixels) % n_dev
    pixel_ids = jnp.arange(n_pixels + pad, dtype=jnp.int32)
    pixel_ids = jax.device_put(
        pixel_ids, NamedSharding(mesh, P(axis)))

    scene = replicate_scene(scene, mesh)
    camera = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), camera)

    pts = sobol_points(max(spp, 2), 2, dir_file=sobol_file)[:max(spp, 1)]
    sobol_pts = jax.device_put(jnp.asarray(pts, jnp.float32),
                               NamedSharding(mesh, P()))

    from srt_tpu.render.api import scene_flags
    flags = scene_flags(scene, config)

    acc = jnp.zeros((n_pixels + pad, 3), jnp.float32)
    acc = jax.device_put(acc, NamedSharding(mesh, P(axis)))
    chunk = min(config.sample_chunk, spp)
    for s0 in range(0, spp, chunk):
        n_s = min(chunk, spp - s0)
        acc = acc + _render_chunk(
            scene, camera, pixel_ids, s0, sobol_pts, config.seed,
            width=w, height=h, max_depth=config.max_depth,
            rr_start=config.rr_start, n_samples=n_s, flags=flags,
            pdf_floor=config.pdf_floor)
    img = (acc[:n_pixels] / spp).reshape(h, w, 3)
    return img
