"""Custom VJPs for the fused bounce: Pallas-kernel forward, with either a
one-launch Pallas backward (pallas/bounce_bwd.py) or an XLA backward.

The reverse-differentiable regeneration engine
(:mod:`srt_tpu.render.regen_scan`) paid the full XLA bounce
(``render/integrator.bounce_step``) in BOTH directions, while the forward
render engine's fused kernel (:mod:`srt_tpu.pallas.bounce`) is ~13x faster
— the r4 PERF.md gap. Two hybrids close it:

* :func:`bounce_step_hybrid` — kernel forward, **XLA backward**: ``bwd``
  linearizes the XLA ``bounce_step`` at the saved input and applies the
  cotangents — the exact gradient of the estimator with none of it
  re-derived by hand. General fallback (geometry optimization, parity,
  triangle scenes).
* the **split core** (:func:`_bounce_core`) — kernel forward, **kernel
  backward** (``bounce_bwd.fused_bounce_bwd``, one launch per bounce,
  r4 VERDICT item 2). The deferred-texture epilogue
  (``bounce._deferred_texture``: image-atlas / Perlin evaluation) runs
  OUTSIDE the custom_vjp boundary, so XLA autodiffs it: its uv cotangents
  are exactly zero (nearest-neighbor lookups) and its position/atlas
  gradients ride the ordinary chain. Exact under ``frozen_geometry``.

:func:`bounce_step_auto` statically dispatches between them.

No reference analogue (the C++ renderer is forward-only,
``Raytracing_n/Raytracing_n.cpp``); this serves the BASELINE config-5
inverse-rendering capability.
"""
from __future__ import annotations

from functools import partial

import jax

from srt_tpu.pallas.bounce import (_deferred_texture, fused_bounce,
                                   fused_bounce_available)
from srt_tpu.scene.ir import TextureType


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def bounce_step_hybrid(scene, state, max_depth, rr_start, flags,
                       pdf_floor, interpret=False, frozen_geometry=False):
    """Drop-in for ``bounce_step`` on kernel-eligible scenes, reverse-
    differentiable (kernel forward / XLA backward). Statics (depth/
    roulette/flags/floor/interpret/frozen-geometry) are nondiff
    positional args so the VJP pair sees them unchanged."""
    return fused_bounce(scene, state, max_depth, rr_start, flags,
                        pdf_floor, interpret=interpret)


def _fwd(scene, state, max_depth, rr_start, flags, pdf_floor, interpret,
         frozen_geometry):
    out = fused_bounce(scene, state, max_depth, rr_start, flags,
                       pdf_floor, interpret=interpret)
    return out, (scene, state)


def _bwd(max_depth, rr_start, flags, pdf_floor, interpret, frozen_geometry,
         res, ct):
    from srt_tpu.render.integrator import bounce_step
    scene, state = res

    if frozen_geometry:
        # Caller guarantees no geometric param is optimized, so those
        # cotangents are zero by definition — detaching geometry INSIDE
        # the backward recompute lets XLA dead-code-eliminate the whole
        # intersection transpose. (Detaching it on the *primal* scene
        # instead turns the values into checkpoint-saved residuals and
        # measured slower — see diff/inverse.image_loss.)
        from srt_tpu.diff.inverse import freeze_geometry

        def f(sc, st):
            return bounce_step(freeze_geometry(sc), st, max_depth,
                               rr_start, flags, pdf_floor)
    else:
        def f(sc, st):
            return bounce_step(sc, st, max_depth, rr_start, flags,
                               pdf_floor)

    _, vjp_fn = jax.vjp(f, scene, state)
    return vjp_fn(ct)


bounce_step_hybrid.defvjp(_fwd, _bwd)


# --- split core: kernel forward + kernel backward --------------------------

@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _bounce_core(scene, state, max_depth, rr_start, flags, pdf_floor,
                 interpret=False):
    """The bounce minus the deferred-texture epilogue: forward = fused
    kernel, backward = the one-launch backward kernel. Returns
    ``(out, (dtex, du, dv, dw))``."""
    return fused_bounce(scene, state, max_depth, rr_start, flags,
                        pdf_floor, interpret=interpret, defer_outside=True)


def _core_fwd(scene, state, max_depth, rr_start, flags, pdf_floor,
              interpret):
    out = fused_bounce(scene, state, max_depth, rr_start, flags,
                       pdf_floor, interpret=interpret, defer_outside=True)
    return out, (scene, state)


def _core_bwd(max_depth, rr_start, flags, pdf_floor, interpret, res, ct):
    from srt_tpu.pallas.bounce_bwd import fused_bounce_bwd
    scene, state = res
    out_ct, _defer_ct = ct
    # _defer_ct (dtex/du/dv/dw cotangents) is exactly zero: dtex is int,
    # and the epilogue's atlas lookups are nearest-neighbor (the uv only
    # picks integer texel indices). Dropped by construction.
    return fused_bounce_bwd(scene, state, out_ct, max_depth, rr_start,
                            flags, pdf_floor, interpret=interpret)


_bounce_core.defvjp(_core_fwd, _core_bwd)


def bounce_step_auto(scene, state, max_depth, rr_start, flags, pdf_floor,
                     interpret=False, frozen_geometry=False):
    """Reverse-differentiable fused bounce with static backward dispatch:
    the one-launch backward kernel when exact (frozen geometry, no
    parity/moving/triangles), else the XLA-linearization backward."""
    from srt_tpu.pallas.bounce_bwd import bwd_kernel_available
    if frozen_geometry and bwd_kernel_available(scene, flags):
        out, defer = _bounce_core(scene, state, max_depth, rr_start,
                                  flags, pdf_floor, interpret)
        needs_defer = (int(TextureType.IMAGE) in flags.tex_kinds
                       or int(TextureType.NOISE) in flags.tex_kinds)
        if needs_defer:
            radiance, beta = _deferred_texture(
                scene, flags, defer[0], defer[1], defer[2], defer[3],
                out["o"], state["beta"], out["radiance"], out["beta"])
            out = dict(out, radiance=radiance, beta=beta)
        return out
    return bounce_step_hybrid(scene, state, max_depth, rr_start, flags,
                              pdf_floor, interpret, frozen_geometry)


def hybrid_available(flags, mode: str) -> bool:
    """Static dispatch gate for the differentiable engines (mirrors
    ``regen._use_fused_bounce`` minus the roulette concern — the diff
    engines run roulette-free, ``regen_scan.trace_queue`` rr_start
    default)."""
    if mode == "off":
        return False
    return fused_bounce_available(flags, interpret=mode == "interpret")
