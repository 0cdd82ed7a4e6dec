"""Custom VJP for the fused bounce: Pallas-kernel forward, XLA backward.

The reverse-differentiable regeneration engine
(:mod:`srt_tpu.render.regen_scan`) paid the full XLA bounce
(``render/integrator.bounce_step``) in BOTH directions, while the forward
render engine's fused kernel (:mod:`srt_tpu.pallas.bounce`) is ~13x faster
— the r4 PERF.md gap. ``jax.custom_vjp`` closes the forward half:

* **primal / fwd**: the fused Pallas kernel (estimator-identical to the
  XLA bounce, per-bounce equivalence tested at ~2e-5 —
  ``tests/test_fused_bounce.py``), residuals = the *input* state only;
* **bwd**: linearize the XLA ``bounce_step`` at the saved input and apply
  the cotangents — the exact gradient of the estimator (albedo, emission,
  material params, light/sphere geometry all flow, matching the engine's
  FD-tested semantics), with none of it re-derived by hand.

Under ``jax.checkpoint`` the recompute replays the cheap kernel forward;
the backward's XLA linearization is the remaining (and now dominant)
cost — a hand-written backward kernel would be the next step down this
road.

No reference analogue (the C++ renderer is forward-only,
``Raytracing_n/Raytracing_n.cpp``); this serves the BASELINE config-5
inverse-rendering capability.
"""
from __future__ import annotations

from functools import partial

import jax

from srt_tpu.pallas.bounce import fused_bounce, fused_bounce_available


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def bounce_step_hybrid(scene, state, max_depth, rr_start, flags,
                       pdf_floor, interpret=False, frozen_geometry=False):
    """Drop-in for ``bounce_step`` on kernel-eligible scenes, reverse-
    differentiable. Statics (depth/roulette/flags/floor/interpret/
    frozen-geometry) are nondiff positional args so the VJP pair sees
    them unchanged."""
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


def hybrid_available(flags, mode: str) -> bool:
    """Static dispatch gate for the differentiable engines (mirrors
    ``regen._use_fused_bounce`` minus the roulette concern — the diff
    engines run roulette-free, ``regen_scan.trace_queue`` rr_start
    default)."""
    if mode == "off":
        return False
    return fused_bounce_available(flags, interpret=mode == "interpret")
