"""Persistent XLA compilation cache (VERDICT r2 item 6).

The regen ``while_loop`` costs minutes to trace+compile on this 2-vCPU
host; caching compiled executables on disk makes the second process pay
~seconds. Call :func:`enable` before the first jit (bench.py, tools/, CLI
all do). ``SRT_TPU_NO_COMPILE_CACHE=1`` opts out.
"""
from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    if os.environ.get("SRT_TPU_NO_COMPILE_CACHE"):
        return
    import jax
    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without the knobs
