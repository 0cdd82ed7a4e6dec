"""Test harness: virtual 8-device CPU mesh, no TPU needed.

This is the distributed-test strategy from SURVEY §4: the same pjit/shard_map
programs that run on a TPU pod run on N virtual CPU devices via
``--xla_force_host_platform_device_count``, so sharding semantics (not just
math) are exercised in CI.

Note: the environment's ``axon`` TPU plugin (sitecustomize) force-selects
``jax_platforms="axon,cpu"`` at interpreter start, overriding the
``JAX_PLATFORMS`` env var — so CPU must be re-forced through jax.config
*after* import but before any backend use.
"""
import os
import sys

# XLA_FLAGS must be in place before the CPU client is created.
prev = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
