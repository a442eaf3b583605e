"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run without TPU hardware (the TPU-world
"multi-node without a cluster" mechanism, SURVEY.md §4).

The axon environment pins JAX_PLATFORMS=axon via sitecustomize and
re-applies it during jax import, so the env var alone is not enough —
``jax.config.update`` after import is authoritative.
"""

import os

# must run before jax import so XLA sees the flag
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
