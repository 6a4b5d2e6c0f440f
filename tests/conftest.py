"""Test configuration: run everything on a virtual 8-device CPU platform.

Multi-device semantics (mesh sharding, psum'd MU updates) are validated
without TPU hardware by forcing the host platform with 8 virtual devices —
the strategy SURVEY.md §4 prescribes.  Must run before any JAX backend
initialization.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
