"""Test configuration: run everything on a virtual 8-device CPU platform.

Multi-device semantics (mesh sharding, psum'd MU updates) are validated
without TPU hardware by forcing the host platform with 8 virtual devices —
the strategy SURVEY.md §4 prescribes.  Must run before any JAX backend
initialization.
"""

import os
import tempfile

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is dominated by per-config solver
# compiles; caching makes re-runs ~4x faster
_cache_dir = os.environ.get(
    "PNT_TEST_CACHE", os.path.join(tempfile.gettempdir(), "pnt_jax_cache")
)
# one-time migration: entries written before the atomic-put patch can be
# truncated, and a truncated entry SEGFAULTS the reader inside XLA
# deserialization (observed 2026-08-19: two full-suite runs died at the
# same cache read) — the patch below cannot cure pre-existing damage, so
# a cache dir without the marker is wiped once
_marker = os.path.join(_cache_dir, ".atomic_puts_ok")
if os.path.isdir(_cache_dir) and not os.path.exists(_marker):
    import shutil

    shutil.rmtree(_cache_dir, ignore_errors=True)
os.makedirs(_cache_dir, exist_ok=True)
with open(_marker, "w"):
    pass
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# a killed run (timeout, relay drop) must not leave truncated cache
# entries behind — later reads SEGFAULT on them (ops/autotune docstring)
from pytorch_nmf_tpu.ops.autotune import install_atomic_cache_puts  # noqa: E402

install_atomic_cache_puts()
