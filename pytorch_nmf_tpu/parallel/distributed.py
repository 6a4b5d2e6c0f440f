"""Multi-host (pod / multi-slice) initialization helpers.

Single-slice multi-chip needs nothing beyond a :class:`jax.sharding.Mesh`;
across hosts, ``jax.distributed`` must be initialized before any device use
so every process sees the global device set.  These helpers keep that
boilerplate in one place:

* :func:`initialize` — wraps ``jax.distributed.initialize`` (no-ops when
  already initialized or when running single-process, e.g. under the
  test suite's virtual CPU devices).
* :func:`global_mesh` — builds a mesh over ALL processes' devices in the
  standard data-then-model ordering.

Typical pod usage::

    from pytorch_nmf_tpu.parallel import distributed, sharded_nmf_fit
    distributed.initialize()                   # TPU pods: auto-discovery
    mesh = distributed.global_mesh({"data": jax.device_count()})
    W, H, _ = sharded_nmf_fit(V_local, W0, H0, mesh, beta=1)
"""

from typing import Dict, Optional

import jax

from .mesh import make_mesh

__all__ = ["initialize", "global_mesh"]

_INITIALIZED = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-process JAX.

    MUST run before any other JAX call (anything that touches devices
    initializes the XLA backend and makes distributed init impossible).
    On TPU pods all arguments are auto-discovered from the environment;
    pass them explicitly for CPU/GPU clusters.  Explicit requests that
    fail raise; argument-free auto-discovery falls back to single-process
    with a warning (e.g. when running locally).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    explicit = (
        coordinator_address is not None
        or num_processes is not None
        or process_id is not None
    )
    # CPU clusters need a cross-process collectives backend; gloo ships with
    # jaxlib on Linux.  Harmless no-op when the platform is TPU.
    import os

    # the in-process config override is the repo's documented way to
    # force CPU (CLAUDE.md: the env var alone is not enough), so check it
    # first, then the env var
    platforms = (
        getattr(jax.config, "jax_platforms", None)
        or os.environ.get("JAX_PLATFORMS", "")
    )
    if str(platforms).startswith("cpu"):
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # pragma: no cover - older jaxlib
            pass
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _INITIALIZED = True
    except Exception as e:
        if explicit:
            raise
        import warnings

        warnings.warn(
            f"jax.distributed auto-discovery unavailable, continuing "
            f"single-process: {e}"
        )


def global_mesh(axes: Dict[str, int]) -> "jax.sharding.Mesh":
    """Mesh over the global device set (all processes)."""
    return make_mesh(axes, jax.devices())
