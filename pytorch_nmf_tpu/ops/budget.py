"""Device-memory-aware byte budgets (VERDICT r2 item 4).

The fast-path entry decisions — densify a sparse target, build the dual-ELL
layout, unroll the deconv patch tensor — are gated on byte budgets.  Fixed
constants (4 GiB / 2 GiB) are right for a 16 GB v5e but under-use bigger
chips and oversubscribe smaller ones, so when the runtime exposes
``device.memory_stats()['bytes_limit']`` the defaults become a FRACTION of
the real HBM limit; the env overrides always win, and platforms without
memory stats (CPU, some runtimes) keep the historical constants.
"""

import os

import jax

__all__ = ["device_bytes_limit", "budget_bytes"]

_UNSET = object()
_limit_cache = _UNSET


def device_bytes_limit():
    """``bytes_limit`` of device 0, or ``None`` when the backend does not
    expose memory stats (CPU) — cached per process (the device set is
    fixed after backend init)."""
    global _limit_cache
    if _limit_cache is _UNSET:
        lim = None
        try:
            stats = jax.devices()[0].memory_stats()
            if stats:
                lim = int(stats.get("bytes_limit", 0)) or None
        except Exception:
            lim = None
        _limit_cache = lim
    return _limit_cache


def budget_bytes(env_var: str, default_bytes: int, fraction: float) -> int:
    """Budget resolution order: env override → ``fraction`` of the real
    device ``bytes_limit`` → the historical constant."""
    env = os.environ.get(env_var, "")
    if env:
        return int(env)
    lim = device_bytes_limit()
    if lim:
        return int(lim * fraction)
    return default_bytes
