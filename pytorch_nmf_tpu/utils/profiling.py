"""Profiling / tracing hooks.

The reference's only performance tooling is TorchScript on three helpers
and a CPU-denormal tip (SURVEY.md §5).  On TPU the equivalents are XLA
profiler traces; this module wraps ``jax.profiler`` so solver runs can be
captured and inspected in XProf/TensorBoard or Perfetto.
"""

import contextlib

import jax

__all__ = ["trace", "annotate", "device_memory_stats"]


@contextlib.contextmanager
def trace(logdir: str, host_tracer_level: int = 2):
    """Capture an XLA profiler trace of the enclosed block.

    ``host_tracer_level``: host-side event verbosity (0 silences host
    events, 2 is the profiler default, 3 is maximal), forwarded through
    ``jax.profiler.ProfileOptions`` where the installed jax supports it.

    Example::

        with trace("/tmp/nmf_trace"):
            model.fit(V, beta=1, max_iter=100)
    """
    opts = None
    if host_tracer_level != 2 and hasattr(jax.profiler, "ProfileOptions"):
        opts = jax.profiler.ProfileOptions()
        opts.host_tracer_level = host_tracer_level
    jax.profiler.start_trace(logdir, profiler_options=opts)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats(device=None):
    """Live/peak HBM usage for a device (None = default device)."""
    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    return stats or {}
