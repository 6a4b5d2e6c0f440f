"""Small user utilities.

The reference ships a (dead, and subtly buggy) ``torchnmf/utils.py``; these
are working equivalents with the documented semantics:

* :func:`normalize` — scale so the sum over ``axis`` is 1.
* :func:`renorm` — scale so the L2 norm over ``axis`` is 1.
"""

import jax.numpy as jnp

from . import checkpoint, profiling  # noqa: F401

__all__ = ["normalize", "renorm", "checkpoint", "profiling", "LossHistory"]


class LossHistory:
    """Record the solver's cadence losses during a fit.

    The on-device loops evaluate the loss every 10 iterations and emit it
    through the progress channel; this context manager registers a
    recorder alongside the fit's own progress bar.  The channel only
    exists in verbose-compiled programs, so pass ``verbose=True`` to the
    fit being recorded (the same condition under which the reference
    materializes its losses for tqdm, nmf.py:393-404).

    >>> with LossHistory() as hist:
    ...     model.fit(V, beta=1, max_iter=200, verbose=True)
    >>> hist.chunks, hist.losses   # 10-iteration checkpoints
    >>> hist.extras                # PLCA: the log-posterior trace

    ``hist.losses`` are on the reference's ``sqrt(2 * divergence)`` scale.
    """

    def __init__(self):
        self.chunks = []
        self.losses = []
        self.extras = []

    def _record(self, chunk_idx, loss, extra=None):
        self.chunks.append(int(chunk_idx))
        self.losses.append(float(loss))
        self.extras.append(None if extra is None else float(extra))

    def __enter__(self):
        from ..ops import solver as _solver

        _solver.push_progress_handler(self._record)
        return self

    def __exit__(self, *exc):
        from ..ops import solver as _solver

        _solver.pop_progress_handler()
        return False


def normalize(x, axis=None):
    x = jnp.asarray(x)
    return x / jnp.sum(x, axis=axis, keepdims=axis is not None)


def renorm(x, axis=None):
    x = jnp.asarray(x)
    n = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=axis is not None))
    return x / n
