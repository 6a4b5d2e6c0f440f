"""Small user utilities.

The reference ships a (dead, and subtly buggy) ``torchnmf/utils.py``; these
are working equivalents with the documented semantics:

* :func:`normalize` — scale so the sum over ``axis`` is 1.
* :func:`renorm` — scale so the L2 norm over ``axis`` is 1.
"""

import jax.numpy as jnp

from . import checkpoint, profiling  # noqa: F401

__all__ = ["normalize", "renorm", "checkpoint", "profiling"]


def normalize(x, axis=None):
    x = jnp.asarray(x)
    return x / jnp.sum(x, axis=axis, keepdims=axis is not None)


def renorm(x, axis=None):
    x = jnp.asarray(x)
    n = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=axis is not None))
    return x / n
