"""Shared helpers for the model layer (shape utils, init, validation)."""

from collections.abc import Iterable as Iterabc

import jax
import jax.numpy as jnp
import numpy as np

from ..module import next_rng_key

__all__ = [
    "is_tensor_like",
    "to_f32",
    "rand_abs_normal",
    "assert_nonneg",
    "validate_target",
    "single",
    "pair",
    "triple",
]


def is_tensor_like(x) -> bool:
    """True for array-valued inputs (jax/numpy/Parameter/anything with
    ``shape``+``ndim``), False for shape tuples/lists."""
    return hasattr(x, "shape") and hasattr(x, "ndim")


def to_f32(x):
    """Convert to float32 WITHOUT disturbing device placement: a jax.Array
    keeps its (possibly multi-device) sharding; everything else goes through
    numpy on the host.

    bfloat16 arrays are preserved — an explicit opt-in that halves the
    target's HBM *footprint* (fit ~2x larger problems per chip); all
    compute still accumulates in float32 via type promotion.  Measured on
    TPU v5e the fused MU kernels are compute-bound, so iteration rate is
    unchanged — this is a capacity knob, not a speed knob.
    """
    if isinstance(x, jax.Array):
        if x.dtype in (jnp.float32, jnp.bfloat16):
            return x
        return x.astype(jnp.float32)
    x = np.asarray(x)
    if x.dtype == jnp.bfloat16:
        return jnp.asarray(x)
    return jnp.asarray(x, jnp.float32)


def rand_abs_normal(shape):
    """|N(0,1)| init, the reference's ``torch.randn(*size).abs()``
    (nmf.py:221,234; plca.py:90,105)."""
    return jnp.abs(jax.random.normal(next_rng_key(), tuple(shape), jnp.float32))


def assert_nonneg(x, name: str):
    assert bool(jnp.all(jnp.asarray(x) >= 0.0)), f"Tensor {name} should be non-negative."


def validate_target(V, beta) -> None:
    """Shared input guards for the β-divergence solvers (reference
    nmf.py:329-336): non-negativity, and the divergence warning for
    β ≤ 0 with zeros (raised unconditionally for sparse targets, like the
    reference).  Skipped for traced values."""
    from ..ops.sparse import SparseCOO

    is_sp = isinstance(V, SparseCOO)
    vals = V.values if is_sp else V
    if isinstance(vals, jax.core.Tracer):
        return
    vals = jnp.asarray(np.asarray(vals)) if not isinstance(
        vals, jax.Array
    ) else vals
    assert bool(jnp.all(vals >= 0)), "Target should be non-negative."
    if beta <= 0 and (is_sp or float(vals.min()) == 0):
        raise ValueError(
            "When beta <= 0 and V contains zeros, the training process may "
            "diverge. Please add small values to V, or use a positive beta "
            "value."
        )


def _ntuple(n):
    def parse(x):
        if isinstance(x, Iterabc):
            t = tuple(x)
            assert len(t) == n
            return t
        return (x,) * n

    return parse


single = _ntuple(1)
pair = _ntuple(2)
triple = _ntuple(3)
