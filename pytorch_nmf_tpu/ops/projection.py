r"""Hoyer sparseness projection as a bounded ``lax.while_loop``.

Projects a vector onto the set ``{v >= 0 : ||v||_1 = k1, ||v||_2^2 = k2}``
(Hoyer'04, "Non-negative Matrix Factorization with Sparseness Constraints").
The reference implements this as a data-dependent TorchScript while-loop
(``_proj_func``, torchnmf/nmf.py:21-49).  Here the same fixed-point
iteration runs as a ``lax.while_loop`` so it stays inside jit, vmaps over
rank columns, and shards.  The loop zeroes at least one coordinate per
round, so ``N + 2`` iterations is a hard upper bound; we carry it as a
safety counter (data-dependent trip counts are fine in ``while_loop``).
"""

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["proj_func", "proj_columns", "hoyer_l1_target"]


def hoyer_l1_target(dim: int, s: float) -> float:
    """L1 norm giving sparseness ``s`` at unit L2 for a ``dim``-vector
    (reference nmf.py:461,470)."""
    return dim**0.5 * (1 - s) + s


def proj_func(s, k1, k2):
    """Project ``s`` to L1 norm ``k1`` and squared L2 norm ``k2``.

    ``k1``/``k2`` may be scalars or 0-d arrays (traced). Shape-preserving.
    """
    shape = s.shape
    s = s.reshape(-1).astype(jnp.float32)
    N = s.size
    k1 = jnp.asarray(k1, jnp.float32)
    k2 = jnp.asarray(k2, jnp.float32)

    v0 = s + (k1 - jnp.sum(s)) / N
    zero0 = jnp.zeros((N,), dtype=bool)

    def body(state):
        v, zero, it, _ = state
        n_active = N - jnp.sum(zero)
        m = k1 / n_active
        w = jnp.where(~zero, v - m, v)
        a = w @ w
        b = 2.0 * (w @ v)
        c = v @ v - k2
        disc = jax.nn.relu(b * b - 4.0 * a * c)
        alphap = (-b + jnp.sqrt(disc)) * 0.5 / a
        v = v + alphap * w

        mask = v < 0
        done = ~jnp.any(mask)

        # fix-up branch (only takes effect when not done)
        zero_fix = zero | mask
        v_fix = jax.nn.relu(v)
        v_fix = v_fix + (k1 - jnp.sum(v_fix)) / (N - jnp.sum(zero_fix))
        v_fix = jax.nn.relu(v_fix)

        v = jnp.where(done, v, v_fix)
        zero = jnp.where(done, zero, zero_fix)
        return v, zero, it + 1, done

    def cond(state):
        _, _, it, done = state
        return (~done) & (it < N + 2)

    v, _, _, _ = lax.while_loop(cond, body, (v0, zero0, 0, False))
    return v.reshape(shape)


def proj_columns(x, L1_scale, axis: int = 1, norms=None):
    """Project every rank column of a factor tensor.

    For each index ``j`` along ``axis``, projects the slice ``x[:, j]``
    (flattened) onto L1 norm ``L1_scale * norm_j`` and squared L2 norm
    ``norm_j ** 2`` — the inner step of the reference's Hoyer solvers
    (nmf.py:516-521, 564-569; trainer.py:170-177).  ``norms`` defaults to
    the slices' own L2 norms (the fit path); the SparsityProj trainer passes
    pre-step norms explicitly (reference trainer.py:170).
    """
    x = jnp.asarray(x)
    xm = jnp.moveaxis(x, axis, 0)
    cols = xm.reshape(xm.shape[0], -1)
    if norms is None:
        norms = jnp.sqrt(jnp.sum(cols * cols, axis=1))
    proj = jax.vmap(proj_func)(cols, L1_scale * norms, norms**2)
    return jnp.moveaxis(proj.reshape(xm.shape), 0, axis)


def proj_columns_explicit(x, k1s, k2s, axis: int = 1):
    """Project every column of ``x`` along ``axis`` onto explicit
    ``(k1s[j], k2s[j])`` targets (used for the initial projection to unit
    L2, reference nmf.py:463-464,472-473)."""
    x = jnp.asarray(x)
    xm = jnp.moveaxis(x, axis, 0)
    cols = xm.reshape(xm.shape[0], -1)
    k1s = jnp.broadcast_to(jnp.asarray(k1s, jnp.float32), (cols.shape[0],))
    k2s = jnp.broadcast_to(jnp.asarray(k2s, jnp.float32), (cols.shape[0],))
    proj = jax.vmap(proj_func)(cols, k1s, k2s)
    return jnp.moveaxis(proj.reshape(xm.shape), 0, axis)
