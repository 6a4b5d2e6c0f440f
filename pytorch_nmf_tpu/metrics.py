r"""Beta-divergence family and the Hoyer sparseness measure.

TPU-native re-implementation of the reference metrics module
(``torchnmf/metrics.py``), with identical epsilon placement so that loss
trajectories match the reference to float32 precision:

* ``kl_div``      — generalized Kullback-Leibler divergence (β = 1);
  eps added inside both logs (reference metrics.py:22).
* ``euclidean``   — half squared Frobenius distance (β = 2)
  (reference metrics.py:39).
* ``is_div``      — Itakura-Saito divergence (β = 0); eps added to both
  input and target (reference metrics.py:56-57).
* ``beta_div``    — generic β; dispatches to the three specials, otherwise
  eps-guards the input, and the target too when β < 0
  (reference metrics.py:85-96).
* ``sparseness``  — Hoyer'04 sparseness measure (reference metrics.py:99-115).

All functions are pure, jittable and accept anything convertible with
``jnp.asarray`` (including :class:`~pytorch_nmf_tpu.module.Parameter`).
``beta`` must be a static Python number (it selects the traced graph).
"""

import jax.numpy as jnp

from .constants import eps

__all__ = ["kl_div", "euclidean", "is_div", "beta_div", "sparseness"]


def kl_div(input, target):
    r"""Generalized Kullback-Leibler divergence (β-divergence at β = 1).

    .. math::
        \ell(x, y) = \sum_n x_n \log\frac{x_n}{y_n} - x_n + y_n

    where ``x = target`` and ``y = input`` (matching the reference's
    argument order: the first argument is the reconstruction).
    """
    input = jnp.asarray(input)
    target = jnp.asarray(target)
    t = target.reshape(-1)
    i = input.reshape(-1)
    return t @ (jnp.log(t + eps) - jnp.log(i + eps)) - t.sum() + i.sum()


def euclidean(input, target):
    r"""Half squared Euclidean distance (β-divergence at β = 2).

    .. math::
        \ell(x, y) = \frac{1}{2} \sum_n (x_n - y_n)^2
    """
    input = jnp.asarray(input)
    target = jnp.asarray(target)
    d = input - target
    return 0.5 * jnp.sum(d * d)


def is_div(input, target):
    r"""Itakura-Saito divergence (β-divergence at β = 0).

    .. math::
        \ell(x, y) = \sum_n \frac{x_n}{y_n} - \log\frac{x_n}{y_n} - 1
    """
    input = jnp.asarray(input)
    target = jnp.asarray(target)
    t_eps = target + eps
    i_eps = input + eps
    return (
        jnp.sum(t_eps / i_eps)
        - jnp.sum(jnp.log(t_eps))
        + jnp.sum(jnp.log(i_eps))
        - target.size
    )


def beta_div(input, target, beta=2):
    r"""The β-divergence.

    .. math::
        \ell(x, y) = \sum_n \frac{x_n^\beta + (\beta-1) y_n^\beta
                     - \beta x_n y_n^{\beta-1}}{\beta(\beta-1)}

    ``beta`` must be a static Python number; the three special values
    dispatch to the closed-form metrics above.
    """
    if beta == 2:
        return euclidean(input, target)
    elif beta == 1:
        return kl_div(input, target)
    elif beta == 0:
        return is_div(input, target)

    input = jnp.asarray(input).reshape(-1) + eps
    target = jnp.asarray(target).reshape(-1)
    if beta < 0:
        target = target + eps
    bm1 = beta - 1

    target_pow = jnp.sum(target**beta)
    input_pow = jnp.sum(input**beta)
    cross = target @ input**bm1

    loss = target_pow + bm1 * input_pow - beta * cross
    return loss / (beta * bm1)


def sparseness(x):
    r"""Hoyer'04 sparseness measure.

    .. math::
        f(x) = \frac{\sqrt{N} - \|x\|_1 / \|x\|_2}{\sqrt{N} - 1}

    Returns a scalar in [0, 1]: 1 is the most sparse, 0 the most dense.
    """
    x = jnp.asarray(x).reshape(-1)
    N = x.size
    l1 = jnp.sum(jnp.abs(x))
    l2 = jnp.sqrt(jnp.sum(x * x))
    return (N**0.5 - l1 / l2) / (N**0.5 - 1)
