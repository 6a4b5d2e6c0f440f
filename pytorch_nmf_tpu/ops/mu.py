r"""The multiplicative-update (MU) engine.

This is the TPU-native heart of the framework, replacing the reference's
autograd double-backward trick (``_double_backward_update``,
reference torchnmf/nmf.py:52-92).  Instead of mutating ``.grad`` buffers with
two ``Tensor.backward(cotangent)`` calls, we take the VJP of the (pure)
reconstruction function once and apply the two β-specific cotangents to it —
functionally identical, but traceable, jittable, and shardable under
``pjit``/``shard_map``.

For a factor ``p`` with reconstruction ``WH = recon(p)`` the MU multiplier is
``(neg / pos) ** gamma`` where ``neg = ∂⟨WH, neg_cot⟩/∂p`` and
``pos = ∂⟨WH, pos_cot⟩/∂p`` with the cotangent pair chosen per β exactly as
the reference does (nmf.py:61-74):

=====  =====================================  ==========================
β      ``neg_cot``                            ``pos_cot``
=====  =====================================  ==========================
2      ``V``                                  ``WH``
1      ``V / (WH + eps)``                     analytic col-sums (#4)
0      ``V / (WH + eps)**2``                  ``1 / (WH + eps)``
else   ``V * (WH + eps)**(β-2)``              ``(WH + eps)**(β-1)``
=====  =====================================  ==========================

Both contractions are clamped with ``relu(+eps)`` (nmf.py:78,83), the L1/L2
penalties enter the denominator (nmf.py:85-88), and the update is
``p * (neg/pos)**γ`` with the monotone-descent exponent γ
(nmf.py:341-346).  All hyperparameters are static Python floats so each
(β, γ, reg) combination traces to its own fused XLA program.
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import eps

__all__ = [
    "gamma_from_beta",
    "mu_cotangents",
    "mu_multiplier",
    "mu_update",
    "kl_pos_W",
    "kl_pos_H",
    "get_norm",
    "renorm",
]


def gamma_from_beta(beta: float) -> float:
    """MU exponent guaranteeing monotone descent (reference nmf.py:341-346)."""
    if beta < 1:
        return 1.0 / (2.0 - beta)
    elif beta > 2:
        return 1.0 / (beta - 1.0)
    return 1.0


def mu_cotangents(V, WH, beta: float, kl_pos_ones: bool = False):
    """The β-specific (neg, pos) output cotangent pair.

    ``pos`` is ``None`` for β=1 when the caller has an analytic positive term
    (the fit solvers; reference nmf.py:122-131).  With ``kl_pos_ones=True``
    the β=1 positive cotangent is ``ones_like(WH)`` instead — the behaviour
    of the composed-model trainer (reference trainer.py:83).
    """
    if beta == 2:
        return V, WH
    elif beta == 1:
        neg = V / (WH + eps)
        pos = jnp.ones_like(WH) if kl_pos_ones else None
        return neg, pos
    elif beta == 0:
        recip = 1.0 / (WH + eps)
        return recip * recip * V, recip
    else:
        WH_eps = WH + eps
        # one pow, shared: WH_eps^(β-1) = WH_eps^(β-2) · WH_eps
        p2 = WH_eps ** (beta - 2)
        return p2 * V, p2 * WH_eps


def vma_zeros(shape, varying_axis=None):
    """Zero scan carry, tagged as varying over ``varying_axis`` when the
    caller runs inside ``shard_map`` — the scan bodies accumulate
    device-varying data and the replication checker requires carry-in/out
    types to agree."""
    z = jnp.zeros(shape, jnp.float32)
    if varying_axis is not None:
        z = lax.pcast(z, varying_axis, to="varying")
    return z


def mu_multiplier(neg, pos, p, gamma: float, l1_reg: float, l2_reg: float):
    """Assemble the multiplier from clamped numerator/denominator.

    Mirrors reference nmf.py:78-92: ``neg`` and ``pos`` arrive already
    relu-clamped (+eps when not analytic); L1 adds a constant, L2 adds
    ``l2 * p`` to the denominator; ``gamma != 1`` raises to γ.
    """
    if l1_reg > 0:
        pos = pos + l1_reg
    if l2_reg > 0:
        pos = pos + l2_reg * p
    multiplier = neg / pos
    if gamma != 1:
        multiplier = multiplier**gamma
    return multiplier


def mu_update(
    recon: Callable,
    V,
    p,
    beta: float,
    gamma: float,
    l1_reg: float = 0.0,
    l2_reg: float = 0.0,
    pos_precomputed: Optional[jax.Array] = None,
):
    """One dense MU step for a single factor ``p``.

    ``recon`` maps the factor to the reconstruction (all other factors are
    closed over as constants — the functional equivalent of ``.detach()``).
    Cost: one forward + one or two cotangent applications, exactly like the
    reference's one forward + 1-2 backwards (nmf.py:77-83).
    """
    WH, vjp = jax.vjp(recon, p)
    # without an analytic β=1 positive term, vjp(ones) IS that term for
    # any linear recon (kl_pos_ones) — a None cotangent would crash the
    # second vjp application
    neg_cot, pos_cot = mu_cotangents(
        V, WH, beta, kl_pos_ones=pos_precomputed is None
    )

    neg = jax.nn.relu(vjp(neg_cot)[0]) + eps
    if pos_precomputed is not None:
        pos = pos_precomputed
    else:
        pos = jax.nn.relu(vjp(pos_cot)[0]) + eps

    return p * mu_multiplier(neg, pos, p, gamma, l1_reg, l2_reg)


# --------------------------------------------------------------------------
# Analytic KL (β=1) positive terms — avoid the second VJP application
# (reference nmf.py:122-131).  For the W update the denominator is the sum of
# H over every axis but the rank axis (kept for broadcasting); for H it is
# the same over W with the leading singleton squeezed.
# --------------------------------------------------------------------------
def kl_pos_W(H):
    axes = tuple(d for d in range(H.ndim) if d != 1)
    return jnp.sum(H, axis=axes, keepdims=True)


def kl_pos_H(W):
    axes = tuple(d for d in range(W.ndim) if d != 1)
    return jnp.squeeze(jnp.sum(W, axis=axes, keepdims=True), axis=0)


# --------------------------------------------------------------------------
# Norms / renormalization (reference nmf.py:134-159): exploit the
# scale-invariance of WH to move per-rank L2 norm between factors.
# --------------------------------------------------------------------------
def get_norm(x, axis: int = 1):
    """Per-rank-slice L2 norm: reduce ``x*x`` over all axes but ``axis``."""
    x = jnp.asarray(x)
    axes = tuple(d for d in range(x.ndim) if d != axis)
    return jnp.sqrt(jnp.sum(x * x, axis=axes))


def renorm(W, H, unit_norm: str = "W"):
    """Return ``(W, H)`` rescaled so that the chosen factor has unit per-rank
    L2 norm, transferring the scale to the other factor."""
    if unit_norm == "W":
        n = get_norm(W)
        sw = (slice(None),) + (None,) * (W.ndim - 2)
        sh = (slice(None),) + (None,) * (H.ndim - 2)
        return W / n[sw], H * n[sh]
    elif unit_norm == "H":
        n = get_norm(H)
        sh = (slice(None),) + (None,) * (H.ndim - 2)
        sw = (slice(None),) + (None,) * (W.ndim - 2)
        return W * n[sw], H / n[sh]
    raise ValueError("Input type isn't valid!")
