r"""Specialized MU updaters for the plain ``NMF`` model.

The generic VJP engine (:func:`pytorch_nmf_tpu.ops.mu.mu_update`) costs one
forward plus two cotangent GEMMs per factor.  For ``V ≈ H Wᵀ`` specific β
values admit algebraically identical but much cheaper forms; this module
supplies them to the solver through the ``updater_factory`` hook.

β = 2 (Frobenius): the Gram trick.  The denominator contraction
``(H Wᵀ)ᵀ H`` re-associates to ``W (Hᵀ H)`` — an (R×R) Gram matrix and a
skinny GEMM — so neither factor update ever materializes the (M, K)
reconstruction.  Per iteration this is ~3× fewer MXU FLOPs than the generic
path and removes an (M, K) HBM round-trip; it is also the formulation that
shards cleanly (the Gram is a ``psum`` over the data axis).  The relu+eps
clamps match the generic path bit-for-bit semantics (reference
nmf.py:77-83 clamps both contractions the same way).

Other β values keep the WH-ratio structure; their fused Pallas kernels live
in :mod:`pytorch_nmf_tpu.ops.pallas_mu` and are selected here when the
shapes are TPU-friendly.
"""

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import eps
from .mu import kl_pos_H, kl_pos_W, mu_multiplier

__all__ = ["nmf_updater_factory"]


def _dot_tn(a, b):
    """``aᵀ @ b`` with f32 accumulation: contract the leading axis."""
    return lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _beta2_updaters(gamma, l1_reg, l2_reg):
    def upd_W(V, W, H):
        neg = jax.nn.relu(_dot_tn(V, H)) + eps  # VᵀH : (K, R)
        G = _dot_tn(H, H)  # HᵀH : (R, R)
        pos = jax.nn.relu(W @ G) + eps
        return W * mu_multiplier(neg, pos, W, gamma, l1_reg, l2_reg)

    def upd_H(V, W, H):
        neg = jax.nn.relu(V @ W) + eps  # (M, R)
        G = _dot_tn(W, W)  # WᵀW : (R, R)
        pos = jax.nn.relu(H @ G) + eps
        return H * mu_multiplier(neg, pos, H, gamma, l1_reg, l2_reg)

    # NOTE: no fused loss here.  The tempting Gram identity
    # 0.5(⟨V,V⟩ - 2⟨VᵀH,W⟩ + ⟨H(WᵀW),H⟩) cancels catastrophically in
    # float32 near convergence (can go negative -> NaN after sqrt, killing
    # the tolerance check), so the solver's default direct
    # euclidean(recon, V) is used for the every-10-iterations cadence —
    # its cost is amortized to noise.
    return upd_W, upd_H


def _pallas_updaters(beta, gamma, l1_reg, l2_reg):
    from .pallas_mu import (
        _fused_contractions,
        fused_beta_loss,
        h_side_contractions,
        w_side_contractions,
    )

    need_pos = beta != 1

    if beta == 1 and l1_reg == 0 and l2_reg == 0:
        # fully-fused KL update: the kernel applies relu/eps and the
        # analytic-denominator multiply at the final accumulation step, so
        # the updated factor is the kernel output (no epilogue HBM pass)
        def upd_W(V, W, H):
            out, _ = _fused_contractions(
                V, H, W, beta=1.0, need_pos=False, w_side=True,
                mu_pos=kl_pos_W(H),
            )
            return out

        def upd_H(V, W, H):
            out, _ = _fused_contractions(
                V, H, W, beta=1.0, need_pos=False, w_side=False,
                mu_pos=kl_pos_H(W).reshape(1, -1),
            )
            return out

        return upd_W, upd_H

    def upd_W(V, W, H):
        neg, pos = w_side_contractions(V, H, W, beta, need_pos)
        neg = jax.nn.relu(neg) + eps
        pos = kl_pos_W(H) if beta == 1 else jax.nn.relu(pos) + eps
        return W * mu_multiplier(neg, pos, W, gamma, l1_reg, l2_reg)

    def upd_H(V, W, H):
        neg, pos = h_side_contractions(V, H, W, beta, need_pos)
        neg = jax.nn.relu(neg) + eps
        pos = kl_pos_H(W) if beta == 1 else jax.nn.relu(pos) + eps
        return H * mu_multiplier(neg, pos, H, gamma, l1_reg, l2_reg)

    if beta == 1:
        # measured (marginal rate, TPU v5e): the plain XLA KL loss beats the
        # fused kernel at beta=1 (0.057 vs 0.063 ms/iter incl. updates) —
        # the fused reduction only pays off for pow-heavy cotangents
        return upd_W, upd_H

    def loss_terms(V, W, H):
        return fused_beta_loss(V, H, W, beta)

    return upd_W, upd_H, loss_terms


def nmf_updater_factory(beta, gamma, l1_reg, l2_reg):
    """Return specialized ``(upd_W, upd_H)`` for this β, or ``None`` to use
    the generic VJP engine.

    β = 2 → Gram-trick updaters (pure XLA, shard-friendly); other β on a
    TPU backend → fused Pallas ratio-GEMM kernels (single-device).
    """
    if beta == 2:
        return _beta2_updaters(gamma, l1_reg, l2_reg)
    from .pallas_mu import pallas_supported

    if pallas_supported():
        return _pallas_updaters(beta, gamma, l1_reg, l2_reg)
    return None


def nmf_updater_factory_spmd(beta, gamma, l1_reg, l2_reg):
    """Variant for multi-device (GSPMD-annotated) inputs: only the
    shard-friendly Gram path; the Pallas kernels are single-device."""
    if beta == 2:
        return _beta2_updaters(gamma, l1_reg, l2_reg)
    return None
