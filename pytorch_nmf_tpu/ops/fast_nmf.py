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

__all__ = [
    "nmf_updater_factory",
    "nmf_updater_factory_pallas",
    "nmf_updater_factory_interpret",
    "nmf_updater_factory_xla",
    "resolve_nmf_updater_factory",
]


def _dot_tn(a, b):
    """``aᵀ @ b`` with f32 accumulation: contract the leading axis.

    Mixed-precision operands (a bfloat16 target against float32 factors)
    are harmonized via jnp promotion; on TPU the MXU consumes bf16
    natively, so XLA's bfloat16 propagation elides the upcast."""
    if a.dtype != b.dtype:
        dt = jnp.promote_types(a.dtype, b.dtype)
        a, b = a.astype(dt), b.astype(dt)
    from .recon import acc_type

    return lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=acc_type(a, b)
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


def _pallas_updaters(beta, gamma, l1_reg, l2_reg, interpret=False):
    from .pallas_mu import (
        _fused_contractions,
        fused_beta_loss,
        h_side_contractions,
        w_side_contractions,
    )

    need_pos = beta != 1

    if beta == 1 and gamma == 1 and l1_reg == 0 and l2_reg == 0:
        # fully-fused KL update: the kernel applies relu/eps and the
        # analytic-denominator multiply at the final accumulation step, so
        # the updated factor is the kernel output (no epilogue HBM pass)
        def upd_W(V, W, H):
            out, _ = _fused_contractions(
                V, H, W, beta=1.0, need_pos=False, w_side=True,
                mu_pos=kl_pos_W(H), interpret=interpret,
            )
            return out

        def upd_H(V, W, H):
            out, _ = _fused_contractions(
                V, H, W, beta=1.0, need_pos=False, w_side=False,
                mu_pos=kl_pos_H(W).reshape(1, -1), interpret=interpret,
            )
            return out

        return upd_W, upd_H

    def upd_W(V, W, H):
        neg, pos = w_side_contractions(V, H, W, beta, need_pos, interpret)
        neg = jax.nn.relu(neg) + eps
        pos = kl_pos_W(H) if beta == 1 else jax.nn.relu(pos) + eps
        return W * mu_multiplier(neg, pos, W, gamma, l1_reg, l2_reg)

    def upd_H(V, W, H):
        neg, pos = h_side_contractions(V, H, W, beta, need_pos, interpret)
        neg = jax.nn.relu(neg) + eps
        pos = kl_pos_H(W) if beta == 1 else jax.nn.relu(pos) + eps
        return H * mu_multiplier(neg, pos, H, gamma, l1_reg, l2_reg)

    if beta == 1:
        # measured (marginal rate, TPU v5e): the plain XLA KL loss beats the
        # fused kernel at beta=1 (0.057 vs 0.063 ms/iter incl. updates) —
        # the fused reduction only pays off for pow-heavy cotangents
        return upd_W, upd_H

    def loss_terms(V, W, H):
        return fused_beta_loss(V, H, W, beta, interpret)

    return upd_W, upd_H, loss_terms


def nmf_updater_factory_pallas(beta, gamma, l1_reg, l2_reg):
    """β = 2 → Gram-trick updaters (pure XLA); other β → compiled fused
    Pallas ratio-GEMM kernels (single TPU device)."""
    if beta == 2:
        return _beta2_updaters(gamma, l1_reg, l2_reg)
    return _pallas_updaters(beta, gamma, l1_reg, l2_reg, interpret=False)


def nmf_updater_factory_interpret(beta, gamma, l1_reg, l2_reg):
    """Like :func:`nmf_updater_factory_pallas` but running the kernels
    through the Pallas interpreter (CPU testing)."""
    if beta == 2:
        return _beta2_updaters(gamma, l1_reg, l2_reg)
    return _pallas_updaters(beta, gamma, l1_reg, l2_reg, interpret=True)


def nmf_updater_factory_xla(beta, gamma, l1_reg, l2_reg):
    """Pallas-free subset: the Gram trick at β = 2, the generic VJP engine
    otherwise.  Also the shard-safe choice under GSPMD-annotated inputs."""
    if beta == 2:
        return _beta2_updaters(gamma, l1_reg, l2_reg)
    return None


# backwards-compatible alias (pre-round-2 name for the GSPMD-safe subset)
nmf_updater_factory_spmd = nmf_updater_factory_xla


def resolve_nmf_updater_factory(multi_device: bool = False, dtype=None):
    """Pick the NMF updater factory for *this* call.

    Returns one of the module-level factory functions so that solver caches
    keyed on the factory object distinguish Pallas / interpreter / plain-XLA
    paths — the env toggles (``PNT_NO_PALLAS``, ``PNT_PALLAS_INTERPRET``)
    are re-read on every call instead of being baked into a cached trace.
    """
    from .pallas_mu import _interpret_mode, pallas_supported

    if dtype is not None and jnp.dtype(dtype) == jnp.float64:
        # x64: the Pallas kernels pin their outputs to f32 (a while_loop
        # carry mismatch against f64 factors); the XLA Gram updaters
        # accumulate in the operand dtype (acc_type) and stay exact
        return nmf_updater_factory_xla
    if multi_device:
        # Pallas kernels are single-device; GSPMD-sharded inputs take the
        # shard-friendly XLA subset (the explicit shard_map solver in
        # :mod:`pytorch_nmf_tpu.parallel.sharded` runs Pallas per shard).
        return nmf_updater_factory_xla
    if not pallas_supported():
        return nmf_updater_factory_xla
    if _interpret_mode():
        return nmf_updater_factory_interpret
    return nmf_updater_factory_pallas


def nmf_updater_factory(beta, gamma, l1_reg, l2_reg):
    """Env-resolving convenience wrapper (benchmarks, scripts).

    Callers that cache compiled fits per factory object should call
    :func:`resolve_nmf_updater_factory` themselves and pass its result, so
    the Pallas/interpret decision lands in their cache key.
    """
    return resolve_nmf_updater_factory()(beta, gamma, l1_reg, l2_reg)
