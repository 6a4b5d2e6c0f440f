"""Fused E-step for dense PLCA (single TPU device).

The PLCA EM E-step is one VJP with cotangent ``Vn / (WZH + eps)``
(reference plca.py:252-253).  For the *dense* model — ``recon = H @ (W·Z)ᵀ``
(reference plca.py:370-372) — the three cotangents are exactly the fused
β=1 ratio-GEMM contractions the dense-NMF fast path already ships
(:mod:`pytorch_nmf_tpu.ops.pallas_mu`): with ``Wz = W·Z``,

    gH = ratio @ Wz                    (the h-side fused contraction)
    gW = (ratioᵀ @ H) · Z              (the w-side fused contraction, scaled)
    gZ = Σ_k W ⊙ (ratioᵀ @ H)          (a cheap epilogue reduction)

where ``ratio = Vn / (H@Wzᵀ + eps)`` is computed tile-by-tile in VMEM — the
reconstruction and the ratio never hit HBM.

**Measured and rejected as the default** (TPU v5e, 2026-08-17): at the
reference scale 5168×1025 the generic single-VJP E-step runs 0.0280 ms/iter
(r88) / 0.0239 (r8) vs 0.0629 / 0.0615 for this fused form — 2.2-2.6×
*slower*.  Unlike the MU case (two recons per iteration, one per factor
update), EM shares ONE recon across all three cotangents, and XLA fuses the
``Vn/(WZH+eps)`` ratio into the consumer GEMMs on its own — so the generic
path is already ~3 GEMMs with no materialized intermediate worth saving,
while the two fused kernels each recompute the recon (4 GEMM-passes total).
The engine stays available behind ``PNT_PLCA_FUSED=1`` for re-measurement
on other hardware; the resolver defaults to the generic VJP E-step.

Eps placement matches the EM step exactly: the β=1 kernel cotangent is
``v / (wh + eps)`` (pallas_mu.py::_cotangent_tiles), the same constant and
the same placement as ``Vn / (WZH + eps)``.

Engine selection mirrors :func:`ops.fast_nmf.resolve_nmf_updater_factory`:
module-level factory objects so solver caches keyed on the factory
distinguish Pallas / interpreter runs, and the env switches
(``PNT_PLCA_FUSED=1`` opt-in, ``PNT_NO_PALLAS``, ``PNT_PALLAS_INTERPRET``)
are re-read per call.
"""

from __future__ import annotations

import os

import jax.numpy as jnp


def _cotangents(interpret: bool):
    from .pallas_mu import h_side_contractions, w_side_contractions

    def cotangents(Vn, w, h, z):
        wz = w * z
        # gH: ratio @ Wz, recon tiles H @ Wzᵀ built in VMEM
        gH, _ = h_side_contractions(
            Vn, h, wz, 1.0, need_pos=False, interpret=interpret
        )
        # base_w: ratioᵀ @ H (the kernel recomputes the same recon tiles)
        base_w, _ = w_side_contractions(
            Vn, h, wz, 1.0, need_pos=False, interpret=interpret
        )
        gW = base_w * z
        gZ = jnp.sum(w * base_w, axis=0)
        return gH, gW, gZ

    return cotangents


def plca_em_engine_pallas():
    """Compiled fused E-step cotangents (TPU)."""
    return _cotangents(interpret=False)


def plca_em_engine_interpret():
    """Fused E-step through the Pallas interpreter (CPU testing)."""
    return _cotangents(interpret=True)


def resolve_plca_em_engine(V):
    """Pick the dense-PLCA E-step engine for *this* fit call.

    Returns a module-level engine factory (hashable — it lands in the
    solver's lru-cache key) or ``None`` for the generic VJP E-step.

    Opt-in (``PNT_PLCA_FUSED=1``): the generic path measured faster at
    every tested shape on v5e (see module docstring), so the default is
    always ``None`` there.  When enabled, fused engines apply only to
    single-device 2-D float32 targets: the kernels are single-device
    Mosaic programs with float32 outputs, so GSPMD-sharded and x64
    (float64) fits keep the generic path.
    """
    from .pallas_mu import _interpret_mode, pallas_supported

    if os.environ.get("PNT_PLCA_FUSED", "") != "1":
        return None
    if getattr(V, "ndim", 0) != 2 or V.dtype != jnp.float32:
        return None
    if not pallas_supported():
        return None
    if _interpret_mode():
        return plca_em_engine_interpret
    return plca_em_engine_pallas
