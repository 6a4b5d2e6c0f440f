r"""Sharded NMF solvers: GSPMD annotation helpers and an explicit
``shard_map`` MU step with ``psum``-reduced contractions.

Two complementary paths (SURVEY.md §5 "distributed communication backend"):

1. **Annotation path** (works for every model): place ``V`` (and optionally
   the factors) with a ``NamedSharding`` over the sample axis via
   :func:`shard_target`, then call the ordinary ``BaseComponent.fit(V)`` —
   multi-device targets are auto-detected (models/nmf.py) and XLA GSPMD
   partitions the GEMMs / convolutions and inserts the collectives.

2. **Explicit path** (this module, ``NMF`` only): the MU algebra is
   embarrassingly reducible — for ``V ≈ H Wᵀ`` with rows (samples) sharded
   over a ``data`` axis and feature columns over a ``model`` axis, the
   W-update numerator ``f(V, WH)ᵀ H`` and denominator are partial sums over
   local row blocks, combined with one ``psum`` over ``data`` per factor per
   iteration (and over ``model`` for the H update).  ``shard_map`` makes
   this traffic explicit and keeps it on ICI.

Both are exercised by the CPU-simulated 8-device mesh tests
(tests/test_parallel.py) and the driver's ``dryrun_multichip``.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import eps
from ..metrics import beta_div
from ..ops.mu import gamma_from_beta, mu_cotangents, mu_multiplier
from ..ops.solver import (
    _converging_loop,
    _plca_em_iter,
    _plca_marginal_sum,
    alpha_is_active,
)

__all__ = [
    "shard_target",
    "sharded_nmf_fit",
    "sharded_plca_fit",
    "nmf_updater_factory_sharded",
]


def shard_target(x, mesh: Mesh, spec: P):
    """Place ``x`` on ``mesh`` with the given :class:`PartitionSpec`."""
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))


# --------------------------------------------------------------------------
# Explicit shard_map MU fit for NMF
# --------------------------------------------------------------------------
def _local_nmf_updaters(
    beta, gamma, l1_reg, l2_reg, data_axis, model_axis, fuse,
    interpret=None,
):
    """Per-shard W/H MU updates with explicit psum-reduced contractions.

    Shared by the explicit shard_map solver below and the GSPMD
    annotation-path updater factory (:func:`nmf_updater_factory_sharded`).
    Local shapes: ``V (m_loc, k_loc)``, ``W (k_loc, R)``, ``H (m_loc, R)``.
    """
    if fuse:
        from ..ops.pallas_mu import h_side_contractions, w_side_contractions
    need_pos = beta not in (1, 2)

    def wh(w, h):
        return lax.dot_general(
            h, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def upd_W(V, w, h):
        # contract the data axis -> psum over 'data'
        if fuse:
            neg_l, pos_l = w_side_contractions(
                V, h, w, beta, need_pos, interpret
            )
        else:
            WH = wh(w, h)
            neg_cot, pos_cot = mu_cotangents(V, WH, beta)
            neg_l = lax.dot_general(
                neg_cot, h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            pos_l = None if beta == 1 else lax.dot_general(
                pos_cot, h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        neg = jax.nn.relu(lax.psum(neg_l, data_axis)) + eps
        if beta == 1:
            pos = lax.psum(jnp.sum(h, axis=0, keepdims=True), data_axis)
        else:
            pos = jax.nn.relu(lax.psum(pos_l, data_axis)) + eps
        return w * mu_multiplier(neg, pos, w, gamma, l1_reg, l2_reg)

    def upd_H(V, w, h):
        # contract the feature axis -> psum over 'model'
        if fuse:
            neg_l, pos_l = h_side_contractions(
                V, h, w, beta, need_pos, interpret
            )
        else:
            WH = wh(w, h)
            neg_cot, pos_cot = mu_cotangents(V, WH, beta)
            neg_l = neg_cot @ w
            pos_l = None if beta == 1 else pos_cot @ w
        neg = lax.psum(neg_l, model_axis) if model_axis else neg_l
        neg = jax.nn.relu(neg) + eps
        if beta == 1:
            pos = jnp.sum(w, axis=0, keepdims=True)
            if model_axis:
                pos = lax.psum(pos, model_axis)
            pos = jnp.squeeze(pos, axis=0)
        else:
            pos = lax.psum(pos_l, model_axis) if model_axis else pos_l
            pos = jax.nn.relu(pos) + eps
        return h * mu_multiplier(neg, pos, h, gamma, l1_reg, l2_reg)

    return upd_W, upd_H


@lru_cache(maxsize=None)
def _get_sharded_nmf_fit(
    mesh: Mesh,
    beta: float,
    tol: float,
    max_iter: int,
    l1_reg: float,
    l2_reg: float,
    data_axis: str,
    model_axis,  # str or None
    use_pallas: bool,
    interpret: bool = False,
):
    gamma = gamma_from_beta(beta)
    axes_all = (data_axis,) + ((model_axis,) if model_axis else ())
    # the fused kernels help where WH must be formed elementwise; β=2's
    # local contractions are plain GEMMs already
    fuse = use_pallas and beta != 2
    if fuse:
        from ..ops.pallas_mu import fused_beta_loss
    upd_W, upd_H = _local_nmf_updaters(
        beta, gamma, l1_reg, l2_reg, data_axis, model_axis, fuse, interpret
    )

    def local_fit(V, W, H):
        # V: (m_loc, k_loc), W: (k_loc, R), H: (m_loc, R)
        def loss_of(state):
            w, h = state
            if fuse:
                part = fused_beta_loss(V, h, w, beta, interpret)
            else:
                WH = lax.dot_general(
                    h, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                part = beta_div(WH, V, beta)
            return jnp.sqrt(2.0 * lax.psum(part, axes_all))

        def one_iter(state):
            w, h = state
            w = upd_W(V, w, h)
            h = upd_H(V, w, h)
            return w, h

        (W, H), k, conv, _ = _converging_loop(
            one_iter, loss_of, (W, H), tol, max_iter, False
        )
        n_iter = jnp.where(conv, k * 10, max_iter)
        return W, H, n_iter

    v_spec = P(data_axis, model_axis) if model_axis else P(data_axis)
    w_spec = P(model_axis, None) if model_axis else P()
    h_spec = P(data_axis, None)

    mapped = jax.shard_map(
        local_fit,
        mesh=mesh,
        in_specs=(v_spec, w_spec, h_spec),
        out_specs=(w_spec, h_spec, P()),
        # With Pallas kernels in the body the VMA checker would require
        # varying-axis declarations on the kernels' out_shapes, which
        # pallas_call cannot express generically; the plain-XLA branch
        # keeps the replication checker on.
        check_vma=not fuse,
    )
    return jax.jit(mapped)


# --------------------------------------------------------------------------
# GSPMD annotation path: shard_map-wrapped fused updaters for the ordinary
# dense solver (plugged in as ``updater_factory`` by models/nmf.py when
# ``fit`` sees a multi-device NMF target).
# --------------------------------------------------------------------------
class _ShardedUpdaterFactory:
    """Hashable ``updater_factory`` producing shard_map'd per-shard updaters.

    Instances are interned by :func:`nmf_updater_factory_sharded` so the
    solver's ``lru_cache`` keyed on the factory object hits across fit calls
    with the same mesh/axes/Pallas configuration.
    """

    def __init__(self, mesh, data_axis, model_axis, use_pallas, interpret):
        self.mesh = mesh
        self.data_axis = data_axis
        self.model_axis = model_axis
        self.use_pallas = use_pallas
        self.interpret = interpret

    def __call__(self, beta, gamma, l1_reg, l2_reg):
        if beta == 2:
            # β=2's Gram updaters are already shard-friendly global GEMMs —
            # GSPMD partitions them with one psum over the contracted axis;
            # no shard_map needed.
            from ..ops.fast_nmf import _beta2_updaters

            return _beta2_updaters(gamma, l1_reg, l2_reg)
        fuse = self.use_pallas
        upd_W_local, upd_H_local = _local_nmf_updaters(
            beta, gamma, l1_reg, l2_reg, self.data_axis, self.model_axis,
            fuse, self.interpret,
        )
        data_axis, model_axis = self.data_axis, self.model_axis
        v_spec = P(data_axis, model_axis) if model_axis else P(data_axis)
        w_spec = P(model_axis, None) if model_axis else P()
        h_spec = P(data_axis, None)

        upd_W = jax.shard_map(
            upd_W_local, mesh=self.mesh,
            in_specs=(v_spec, w_spec, h_spec), out_specs=w_spec,
            check_vma=not fuse,
        )
        upd_H = jax.shard_map(
            upd_H_local, mesh=self.mesh,
            in_specs=(v_spec, w_spec, h_spec), out_specs=h_spec,
            check_vma=not fuse,
        )

        # both already match the solver updater signature
        # upd(V, W, H) -> new factor
        return upd_W, upd_H


@lru_cache(maxsize=None)
def nmf_updater_factory_sharded(
    mesh: Mesh, data_axis: str, model_axis, use_pallas: bool,
    interpret: bool = False,
):
    """Interned shard_map updater factory for GSPMD-annotated NMF fits."""
    return _ShardedUpdaterFactory(
        mesh, data_axis, model_axis, use_pallas, interpret
    )


def sharded_nmf_fit(
    V,
    W,
    H,
    mesh: Mesh,
    beta: float = 1,
    tol: float = 1e-4,
    max_iter: int = 200,
    l1_reg: float = 0.0,
    l2_reg: float = 0.0,
    data_axis: str = "data",
    model_axis=None,
    use_pallas=None,
):
    """Run the explicit-collectives MU fit for ``V ≈ H Wᵀ`` on ``mesh``.

    ``V (M, K)`` is sharded ``P(data_axis[, model_axis])``, ``H (M, R)``
    over ``data_axis``, ``W (K, R)`` over ``model_axis`` (replicated if no
    model axis).  Returns ``(W, H, n_iter)`` with the same shardings.

    On TPU the per-shard contractions run through the fused Pallas kernels
    (β ≠ 2) — the multi-chip fast path; ``use_pallas`` overrides the
    autodetection.
    """
    from ..ops.pallas_mu import _interpret_mode, pallas_supported

    if use_pallas is None:
        use_pallas = pallas_supported()
    fit = _get_sharded_nmf_fit(
        mesh,
        float(beta),
        float(tol),
        int(max_iter),
        float(l1_reg),
        float(l2_reg),
        data_axis,
        model_axis,
        bool(use_pallas),
        _interpret_mode(),  # resolved per call -> part of the cache key
    )
    v_spec = P(data_axis, model_axis) if model_axis else P(data_axis)
    w_spec = P(model_axis, None) if model_axis else P()
    V = shard_target(V, mesh, v_spec)
    W = shard_target(W, mesh, w_spec)
    H = shard_target(H, mesh, P(data_axis, None))
    return fit(V, W, H)


# --------------------------------------------------------------------------
# Explicit shard_map EM fit for PLCA (samples sharded over the data axis)
# --------------------------------------------------------------------------
@lru_cache(maxsize=None)
def _get_sharded_plca_fit(
    mesh: Mesh,
    tol: float,
    max_iter: int,
    update_W: bool,
    update_H: bool,
    update_Z: bool,
    W_alpha_active: bool,
    H_alpha_active: bool,
    Z_alpha_active: bool,
    data_axis: str,
    verbose: bool = False,
):
    # verbose = record-and-replay: cadence (loss, log-probability) pairs
    # land in the loop carry and are replayed after the program — a live
    # debug callback inside shard_map would fire once per device
    def local_fit(V, W, H, Z, W_alpha, H_alpha, Z_alpha):
        # V: (m_loc, K), H: (m_loc, R); W (K, R) and Z (R,) replicated.
        norm = lax.psum(jnp.sum(V), data_axis)
        Vn = V / norm

        def recon(h, w, z):
            return lax.dot_general(
                h, w * z, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def loss_of(state):
            w, h, z = state
            WZH = recon(h, w, z)
            part = beta_div(WZH * norm, Vn * norm, 1)
            return jnp.sqrt(2.0 * lax.psum(part, data_axis))

        def log_probability(state):
            # verbose-only posterior log-probability (reference
            # plca.py:18-20); the data and sharded-H prior terms psum
            # over the sample axis, W/Z terms are replicated
            w, h, z = state
            WZH = recon(h, w, z)
            lp = lax.psum(
                Vn.reshape(-1) @ jnp.log(WZH + eps).reshape(-1), data_axis
            )
            lp = lp + jnp.sum(jnp.log(w + eps) * (W_alpha - 1.0))
            lp = lp + lax.psum(
                jnp.sum(jnp.log(h + eps) * (H_alpha - 1.0)), data_axis
            )
            lp = lp + jnp.sum(jnp.log(z + eps) * (Z_alpha - 1.0))
            return lp

        def one_iter(state):
            # the shared EM iteration (ops/solver._plca_em_iter): one VJP
            # E-step — cotangents of the REPLICATED w and z come back
            # auto-psum'd by shard_map's replication tracking (no
            # explicit psum, see halo.py) — with the H marginal psum'd
            # over the sharded sample axis.  No h_mask: shard_map
            # requires the data axis to divide evenly, so there is no
            # padding for the Dirichlet adjustment to pollute.
            return _plca_em_iter(
                recon, update_W, update_H, update_Z,
                W_alpha_active, H_alpha_active, Z_alpha_active,
                Vn, state, W_alpha, H_alpha, Z_alpha,
                h_marginal=lambda hh: lax.psum(
                    _plca_marginal_sum(hh), data_axis
                ),
            )

        (W, H, Z), k, conv, trace = _converging_loop(
            one_iter, loss_of, (W, H, Z), tol, max_iter, verbose,
            extra_of=log_probability if verbose else None, record=verbose,
        )
        # reference quirk: raw loop index (plca.py:304)
        n_iter = jnp.where(conv, k * 10 - 1, max_iter - 1)
        out = (W, H, Z, n_iter, norm)
        return out + (k, trace[0], trace[1]) if verbose else out

    out_specs = (P(), P(data_axis, None), P(), P(), P())
    if verbose:
        out_specs = out_specs + (P(), P(), P())
    mapped = jax.shard_map(
        local_fit,
        mesh=mesh,
        in_specs=(
            P(data_axis), P(), P(data_axis, None), P(), P(), P(), P(),
        ),
        out_specs=out_specs,
    )
    return jax.jit(mapped)


def sharded_plca_fit(
    V,
    W,
    H,
    Z,
    mesh: Mesh,
    tol: float = 1e-4,
    max_iter: int = 200,
    W_alpha=1.0,
    H_alpha=1.0,
    Z_alpha=1.0,
    update_W: bool = True,
    update_H: bool = True,
    update_Z: bool = True,
    data_axis: str = "data",
    verbose: bool = False,
):
    """EM-fit plain PLCA with the sample axis sharded over ``mesh``.

    Inputs must already be probability-normalized (as the PLCA constructor
    does).  Returns ``(W, H, Z, n_iter, norm)`` matching the single-device
    trajectories; ``H`` stays sharded over ``data_axis``.  ``verbose``
    records the cadence (loss, log-probability) pairs on device and
    replays them to the progress handlers after the program completes.
    """
    fit = _get_sharded_plca_fit(
        mesh, float(tol), int(max_iter),
        update_W, update_H, update_Z,
        alpha_is_active(W_alpha), alpha_is_active(H_alpha),
        alpha_is_active(Z_alpha),
        data_axis, bool(verbose),
    )
    V = shard_target(V, mesh, P(data_axis))
    H = shard_target(H, mesh, P(data_axis, None))
    W = shard_target(W, mesh, P())
    Z = shard_target(Z, mesh, P())
    alphas = (
        jnp.asarray(W_alpha, jnp.float32),
        jnp.asarray(H_alpha, jnp.float32),
        jnp.asarray(Z_alpha, jnp.float32),
    )
    if verbose:
        from ..ops.solver import _emit_recorded

        W, H, Z, n_iter, norm, k, losses, extras = fit(V, W, H, Z, *alphas)
        _emit_recorded(k, losses, extras)
        return W, H, Z, n_iter, norm
    return fit(V, W, H, Z, *alphas)
