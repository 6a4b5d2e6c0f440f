r"""Sharded NMF solvers: GSPMD annotation helpers and an explicit
``shard_map`` MU step with ``psum``-reduced contractions.

Two complementary paths (SURVEY.md §5 "distributed communication backend"):

1. **Annotation path** (works for every model): place ``V`` and ``H`` with a
   ``NamedSharding`` over the sample axis (and optionally the feature axis)
   and run the ordinary jitted solver — XLA GSPMD partitions the GEMMs /
   convolutions and inserts the collectives.  Use :func:`shard_target` +
   ``BaseComponent.fit(..., mesh=...)``.

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
from ..ops.mu import gamma_from_beta, mu_multiplier

__all__ = ["shard_target", "sharded_nmf_fit"]


def shard_target(x, mesh: Mesh, spec: P):
    """Place ``x`` on ``mesh`` with the given :class:`PartitionSpec`."""
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))


# --------------------------------------------------------------------------
# Explicit shard_map MU fit for NMF
# --------------------------------------------------------------------------
def _local_cotangents(V, WH, beta):
    if beta == 2:
        return V, WH
    elif beta == 1:
        return V / (WH + eps), None
    elif beta == 0:
        r = 1.0 / (WH + eps)
        return r * r * V, r
    else:
        WHe = WH + eps
        return WHe ** (beta - 2) * V, WHe ** (beta - 1)


def _local_beta_div_terms(V, WH, beta):
    """Per-block partial sum of the β-divergence (psum-able)."""
    if beta == 2:
        d = WH - V
        return 0.5 * jnp.sum(d * d)
    elif beta == 1:
        return jnp.sum(
            V * (jnp.log(V + eps) - jnp.log(WH + eps)) - V + WH
        )
    elif beta == 0:
        te, ie = V + eps, WH + eps
        return jnp.sum(te / ie - jnp.log(te) + jnp.log(ie) - 1.0)
    else:
        ie = WH + eps
        t = V
        if beta < 0:
            t = t + eps
        return jnp.sum(
            (t**beta + (beta - 1) * ie**beta - beta * t * ie ** (beta - 1))
        ) / (beta * (beta - 1))


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
):
    gamma = gamma_from_beta(beta)
    axes_all = (data_axis,) + ((model_axis,) if model_axis else ())
    # the fused kernels help where WH must be formed elementwise; β=2's
    # local contractions are plain GEMMs already
    fuse = use_pallas and beta != 2
    if fuse:
        from ..ops.pallas_mu import (
            fused_beta_loss,
            h_side_contractions,
            w_side_contractions,
        )
    need_pos = beta not in (1, 2)

    def local_fit(V, W, H):
        # V: (m_loc, k_loc), W: (k_loc, R), H: (m_loc, R)
        def wh(w, h):
            return lax.dot_general(
                h, w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        def loss_of(state):
            w, h = state
            if fuse:
                part = fused_beta_loss(V, h, w, beta)
            else:
                part = _local_beta_div_terms(V, wh(w, h), beta)
            return jnp.sqrt(2.0 * lax.psum(part, axes_all))

        def one_iter(state):
            w, h = state
            # ---- W update (contract the data axis -> psum over 'data') ----
            if fuse:
                neg_l, pos_l = w_side_contractions(V, h, w, beta, need_pos)
            else:
                WH = wh(w, h)
                neg_cot, pos_cot = _local_cotangents(V, WH, beta)
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
            w = w * mu_multiplier(neg, pos, w, gamma, l1_reg, l2_reg)

            # ---- H update (contract the feature axis -> psum over 'model') --
            if fuse:
                neg_l, pos_l = h_side_contractions(V, h, w, beta, need_pos)
            else:
                WH = wh(w, h)
                neg_cot, pos_cot = _local_cotangents(V, WH, beta)
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
            h = h * mu_multiplier(neg, pos, h, gamma, l1_reg, l2_reg)
            return w, h

        loss_init = loss_of((W, H))
        n_chunks = max_iter // 10
        rem = max_iter % 10

        def chunk_body(carry):
            state, prev, k, _ = carry
            state = lax.fori_loop(0, 10, lambda i, s: one_iter(s), state)
            loss = loss_of(state)
            conv = (prev - loss) / loss_init < tol
            return state, loss, k + 1, conv

        def cond(carry):
            return (~carry[3]) & (carry[2] < n_chunks)

        (W, H), _, k, conv = lax.while_loop(
            cond, chunk_body, ((W, H), loss_init, jnp.int32(0), False)
        )
        if rem:
            (W, H) = lax.cond(
                conv,
                lambda s: s,
                lambda s: lax.fori_loop(0, rem, lambda i, t: one_iter(t), s),
                (W, H),
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
        # all reductions here are explicit psums; the VMA checker would
        # additionally require varying-axis declarations on the Pallas
        # kernels' out_shapes, which pallas_call cannot express generically
        check_vma=False,
    )
    return jax.jit(mapped)


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
    if use_pallas is None:
        from ..ops.pallas_mu import pallas_supported

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
    )
    v_spec = P(data_axis, model_axis) if model_axis else P(data_axis)
    w_spec = P(model_axis, None) if model_axis else P()
    V = shard_target(V, mesh, v_spec)
    W = shard_target(W, mesh, w_spec)
    H = shard_target(H, mesh, P(data_axis, None))
    return fit(V, W, H)
