r"""Distributed sparse NMF: row-sharded dual-ELL MU with psum-reduced
kernel contractions.

The reference's sparse path is strictly single-device
(``torch.sparse_coo_tensor`` targets, torchnmf/nmf.py:602-638); this module
is the multi-chip extension the TPU build adds for targets whose *sparse*
form outgrows one chip's HBM.  Design:

* The nnz are split by **row block** over the ``data`` mesh axis.  Each
  shard holds its local rows' entries in BOTH dual-ELL sides
  (:mod:`pytorch_nmf_tpu.ops.sparse`): a row-major side over its ``M_loc``
  local rows (column ids are global — ``W`` is replicated) and a col-major
  side over all ``K`` columns whose "other" ids are *local row positions*
  into the ``H`` shard.
* **H update**: embarrassingly parallel — each row's numerator depends only
  on its own nonzeros (local row-ELL reduction) and the replicated ``W``.
  No communication.
* **W update**: each shard contracts its local col-ELL side into a partial
  ``(K, R)`` numerator; one ``psum`` over ``data`` per factor per iteration
  combines them — the same reduction structure as the dense explicit solver
  (:mod:`pytorch_nmf_tpu.parallel.sharded`), with the ELL layout keeping
  every nnz access a dense VMEM-sized reduction (no scatters).
* The every-10-iterations cadence loss uses the exact split form
  ``V_norm + pos - neg`` (reference nmf.py:358,398) from shard-local
  scalars psum'd once.

Numerics match the single-device ELL path (same relu/eps placement; f32
summation order differs by the sharding), which itself matches the
``jax.grad`` gather path and the torch reference.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import eps
from ..ops.mu import gamma_from_beta, mu_multiplier
from ..ops.solver import _converging_loop
from ..ops.sparse import (
    SparseCOO,
    _ell_side,
    coo_rem_neg_grad,
    coo_rem_neg_scalar,
    ell_neg_grad,
    ell_neg_scalar,
    get_V_norm,
    nmf_ell_pos_grad,
    nmf_ell_pos_scalar,
)

__all__ = ["sharded_sparse_nmf_fit"]


def _build_sharded_ell(V: SparseCOO, n_dev: int):
    """Host-side one-time shard layout build, O(nnz).

    Returns stacked numpy arrays: row side ``(n_dev·M_loc, Lr)``, col side
    ``(n_dev·K, Lc)`` (both padded to the max segment degree across shards
    so they shard evenly over the leading axis), and the per-shard count of
    real (non-padding) rows.
    """
    import numpy as np

    M, K = V.shape
    M_loc = -(-M // n_dev)
    from ..ops.sparse import _host_coo_sorted

    ii, jj, vals = _host_coo_sorted(V)

    # row-major sorted (enforced above) -> shard boundaries by searchsorted
    bounds = np.searchsorted(ii, np.arange(1, n_dev + 1) * M_loc)
    starts = np.concatenate([[0], bounds[:-1]])

    from ..ops.sparse import _ell_cap

    # budget check BEFORE any packing: the stacked widths are known from
    # the per-shard degree maxima alone, and an over-budget layout must
    # raise the actionable error rather than OOM the host mid-build
    import os

    caps = []
    Lr_stack = Lc_stack = 1
    for d in range(n_dev):
        s, e = int(starts[d]), int(bounds[d])
        nnz_d = max(e - s, 1)
        cap_r = _ell_cap(nnz_d, M_loc)
        cap_c = _ell_cap(nnz_d, K)
        caps.append((cap_r, cap_c))
        if e > s:
            ii_loc = ii[s:e] - d * M_loc
            Lr_stack = max(
                Lr_stack,
                min(int(np.bincount(ii_loc, minlength=M_loc).max()), cap_r),
            )
            Lc_stack = max(
                Lc_stack,
                min(int(np.bincount(jj[s:e], minlength=K).max()), cap_c),
            )
    from ..ops.budget import budget_bytes

    # same HBM-aware budget as the single-device builder (ops/sparse.py
    # build_ell) so the accept/reject rule cannot drift between paths
    max_bytes = budget_bytes("PNT_SPARSE_ELL_MAX_BYTES", 4 * 1024**3, 0.25)
    per_shard = 8 * (M_loc * Lr_stack + K * Lc_stack)
    if per_shard > max_bytes:
        raise ValueError(
            f"sharded dual-ELL layout needs ~{per_shard/2**30:.1f} GiB per "
            "shard, over the PNT_SPARSE_ELL_MAX_BYTES budget; raise the "
            "budget, add devices, or lower PNT_SPARSE_ELL_MAX_PAD"
        )

    row_sides, col_sides = [], []
    row_rems, col_rems = [], []
    for d in range(n_dev):
        s, e = int(starts[d]), int(bounds[d])
        ii_loc = (ii[s:e] - d * M_loc).astype(np.int32)
        jj_d = jj[s:e]
        v_d = vals[s:e]
        cap_r, cap_c = caps[d]
        ri, rv, rrem = _ell_side(ii_loc, jj_d, v_d, M_loc, cap_r)
        row_sides.append((ri, rv))
        row_rems.append(rrem)
        order = np.argsort(jj_d, kind="stable")
        ci, cv, crem = _ell_side(
            jj_d[order], ii_loc[order], v_d[order], K, cap_c
        )
        col_sides.append((ci, cv))
        col_rems.append(crem)

    def _stack(sides):
        Lmax = max(s[0].shape[1] for s in sides)
        idx = np.concatenate(
            [np.pad(s[0], ((0, 0), (0, Lmax - s[0].shape[1]))) for s in sides]
        )
        val = np.concatenate(
            [np.pad(s[1], ((0, 0), (0, Lmax - s[1].shape[1]))) for s in sides]
        )
        return idx, val

    def _stack_rems(rems):
        # (seg, oth, val) triples padded to the cross-shard max length with
        # zero-valued entries (which contribute nothing to any beta term),
        # flattened to (n_dev * nr_max,) so they shard over the data axis
        nr_max = max(r[2].shape[0] for r in rems)
        out = []
        for comp in range(3):
            out.append(np.concatenate([
                np.pad(r[comp], (0, nr_max - r[comp].shape[0]))
                for r in rems
            ]))
        return tuple(out)

    row_idx, row_val = _stack(row_sides)
    col_idx, col_val = _stack(col_sides)
    row_rem = _stack_rems(row_rems)
    col_rem = _stack_rems(col_rems)
    n_real = np.clip(M - np.arange(n_dev) * M_loc, 0, M_loc).astype(np.int32)
    return (row_idx, row_val, col_idx, col_val, row_rem, col_rem,
            n_real, M_loc)


@lru_cache(maxsize=None)
def _get_sharded_sparse_fit(
    mesh: Mesh,
    beta: float,
    tol: float,
    max_iter: int,
    l1_reg: float,
    l2_reg: float,
    data_axis: str,
):
    gamma = gamma_from_beta(beta)

    def local_fit(row_idx, row_val, col_idx, col_val,
                  row_rem, col_rem, n_real, V_norm, W, Hp):
        nr = n_real[0]
        has_row_rem = bool(row_rem[2].shape[0])
        has_col_rem = bool(col_rem[2].shape[0])

        def loss_of(state):
            w, h = state
            pos_l = nmf_ell_pos_scalar(w, h, beta, nr, data_axis)
            neg_l = ell_neg_scalar(
                row_idx, row_val, h, w, beta, data_axis
            )
            if has_row_rem:
                neg_l = neg_l + coo_rem_neg_scalar(row_rem, h, w, beta)
            total = V_norm + lax.psum(pos_l - neg_l, data_axis)
            return jnp.sqrt(2.0 * total)

        def one_iter(state):
            w, h = state

            # ---- W update (old h): psum the per-shard col-side partials
            neg_raw = ell_neg_grad(col_idx, col_val, w, h, beta)
            if has_col_rem:  # hybrid: over-cap spill of skewed columns
                neg_raw = neg_raw + coo_rem_neg_grad(col_rem, w, h, beta)
            neg = jax.nn.relu(lax.psum(neg_raw, data_axis)) + eps
            if beta == 1:
                pos = lax.psum(
                    jnp.sum(h, axis=0, keepdims=True), data_axis
                )
            elif beta == 2:
                G = lax.psum(
                    lax.dot_general(
                        h, h, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ),
                    data_axis,
                )
                pos = jax.nn.relu(w @ G) + eps
            else:
                pos = jax.nn.relu(lax.psum(
                    nmf_ell_pos_grad(
                        w, h, beta, want_H=False, varying_axis=data_axis
                    ),
                    data_axis,
                )) + eps
            w = w * mu_multiplier(neg, pos, w, gamma, l1_reg, l2_reg)

            # ---- H update (new w): fully shard-local
            neg_raw = ell_neg_grad(row_idx, row_val, h, w, beta)
            if has_row_rem:
                neg_raw = neg_raw + coo_rem_neg_grad(row_rem, h, w, beta)
            neg = jax.nn.relu(neg_raw) + eps
            if beta == 1:
                pos = jnp.sum(w, axis=0, keepdims=True)
            else:
                pos = jax.nn.relu(
                    nmf_ell_pos_grad(w, h, beta, want_H=True)
                ) + eps
            h = h * mu_multiplier(neg, pos, h, gamma, l1_reg, l2_reg)
            return w, h

        (W, Hp), k, conv, _ = _converging_loop(
            one_iter, loss_of, (W, Hp), tol, max_iter, False
        )
        n_iter = jnp.where(conv, k * 10, max_iter)
        return W, Hp, n_iter

    row_spec = P(data_axis, None)
    mapped = jax.shard_map(
        local_fit,
        mesh=mesh,
        in_specs=(
            row_spec, row_spec,       # row-ELL (n_dev·M_loc, Lr)
            row_spec, row_spec,       # col-ELL (n_dev·K, Lc)
            (P(data_axis),) * 3,      # row remainder (seg, oth, val)
            (P(data_axis),) * 3,      # col remainder
            P(data_axis),             # n_real (n_dev,)
            P(),                      # V_norm scalar
            P(),                      # W replicated
            row_spec,                 # H (n_dev·M_loc, R)
        ),
        out_specs=(P(), row_spec, P()),
    )
    return jax.jit(mapped)


def sharded_sparse_nmf_fit(
    V: SparseCOO, W, H, mesh: Mesh, beta: float = 1, tol: float = 1e-4,
    max_iter: int = 200, l1_reg: float = 0.0, l2_reg: float = 0.0,
    data_axis: str = "data",
):
    """Fit ``V ≈ H Wᵀ`` against a sparse COO target with the sample (row)
    axis sharded over ``mesh``'s ``data_axis``.

    ``V`` is a :class:`~pytorch_nmf_tpu.ops.sparse.SparseCOO` of shape
    ``(M, K)``, ``W (K, R)`` replicated, ``H (M, R)`` row-sharded.  Rows
    are zero-padded to divide evenly (padded rows are MU fixed points and
    are masked out of the loss).  Returns ``(W, H, n_iter)`` matching the
    single-device ELL trajectories to f32 summation order.
    """
    import numpy as np

    if V.ndim != 2:
        raise ValueError("sharded sparse fit expects a 2-D SparseCOO target")
    W = jnp.asarray(W)
    H = jnp.asarray(H)
    M, K = V.shape
    n_dev = mesh.shape[data_axis]

    (row_idx, row_val, col_idx, col_val, row_rem, col_rem, n_real,
     M_loc) = _build_sharded_ell(V, n_dev)
    Hp = jnp.pad(H, ((0, n_dev * M_loc - M), (0, 0)))
    V_norm = get_V_norm(V, float(beta))

    row_spec = NamedSharding(mesh, P(data_axis, None))
    args = (
        jax.device_put(jnp.asarray(row_idx), row_spec),
        jax.device_put(jnp.asarray(row_val), row_spec),
        jax.device_put(jnp.asarray(col_idx), row_spec),
        jax.device_put(jnp.asarray(col_val), row_spec),
        tuple(
            jax.device_put(
                jnp.asarray(r), NamedSharding(mesh, P(data_axis))
            ) for r in row_rem
        ),
        tuple(
            jax.device_put(
                jnp.asarray(r), NamedSharding(mesh, P(data_axis))
            ) for r in col_rem
        ),
        jax.device_put(jnp.asarray(n_real), NamedSharding(mesh, P(data_axis))),
        jax.device_put(
            jnp.asarray(V_norm, jnp.float32), NamedSharding(mesh, P())
        ),
        jax.device_put(W, NamedSharding(mesh, P())),
        jax.device_put(Hp, row_spec),
    )
    fit = _get_sharded_sparse_fit(
        mesh, float(beta), float(tol), int(max_iter),
        float(l1_reg), float(l2_reg), data_axis,
    )
    W_out, Hp_out, n_iter = fit(*args)
    return W_out, Hp_out[:M], n_iter
