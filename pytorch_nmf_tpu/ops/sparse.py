r"""Sparse COO targets for NMF.

TPU-native counterpart of the reference's sparse path
(``torch.sparse_coo_tensor`` targets; torchnmf/nmf.py:162-170, 602-638).
The β-divergence against a sparse target splits algebraically into

    loss = V_norm(V, β)  +  pos(W, H)  -  neg(W, H, V)

where ``V_norm`` depends only on the stored values, ``pos`` is a function of
the dense reconstruction (computable without materializing it, via Gram
matrices or row blocks), and ``neg`` touches the reconstruction only at the
nonzero coordinates.  MU numerators/denominators are then gradients of the
two scalar terms (reference ``_sp_double_backward_update``, nmf.py:95-119) —
here plain ``jax.grad`` of pure functions.

TPU note: random gathers are slow on TPU, so ``neg`` uses two row gathers
(``H[ii]``, ``W[jj]``) fused into a batched dot, and the β=2 path avoids
gathers entirely through the Gram identity
``pos = ½⟨H(WᵀW), H⟩``, ``neg = ⟨VᵀH, W⟩`` (reference nmf.py:622-624) with
``VᵀH`` as a segment-sum scatter.  The generic-β dense positive term runs as
a `lax.scan` over row blocks so the (M, K) reconstruction never exists in
HBM at once (reference bounds memory the same way with a Python row loop,
nmf.py:632-637).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import eps
from .mu import vma_zeros as _vma_zeros

__all__ = [
    "SparseCOO",
    "SparseELL",
    "sparse_coo_tensor",
    "sparse_from_dense",
    "from_torch_sparse",
    "get_V_norm",
    "should_densify",
    "build_ell",
    "maybe_ell",
]


@jax.tree_util.register_pytree_node_class
class SparseCOO:
    """A coalesced sparse COO tensor pytree: ``(indices, values, shape)``.

    ``indices`` is ``(ndim, nnz)`` int32, ``values`` is ``(nnz,)``, and
    ``shape`` is static.  Only 2-D targets are consumed by the NMF solver
    (matching the reference, which supports sparse targets for ``NMF`` only).
    """

    __slots__ = ("indices", "values", "shape", "_host", "_ell_cache")

    def __init__(self, indices, values, shape: Tuple[int, ...]):
        import numpy as np

        # keep host copies when construction starts from host data — the
        # ELL builder then never fetches the arrays back through the
        # (slow, relay-attached) device transport
        self._host = None
        self._ell_cache = None
        if isinstance(indices, np.ndarray) and isinstance(values, np.ndarray):
            self._host = (
                indices.astype(np.int32, copy=False),
                values.astype(np.float32, copy=False),
            )
        self.indices = jnp.asarray(indices, jnp.int32)
        self.values = jnp.asarray(values)
        self.shape = tuple(int(s) for s in shape)

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def nnz(self) -> int:
        return self.values.shape[0]

    @property
    def is_sparse(self) -> bool:
        return True

    def to_dense(self):
        out = jnp.zeros(self.shape, self.values.dtype)
        return out.at[tuple(self.indices)].add(self.values)

    def tree_flatten(self):
        return (self.indices, self.values), self.shape

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.indices, obj.values = children
        obj.shape = aux
        obj._host = None
        obj._ell_cache = None
        return obj

    def __repr__(self):
        return f"SparseCOO(shape={self.shape}, nnz={self.values.shape[0]})"


def sparse_coo_tensor(indices, values, shape) -> SparseCOO:
    """Build a coalesced :class:`SparseCOO` (sorts indices row-major and
    sums duplicates, mirroring ``torch.sparse_coo_tensor(...).coalesce()``).

    The sort/deduplicate runs in the native C++ ingestion kernel
    (:mod:`pytorch_nmf_tpu.native`) when available, else numpy.
    """
    import numpy as np

    from .. import native

    shape_t = tuple(int(s) for s in shape)
    idx = np.asarray(indices)
    vals = np.asarray(values, dtype=np.float32)
    flat = np.ravel_multi_index(tuple(idx), shape_t).astype(np.int64)

    res = native.coalesce_flat(flat, vals)
    if res is not None:
        uniq, summed = res
    else:
        # np.unique handles unsorted input; duplicate summation via
        # np.add.at is order-independent, so no pre-sort is needed
        uniq, inv = np.unique(flat, return_inverse=True)
        summed = np.zeros(uniq.shape[0], dtype=vals.dtype)
        np.add.at(summed, inv, vals)
    coal_idx = np.stack(np.unravel_index(uniq, shape_t))
    return SparseCOO(coal_idx, summed, shape_t)


def from_torch_sparse(t) -> SparseCOO:
    """Convert a ``torch.sparse_coo_tensor`` — the reference's sparse
    input type (reference nmf.py:351-353) — to a :class:`SparseCOO`.

    Coalesces first (like the reference's fit preamble, nmf.py:356) and
    moves the data host-side once; reference-shaped code can then call
    ``model.fit(torch_sparse)`` directly — the model layer routes through
    this converter automatically."""
    t = t.coalesce()
    return sparse_coo_tensor(
        t.indices().detach().cpu().numpy(),
        t.values().detach().cpu().numpy(),
        tuple(t.shape),
    )


def sparse_from_dense(V, threshold: float = 0.0) -> SparseCOO:
    """Extract entries strictly greater than ``threshold`` into COO form.

    Uses the native parallel two-pass scan when available; indices come out
    sorted (row-major) either way, so the result is coalesced.
    """
    import numpy as np

    from .. import native

    V = np.asarray(V, dtype=np.float32)
    res = native.extract_nonzeros(V, float(threshold))
    if res is not None:
        flat, vals = res
        idx = np.stack(np.unravel_index(flat, V.shape))
        return SparseCOO(idx, vals, V.shape)
    idx = np.nonzero(V > threshold)
    return SparseCOO(np.stack(idx), V[idx], V.shape)


@jax.tree_util.register_pytree_node_class
class SparseELL:
    """Dual padded-row (ELL) layout of a 2-D :class:`SparseCOO` target,
    with COO remainders for degree-skewed data (classic ELL+COO hybrid).

    ``row_idx``/``row_val`` hold, for every row ``i`` of V, the column ids
    and values of its nonzeros padded to the (possibly capped) row width
    ``Lr`` (pad entries: id 0, value 0); ``col_idx``/``col_val`` are the
    transpose-side equivalent over columns.  Both copies exist so *each*
    factor update reads its numerator contributions contiguously — every
    nnz access becomes a dense reduction over the padded axis plus one row
    gather of the *other* factor, and the random scatters that dominate
    the plain COO gather path on TPU disappear entirely (they were the
    transpose of the gathers under ``jax.grad``).

    When the degree distribution is skewed, padding every segment to the
    max degree would explode memory; the width is capped and the entries
    beyond it per segment spill into per-side COO remainders
    (``row_rem``/``col_rem``: ``(seg_ids, other_ids, vals)`` triples,
    empty for ~uniform sparsity) handled by the gather-scatter
    formulation — tiny by construction, since only the over-cap tail
    spills.

    Carries the originating :class:`SparseCOO` so the every-10-iterations
    cadence loss keeps the exact split form the gather path uses
    (reference nmf.py:358,398).
    """

    __slots__ = (
        "coo", "row_idx", "row_val", "col_idx", "col_val",
        "row_rem", "col_rem",
    )

    def __init__(self, coo, row_idx, row_val, col_idx, col_val,
                 row_rem, col_rem):
        self.coo = coo
        self.row_idx = row_idx
        self.row_val = row_val
        self.col_idx = col_idx
        self.col_val = col_val
        self.row_rem = row_rem
        self.col_rem = col_rem

    @property
    def shape(self):
        return self.coo.shape

    def tree_flatten(self):
        return (
            self.coo, self.row_idx, self.row_val, self.col_idx,
            self.col_val, self.row_rem, self.col_rem,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __repr__(self):
        return (
            f"SparseELL(shape={self.shape}, nnz={self.coo.nnz}, "
            f"Lr={self.row_idx.shape[1]}, Lc={self.col_idx.shape[1]}, "
            f"rem=({self.row_rem[2].shape[0]}, {self.col_rem[2].shape[0]}))"
        )


def _host_coo_sorted(V: SparseCOO):
    """Host copies of a 2-D COO's ``(ii, jj, vals)``, row-major sorted.

    The ELL builders' in-segment position formula requires
    segment-contiguous ids; :func:`sparse_coo_tensor` and
    :func:`sparse_from_dense` already produce sorted (coalesced) data, but
    the raw :class:`SparseCOO` constructor accepts any order — those get
    one stable O(nnz log nnz) sort here rather than a silently corrupted
    layout."""
    import numpy as np

    if V._host is not None:
        idx_np, vals = V._host
    else:  # one bulk fetch instead of three per-array syncs
        idx_np, vals = jax.device_get((V.indices, V.values))
    ii, jj = idx_np[0], idx_np[1]
    flat = ii.astype(np.int64) * V.shape[1] + jj
    if np.any(np.diff(flat) < 0):
        order = np.argsort(flat, kind="stable")
        ii, jj, vals = ii[order], jj[order], vals[order]
    return ii, jj, vals


def _ell_cap(nnz: int, n_seg: int, max_pad_factor=None) -> int:
    """Padded-width cap: ``max_pad_factor`` x the mean segment degree
    (env ``PNT_SPARSE_ELL_MAX_PAD``, default 4.0) — shared by the
    single-device and sharded ELL builders so the split rule cannot
    drift."""
    import os

    if max_pad_factor is None:
        max_pad_factor = 4.0
    max_pad_factor = float(
        os.environ.get("PNT_SPARSE_ELL_MAX_PAD", max_pad_factor)
    )
    import numpy as np

    return max(int(np.ceil(max_pad_factor * max(nnz, 1) / n_seg)), 1)


def _ell_side(seg_ids, other_ids, v, n_seg, cap=None):
    """Pack one sorted-by-segment COO side into ``(n_seg, L)`` padded form.

    ``cap`` bounds the padded width: entries at in-segment positions >=
    ``cap`` spill into a COO remainder ``(seg_ids, other_ids, vals)``
    (empty arrays when nothing spills).  Returns
    ``(idx_pad, val_pad, remainder)``.
    """
    import numpy as np

    counts = np.bincount(seg_ids, minlength=n_seg)
    Lmax = max(int(counts.max()) if counts.size else 0, 1)
    pos = np.arange(len(seg_ids)) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    if cap is not None and Lmax > cap:
        L = int(cap)
        spill = pos >= L
        rem = (
            seg_ids[spill].astype(np.int32),
            other_ids[spill].astype(np.int32),
            v[spill].astype(np.float32),
        )
        seg_ids, other_ids, v, pos = (
            seg_ids[~spill], other_ids[~spill], v[~spill], pos[~spill]
        )
    else:
        L = Lmax
        rem = (
            np.zeros(0, np.int32), np.zeros(0, np.int32),
            np.zeros(0, np.float32),
        )
    idx_pad = np.zeros((n_seg, L), np.int32)
    val_pad = np.zeros((n_seg, L), np.float32)
    idx_pad[seg_ids, pos] = other_ids
    val_pad[seg_ids, pos] = v
    return idx_pad, val_pad, rem


def maybe_ell(V: SparseCOO):
    """The ELL fast path's entry decision: returns a built
    :class:`SparseELL` when the gather-regime fit should take the dual-ELL
    updaters (3.5-4x the jax.grad gather path on TPU, measured at 16k^2 x
    1.5% over beta in {1, 1.5, 2}), else ``None``.

    Env override ``PNT_SPARSE_ELL`` (0 forces the plain gather path, 1
    forces a build attempt); degree-skewed data builds the hybrid ELL+COO
    split, and only a blown device-byte budget falls back to ``None``.

    The built layout is cached on the ``SparseCOO`` (keyed by the env
    configuration), so repeated fits on the same target — e.g. the
    segments of ``checkpointed_fit`` — pay the host build and device
    upload once.
    """
    import os

    env = os.environ.get("PNT_SPARSE_ELL", "")
    if env == "0":
        return None
    key = (
        env,
        os.environ.get("PNT_SPARSE_ELL_MAX_PAD", ""),
        os.environ.get("PNT_SPARSE_ELL_MAX_BYTES", ""),
    )
    cached = V._ell_cache
    if cached is not None and cached[0] == key:
        return cached[1]
    ell = build_ell(V)
    V._ell_cache = (key, ell)
    return ell


def build_ell(V: SparseCOO, max_pad_factor: float = 4.0):
    """Build the dual ELL(+COO) layout, or ``None`` when the padded
    layout's device bytes exceed the budget (``PNT_SPARSE_ELL_MAX_BYTES``,
    default 4 GiB — both dual sides together, int32 ids + f32 values, on
    top of the retained COO).

    The padded width per side is capped at ``max_pad_factor`` x the mean
    degree (override ``PNT_SPARSE_ELL_MAX_PAD``); entries beyond the cap
    in a segment spill into per-side COO remainders, so degree-skewed
    data takes the hybrid split rather than refusing to build.

    Host-side one-time cost at fit entry, O(nnz); unsorted indices get one
    stable sort, coalesced data passes straight through.
    """
    import os

    import numpy as np

    if V.ndim != 2:
        return None
    from .budget import budget_bytes

    max_bytes = budget_bytes("PNT_SPARSE_ELL_MAX_BYTES", 4 * 1024**3, 0.25)
    M, K = V.shape
    ii, jj, vals = _host_coo_sorted(V)
    nnz = max(len(vals), 1)
    cap_r = _ell_cap(nnz, M, max_pad_factor)
    cap_c = _ell_cap(nnz, K, max_pad_factor)
    Lr = min(
        max(int(np.bincount(ii, minlength=M).max()) if len(ii) else 0, 1),
        cap_r,
    )
    Lc = min(
        max(int(np.bincount(jj, minlength=K).max()) if len(jj) else 0, 1),
        cap_c,
    )
    if 8 * (M * Lr + K * Lc) > max_bytes:
        return None
    row_idx, row_val, row_rem = _ell_side(ii, jj, vals, M, cap_r)
    order = np.argsort(jj, kind="stable")
    col_idx, col_val, col_rem = _ell_side(
        jj[order], ii[order], vals[order], K, cap_c
    )
    return SparseELL(
        V,
        jnp.asarray(row_idx),
        jnp.asarray(row_val),
        jnp.asarray(col_idx),
        jnp.asarray(col_val),
        tuple(jnp.asarray(r) for r in row_rem),
        tuple(jnp.asarray(r) for r in col_rem),
    )


def _ell_block(L: int, R: int) -> int:
    """Scan-block rows so the gathered (block, L, R) stage stays around
    ~24 MB — measured optimum on v5e (77 -> 23 ms/iter at 16k^2 x 1.5%
    vs a 160 MB block that round-trips HBM between the two einsums)."""
    budget = 24 * 1024 * 1024 // 4
    b = budget // max(L * R, 1)
    block = 8
    while block * 2 <= min(b, 256):
        block *= 2
    return block


def ell_neg_grad(idx_pad, val_pad, self_f, other_f, beta: float):
    """Gradient of the sparse ``neg`` scalar w.r.t. the segment-side factor.

    ``neg = sum_n vals_n * f_beta(WH_n)`` with ``WH_n = <self[seg], other[oth]>``
    (reference neg terms, nmf.py:622-637); its gradient w.r.t. ``self_f`` is
    ``sum_l vals * f'(WH) * other[idx]`` — a dense reduction over the padded
    nnz axis.  Streams segment blocks through a `lax.scan` sized by
    :func:`_ell_block`; pad entries carry value 0 so they contribute nothing
    (``f'`` stays finite at WH=0 for every beta the solver admits).
    """
    n_seg, L = idx_pad.shape
    R = self_f.shape[1]
    block = _ell_block(L, R)
    nb = -(-n_seg // block)
    pad = nb * block - n_seg
    if pad:
        idx_pad = jnp.pad(idx_pad, ((0, pad), (0, 0)))
        val_pad = jnp.pad(val_pad, ((0, pad), (0, 0)))
        self_f = jnp.pad(self_f, ((0, pad), (0, 0)))

    def blk(carry, inp):
        idx_b, val_b, self_b = inp
        oth = other_f[idx_b]  # (block, L, R) — stays in VMEM
        wh = jnp.einsum(
            "blr,br->bl", oth, self_b, preferred_element_type=jnp.float32
        )
        if beta == 2:
            coef = val_b
        elif beta == 1:
            coef = val_b / (wh + eps)
        else:
            coef = val_b * (wh + eps) ** (beta - 2)
        g = jnp.einsum(
            "bl,blr->br", coef, oth, preferred_element_type=jnp.float32
        )
        return carry, g

    _, gs = lax.scan(
        blk, 0,
        (
            idx_pad.reshape(nb, block, L),
            val_pad.reshape(nb, block, L),
            self_f.reshape(nb, block, R),
        ),
    )
    return gs.reshape(nb * block, R)[:n_seg]


def _pos_grads_generic(Hb_stream, W, beta: float, want_H: bool,
                       varying_axis=None):
    """Stream the dense positive term's gradient over row blocks of H.

    ``pos = sum_{i,k} (WH+eps)^beta / beta`` (reference nmf.py:632-637);
    grad w.r.t. H is ``(WH+eps)^{beta-1} @ W`` per block, grad w.r.t. W
    accumulates ``((WH+eps)^{beta-1})^T @ H_block``.
    """
    def blk_H(carry, hb):
        wh = lax.dot_general(
            hb, W, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return carry, ((wh + eps) ** (beta - 1)) @ W

    def blk_W(carry, hb):
        wh = lax.dot_general(
            hb, W, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g = lax.dot_general(
            (wh + eps) ** (beta - 1), hb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return carry + g, None

    if want_H:
        _, gs = lax.scan(blk_H, 0, Hb_stream)
        return gs
    g, _ = lax.scan(blk_W, _vma_zeros(W.shape, varying_axis), Hb_stream)
    return g


def nmf_ell_pos_grad(W, H, beta: float, want_H: bool, varying_axis=None):
    """Closed-form gradient of the sparse ``pos`` scalar for ``V ~ H W^T``
    w.r.t. W (``want_H=False``) or H (``want_H=True``).

    beta=2 via the Gram identity (no (M, K) array); generic beta streams
    row blocks (zero pad rows contribute nothing to the W side and are
    sliced off the H side).  beta=1's analytic shortcut is handled by the
    solver (kl_pos_*), mirroring the gather path.  Under ``shard_map``
    (row-sharded H) the caller psums the W-side result; ``varying_axis``
    tags the scan carry for the replication checker.
    """
    if beta == 2:
        if want_H:
            G = lax.dot_general(
                W, W, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return H @ G
        G = lax.dot_general(
            H, H, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return W @ G

    M, R = H.shape
    block = _ell_block(W.shape[0], 1)  # (block, K) stage rows
    nb = -(-M // block)
    pad = nb * block - M
    Hp = jnp.pad(H, ((0, pad), (0, 0))) if pad else H
    g = _pos_grads_generic(
        Hp.reshape(nb, block, R), W, beta, want_H, varying_axis
    )
    if want_H:
        return g.reshape(nb * block, R)[:M]
    return g


def ell_neg_scalar(idx_pad, val_pad, self_f, other_f, beta: float,
                   varying_axis=None):
    """The sparse ``neg`` loss scalar from one ELL side:
    ``sum_n vals_n * f_beta(WH_n)`` with the reference's per-beta form
    (nmf.py:622-637) — pad entries carry value 0 and contribute nothing.
    Used by the sharded sparse solver, whose shards cannot gather globally.
    """
    n_seg, L = idx_pad.shape
    R = self_f.shape[1]
    block = _ell_block(L, R)
    nb = -(-n_seg // block)
    pad = nb * block - n_seg
    if pad:
        idx_pad = jnp.pad(idx_pad, ((0, pad), (0, 0)))
        val_pad = jnp.pad(val_pad, ((0, pad), (0, 0)))
        self_f = jnp.pad(self_f, ((0, pad), (0, 0)))

    def blk(carry, inp):
        idx_b, val_b, self_b = inp
        oth = other_f[idx_b]
        wh = jnp.einsum(
            "blr,br->bl", oth, self_b, preferred_element_type=jnp.float32
        )
        if beta == 2:
            term = wh
        elif beta == 1:
            term = jnp.log(wh + eps)
        else:
            term = (wh + eps) ** (beta - 1) / (beta - 1)
        return carry + jnp.sum(val_b * term), None

    out, _ = lax.scan(
        blk, _vma_zeros((), varying_axis),
        (
            idx_pad.reshape(nb, block, L),
            val_pad.reshape(nb, block, L),
            self_f.reshape(nb, block, R),
        ),
    )
    return out


def nmf_ell_pos_scalar(W, H, beta: float, n_real=None, varying_axis=None):
    """The sparse ``pos`` loss scalar for ``V ~ H W^T`` over the rows of
    ``H`` (reference nmf.py:622-637).  ``n_real`` masks trailing padding
    rows for the generic-beta dense stream (β∈{1, 2} are exact with zero
    rows already); under ``shard_map`` the caller psums the result.
    """
    if beta == 2:
        G = lax.dot_general(
            W, W, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0.5 * jnp.vdot(H @ G, H)
    if beta == 1:
        return W.sum(0) @ H.sum(0)

    M, R = H.shape
    block = _ell_block(W.shape[0], 1)
    nb = -(-M // block)
    pad = nb * block - M
    Hp = jnp.pad(H, ((0, pad), (0, 0))) if pad else H
    if n_real is None:
        n_real = M
    valid = (jnp.arange(nb * block) < n_real).reshape(nb, block)

    def blk(carry, inp):
        hb, mask = inp
        wh = lax.dot_general(
            hb, W, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        contrib = jnp.sum(jnp.where(mask[:, None], (wh + eps) ** beta, 0.0))
        return carry + contrib, None

    out, _ = lax.scan(
        blk, _vma_zeros((), varying_axis),
        (Hp.reshape(nb, block, R), valid),
    )
    return out / beta


def coo_rem_neg_grad(rem, self_f, other_f, beta: float):
    """Neg-gradient contribution of an ELL spill remainder (the over-cap
    tail of a skewed degree distribution) via the gather-scatter
    formulation — tiny by construction, so the scatter cost is negligible.
    Returns a dense ``self_f``-shaped array to add to the ELL-side
    gradient BEFORE the relu/eps clamps."""
    seg_ids, oth_ids, vals = rem
    oth = other_f[oth_ids]
    wh = jnp.einsum(
        "nr,nr->n", self_f[seg_ids], oth,
        preferred_element_type=jnp.float32,
    )
    if beta == 2:
        coef = vals
    elif beta == 1:
        coef = vals / (wh + eps)
    else:
        coef = vals * (wh + eps) ** (beta - 2)
    z = jnp.zeros(self_f.shape, jnp.float32)
    return z.at[seg_ids].add(coef[:, None] * oth)


def coo_rem_neg_scalar(rem, self_f, other_f, beta: float):
    """Neg loss-scalar contribution of an ELL spill remainder (zero-valued
    padding entries contribute nothing for every admitted beta)."""
    seg_ids, oth_ids, vals = rem
    wh = jnp.einsum(
        "nr,nr->n", self_f[seg_ids], other_f[oth_ids],
        preferred_element_type=jnp.float32,
    )
    if beta == 2:
        term = wh
    elif beta == 1:
        term = jnp.log(wh + eps)
    else:
        term = (wh + eps) ** (beta - 1) / (beta - 1)
    return vals @ term


def should_densify(V: SparseCOO) -> bool:
    """Whether the sparse MU fit should run its densified fast path.

    The sparse multiplicative update is algebraically identical to the dense
    update on the densified target (zero entries contribute nothing to any β
    cotangent — the identity behind the reference's dense-vs-sparse parity
    tests, tests/test_nmf_sparse.py:11-37).  TPUs hate the random
    gathers/scatters of the nnz path but eat the dense contractions on the
    MXU, so whenever the densified target fits comfortably in HBM we scatter
    it once at fit entry and run the fused dense updaters (~50x faster at
    the reference benchmark scale).  Env overrides: ``PNT_SPARSE_DENSIFY``
    (0/1 forces), ``PNT_SPARSE_DENSIFY_MAX_BYTES`` (default 4 GiB).
    """
    import os

    env = os.environ.get("PNT_SPARSE_DENSIFY", "")
    if env == "0":
        return False
    if env == "1":
        return True
    from .budget import budget_bytes

    # 4 GiB = 1/4 of a 16 GB v5e; scale with the real HBM limit when known
    max_bytes = budget_bytes(
        "PNT_SPARSE_DENSIFY_MAX_BYTES", 4 * 1024**3, 0.25
    )
    size = 4
    for s in V.shape:
        size *= int(s)
    return size <= max_bytes


def get_V_norm(V: SparseCOO, beta: float):
    """The V-only constant of the split β-divergence
    (reference ``_get_V_norm``, nmf.py:162-170)."""
    vals = V.values
    if beta == 2:
        return vals @ vals * 0.5
    elif beta == 1:
        return vals @ jnp.log(vals) - jnp.sum(vals)
    else:
        return jnp.sum(vals**beta) / beta / (beta - 1)


# --------------------------------------------------------------------------
# NMF-specific pos/neg scalar pair (reference _nmf_sp_recon_beta_pos_neg,
# nmf.py:617-638).  Pure differentiable functions of (H, W).
# --------------------------------------------------------------------------
def _gathered_dots(H, W, indices):
    """Reconstruction values at the nnz coordinates: ``sum_r H[i,r] W[j,r]``
    (reference ``_nmf_sparse_reconstruct``, nmf.py:602-614)."""
    ii, jj = indices[0], indices[1]
    return jnp.einsum(
        "nr,nr->n", H[ii, :], W[jj, :], preferred_element_type=jnp.float32
    )


def nmf_sp_pos_neg(V: SparseCOO, H, W, beta: float, row_block: int = 512):
    """Closed-form (pos, neg) scalars of the split β-divergence for
    ``V ≈ H Wᵀ`` with a sparse target.

    β=2 uses the Gram identity (no dense reconstruction, no gathers on the
    pos side); β=1 uses column-sum marginals; generic β streams the dense
    positive term over row blocks of H via ``lax.scan``.
    """
    H = jnp.asarray(H)
    W = jnp.asarray(W)
    vals = V.values

    if beta == 2:
        G = lax.dot_general(  # WᵀW: (R, R)
            W, W, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        HG = H @ G
        pos = 0.5 * jnp.vdot(HG, H)
        neg = vals @ _gathered_dots(H, W, V.indices)
        return pos, neg

    WH_vals = _gathered_dots(H, W, V.indices)

    if beta == 1:
        pos = W.sum(0) @ H.sum(0)
        neg = vals @ jnp.log(WH_vals + eps)
        return pos, neg

    bminus = beta - 1
    M = H.shape[0]
    n_blocks = -(-M // row_block)
    M_pad = n_blocks * row_block
    H_pad = jnp.pad(H, ((0, M_pad - M), (0, 0)))
    valid = (jnp.arange(M_pad) < M).reshape(n_blocks, row_block)
    H_blocks = H_pad.reshape(n_blocks, row_block, H.shape[1])

    def block_sum(carry, inp):
        Hb, mask = inp
        WHb = lax.dot_general(
            Hb, W, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        contrib = jnp.sum(
            jnp.where(mask[:, None], (WHb + eps) ** beta, 0.0)
        )
        return carry + contrib, None

    pos, _ = lax.scan(block_sum, jnp.float32(0.0), (H_blocks, valid))
    pos = pos / beta
    neg = vals @ (WH_vals + eps) ** bminus / bminus
    return pos, neg

