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

__all__ = [
    "SparseCOO",
    "sparse_coo_tensor",
    "sparse_from_dense",
    "get_V_norm",
    "should_densify",
]


@jax.tree_util.register_pytree_node_class
class SparseCOO:
    """A coalesced sparse COO tensor pytree: ``(indices, values, shape)``.

    ``indices`` is ``(ndim, nnz)`` int32, ``values`` is ``(nnz,)``, and
    ``shape`` is static.  Only 2-D targets are consumed by the NMF solver
    (matching the reference, which supports sparse targets for ``NMF`` only).
    """

    __slots__ = ("indices", "values", "shape")

    def __init__(self, indices, values, shape: Tuple[int, ...]):
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
        order = np.argsort(flat, kind="stable")
        flat, vals = flat[order], vals[order]
        uniq, inv = np.unique(flat, return_inverse=True)
        summed = np.zeros(uniq.shape[0], dtype=vals.dtype)
        np.add.at(summed, inv, vals)
    coal_idx = np.stack(np.unravel_index(uniq, shape_t))
    return SparseCOO(coal_idx, summed, shape_t)


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
    max_bytes = int(
        os.environ.get("PNT_SPARSE_DENSIFY_MAX_BYTES", 4 * 1024**3)
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

