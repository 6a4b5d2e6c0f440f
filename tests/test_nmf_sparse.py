"""Dense-vs-sparse numerical parity — the strongest internal oracle
(mirrors reference tests/test_nmf_sparse.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_nmf_tpu as pnt
from pytorch_nmf_tpu.nmf import NMF
from pytorch_nmf_tpu.ops.sparse import sparse_from_dense

RNG = np.random.RandomState(2434)
pnt.manual_seed(2434)


def _make_pair(shape=(400, 400), thr=0.95):
    V = RNG.rand(*shape).astype("f")
    V_sparse = sparse_from_dense(np.where(V > thr, V, 0.0))
    V_dense = np.asarray(V_sparse.to_dense())
    return V_sparse, V_dense


@pytest.mark.parametrize("beta", [0.5, 1, 1.5, 2, 3])
@pytest.mark.parametrize("alpha, l1_ratio", [(0, 0), (0.1, 0.5)])
def test_fit_sparse_dense(beta, alpha, l1_ratio):
    max_iter = 5
    V_sparse, V_dense = _make_pair()

    dense_model = NMF(V_dense.shape, 16)
    sparse_model = NMF(V_dense.shape, 16)
    sparse_model.load_state_dict(dense_model.state_dict())

    dense_model.fit(V_dense, beta, 0, max_iter, False, alpha, l1_ratio)
    sparse_model.fit(V_sparse, beta, 0, max_iter, False, alpha, l1_ratio)

    dW = float(jnp.abs(dense_model.W.data - sparse_model.W.data).max())
    dH = float(jnp.abs(dense_model.H.data - sparse_model.H.data).max())
    assert dW < 5e-5, dW
    assert dH < 5e-5, dH


@pytest.mark.parametrize("beta,sW,sH", [(2, 0.3, None), (2, None, 0.3)])
def test_sparse_fit_sparse_dense(beta, sW, sH):
    max_iter = 5
    V_sparse, V_dense = _make_pair()

    dense_model = NMF(V_dense.shape, 16)
    sparse_model = NMF(V_dense.shape, 16)
    sparse_model.load_state_dict(dense_model.state_dict())

    dense_model.sparse_fit(V_dense, beta, max_iter, False, sW, sH)
    sparse_model.sparse_fit(V_sparse, beta, max_iter, False, sW, sH)

    dW = float(jnp.abs(dense_model.W.data - sparse_model.W.data).max())
    dH = float(jnp.abs(dense_model.H.data - sparse_model.H.data).max())
    assert dW < 5e-5, dW
    assert dH < 5e-5, dH


@pytest.mark.parametrize("beta", [0.5, 1, 1.5, 2, 3])
@pytest.mark.parametrize("sp_ratio", [0.95, 0.98])
def test_fit_sparse_target(beta, sp_ratio):
    max_iter = 50
    V = RNG.rand(100, 100).astype("f")
    V_sparse = sparse_from_dense(np.where(V > sp_ratio, V, 0.0))

    m = NMF((100, 100), 8)
    n_iter = m.fit(V_sparse, beta, 1e-4, max_iter)
    assert n_iter <= max_iter
    assert not bool(jnp.any(jnp.isnan(m.W.data)))
    assert not bool(jnp.any(jnp.isnan(m.H.data)))


def test_sparse_coo_roundtrip():
    V = RNG.rand(30, 20).astype("f")
    V[V < 0.7] = 0
    sp = sparse_from_dense(V)
    assert np.allclose(np.asarray(sp.to_dense()), V)
    # duplicate-index coalescing
    sp2 = pnt.sparse_coo_tensor(
        np.array([[0, 0, 1], [0, 0, 2]]), np.array([1.0, 2.0, 3.0], "f"), (2, 3)
    )
    dense = np.asarray(sp2.to_dense())
    assert dense[0, 0] == 3.0 and dense[1, 2] == 3.0


def test_sparse_beta_le_zero_raises():
    sp = sparse_from_dense(np.eye(4, dtype="f"))
    m = NMF((4, 4), 2)
    with pytest.raises(ValueError):
        m.fit(sp, beta=0)


@pytest.mark.parametrize("beta", [0.5, 1, 2, 3])
def test_densify_fast_path_matches_gather_path(beta):
    """The densified sparse fast path must reproduce the gather path's
    trajectory exactly (same split-loss cadence, same updates)."""
    import os

    max_iter = 15
    V_sparse, _ = _make_pair(shape=(120, 90))
    a = NMF((120, 90), 7)
    b = NMF((120, 90), 7)
    b.load_state_dict(a.state_dict())

    os.environ["PNT_SPARSE_DENSIFY"] = "0"
    os.environ["PNT_SPARSE_ELL"] = "0"
    try:
        na = a.fit(V_sparse, beta, 1e-4, max_iter)
    finally:
        os.environ.pop("PNT_SPARSE_DENSIFY", None)
        os.environ.pop("PNT_SPARSE_ELL", None)
    os.environ["PNT_SPARSE_DENSIFY"] = "1"
    try:
        nb = b.fit(V_sparse, beta, 1e-4, max_iter)
    finally:
        os.environ.pop("PNT_SPARSE_DENSIFY", None)

    assert na == nb  # identical early-stop decisions
    assert float(jnp.abs(a.W.data - b.W.data).max()) < 5e-5
    assert float(jnp.abs(a.H.data - b.H.data).max()) < 5e-5


@pytest.mark.parametrize("beta", [0.5, 1, 1.5, 2, 3])
def test_ell_path_matches_gather_path(beta):
    """The dual-ELL gather-regime fast path must reproduce the jax.grad
    gather path's trajectory (identical relu/eps placement; differences
    are f32 summation order only)."""
    import os

    max_iter = 15
    V_sparse, _ = _make_pair(shape=(120, 90))
    a = NMF((120, 90), 7)
    b = NMF((120, 90), 7)
    b.load_state_dict(a.state_dict())

    os.environ["PNT_SPARSE_DENSIFY"] = "0"
    os.environ["PNT_SPARSE_ELL"] = "0"
    try:
        na = a.fit(V_sparse, beta, 1e-4, max_iter)
    finally:
        os.environ.pop("PNT_SPARSE_DENSIFY", None)
        os.environ.pop("PNT_SPARSE_ELL", None)
    os.environ["PNT_SPARSE_DENSIFY"] = "0"
    os.environ["PNT_SPARSE_ELL"] = "1"
    os.environ["PNT_SPARSE_ELL_MAX_PAD"] = "1e9"  # force build at any skew
    try:
        nb = b.fit(V_sparse, beta, 1e-4, max_iter)
    finally:
        os.environ.pop("PNT_SPARSE_DENSIFY", None)
        os.environ.pop("PNT_SPARSE_ELL", None)
        os.environ.pop("PNT_SPARSE_ELL_MAX_PAD", None)

    assert na == nb
    # 5e-5 like the densify-vs-gather oracle above: identical algebra, f32
    # summation-order drift amplified over 15 multiplicative iterations
    assert float(jnp.abs(a.W.data - b.W.data).max()) < 5e-5
    assert float(jnp.abs(a.H.data - b.H.data).max()) < 5e-5


def test_build_ell_roundtrip_and_skew_fallback():
    """ELL row/col copies reproduce the target exactly; a degree
    distribution whose padding would exceed the budget refuses to build."""
    from pytorch_nmf_tpu.ops.sparse import build_ell

    V_sparse, V_dense = _make_pair(shape=(64, 48))
    ell = build_ell(V_sparse, max_pad_factor=1e9)
    assert ell is not None

    M, K = V_sparse.shape
    row = np.zeros((M, K), "f")
    ridx = np.asarray(ell.row_idx)
    rval = np.asarray(ell.row_val)
    for i in range(M):
        np.add.at(row[i], ridx[i][rval[i] > 0], rval[i][rval[i] > 0])
    assert np.abs(row - V_dense).max() < 1e-7

    col = np.zeros((M, K), "f")
    cidx = np.asarray(ell.col_idx)
    cval = np.asarray(ell.col_val)
    for j in range(K):
        np.add.at(col[:, j], cidx[j][cval[j] > 0], cval[j][cval[j] > 0])
    assert np.abs(col - V_dense).max() < 1e-7

    # one fully-dense row + column in an otherwise ~empty 200x200 target:
    # padding to the max degree would cost 200x200 slots for ~400 nnz, so
    # the width is capped and the tails spill into the COO remainders
    # (hybrid ELL+COO) — and the hybrid still reproduces the target
    skew = np.zeros((200, 200), "f")
    skew[0, :] = np.arange(1, 201, dtype="f")
    skew[1:, 0] = np.arange(1, 200, dtype="f")
    ell_h = build_ell(sparse_from_dense(skew))
    assert ell_h is not None
    assert int(ell_h.row_rem[2].shape[0]) > 0  # the dense row spilled
    assert int(ell_h.col_rem[2].shape[0]) > 0  # the dense column spilled
    back = np.zeros((200, 200), "f")
    ridx = np.asarray(ell_h.row_idx)
    rval = np.asarray(ell_h.row_val)
    for i in range(200):
        np.add.at(back[i], ridx[i][rval[i] > 0], rval[i][rval[i] > 0])
    rs, ro, rv = (np.asarray(a) for a in ell_h.row_rem)
    np.add.at(back, (rs, ro), rv)
    assert np.abs(back - skew).max() < 1e-7


@pytest.mark.slow
def test_ell_hybrid_skewed_matches_gather_path():
    """Degree-skewed targets take the hybrid ELL+COO split and must still
    match the jax.grad gather path's trajectory."""
    import os

    rng = np.random.RandomState(71)
    M, K = 96, 64
    Vd = np.where(rng.rand(M, K) > 0.93, rng.rand(M, K), 0).astype("f")
    Vd[3, :] = rng.rand(K).astype("f") + 0.1   # dense row
    Vd[:, 5] = rng.rand(M).astype("f") + 0.1   # dense column
    V_sp = sparse_from_dense(Vd)

    from pytorch_nmf_tpu.ops.sparse import build_ell

    assert build_ell(V_sp).row_rem[2].shape[0] > 0  # hybrid is exercised

    for beta in (0.5, 1, 2):
        a = NMF((M, K), 6)
        b = NMF((M, K), 6)
        b.load_state_dict(a.state_dict())
        os.environ["PNT_SPARSE_DENSIFY"] = "0"
        os.environ["PNT_SPARSE_ELL"] = "0"
        try:
            na = a.fit(V_sp, beta, 1e-4, 12)
        finally:
            os.environ.pop("PNT_SPARSE_DENSIFY", None)
            os.environ.pop("PNT_SPARSE_ELL", None)
        os.environ["PNT_SPARSE_DENSIFY"] = "0"
        os.environ["PNT_SPARSE_ELL"] = "1"
        try:
            nb = b.fit(V_sp, beta, 1e-4, 12)
        finally:
            os.environ.pop("PNT_SPARSE_DENSIFY", None)
            os.environ.pop("PNT_SPARSE_ELL", None)
        assert na == nb, beta
        assert float(jnp.abs(a.W.data - b.W.data).max()) < 5e-5, beta
        assert float(jnp.abs(a.H.data - b.H.data).max()) < 5e-5, beta


def test_build_ell_sorts_unsorted_coo():
    """A raw SparseCOO built from UNSORTED (but valid) indices must yield
    the same ELL layout as the coalesced form — the builder sorts."""
    from pytorch_nmf_tpu.ops.sparse import SparseCOO, build_ell

    rng = np.random.RandomState(3)
    V_sparse, V_dense = _make_pair(shape=(40, 32))
    idx = np.asarray(V_sparse.indices)
    vals = np.asarray(V_sparse.values)
    perm = rng.permutation(len(vals))
    shuffled = SparseCOO(idx[:, perm], vals[perm], V_sparse.shape)

    ell = build_ell(shuffled, max_pad_factor=1e9)
    assert ell is not None
    M, K = V_sparse.shape
    back = np.zeros((M, K), "f")
    ridx = np.asarray(ell.row_idx)
    rval = np.asarray(ell.row_val)
    for i in range(M):
        np.add.at(back[i], ridx[i][rval[i] > 0], rval[i][rval[i] > 0])
    assert np.abs(back - V_dense).max() < 1e-7


def test_ell_functional_api():
    """functional.nmf_fit routes through the ELL path when forced and
    matches the model-layer result."""
    import os

    from pytorch_nmf_tpu.functional import nmf_fit

    V_sparse, _ = _make_pair(shape=(80, 60))
    W0 = RNG.rand(60, 5).astype("f") + 0.1
    H0 = RNG.rand(80, 5).astype("f") + 0.1

    os.environ["PNT_SPARSE_DENSIFY"] = "0"
    os.environ["PNT_SPARSE_ELL"] = "1"
    os.environ["PNT_SPARSE_ELL_MAX_PAD"] = "1e9"
    try:
        W1, H1, n1 = nmf_fit(V_sparse, W0, H0, beta=1, tol=0, max_iter=8)
    finally:
        os.environ.pop("PNT_SPARSE_DENSIFY", None)
        os.environ.pop("PNT_SPARSE_ELL", None)
        os.environ.pop("PNT_SPARSE_ELL_MAX_PAD", None)
    m = NMF(W=W0, H=H0)
    n2 = m.fit(V_sparse, 1, 0, 8)
    assert int(n1) == n2
    assert float(jnp.abs(m.W.data - W1).max()) < 5e-5
    assert jnp.all(jnp.isfinite(W1)) and jnp.all(jnp.isfinite(H1))
