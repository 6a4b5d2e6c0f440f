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
    try:
        na = a.fit(V_sparse, beta, 1e-4, max_iter)
    finally:
        os.environ.pop("PNT_SPARSE_DENSIFY", None)
    os.environ["PNT_SPARSE_DENSIFY"] = "1"
    try:
        nb = b.fit(V_sparse, beta, 1e-4, max_iter)
    finally:
        os.environ.pop("PNT_SPARSE_DENSIFY", None)

    assert na == nb  # identical early-stop decisions
    assert float(jnp.abs(a.W.data - b.W.data).max()) < 5e-5
    assert float(jnp.abs(a.H.data - b.H.data).max()) < 5e-5
