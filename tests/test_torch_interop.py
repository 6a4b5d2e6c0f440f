"""torch-tensor interop: reference-shaped code hands its existing data
over unchanged (dense tensors, requires-grad tensors, sparse COO tensors)
and gets identical trajectories to the numpy path."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import pytorch_nmf_tpu as pnt  # noqa: E402
from pytorch_nmf_tpu.nmf import NMF, NMFD  # noqa: E402
from pytorch_nmf_tpu.plca import PLCA  # noqa: E402

RNG = np.random.RandomState(42)


def test_dense_torch_target_and_inits():
    V = RNG.rand(40, 30).astype("f") + 0.01
    W0 = RNG.rand(30, 5).astype("f") + 0.1
    H0 = RNG.rand(40, 5).astype("f") + 0.1

    ref = NMF(W=W0, H=H0)
    ref.fit(V, 1, 0, 10)

    m = NMF(W=torch.tensor(W0), H=torch.tensor(H0))
    m.fit(torch.tensor(V), 1, 0, 10)
    assert np.array_equal(np.asarray(m.W.data), np.asarray(ref.W.data))
    assert np.array_equal(np.asarray(m.H.data), np.asarray(ref.H.data))


def test_requires_grad_tensor_detached():
    V = torch.rand(20, 10) + 0.01
    V.requires_grad_(True)
    m = NMF((20, 10), rank=3)
    assert m.fit(V, 2, 0, 3) >= 0  # no 'requires grad' numpy error


def test_torch_sparse_coo_target():
    """model.fit(torch.sparse_coo_tensor) — the reference's sparse input
    (reference nmf.py:351-356) — matches the SparseCOO path exactly."""
    Vd = RNG.rand(50, 30).astype("f")
    Vd = np.where(Vd > 0.8, Vd, 0)
    W0 = RNG.rand(30, 4).astype("f") + 0.1
    H0 = RNG.rand(50, 4).astype("f") + 0.1

    ref = NMF(W=W0, H=H0)
    ref.fit(pnt.sparse_from_dense(Vd), 1, 0, 10)

    ts = torch.tensor(Vd).to_sparse_coo()
    m = NMF(W=W0, H=H0)
    n = m.fit(ts, 1, 0, 10)
    assert n >= 0
    assert np.array_equal(np.asarray(m.W.data), np.asarray(ref.W.data))
    assert np.array_equal(np.asarray(m.H.data), np.asarray(ref.H.data))


def test_torch_sparse_hoyer():
    Vd = RNG.rand(30, 20).astype("f")
    Vd = np.where(Vd > 0.7, Vd, 0)
    m = NMF((30, 20), rank=3)
    n = m.sparse_fit(torch.tensor(Vd).to_sparse_coo(), beta=2, max_iter=5)
    assert n == 5


@pytest.mark.slow
def test_torch_dense_deconv_and_plca():
    V = torch.rand(1, 8, 20) + 0.01
    m = NMFD(tuple(V.shape), rank=3, T=4)
    assert m.fit(V, 1, 0, 5) >= 0

    Vp = torch.rand(30, 20) + 0.01
    p = PLCA((30, 20), 4)
    n_iter, norm = p.fit(Vp, max_iter=5)
    assert float(norm) > 0
