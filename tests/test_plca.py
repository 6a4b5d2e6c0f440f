"""PLCA family: constructor/simplex invariants + EM fit sweeps
(mirrors reference tests/test_plca.py)."""

import copy

import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_nmf_tpu as pnt
from pytorch_nmf_tpu.plca import PLCA, SIPLCA, SIPLCA2, SIPLCA3, BaseComponent

RNG = np.random.RandomState(7)
pnt.manual_seed(7)


def _assert_simplex(p, axis_keep):
    x = np.asarray(p.data)
    axes = tuple(d for d in range(x.ndim) if d != axis_keep)
    sums = x.sum(axis=axes) if axes else x.sum()
    assert np.allclose(sums, np.ones_like(sums), atol=1e-5)


@pytest.mark.parametrize("rank", [8, None])
@pytest.mark.parametrize("W", [(50, 8), RNG.rand(50, 8).astype("f"), None])
@pytest.mark.parametrize("H", [(100, 8), RNG.rand(100, 8).astype("f"), None])
@pytest.mark.parametrize("Z", [RNG.rand(8).astype("f"), None])
def test_base_valid_construct(rank, W, H, Z):
    if (rank is None) and (H is None) and (W is None) and (Z is None):
        return
    m = BaseComponent(rank, W, H, Z)
    if H is None:
        assert m._parameters["H"] is None
    else:
        _assert_simplex(m._parameters["H"], 1)
    if W is None:
        assert m._parameters["W"] is None
    else:
        _assert_simplex(m._parameters["W"], 1)
    if Z is None and not rank:
        assert m._parameters["Z"] is None
    else:
        assert np.isclose(float(jnp.sum(m.Z.data)), 1.0, atol=1e-6)


@pytest.mark.parametrize(
    "rank, W, H, Z",
    [
        (None, None, None, None),
        (7, (50, 8), (100, 10), None),
        (None, RNG.rand(50, 8).astype("f"), (100, 10), RNG.rand(7).astype("f")),
        (None, RNG.randn(50, 8).astype("f"), (100, 8), RNG.rand(8).astype("f")),
        (None, RNG.rand(50, 8).astype("f"), (100, 8), RNG.randn(8).astype("f")),
        (None, (50, 8), RNG.rand(100, 10).astype("f"), RNG.rand(10).astype("f")),
        (8, (50, 8), RNG.randn(100, 8).astype("f"), None),
        (
            None,
            RNG.rand(50, 8).astype("f"),
            RNG.rand(100, 10).astype("f"),
            RNG.rand(7).astype("f"),
        ),
    ],
)
def test_base_invalid_construct(rank, W, H, Z):
    with pytest.raises(Exception):
        BaseComponent(rank, W, H, Z)


def test_plca_valid_construct():
    m = PLCA((100, 50))
    y = m()
    assert y.shape == (100, 50)
    assert np.isclose(float(jnp.sum(y)), 1.0, atol=1e-4)


def test_siplca_valid_construct():
    m = SIPLCA((10, 50, 100))
    y = m()
    assert y.shape == (10, 50, 100)
    assert np.isclose(float(jnp.sum(y)), 1.0, atol=1e-4)


def test_siplca2_valid_construct():
    m = SIPLCA2((2, 32, 30, 30), 16)
    y = m()
    assert y.shape == (2, 32, 30, 30)
    assert np.isclose(float(jnp.sum(y)), 1.0, atol=1e-4)


def test_siplca3_valid_construct():
    m = SIPLCA3((2, 10, 12, 12, 12), 8)
    y = m()
    assert y.shape == (2, 10, 12, 12, 12)
    assert np.isclose(float(jnp.sum(y)), 1.0, atol=1e-4)


@pytest.mark.parametrize("Vshape", [(100, 50, 50), (100,)])
def test_plca_invalid_construct(Vshape):
    with pytest.raises(Exception):
        PLCA(Vshape)


@pytest.mark.parametrize("alphas", [(1, 1, 1), (0.999, 0.999, 0.999)])
@pytest.mark.parametrize(
    "trainable",
    [
        (True, True, True),
        (False, True, True),
        (True, False, True),
        (True, True, False),
        (False, False, True),
        (True, False, False),
        (False, True, False),
    ],
)
def test_fit(alphas, trainable):
    trainable_W, trainable_H, trainable_Z = trainable
    W_alpha, H_alpha, Z_alpha = alphas
    max_iter = 50
    V = RNG.rand(100, 50).astype("f")
    m = PLCA(
        None,
        8,
        H=RNG.rand(100, 8).astype("f"),
        W=RNG.rand(50, 8).astype("f"),
        Z=np.ones(8, "f") / 8,
        trainable_Z=trainable_Z,
        trainable_W=trainable_W,
        trainable_H=trainable_H,
    )
    assert m.Z.requires_grad == trainable_Z
    assert m.W.requires_grad == trainable_W
    assert m.H.requires_grad == trainable_H

    m_copy = copy.deepcopy(m)
    n_iter, norm = m.fit(V, 1e-4, max_iter, False, W_alpha, H_alpha, Z_alpha)
    assert n_iter <= max_iter

    if not trainable_Z:
        assert np.allclose(np.asarray(m.Z.data), np.asarray(m_copy.Z.data))
    if not trainable_W:
        assert np.allclose(np.asarray(m.W.data), np.asarray(m_copy.W.data))
    if not trainable_H:
        assert np.allclose(np.asarray(m.H.data), np.asarray(m_copy.H.data))

    for p, ax in ((m.W, 1), (m.H, 1)):
        assert not bool(jnp.any(jnp.isnan(p.data)))
    y = m(norm=norm)
    assert y.shape == V.shape


def test_fit_simplex_invariant_after_training():
    V = RNG.rand(60, 40).astype("f")
    m = PLCA(V.shape, 6)
    m.fit(V, 0, 30)
    _assert_simplex(m.W, 1)
    _assert_simplex(m.H, 1)
    assert np.isclose(float(jnp.sum(m.Z.data)), 1.0, atol=1e-5)


@pytest.mark.parametrize("model_cls, vshape, kw", [
    (SIPLCA, (1, 20, 30), dict(T=4)),
    (SIPLCA2, (1, 2, 12, 14), dict(kernel_size=3)),
    (SIPLCA3, (1, 2, 6, 7, 8), dict(kernel_size=2)),
])
@pytest.mark.slow
def test_fit_shift_invariant(model_cls, vshape, kw):
    V = RNG.rand(*vshape).astype("f")
    m = model_cls(vshape, 4, **kw)
    n_iter, norm = m.fit(V, 0, 20)
    assert not bool(jnp.any(jnp.isnan(m.W.data)))
    assert not bool(jnp.any(jnp.isnan(m.H.data)))
