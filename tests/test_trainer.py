"""Trainer tests: composed-model MU, gradient semantics, projection trainer
(mirrors reference tests/test_trainer.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_nmf_tpu as pnt
from pytorch_nmf_tpu.metrics import beta_div
from pytorch_nmf_tpu.nmf import NMF
from pytorch_nmf_tpu.trainer import BetaMu, SparsityProj

RNG = np.random.RandomState(11)
pnt.manual_seed(11)


@pytest.mark.parametrize("beta", [-1, 0, 0.5, 1, 1.5, 2, 3])
@pytest.mark.parametrize("l1_reg, l2_reg, orthogonal", [(0, 0, 0), (1e-3, 1e-3, 1e-2)])
def test_beta_trainer(beta, l1_reg, l2_reg, orthogonal):
    m = pnt.Sequential(
        NMF((100, 16), rank=8),
        NMF(W=(32, 16)),
        NMF(W=(50, 32)),
    )

    target = RNG.rand(100, 50).astype("f")
    trainer = BetaMu(m.parameters(), beta, l1_reg, l2_reg, orthogonal)

    def closure():
        trainer.zero_grad()
        return target, m(None)

    for _ in range(10):
        trainer.step(closure)
        for p in m.parameters():
            assert bool(jnp.all(p.data >= 0.0))


@pytest.mark.parametrize("attr", ["W", "H"])
def test_sparse_trainer(attr):
    m = NMF((100, 50))

    target = RNG.rand(100, 50).astype("f")
    trainer = SparsityProj([getattr(m, attr)], 0.2)

    def closure():
        trainer.zero_grad()
        output = m(None)
        return beta_div(output, target)

    for _ in range(10):
        trainer.step(closure)
        assert bool(jnp.all(getattr(m, attr).data >= 0.0))


@pytest.mark.parametrize("beta", [-1, 0, 0.5, 1, 1.5, 2, 3])
@pytest.mark.parametrize("attr", ["W", "H"])
def test_beta_trainer_grad(beta, attr):
    """After one BetaMu step, p.grad equals the true autograd gradient of the
    β-divergence at the pre-step parameters (reference tests/test_trainer.py:54-73)."""
    m1 = NMF((100, 50))
    target = RNG.rand(100, 50).astype("f")

    p = getattr(m1, attr)
    W0, H0 = m1.W.data, m1.H.data

    trainer = BetaMu([p], beta)

    def closure():
        trainer.zero_grad()
        return target, m1()

    trainer.step(closure)

    if attr == "W":
        ref_grad = jax.grad(
            lambda w: beta_div(NMF.reconstruct(H0, w), target, beta)
        )(W0)
    else:
        ref_grad = jax.grad(
            lambda h: beta_div(NMF.reconstruct(h, W0), target, beta)
        )(H0)

    assert np.allclose(np.asarray(p.grad), np.asarray(ref_grad), atol=1e-4), (
        float(jnp.abs(p.grad - ref_grad).max())
    )


def test_beta_trainer_frozen_params_skipped():
    m = NMF((50, 30), 4)
    m.W.requires_grad = False
    W0 = m.W.data
    target = RNG.rand(50, 30).astype("f")
    trainer = BetaMu(m.parameters(), 1)

    def closure():
        trainer.zero_grad()
        return target, m()

    H0 = m.H.data
    trainer.step(closure)
    assert bool(jnp.all(m.W.data == W0))
    assert not bool(jnp.all(m.H.data == H0))  # H was updated
    assert m.W.grad is None


def test_param_group_dict_api():
    m = NMF((40, 20), 4)
    trainer = BetaMu(
        [
            {"params": [m.W], "beta": 2},
            {"params": [m.H], "beta": 1},
        ],
        beta=1,
    )
    target = RNG.rand(40, 20).astype("f")

    def closure():
        trainer.zero_grad()
        return target, m()

    trainer.step(closure)
    assert len(trainer.param_groups) == 2


def test_invalid_hyperparams_raise():
    m = NMF((10, 10), 2)
    with pytest.raises(ValueError):
        BetaMu(m.parameters(), 1, l1_reg=-1)
    with pytest.raises(ValueError):
        SparsityProj([m.W], 1.5)


def test_beta_trainer_skips_unconnected_param():
    """A parameter the closure output does not depend on must be left
    untouched (reference trainer.py:75-77), even with regularization."""
    m1 = NMF((30, 20), 4)
    m2 = NMF((25, 15), 3)  # not part of the closure's graph
    target = RNG.rand(30, 20).astype("f")
    b0 = m2.W.data

    trainer = BetaMu(list(m1.parameters()) + list(m2.parameters()),
                     beta=2, l1_reg=0.1)

    def closure():
        trainer.zero_grad()
        return target, m1()

    trainer.step(closure)
    assert bool(jnp.all(m2.W.data == b0))
    assert m2.W.grad is None
