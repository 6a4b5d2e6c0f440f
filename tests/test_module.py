"""Module/Parameter system tests (checkpointing, composition, substitution)."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_nmf_tpu as pnt
from pytorch_nmf_tpu.module import Module, Parameter
from pytorch_nmf_tpu.nmf import NMF

RNG = np.random.RandomState(1)


def test_parameter_basic():
    p = Parameter(np.ones((3, 4), "f"), requires_grad=False)
    assert p.shape == (3, 4)
    assert not p.requires_grad
    assert p.numel() == 12
    assert float(jnp.sum(p + 1)) == 24.0
    assert (p * 2).shape == (3, 4)


def test_parameter_substitution_is_scoped():
    p = Parameter(np.ones((2,), "f"))
    with p.substituted(jnp.zeros((2,))):
        assert float(jnp.sum(jnp.asarray(p))) == 0.0
    assert float(jnp.sum(jnp.asarray(p))) == 2.0


def test_parameter_substitution_differentiates():
    p = Parameter(np.array([2.0, 3.0], "f"))

    def f(x):
        with p.substituted(x):
            return jnp.sum(jnp.asarray(p) ** 2)

    g = jax.grad(f)(p.data)
    assert np.allclose(np.asarray(g), [4.0, 6.0])


def test_state_dict_roundtrip():
    m = NMF((20, 10), 4)
    sd = m.state_dict()
    assert set(sd.keys()) == {"W", "H"}
    m2 = NMF((20, 10), 4)
    m2.load_state_dict(sd)
    assert bool(jnp.all(m2.W.data == m.W.data))

    with pytest.raises(KeyError):
        m2.load_state_dict({**sd, "bogus": sd["W"]})
    with pytest.raises(ValueError):
        m2.load_state_dict({**sd, "W": np.ones((3, 3), "f")})


def test_deepcopy_independent():
    m = NMF((20, 10), 4)
    m2 = copy.deepcopy(m)
    m2.W.data = m2.W.data * 0
    assert not bool(jnp.all(m.W.data == 0))


def test_sequential_chaining():
    m = pnt.Sequential(NMF((100, 16), rank=8), NMF(W=(32, 16)), NMF(W=(50, 32)))
    y = m(None)
    assert y.shape == (100, 50)
    assert len(list(m.parameters())) == 4  # W,H + W + W


def test_named_parameters_nested():
    m = pnt.Sequential(NMF((10, 6), 2), NMF(W=(8, 6)))
    names = dict(m.named_parameters())
    assert "0.W" in names and "0.H" in names and "1.W" in names


def test_manual_seed_reproducible():
    pnt.manual_seed(99)
    a = NMF((10, 6), 2).W.data
    pnt.manual_seed(99)
    b = NMF((10, 6), 2).W.data
    assert bool(jnp.all(a == b))


def test_repr_smoke():
    m = NMF((10, 6), 2)
    assert "NMF" in repr(m)


def test_checkpoint_npz_roundtrip(tmp_path):
    from pytorch_nmf_tpu.utils import checkpoint

    m = NMF((20, 10), 4)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, m)
    m2 = NMF((20, 10), 4)
    checkpoint.load(path, m2)
    assert bool(jnp.all(m2.W.data == m.W.data))
    state = checkpoint.load(path)
    assert set(state.keys()) == {"W", "H"}


def test_load_state_dict_strict_missing_key():
    m = NMF((20, 10), 4)
    with pytest.raises(KeyError):
        m.load_state_dict({"W": m.W.data})
    m.load_state_dict({"W": m.W.data}, strict=False)  # allowed when opted in


def test_checkpoint_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from pytorch_nmf_tpu.utils import checkpoint

    m = NMF((20, 10), 4)
    path = str(tmp_path / "orbax_ckpt")
    checkpoint.save_orbax(path, m)
    m2 = NMF((20, 10), 4)
    checkpoint.load_orbax(path, m2)
    assert bool(jnp.all(m2.W.data == m.W.data))


def test_profiling_helpers_smoke(tmp_path):
    from pytorch_nmf_tpu.utils import profiling

    with profiling.trace(str(tmp_path / "trace")):
        with profiling.annotate("tiny-fit"):
            m = NMF((16, 8), 2)
            m.fit(np.random.RandomState(0).rand(16, 8).astype("f"), 2, 0, 5)
    stats = profiling.device_memory_stats()
    assert isinstance(stats, dict)
