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


@pytest.mark.slow
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


def test_checkpointed_fit_matches_plain_fit(tmp_path):
    """Segmented checkpointed_fit must reproduce the uninterrupted
    trajectory exactly (in-segment early stop disabled, same update
    sequence)."""
    from pytorch_nmf_tpu.nmf import NMF
    from pytorch_nmf_tpu.utils.checkpoint import checkpointed_fit

    rng = np.random.RandomState(7)
    V = rng.rand(60, 40).astype("f")
    W0 = rng.rand(40, 5).astype("f") + 0.1
    H0 = rng.rand(60, 5).astype("f") + 0.1

    a = NMF(W=W0, H=H0)
    n = checkpointed_fit(
        a, V, beta=1, tol=float("-inf"), max_iter=15, every=5,
        directory=str(tmp_path / "ck"),
    )
    b = NMF(W=W0, H=H0)
    b.fit(V, 1, float("-inf"), 15)
    assert n == 15
    assert float(jnp.abs(a.W.data - b.W.data).max()) < 1e-7
    assert float(jnp.abs(a.H.data - b.H.data).max()) < 1e-7
    # pruning: at most `keep` checkpoint files remain
    import os

    files = [f for f in os.listdir(tmp_path / "ck") if f.endswith(".npz")]
    assert len(files) <= 2


def test_checkpointed_fit_resume(tmp_path):
    """A killed job resumes from the last checkpoint and lands on the
    uninterrupted trajectory."""
    from pytorch_nmf_tpu.nmf import NMF
    from pytorch_nmf_tpu.utils.checkpoint import checkpointed_fit

    rng = np.random.RandomState(11)
    V = rng.rand(50, 30).astype("f")
    W0 = rng.rand(30, 4).astype("f") + 0.1
    H0 = rng.rand(50, 4).astype("f") + 0.1
    ckdir = str(tmp_path / "ck")

    a = NMF(W=W0, H=H0)
    checkpointed_fit(a, V, beta=2, tol=float("-inf"), max_iter=10,
                     every=5, directory=ckdir)

    # "crash": a fresh process would construct a new model and resume
    c = NMF(V.shape, 4)
    n = checkpointed_fit(c, V, beta=2, tol=float("-inf"), max_iter=20,
                         every=5, directory=ckdir)
    assert n == 20

    b = NMF(W=W0, H=H0)
    b.fit(V, 2, float("-inf"), 20)
    assert float(jnp.abs(c.W.data - b.W.data).max()) < 1e-7
    assert float(jnp.abs(c.H.data - b.H.data).max()) < 1e-7


@pytest.mark.slow
def test_checkpointed_fit_converges_and_sparse(tmp_path):
    """Loose tolerance stops early at a segment boundary; sparse COO
    targets use the split-form loss."""
    import pytorch_nmf_tpu as pnt
    from pytorch_nmf_tpu.nmf import NMF
    from pytorch_nmf_tpu.utils.checkpoint import checkpointed_fit

    rng = np.random.RandomState(13)
    V = rng.rand(40, 24).astype("f")
    m = NMF(V.shape, 3)
    n = checkpointed_fit(m, V, beta=1, tol=0.5, max_iter=200, every=10,
                         directory=str(tmp_path / "c1"))
    assert n < 200 and n % 10 == 0

    V_sp = pnt.sparse_from_dense(np.where(V > 0.7, V, 0))
    m2 = NMF(V.shape, 3)
    n2 = checkpointed_fit(m2, V_sp, beta=1, tol=1e-3, max_iter=60,
                          every=20, directory=str(tmp_path / "c2"))
    assert 0 < n2 <= 60
    assert bool(jnp.all(jnp.isfinite(m2.W.data)))


def test_checkpointed_fit_converged_resume_is_noop(tmp_path):
    """Re-entering after a converged run must not keep advancing the
    factors; a foreign checkpoint directory must raise."""
    from pytorch_nmf_tpu.nmf import NMF
    from pytorch_nmf_tpu.utils.checkpoint import checkpointed_fit

    rng = np.random.RandomState(17)
    V = rng.rand(40, 24).astype("f")
    ckdir = str(tmp_path / "ck")
    m = NMF(V.shape, 3)
    n1 = checkpointed_fit(m, V, beta=1, tol=0.5, max_iter=200, every=10,
                          directory=ckdir)
    assert n1 < 200
    W_done = np.asarray(m.W.data)

    m2 = NMF(V.shape, 3)
    n2 = checkpointed_fit(m2, V, beta=1, tol=0.5, max_iter=200, every=10,
                          directory=ckdir)
    assert n2 == n1  # idempotent
    assert np.abs(np.asarray(m2.W.data) - W_done).max() == 0.0

    # different run (other beta) pointing at the same directory -> raises
    m3 = NMF(V.shape, 3)
    with pytest.raises(ValueError):
        checkpointed_fit(m3, V, beta=2, tol=0.5, max_iter=50, every=10,
                         directory=ckdir)


def test_checkpointed_plca_fit_matches_and_resumes(tmp_path):
    """Segmented PLCA EM matches the uninterrupted trajectory and resumes
    exactly."""
    from pytorch_nmf_tpu.plca import PLCA
    from pytorch_nmf_tpu.utils.checkpoint import checkpointed_plca_fit

    rng = np.random.RandomState(23)
    V = rng.rand(40, 24).astype("f")
    a = PLCA(V.shape, 3)
    W0, H0, Z0 = (np.asarray(p.data) for p in (a.W, a.H, a.Z))
    ckdir = str(tmp_path / "ck")

    n, norm = checkpointed_plca_fit(
        a, V, tol=float("-inf"), max_iter=15, every=5, directory=ckdir,
    )
    b = PLCA(W=W0, H=H0, Z=Z0)
    b.fit(V, float("-inf"), 15)
    assert n == 15
    assert abs(float(norm) - float(np.sum(V))) < 1e-3
    assert float(jnp.abs(a.W.data - b.W.data).max()) < 1e-7
    assert float(jnp.abs(a.H.data - b.H.data).max()) < 1e-7
    assert float(jnp.abs(a.Z.data - b.Z.data).max()) < 1e-7

    # resume from 15 to 25 equals an uninterrupted 25
    c = PLCA(V.shape, 3)
    n2, _ = checkpointed_plca_fit(
        c, V, tol=float("-inf"), max_iter=25, every=5, directory=ckdir,
    )
    b.fit(V, float("-inf"), 10)  # reference continues in place
    assert n2 == 25
    assert float(jnp.abs(c.W.data - b.W.data).max()) < 1e-7


def test_checkpointed_fit_identity_and_tighter_tol(tmp_path):
    """run_id covers the fit configuration, and a tighter tol re-enters
    iteration instead of short-circuiting on the stored converged flag."""
    from pytorch_nmf_tpu.nmf import NMF
    from pytorch_nmf_tpu.utils.checkpoint import checkpointed_fit

    rng = np.random.RandomState(29)
    V = rng.rand(40, 24).astype("f")
    ckdir = str(tmp_path / "ck")
    m = NMF(V.shape, 3)
    n1 = checkpointed_fit(m, V, beta=1, tol=0.5, max_iter=200, every=10,
                          directory=ckdir)
    assert n1 < 200

    # same config but extra regularization -> different run -> raises
    m2 = NMF(V.shape, 3)
    with pytest.raises(ValueError):
        checkpointed_fit(m2, V, beta=1, tol=0.5, max_iter=50, every=10,
                         directory=ckdir, alpha=0.1, l1_ratio=0.5)

    # tighter tol: converged flag must NOT short-circuit; iteration resumes
    m3 = NMF(V.shape, 3)
    n3 = checkpointed_fit(m3, V, beta=1, tol=1e-9, max_iter=n1 + 20,
                          every=10, directory=ckdir)
    assert n3 > n1


def test_loss_history_recorder():
    """LossHistory records the 10-iteration cadence losses alongside the
    fit's own progress bar; PLCA's log-posterior rides in extras."""
    from pytorch_nmf_tpu.nmf import NMF
    from pytorch_nmf_tpu.plca import PLCA
    from pytorch_nmf_tpu.utils import LossHistory

    rng = np.random.RandomState(31)
    V = rng.rand(50, 30).astype("f")
    m = NMF(V.shape, 4)
    with LossHistory() as hist:
        m.fit(V, 1, 0, 40, verbose=True)
    assert hist.chunks == [1, 2, 3, 4]
    assert all(np.isfinite(hist.losses))
    assert hist.losses[-1] <= hist.losses[0]

    p = PLCA(V.shape, 3)
    with LossHistory() as hist2:
        p.fit(V, 0, 30, verbose=True)
    assert len(hist2.losses) == 3
    assert all(e is not None for e in hist2.extras)  # log-posterior


@pytest.mark.slow
def test_verbose_record_mode_matches_streaming(monkeypatch):
    """When the backend cannot run host callbacks (relay-attached TPU;
    PNT_PROGRESS_CALLBACKS=0 forces it here), verbose fits record the
    cadence losses in the loop carry and replay them to the handlers
    after the program runs — same events, identical trajectories."""
    import pytorch_nmf_tpu as pnt
    from pytorch_nmf_tpu.nmf import NMF
    from pytorch_nmf_tpu.plca import PLCA
    from pytorch_nmf_tpu.ops import solver
    from pytorch_nmf_tpu.utils import LossHistory

    rng = np.random.RandomState(33)
    V = rng.rand(50, 30).astype("f") + 1e-3
    Vthr = np.where(V > 0.8, V, 0)

    def run_all(record):
        if record:
            monkeypatch.setenv("PNT_PROGRESS_CALLBACKS", "0")
        else:
            monkeypatch.delenv("PNT_PROGRESS_CALLBACKS", raising=False)
        for f in (solver.get_dense_fit, solver.get_sparse_fit,
                  solver.get_hoyer_fit, solver.get_plca_fit):
            f.cache_clear()
        out = {}
        pnt.manual_seed(5)
        m = NMF(V.shape, 4)
        with LossHistory() as h:
            m.fit(V, 1, 0, 40, verbose=True)
        out["dense"] = (np.asarray(m.W.data), h.chunks, list(h.losses))

        pnt.manual_seed(6)
        ms = NMF(V.shape, 4)
        with LossHistory() as h:
            ms.fit(pnt.sparse_from_dense(Vthr), beta=1, tol=0,
                   max_iter=30, verbose=True)
        out["sparse"] = (np.asarray(ms.W.data), h.chunks, list(h.losses))

        pnt.manual_seed(7)
        mh = NMF(V.shape, 4)
        with LossHistory() as h:
            mh.sparse_fit(V, beta=2, max_iter=30, verbose=True, sW=0.5)
        out["hoyer"] = (np.asarray(mh.W.data), h.chunks, list(h.losses))

        pnt.manual_seed(8)
        p = PLCA(V.shape, 3)
        with LossHistory() as h:
            p.fit(V, 0, 30, verbose=True)
        out["plca"] = (
            np.asarray(p.W.data), h.chunks, list(h.losses), list(h.extras)
        )
        return out

    stream = run_all(False)
    record = run_all(True)
    for key in ("dense", "sparse", "hoyer", "plca"):
        s, r = stream[key], record[key]
        np.testing.assert_array_equal(s[0], r[0]), key
        assert s[1] == r[1], key           # same chunk indices, same order
        np.testing.assert_allclose(s[2], r[2], rtol=1e-6)
        assert len(s[2]) > 0, key
    # PLCA's log-posterior rides the extras channel in record mode too
    np.testing.assert_allclose(stream["plca"][3], record["plca"][3],
                               rtol=1e-6)


def test_setattr_cannot_shadow_parameter():
    """torch parity (nn.Module.__setattr__): assigning a plain array to a
    registered parameter name raises instead of silently shadowing the
    Parameter (fit/state_dict would keep using the old factor)."""
    import jax.numpy as jnp
    import pytest

    from pytorch_nmf_tpu.nmf import NMF

    m = NMF((10, 8), 2)
    with pytest.raises(TypeError, match="cannot assign"):
        m.W = jnp.zeros((8, 2))
    from pytorch_nmf_tpu.module import Parameter

    m.W = Parameter(jnp.ones((8, 2)))  # a Parameter still rebinds
    assert float(m.W.data.min()) == 1.0


def test_load_state_dict_applies_factor_dtype_rule():
    """Checkpoint restores honor the factor-state dtype rule: bf16 values
    promote to f32 (bf16 is a target-storage knob; bf16 solver state
    type-mismatches the f32-pinned loop carries)."""
    import jax.numpy as jnp

    from pytorch_nmf_tpu.nmf import NMF

    m = NMF((10, 8), 2)
    state = {k: jnp.asarray(v, jnp.bfloat16)
             for k, v in m.state_dict().items()}
    m.load_state_dict(state)
    assert m.W.data.dtype == jnp.float32
    m.load_params({n: jnp.asarray(p.data, jnp.bfloat16)
                   for n, p in m.named_parameters()})
    assert m.H.data.dtype == jnp.float32
