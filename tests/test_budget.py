"""HBM-aware byte budgets and the densify OOM fallback (VERDICT r2 item 4)."""

import numpy as np
import pytest

import pytorch_nmf_tpu as pnt
from pytorch_nmf_tpu.nmf import NMF
from pytorch_nmf_tpu.ops import budget
from pytorch_nmf_tpu.ops.sparse import should_densify, sparse_from_dense

RNG = np.random.RandomState(9)


@pytest.fixture
def fake_limit(monkeypatch):
    def set_limit(value):
        monkeypatch.setattr(budget, "_limit_cache", value)

    yield set_limit
    # monkeypatch restores _limit_cache automatically


def test_budget_env_override_wins(monkeypatch, fake_limit):
    fake_limit(16 * 1024**3)
    monkeypatch.setenv("PNT_TEST_BUDGET", "123")
    assert budget.budget_bytes("PNT_TEST_BUDGET", 999, 0.25) == 123


def test_budget_scales_with_hbm(monkeypatch, fake_limit):
    monkeypatch.delenv("PNT_TEST_BUDGET", raising=False)
    fake_limit(32 * 1024**3)  # a 32 GB chip: budgets double
    assert budget.budget_bytes("PNT_TEST_BUDGET", 4 * 1024**3, 0.25) == \
        8 * 1024**3
    fake_limit(None)  # no stats (CPU): historical constant
    assert budget.budget_bytes("PNT_TEST_BUDGET", 4 * 1024**3, 0.25) == \
        4 * 1024**3


def test_should_densify_follows_device_budget(monkeypatch, fake_limit):
    monkeypatch.delenv("PNT_SPARSE_DENSIFY", raising=False)
    monkeypatch.delenv("PNT_SPARSE_DENSIFY_MAX_BYTES", raising=False)
    Vd = RNG.rand(64, 64).astype("f")
    V = sparse_from_dense(np.where(Vd > 0.9, Vd, 0))
    fake_limit(None)
    assert should_densify(V)  # 16 KiB target, constant budget
    fake_limit(4 * 64 * 64 * 4 - 4)  # tiny fake chip: densified V too big
    assert not should_densify(V)


def test_unfold_budget_follows_device(monkeypatch, fake_limit):
    from pytorch_nmf_tpu.ops.fast_nmfd import nmfd_unfold_supported

    monkeypatch.delenv("PNT_NMFD_UNFOLD_MAX_BYTES", raising=False)
    V_shape, W_shape = (1, 16, 1000), (16, 8, 50)
    fake_limit(None)
    assert nmfd_unfold_supported(V_shape, W_shape)
    fake_limit(1024)  # 128-byte unfold budget at fraction 1/8
    assert not nmfd_unfold_supported(V_shape, W_shape)


def test_densify_oom_falls_back_to_gather(monkeypatch):
    """A RESOURCE_EXHAUSTED from the densified program retries once on the
    ELL/gather path instead of surfacing."""
    from pytorch_nmf_tpu.ops import solver as solver_mod

    Vd = RNG.rand(40, 30).astype("f")
    V = sparse_from_dense(np.where(Vd > 0.8, Vd, 0))
    W0 = RNG.rand(30, 4).astype("f") + 0.1
    H0 = RNG.rand(40, 4).astype("f") + 0.1

    monkeypatch.setenv("PNT_SPARSE_DENSIFY", "0")
    ref = NMF(W=W0, H=H0)
    ref.fit(V, beta=1, tol=-np.inf, max_iter=10)
    monkeypatch.delenv("PNT_SPARSE_DENSIFY")

    real_get = solver_mod.get_sparse_fit

    def exploding_get(*args, **kwargs):
        densify = args[9] if len(args) > 9 else kwargs.get("densify")
        if densify:
            def boom(*a):
                raise RuntimeError(
                    "RESOURCE_EXHAUSTED: Out of memory allocating X bytes"
                )
            return boom
        return real_get(*args, **kwargs)

    monkeypatch.setattr(solver_mod, "get_sparse_fit", exploding_get)
    monkeypatch.setenv("PNT_SPARSE_DENSIFY", "1")  # force the OOM branch
    m = NMF(W=W0, H=H0)
    n = m.fit(V, beta=1, tol=-np.inf, max_iter=10)
    assert n == 10
    assert float(np.abs(np.asarray(m.W.data) - np.asarray(ref.W.data)).max()) < 1e-6
    assert float(np.abs(np.asarray(m.H.data) - np.asarray(ref.H.data)).max()) < 1e-6


def test_non_oom_errors_still_surface(monkeypatch):
    from pytorch_nmf_tpu.ops import solver as solver_mod

    Vd = RNG.rand(20, 15).astype("f")
    V = sparse_from_dense(np.where(Vd > 0.8, Vd, 0))

    def exploding_get(*args, **kwargs):
        def boom(*a):
            raise RuntimeError("INTERNAL: something unrelated")
        return boom

    monkeypatch.setattr(solver_mod, "get_sparse_fit", exploding_get)
    m = NMF((20, 15), rank=3)
    with pytest.raises(RuntimeError, match="unrelated"):
        m.fit(V, beta=1, max_iter=5)
