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


@pytest.mark.slow
def test_betamu_compiled_matches_eager_and_caches():
    """The jit-compiled step must (a) reuse one cache entry across fresh
    lambdas created in a loop, and (b) track the eager path's factor/grad
    trajectories to f32 noise."""
    import copy

    m1 = pnt.Sequential(NMF((60, 12), rank=6), NMF(W=(24, 12)), NMF(W=(30, 24)))
    m2 = copy.deepcopy(m1)
    target = RNG.rand(60, 30).astype("f")

    tA = BetaMu(m1.parameters(), 1, 1e-3, 1e-3, 1e-2)
    tB = BetaMu(m2.parameters(), 1, 1e-3, 1e-3, 1e-2, jit_compile=False)
    for _ in range(5):
        tA.step(lambda: (target, m1(None)))
        tB.step(lambda: (target, m2(None)))
    assert len(tA._step_cache) == 1  # fresh lambdas hit the same entry
    for (_, p1), (_, p2) in zip(m1.named_parameters(), m2.named_parameters()):
        np.testing.assert_allclose(
            np.asarray(p1.data), np.asarray(p2.data), rtol=1e-5, atol=1e-7
        )
        g1, g2 = np.asarray(p1.grad), np.asarray(p2.grad)
        scale = max(float(np.abs(g2).max()), 1e-6)
        assert float(np.abs(g1 - g2).max()) / scale < 1e-4


@pytest.mark.slow
def test_sparsityproj_compiled_matches_eager():
    import copy

    mA = NMF((80, 40), rank=5)
    mB = copy.deepcopy(mA)
    target = RNG.rand(80, 40).astype("f")

    sA = SparsityProj([mA.W], 0.3)
    sB = SparsityProj([mB.W], 0.3, jit_compile=False)
    for _ in range(5):
        lA = sA.step(lambda: beta_div(mA(None), target))
        lB = sB.step(lambda: beta_div(mB(None), target))
    assert len(sA._step_cache) == 1
    # the backtracking line search amplifies f32 noise; compare relative to
    # the factor scale (loss trajectories agree to ~7 digits)
    scale = float(np.abs(np.asarray(mB.W.data)).max())
    diff = float(np.abs(np.asarray(mA.W.data) - np.asarray(mB.W.data)).max())
    assert diff / scale < 1e-4
    assert abs(sA.param_groups[0]["lr"] - sB.param_groups[0]["lr"]) < 1e-6
    assert abs(float(lA) - float(lB)) / max(abs(float(lB)), 1e-6) < 1e-4


@pytest.mark.slow
def test_sparsityproj_disconnected_param_untouched():
    """A requires_grad param the loss does not depend on must not be
    projected (reference skips p.grad-is-None params, trainer.py:165-166)."""
    from pytorch_nmf_tpu.module import Parameter

    for jit_compile in (True, False):
        pa = Parameter(jnp.asarray(RNG.rand(10, 4).astype("f")), True)
        pb = Parameter(jnp.asarray(RNG.rand(10, 4).astype("f")), True)
        sp = SparsityProj([pa, pb], 0.5, jit_compile=jit_compile)
        before = np.asarray(pb.data).copy()
        sp.step(lambda: jnp.sum(pa.value ** 2))
        assert np.array_equal(before, np.asarray(pb.data))
        assert pb.grad is None


def test_betamu_default_arg_capture_not_stale():
    """`lambda V=V: ...` captures via __defaults__, not __closure__; each
    distinct target must get its own compiled entry (code-review r2)."""
    m = NMF((20, 10), 3)
    t = BetaMu(m.parameters(), 2)
    targets = [RNG.rand(20, 10).astype("f") for _ in range(2)]

    # step once per target with the default-arg idiom
    for V in targets:
        t.step(lambda V=V: (V, m(None)))
    assert len(t._step_cache) == 2  # one entry per captured target

    # grads of the last step must reflect the LAST target, not the first
    ref = NMF(W=np.asarray(m.W.data), H=np.asarray(m.H.data))
    # recompute one more step against target[1] both ways
    t.step(lambda V=targets[1]: (V, m(None)))
    tb = BetaMu(ref.parameters(), 2, jit_compile=False)
    tb.step(lambda: (targets[1], ref(None)))
    assert float(jnp.abs(m.W.data - ref.W.data).max()) < 1e-5


def test_betamu_rebound_nonoptimized_param_not_stale():
    """Rebinding a frozen parameter's .data between steps must retrace
    instead of reusing the baked constant (code-review r2)."""
    m = NMF((20, 10), 3)
    m.W.requires_grad = False
    target = RNG.rand(20, 10).astype("f")
    t = BetaMu(m.parameters(), 1)

    t.step(lambda: (target, m(None)))
    H_after_first = np.asarray(m.H.data).copy()

    m.W.data = jnp.asarray(RNG.rand(10, 3).astype("f") + 0.5)  # rebind frozen W
    t.step(lambda: (target, m(None)))

    ref = NMF(W=np.asarray(m.W.data), H=H_after_first)
    ref.W.requires_grad = False
    tb = BetaMu(ref.parameters(), 1, jit_compile=False)
    tb.step(lambda: (target, ref(None)))
    assert float(jnp.abs(m.H.data - ref.H.data).max()) < 1e-5


def _clone_chain(seed):
    pnt.manual_seed(seed)
    return pnt.Sequential(
        NMF((60, 12), rank=6),
        NMF(W=(24, 12)),
        NMF(W=(40, 24)),
    )


def test_betamu_run_matches_repeated_step():
    """run(c, n) reproduces n step(c) calls exactly, including the final
    sweep's .grad observable, and one compilation serves every n."""
    target = RNG.rand(60, 40).astype("f")

    m_step = _clone_chain(3)
    m_run = _clone_chain(3)
    for ps, pr in zip(m_step.parameters(), m_run.parameters()):
        np.testing.assert_array_equal(ps.data, pr.data)

    t_step = BetaMu(m_step.parameters(), 1)
    t_run = BetaMu(m_run.parameters(), 1)

    def c_step():
        return target, m_step(None)

    def c_run():
        return target, m_run(None)

    for n in (1, 4):
        for _ in range(n):
            t_step.step(c_step)
        t_run.run(c_run, n)
        for ps, pr in zip(m_step.parameters(), m_run.parameters()):
            np.testing.assert_allclose(
                np.asarray(ps.data), np.asarray(pr.data), rtol=1e-6, atol=0
            )
            np.testing.assert_allclose(
                np.asarray(ps.grad), np.asarray(pr.grad), rtol=1e-6, atol=1e-6
            )
    # dynamic step count: both n values share one compiled "run" entry
    assert sum(1 for k in t_run._step_cache if k[0] == "run") == 1


def test_betamu_run_zero_and_negative_steps():
    m = _clone_chain(5)
    trainer = BetaMu(m.parameters(), 1)
    target = RNG.rand(60, 40).astype("f")

    def closure():
        return target, m(None)

    before = [np.asarray(p.data).copy() for p in m.parameters()]
    assert trainer.run(closure, 0) is None
    for b, p in zip(before, m.parameters()):
        np.testing.assert_array_equal(b, np.asarray(p.data))
    with pytest.raises(ValueError):
        trainer.run(closure, -1)


def test_betamu_run_eager_fallback():
    """A non-introspectable closure (no __code__) falls back to looped
    eager steps with identical trajectories."""
    import functools

    target = RNG.rand(60, 40).astype("f")
    m_step = _clone_chain(7)
    m_run = _clone_chain(7)
    t_step = BetaMu(m_step.parameters(), 1)
    t_run = BetaMu(m_run.parameters(), 1)

    def base(model, trainer):
        trainer.zero_grad()
        return target, model(None)

    c_step = functools.partial(base, m_step, t_step)
    c_run = functools.partial(base, m_run, t_run)
    assert not hasattr(c_run, "__code__")

    for _ in range(3):
        t_step.step(c_step)
    t_run.run(c_run, 3)
    for ps, pr in zip(m_step.parameters(), m_run.parameters()):
        np.testing.assert_allclose(
            np.asarray(ps.data), np.asarray(pr.data), rtol=1e-6, atol=0
        )


@pytest.mark.slow
def test_sparsityproj_run_matches_repeated_step():
    """run matches repeated step including the cross-step lr schedule and
    the returned final loss."""
    target = RNG.rand(80, 30).astype("f")

    pnt.manual_seed(13)
    m_step = NMF((80, 30), rank=5)
    pnt.manual_seed(13)
    m_run = NMF((80, 30), rank=5)

    t_step = SparsityProj([m_step.W], 0.3, max_iter=5)
    t_run = SparsityProj([m_run.W], 0.3, max_iter=5)

    def c_step():
        return beta_div(m_step(None), target)

    def c_run():
        return beta_div(m_run(None), target)

    losses = [t_step.step(c_step) for _ in range(4)]
    loss_run = t_run.run(c_run, 4)
    np.testing.assert_allclose(
        float(losses[-1]), float(loss_run), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m_step.W.data), np.asarray(m_run.W.data),
        rtol=1e-6, atol=0,
    )
    np.testing.assert_allclose(
        t_step.param_groups[0]["lr"], t_run.param_groups[0]["lr"], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m_step.W.grad), np.asarray(m_run.W.grad),
        rtol=1e-6, atol=1e-7,
    )


def test_closure_fingerprint_tracks_bound_method_state():
    """Bound-method closures capture through the instance, not cells:
    rebinding an instance attribute between steps must miss the compiled
    cache (regression: the key was just the code object, so a rebound
    target replayed a sweep with the old array baked in)."""
    import jax.numpy as jnp

    from pytorch_nmf_tpu.trainer import _closure_fingerprint

    class Holder:
        def __init__(self, V):
            self.V = V

        def closure(self):
            return self.V

    h = Holder(jnp.ones(3))
    k1, _ = _closure_fingerprint(h.closure)
    k1b, _ = _closure_fingerprint(h.closure)
    assert k1 == k1b  # unchanged state hits the cache
    h.V = jnp.zeros(3)
    k2, _ = _closure_fingerprint(h.closure)
    assert k1 != k2  # rebinding the captured target misses it

    h2 = Holder(jnp.ones(3))
    k3, _ = _closure_fingerprint(h2.closure)
    assert k3 != k1  # a different instance is a different capture
