"""Functional API: pure fits and jittable trainer cores must match the
stateful classes / eager trainers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_nmf_tpu as pnt
from pytorch_nmf_tpu import functional as F
from pytorch_nmf_tpu.metrics import beta_div
from pytorch_nmf_tpu.nmf import NMF
from pytorch_nmf_tpu.plca import PLCA
from pytorch_nmf_tpu.trainer import BetaMu

RNG = np.random.RandomState(17)
pnt.manual_seed(17)


def test_nmf_fit_matches_class():
    V = RNG.rand(60, 40).astype("f")
    W0 = RNG.rand(40, 7).astype("f") + 0.1
    H0 = RNG.rand(60, 7).astype("f") + 0.1

    W1, H1, n1 = F.nmf_fit(V, W0, H0, beta=1, tol=0, max_iter=10)

    m = NMF(W=W0, H=H0)
    n2 = m.fit(V, 1, 0, 10)
    assert int(n1) == n2
    assert np.allclose(np.asarray(W1), np.asarray(m.W.data))
    assert np.allclose(np.asarray(H1), np.asarray(m.H.data))


def test_plca_fit_matches_class():
    V = RNG.rand(30, 20).astype("f")
    W0 = RNG.rand(20, 5).astype("f") + 0.1
    H0 = RNG.rand(30, 5).astype("f") + 0.1
    Z0 = np.ones(5, "f") / 5

    m = PLCA(W=W0, H=H0, Z=Z0)
    Wn, Hn, Zn = m.W.data, m.H.data, m.Z.data  # normalized at init
    W1, H1, Z1, n1, norm1 = F.plca_fit(V, Wn, Hn, Zn, tol=0, max_iter=10)

    n2, norm2 = m.fit(V, 0, 10)
    assert np.allclose(np.asarray(W1), np.asarray(m.W.data), atol=1e-6)
    assert np.allclose(np.asarray(Z1), np.asarray(m.Z.data), atol=1e-6)
    assert np.isclose(float(norm1), float(norm2))


@pytest.mark.parametrize("beta", [0.5, 1, 2])
def test_betamu_step_matches_eager_trainer(beta):
    W1 = RNG.rand(20, 4).astype("f") + 0.1
    H1 = RNG.rand(50, 4).astype("f") + 0.1
    W2 = RNG.rand(30, 20).astype("f") + 0.1
    target = RNG.rand(50, 30).astype("f")

    # eager class trainer over a composed model
    m = pnt.Sequential(NMF(W=W1, H=H1), NMF(W=W2))
    trainer = BetaMu(m.parameters(), beta)

    def closure():
        trainer.zero_grad()
        return target, m(None)

    trainer.step(closure)

    # jitted functional core over the same composition
    def predict(params):
        inner = NMF.reconstruct(params["H1"], params["W1"])
        return NMF.reconstruct(inner, params["W2"])

    params = {"W1": jnp.asarray(W1), "H1": jnp.asarray(H1),
              "W2": jnp.asarray(W2)}
    step = jax.jit(
        lambda p, v: F.betamu_step(predict, p, v, beta=beta)
    )
    new_params, grads = step(params, jnp.asarray(target))

    # leaf order: dict keys sorted -> H1, W1, W2; class order: 0.W, 0.H, 1.W.
    # Coordinate order differs, so compare against a matching manual order
    # instead: re-run the functional core leaf-by-leaf in class order.
    params2 = params
    order = ["W1", "H1", "W2"]
    for name in order:
        trainable = {k: k == name for k in params2}
        params2, g = F.betamu_step(
            predict, params2, jnp.asarray(target), beta=beta,
            trainable=trainable,
        )

    eager = dict(m.named_parameters())
    assert np.allclose(
        np.asarray(params2["W1"]), np.asarray(eager["0.W"].data), atol=1e-4
    )
    assert np.allclose(
        np.asarray(params2["H1"]), np.asarray(eager["0.H"].data), atol=1e-4
    )
    assert np.allclose(
        np.asarray(params2["W2"]), np.asarray(eager["1.W"].data), atol=1e-4
    )


def test_betamu_step_grad_observable():
    W0 = RNG.rand(20, 4).astype("f") + 0.1
    H0 = RNG.rand(30, 4).astype("f") + 0.1
    target = jnp.asarray(RNG.rand(30, 20).astype("f"))

    params = {"W": jnp.asarray(W0)}
    predict = lambda p: NMF.reconstruct(jnp.asarray(H0), p["W"])
    _, grads = F.betamu_step(predict, params, target, beta=1.5)
    ref = jax.grad(
        lambda w: beta_div(NMF.reconstruct(jnp.asarray(H0), w), target, 1.5)
    )(jnp.asarray(W0))
    assert np.allclose(np.asarray(grads["W"]), np.asarray(ref), atol=1e-4)


def test_sparsity_proj_step_jittable_and_nonneg():
    W0 = RNG.rand(40, 6).astype("f") + 0.1
    H0 = RNG.rand(50, 6).astype("f") + 0.1
    target = jnp.asarray(RNG.rand(50, 40).astype("f"))

    loss_fn = lambda p: beta_div(NMF.reconstruct(jnp.asarray(H0), p["W"]),
                                 target, 2)
    step = jax.jit(
        lambda p, lr: F.sparsity_proj_step(loss_fn, p, lr, sparsity=0.3)
    )
    params = {"W": jnp.asarray(W0)}
    lr = jnp.float32(1.0)
    for _ in range(3):
        params, lr, loss = step(params, lr)
    assert bool(jnp.all(params["W"] >= 0))
    from pytorch_nmf_tpu.metrics import sparseness

    s = float(sparseness(params["W"][:, 0]))
    assert abs(s - 0.3) < 1e-3


def test_mu_update_exported():
    V = jnp.asarray(RNG.rand(20, 10).astype("f"))
    W0 = jnp.asarray(RNG.rand(10, 3).astype("f") + 0.1)
    H0 = jnp.asarray(RNG.rand(20, 3).astype("f") + 0.1)
    W1 = F.mu_update(lambda w: NMF.reconstruct(H0, w), V, W0, 2.0, 1.0)
    assert W1.shape == W0.shape
    assert bool(jnp.all(W1 >= 0))


def test_pure_call_jittable_betamu():
    """Stateful model -> pure fn -> jitted coordinate-wise MU -> write back."""
    pnt.manual_seed(3)
    m = pnt.Sequential(NMF((40, 8), rank=4), NMF(W=(20, 8)))
    target = jnp.asarray(RNG.rand(40, 20).astype("f"))

    fn, params = m.pure_call()
    step = jax.jit(
        lambda p, v: F.betamu_step(lambda q: fn(q, None), p, v, beta=1)
    )
    for _ in range(5):
        params, grads = step(params, target)
    m.load_params(params)
    for p in m.parameters():
        assert bool(jnp.all(p.data >= 0))
    # forward now reflects the trained params
    out = m(None)
    assert out.shape == (40, 20)


def test_pure_call_matches_forward():
    m = NMF((10, 6), 3)
    fn, params = m.pure_call()
    assert np.allclose(np.asarray(fn(params, None)), np.asarray(m(None)))
    # substitution is by-value: mutating params dict doesn't touch module
    params2 = {k: v * 2 for k, v in params.items()}
    out2 = fn(params2, None)
    assert not np.allclose(np.asarray(out2), np.asarray(m(None)))


def test_functional_fit_validates_inputs():
    V = RNG.rand(20, 10).astype("f")
    V[0, 0] = 0.0
    W0 = RNG.rand(10, 3).astype("f") + 0.1
    H0 = RNG.rand(20, 3).astype("f") + 0.1
    with pytest.raises(ValueError):
        F.nmf_fit(V, W0, H0, beta=0)
    sp = pnt.sparse_from_dense(np.where(V > 0.8, V, 0))
    with pytest.raises(ValueError):
        F.nmf_fit(sp, W0, H0, beta=0)
    with pytest.raises(AssertionError):
        F.nmf_fit(V - 1.0, W0, H0, beta=1)


def test_sparsity_proj_step_all_fail_matches_class():
    """When every backtracking attempt fails, the functional core must end
    in the same state as the class trainer (undo + extra halving)."""
    from pytorch_nmf_tpu.trainer import SparsityProj

    W0 = RNG.rand(30, 4).astype("f") + 0.1
    H0 = RNG.rand(40, 4).astype("f") + 0.1
    target = RNG.rand(40, 30).astype("f")

    m = NMF(W=W0, H=H0)
    tr = SparsityProj([m.W], 0.3, max_iter=3)
    tr.param_groups[0]["lr"] = 1e8  # guarantees failure of all attempts

    def closure():
        tr.zero_grad()
        return beta_div(m(None), target, 2)

    tr.step(closure)

    loss_fn = lambda p: beta_div(
        NMF.reconstruct(jnp.asarray(H0), p["W"]), jnp.asarray(target), 2
    )
    params, lr, _ = F.sparsity_proj_step(
        loss_fn, {"W": jnp.asarray(W0)}, jnp.float32(1e8), sparsity=0.3,
        max_iter=3,
    )
    assert np.isclose(float(lr), tr.param_groups[0]["lr"], rtol=1e-6)
    assert np.allclose(
        np.asarray(params["W"]), np.asarray(m.W.data), rtol=1e-4, atol=1e-4
    )


def test_nmf_hoyer_fit_matches_class():
    V = RNG.rand(60, 40).astype("f")
    W0 = RNG.rand(40, 5).astype("f") + 0.1
    H0 = RNG.rand(60, 5).astype("f") + 0.1

    W1, H1, n1 = F.nmf_hoyer_fit(V, W0, H0, beta=2, max_iter=8, sW=0.4)

    m = NMF(W=W0, H=H0)
    n2 = m.sparse_fit(V, 2, 8, False, 0.4, None)
    assert int(n1) == n2
    assert np.allclose(np.asarray(W1), np.asarray(m.W.data), atol=1e-6)
    assert np.allclose(np.asarray(H1), np.asarray(m.H.data), atol=1e-6)


def test_vmapped_batched_fits():
    """Many small factorizations in one compiled program: vmap over the
    functional solver; lax.while_loop batching gives per-problem early
    stopping semantics for free."""
    from pytorch_nmf_tpu.ops.solver import get_dense_fit

    B, M, K, R = 4, 30, 20, 3
    Vs = jnp.asarray(RNG.rand(B, M, K).astype("f"))
    W0 = jnp.asarray(RNG.rand(B, K, R).astype("f") + 0.1)
    H0 = jnp.asarray(RNG.rand(B, M, R).astype("f") + 0.1)

    fit = get_dense_fit(NMF.reconstruct, 2.0, 1e-3, 200, True, True, 0.0, 0.0)
    Wb, Hb, n_iters = jax.vmap(fit)(Vs, W0, H0)
    assert Wb.shape == (B, K, R) and n_iters.shape == (B,)

    # each lane must match its own single fit (including its n_iter)
    for b in range(B):
        Wr, Hr, nr = fit(Vs[b], W0[b], H0[b])
        assert int(n_iters[b]) == int(nr)
        assert float(jnp.abs(Wb[b] - Wr).max()) < 1e-5


def test_batched_fit_matches_individual_fits():
    """Per-problem trajectories and early-stop counts in the batched fit
    must equal running each problem alone."""
    import pytorch_nmf_tpu.functional as F
    from pytorch_nmf_tpu.nmf import NMF

    rng = np.random.RandomState(21)
    B, M, K, R = 3, 40, 25, 4
    V = rng.rand(B, M, K).astype("f")
    # make problems converge at different times: one trivially easy
    W0 = rng.rand(B, K, R).astype("f") + 0.1
    H0 = rng.rand(B, M, R).astype("f") + 0.1
    V[0] = (H0[0] @ W0[0].T) * 1.0001  # near-exact -> stops early

    for beta in (1, 2):
        Wb, Hb, n_b = F.nmf_fit_batched(V, W0, H0, beta=beta, tol=1e-4,
                                        max_iter=100)
        for b in range(B):
            m = NMF(W=W0[b], H=H0[b])
            n_ref = m.fit(V[b], beta, 1e-4, 100)
            assert int(n_b[b]) == n_ref, (beta, b, int(n_b[b]), n_ref)
            assert float(jnp.abs(Wb[b] - m.W.data).max()) < 5e-5
            assert float(jnp.abs(Hb[b] - m.H.data).max()) < 5e-5


def test_batched_fit_deconv_model():
    import pytorch_nmf_tpu.functional as F
    from pytorch_nmf_tpu.nmf import NMFD

    rng = np.random.RandomState(22)
    B, N, C, L_out, R, T = 2, 1, 6, 20, 3, 4
    V = rng.rand(B, N, C, L_out).astype("f")
    W0 = rng.rand(B, C, R, T).astype("f") + 0.1
    H0 = rng.rand(B, N, R, L_out - T + 1).astype("f") + 0.1
    Wb, Hb, n_b = F.nmf_fit_batched(V, W0, H0, beta=1, tol=0, max_iter=10,
                                    model_cls=NMFD)
    import os
    os.environ["PNT_NMFD_UNFOLD"] = "0"
    try:
        for b in range(B):
            m = NMFD(W=W0[b], H=H0[b])
            m.fit(V[b], 1, 0, 10)
            assert float(jnp.abs(Wb[b] - m.W.data).max()) < 5e-5
    finally:
        os.environ.pop("PNT_NMFD_UNFOLD", None)


@pytest.mark.slow
def test_streaming_fit_matches_in_memory():
    """Row-block streaming must reproduce the in-memory trajectory and
    early-stop count (V provided as an np.memmap)."""
    import tempfile

    import pytorch_nmf_tpu.functional as F
    from pytorch_nmf_tpu.nmf import NMF

    rng = np.random.RandomState(31)
    M, K, R = 90, 40, 5
    V = rng.rand(M, K).astype("f")
    W0 = rng.rand(K, R).astype("f") + 0.1
    H0 = rng.rand(M, R).astype("f") + 0.1

    with tempfile.NamedTemporaryFile(suffix=".dat") as f:
        mm = np.memmap(f.name, dtype="float32", mode="w+", shape=(M, K))
        mm[:] = V
        mm.flush()

        for beta in (1, 2):
            Ws, Hs, ns = F.streaming_nmf_fit(
                mm, W0, H0, beta=beta, tol=1e-4, max_iter=60, row_block=32
            )
            m = NMF(W=W0, H=H0)
            n_ref = m.fit(V, beta, 1e-4, 60)
            assert ns == n_ref, (beta, ns, n_ref)
            assert float(jnp.abs(Ws - m.W.data).max()) < 5e-5
            assert float(jnp.abs(Hs - m.H.data).max()) < 5e-5


def test_batched_plca_matches_individual():
    import pytorch_nmf_tpu.functional as F
    from pytorch_nmf_tpu.plca import PLCA

    rng = np.random.RandomState(41)
    B, M, K, R = 3, 30, 20, 4
    V = rng.rand(B, M, K).astype("f")
    W0 = rng.rand(B, K, R).astype("f")
    W0 /= W0.sum(axis=1, keepdims=True)
    H0 = rng.rand(B, M, R).astype("f")
    H0 /= H0.sum(axis=1, keepdims=True)
    Z0 = np.full((B, R), 1.0 / R, "f")

    Wb, Hb, Zb, n_b, norm_b = F.plca_fit_batched(
        V, W0, H0, Z0, tol=1e-4, max_iter=100
    )
    for b in range(B):
        m = PLCA(W=W0[b], H=H0[b], Z=Z0[b])
        n_ref, norm_ref = m.fit(V[b], 1e-4, 100)
        assert int(n_b[b]) == n_ref, (b, int(n_b[b]), n_ref)
        assert abs(float(norm_b[b]) - float(norm_ref)) < 1e-3
        assert float(jnp.abs(Wb[b] - m.W.data).max()) < 5e-5
        assert float(jnp.abs(Zb[b] - m.Z.data).max()) < 5e-5


def test_batched_hoyer_matches_individual():
    import pytorch_nmf_tpu.functional as F

    rng = np.random.RandomState(42)
    B, M, K, R = 3, 30, 20, 4
    V = rng.rand(B, M, K).astype("f")
    W0 = rng.rand(B, K, R).astype("f") + 0.1
    H0 = rng.rand(B, M, R).astype("f") + 0.1

    Wb, Hb, n_b = F.nmf_hoyer_fit_batched(
        V, W0, H0, beta=2, max_iter=8, sW=0.4, sH=0.5
    )
    assert n_b.shape == (B,)
    for b in range(B):
        Ws, Hs, ns = F.nmf_hoyer_fit(
            V[b], W0[b], H0[b], beta=2, max_iter=8, sW=0.4, sH=0.5
        )
        assert int(n_b[b]) == int(ns) == 8
        assert float(jnp.abs(Wb[b] - Ws).max()) < 1e-5
        assert float(jnp.abs(Hb[b] - Hs).max()) < 1e-5


def test_batched_hoyer_mixed_constraint():
    """Only one factor constrained: the other takes plain MU steps."""
    import pytorch_nmf_tpu.functional as F

    rng = np.random.RandomState(43)
    B, M, K, R = 2, 24, 16, 3
    V = rng.rand(B, M, K).astype("f")
    W0 = rng.rand(B, K, R).astype("f") + 0.1
    H0 = rng.rand(B, M, R).astype("f") + 0.1

    Wb, Hb, _ = F.nmf_hoyer_fit_batched(V, W0, H0, beta=1, max_iter=6, sW=0.6)
    for b in range(B):
        Ws, Hs, _ = F.nmf_hoyer_fit(
            V[b], W0[b], H0[b], beta=1, max_iter=6, sW=0.6
        )
        assert float(jnp.abs(Wb[b] - Ws).max()) < 1e-5
        assert float(jnp.abs(Hb[b] - Hs).max()) < 1e-5


def test_functional_bf16_factors_promote_to_f32():
    """The functional surface shares the model layer's factor-dtype rule
    (to_param): bf16 W/H promote to f32 instead of type-mismatching the
    f32-pinned solver carries (regression: nmfd_fit with bf16 factors
    crashed at trace time)."""
    import jax.numpy as jnp

    from pytorch_nmf_tpu.functional import nmf_fit, nmf_hoyer_fit, nmfd_fit

    V = RNG.rand(1, 16, 280).astype("f") + 0.01
    W0 = jnp.asarray(RNG.rand(16, 3, 6).astype("f") + 0.1, jnp.bfloat16)
    H0 = jnp.asarray(RNG.rand(1, 3, 275).astype("f") + 0.1, jnp.bfloat16)
    W, H, n = nmfd_fit(V, W0, H0, beta=1, tol=0, max_iter=4)
    assert W.dtype == jnp.float32 and H.dtype == jnp.float32
    assert int(n) == 4 and bool(jnp.all(jnp.isfinite(W)))

    Vd = RNG.rand(40, 30).astype("f") + 0.01
    Wb = jnp.asarray(RNG.rand(30, 4).astype("f") + 0.1, jnp.bfloat16)
    Hb = jnp.asarray(RNG.rand(40, 4).astype("f") + 0.1, jnp.bfloat16)
    W, H, _ = nmf_fit(Vd, Wb, Hb, beta=2, tol=0, max_iter=4)
    assert W.dtype == jnp.float32

    W, H, _ = nmf_hoyer_fit(Vd, Wb, Hb, beta=2, max_iter=3, sW=0.4)
    assert W.dtype == jnp.float32 and bool(jnp.all(jnp.isfinite(H)))
