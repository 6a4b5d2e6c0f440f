"""NMF family: constructor property tests + solver smoke/stability sweeps
(mirrors reference tests/test_nmf.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_nmf_tpu as pnt
from pytorch_nmf_tpu.nmf import NMF, NMF2D, NMF3D, NMFD, BaseComponent

RNG = np.random.RandomState(42)
pnt.manual_seed(42)


@pytest.mark.parametrize("rank", [8])
@pytest.mark.parametrize("W", [(50, 8), RNG.rand(50, 8).astype("f"), None])
@pytest.mark.parametrize("H", [(100, 8), RNG.rand(100, 8).astype("f"), None])
def test_base_valid_construct(rank, W, H):
    m = BaseComponent(rank, W, H)
    if H is None:
        assert m._parameters["H"] is None
    if W is None:
        assert m._parameters["W"] is None


@pytest.mark.parametrize(
    "rank, W, H",
    [
        (None, None, None),
        (None, (50, 8), (100, 10)),
        (None, RNG.rand(50, 8).astype("f"), (100, 10)),
        (None, RNG.randn(50, 8).astype("f"), (100, 8)),
        (None, (50, 8), RNG.rand(100, 10).astype("f")),
        (None, (50, 8), RNG.randn(100, 8).astype("f")),
        (None, RNG.rand(50, 8).astype("f"), RNG.rand(100, 10).astype("f")),
        (None, RNG.randn(50, 8).astype("f"), RNG.rand(100, 8).astype("f")),
        (None, RNG.rand(50, 8).astype("f"), RNG.randn(100, 8).astype("f")),
    ],
)
def test_base_invalid_construct(rank, W, H):
    with pytest.raises(Exception):
        BaseComponent(rank, W, H)


def test_nmf_valid_construct():
    m = NMF((100, 50))
    y = m()
    assert y.shape == (100, 50)


@pytest.mark.parametrize("Vshape", [(100, 50, 50), (100,)])
def test_nmf_invalid_construct(Vshape):
    with pytest.raises(Exception):
        NMF(Vshape)


def test_nmfd_valid_construct():
    m = NMFD((100, 50, 100))
    y = m()
    assert y.shape == (100, 50, 100)


@pytest.mark.parametrize("Vshape", [(100, 50), (100,), (100, 50) * 2])
def test_nmfd_invalid_construct(Vshape):
    with pytest.raises(Exception):
        NMFD(Vshape)


def test_nmf2d_valid_construct():
    m = NMF2D((2, 32, 30, 30), 16)
    y = m()
    assert y.shape == (2, 32, 30, 30)


@pytest.mark.parametrize("Vshape", [(100, 50), (100,), (100, 50) * 6])
def test_nmf2d_invalid_construct(Vshape):
    with pytest.raises(Exception):
        NMF2D(Vshape)


def test_nmf3d_valid_construct():
    m = NMF3D((2, 10, 12, 12, 12), 8)
    y = m()
    assert y.shape == (2, 10, 12, 12, 12)


@pytest.mark.parametrize("Vshape", [(100, 50), (100,), (100, 50) * 4])
def test_nmf3d_invalid_construct(Vshape):
    with pytest.raises(Exception):
        NMF3D(Vshape)


@pytest.mark.parametrize("beta", [-1, 0, 0.5, 1, 1.5, 2, 3])
@pytest.mark.parametrize("alpha, l1_ratio", [(0, 0), (0.1, 0.5)])
def test_fit(beta, alpha, l1_ratio):
    max_iter = 100
    V = RNG.rand(100, 50).astype("f")
    if beta <= 0:
        V = V + 0.01
    m = NMF(V.shape, 8)
    n_iter = m.fit(V, beta, 1e-4, max_iter, False, alpha, l1_ratio)
    assert n_iter <= max_iter
    assert not bool(jnp.any(jnp.isnan(m.W.data)))
    assert not bool(jnp.any(jnp.isnan(m.H.data)))


def test_fit_zero_tol_runs_all_iters():
    V = RNG.rand(60, 40).astype("f")
    m = NMF(V.shape, 8)
    assert m.fit(V, 1, 0, 37) == 37


def test_fit_verbose_smoke(capsys):
    V = RNG.rand(60, 40).astype("f")
    m = NMF(V.shape, 8)
    m.fit(V, 2, 0, 20, True)


def test_fit_beta_le_zero_with_zeros_raises():
    V = np.zeros((10, 10), "f")
    m = NMF(V.shape, 4)
    with pytest.raises(ValueError):
        m.fit(V, beta=0)


def test_fit_frozen_factor_unchanged():
    V = RNG.rand(50, 30).astype("f")
    W0 = RNG.rand(30, 5).astype("f")
    m = NMF(H=(50, 5), W=W0, trainable_W=False)
    m.fit(V, 1, 0, 15)
    assert np.allclose(np.asarray(m.W.data), W0)


@pytest.mark.parametrize("beta", [1, 2])
def test_fit_deconv_models(beta):
    V = RNG.rand(1, 20, 30).astype("f")
    m = NMFD(V.shape, 5, T=4)
    n = m.fit(V, beta, 0, 20)
    assert n == 20
    assert not bool(jnp.any(jnp.isnan(m.W.data)))


@pytest.mark.parametrize("beta", [-1, 0, 0.5, 1, 1.5, 2, 2.5])
@pytest.mark.parametrize("sW, sH", [(None,) * 2, (0.3, None), (None, 0.3)])
def test_sparse_fit(beta, sW, sH):
    max_iter = 20
    V = RNG.rand(100, 50).astype("f")
    if beta <= 0:
        V = V + 0.01
    m = NMF(V.shape, 8)
    n_iter = m.sparse_fit(V, beta, max_iter, False, sW, sH)
    assert n_iter == max_iter
    assert not bool(jnp.any(jnp.isnan(m.W.data)))
    assert not bool(jnp.any(jnp.isnan(m.H.data)))


def test_sparse_fit_achieves_target_sparseness():
    from pytorch_nmf_tpu.metrics import sparseness

    V = RNG.rand(100, 50).astype("f")
    m = NMF(V.shape, 8)
    m.sparse_fit(V, 2, 30, False, 0.5, None)
    for j in range(8):
        s = float(sparseness(m.W.data[:, j]))
        assert abs(s - 0.5) < 1e-3


def test_beta2_early_stop_near_exact_fit():
    """The beta=2 loss path must not produce NaN from float cancellation
    when V is (nearly) exactly factorizable; early stopping must fire."""
    W0 = RNG.rand(40, 4).astype("f") + 0.1
    H0 = RNG.rand(100, 4).astype("f") + 0.1
    V = np.asarray(H0 @ W0.T)  # exactly factorizable
    m = NMF(W=W0 * 1.01, H=H0)
    n = m.fit(V, 2, 1e-4, 200)
    assert n < 200  # converged (NaN losses would never trigger the tol)
    assert not bool(jnp.any(jnp.isnan(m.W.data)))


def test_deconv1d_patch_gemm_matches_conv():
    """The low-rank/long-kernel patch-GEMM rewrite must match the conv path."""
    from pytorch_nmf_tpu.ops.recon import _deconv1d_patch_gemm, deconv1d

    H = jnp.asarray(RNG.rand(2, 3, 300).astype("f"))
    W = jnp.asarray(RNG.rand(7, 3, 100).astype("f"))
    # force both paths explicitly
    got = _deconv1d_patch_gemm(H, W)
    from jax import lax

    Wf = jnp.flip(W, axis=(2,))
    dn = lax.conv_dimension_numbers(H.shape, Wf.shape, ("NCH", "OIH", "NCH"))
    ref = lax.conv_general_dilated(
        H, Wf, (1,), [(99, 99)], dimension_numbers=dn
    )
    assert got.shape == ref.shape
    assert float(jnp.abs(got - ref).max() / jnp.abs(ref).max()) < 1e-5


def test_rank_one_fit():
    V = RNG.rand(40, 30).astype("f")
    m = NMF(V.shape, 1)
    n = m.fit(V, 1, 0, 20)
    assert n == 20 and not bool(jnp.any(jnp.isnan(m.W.data)))


@pytest.mark.parametrize("beta", [1, 2])
def test_bf16_target_storage(beta):
    """A bfloat16 target is preserved (HBM-stream opt-in) and the fit stays
    close to the float32 trajectory."""
    import jax.numpy as jnp

    V = RNG.rand(120, 60).astype("f")
    W0 = RNG.rand(60, 6).astype("f") + 0.1
    H0 = RNG.rand(120, 6).astype("f") + 0.1

    a = NMF(W=W0, H=H0)
    a.fit(jnp.asarray(V, jnp.bfloat16), beta, 0, 30)
    b = NMF(W=W0, H=H0)
    b.fit(V, beta, 0, 30)

    from pytorch_nmf_tpu.metrics import beta_div
    la = float(beta_div(a(), V, beta))
    lb = float(beta_div(b(), V, beta))
    # same optimization result to bf16 input-rounding accuracy
    assert abs(la - lb) / lb < 2e-2, (la, lb)
    assert a.W.data.dtype == jnp.float32  # factors stay f32


def test_bf16_factors_promote_to_f32():
    """bfloat16 is a TARGET-storage knob only: user-supplied bf16 factors
    promote to float32 at Parameter registration (to_param) — bf16 solver
    state would type-mismatch the f32-pinned fast-path loop carries
    (regression: NMFD with bf16 factors crashed in the unfold engine)."""
    import jax.numpy as jnp

    V = RNG.rand(1, 24, 300).astype("f") + 0.01
    W0 = RNG.rand(24, 4, 8).astype("f") + 0.1
    H0 = RNG.rand(1, 4, 293).astype("f") + 0.1

    a = NMFD(W=jnp.asarray(W0, jnp.bfloat16), H=jnp.asarray(H0, jnp.bfloat16))
    assert a.W.data.dtype == jnp.float32
    assert a.H.data.dtype == jnp.float32
    n = a.fit(jnp.asarray(V, jnp.bfloat16), 1, 0, 5)
    assert n == 5 and bool(jnp.all(jnp.isfinite(a.W.data)))

    m = NMF(W=jnp.asarray(RNG.rand(30, 3).astype("f"), jnp.bfloat16),
            H=jnp.asarray(RNG.rand(50, 3).astype("f"), jnp.bfloat16))
    assert m.W.data.dtype == jnp.float32
    m.fit(RNG.rand(50, 30).astype("f"), 2, 0, 5)
    assert bool(jnp.all(jnp.isfinite(m.H.data)))
