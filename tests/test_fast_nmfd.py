"""Unfold-GEMM NMFD updaters: patch/fold correctness and trajectory parity
with the conv (generic VJP) engine."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_nmf_tpu.nmf import NMFD
from pytorch_nmf_tpu.ops import recon as _recon
from pytorch_nmf_tpu.ops.fast_nmfd import (
    _w2,
    nmfd_unfold_supported,
    unfold_patches,
)

RNG = np.random.RandomState(77)


def test_unfold_reconstruction_matches_conv():
    N, C, L_out, R, T = 2, 9, 41, 5, 6
    H = jnp.asarray(RNG.rand(N, R, L_out - T + 1).astype("f"))
    W = jnp.asarray(RNG.rand(C, R, T).astype("f"))
    P = unfold_patches(H, T)
    WH2 = P @ _w2(W)  # (N, L_out, C)
    ref = _recon.deconv1d(H, W)  # (N, C, L_out)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(WH2, 1, 2)), np.asarray(ref), rtol=2e-5
    )


def test_unfold_gating():
    assert nmfd_unfold_supported((1, 10, 100), (10, 4, 8))
    assert not nmfd_unfold_supported((1, 10, 100), (10, 4, 1))  # T=1
    os.environ["PNT_NMFD_UNFOLD_MAX_BYTES"] = "16"
    try:
        assert not nmfd_unfold_supported((1, 10, 100), (10, 4, 8))
    finally:
        os.environ.pop("PNT_NMFD_UNFOLD_MAX_BYTES", None)


@pytest.mark.parametrize("beta", [0.5, 1, 2])
def test_unfold_fit_matches_conv_fit(beta):
    N, C, L_out, R, T = 2, 12, 50, 4, 7
    V = RNG.rand(N, C, L_out).astype("f")
    W0 = RNG.rand(C, R, T).astype("f") + 0.1
    H0 = RNG.rand(N, R, L_out - T + 1).astype("f") + 0.1

    a = NMFD(W=W0, H=H0)  # unfold path (default)
    na = a.fit(V, beta, 1e-4, 30)

    os.environ["PNT_NMFD_UNFOLD"] = "0"
    try:
        b = NMFD(W=W0, H=H0)  # conv / generic VJP path
        nb = b.fit(V, beta, 1e-4, 30)
    finally:
        os.environ.pop("PNT_NMFD_UNFOLD", None)

    assert na == nb
    assert float(jnp.abs(a.W.data - b.W.data).max()) < 5e-5
    assert float(jnp.abs(a.H.data - b.H.data).max()) < 5e-5


def test_oversized_patch_falls_back_in_trace():
    """Shapes exceeding the budget run the generic engine inside the same
    factory — results must still be correct."""
    N, C, L_out, R, T = 1, 6, 30, 3, 5
    V = RNG.rand(N, C, L_out).astype("f")
    W0 = RNG.rand(C, R, T).astype("f") + 0.1
    H0 = RNG.rand(N, R, L_out - T + 1).astype("f") + 0.1

    os.environ["PNT_NMFD_UNFOLD_MAX_BYTES"] = "64"  # force in-trace fallback
    try:
        a = NMFD(W=W0, H=H0)
        a.fit(V, 1, 1e-4, 10)
    finally:
        os.environ.pop("PNT_NMFD_UNFOLD_MAX_BYTES", None)
    b = NMFD(W=W0, H=H0)
    b.fit(V, 1, 1e-4, 10)
    assert float(jnp.abs(a.W.data - b.W.data).max()) < 5e-5


def test_unfold_reconstruction_matches_conv_2d():
    from pytorch_nmf_tpu.ops.fast_nmfd import unfold_patches_nd

    N, C, R = 2, 7, 3
    kh, kw = 3, 4
    S_in = (10, 11)
    H = jnp.asarray(RNG.rand(N, R, *S_in).astype("f"))
    W = jnp.asarray(RNG.rand(C, R, kh, kw).astype("f"))
    P = unfold_patches_nd(H, (kh, kw))
    WH2 = (P @ _w2(W)).reshape(N, S_in[0] + kh - 1, S_in[1] + kw - 1, C)
    ref = _recon.deconv2d(H, W)  # (N, C, ...)
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(WH2, -1, 1)), np.asarray(ref), rtol=2e-5
    )


@pytest.mark.parametrize("beta", [1, 2])
def test_unfold_fit_matches_conv_fit_2d(beta):
    from pytorch_nmf_tpu.nmf import NMF2D

    N, C = 1, 6
    kh, kw = 3, 3
    Ly, Lx = 14, 12
    V = RNG.rand(N, C, Ly, Lx).astype("f")
    W0 = RNG.rand(C, 4, kh, kw).astype("f") + 0.1
    H0 = RNG.rand(N, 4, Ly - kh + 1, Lx - kw + 1).astype("f") + 0.1

    a = NMF2D(W=W0, H=H0)
    na = a.fit(V, beta, 1e-4, 20)
    os.environ["PNT_NMFD_UNFOLD"] = "0"
    try:
        b = NMF2D(W=W0, H=H0)
        nb = b.fit(V, beta, 1e-4, 20)
    finally:
        os.environ.pop("PNT_NMFD_UNFOLD", None)
    assert na == nb
    assert float(jnp.abs(a.W.data - b.W.data).max()) < 5e-5
    assert float(jnp.abs(a.H.data - b.H.data).max()) < 5e-5


def test_unfold_fit_matches_conv_fit_3d():
    from pytorch_nmf_tpu.nmf import NMF3D

    N, C = 1, 4
    k = (2, 3, 2)
    S = (6, 8, 7)
    V = RNG.rand(N, C, *S).astype("f")
    W0 = RNG.rand(C, 3, *k).astype("f") + 0.1
    H0 = RNG.rand(N, 3, *(s - kk + 1 for s, kk in zip(S, k))).astype("f") + 0.1

    a = NMF3D(W=W0, H=H0)
    na = a.fit(V, 1, 1e-4, 15)
    os.environ["PNT_NMFD_UNFOLD"] = "0"
    try:
        b = NMF3D(W=W0, H=H0)
        nb = b.fit(V, 1, 1e-4, 15)
    finally:
        os.environ.pop("PNT_NMFD_UNFOLD", None)
    assert na == nb
    assert float(jnp.abs(a.W.data - b.W.data).max()) < 5e-5
    assert float(jnp.abs(a.H.data - b.H.data).max()) < 5e-5


@pytest.mark.parametrize(
    "C,R,T,L",
    [(12, 4, 5, 40),    # unrolled mode
     (6, 64, 80, 300)],  # streaming mode (T*R > chunk cols)
)
def test_frozen_kernel_bit_exact_through_layout_roundtrip(C, R, T, L):
    """trainable_W=False must leave W bit-identical: the prepare/finish
    GEMM-layout conversion is a pure permutation (pad rows sliced off)."""
    from pytorch_nmf_tpu.nmf import NMFD

    rng = np.random.RandomState(9)
    V = rng.rand(1, C, L).astype("f")
    W0 = rng.rand(C, R, T).astype("f") + 0.1
    H0 = rng.rand(1, R, L - T + 1).astype("f") + 0.1
    m = NMFD(W=W0, H=H0, trainable_W=False)
    m.fit(V, 1, 0, 5)
    assert np.array_equal(np.asarray(m.W.data), W0)


@pytest.mark.parametrize("shapes", [(1, 8, 50, 3, 6), (2, 5, 40, 4, 9)])
def test_fft_beta2_matches_unfold_path(shapes):
    """The opt-in FFT beta=2 NMFD path (PNT_NMFD_FFT=1) must reproduce the
    unfold-GEMM trajectory (frequency-domain rounding only) and make the
    same early-stop decisions."""
    import os

    from pytorch_nmf_tpu.nmf import NMFD

    N, C, L, R, T = shapes
    rng = np.random.RandomState(77)
    V = rng.rand(N, C, L).astype("f")
    a = NMFD(V.shape, R, T=T)
    b = NMFD(V.shape, R, T=T)
    b.load_state_dict(a.state_dict())

    na = a.fit(V, 2, 1e-4, 12)
    os.environ["PNT_NMFD_FFT"] = "1"
    try:
        nb = b.fit(V, 2, 1e-4, 12)
    finally:
        del os.environ["PNT_NMFD_FFT"]
    assert na == nb
    assert float(jnp.abs(a.W.data - b.W.data).max()) < 5e-5
    assert float(jnp.abs(a.H.data - b.H.data).max()) < 5e-5


def test_fft_beta2_resolver_dispatch():
    """PNT_NMFD_FFT selects a distinct factory object (so the toggle lands
    in the solver compile-cache key) and only reroutes beta=2."""
    import os

    from pytorch_nmf_tpu.ops.fast_nmfd import (
        nmfd_fft_updater_factory,
        nmfd_unfold_updater_factory,
        resolve_nmfd_updater_factory,
    )

    assert resolve_nmfd_updater_factory() is nmfd_unfold_updater_factory
    os.environ["PNT_NMFD_FFT"] = "1"
    try:
        assert resolve_nmfd_updater_factory() is nmfd_fft_updater_factory
        assert resolve_nmfd_updater_factory(spatial_ndim=2) is not \
            nmfd_fft_updater_factory
    finally:
        del os.environ["PNT_NMFD_FFT"]


def test_fft_chunk_compile_cap(monkeypatch):
    """Per-dispatch FFT batches are capped at 2^24 elements regardless of
    the byte budget — the bound that keeps the remote TPU compiler from
    stalling on large-batch FFT lowerings (measured: 4048 transforms at
    Nfft=8192 wedged it; <=2024 compile)."""
    from pytorch_nmf_tpu.ops.fft_nmfd import _c_chunk

    monkeypatch.setenv("PNT_FFT_CHUNK_MB", "100000")  # absurd byte budget
    C, R, F = 1025, 88, 4097
    n = 2 * (F - 1)
    cb = _c_chunk(C, R, F)
    assert cb * R * n <= 1 << 24
    # small problems are not restricted below one chunk
    assert _c_chunk(4, 2, 65) == 4


def test_fft_batch_caps_are_exact():
    """Every FFT dispatch in the frequency-domain engine is bounded at
    2^24 elements (larger batched FFT lowerings stall the remote TPU
    compiler indefinitely); the chunked transforms must be exact.
    Regression: only the W-side chunk was capped — the H spectrum and
    the batched-target chunk were single uncapped dispatches."""
    import numpy as np

    from pytorch_nmf_tpu.ops import fft_nmfd

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(7, 50).astype("f"))
    n = 128
    ref = jnp.fft.rfft(x, n=n, axis=-1)
    # force chunking by shrinking the cap
    old = fft_nmfd._FFT_ELEMS_CAP
    fft_nmfd._FFT_ELEMS_CAP = 3 * n
    try:
        out = fft_nmfd._rfft_capped(x, n)
        assert out.shape == ref.shape
        assert float(jnp.abs(out - ref).max()) < 1e-5
        back = fft_nmfd._irfft_capped(ref, n)
        assert float(jnp.abs(back - jnp.fft.irfft(ref, n=n, axis=-1)).max()) \
            < 1e-6
    finally:
        fft_nmfd._FFT_ELEMS_CAP = old
    # the channel chunk bounds BOTH per-chunk batches (kernel cb*R and
    # target N*cb transforms)
    cb = fft_nmfd._c_chunk(4096, 8, 4097, N=100)
    assert max(8, 100) * cb * 8192 <= fft_nmfd._FFT_ELEMS_CAP


# --------------------------------------------------------------------------
# β=2 autocorrelation W denominator (VERDICT r3 item 5)
# --------------------------------------------------------------------------
@pytest.mark.slow
def test_autocorr_gram_matches_naive():
    from pytorch_nmf_tpu.ops.fast_nmfd import (
        _h_autocorr_gram,
        unfold_patches_nd,
    )

    for N, R, T, L_in in [(1, 3, 7, 34), (2, 4, 5, 29), (1, 2, 1, 10)]:
        H = jnp.asarray(RNG.rand(N, R, L_in).astype("f") + 0.1)
        P = unfold_patches_nd(H, (T,))
        G_naive = jnp.einsum("nlk,nlj->kj", P, P)
        G_fast = _h_autocorr_gram(H, T)
        np.testing.assert_allclose(
            np.asarray(G_fast), np.asarray(G_naive), rtol=3e-5, atol=1e-5
        )


def test_autocorr_fit_matches_unfold_fit():
    """The autocorrelation engine is a pure re-association: trajectories
    track the unfold engine to f32 summation order."""
    N, C, L_out, R, T = 2, 12, 50, 4, 7
    V = RNG.rand(N, C, L_out).astype("f")
    W0 = RNG.rand(C, R, T).astype("f") + 0.1
    H0 = RNG.rand(N, R, L_out - T + 1).astype("f") + 0.1

    a = NMFD(W=W0, H=H0)
    na = a.fit(V, 2, 1e-4, 30)

    os.environ["PNT_NMFD_AUTOCORR"] = "1"  # force via resolve_deconv_factory
    try:
        b = NMFD(W=W0, H=H0)
        nb = b.fit(V, 2, 1e-4, 30)
    finally:
        os.environ.pop("PNT_NMFD_AUTOCORR", None)

    assert na == nb
    assert float(jnp.abs(a.W.data - b.W.data).max()) < 5e-5
    assert float(jnp.abs(a.H.data - b.H.data).max()) < 5e-5


def test_autocorr_rejects_non_beta2_and_stream_regime():
    from pytorch_nmf_tpu.ops.fast_nmfd import (
        _CHUNK_COLS,
        nmfd_autocorr_updater_factory,
    )
    from pytorch_nmf_tpu.ops.mu import gamma_from_beta
    from pytorch_nmf_tpu.ops.solver import _normalize_updaters

    with pytest.raises(ValueError):
        nmfd_autocorr_updater_factory(1.0, gamma_from_beta(1.0), 0.0, 0.0)

    # stream-regime shapes (T·R > _CHUNK_COLS) raise at trace time so the
    # autotuner's per-candidate try/except skips the engine
    R, T = 64, (_CHUNK_COLS // 64) + 1
    L_in = T + 10
    V = jnp.asarray(RNG.rand(1, 4, L_in + T - 1).astype("f"))
    W = jnp.asarray(RNG.rand(4, R, T).astype("f") + 0.1)
    H = jnp.asarray(RNG.rand(1, R, L_in).astype("f") + 0.1)
    ups = _normalize_updaters(
        nmfd_autocorr_updater_factory(2.0, gamma_from_beta(2.0), 0.0, 0.0)
    )
    w0, h0 = ups[3](V, W, H)  # prepare (stream layout)
    with pytest.raises(ValueError):
        ups[0](V, w0, h0)


def test_autocorr_is_an_autotune_candidate():
    from pytorch_nmf_tpu.ops.autotune import _candidates

    names = [n for n, _ in _candidates(2.0, 1)]
    assert "autocorr" in names
    assert "autocorr" not in [n for n, _ in _candidates(1.0, 1)]
    assert "autocorr" not in [n for n, _ in _candidates(2.0, 2)]
    os.environ["PNT_NMFD_AUTOCORR"] = "0"
    try:
        assert "autocorr" not in [n for n, _ in _candidates(2.0, 1)]
    finally:
        os.environ.pop("PNT_NMFD_AUTOCORR", None)
