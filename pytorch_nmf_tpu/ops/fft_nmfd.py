r"""FFT-domain MU updaters for 1-D deconvolutional NMF at β = 2.

The β=2 MU contractions for NMFD are all correlations/convolutions along
the time axis (reference nmf.py:700-779 reaches them through conv1d
autograd):

    WH            = H *τ W                    (linear convolution)
    neg_W[c,r,τ]  = Σ_{n,m} H[n,r,m] V[n,c,m+τ]       (correlation)
    pos_W[c,r,τ]  = Σ_{n,m} H[n,r,m] WH[n,c,m+τ]
    neg_H[n,r,m]  = Σ_{c,τ} W[c,r,τ] V[n,c,m+τ]
    pos_H[n,r,m]  = Σ_{c,τ} W[c,r,τ] WH[n,c,m+τ]

In the time domain the patch-GEMM formulation (:mod:`.fast_nmfd`) costs
``O(L · T·R · C)`` per contraction — at the flagship scale (C=1025, R=88,
T=400, L=5000) four such GEMMs ≈ 1.4 TFLOP per iteration.  Diagonalizing
the τ-Toeplitz structure with FFTs collapses every contraction to an
``O(F · R · C)`` per-frequency product (F ≈ L): ~30 GFLOP of cross-spectra
plus the transforms — the β=2 analog of the dense Gram re-association,
where the MXU batches the per-frequency GEMMs and the elementwise β=2
cotangents (neg ← V, pos ← WH; reference nmf.py:62-63) need no
time-domain reconstruction at all.

Only β = 2 qualifies: every other β applies a nonlinearity to WH
elementwise, which has no frequency-domain form.

Numerics: f32 FFTs introduce ~1e-6-relative rounding versus the GEMM
order; the path therefore ships **opt-in** (``PNT_NMFD_FFT=1``) so the
default trajectories keep bit-level agreement with the reference-parity
contract.  Correctness is guarded by its own parity tests against the
conv/GEMM formulation.

Aliasing: with ``Nfft ≥ L_out`` every lag read below is a pure linear
correlation — the largest contributing circular index is
``L_in-1 + T-1 = L_out-1 < Nfft``, and negative-lag wraparound at lag τ
would need a contributor ``m ≥ Nfft - τ`` with ``m ≤ L_in-1``, impossible
since ``Nfft - τ > L_out-1 - (T-1) = L_in-1``.
"""

import jax
import jax.numpy as jnp

from ..constants import eps
from .mu import mu_multiplier

__all__ = ["fft_beta2_updater_factory"]


def _nfft(L_out: int) -> int:
    n = 1
    while n < L_out:
        n *= 2
    return n


_FFT_ELEMS_CAP = 1 << 24  # per-dispatch FFT batch bound (compile stall)


def _rfft_capped(x2, n):
    """``rfft`` over the last axis with at most ``_FFT_ELEMS_CAP`` total
    elements per dispatch — the remote TPU compiler stalls INDEFINITELY
    on larger batched FFT lowerings (measured: 33M elements never
    finished, 16.6M compiled in ~6 s; same bound as :func:`_c_chunk`).
    ``x2`` is 2-D ``(batch, L)``; the chunk count is static."""
    cap = max(_FFT_ELEMS_CAP // n, 1)
    if x2.shape[0] <= cap:
        return jnp.fft.rfft(x2, n=n, axis=-1)
    return jnp.concatenate([
        jnp.fft.rfft(x2[i:i + cap], n=n, axis=-1)
        for i in range(0, x2.shape[0], cap)
    ], axis=0)


def _irfft_capped(x2, n):
    """Inverse twin of :func:`_rfft_capped` (same per-dispatch bound)."""
    cap = max(_FFT_ELEMS_CAP // n, 1)
    if x2.shape[0] <= cap:
        return jnp.fft.irfft(x2, n=n, axis=-1)
    return jnp.concatenate([
        jnp.fft.irfft(x2[i:i + cap], n=n, axis=-1)
        for i in range(0, x2.shape[0], cap)
    ], axis=0)


def _spec_h(H, n):
    N, R, L = H.shape
    return _rfft_capped(H.reshape(N * R, L), n).reshape(N, R, -1)


def _wh_spec(Hf, Wf):
    # (N, R, F) x (C, R, F) -> (N, C, F)
    return jnp.einsum("nrf,crf->ncf", Hf, Wf)


def _corr_w(Hf, Xf, T):
    """``out[c,r,τ] = Σ_{n,m} H[n,r,m] X[n,c,m+τ]`` for τ ∈ [0, T)."""
    F = jnp.einsum("nrf,ncf->crf", jnp.conj(Hf), Xf)
    n = 2 * (Hf.shape[-1] - 1)
    return jnp.fft.irfft(F, n=n, axis=-1)[..., :T]


def _c_chunk(C: int, R: int, F: int, N: int = 1) -> int:
    """Channel-chunk size keeping the per-chunk kernel spectrum
    ``(Cb, R, F)`` complex64 around ~``PNT_FFT_CHUNK_MB`` (default 256 MB)
    — the full (C, R, F) spectrum at the flagship scale is ~3 GB and OOMs
    HBM.

    Additionally caps the per-dispatch FFT batch at ``2^24`` total
    elements (``cb·R·Nfft``): the TPU compiler was measured to stall
    indefinitely lowering a 4048-transform batch at Nfft=8192 (33M
    elements) while 2024 transforms (16.6M) compile in ~6 s — this cap is
    what lets the flagship C=1025/L=5000 config compile at all
    (VERDICT r2 item 2)."""
    import os

    mb = int(os.environ.get("PNT_FFT_CHUNK_MB", 256))
    budget = mb * 1024**2 // 16  # complex64 + one live irfft buffer
    n = 2 * (F - 1)
    # both per-chunk FFT batches are bounded: the kernel chunk runs cb*R
    # transforms, the target chunk N*cb — the larger of the two decides
    compile_cap = max(_FFT_ELEMS_CAP // max(max(R, N) * n, 1), 1)
    cb = max(min(budget // max(R * F, 1), compile_cap), 1)
    return min(cb, C)


def fft_beta2_updater_factory(gamma, l1_reg, l2_reg):
    """β=2 NMFD updaters in the frequency domain (3-tuple updater
    protocol — factors stay in model layout).

    The channel axis streams through a ``lax.scan`` so the kernel
    spectrum never materializes whole: each chunk transforms its
    ``W[c_blk]``, forms its reconstruction spectrum ``WHf_c`` and
    cross-spectra against the shared activation/target spectra, and
    inverse-transforms its own complete ``neg``/``pos`` slices (the
    multiplier applies per chunk on the W side; the H side accumulates
    the channel-summed spectra)."""
    from jax import lax

    def _specs(V, W, H):
        n = _nfft(V.shape[-1])
        C, R = W.shape[0], W.shape[1]
        cb = _c_chunk(C, R, n // 2 + 1, V.shape[0])
        n_ch = -(-C // cb)
        pad = n_ch * cb - C
        Wp = jnp.pad(W, ((0, pad), (0, 0), (0, 0))) if pad else W
        Vp = jnp.pad(V, ((0, 0), (0, pad), (0, 0))) if pad else V
        Hf = _spec_h(H, n)
        return n, cb, n_ch, pad, Wp, Vp, Hf

    def upd_W(V, W, H):
        T = W.shape[-1]
        n, cb, n_ch, pad, Wp, Vp, Hf = _specs(V, W, H)

        def chunk(carry, inp):
            Wc, Vc = inp  # (cb, R, T), (N, cb, L_out)
            Wfc = jnp.fft.rfft(Wc, n=n, axis=-1)
            Vfc = jnp.fft.rfft(Vc, n=n, axis=-1)
            WHfc = _wh_spec(Hf, Wfc)  # (N, cb, F)
            neg = jax.nn.relu(_corr_w(Hf, Vfc, T)) + eps
            pos = jax.nn.relu(_corr_w(Hf, WHfc, T)) + eps
            return carry, Wc * mu_multiplier(
                neg, pos, Wc, gamma, l1_reg, l2_reg
            )

        _, W_new = lax.scan(
            chunk, 0,
            (
                Wp.reshape(n_ch, cb, *W.shape[1:]),
                jnp.moveaxis(
                    Vp.reshape(V.shape[0], n_ch, cb, V.shape[-1]), 0, 1
                ),
            ),
        )
        out = W_new.reshape(-1, *W.shape[1:])
        return out[: W.shape[0]] if pad else out

    def upd_H(V, W, H):
        L_in = H.shape[-1]
        n, cb, n_ch, pad, Wp, Vp, Hf = _specs(V, W, H)
        F = n // 2 + 1
        N, R = H.shape[0], H.shape[1]

        def chunk(carry, inp):
            negf, posf = carry
            Wc, Vc = inp
            Wfc = jnp.fft.rfft(Wc, n=n, axis=-1)
            Vfc = jnp.fft.rfft(Vc, n=n, axis=-1)
            WHfc = _wh_spec(Hf, Wfc)
            negf = negf + jnp.einsum("crf,ncf->nrf", jnp.conj(Wfc), Vfc)
            posf = posf + jnp.einsum("crf,ncf->nrf", jnp.conj(Wfc), WHfc)
            return (negf, posf), None

        z = jnp.zeros((N, R, F), jnp.complex64)
        (negf, posf), _ = lax.scan(
            chunk, (z, z),
            (
                Wp.reshape(n_ch, cb, *W.shape[1:]),
                jnp.moveaxis(
                    Vp.reshape(N, n_ch, cb, V.shape[-1]), 0, 1
                ),
            ),
        )
        def _inv(xf):
            out = _irfft_capped(xf.reshape(N * R, F), n)
            return out.reshape(N, R, -1)[..., :L_in]

        neg = jax.nn.relu(_inv(negf)) + eps
        pos = jax.nn.relu(_inv(posf)) + eps
        return H * mu_multiplier(neg, pos, H, gamma, l1_reg, l2_reg)

    def loss_terms(V, W, H):
        from ..metrics import beta_div

        n, cb, n_ch, pad, Wp, Vp, Hf = _specs(V, W, H)
        L_out = V.shape[-1]

        def chunk(carry, inp):
            Wc, Vc = inp
            Wfc = jnp.fft.rfft(Wc, n=n, axis=-1)
            WH_c = jnp.fft.irfft(
                _wh_spec(Hf, Wfc), n=n, axis=-1
            )[..., :L_out]
            return carry + beta_div(WH_c, Vc, 2.0), None

        total, _ = lax.scan(
            chunk, jnp.float32(0.0),
            (
                Wp.reshape(n_ch, cb, *W.shape[1:]),
                jnp.moveaxis(
                    Vp.reshape(V.shape[0], n_ch, cb, V.shape[-1]), 0, 1
                ),
            ),
        )
        return total

    return upd_W, upd_H, loss_terms
