r"""Reconstruction primitives for all model families.

These are the forward maps :math:`(H, W[, Z]) \mapsto \hat V` expressed
directly in XLA ops that tile onto the TPU MXU:

* ``linear``      — :math:`H W^\top` via ``lax.dot_general``
  (the reference uses ``F.linear``; nmf.py:693).
* ``deconv1d/2d/3d`` — "full"-padded correlation with a flipped kernel,
  i.e. true convolution, via ``lax.conv_general_dilated``
  (the reference uses ``F.convNd(H, W.flip(...), padding=k-1)``;
  nmf.py:779,864,941 / plca.py:449,524,604).

Each function is pure and jittable; the MU engine differentiates them with
``jax.vjp`` so the numerator/denominator contractions come out as transposed
GEMMs / transposed convolutions — also MXU ops.

Shapes follow the reference convention:
  1-D: ``H (N, R, L)``, ``W (C, R, T)``      → ``(N, C, L + T - 1)``
  2-D: ``H (N, R, L, M)``, ``W (C, R, kh, kw)`` → ``(N, C, L+kh-1, M+kw-1)``
  3-D: analogous with three spatial dims.
"""

from functools import partial

import jax.numpy as jnp
from jax import lax

from ..module import as_array

__all__ = ["linear", "deconv1d", "deconv2d", "deconv3d", "scaled_kernel"]


def acc_type(*xs):
    """Accumulation dtype: float32 everywhere (bf16 operands still
    accumulate in f32 on the MXU), EXCEPT when an operand is float64 —
    the x64-CPU double-precision mode (reference honors input dtype,
    torchnmf/nmf.py:215) must not truncate its accumulations."""
    for x in xs:
        if x.dtype == jnp.float64:
            return jnp.float64
    return jnp.float32


def linear(H, W, *, precision=None):
    """``H @ W.T`` on the MXU with float32 accumulation."""
    H = as_array(H)
    W = as_array(W)
    return lax.dot_general(
        H,
        W,
        dimension_numbers=(((H.ndim - 1,), (1,)), ((), ())),
        precision=precision,
        preferred_element_type=acc_type(H, W),
    )


def scaled_kernel(W, Z, spatial_ndim: int):
    """``W * Z`` broadcast over spatial dims — used by the SIPLCA family.

    ``W`` has layout ``(C, R, *spatial)`` and Z is ``(R,)``; the reference
    computes ``W.flip(...) * Z.view(-1, 1, ...)`` (plca.py:449,524,604).
    Flipping happens inside the deconv helpers, so here we only rescale.
    """
    W = as_array(W)
    Z = as_array(Z)
    return W * Z.reshape((1, -1) + (1,) * spatial_ndim)


def _deconv1d_patch_gemm(H, W):
    """1-D full convolution as an im2col GEMM.

    For the low-rank/long-kernel NMFD regime (e.g. the reference's librosa
    workload: R=3, T=400 over thousands of frames) the convolution's tiny
    channel dimension starves the MXU; gathering H into (L, R·T) patches and
    running one fat GEMM measured ~27% faster per MU iteration on TPU v5e.
    Numerically identical to the conv path to float32 rounding (~3e-7 rel).
    """
    n, r, li = H.shape
    c, _, t = W.shape
    Hp = jnp.pad(H, ((0, 0), (0, 0), (t - 1, t - 1)))
    # patches[n, l, r, tau] = Hp[n, r, l + (t-1) - tau]  (true convolution)
    idx = jnp.arange(li + t - 1)[:, None] + jnp.arange(t)[None, ::-1]
    P = Hp[:, :, idx]  # (n, r, L_out, t)
    P = P.transpose(0, 2, 1, 3).reshape(n, li + t - 1, r * t)
    return jnp.einsum(
        "nlk,ck->ncl", P, W.reshape(c, r * t),
        preferred_element_type=acc_type(P, W),
    )


# patch-GEMM pays off when the conv channel dims are MXU-hostile and the
# patch tensor stays small; otherwise XLA's native conv wins
_PATCH_GEMM_MAX_RT = 8192
_PATCH_GEMM_MAX_BYTES = 256 * 1024 * 1024


def _deconv(H, W, spatial_ndim: int):
    """Full-padded true convolution shared by the 1/2/3-D variants.

    ``lax.conv_general_dilated`` computes cross-correlation (like torch's
    ``F.convNd``); flipping the kernel over its spatial dims turns it into
    convolution, and SAME-most "full" padding ``k - 1`` grows the output to
    ``L_in + k - 1`` — matching the reference reconstruction exactly.
    1-D reconstructions in the low-rank/long-kernel regime reroute to the
    im2col GEMM formulation above.
    """
    H = as_array(H)
    W = as_array(W)
    if spatial_ndim == 1:
        n, r, li = H.shape
        t = W.shape[2]
        rt = r * t
        patch_bytes = H.dtype.itemsize * n * (li + t - 1) * rt
        if (
            r < 16
            and t >= 64
            and rt <= _PATCH_GEMM_MAX_RT
            and patch_bytes <= _PATCH_GEMM_MAX_BYTES
        ):
            return _deconv1d_patch_gemm(H, W)
    spatial = tuple(range(2, 2 + spatial_ndim))
    Wf = jnp.flip(W, axis=spatial)
    pads = [(W.shape[d] - 1, W.shape[d] - 1) for d in spatial]
    # Layouts: H is (N, R, *spatial) = NC...; W is (C, R, *spatial) = OI...
    letters = "DHW"[-spatial_ndim:]
    dn = lax.conv_dimension_numbers(
        H.shape, Wf.shape, ("NC" + letters, "OI" + letters, "NC" + letters)
    )
    return lax.conv_general_dilated(
        H,
        Wf,
        window_strides=(1,) * spatial_ndim,
        padding=pads,
        dimension_numbers=dn,
        preferred_element_type=acc_type(H, W),
    )


deconv1d = partial(_deconv, spatial_ndim=1)
deconv2d = partial(_deconv, spatial_ndim=2)
deconv3d = partial(_deconv, spatial_ndim=3)
