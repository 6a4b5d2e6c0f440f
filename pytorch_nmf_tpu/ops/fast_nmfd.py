r"""Unfold-GEMM MU updaters for the 1-D deconvolutional model (NMFD).

XLA's native convolution lowering sustains only a few TF/s on the NMFD MU
workload (C≈1025 channels, rank 3-88, T≈400-frame kernels — the reference's
flagship spectrogram factorization, torchnmf/nmf.py:700-779,
examples/librosa_example.py): the tiny rank-R channel dimension starves the
MXU.  This module reformulates the ENTIRE MU update around the im2col patch
matrix

    P[n, l, (τ·R + r)] = Hpad[n, l - τ, r]          (L_out × T·R)

built from ``T`` static *slices* of the zero-padded activation (a pure
copy — no TPU-hostile gathers), so that every heavy op is a large GEMM with
contraction dimension ``T·R`` or ``L_out``:

    WH      = P @ W2                    (forward reconstruction)
    neg_W   = Pᵀ @ f_β(V, WH)           (kernel cotangent contraction)
    neg_H   = fold(f_β(V, WH) @ W2ᵀ)    (activation cotangent + overlap-add)

with ``W2 = W.transpose(2,1,0).reshape(T·R, C)``.  The fold is ``T`` more
static slice-adds.  All GEMMs tile natively onto the MXU; measured ~15×
faster per MU iteration than the conv formulation at the librosa scale
(R=88, T=400) on TPU v5e, and numerically identical to float32 rounding
(the summation order changes only within dot products).

Selected by :func:`resolve_nmfd_updater_factory` when the patch tensor fits
the configurable memory budget; otherwise the generic VJP/conv engine runs.
"""

import os

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import eps
from .mu import (
    kl_pos_H,
    kl_pos_W,
    mu_cotangents,
    mu_multiplier,
    vma_zeros as _zeros_like_vma,
)

__all__ = [
    "nmfd_unfold_updater_factory",
    "resolve_nmfd_updater_factory",
    "unfold_patches",
    "unfold_deconv",
    "nmfd_unfold_supported",
]

_DEFAULT_MAX_BYTES = 2 * 1024**3
# 2 GiB was tuned on a 16 GB v5e; scale with the real HBM limit when the
# runtime exposes it (ops/budget.py)
_UNFOLD_HBM_FRACTION = 0.125


def nmfd_unfold_supported(V_shape, W_shape) -> bool:
    """Whether the patch tensor for these shapes fits the memory budget.

    Accepts any spatial rank: ``V (N, C, *S_out)``, ``W (C, R, *kernel)``.
    Large ``K·R`` takes the flat-τ streaming chunk path (any spatial
    rank); small ``K·R`` unrolls the full patch matrix.
    """
    if len(V_shape) != len(W_shape) or len(V_shape) < 3:
        return False
    N = V_shape[0]
    R = W_shape[1]
    kernel = W_shape[2:]
    K = 1
    for k in kernel:
        K *= k
    if K < 2:  # plain NMF in disguise — the dense engine handles it
        return False
    Lp = 1
    for s in V_shape[2:]:
        Lp *= s
    from .budget import budget_bytes

    max_bytes = budget_bytes(
        "PNT_NMFD_UNFOLD_MAX_BYTES", _DEFAULT_MAX_BYTES, _UNFOLD_HBM_FRACTION
    )
    return 4 * N * Lp * K * R <= max_bytes


def _taus(kernel):
    """All kernel offsets, row-major (matches the W2 reshape ordering)."""
    import itertools

    return list(itertools.product(*(range(k) for k in kernel)))


def unfold_patches_nd(H, kernel, pad=None):
    """N-D patch matrix: ``P[n, l_vec, τ_flat·R + r] = Hp[n, l_vec - τ, r]``.

    ``H (N, R, *S_in)`` → spatial-major padded copy → ``prod(kernel)``
    static slices stacked along a new τ axis → reshape to
    ``(N, prod(S_out), K·R)`` with ``S_out = S_in + kernel - 1``.  Pure
    data movement (copies) — no gathers.

    ``pad`` optionally selects the boundary mode per spatial axis (default
    all ``True`` = full convolution padding).  A ``False`` axis is consumed
    VALID — ``S_out = S_in - kernel + 1`` with no zero padding — which is
    the form the halo-exchange sharded solvers need on their halo'd
    trailing axis (:mod:`pytorch_nmf_tpu.parallel.halo`): the halo frames
    supplied by the ring neighbor play the role of the padding.
    """
    d = len(kernel)
    N, R = H.shape[:2]
    if pad is None:
        pad = (True,) * d
    S_out = _pad_s_out(H.shape[2:], kernel, pad)
    Hp2 = _h2_padded(H, kernel, pad)
    cols = []
    for tau in _taus(kernel):
        sl = Hp2
        for ax, (t, k, so) in enumerate(zip(tau, kernel, S_out)):
            sl = lax.slice_in_dim(sl, k - 1 - t, k - 1 - t + so, axis=1 + ax)
        cols.append(sl)
    P = jnp.stack(cols, axis=1 + d)  # (N, *S_out, K, R)
    K = 1
    for k in kernel:
        K *= k
    Lp = 1
    for s in S_out:
        Lp *= s
    return P.reshape(N, Lp, K * R)


def unfold_patches(H, T: int):
    """1-D convenience wrapper: ``P (N, L_out, T·R)``."""
    return unfold_patches_nd(H, (T,))


def _fold_nd(G, S_in, kernel, R: int):
    """Adjoint of :func:`unfold_patches_nd` restricted to the real H
    support: ``out[n, m_vec, r] = Σ_τ G[n, m_vec + τ, τ_flat·R + r]``."""
    d = len(kernel)
    N = G.shape[0]
    S_out = tuple(s + k - 1 for s, k in zip(S_in, kernel))
    K = 1
    for k in kernel:
        K *= k
    G5 = G.reshape((N,) + S_out + (K, R))
    parts = []
    for i, tau in enumerate(_taus(kernel)):
        sl = G5[(slice(None),) * (1 + d) + (i,)]  # (N, *S_out, R)
        for ax, (t, s) in enumerate(zip(tau, S_in)):
            sl = lax.slice_in_dim(sl, t, t + s, axis=1 + ax)
        parts.append(sl)
    return jnp.sum(jnp.stack(parts, axis=0), axis=0)  # (N, *S_in, R)


def _fold(G, L: int, T: int, R: int):
    """1-D convenience wrapper for :func:`_fold_nd`."""
    return _fold_nd(G, (L,), (T,), R)


def _w2(W):
    """``W (C, R, *k)`` → ``(K·R, C)`` matching the patch column order
    (τ-major, rank-minor)."""
    C = W.shape[0]
    d = W.ndim - 2
    perm = tuple(range(2, 2 + d)) + (1, 0)
    return jnp.transpose(W, perm).reshape(-1, C)


def _w2f_padded(W):
    """:func:`_w2` padded to a whole number of ``_PALLAS_TK``-row flat-τ
    tiles — the Mosaic engines' kernel operand.  Padded rows are exact
    zeros and stay zero through every multiplicative update."""
    C, R = W.shape[:2]
    K = _prod(W.shape[2:])
    nkr = -(-K // _PALLAS_TK)
    return jnp.pad(_w2(W), ((0, (nkr * _PALLAS_TK - K) * R), (0, 0)))


def _kl_pos_w_rows(H, rows):
    """Analytic β=1 KL denominator for W tiled over the flat
    τ-major/rank-minor rows: ``(rows, 1)`` (the positive term of the KL
    gradient is the per-rank activation sum)."""
    s = kl_pos_W(H).reshape(-1)
    return jnp.tile(s, rows // s.shape[0])[:, None]


def _kl_pos_h_ranks(w, R):
    """Analytic β=1 KL denominator for H from the GEMM-layout kernel:
    per-rank sums over every (τ, c) row — padded τ rows are exact
    zeros, so they contribute nothing."""
    return jnp.sum(w.reshape(-1, R, w.shape[-1]), axis=(0, 2))


def _h2_padded(H, kernel, pad):
    """Spatial-major activation with the full-conv ``k - 1`` zero pads
    on the ``True`` axes (a VALID axis is consumed un-padded — the
    halo'd trailing axis already carries its neighbor frames):
    ``(N, *S_pad, R)``.  The single source of the boundary convention
    shared by the unrolled and streaming patch builders."""
    return jnp.pad(
        jnp.moveaxis(H, 1, -1),
        ((0, 0),)
        + tuple(
            (k - 1, k - 1) if p else (0, 0) for k, p in zip(kernel, pad)
        )
        + ((0, 0),),
    )


# max patch-matrix columns before the τ axis is streamed through lax.scan
_CHUNK_COLS = 4096
# max τ offsets per chunk: the scan body unrolls one dynamic slice + one
# fold slice per offset, so an uncapped Tc (= _CHUNK_COLS/R, 512 at R=8)
# explodes XLA graph size and compile time; 64 keeps the contraction dim
# ≥ 512 for R ≥ 8 while bounding the unroll
_CHUNK_TAUS = 64


def _chunk_tc(R: int, T: int):
    """τ-chunk length: the largest Tc with Tc·R ≤ _CHUNK_COLS that divides
    the (padded) T evenly, capped at ``_CHUNK_TAUS`` unrolled offsets."""
    Tc = max(min(_CHUNK_COLS // R, _CHUNK_TAUS), 1)
    return min(Tc, T)


def _streaming_dims(R: int, K: int):
    Tc = _chunk_tc(R, K)
    n_chunks = -(-K // Tc)
    return Tc, n_chunks, n_chunks * Tc


def _kernel_dims(V_shape, H_shape):
    """Static kernel extents from the target/activation shapes
    (``S_out = S_in + kernel - 1`` for every deconv model)."""
    return tuple(int(v) - int(h) + 1 for v, h in zip(V_shape[2:], H_shape[2:]))


def _prod(xs):
    out = 1
    for x in xs:
        out *= int(x)
    return out


def _w_from_w2(W2, kernel, R: int):
    """Inverse of :func:`_w2`: ``(K·R, C)`` → ``(C, R, *kernel)``."""
    d = len(kernel)
    C = W2.shape[-1]
    full = W2.reshape(kernel + (R, C))
    return jnp.transpose(full, (1 + d, d) + tuple(range(d)))


def _w3_from_w(W):
    """``W (C, R, *kernel)`` → flat-τ-chunked GEMM operand
    ``(n_chunks, Tc·R, C)``; rows beyond ``K·R`` are zero padding."""
    C, R = W.shape[:2]
    K = _prod(W.shape[2:])
    Tc, n_chunks, K_pad = _streaming_dims(R, K)
    W2 = _w2(W)  # (K·R, C), flat-τ-major
    W2p = jnp.pad(W2, ((0, (K_pad - K) * R), (0, 0)))
    return W2p.reshape(n_chunks, Tc * R, C)


def _w_from_w3(W3, kernel, R: int):
    """Inverse of :func:`_w3_from_w`."""
    C = W3.shape[-1]
    K = _prod(kernel)
    return _w_from_w2(W3.reshape(-1, C)[: K * R], kernel, R)


def _tau_of_flat(f, kernel):
    """Per-axis τ components of a flat row-major kernel offset.

    ``f`` may be a traced scalar; offsets beyond ``prod(kernel)`` (the
    chunk padding) WRAP to some in-range τ — their kernel rows are zero,
    so the wrapped contributions vanish exactly."""
    taus = []
    stride = _prod(kernel)
    for k in kernel:
        stride //= k
        taus.append((f // stride) % k)
    return tuple(taus)


def _pad_s_out(S_in, kernel, pad):
    """Per-axis output extents: full padding grows by ``k - 1``, VALID
    (``pad[ax] is False`` — the halo'd trailing axis of the sequence-
    parallel solvers, whose input already carries ``k - 1`` extra frames)
    shrinks by it."""
    return tuple(
        s + k - 1 if p else s - k + 1
        for s, k, p in zip(S_in, kernel, pad)
    )


def _patch_chunk_fn(H, kernel, Tc: int, pad=None):
    """Closure building flat-τ-chunk patch matrices from the spatial-major
    activation: ``Pc(t)[n, l_vec, j·R + r] = H2[n, l_vec - τ(t·Tc + j), r]``.

    ``pad`` selects full-convolution padding (True, default) or VALID
    (False) per spatial axis; a VALID axis is consumed un-padded — the
    slice offsets ``k - 1 - τ`` then index into the halo frames the input
    already carries (:mod:`pytorch_nmf_tpu.parallel.halo`)."""
    N, R = H.shape[:2]
    if pad is None:
        pad = (True,) * len(kernel)
    S_out = _pad_s_out(H.shape[2:], kernel, pad)
    Lp = _prod(S_out)
    Hp2 = _h2_padded(H, kernel, pad)

    def patch_chunk(t):
        cols = []
        for j in range(Tc):
            taus = _tau_of_flat(t * Tc + j, kernel)
            starts = (
                (0,)
                + tuple(k - 1 - tau for k, tau in zip(kernel, taus))
                + (0,)
            )
            sl = lax.dynamic_slice(Hp2, starts, (N,) + S_out + (R,))
            cols.append(sl.reshape(N, Lp, R))
        return jnp.stack(cols, axis=2).reshape(N, Lp, Tc * R)

    return patch_chunk


def _stream_recon(W3, H, kernel, pad=None, varying_axis=None):
    """Streaming-τ reconstruction ``WH2 (N, prod(S_out), C)`` from the
    chunked GEMM operand ``W3 (n_chunks, Tc·R, C)``."""
    n_chunks, TcR, C = W3.shape
    N, R = H.shape[:2]
    Tc = TcR // R
    if pad is None:
        pad = (True,) * len(kernel)
    Lp = _prod(_pad_s_out(H.shape[2:], kernel, pad))
    patch_chunk = _patch_chunk_fn(H, kernel, Tc, pad)

    def recon_body(acc, inp):
        t, W2c = inp
        return acc + _dot(patch_chunk(t), W2c), None

    WH2, _ = lax.scan(
        recon_body,
        _zeros_like_vma((N, Lp, C), varying_axis),
        (jnp.arange(n_chunks), W3),
    )
    return WH2


def _chunked_recon(W, H):
    """Streaming-τ reconstruction from the model-layout kernel (used by
    :func:`unfold_deconv`; the MU solvers carry ``W3`` directly)."""
    return _stream_recon(_w3_from_w(W), H, W.shape[2:])


def _stream_contractions_h(V2, W3, H, kernel, beta, need_pos, pad=None,
                           varying_axis=None):
    """Streaming-τ H-side contractions against the chunked operand: a
    reconstruction scan, the elementwise cotangents, then the fold scan
    (:func:`_stream_h_contract`).  The W side has no unfused streaming
    form — :func:`_stream_upd_w` applies the MU multiply inside its scan.
    """
    WH2 = _stream_recon(W3, H, kernel, pad, varying_axis)
    neg_cot, pos_cot = mu_cotangents(V2, WH2, beta)
    cots = (neg_cot,) + ((pos_cot,) if need_pos else ())
    return _stream_h_contract(W3, cots, H, kernel, need_pos, pad,
                              varying_axis)


def _stream_upd_w(V2, W3, H, kernel, beta, gamma, l1_reg, l2_reg, pos_tiled,
                  pad=None, psum_axis=None):
    # (psum_axis doubles as the varying axis for the recon scan carry)
    """Fused streaming W update: the per-chunk numerator (and denominator)
    never leave registers — the MU multiply is applied inside the scan, so
    the two W-sized stacks (each the size of the kernel itself) are not
    written to and re-read from HBM.  ``pos_tiled``: the analytic β=1
    denominator tiled to ``(Tc·R, 1)``, or ``None``.

    ``psum_axis``: under the sequence-parallel halo solvers the patch
    contractions are partial sums over the local chunk — they are
    ``psum``'d per chunk *before* the relu/eps clamps so the update equals
    the single-device trajectory (``pos_tiled`` must then arrive already
    globally summed by the caller)."""
    n_chunks, TcR, C = W3.shape
    R = H.shape[1]
    Tc = TcR // R
    patch_chunk = _patch_chunk_fn(H, kernel, Tc, pad)

    WH2 = _stream_recon(W3, H, kernel, pad, varying_axis=psum_axis)
    need_pos = beta != 1
    neg_cot, pos_cot = mu_cotangents(V2, WH2, beta)

    def w_body(carry, inp):
        t, W3c = inp
        Pc = patch_chunk(t)

        def contract(cot):
            out = jnp.einsum(
                "nlk,nlc->kc", Pc, cot,
                preferred_element_type=jnp.float32,
            )
            if psum_axis is not None:
                out = lax.psum(out, psum_axis)
            return out

        neg = jax.nn.relu(contract(neg_cot)) + eps
        pos = (
            jax.nn.relu(contract(pos_cot)) + eps if need_pos else pos_tiled
        )
        return carry, W3c * mu_multiplier(
            neg, pos, W3c, gamma, l1_reg, l2_reg
        )

    _, W3_new = lax.scan(w_body, 0, (jnp.arange(n_chunks), W3))
    return W3_new


def _stream_h_contract(W3, cots, H, kernel, need_pos, pad=None,
                       varying_axis=None):
    """Streaming fold: per-chunk ``cot @ W2cᵀ`` GEMMs overlap-added into
    the ``(N, *S_in, R)`` accumulators.

    The fold slice for flat offset ``f`` starts at ``τ(f)`` per axis, which
    wraps in-range for the padded offsets (whose zero kernel rows make the
    wrapped contribution exactly zero), so every slice is in-bounds with no
    cotangent padding.  On a VALID (halo'd) axis the cotangent is *shorter*
    than the input; it is zero-padded by ``k - 1`` on both sides so the
    same ``τ``-start slice places each contribution at offset ``k - 1 - τ``
    of the halo'd accumulator (whose leading ``k - 1`` frames are the
    neighbor's — the halo solver ships them back with the reverse
    ``ppermute``)."""
    N, R = H.shape[:2]
    S_in = H.shape[2:]
    if pad is None:
        pad = (True,) * len(kernel)
    S_out = _pad_s_out(S_in, kernel, pad)
    n_chunks, TcR, _ = W3.shape
    Tc = TcR // R
    g_pads = (
        ((0, 0),)
        + tuple(
            (0, 0) if p else (k - 1, k - 1) for k, p in zip(kernel, pad)
        )
        + ((0, 0),)
    )

    def h_body(acc, inp):
        t, W2c = inp
        accs = list(acc)
        for i, cot in enumerate(cots):
            Gc = _dot(cot, W2c.T).reshape((N,) + S_out + (Tc, R))
            for j in range(Tc):
                taus = _tau_of_flat(t * Tc + j, kernel)
                Gj = Gc[(slice(None),) * (1 + len(kernel)) + (j,)]
                if not all(pad):
                    Gj = jnp.pad(Gj, g_pads)
                sl = lax.dynamic_slice(
                    Gj, (0,) + taus + (0,), (N,) + S_in + (R,)
                )
                accs[i] = accs[i] + sl
        return tuple(accs), None

    acc0 = tuple(
        _zeros_like_vma((N,) + S_in + (R,), varying_axis) for _ in cots
    )
    accs, _ = lax.scan(h_body, acc0, (jnp.arange(n_chunks), W3))
    outs = tuple(jnp.moveaxis(a, -1, 1) for a in accs)
    return outs[0], (outs[1] if need_pos else None)


def _dot(a, b):
    return lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _deconv_unfold_updater_factory(spatial_ndim, beta, gamma, l1_reg, l2_reg):
    """``updater_factory`` hook producing unfold-GEMM deconvolution
    updaters for any spatial rank — extended (5-tuple) protocol.

    The kernel factor is loop-carried in its GEMM layout — ``W2 (K·R, C)``
    for the fully-unrolled form, ``W3 (n_chunks, Tc·R, C)`` for the 1-D
    streaming form — via the solver's ``prepare``/``finish`` hooks, so the
    hot loop contains NO layout transposes (the ``(C, R, T) ↔ (T·R, C)``
    relayout of a T=400 r88 kernel costs ~0.5 ms on v5e and the old
    per-iteration code paid it ~4×).  MU multiplies, regularizers and the
    relu/eps clamps are elementwise and layout-agnostic; zero-padded τ rows
    stay zero under any multiplier.  Shapes outside the memory budget keep
    the model layout and the generic VJP/conv engine (the mode is a static
    trace-time function of the V/H shapes, so ``prepare`` and the updaters
    always agree).
    """

    def _mode(V_shape, H_shape, dtype=None):
        # x64 double-precision fits keep the generic conv engine (its
        # accumulations follow the operand dtype; the unfold machinery is
        # f32-pinned TPU code — see recon.acc_type)
        if dtype is not None and dtype == jnp.float64:
            return "none"
        if len(V_shape) != 2 + spatial_ndim:
            return "none"
        kernel = _kernel_dims(V_shape, H_shape)
        R = int(H_shape[1])
        W_shape = (int(V_shape[1]), R) + kernel
        if not nmfd_unfold_supported(
            tuple(int(s) for s in V_shape), W_shape
        ):
            return "none"
        K = 1
        for k in kernel:
            K *= k
        return "unrolled" if K * R <= _CHUNK_COLS else "stream"

    def prepare(V, W, H):
        m = _mode(V.shape, H.shape, V.dtype)
        if m == "unrolled":
            return _w2(W), H
        if m == "stream":
            return _w3_from_w(W), H
        return W, H

    def finish(V, w, h):
        m = _mode(V.shape, h.shape, V.dtype)
        if m == "unrolled":
            return _w_from_w2(w, _kernel_dims(V.shape, h.shape),
                              int(h.shape[1])), h
        if m == "stream":
            return _w_from_w3(w, _kernel_dims(V.shape, h.shape),
                              int(h.shape[1])), h
        return w, h

    def _generic(V, W, H, which):
        from . import recon as _recon
        from .mu import mu_update

        deconv = getattr(_recon, f"deconv{spatial_ndim}d")
        if which == "W":
            pos_pre = kl_pos_W(H) if beta == 1 else None
            return mu_update(
                lambda w: deconv(H, w), V, W, beta, gamma,
                l1_reg, l2_reg, pos_pre,
            )
        pos_pre = kl_pos_H(W) if beta == 1 else None
        return mu_update(
            lambda h: deconv(h, W), V, H, beta, gamma,
            l1_reg, l2_reg, pos_pre,
        )

    def _contractions(V, w, H, mode, w_side: bool):
        """(neg, pos_or_None) for one factor via the patch GEMMs; w-side
        outputs stay in ``w``'s GEMM layout.

        Small ``K·R`` uses one fully-unrolled patch matrix; a large 1-D
        ``T·R`` streams τ-chunks through a ``lax.scan`` so neither the
        patch tensor nor the XLA graph blows up (a fully-unrolled T=400,
        R=88 program took minutes to compile and paged HBM)."""
        R = H.shape[1]
        kernel = _kernel_dims(V.shape, H.shape)
        S_in = H.shape[2:]
        V2 = _v2_flat(V)
        need_pos = beta != 1

        if mode == "unrolled":
            P = unfold_patches_nd(H, kernel)  # (N, Lp, KR)
            WH2 = _dot(P, w)                  # (N, Lp, C)
            neg_cot, pos_cot = mu_cotangents(V2, WH2, beta)

            if w_side:
                def contract(cot):  # (KR, C) — the W2 layout
                    return jnp.einsum(
                        "nlk,nlc->kc", P, cot,
                        preferred_element_type=jnp.float32,
                    )
            else:
                def contract(cot):
                    G = _dot(cot, w.T)                  # (N, Lp, KR)
                    out = _fold_nd(G, S_in, kernel, R)  # (N, *S_in, R)
                    return jnp.moveaxis(out, -1, 1)

            return contract(neg_cot), (contract(pos_cot) if need_pos else None)

        # flat-τ streaming path (any spatial rank); only the H side
        # reaches here — stream-mode upd_W takes the fused _stream_upd_w
        assert not w_side
        return _stream_contractions_h(V2, w, H, kernel, beta, need_pos)

    def _pos_w_tiled(H, w, mode):
        """Analytic KL denominator for W in ``w``'s layout: the per-rank
        activation sums tiled over the τ rows."""
        if mode == "unrolled":
            return _kl_pos_w_rows(H, w.shape[0])
        s = kl_pos_W(H).reshape(-1)  # (R,)
        reps = w.shape[1] // s.shape[0]
        return jnp.tile(s, reps)[None, :, None]

    def _pos_h_from_w(w, R):
        """Analytic KL denominator for H, broadcast against
        ``H (N, R, *S_in)``."""
        return _kl_pos_h_ranks(w, R).reshape((R,) + (1,) * spatial_ndim)

    def upd_W(V, w, H):
        mode = _mode(V.shape, H.shape, V.dtype)
        if mode == "none":
            return _generic(V, w, H, "W")
        if mode == "stream":
            # fused per-chunk update: the W-sized numerator/denominator
            # stacks never round-trip HBM
            pos_tiled = (
                _pos_w_tiled(H, w, mode).reshape(-1, 1) if beta == 1
                else None
            )
            return _stream_upd_w(
                _v2_flat(V), w, H, _kernel_dims(V.shape, H.shape),
                beta, gamma, l1_reg, l2_reg, pos_tiled,
            )
        neg, pos = _contractions(V, w, H, mode, w_side=True)
        neg = jax.nn.relu(neg) + eps
        pos = (
            _pos_w_tiled(H, w, mode) if beta == 1
            else jax.nn.relu(pos) + eps
        )
        return w * mu_multiplier(neg, pos, w, gamma, l1_reg, l2_reg)

    def upd_H(V, w, H):
        mode = _mode(V.shape, H.shape, V.dtype)
        if mode == "none":
            return _generic(V, w, H, "H")
        neg, pos = _contractions(V, w, H, mode, w_side=False)
        neg = jax.nn.relu(neg) + eps
        pos = (
            _pos_h_from_w(w, H.shape[1]) if beta == 1
            else jax.nn.relu(pos) + eps
        )
        return H * mu_multiplier(neg, pos, H, gamma, l1_reg, l2_reg)

    def loss_terms(V, w, H):
        # every-10-iterations cadence loss via the same patch GEMMs — the
        # conv reconstruction would cost ~1/3 of a whole unfold update
        from ..metrics import beta_div

        mode = _mode(V.shape, H.shape, V.dtype)
        if mode == "none":
            from . import recon as _recon

            deconv = getattr(_recon, f"deconv{spatial_ndim}d")
            return beta_div(deconv(H, w), V, beta)
        kernel = _kernel_dims(V.shape, H.shape)
        if mode == "unrolled":
            WH2 = _dot(unfold_patches_nd(H, kernel), w)
        else:
            WH2 = _stream_recon(w, H, kernel)
        return beta_div(WH2, _v2_flat(V), beta)

    return upd_W, upd_H, loss_terms, prepare, finish


def unfold_deconv(H, W):
    """Full-padded true convolution via the patch GEMM — the same output
    as ``recon.deconvNd(H, W)`` (to f32 rounding), but expressed in ops
    whose JAX adjoints are the patch-GEMM contractions (slice/stack
    transposes = the fold), so differentiating through it — as the PLCA EM
    E-step and the Hoyer solver do — inherits the unfold speedup.

    Large kernels (any spatial rank) stream flat-τ chunks through
    ``lax.scan`` (the fully unrolled patch matrix at T=400, R=88 compiles
    for minutes and pages HBM); shapes exceeding the memory budget fall
    back to the conv
    formulation (decided from the static shapes at trace time — use the
    per-call model resolvers, not env toggles, to switch paths on cached
    solvers).
    """
    kernel = W.shape[2:]
    d = len(kernel)
    N, R = H.shape[:2]
    S_in = H.shape[2:]
    S_out = tuple(s + k - 1 for s, k in zip(S_in, kernel))
    V_like = (N, W.shape[0]) + S_out
    f64 = H.dtype == jnp.float64 or W.dtype == jnp.float64
    if f64 or not nmfd_unfold_supported(V_like, W.shape):
        from . import recon as _recon

        return getattr(_recon, f"deconv{d}d")(H, W)
    K = 1
    for k in kernel:
        K *= k
    if K * R <= _CHUNK_COLS:
        P = unfold_patches_nd(H, kernel)    # (N, Lp, KR)
        WH2 = _dot(P, _w2(W))               # (N, Lp, C)
    else:  # flat-τ streaming (any spatial rank)
        WH2 = _chunked_recon(W, H)
    WH = WH2.reshape((N,) + S_out + (W.shape[0],))
    return jnp.moveaxis(WH, -1, 1)          # (N, C, *S_out)


def nmfd_unfold_updater_factory(beta, gamma, l1_reg, l2_reg):
    """Unfold-GEMM updaters for NMFD (1-D)."""
    return _deconv_unfold_updater_factory(1, beta, gamma, l1_reg, l2_reg)


def _h_autocorr_gram(H, T: int):
    """Patch Gram ``G = PᵀP`` of the 1-D patch matrix, built from the H
    lag autocorrelation in ``O(R²·T·L)`` MACs instead of the naive
    ``O((T·R)²·L)``.

    ``G[(τ·R+r),(τ'·R+r')] = Σ_{n,l} P[n,l,τR+r]·P[n,l,τ'R+r']
    = A[r, r', τ-τ']`` with ``A[r,r',δ] = Σ_{n,u} H[n,r,u]·H[n,r',u+δ]``
    (δ ∈ (-T, T); ``A[·,·,-δ] = A[·,·,δ]ᵀ``): the patch-boundary zeros
    make every lag sum run over the full support, so the Gram is exactly
    block-Toeplitz in the lag.  The lag table is computed in blocks of
    shifted-window GEMMs; the block-Toeplitz expansion to ``(T·R, T·R)``
    is pure data movement (≤ ``_CHUNK_COLS²`` · 4 bytes ≈ 67 MB by the
    unrolled-mode gate).
    """
    N, R, L = H.shape
    # lag blocks sized to keep the shifted-window stack ≲ 64 MB
    blk = max(1, min(T, int(64 * 1024**2 // max(1, N * R * L * 4))))
    nb = -(-T // blk)
    Hp = jnp.pad(H, ((0, 0), (0, 0), (0, nb * blk)))
    parts = []
    for b in range(nb):
        d0 = b * blk
        S = jnp.stack(
            [
                lax.slice_in_dim(Hp, d0 + d, d0 + d + L, axis=2)
                for d in range(blk)
            ],
            axis=2,
        )  # (N, R', blk, L): S[n, r', d, u] = Hp[n, r', u + d0 + d]
        parts.append(
            jnp.einsum(
                "nru,nsdu->rsd", H, S,
                preferred_element_type=jnp.float32,
            )
        )
    A_half = jnp.concatenate(parts, axis=-1)[..., :T]  # (R, R', T), δ ≥ 0
    # full lag table, index d = δ + T - 1; negative lags by symmetry
    A_full = jnp.concatenate(
        [jnp.flip(jnp.swapaxes(A_half, 0, 1)[..., 1:], axis=-1), A_half],
        axis=-1,
    )  # (R, R', 2T-1)
    # block-Toeplitz expansion by static slices (a gather here costs ms on
    # TPU): row block τ needs A_full[..., τ-τ'+T-1] for τ' = 0..T-1, i.e.
    # the length-T window at offset τ, reversed
    rows = [
        jnp.flip(lax.slice_in_dim(A_full, t, t + T, axis=2), axis=2)
        for t in range(T)
    ]
    G4 = jnp.stack(rows, axis=2)  # (R, R', T, T')
    return jnp.transpose(G4, (2, 0, 3, 1)).reshape(T * R, T * R)


def nmfd_autocorr_updater_factory(beta, gamma, l1_reg, l2_reg):
    """β=2 NMFD updaters with the autocorrelation W denominator.

    The one β=2 re-association the unfold engine leaves on the table
    (reference nmf.py:776-779 computes ``pos_W`` by correlating the
    reconstruction with the activation patches): ``pos_W = Pᵀ(P W2) =
    (PᵀP) W2``, and ``PᵀP`` is block-Toeplitz in the lag
    (:func:`_h_autocorr_gram`) so it costs ``O(R²·T·L)`` to build plus
    ``O(C·R²·T²)`` to apply — replacing the unfold W-side's recon +
    correlation ``O(2·C·R·T·L)``; wins exactly when ``R·T < L`` (the
    low-rank flagship corner).  Only ``upd_W``'s positive term changes:
    ``neg_W``, the whole H update, the loss cadence and the
    ``prepare``/``finish`` layout hooks all ride the unfold engine, and
    the relu/eps clamps are placed identically — trajectories differ
    from unfold only by f32 summation order (same interchangeability
    class as conv vs unfold).  1-D, β=2, unrolled-regime
    (``T·R ≤ _CHUNK_COLS``) only; other configs raise so the autotuner's
    per-candidate try/except skips the engine.
    """
    if beta != 2:
        raise ValueError("the autocorrelation engine is β=2-only")
    base = _deconv_unfold_updater_factory(1, beta, gamma, l1_reg, l2_reg)
    _, upd_H_u, loss_terms, prepare, finish = base

    def upd_W(V, w, H):
        if len(V.shape) != 3 or V.dtype == jnp.float64:
            raise ValueError("autocorr engine: 1-D f32 targets only")
        R = int(H.shape[1])
        T = int(w.shape[0]) // R if w.ndim == 2 else int(w.shape[-1])
        if w.ndim != 2 or T * R > _CHUNK_COLS or not nmfd_unfold_supported(
            tuple(int(s) for s in V.shape),
            (int(V.shape[1]), R, T),
        ):
            raise ValueError(
                "autocorr engine requires the unrolled patch regime "
                "(T·R <= _CHUNK_COLS and the unfold memory budget)"
            )
        V2 = _v2_flat(V)
        P = unfold_patches_nd(H, (T,))  # (N, L_out, TR)
        neg = jnp.einsum(
            "nlk,nlc->kc", P, V2, preferred_element_type=jnp.float32,
        )
        pos = _dot(_h_autocorr_gram(H, T), w)  # (TR, TR) @ (TR, C)
        neg = jax.nn.relu(neg) + eps
        pos = jax.nn.relu(pos) + eps
        return w * mu_multiplier(neg, pos, w, gamma, l1_reg, l2_reg)

    return upd_W, upd_H_u, loss_terms, prepare, finish


def nmfd_fft_updater_factory(beta, gamma, l1_reg, l2_reg):
    """NMFD updaters with the opt-in FFT β=2 path
    (:mod:`pytorch_nmf_tpu.ops.fft_nmfd`); every other β keeps the
    unfold-GEMM formulation.  Selected by the per-call resolver when
    ``PNT_NMFD_FFT=1`` — a distinct module-level factory object, so the
    env toggle lands in the solver compile-cache key."""
    if beta == 2:
        from .fft_nmfd import fft_beta2_updater_factory

        return fft_beta2_updater_factory(gamma, l1_reg, l2_reg)
    return _deconv_unfold_updater_factory(1, beta, gamma, l1_reg, l2_reg)


# flat-τ offsets per fused-kernel tile (ops/pallas_deconv reads the same
# env knob, so the two stay consistent by construction).  Experiment-only:
# 16 is the measured default; the VMEM gates scale with it automatically.
_PALLAS_TK = int(os.environ.get("PNT_PALLAS_TK", "16"))


def _deconv_pallas_updater_factory(beta, gamma, l1_reg, l2_reg,
                                   interpret=False, spatial_ndim=1,
                                   h_side="pallas"):
    """Deconv updaters with the fused Pallas contractions
    (:mod:`.pallas_deconv`): the XLA streaming recon feeds
    :func:`~.pallas_deconv.wgrad` / :func:`~.pallas_deconv.hgrad`, so the
    patch matrix ``P`` and the fold input ``G`` never hit HBM.  Measured
    at the 1-D flagship shape (C=1025, L=5000, R=88, T=400, v5e): W-side
    contraction 2.67 ms vs ~4.0 for the einsum scan, H-side 2.26 vs 2.81.

    ``spatial_ndim > 1`` runs the *same kernels* in flat-offset mode:
    the activation is zero-padded to the output widths on every trailing
    spatial axis and flattened row-major, after which full N-D
    convolution equals 1-D convolution at flat offsets
    ``τ = Σ d_ax · stride_ax`` (:func:`~.pallas_deconv.nd_geom` — the
    wrap-around reads land in the zero-pad columns, exactly).

    Carries the kernel flat (``(nkr·Tk·R, C)``, τ-padded zero rows);
    offered as the measured ``"pallas"`` autotune candidate — never a
    static default.  β≠1 calls each kernel once per cotangent (the dual
    in-kernel variant loses its VMEM budget to worse C tiling).

    ``h_side="stream"`` is the *hybrid* (``"pallas_w"``) mode: the
    W-side contraction keeps the fused kernel, the H side runs the
    streamed XLA fold — for shapes where the hgrad accumulator is
    VMEM-gated out but the W-side win still applies.
    """
    from .pallas_deconv import (
        deconv_pallas_nd_supported,
        deconv_pallas_supported,
        deconv_pallas_w_supported,
        hgrad,
        wgrad,
    )

    Tk = _PALLAS_TK
    nd = spatial_ndim

    def _dims(V_shape, H_shape):
        """(kernel, geom, T_geo, nkr) for this problem; raises on
        unsupported shapes (the autotuner's try/except absorbs it)."""
        if h_side == "stream":
            # regular autotune candidate at every spatial rank wherever
            # its own gate admits it.  1-D used to suppress the hybrid
            # whenever the full fused mode compiled ("the in-kernel
            # epilogue dominates it wherever both run" — measured r3 at
            # the r88 flagship), but the dominance INVERTS at tiny rank:
            # C=1025/r8/T400/L5000 β=1 measures pallas_w 2.42 ms/iter vs
            # full-fused 3.32 on v5e (tools/measure_1d_modes.py — the
            # hgrad's M = R = 8 starves the MXU harder than the streamed
            # fold's GEMMs).  Rank-dependent dominance means the timing
            # loop, not a static gate, must pick between them.
            ok = deconv_pallas_w_supported(V_shape, H_shape, None)
        else:
            ok = (
                deconv_pallas_supported(V_shape, H_shape, None) if nd == 1
                else deconv_pallas_nd_supported(V_shape, H_shape, None)
            )
        if not ok or len(V_shape) != nd + 2:
            raise ValueError(
                "pallas deconv engine: unsupported shape "
                f"{V_shape}/{H_shape} (needs f32, stacked flat length "
                ">= 256, VMEM-bounded window)"
            )
        kernel, geom, T_geo, _ = _flat_geom(V_shape, H_shape)
        return kernel, geom, T_geo, -(-_prod(kernel) // Tk)

    def prepare(V, W, H):
        if V.dtype != jnp.float32:
            raise ValueError("pallas deconv engine: float32 targets only")
        _dims(V.shape, H.shape)  # shape gate (raises when unsupported)
        return _w2f_padded(W), H

    def finish(V, w, h):
        kernel, _, _, _ = _dims(V.shape, h.shape)
        R = h.shape[1]
        return _w_from_w2(w[: _prod(kernel) * R], kernel, R), h

    def _w3(w, R):
        return w.reshape(-1, Tk * R, w.shape[-1])

    def _cots(V, w, H):
        V2 = _v2_flat(V)
        WH2 = _stream_recon(
            _w3(w, H.shape[1]), H, _kernel_dims(V.shape, H.shape)
        )
        return mu_cotangents(V2, WH2, beta)

    def _batched(H_shape):
        return int(H_shape[0]) > 1

    def upd_W(V, w, H):
        kernel, geom, T_geo, _ = _dims(V.shape, H.shape)
        R = H.shape[1]
        neg_cot, pos_cot = _cots(V, w, H)
        if _batched(H.shape):
            # cot segments are padded to the stacked activation's stride
            # (T_geo - 1 + L_in_flat), so the flat patch relation
            # P[l] = hp[l + (T_geo-1) - τ] holds across segments
            seg = T_geo - 1 + _flat_geom(V.shape, H.shape)[3]
            H2 = _h_stacked(H, kernel, T_geo)
            lead = False
            negf = _cot_stacked(neg_cot, seg)
            posf = None if pos_cot is None \
                else _cot_stacked(pos_cot, seg)
        else:
            H2 = _h_flat_nd(H, _kernel_dims(V.shape, H.shape))
            lead = True
            negf = neg_cot[0]
            posf = None if pos_cot is None else pos_cot[0]
        if beta == 1 and gamma == 1.0 and l1_reg == 0.0 and l2_reg == 0.0:
            # fully-fused KL update: the kernel's epilogue applies the MU
            # multiply in VMEM, skipping the numerator's HBM round trip
            return wgrad(
                [negf], H2, R, Tk, T_geo, interpret=interpret,
                mu_w2=w, mu_pos=kl_pos_W(H).reshape(-1), geom=geom,
                lead_pad=lead,
            )[0]
        neg = wgrad([negf], H2, R, Tk, T_geo, interpret=interpret,
                    geom=geom, lead_pad=lead)[0]
        neg = jax.nn.relu(neg) + eps
        if beta == 1:
            pos = _tiled_kl_pos_w(H, w)
        else:
            pos = wgrad([posf], H2, R, Tk, T_geo,
                        interpret=interpret, geom=geom, lead_pad=lead)[0]
            pos = jax.nn.relu(pos) + eps
        # τ-padded kernel rows are exactly zero and stay zero through the
        # multiplicative update (0 × finite multiplier)
        return w * mu_multiplier(neg, pos, w, gamma, l1_reg, l2_reg)

    def upd_H(V, w, H):
        kernel, geom, T_geo, _ = _dims(V.shape, H.shape)
        R = H.shape[1]
        if h_side == "stream":
            # hybrid mode: streamed XLA fold (identical contraction, no
            # VMEM-resident flat output)
            need_pos = beta != 1
            neg, pos = _stream_contractions_h(
                _v2_flat(V), _w3(w, R), H, kernel, beta, need_pos
            )
            neg = jax.nn.relu(neg) + eps
            pos = (
                jax.nn.relu(pos) + eps if need_pos else _pos_h_flat(w, R)
            )
            return H * mu_multiplier(neg, pos, H, gamma, l1_reg, l2_reg)
        neg_cot, pos_cot = _cots(V, w, H)
        W2f = w
        if _batched(H.shape):
            # stacked mode: hgrad over all N segments at once; each
            # segment's trailing garbage columns (reads past its real
            # cotangent) are cropped below
            N = H.shape[0]
            L_in_flat = _flat_geom(V.shape, H.shape)[3]
            seg = T_geo - 1 + L_in_flat

            def h_contract(cot):
                out = hgrad(
                    _cot_stacked(cot, seg), W2f, R, Tk, N * seg,
                    interpret=interpret, geom=geom,
                )
                segs = jnp.moveaxis(
                    out.reshape(R, N, seg)[:, :, :L_in_flat], 1, 0
                )  # (N, R, L_in_flat)
                return _h_unflat_batched(segs, H.shape, kernel)

            neg = jax.nn.relu(h_contract(neg_cot)) + eps
            if beta == 1:
                pos = _pos_h_flat(w, R)
            else:
                pos = jax.nn.relu(h_contract(pos_cot)) + eps
            return H * mu_multiplier(neg, pos, H, gamma, l1_reg, l2_reg)
        L_flat = _flat_geom(V.shape, H.shape)[3]
        neg = _h_unflat_nd(
            hgrad(neg_cot[0], W2f, R, Tk, L_flat, interpret=interpret,
                  geom=geom),
            H.shape, kernel,
        )
        neg = jax.nn.relu(neg) + eps
        if beta == 1:
            pos = _pos_h_flat(w, R)
        else:
            pos = _h_unflat_nd(
                hgrad(pos_cot[0], W2f, R, Tk, L_flat, interpret=interpret,
                      geom=geom),
                H.shape, kernel,
            )
            pos = jax.nn.relu(pos) + eps
        return H * mu_multiplier(neg, pos, H, gamma, l1_reg, l2_reg)

    def _tiled_kl_pos_w(H, w):
        return _kl_pos_w_rows(H, w.shape[0])

    def _pos_h_flat(w, R):
        return _kl_pos_h_ranks(w, R).reshape((1, R) + (1,) * nd)

    def loss_terms(V, w, H):
        from ..metrics import beta_div

        WH2 = _stream_recon(
            _w3(w, H.shape[1]), H, _kernel_dims(V.shape, H.shape)
        )
        return beta_div(WH2, _v2_flat(V), beta)

    return upd_W, upd_H, loss_terms, prepare, finish


def _v2_flat(V):
    """Channels-last flatten shared by the pallas updaters (the unfold
    factory's ``_v2`` closure, hoisted)."""
    return jnp.moveaxis(V, 1, -1).reshape(V.shape[0], -1, V.shape[1])


def _flat_geom(V_shape, H_shape):
    """``(kernel, geom, T_geo, L_flat)`` for the flat-offset mode: the
    activation's trailing spatial axes padded to the *output* widths and
    flattened row-major (``geom=None`` and ``T_geo=T`` for 1-D)."""
    from .pallas_deconv import _flat_T, nd_geom

    kernel = _kernel_dims(V_shape, H_shape)
    if len(kernel) == 1:
        return kernel, None, kernel[0], int(H_shape[2])
    s_pad = (int(H_shape[2]),) + tuple(
        int(s) + int(k) - 1 for s, k in zip(H_shape[3:], kernel[1:])
    )
    geom = nd_geom(kernel, s_pad)
    return kernel, geom, _flat_T(geom), _prod(s_pad)


def _h_flat_nd(H, kernel):
    """``(1, R, *S_in)`` → ``(L_flat, R)``: trailing spatial axes
    zero-padded to the output widths, row-major flatten (the
    flat-offset activation layout)."""
    if len(kernel) == 1:
        return jnp.moveaxis(H[0], 0, 1)
    H2 = jnp.moveaxis(H[0], 0, -1)  # (*S_in, R)
    pads = ((0, 0),) + tuple(
        (0, int(k) - 1) for k in kernel[1:]
    ) + ((0, 0),)
    return jnp.pad(H2, pads).reshape(-1, H.shape[1])


def _h_unflat_nd(out, H_shape, kernel):
    """``(R, L_flat)`` → ``(1, R, *S_in)``: undo :func:`_h_flat_nd`
    (crop the trailing-axis pads — their columns carry harmless
    garbage, never real cotangent)."""
    return _h_unflat_batched(out[None], H_shape, kernel)


def _h_unflat_batched(segs, H_shape, kernel):
    """``(N, R, L_in_flat)`` → ``(N, R, *S_in)``: per-batch undo of the
    flat-offset layout (crop the trailing-axis pads)."""
    if len(kernel) == 1:
        return segs
    N, R = int(H_shape[0]), int(H_shape[1])
    s_pad = tuple(
        int(s) + (0 if d == 0 else int(kernel[d]) - 1)
        for d, s in enumerate(H_shape[2:])
    )
    full = segs.reshape((N, R) + s_pad)
    for d, s in enumerate(H_shape[2:]):
        if d > 0:
            full = lax.slice_in_dim(full, 0, int(s), axis=2 + d)
    return full


def _h_stacked(H, kernel, T_geo):
    """Segment-stacked activation for the batched (N > 1) fused mode:
    per-batch flat-offset layout (trailing axes padded to output widths)
    with ``T_geo - 1`` leading zeros per segment — the separators absorb
    every cross-batch patch read exactly (the overrun past a segment's
    real frames is under ``T_geo - 1``)."""
    H2 = jnp.moveaxis(H, 1, -1)  # (N, *S_in, R)
    pads = (
        ((0, 0), (0, 0))
        + tuple((0, int(k) - 1) for k in kernel[1:])
        + ((0, 0),)
    )
    flat = jnp.pad(H2, pads).reshape(H.shape[0], -1, H.shape[1])
    flat = jnp.pad(flat, ((0, 0), (T_geo - 1, 0), (0, 0)))
    return flat.reshape(-1, H.shape[1])


def _cot_stacked(cot, seg_stride):
    """(N, Lp_flat, C) → (N·seg_stride, C): zero-pad each segment to
    the stacked activation's stride (the pad is 0 in 1-D; kx-1 rows
    in 2-D, …) so the flat patch relation holds across segments."""
    Lp_flat, C_ = cot.shape[1:]
    cotp = jnp.pad(cot, ((0, 0), (0, seg_stride - Lp_flat), (0, 0)))
    return cotp.reshape(-1, C_)



def _pallas_recon_forward(H, W):
    """The custom-vjp deconv makers' shared primal: streaming patch-GEMM
    reconstruction on the ``_PALLAS_TK``-tiled flat kernel, model layout
    out (``(N, C, *S_out)``)."""
    R = H.shape[1]
    W2f = _w2f_padded(W)
    v_sp = tuple(
        int(s) + int(k) - 1 for s, k in zip(H.shape[2:], W.shape[2:])
    )
    WH2 = _stream_recon(
        W2f.reshape(-1, _PALLAS_TK * R, W.shape[0]), H, W.shape[2:]
    )  # (N, Lp, C)
    return jnp.moveaxis(WH2, -1, 1).reshape(
        (H.shape[0], W.shape[0]) + v_sp
    )


def _make_pallas_unfold_deconv(interpret: bool):
    """``custom_vjp`` deconvolution whose adjoints run the fused Mosaic
    kernels: forward = the streaming patch GEMMs, ``dH`` =
    :func:`~.pallas_deconv.hgrad` (no ``G`` materialization), ``dW`` =
    :func:`~.pallas_deconv.wgrad` (no patch materialization).

    Differentiating a reconstruction is exactly what the PLCA/SIPLCA EM
    E-step and the Hoyer solver do (reference plca.py:252-253), so this
    hands them the MU engine's kernel speedup without touching their
    solver code.  f32 only; 2-D/3-D run the flat-offset kernel mode and
    ``N > 1`` the segment-stacked mode (per-batch ``T_geo - 1`` zero
    separators, identical to the updater factory's batched path) —
    callers gate via :func:`~.pallas_deconv.deconv_pallas_supported` /
    ``deconv_pallas_nd_supported`` (the EM autotuner offers it as a
    measured candidate)."""
    from .pallas_deconv import hgrad, wgrad

    Tk = _PALLAS_TK

    @jax.custom_vjp
    def pallas_deconv(H, W):
        return _pallas_recon_forward(H, W)

    def fwd(H, W):
        return pallas_deconv(H, W), (H, W)

    def bwd(res, ct):
        H, W = res
        C, R = W.shape[:2]
        N = int(H.shape[0])
        kernel, geom, T_geo, L_flat = _flat_geom(ct.shape, H.shape)
        K = _prod(kernel)
        if N == 1:
            ct2 = jnp.moveaxis(ct, 1, -1).reshape(-1, C)  # (Lp, C)
            dH = _h_unflat_nd(
                hgrad(ct2, _w2f_padded(W), R, Tk, L_flat, interpret=interpret,
                      geom=geom),
                H.shape, kernel,
            )
            H2 = _h_flat_nd(H, kernel)
            dW2 = wgrad([ct2], H2, R, Tk, T_geo, interpret=interpret,
                        geom=geom)[0][: K * R]
        else:
            # segment-stacked batched adjoints (per-batch T_geo-1 zero
            # separators; each segment's trailing garbage cropped)
            seg = T_geo - 1 + L_flat
            ctf = _cot_stacked(
                jnp.moveaxis(ct, 1, -1).reshape(N, -1, C), seg
            )
            out = hgrad(ctf, _w2f_padded(W), R, Tk, N * seg,
                        interpret=interpret, geom=geom)
            segs = jnp.moveaxis(
                out.reshape(R, N, seg)[:, :, :L_flat], 1, 0
            )
            dH = _h_unflat_batched(segs, H.shape, kernel)
            H2 = _h_stacked(H, kernel, T_geo)
            dW2 = wgrad([ctf], H2, R, Tk, T_geo, interpret=interpret,
                        geom=geom, lead_pad=False)[0][: K * R]
        return dH, _w_from_w2(dW2, kernel, R)

    pallas_deconv.defvjp(fwd, bwd)
    return pallas_deconv


unfold_deconv_pallas = _make_pallas_unfold_deconv(False)
unfold_deconv_pallas_interpret = _make_pallas_unfold_deconv(True)


def _make_pallas_w_unfold_deconv(interpret: bool):
    """Hybrid custom-vjp deconvolution — the ``pallas_w`` split for the
    gradient-based solvers: forward = the streaming patch GEMMs, ``dW``
    = :func:`~.pallas_deconv.wgrad` (fused Mosaic, segment-stacked for
    ``N > 1``), ``dH`` = the streamed flat-τ fold
    (:func:`_stream_h_contract` — no VMEM-resident flat output).
    Applies exactly where the full fused recon's hgrad accumulator is
    VMEM-gated out; callers gate via
    :func:`~.pallas_deconv.deconv_pallas_w_supported`."""
    from .pallas_deconv import wgrad

    Tk = _PALLAS_TK

    @jax.custom_vjp
    def pallas_w_deconv(H, W):
        return _pallas_recon_forward(H, W)

    def fwd(H, W):
        return pallas_w_deconv(H, W), (H, W)

    def bwd(res, ct):
        H, W = res
        C, R = W.shape[:2]
        N = int(H.shape[0])
        kernel, geom, T_geo, L_flat = _flat_geom(ct.shape, H.shape)
        K = _prod(kernel)
        W2f = _w2f_padded(W)
        ctv = jnp.moveaxis(ct, 1, -1).reshape(N, -1, C)
        dH = _stream_h_contract(
            W2f.reshape(-1, Tk * R, C), (ctv,), H, kernel, False
        )[0]
        if N == 1:
            H2 = _h_flat_nd(H, kernel)
            dW2 = wgrad([ctv[0]], H2, R, Tk, T_geo, interpret=interpret,
                        geom=geom)[0][: K * R]
        else:
            # segment-stacked batched W side (identical to the full
            # fused recon's batched path; the gate's per-batch lp term
            # IS this stacked stride)
            seg = T_geo - 1 + L_flat
            H2 = _h_stacked(H, kernel, T_geo)
            dW2 = wgrad([_cot_stacked(ctv, seg)], H2, R, Tk, T_geo,
                        interpret=interpret, geom=geom,
                        lead_pad=False)[0][: K * R]
        return dH, _w_from_w2(dW2, kernel, R)

    pallas_w_deconv.defvjp(fwd, bwd)
    return pallas_w_deconv


unfold_deconv_pallas_w = _make_pallas_w_unfold_deconv(False)
unfold_deconv_pallas_w_interpret = _make_pallas_w_unfold_deconv(True)


def resolve_pallas_unfold_deconv():
    """Trace-time pick of the compiled vs interpreter custom-vjp deconv
    (two distinct function objects — solver caches keyed on the recon
    callable separate the modes, mirroring the updater factories)."""
    from .pallas_mu import _interpret_mode

    return (
        unfold_deconv_pallas_interpret if _interpret_mode()
        else unfold_deconv_pallas
    )


def resolve_pallas_w_unfold_deconv():
    """Trace-time pick for the hybrid custom-vjp deconv (fused wgrad +
    streamed fold)."""
    from .pallas_mu import _interpret_mode

    return (
        unfold_deconv_pallas_w_interpret if _interpret_mode()
        else unfold_deconv_pallas_w
    )


def nmfd_pallas_updater_factory(beta, gamma, l1_reg, l2_reg):
    """Fused-kernel NMFD updaters (compiled Mosaic)."""
    return _deconv_pallas_updater_factory(beta, gamma, l1_reg, l2_reg,
                                          interpret=False)


def nmfd_pallas_interpret_factory(beta, gamma, l1_reg, l2_reg):
    """Fused-kernel NMFD updaters through the Pallas interpreter (CPU
    testing) — a distinct factory object so solver caches keyed on the
    factory separate the two modes."""
    return _deconv_pallas_updater_factory(beta, gamma, l1_reg, l2_reg,
                                          interpret=True)


def nmf2d_pallas_updater_factory(beta, gamma, l1_reg, l2_reg):
    """Fused-kernel NMF2D updaters (flat-offset Mosaic mode)."""
    return _deconv_pallas_updater_factory(beta, gamma, l1_reg, l2_reg,
                                          interpret=False, spatial_ndim=2)


def nmf2d_pallas_interpret_factory(beta, gamma, l1_reg, l2_reg):
    """NMF2D fused kernels through the Pallas interpreter (CPU tests)."""
    return _deconv_pallas_updater_factory(beta, gamma, l1_reg, l2_reg,
                                          interpret=True, spatial_ndim=2)


def nmf3d_pallas_updater_factory(beta, gamma, l1_reg, l2_reg):
    """Fused-kernel NMF3D updaters (flat-offset Mosaic mode)."""
    return _deconv_pallas_updater_factory(beta, gamma, l1_reg, l2_reg,
                                          interpret=False, spatial_ndim=3)


def nmf3d_pallas_interpret_factory(beta, gamma, l1_reg, l2_reg):
    """NMF3D fused kernels through the Pallas interpreter (CPU tests)."""
    return _deconv_pallas_updater_factory(beta, gamma, l1_reg, l2_reg,
                                          interpret=True, spatial_ndim=3)


def _make_pallas_w_factory(spatial_ndim: int, interpret: bool):
    def factory(beta, gamma, l1_reg, l2_reg):
        return _deconv_pallas_updater_factory(
            beta, gamma, l1_reg, l2_reg, interpret=interpret,
            spatial_ndim=spatial_ndim, h_side="stream",
        )
    factory.__name__ = (
        f"deconv{spatial_ndim}d_pallas_w"
        f"{'_interpret' if interpret else ''}_factory"
    )
    factory.__qualname__ = factory.__name__
    factory.__doc__ = (
        "Hybrid fused-W/streamed-H deconv updaters "
        f"({spatial_ndim}-D{', interpreter' if interpret else ''})."
    )
    return factory


_PALLAS_W_FACTORIES = {
    nd: _make_pallas_w_factory(nd, False) for nd in (1, 2, 3)
}
_PALLAS_W_INTERPRET_FACTORIES = {
    nd: _make_pallas_w_factory(nd, True) for nd in (1, 2, 3)
}


def nmf2d_unfold_updater_factory(beta, gamma, l1_reg, l2_reg):
    """Unfold-GEMM updaters for NMF2D."""
    return _deconv_unfold_updater_factory(2, beta, gamma, l1_reg, l2_reg)


def nmf3d_unfold_updater_factory(beta, gamma, l1_reg, l2_reg):
    """Unfold-GEMM updaters for NMF3D."""
    return _deconv_unfold_updater_factory(3, beta, gamma, l1_reg, l2_reg)


_FACTORIES = {
    1: nmfd_unfold_updater_factory,
    2: nmf2d_unfold_updater_factory,
    3: nmf3d_unfold_updater_factory,
}

_PALLAS_FACTORIES = {
    1: nmfd_pallas_updater_factory,
    2: nmf2d_pallas_updater_factory,
    3: nmf3d_pallas_updater_factory,
}

_PALLAS_INTERPRET_FACTORIES = {
    1: nmfd_pallas_interpret_factory,
    2: nmf2d_pallas_interpret_factory,
    3: nmf3d_pallas_interpret_factory,
}


def resolve_nmfd_updater_factory(multi_device: bool = False,
                                 spatial_ndim: int = 1):
    """Per-call factory resolution for the deconvolutional family
    (mirrors the NMF resolver).

    Multi-device (GSPMD) targets keep the generic engine — the unfold GEMM
    materializes the patch tensor along the sharded time axis; the explicit
    halo solver (:mod:`pytorch_nmf_tpu.parallel.halo`) is the multi-chip
    path.  ``PNT_NMFD_UNFOLD=0`` disables the fast path.
    """
    if multi_device:
        return None
    if os.environ.get("PNT_NMFD_UNFOLD", "") == "0":
        return None
    if spatial_ndim == 1 and os.environ.get("PNT_NMFD_FFT", "") == "1":
        return nmfd_fft_updater_factory
    return _FACTORIES[spatial_ndim]
