r"""Fused Pallas TPU kernels for the 1-D deconvolutional (NMFD) MU engine.

The streaming unfold engine (:mod:`.fast_nmfd`) expresses every heavy
contraction as patch GEMMs, but two of its passes pay large HBM
materializations the GEMMs themselves don't need:

* **H-side fold**: ``neg_H = fold(cot @ W2ᵀ)`` materializes the per-chunk
  ``G (Lp, Tc·R)`` tensors — ~730 MB written + re-read per update at the
  flagship shape (C=1025, L=5000, R=88, T=400) — before overlap-adding
  them into the tiny ``(R, L_in)`` output.
* **W-side patches**: ``neg_W = Pᵀ @ cot`` materializes the patch chunks
  ``P (Lp, Tc·R)`` (the einsum's LHS layout defeats XLA's slice-into-dot
  fusion that makes the *recon* GEMM nearly free).

These kernels compute the same contractions with the intermediates held
in VMEM:

* :func:`hgrad` — the fold, reformulated as a direct correlation
  ``out[r, l'] = Σ_{τ,c} cot[l'+τ, c] · W2[τ·R+r, c]`` and tiled so the
  *whole* ``(R, L_in)`` output accumulates in VMEM across the grid.  Per
  flat-τ ``j`` the contribution is one MXU dot ``(R, Cc) × (Lw, Cc)ᵀ``
  whose M dim is the streamed rank (no 128-padding waste on R) and whose
  N dim is the 128-aligned length axis.  ``G`` never exists.
* :func:`wgrad` — the W-side contraction ``neg_W2[j·R+r, c] =
  Σ_l Hp[l+T-1-τ_j, r] · cot[l, c]`` with the patch rows sliced out of a
  VMEM-resident padded activation per dot — ``P`` never exists.

Both operate on the stream engine's own operand layouts (``W3``'s flat-τ
chunking, channels-last cotangents), so they drop into the existing
updaters without relayout costs; the reconstruction keeps the XLA
streaming GEMMs (measured within 1.2× of the bare-GEMM bound — fusing it
further is not worth a kernel).

Numerics: f32 accumulation everywhere; the summation *order* differs
from the fold/einsum forms (c-block-then-τ instead of τ-chunk GEMMs), a
reordering of the same f32 dot products — the same interchangeability
class as the conv-vs-unfold engines, selected by the measured autotuner
(:mod:`.autotune`).

Reference semantics anchored to torchnmf/nmf.py:779 (the conv
formulation these contractions equal); single-device, ``N == 1``, f32.
Spatial rank 2-3 runs through the *flat-offset* mode (:func:`nd_geom`):
pad the activation's trailing spatial axes to the output widths,
flatten row-major, and N-D full convolution becomes 1-D convolution at
flat offsets ``τ = Σ d_ax · stride_ax`` — wrap-around reads land in the
zero-pad columns, exactly.  Shapes whose hgrad residents exceed the
Mosaic scoped-vmem stack fall to the hybrid ``"pallas_w"`` mode (fused
wgrad + streamed XLA fold) or keep the XLA engines.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import eps
from .pallas_mu import _interpret_mode, pallas_supported  # noqa: F401

__all__ = [
    "hgrad", "wgrad", "deconv_pallas_supported",
    "deconv_pallas_nd_supported", "deconv_pallas_w_supported",
    "halo_pallas_mode", "nd_geom",
]


def _ceil_to(x: int, m: int) -> int:
    return -(-int(x) // m) * m


def _flat_tau(flat, geom):
    """Map a flat kernel-offset index to the flattened-activation offset.

    ``geom = (kdims, strides)`` — row-major mixed-radix decomposition of
    ``flat`` over ``kdims`` dotted with ``strides`` (the flattened
    activation's per-axis strides).  ``None`` is the 1-D identity.  Works
    for traced scalars and Python ints.  Padded offsets beyond
    ``prod(kdims)`` may alias an in-range τ — every aliased contribution
    multiplies a zero kernel row, so it vanishes exactly."""
    if geom is None:
        return flat
    kdims, strides = geom
    tau = flat * 0
    rem = flat
    for k, s in zip(reversed(kdims), reversed(strides)):
        tau = tau + (rem % k) * s
        rem = rem // k
    return tau


def _max_tau(n_flat: int, geom) -> int:
    """Largest activation offset any flat index < ``n_flat`` can map to
    (static bound for the cotangent read window)."""
    if geom is None:
        return n_flat - 1
    return max(_flat_tau(f, geom) for f in range(n_flat))


def nd_geom(kernel, s_pad):
    """``(kdims, strides)`` for an N-D problem whose activation is padded
    to the *output* widths on every trailing spatial axis and flattened
    row-major: full N-D convolution then equals 1-D convolution at flat
    offsets ``τ = Σ d_ax · stride_ax`` (the wrap-around rows land in the
    zero-pad columns — exact, see :func:`deconv_pallas_nd_supported`).

    ``kernel``: spatial kernel dims; ``s_pad``: the padded activation's
    spatial extents (leading extent itself is irrelevant to strides)."""
    strides = []
    acc = 1
    for s in reversed(tuple(s_pad)):
        strides.append(acc)
        acc *= int(s)
    return tuple(int(k) for k in kernel), tuple(reversed(strides))


def _flat_T(geom) -> int:
    """Geometric kernel extent on the flattened axis: ``max real τ + 1``."""
    kdims, strides = geom
    return sum((k - 1) * s for k, s in zip(kdims, strides)) + 1


def _hgrad_scoped_bytes(T_geo: int, L_in: int, R: int) -> int:
    """The hgrad kernel's scoped-VMEM residents: cotangent window,
    TWO copies of the (R, Lw) accumulator (the accumulate's temp
    counts), double-buffered W2 blocks.  Calibrated against a measured
    17.01M OOM at C=256/R=64/flat-15488."""
    lw = _ceil_to(L_in, 128)
    rows = T_geo + lw
    return 4 * (rows * 128 + 2 * R * lw + 2 * _ND_TK * R * 128)


def _wgrad_scoped_bytes(T_geo: int, Lp: int, R: int) -> int:
    """The wgrad kernel's scoped-VMEM residents: the whole padded
    activation (rows × R), double-buffered cotangent blocks (≤1024×512)
    and double-buffered output blocks.  Only binds at large N·L·R
    (batched stacking makes the activation resident grow with N)."""
    rows = _ceil_to(Lp, 1024) + T_geo
    return 4 * (rows * R + 2 * 1024 * 512 + 2 * _ND_TK * R * 512)


def deconv_pallas_supported(V_shape, H_shape, dtype) -> bool:
    """Shape gate for the fused deconv kernels: 1-D, f32, a length axis
    long enough that the 128-lane output padding is noise, and the hgrad
    residents under the Mosaic scoped-vmem stack (very long sequences
    would otherwise OOM the in-VMEM output accumulator).  ``N > 1``
    batches run the *segment-stacked* mode — per-batch T-1 zero
    separators on the flattened length axis absorb cross-batch reads
    exactly, so the kernels see one long sequence.  Everything else
    keeps the XLA engines (the autotuner never offers the candidate)."""
    if not pallas_supported():
        return False
    if len(V_shape) != 3:
        return False
    if dtype is not None and jnp.dtype(dtype) != jnp.float32:
        return False
    N = int(V_shape[0])
    L_in = int(H_shape[2])
    if N * L_in < 256:
        return False
    T = int(V_shape[2]) - L_in + 1
    R = int(H_shape[1])
    # N > 1: both kernels run over the stacked N·(L_in + T - 1) flat
    # positions; the wgrad activation resident grows with N too
    L_h = L_in if N == 1 else N * (L_in + T - 1)
    Lp = N * (L_in + T - 1)
    return (
        _hgrad_scoped_bytes(T, L_h, R) <= _ND_HGRAD_SCOPED_BYTES
        and _wgrad_scoped_bytes(T, Lp, R) <= _ND_HGRAD_SCOPED_BYTES
    )


# Mosaic's scoped-vmem stack is 16 MB; the hgrad kernel's residents are
# the cotangent window (rows × 128 lanes), TWO copies of the (R, Lw)
# output (the accumulate's temp counts), and the double-buffered W2
# blocks — calibrated against a measured 17.01M OOM at C=256/R=64/
# flat 15488 (8.39M window + 2×3.97M out + 1.05M W2).  Keep headroom.
_ND_HGRAD_SCOPED_BYTES = 15 * 2 ** 20


def _halo_nd_first_padded() -> bool:
    """A/B knob: pad the halo N-D activation's FIRST lead axis to its
    output width even at N = 1 (the pre-r4 layout; bit-identical
    trajectories, larger hgrad accumulator).  Resolved per call so tests
    can flip it."""
    import os

    return os.environ.get("PNT_HALO_ND_FIRSTPAD", "") == "1"
# flat-τ offsets per kernel tile — same env knob as fast_nmfd._PALLAS_TK,
# so the layout and the VMEM models cannot drift
_ND_TK = int(__import__("os").environ.get("PNT_PALLAS_TK", "16"))


def deconv_pallas_nd_supported(V_shape, H_shape, dtype) -> bool:
    """Shape gate for the 2-D/3-D fused deconv kernels (flat-offset
    mode): f32, flattened length ≥ 256, and both kernels' total scoped
    VMEM under the Mosaic 16 MB stack.  ``N > 1`` runs the
    segment-stacked mode (per-batch separators on the flat axis).
    Bigger problems keep the XLA unfold/conv engines."""
    if not pallas_supported():
        return False
    nd = len(V_shape) - 2
    if nd not in (2, 3):
        return False
    if dtype is not None and jnp.dtype(dtype) != jnp.float32:
        return False
    N = int(V_shape[0])
    kernel = tuple(
        int(v) - int(h) + 1 for v, h in zip(V_shape[2:], H_shape[2:])
    )
    s_pad = tuple(int(s) for s in V_shape[2 + 1:])  # trailing axes padded
    s_in = tuple(int(s) for s in H_shape[2:])
    l_in = s_in[0]
    for s in s_pad:
        l_in *= s
    if N * l_in < 256:
        return False
    R = int(H_shape[1])
    geom = nd_geom(kernel, (s_in[0],) + s_pad)
    T_geo = _flat_T(geom)
    l_h = l_in if N == 1 else N * (l_in + T_geo - 1)
    lp = N * (l_in + T_geo - 1)
    return (
        _hgrad_scoped_bytes(T_geo, l_h, R) <= _ND_HGRAD_SCOPED_BYTES
        and _wgrad_scoped_bytes(T_geo, lp, R) <= _ND_HGRAD_SCOPED_BYTES
    )


def _base_gate(V_shape, H_shape, dtype) -> int:
    """Common f32/length gate; returns the flat activation length per
    batch element (0 when unsupported)."""
    if not pallas_supported():
        return 0
    nd = len(V_shape) - 2
    if nd not in (1, 2, 3):
        return 0
    if dtype is not None and jnp.dtype(dtype) != jnp.float32:
        return 0
    l_in = int(H_shape[2])
    for s in V_shape[3:]:
        l_in *= int(s)
    return l_in if int(V_shape[0]) * l_in >= 256 else 0


def deconv_pallas_w_supported(V_shape, H_shape, dtype) -> bool:
    """Gate for the *hybrid* mode (fused wgrad + streamed XLA fold):
    applies where the full fused mode is VMEM-gated out by the hgrad
    accumulator — the wgrad kernel holds only the (rows, R) activation
    resident plus streamed cotangent blocks, so its bound is far
    higher.  ``N > 1`` runs the segment-stacked W side (the streamed
    fold handles batches natively; the stacked stride
    ``T_geo - 1 + l_in`` is exactly the gate's per-batch ``lp`` term).
    Offered as the ``"pallas_w"`` autotune candidate exactly when the
    full mode is not."""
    l_in = _base_gate(V_shape, H_shape, dtype)
    if not l_in:
        return False
    nd = len(V_shape) - 2
    N = int(V_shape[0])
    kernel = tuple(
        int(v) - int(h) + 1 for v, h in zip(V_shape[2:], H_shape[2:])
    )
    if nd == 1:
        T_geo = kernel[0]
    else:
        s_pad = (int(H_shape[2]),) + tuple(int(s) for s in V_shape[3:])
        T_geo = _flat_T(nd_geom(kernel, s_pad))
    R = int(H_shape[1])
    lp = N * (l_in + T_geo - 1)
    return _wgrad_scoped_bytes(T_geo, lp, R) <= _ND_HGRAD_SCOPED_BYTES


def halo_pallas_mode(n_batch, C, lead_in, chunk, kernel, R,
                     dtype=None):
    """Which fused per-shard mode the halo solvers' ACTUAL flat layout
    admits: ``"pallas"`` (full fused), ``"pallas_w"`` (hybrid fused-W /
    streamed-H fold), or ``None`` (keep the XLA per-shard engines).

    The single-device gates above model the single-device flat layout
    (leading spatial axis unpadded; batches at stride ``l_in + T - 1``).
    The halo solvers lay shards out differently
    (``parallel/halo.py::pallas_local_fit`` / ``pallas_nd_local_fit``),
    so gating them on the single-device predicates under-counts the
    kernels' residents — a VMEM-over-budget compile the remote Mosaic
    compiler may 500-and-wedge on (CLAUDE.md).  This gate owns the halo
    layout's invariants:

    * 1-D: both kernels run over ``n_batch`` segments of stride
      ``chunk + T - 1`` (the halo frames are per-segment leads), so the
      hgrad accumulator covers ``N·(chunk+T-1)`` flat rows even at
      ``N = 1``;
    * 2-D/3-D: leading local axes are padded to their *output* widths
      (``lead_out = lead_in + k - 1``) before flattening — except the
      FIRST at ``N = 1``, which stays unpadded (strides never involve
      the outermost extent) — the trailing axis is VALID at
      ``Xa = chunk + kx - 1``, and the wgrad activation/cotangent carry
      ``lead_mid = T_flat - kx`` extra rows per segment;
    * batched (``N > 1``) N-D stacking reuses each segment's own
      ``lead_mid`` zeros as the W-side separator, valid only when they
      cover the ≤ ``kx - 1`` cross-segment patch overrun
      (``lead_mid ≥ kx - 1``).

    ``lead_in``: the leading (unsharded) spatial extents of the LOCAL
    activation; ``chunk``: the local trailing-axis activation length.
    Mode selection (``ops/autotune.py::autotune_halo_mode``) trusts this
    predicate and never re-derives the layout."""
    if not pallas_supported():
        return None
    if dtype is not None and jnp.dtype(dtype) != jnp.float32:
        return None
    kernel = tuple(int(k) for k in kernel)
    nd = len(kernel)
    if nd not in (1, 2, 3) or nd != len(tuple(lead_in)) + 1:
        return None
    n_batch, R, chunk = int(n_batch), int(R), int(chunk)
    lead_in = tuple(int(s) for s in lead_in)
    kx = kernel[-1]
    l_flat = chunk
    for s in lead_in:
        l_flat *= s
    if n_batch * l_flat < 256:
        return None
    if nd == 1:
        T_geo = kx
        seg = chunk + T_geo - 1
        l_h = n_batch * seg
        lp = n_batch * seg
    else:
        lead_out = tuple(
            s + k - 1 for s, k in zip(lead_in, kernel[:-1])
        )
        xa = chunk + kx - 1
        T_geo = _flat_T(nd_geom(kernel, lead_out + (xa,)))
        lead_mid = T_geo - kx
        if n_batch > 1 and lead_mid < kx - 1:
            return None
        la = xa
        for s in lead_out:
            la *= s
        # at N = 1 the halo activation keeps its FIRST lead axis unpadded
        # (parallel/halo.py::pallas_nd_local_fit act_lead) — the hgrad
        # accumulator covers only the real slabs
        la_act = (
            la if n_batch > 1 or _halo_nd_first_padded()
            else la // lead_out[0] * lead_in[0]
        )
        l_h = n_batch * la_act
        lp = n_batch * (la + lead_mid)
    if _wgrad_scoped_bytes(T_geo, lp, R) > _ND_HGRAD_SCOPED_BYTES:
        return None
    if _hgrad_scoped_bytes(T_geo, l_h, R) <= _ND_HGRAD_SCOPED_BYTES:
        return "pallas"
    return "pallas_w"


def _hgrad_kernel(R: int, Tk: int, C: int, Lw: int, Cc: int, geom=None):
    def kernel(cot_ref, w2_ref, out_ref):
        c_i = pl.program_id(0)
        k_i = pl.program_id(1)
        w2 = w2_ref[:]  # (Tk*R, Cc)
        # zero the ragged C edge: out-of-bounds block columns are garbage
        # (possibly inf/nan) and would poison the dots; the cotangent side
        # is exactly zero there (padded in HBM), so one mask suffices to
        # make every garbage product 0*0
        col_ok = (
            lax.broadcasted_iota(jnp.int32, (Tk * R, Cc), 1) + c_i * Cc < C
        )
        w2 = jnp.where(col_ok, w2, 0.0)

        # accumulate straight into the VMEM output: a register chain of
        # Tk (R, Lw) partials would keep them all live and blow the
        # scoped-vmem stack (measured 18.5M > 16M at the flagship shape)
        first = (c_i == 0) & (k_i == 0)

        @pl.when(first)
        def _():
            out_ref[:] = jnp.zeros((R, Lw), jnp.float32)

        for j in range(Tk):
            tau = _flat_tau(k_i * Tk + j, geom)
            a = w2[j * R:(j + 1) * R, :]            # (R, Cc)
            b = cot_ref[pl.ds(tau, Lw), :]          # (Lw, Cc)
            out_ref[:] = out_ref[:] + lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    return kernel


def hgrad(cot2, W2f, R: int, Tk: int, L_in: int, interpret=None,
          geom=None):
    """``out (R, L_in)``: ``out[r, l'] = Σ_{j, c} cot2[l'+τ_j, c] ·
    W2f[j·R+r, c]`` — the H-side deconv MU contraction (the fold of
    ``cot @ W2ᵀ``) without materializing ``G``.

    ``cot2 (Lp, C)`` is the channels-last cotangent (rows beyond the real
    conv output length are irrelevant — the valid columns only read rows
    ``< L_in + max τ``); ``W2f (nkr·Tk·R, C)`` is the flat-τ kernel
    operand (``W3.reshape(-1, C)``), zero rows beyond ``K·R``.

    ``geom``: flat-offset map for the N-D mode (:func:`nd_geom`) —
    ``τ_j = _flat_tau(j, geom)``; ``None`` is the 1-D identity
    ``τ_j = j``.
    """
    if interpret is None:
        interpret = _interpret_mode()
    Lp, C = cot2.shape
    KRp = W2f.shape[0]
    assert KRp % (Tk * R) == 0
    nkr = KRp // (Tk * R)
    Lw = _ceil_to(L_in, 128)
    Cc = min(_ceil_to(C, 128), 128)
    nc = -(-C // Cc)
    rows = _ceil_to(max(_max_tau(nkr * Tk, geom) + Lw, Lp), 8)
    # zero row/col pads are real memory: the kernel's dots then meet
    # exact zeros (not block garbage) everywhere past the true extents
    cotp = jnp.pad(cot2, ((0, rows - Lp), (0, nc * Cc - C)))

    out = pl.pallas_call(
        _hgrad_kernel(R, Tk, C, Lw, Cc, geom),
        grid=(nc, nkr),
        in_specs=[
            pl.BlockSpec((rows, Cc), lambda c, k: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Tk * R, Cc), lambda c, k: (k, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, Lw), lambda c, k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, Lw), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * C * Lw * nkr * Tk,
            bytes_accessed=4 * (rows * nc * Cc + KRp * C + R * Lw),
            transcendentals=0,
        ),
        interpret=interpret,
    )(cotp, W2f)
    return out[:, :L_in]


def _wgrad_kernel(R: int, Tk: int, T: int, Lc: int, n_cots: int,
                  mu_epilogue: bool, nl: int, geom=None):
    def kernel(hp_ref, *refs):
        cot_refs = refs[:n_cots]
        if mu_epilogue:
            w2_ref, pos_ref = refs[n_cots], refs[n_cots + 1]
            out_refs = refs[n_cots + 2:]
        else:
            out_refs = refs[n_cots:]
        k_i = pl.program_id(1)
        l_i = pl.program_id(2)

        # no masks needed: the L/C pads of the cotangents, the leading
        # T-1 rows and trailing rows of Hp are all exact zeros in HBM
        cots = [ref[:] for ref in cot_refs]

        contribs = [[] for _ in range(n_cots)]
        for j in range(Tk):
            tau = _flat_tau(k_i * Tk + j, geom)
            # patch rows for flat offset τ: Hp[l + (T-1) - τ, r]; clamp
            # keeps padded offsets (τ ≥ T, or aliased N-D pads) in-bounds
            # — their output rows are zero-kernel padding, dropped by the
            # caller's epilogue
            start = l_i * Lc + jnp.maximum(T - 1 - tau, 0)
            p_j = hp_ref[pl.ds(start, Lc), :]       # (Lc, R)
            for i, cot in enumerate(cots):
                contribs[i].append(lax.dot_general(
                    p_j, cot, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ))  # (R, Cc)

        outs = [
            jnp.concatenate(parts, axis=0) for parts in contribs
        ]  # (Tk*R, Cc)

        @pl.when(l_i == 0)
        def _():
            for ref, o in zip(out_refs, outs):
                ref[:] = o

        @pl.when(l_i != 0)
        def _():
            for ref, o in zip(out_refs, outs):
                ref[:] = ref[:] + o

        if mu_epilogue:
            # fold the β=1 KL multiply into the last accumulation step:
            # the updated kernel leaves VMEM directly, skipping the HBM
            # round trip of (numerator out → XLA epilogue → W2 in/out)
            @pl.when(l_i == nl - 1)
            def _():
                pos = jnp.concatenate(
                    [pos_ref[:, :1]] * Tk, axis=0
                )  # (Tk*R, 1), per-rank KL denominator tiled over τ
                out_refs[0][:] = w2_ref[:] * (
                    (jax.nn.relu(out_refs[0][:]) + eps) / pos
                )

    return kernel


def wgrad(cots2, H2, R: int, Tk: int, T: int, interpret=None,
          mu_w2=None, mu_pos=None, lead_pad: bool = True, geom=None):
    """``outs (nkr·Tk·R, C)``: ``out[j·R+r, c] = Σ_l H2[l-τ_j, r] ·
    cot[l, c]`` (full-conv patch convention: ``P[l, j·R+r] =
    Hp[l+T-1-τ_j, r]`` with ``Hp`` the T-1-zero-padded activation) for
    each cotangent in ``cots2`` — the W-side deconv MU contraction(s)
    without materializing the patch matrix.  The cotangents share the
    in-VMEM patch slices (the β≠1 neg/pos pair costs one patch build).

    ``H2 (L_in, R)``: the raw length-major activation; ``cots2``: list of
    ``(Lp, C)`` channels-last cotangents (``Lp = L_in + T - 1``).  Output
    rows past ``T·R`` (flat-τ padding) are garbage and must be masked by
    the caller's zero-kernel-row multiply.

    ``mu_w2`` + ``mu_pos``: β=1 fused-epilogue mode (single cotangent,
    γ=1, no regularizers): ``mu_w2 (nkr·Tk·R, C)`` is the current kernel
    operand and ``mu_pos (R,)`` the analytic per-rank KL denominator —
    the return value is then the *updated* kernel
    ``w2 · (relu(neg)+eps)/pos`` instead of the raw numerator (padded
    rows exact zero, since ``mu_w2``'s are).

    ``lead_pad=False``: VALID (halo'd) mode — ``H2`` arrives already
    carrying ``T-1`` leading neighbor frames (``L_in + T - 1`` rows, the
    sequence-parallel solvers' ``left_halo`` output), so the kernel
    reads them where the full-conv mode reads zeros; ``Lp`` is then the
    local chunk length (``len(H2) - (T-1)``).

    ``geom``: flat-offset map for the N-D mode (:func:`nd_geom`) —
    ``τ_j = _flat_tau(j, geom)``, with ``T`` the *geometric* flat extent
    (:func:`_flat_T`); ``None`` is the 1-D identity.
    """
    if interpret is None:
        interpret = _interpret_mode()
    mu_epilogue = mu_w2 is not None
    assert not (mu_epilogue and len(cots2) != 1)
    n_cots = len(cots2)
    Lp, C = cots2[0].shape
    K = T  # flat kernel rows; for N-D the row count is prod(kdims), not
    if geom is not None:  # the geometric flat extent T
        K = 1
        for kd in geom[0]:
            K *= kd
    nkr = -(-K // Tk)
    KRp = nkr * Tk * R
    # Cc is the dots' N dim: among the VMEM-safe widths prefer the one
    # wasting the least ragged-C padding (C=1025 → 384 pads 11%, 512
    # pads 33%), breaking ties toward wider tiles
    cap = 512 if n_cots == 1 else 256
    choices = [cc for cc in (512, 384, 256, 128) if cc <= cap]
    Cc = min(_ceil_to(C, 128), min(
        choices, key=lambda cc: (-(-C // cc) * cc, -cc)
    ))
    nc = -(-C // Cc)
    Lc = 1024 if Lp >= 1024 else _ceil_to(Lp, 8)
    nl = -(-Lp // Lc)
    rows = _ceil_to(nl * Lc + T - 1, 8)
    lead = T - 1 if lead_pad else 0
    hp = jnp.pad(H2, ((lead, rows - lead - H2.shape[0]), (0, 0)))
    cotsp = [
        jnp.pad(c2, ((0, nl * Lc - Lp), (0, nc * Cc - C))) for c2 in cots2
    ]

    cot_specs = [
        pl.BlockSpec((Lc, Cc), lambda c, k, l: (l, c),
                     memory_space=pltpu.VMEM)
        for _ in range(n_cots)
    ]
    out_specs = [
        pl.BlockSpec((Tk * R, Cc), lambda c, k, l: (k, c),
                     memory_space=pltpu.VMEM)
        for _ in range(n_cots)
    ]
    in_specs = [
        pl.BlockSpec((rows, R), lambda c, k, l: (0, 0),
                     memory_space=pltpu.VMEM),
    ] + cot_specs
    args = [hp] + cotsp
    if mu_epilogue:
        # the kernel operand rides in unpadded: its ragged-C block edge
        # is garbage, but the epilogue is elementwise, so the garbage
        # stays in the padded output columns the caller crops
        in_specs.append(pl.BlockSpec((Tk * R, Cc), lambda c, k, l: (k, c),
                                     memory_space=pltpu.VMEM))
        args.append(mu_w2)
        in_specs.append(pl.BlockSpec((R, 128), lambda c, k, l: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.broadcast_to(
            jnp.asarray(mu_pos, jnp.float32).reshape(R, 1), (R, 128)
        ))
    outs = pl.pallas_call(
        _wgrad_kernel(R, Tk, T, Lc, n_cots, mu_epilogue, nl, geom),
        grid=(nc, nkr, nl),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(
            jax.ShapeDtypeStruct((KRp, nc * Cc), jnp.float32)
            for _ in range(n_cots)
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * KRp * C * nl * Lc * n_cots,
            bytes_accessed=4 * (rows * R + n_cots * (Lp * C + KRp * C)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return [o[:, :C] for o in outs]
