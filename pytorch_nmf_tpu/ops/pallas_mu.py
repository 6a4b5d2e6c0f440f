r"""Fused Pallas TPU kernels for the β-divergence MU contractions.

The hot loop of dense NMF at β ∉ {2} is, per factor update,

    WH    = H Wᵀ                         (M, K)  — the reconstruction
    C     = f_β(V, WH)                   (M, K)  — elementwise cotangent
    neg_W = Cᵀ H   (K, R)   /   neg_H = C W   (M, R)
    pos_* = analogous with g_β(WH)       (skipped at β=1: analytic)

XLA executes this as GEMM → materialize WH in HBM → elementwise →
GEMM, paying ~3 full (M, K) HBM round-trips per factor.  These kernels
fuse the whole chain: each grid step computes one (bm, bk) tile of WH on
the MXU *in VMEM*, applies the cotangent on the VPU, and immediately
contracts it into the (·, R) accumulator — both numerator and denominator
in a single pass over V.  WH never exists in HBM, and V is read exactly
once per factor update.

Two variants share the tile math:

* ``w_side_contractions`` — contract over rows (M): grid (K-tiles, M-tiles),
  accumulator indexed by the K tile (inner loop over M revisits the output
  block, the standard Pallas accumulation pattern).
* ``h_side_contractions`` — contract over columns (K): grid (M-tiles,
  K-tiles), accumulator indexed by the M tile.

Ragged edges (e.g. the benchmark's K = 1025) are handled by masking the
cotangent tile and factor rows with ``broadcasted_iota`` validity tests —
no host-side padding, no extra HBM copies.

Matmuls run with the MXU's native mixed precision (bfloat16 multiply,
float32 accumulate), matching the precision of the XLA paths on TPU.
Single-device only: under a mesh, wrap via ``shard_map`` (the solver's
GSPMD annotation path falls back to the unfused updaters).

Replaces the reference's autograd double-backward GEMM chain
(torchnmf/nmf.py:52-92) on the performance-critical path.
"""

import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import eps

__all__ = [
    "w_side_contractions",
    "h_side_contractions",
    "fused_beta_loss",
    "pallas_supported",
]

_TPU_PLATFORMS = ("tpu", "axon")


def _interpret_mode() -> bool:
    """Run kernels through the Pallas interpreter (CPU testing escape hatch)."""
    return bool(os.environ.get("PNT_PALLAS_INTERPRET"))


def pallas_supported() -> bool:
    """True when the default backend can run these Mosaic kernels."""
    if os.environ.get("PNT_NO_PALLAS"):
        return False
    if _interpret_mode():
        return True
    try:
        return jax.devices()[0].platform in _TPU_PLATFORMS
    except Exception:  # pragma: no cover
        return False


def _cotangent_tiles(v, wh, beta: float, need_pos: bool):
    """Elementwise β-cotangents on a tile (VPU math; mirrors
    reference nmf.py:61-74)."""
    if beta == 2:
        # reference nmf.py:62-63: neg <- V, pos <- WH (no eps on either)
        return v, (wh if need_pos else None)
    elif beta == 1:
        return v / (wh + eps), None
    elif beta == 0:
        r = 1.0 / (wh + eps)
        return r * r * v, (r if need_pos else None)
    else:
        whe = wh + eps
        p2 = whe ** (beta - 2)  # one pow, shared: whe^(β-1) = whe^(β-2)·whe
        c_neg = p2 * v
        c_pos = (p2 * whe) if need_pos else None
        return c_neg, c_pos


def _dot_tn(x, y):
    """xᵀ @ y (contract leading axes)."""
    return lax.dot_general(
        x, y, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_nn(x, y):
    """x @ y."""
    return lax.dot_general(
        x, y, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_nt(x, y):
    """x @ yᵀ (contract trailing axes)."""
    return lax.dot_general(
        x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _make_kernel(beta, need_pos, M, K, bm, bk, w_side, mu_epilogue=False):
    def kernel(v_ref, a_ref, b_ref, *rest):
        if mu_epilogue:
            pos_ref, out_refs = rest[0], rest[1:]
        else:
            out_refs = rest
        if w_side:
            k_i, m_i = pl.program_id(0), pl.program_id(1)
            inner = m_i
        else:
            m_i, k_i = pl.program_id(0), pl.program_id(1)
            inner = k_i

        a = a_ref[:]  # (bm, R) rows of H
        b = b_ref[:]  # (bk, R) rows of W
        # zero out ragged-edge garbage rows so pad values (possibly inf/nan)
        # cannot poison the accumulations
        m_valid = (
            lax.broadcasted_iota(jnp.int32, (bm, 1), 0) + m_i * bm < M
        )
        k_valid = (
            lax.broadcasted_iota(jnp.int32, (bk, 1), 0) + k_i * bk < K
        )
        a = jnp.where(m_valid, a, 0.0)
        b = jnp.where(k_valid, b, 0.0)

        wh = _dot_nt(a, b)  # (bm, bk) tile of the reconstruction — MXU
        v = v_ref[:]
        valid = (
            lax.broadcasted_iota(jnp.int32, (bm, bk), 0) + m_i * bm < M
        ) & (lax.broadcasted_iota(jnp.int32, (bm, bk), 1) + k_i * bk < K)

        c_neg, c_pos = _cotangent_tiles(v, wh, beta, need_pos)
        c_neg = jnp.where(valid, c_neg, 0.0)
        if need_pos:
            c_pos = jnp.where(valid, c_pos, 0.0)

        if w_side:
            contribs = [_dot_tn(c_neg, a)]  # (bk, R)
            if need_pos:
                contribs.append(_dot_tn(c_pos, a))
        else:
            contribs = [_dot_nn(c_neg, b)]  # (bm, R)
            if need_pos:
                contribs.append(_dot_nn(c_pos, b))

        @pl.when(inner == 0)
        def _():
            for ref, contrib in zip(out_refs, contribs):
                ref[:] = contrib

        @pl.when(inner != 0)
        def _():
            for ref, contrib in zip(out_refs, contribs):
                ref[:] = ref[:] + contrib

        if mu_epilogue:
            # fold the β=1 MU multiply into the final accumulation step:
            # the updated factor leaves VMEM directly, skipping the HBM
            # round-trip of (numerator out -> XLA epilogue -> factor in/out)
            n_inner = pl.num_programs(1)

            @pl.when(inner == n_inner - 1)
            def _():
                acc = out_refs[0][:]
                factor = b if w_side else a  # the factor being updated
                out_refs[0][:] = factor * (
                    (jax.nn.relu(acc) + eps) / pos_ref[:]
                )

    return kernel


def _auto_blocks(M: int, K: int, R: int):
    """Pick (bm, bk).

    Tuned on TPU v5e at the reference benchmark scale: a full-K block (one
    K tile) reads V exactly once per pass with no K-edge waste and measured
    fastest whenever it fits VMEM (~0.38 ms/iter vs 0.45 with K tiling at
    5168x1025 r88); otherwise fall back to 512-wide K tiles.  Block dims
    must be multiples of (8, 128) or equal to the full array dims.
    """
    bm = 512 if M >= 512 else M  # full-dim blocks need no 8-alignment
    # full-K residents: v + wh tiles (bm x K), factor tiles (bm x R and
    # K x R, double-buffered), accumulator/out (bm x R) — all f32.  The
    # R terms matter at high rank: without them a R=512 fit picks bk=K
    # and overflows the ~16 MB VMEM (the remote compiler can 500 and
    # wedge on oversized blocks — CLAUDE.md).
    full_k_bytes = 4 * (3 * bm * K + 2 * bm * R + 2 * K * R)
    if full_k_bytes <= 12 * 1024 * 1024:
        bk = K
    else:
        bk = 512 if K >= 512 else K
    return bm, bk


def _fused_contractions(
    V, H, W, *, beta, need_pos, w_side, bm=None, bk=None, mu_pos=None,
    interpret=None,
):
    # NOTE: intentionally not jitted here — the callers (solver loops) trace
    # it inside their own jit.  ``interpret`` is resolved from the env when
    # not given explicitly; callers whose traces are cached (lru/jit) must
    # pass it explicitly so the decision is part of their cache key.
    # ``mu_pos``: analytic (beta=1) MU denominator, broadcastable (1, R);
    # when given, the kernel returns the UPDATED factor instead of the raw
    # numerator (gamma=1 and no regularizers only — the caller guards this).
    if interpret is None:
        interpret = _interpret_mode()
    M, K = V.shape
    R = H.shape[1]
    auto_bm, auto_bk = _auto_blocks(M, K, R)
    bm = auto_bm if bm is None else bm
    bk = auto_bk if bk is None else bk
    nm, nk = pl.cdiv(M, bm), pl.cdiv(K, bk)
    mu_epilogue = mu_pos is not None
    assert not (mu_epilogue and need_pos)

    kernel = _make_kernel(beta, need_pos, M, K, bm, bk, w_side, mu_epilogue)

    v_spec = pl.BlockSpec(
        (bm, bk),
        (lambda k, m: (m, k)) if w_side else (lambda m, k: (m, k)),
        memory_space=pltpu.VMEM,
    )
    a_spec = pl.BlockSpec(
        (bm, R),
        (lambda k, m: (m, 0)) if w_side else (lambda m, k: (m, 0)),
        memory_space=pltpu.VMEM,
    )
    b_spec = pl.BlockSpec(
        (bk, R),
        (lambda k, m: (k, 0)) if w_side else (lambda m, k: (k, 0)),
        memory_space=pltpu.VMEM,
    )
    if w_side:
        grid = (nk, nm)
        out_spec = pl.BlockSpec(
            (bk, R), lambda k, m: (k, 0), memory_space=pltpu.VMEM
        )
        out_rows = nk * bk
        crop = K
    else:
        grid = (nm, nk)
        out_spec = pl.BlockSpec(
            (bm, R), lambda m, k: (m, 0), memory_space=pltpu.VMEM
        )
        out_rows = nm * bm
        crop = M

    n_out = 2 if need_pos else 1
    flops_per_out = 2 * M * K * R
    cost = pl.CostEstimate(
        flops=flops_per_out * (1 + n_out),
        bytes_accessed=4 * (M * K + M * R + K * R + n_out * crop * R),
        transcendentals=(M * K if beta not in (0, 1) else 0),
    )

    in_specs = [v_spec, a_spec, b_spec]
    args = [V, H, W]
    if mu_epilogue:
        in_specs.append(
            pl.BlockSpec(
                (1, R),
                (lambda k, m: (0, 0)) if w_side else (lambda m, k: (0, 0)),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(jnp.broadcast_to(mu_pos, (1, R)).astype(jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple([out_spec] * n_out),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((out_rows, R), jnp.float32)] * n_out
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(*args)

    outs = tuple(o[:crop] for o in outs)
    return outs if need_pos else (outs[0], None)


def _loss_kernel(beta, M, K, bm, bk):
    def kernel(v_ref, a_ref, b_ref, out_ref):
        m_i, k_i = pl.program_id(0), pl.program_id(1)
        a = a_ref[:]
        b = b_ref[:]
        m_valid = lax.broadcasted_iota(jnp.int32, (bm, 1), 0) + m_i * bm < M
        k_valid = lax.broadcasted_iota(jnp.int32, (bk, 1), 0) + k_i * bk < K
        a = jnp.where(m_valid, a, 0.0)
        b = jnp.where(k_valid, b, 0.0)
        wh = _dot_nt(a, b)
        v = v_ref[:]
        valid = (
            lax.broadcasted_iota(jnp.int32, (bm, bk), 0) + m_i * bm < M
        ) & (lax.broadcasted_iota(jnp.int32, (bm, bk), 1) + k_i * bk < K)

        # per-element β-divergence terms (reference metrics.py semantics)
        if beta == 2:
            d = wh - v
            terms = 0.5 * d * d
        elif beta == 1:
            terms = v * (jnp.log(v + eps) - jnp.log(wh + eps)) - v + wh
        elif beta == 0:
            te, ie = v + eps, wh + eps
            terms = te / ie - jnp.log(te) + jnp.log(ie) - 1.0
        else:
            t = v + eps if beta < 0 else v
            ie = wh + eps
            ie_bm1 = ie ** (beta - 1)  # share: ie^β = ie^(β-1)·ie
            terms = (
                t**beta + (beta - 1) * ie_bm1 * ie - beta * t * ie_bm1
            ) / (beta * (beta - 1))

        partial = jnp.sum(jnp.where(valid, terms, 0.0))

        @pl.when((m_i == 0) & (k_i == 0))
        def _():
            out_ref[0, 0] = partial

        @pl.when(~((m_i == 0) & (k_i == 0)))
        def _():
            out_ref[0, 0] = out_ref[0, 0] + partial

    return kernel


def fused_beta_loss(V, H, W, beta: float, interpret=None):
    """Fused ``beta_div(H Wᵀ, V, β)`` — the reconstruction never leaves
    VMEM.  Used for the solvers' every-10-iterations loss cadence."""
    if interpret is None:
        interpret = _interpret_mode()
    M, K = V.shape
    R = H.shape[1]
    bm, bk = _auto_blocks(M, K, R)
    nm, nk = pl.cdiv(M, bm), pl.cdiv(K, bk)
    kernel = _loss_kernel(beta, M, K, bm, bk)

    out = pl.pallas_call(
        kernel,
        grid=(nm, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda m, k: (m, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, R), lambda m, k: (m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, R), lambda m, k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1), lambda m, k: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * R,
            bytes_accessed=4 * (M * K + M * R + K * R),
            transcendentals=(M * K if beta not in (2,) else 0),
        ),
        interpret=interpret,
    )(V, H, W)
    return out[0, 0]


def w_side_contractions(V, H, W, beta: float, need_pos: bool = True,
                        interpret=None):
    """Fused ``(neg_W, pos_W)`` = ``(f_β(V, HWᵀ)ᵀ H, g_β(HWᵀ)ᵀ H)``.

    ``V (M, K)``, ``H (M, R)``, ``W (K, R)`` → outputs ``(K, R)``.
    ``pos_W`` is ``None`` when ``need_pos=False`` (β=1 analytic shortcut).
    """
    return _fused_contractions(
        V, H, W, beta=beta, need_pos=need_pos, w_side=True,
        interpret=interpret,
    )


def h_side_contractions(V, H, W, beta: float, need_pos: bool = True,
                        interpret=None):
    """Fused ``(neg_H, pos_H)`` = ``(f_β(V, HWᵀ) W, g_β(HWᵀ) W)``.

    ``V (M, K)``, ``H (M, R)``, ``W (K, R)`` → outputs ``(M, R)``.
    """
    return _fused_contractions(
        V, H, W, beta=beta, need_pos=need_pos, w_side=False,
        interpret=interpret,
    )
