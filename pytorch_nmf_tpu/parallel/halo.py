r"""Sequence-parallel deconvolutional NMF via halo exchange (1-D/2-D/3-D).

The reference's long-sequence workload is NMFD over audio spectrograms
(T≈400-frame kernels over thousands of frames, one cuDNN conv1d call;
reference nmf.py:779, examples/librosa_example.py).  On a TPU mesh the
convolution *time axis* (the trailing spatial axis, for the 2-D/3-D
variants too) is the natural shard axis; correctness then needs a halo of
``T - 1`` frames exchanged between ring neighbors each iteration — the
ring-attention-style blockwise structure, without attention
(SURVEY.md §5 "long-context / sequence parallelism").

Construction:

* ``H`` is zero-padded along the trailing axis from ``L_in`` to ``L_out``
  so both the target ``V`` and the activations shard evenly; padded entries
  start at zero and *stay* zero under multiplicative updates
  (0 · anything = 0), so the padded problem is exactly equivalent.
* The forward map per device: ``ppermute`` the last ``T-1`` local frames
  from the left neighbor, then convolve.  The conv per-shard mode keeps
  the local activations at their native shard width — the ``T-1`` left
  pad lives in the conv's *padding config* and the received frames fold
  in through a tiny strip GEMM (``_conv_halo_split_nd``; a materialized
  concat re-tiles the trailing minor axis and measured +16%/iter at the
  2-D bench shape — tools/bisect_halo2d_tax.py).  The GEMM modes
  concatenate and unfold — VALID along the halo'd trailing axis, full
  padding along the local leading spatial axes.
* The MU numerator/denominator come from ``jax.vjp`` **through the halo
  exchange**: the cotangent of ``ppermute`` is the reverse ``ppermute``, so
  the adjoint right-halo falls out of autodiff instead of hand-written
  index bookkeeping.  Kernel cotangents of the replicated ``W`` are
  auto-``psum``'d by shard_map's replication tracking.

Per MU iteration per factor: one halo ``ppermute`` (forward), one reverse
``ppermute`` (adjoint), one ``psum`` for the kernel contraction — all ICI.
"""

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import eps
from ..metrics import beta_div
from ..ops.fast_nmfd import (
    _CHUNK_COLS,
    _DEFAULT_MAX_BYTES,
    _chunk_tc,
    _dot,
    _prod,
    _stream_contractions_h,
    _stream_recon,
    _stream_upd_w,
    _streaming_dims,
    _w2,
    _w2f_padded,
    _w3_from_w,
    _w_from_w3,
    unfold_patches_nd,
)
from ..ops.mu import gamma_from_beta, mu_cotangents, mu_multiplier
from ..ops.solver import _converging_loop

__all__ = [
    "left_halo",
    "halo_adjoint",
    "halo_recv",
    "halo_adjoint_strip",
    "sharded_nmfd_fit",
    "sharded_nmf2d_fit",
    "sharded_nmf3d_fit",
    "sharded_siplca_fit",
    "sharded_siplca2_fit",
    "sharded_siplca3_fit",
]


def left_halo(x, halo: int, axis_name: str):
    """Prepend the last ``halo`` frames of the left ring neighbor along the
    trailing axis (device 0 receives zeros).  Differentiable: the VJP is the
    reverse permutation of the trailing-edge cotangent."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    tail = x[..., x.shape[-1] - halo:]
    recv = lax.ppermute(
        tail, axis_name, [(d, (d + 1) % n) for d in range(n)]
    )
    recv = jnp.where(idx == 0, jnp.zeros_like(recv), recv)
    return jnp.concatenate([recv, x], axis=-1)


_CONV_LETTERS = {1: "H", 2: "HW", 3: "DHW"}


def _unfold_halo_nd(Hh, W, spatial_ndim: int):
    """Same output as ``_conv_halo_nd`` (to f32 rounding) but expressed as
    a patch GEMM (full padding on the leading local spatial axes, VALID on
    the halo'd trailing axis), so every heavy op — and, through ``jax.vjp``,
    every MU contraction — is an MXU GEMM instead of a rank-starved
    convolution (see :mod:`pytorch_nmf_tpu.ops.fast_nmfd`)."""
    kernel = W.shape[2:]
    pad = (True,) * (spatial_ndim - 1) + (False,)
    N = Hh.shape[0]
    C = W.shape[0]
    S_out = tuple(
        s + k - 1 if p else s - k + 1
        for s, k, p in zip(Hh.shape[2:], kernel, pad)
    )
    P_mat = unfold_patches_nd(Hh, kernel, pad)   # (N, prod(S_out), K·R)
    WH2 = _dot(P_mat, _w2(W))                    # (N, prod(S_out), C)
    return jnp.moveaxis(WH2.reshape((N,) + S_out + (C,)), -1, 1)


def _halo_unfold_mode(n_batch, lead_shapes, chunk, kernel, R) -> str:
    """Which per-shard reconstruction form the halo solver uses:

    * ``"unrolled"`` — one full patch GEMM under ``jax.vjp`` (small
      ``K·R``, patch tensor within the memory budget; the vjp keeps the
      patch matrix as a residual alongside the cotangent GEMM operand, so
      budget ~2 live copies);
    * ``"stream"`` — hand-written flat-τ-chunk scans with explicit psum /
      reverse-``ppermute`` adjoints (long kernels whose unrolled patch
      matrix would blow the XLA graph or the budget — the reference's
      flagship T=400 NMFD kernels on small local chunks land here);
    * ``"conv"`` — the XLA convolution formulation (fallback).
    """
    if os.environ.get("PNT_HALO_UNFOLD", "") == "0":
        return "conv"
    K = _prod(kernel)
    if K < 2:
        return "conv"
    Lp = chunk
    for s, k in zip(lead_shapes, kernel[:-1]):
        Lp *= s + k - 1
    from ..ops.budget import budget_bytes
    from ..ops.fast_nmfd import _UNFOLD_HBM_FRACTION

    max_bytes = budget_bytes(
        "PNT_NMFD_UNFOLD_MAX_BYTES", _DEFAULT_MAX_BYTES, _UNFOLD_HBM_FRACTION
    )
    if K * R <= _CHUNK_COLS:
        if 4 * n_batch * Lp * K * R * 2 <= max_bytes:
            return "unrolled"
        return "conv"
    Tc = _chunk_tc(R, K)
    if 4 * n_batch * Lp * Tc * R * 2 <= max_bytes:
        return "stream"
    return "conv"


def halo_adjoint(g, halo: int, axis_name: str):
    """Adjoint of :func:`left_halo`: the cotangent of the received-halo
    frames belongs to the *left* neighbor's trailing frames — zero it on
    device 0 (whose halo was zeros), reverse-``ppermute`` it, and add it to
    the local trailing edge.  Identical to the transpose ``jax.vjp``
    derives for :func:`left_halo`; written out because the streaming-τ MU
    path is hand-differentiated."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    ghalo = g[..., :halo]
    gx = g[..., halo:]
    ghalo = jnp.where(idx == 0, jnp.zeros_like(ghalo), ghalo)
    send = lax.ppermute(
        ghalo, axis_name, [(d, (d - 1) % n) for d in range(n)]
    )
    L = gx.shape[-1]
    return gx.at[..., L - halo:].add(send)


def halo_recv(x, halo: int, axis_name: str):
    """The received frames of :func:`left_halo` WITHOUT the concatenation:
    the left ring neighbor's trailing ``halo`` frames (zeros on device 0).
    The split conv formulation keeps the local activations at their native
    shard width and folds these frames in separately — materializing the
    ``chunk + halo``-wide concat measured +0.27 ms/iter on the r5 NMF2D
    halo bench shape (tools/bisect_halo2d_tax.py: the identical conv with
    the pad in the *padding config* costs 0.04 ms)."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    tail = x[..., x.shape[-1] - halo:]
    recv = lax.ppermute(
        tail, axis_name, [(d, (d + 1) % n) for d in range(n)]
    )
    return jnp.where(idx == 0, jnp.zeros_like(recv), recv)


def halo_adjoint_strip(gh, gr, halo: int, axis_name: str):
    """Adjoint of the split formulation's halo path: ``gh`` is the
    cotangent at the local activations' native width, ``gr`` the cotangent
    of the received frames (which belong to the left neighbor's trailing
    edge).  Same semantics as :func:`halo_adjoint` with the concat-width
    cotangent pre-split by ``jax.vjp``."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    gr = jnp.where(idx == 0, jnp.zeros_like(gr), gr)
    send = lax.ppermute(
        gr, axis_name, [(d, (d - 1) % n) for d in range(n)]
    )
    L = gh.shape[-1]
    return gh.at[..., L - halo:].add(send)


def _conv_halo_split_nd(Hp, recv, W, spatial_ndim: int):
    """Split form of ``_conv_halo_nd(concatenate([recv, Hp]), W)``: the
    main convolution runs on ``Hp`` at its native shard width with the
    ``T - 1`` left pad expressed in the *padding config* (XLA:TPU lowers
    the implicit-pad conv like the single-device symmetric one — the
    materialized concat costs +16% at the 2-D bench shape,
    tools/bisect_halo2d_tax.py), and the received frames' contribution to
    the first ``T - 1`` output columns is a tiny patch GEMM (a ``T - 1``
    -wide strip *convolution* is rank-starved and measured 1.46x plain).
    Same contractions as the concat form, f32 summation order differs
    (the strip terms accumulate separately) — the same numerical class as
    the conv-vs-unfold candidate pair."""
    spatial = tuple(range(2, 2 + spatial_ndim))
    Wf = jnp.flip(W, axis=spatial)
    T = int(W.shape[spatial[-1]])
    halo = T - 1
    pads = [(W.shape[d] - 1, W.shape[d] - 1) for d in spatial[:-1]]
    pads.append((T - 1, 0))
    letters = _CONV_LETTERS[spatial_ndim]
    dn = lax.conv_dimension_numbers(
        Hp.shape, Wf.shape, ("NC" + letters, "OI" + letters, "NC" + letters)
    )
    out = lax.conv_general_dilated(
        Hp, Wf, (1,) * spatial_ndim, pads, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    if halo == 0:
        return out
    # strip[j] = Σ_{τ : j+τ < halo} Wf[τ]·recv[j+τ]  (j = 0..halo-1): the
    # concat form's terms that the (T-1, 0) padding zeroed — a VALID
    # trailing unfold of recv right-padded by T-1 (leading axes full, like
    # the main conv)
    rp = [(0, 0)] * (recv.ndim - 1) + [(0, T - 1)]
    strip = _unfold_halo_nd(jnp.pad(recv, rp), W, spatial_ndim)
    return out.at[..., :halo].add(strip)


def halo_conv_split_default() -> bool:
    """Whether the conv per-shard mode uses the split formulation
    (default).  ``PNT_HALO_CONV=concat`` restores the materialized-concat
    form (the pre-r5 behavior); ``PNT_HALO_CONV=sym`` implies concat (the
    sym A/B rewrites the concat conv's trailing padding)."""
    return os.environ.get("PNT_HALO_CONV", "") not in ("sym", "concat")


def _conv_halo_nd(H, W, spatial_ndim: int):
    """True convolution: full padding on the leading (local) spatial axes,
    VALID on the halo'd trailing axis.  Trailing out length =
    ``L_halo - T + 1`` = the device's chunk.

    ``PNT_HALO_CONV=sym`` computes the identical result via symmetric
    full padding on the trailing axis followed by a static slice
    (``out_full[..., T-1 : T-1+chunk]``): ~``2(T-1)/chunk`` more output
    columns, but candidate for a faster XLA:TPU lowering than the
    mixed full/VALID padding (the single-device solvers run the
    all-symmetric conv) — an A/B knob for the n=1 halo-overhead tax."""
    spatial = tuple(range(2, 2 + spatial_ndim))
    Wf = jnp.flip(W, axis=spatial)
    sym = os.environ.get("PNT_HALO_CONV", "") == "sym"
    T = int(W.shape[spatial[-1]])
    pads = [(W.shape[d] - 1, W.shape[d] - 1) for d in spatial[:-1]]
    pads.append((T - 1, T - 1) if sym else (0, 0))
    letters = _CONV_LETTERS[spatial_ndim]
    dn = lax.conv_dimension_numbers(
        H.shape, Wf.shape, ("NC" + letters, "OI" + letters, "NC" + letters)
    )
    out = lax.conv_general_dilated(
        H, Wf, (1,) * spatial_ndim, pads, dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )
    if sym:
        chunk = int(H.shape[-1]) - T + 1
        out = lax.slice_in_dim(out, T - 1, T - 1 + chunk, axis=out.ndim - 1)
    return out


@lru_cache(maxsize=None)
def _get_sharded_deconv_fit(
    mesh: Mesh,
    spatial_ndim: int,
    T: int,  # trailing-axis kernel size
    beta: float,
    tol: float,
    max_iter: int,
    l1_reg: float,
    l2_reg: float,
    seq_axis: str,
    loss_offset: float = 0.0,
    mode: str = "conv",
    update_W: bool = True,
    update_H: bool = True,
    verbose: bool = False,
    nd_first_padded: bool = False,
    shared_hh: bool = True,
    conv_split: bool = False,
):
    # Verbose fits record the cadence losses in the loop carry and replay
    # them after the program (the record-and-replay channel built for
    # callback-less backends, ops/solver.py) — a jax.debug.callback inside
    # shard_map would fire once per device, so the halo solvers never
    # stream progress events live.
    gamma = gamma_from_beta(beta)
    halo = T - 1
    nd = spatial_ndim

    def _kl_shape(ref_ndim):
        return (1, -1) + (1,) * (ref_ndim - 2)

    def stream_local_fit(V, W, Hp):
        """Flat-τ streaming MU with hand-written adjoints: the per-shard
        patch tensor is never materialized (a VMEM-sized τ-chunk at a time;
        :mod:`pytorch_nmf_tpu.ops.fast_nmfd`), the W contractions psum per
        chunk before the relu/eps clamps, and the activation cotangent's
        halo frames ship back through :func:`halo_adjoint` — the explicit
        form of the same one-ppermute-each-way communication pattern the
        vjp path uses."""
        kernel = tuple(int(k) for k in W.shape[2:])
        C, R = int(W.shape[0]), int(W.shape[1])
        N = V.shape[0]
        V2 = jnp.moveaxis(V, 1, -1).reshape(N, -1, C)
        pad = (True,) * (nd - 1) + (False,)
        sum_axes = (0,) + tuple(range(2, 2 + nd))
        need_pos = beta != 1
        Tc, _, _ = _streaming_dims(R, _prod(kernel))

        def loss_of(state):
            w3, hp = state
            hh = left_halo(hp, halo, seq_axis)
            part = beta_div(
                _stream_recon(w3, hh, kernel, pad, varying_axis=seq_axis),
                V2, beta,
            )
            total = lax.psum(part, seq_axis) - loss_offset
            return jnp.sqrt(2.0 * jnp.maximum(total, 0.0))

        def one_iter(state):
            w3, hp = state
            hh = left_halo(hp, halo, seq_axis)

            # ---- W update (fused streaming; globally summed per chunk)
            if update_W:
                if beta == 1:
                    s = lax.psum(jnp.sum(hp, axis=sum_axes), seq_axis)
                    pos_tiled = jnp.tile(s, Tc)[:, None]
                else:
                    pos_tiled = None
                w3 = _stream_upd_w(
                    V2, w3, hh, kernel, beta, gamma, l1_reg, l2_reg,
                    pos_tiled, pad=pad, psum_axis=seq_axis,
                )

            # ---- H update with the new kernel; same (old) halo'd hp
            if update_H:
                negHh, posHh = _stream_contractions_h(
                    V2, w3, hh, kernel, beta, need_pos, pad,
                    varying_axis=seq_axis,
                )
                neg = jax.nn.relu(halo_adjoint(negHh, halo, seq_axis)) + eps
                if beta == 1:
                    s2 = jnp.sum(w3.reshape(-1, R, C), axis=(0, 2))
                    pos = s2.reshape((1, R) + (1,) * nd)
                else:
                    pos = (
                        jax.nn.relu(halo_adjoint(posHh, halo, seq_axis))
                        + eps
                    )
                hp = hp * mu_multiplier(
                    neg, pos, hp, gamma, l1_reg, l2_reg
                )
            return w3, hp

        W3 = _w3_from_w(W)
        (W3, Hp), k, converged, trace = _converging_loop(
            one_iter, loss_of, (W3, Hp), tol, max_iter, verbose,
            record=verbose,
        )
        n_iter = jnp.where(converged, k * 10, max_iter)
        out = (_w_from_w3(W3, kernel, R), Hp, n_iter)
        return out + (k, trace[0]) if verbose else out

    def pallas_local_fit(V, W, Hp):
        """Per-shard fused Mosaic contractions (1-D; the measured
        ``"pallas"`` halo mode): same collectives as the stream mode —
        one ``psum`` of the W numerators *before* the relu/eps clamps
        (so the update equals the single-device trajectory), one reverse
        ``ppermute`` (:func:`halo_adjoint`) for the activation
        cotangent's halo frames — with the per-shard patch/fold
        contractions running :mod:`pytorch_nmf_tpu.ops.pallas_deconv` in
        VALID (halo'd) mode.

        ``N > 1`` stacks the batches on the flat axis with the halo
        frames as per-segment leads (stride ``chunk + T - 1`` on both
        operands); the W-side cotangent segments carry ``T - 1``
        trailing zero rows, the H-side ``T - 1`` leading ones — every
        cross-segment patch read lands in a neighbor's halo/zero lead
        (overrun provably < T - 1)."""
        from ..ops.fast_nmfd import _PALLAS_TK
        from ..ops.pallas_deconv import hgrad, wgrad
        from ..ops.pallas_mu import _interpret_mode

        interpret = _interpret_mode()
        T_ = int(W.shape[2])
        C, R = int(W.shape[0]), int(W.shape[1])
        N = V.shape[0]
        chunk = int(V.shape[2])
        seg = chunk + T_ - 1  # stacked per-batch stride (both operands)
        V2 = jnp.moveaxis(V, 1, -1).reshape(N, -1, C)
        Tk = _PALLAS_TK
        nkr = -(-T_ // Tk)
        kern = (T_,)
        pad1 = (False,)

        def recon(w2f, hh):
            # no varying_axis tag: this mode's shard_map runs with
            # check_vma=False (Mosaic outputs carry no vma)
            return _stream_recon(
                w2f.reshape(nkr, Tk * R, C), hh, kern, pad1,
            )

        def loss_of(state):
            w2f, hp = state
            hh = left_halo(hp, halo, seq_axis)
            part = beta_div(recon(w2f, hh), V2, beta)
            total = lax.psum(part, seq_axis) - loss_offset
            return jnp.sqrt(2.0 * jnp.maximum(total, 0.0))

        def one_iter(state):
            w2f, hp = state
            hh = left_halo(hp, halo, seq_axis)
            # stacked halo'd activation: (N·(chunk+T-1), R); for N = 1
            # this is exactly the single-batch layout
            H2h = jnp.moveaxis(hh, 1, 2).reshape(-1, R)

            if update_W:
                WH2 = recon(w2f, hh)
                neg_cot, pos_cot = mu_cotangents(V2, WH2, beta)

                def w_stack(cot):
                    # trailing T-1 zero rows equalize the cot segment
                    # stride with the activation's; zero cot rows
                    # contribute nothing to the contraction
                    return jnp.pad(
                        cot, ((0, 0), (0, T_ - 1), (0, 0))
                    ).reshape(-1, C)

                # psum the raw numerators BEFORE the clamps — elementwise
                # identical to the stream mode's per-chunk psums
                neg = lax.psum(
                    wgrad([w_stack(neg_cot)], H2h, R, Tk, T_,
                          interpret=interpret, lead_pad=False)[0],
                    seq_axis,
                )
                neg = jax.nn.relu(neg) + eps
                if beta == 1:
                    s = lax.psum(
                        jnp.sum(hp, axis=(0, 2)), seq_axis
                    )  # (R,)
                    pos = jnp.tile(s, nkr * Tk)[:, None]
                else:
                    pos = lax.psum(
                        wgrad([w_stack(pos_cot)], H2h, R, Tk, T_,
                              interpret=interpret, lead_pad=False)[0],
                        seq_axis,
                    )
                    pos = jax.nn.relu(pos) + eps
                w2f = w2f * mu_multiplier(
                    neg, pos, w2f, gamma, l1_reg, l2_reg
                )

            if update_H:
                if mode == "pallas_w":
                    # hybrid: streamed XLA fold (identical contraction,
                    # no VMEM-resident flat output) on the Tk-chunked
                    # kernel operand — τ-padded rows are zero and
                    # contribute nothing
                    need_pos = beta != 1
                    negHh, posHh = _stream_contractions_h(
                        V2, w2f.reshape(nkr, Tk * R, C), hh, kern, beta,
                        need_pos, pad1,
                    )
                    neg = (
                        jax.nn.relu(halo_adjoint(negHh, halo, seq_axis))
                        + eps
                    )
                    if beta == 1:
                        s2 = jnp.sum(w2f.reshape(-1, R, C), axis=(0, 2))
                        pos = s2.reshape(1, R, 1)
                    else:
                        pos = (
                            jax.nn.relu(
                                halo_adjoint(posHh, halo, seq_axis)
                            )
                            + eps
                        )
                    hp = hp * mu_multiplier(
                        neg, pos, hp, gamma, l1_reg, l2_reg
                    )
                    return w2f, hp

                WH2 = recon(w2f, hh)
                neg_cot, pos_cot = mu_cotangents(V2, WH2, beta)

                def h_contract(cot):
                    # leading T-1 zero rows per segment: the fold reads
                    # past a segment's real cotangent land in the NEXT
                    # segment's lead zeros (overrun ≤ T-2)
                    cotpad = jnp.pad(
                        cot, ((0, 0), (T_ - 1, 0), (0, 0))
                    ).reshape(-1, C)
                    out = hgrad(cotpad, w2f, R, Tk, N * seg,
                                interpret=interpret)
                    out = jnp.moveaxis(out.reshape(R, N, seg), 1, 0)
                    return halo_adjoint(out, halo, seq_axis)

                neg = jax.nn.relu(h_contract(neg_cot)) + eps
                if beta == 1:
                    s2 = jnp.sum(w2f.reshape(-1, R, C), axis=(0, 2))
                    pos = s2.reshape(1, R, 1)
                else:
                    pos = jax.nn.relu(h_contract(pos_cot)) + eps
                hp = hp * mu_multiplier(
                    neg, pos, hp, gamma, l1_reg, l2_reg
                )
            return w2f, hp

        W2f = _w2f_padded(W)
        (W2f, Hp), k, converged, trace = _converging_loop(
            one_iter, loss_of, (W2f, Hp), tol, max_iter, verbose,
            record=verbose,
        )
        n_iter = jnp.where(converged, k * 10, max_iter)
        from ..ops.fast_nmfd import _w_from_w2

        out = (_w_from_w2(W2f[: T_ * R], kern, R), Hp, n_iter)
        return out + (k, trace[0]) if verbose else out

    def pallas_nd_local_fit(V, W, Hp):
        """2-D/3-D fused per-shard mode: the flat-offset kernels with a
        VALID (halo'd) trailing axis.  Middle spatial axes are padded to
        their *output* widths (trailing zeros; the FIRST lead axis stays
        unpadded at N = 1 — see ``act_lead`` below) and the global
        ``T_flat - 1`` lead comes from the kernels' own ``lead_pad`` —
        the single-device flat-mode exactness argument carries over
        verbatim, with the halo frames playing the role of the trailing
        axis's padding (reads never wrap on the VALID axis:
        ``x + kx-1-dx ≤ Xa - 1``).  Collectives are identical to the
        1-D mode: psum'd raw W numerators, reverse-ppermute halo
        adjoint.

        ``N > 1`` stacks the batches on the flat axis with NO extra
        separators: on the W side each segment's own ``lead_mid``
        zeros (the middle-axis lead it carries anyway) absorb the
        ≤ ``kx - 1`` cross-segment patch overrun (the autotune gate
        requires ``lead_mid ≥ kx - 1``); on the H side the per-row
        ``kx - 1`` leading cotangent pads absorb the ≤ ``kx - 2``
        overrun of every *used* (non-cropped) output row, and cropped
        rows may read the next segment's real values harmlessly."""
        from ..ops.fast_nmfd import _PALLAS_TK
        from ..ops.pallas_deconv import _flat_T, hgrad, nd_geom, wgrad
        from ..ops.pallas_mu import _interpret_mode

        interpret = _interpret_mode()
        kernel = tuple(int(k) for k in W.shape[2:])
        kx = kernel[-1]
        C, R = int(W.shape[0]), int(W.shape[1])
        N = int(V.shape[0])
        chunk = int(V.shape[-1])
        lead_in = tuple(int(s) for s in Hp.shape[2:-1])
        lead_out = tuple(
            s + k - 1 for s, k in zip(lead_in, kernel[:-1])
        )
        Xa = chunk + kx - 1
        geom = nd_geom(kernel, lead_out + (Xa,))
        T_flat = _flat_T(geom)
        K = _prod(kernel)
        Tk = _PALLAS_TK
        nkr = -(-K // Tk)
        padv = (True,) * (nd - 1) + (False,)
        V2 = jnp.moveaxis(V, 1, -1).reshape(N, -1, C)

        def recon(w2f, hh):
            return _stream_recon(
                w2f.reshape(nkr, Tk * R, C), hh, kernel, padv,
            )

        # the VALID trailing axis contributes NO lead: the activation's
        # global lead is Σ_{ax<last} (k_ax - 1)·stride_ax = T_flat - kx
        lead_mid = T_flat - kx
        # The FIRST lead axis needs no output-width padding at N = 1:
        # flat-offset strides never involve the outermost extent, reads
        # past the real slabs land in the kernels' own trailing zero pad
        # instead of explicit pad slabs (bit-identical products), and the
        # hgrad output simply drops rows that were cropped garbage anyway
        # — the same argument that keeps the single-device layout's first
        # axis unpadded (ops/fast_nmfd._flat_geom).  That cuts the hgrad
        # accumulator and its dot count by lead_out[0]/lead_in[0] and
        # widens the full-fused-mode VMEM admission window.  N > 1 keeps
        # the padded first axis: stacked segments need equal flat strides
        # in the activation and cotangent layouts.
        # PNT_HALO_ND_FIRSTPAD=1 restores the padded layout (A/B tool;
        # trajectories are bit-identical either way) — resolved at the
        # _sharded_deconv_fit call site so it joins the solver cache key.
        act_lead = (
            lead_out if N > 1 or nd_first_padded
            else (lead_in[0],) + lead_out[1:]
        )
        La = _prod(act_lead) * Xa  # per-segment flat activation length

        def act_flat(hh):
            # (N, R, *lead_in, Xa) → per batch: middle axes padded to
            # output widths (the first only when N > 1), row-major flat,
            # with the middle-axis lead zeros prepended (per segment:
            # stride lead_mid + La) — the wgrad patch index
            # l + T_flat-1 - τ then reads hh[y-dy, x + kx-1-dx] exactly
            # (the x part of T_flat-1 - τ is kx-1-dx, resolved by the
            # halo frames)
            H2 = jnp.moveaxis(hh, 1, -1)  # (N, *lead_in, Xa, R)
            pads = ((0, 0),) + tuple(
                (0, int(a) - int(s)) for s, a in zip(lead_in, act_lead)
            ) + ((0, 0), (0, 0))
            flat = jnp.pad(H2, pads).reshape(N, -1, R)  # (N, La, R)
            flat = jnp.pad(flat, ((0, 0), (lead_mid, 0), (0, 0)))
            return flat.reshape(-1, R)

        def cot_flat_w(cot):
            # W side: (N, prod(S_out_local), C) → x padded TRAILING to
            # the activation's Xa stride (zero rows contribute
            # nothing), then per-segment lead_mid trailing zeros to
            # match the stacked activation's stride
            c = cot.reshape((N,) + lead_out + (chunk, C))
            c = jnp.pad(
                c, ((0, 0),) * nd + ((0, kx - 1), (0, 0))
            ).reshape(N, -1, C)
            c = jnp.pad(c, ((0, 0), (0, lead_mid), (0, 0)))
            return c.reshape(-1, C)

        def cot_flat_h(cot):
            # H side: x padded LEADING by kx-1 — the fold index
            # l' + τ then reads cot[y'+dy, x_h + dx - (kx-1)] exactly
            # (no global lead: the middle axes fold without shift);
            # segments stack at stride La
            c = cot.reshape((N,) + lead_out + (chunk, C))
            c = jnp.pad(
                c, ((0, 0),) * nd + ((kx - 1, 0), (0, 0))
            )
            return c.reshape(-1, C)

        def loss_of(state):
            w2f, hp = state
            hh = left_halo(hp, halo, seq_axis)
            part = beta_div(recon(w2f, hh), V2, beta)
            total = lax.psum(part, seq_axis) - loss_offset
            return jnp.sqrt(2.0 * jnp.maximum(total, 0.0))

        def one_iter(state):
            w2f, hp = state
            hh = left_halo(hp, halo, seq_axis)
            H2h = act_flat(hh)

            if update_W:
                WH2 = recon(w2f, hh)
                neg_cot, pos_cot = mu_cotangents(V2, WH2, beta)
                neg = lax.psum(
                    wgrad([cot_flat_w(neg_cot)], H2h, R, Tk, T_flat,
                          interpret=interpret, geom=geom,
                          lead_pad=False)[0],
                    seq_axis,
                )
                neg = jax.nn.relu(neg) + eps
                if beta == 1:
                    s = lax.psum(
                        jnp.sum(hp, axis=tuple(
                            d for d in range(hp.ndim) if d != 1
                        )),
                        seq_axis,
                    )  # (R,)
                    pos = jnp.tile(s, nkr * Tk)[:, None]
                else:
                    pos = lax.psum(
                        wgrad([cot_flat_w(pos_cot)], H2h, R, Tk,
                              T_flat, interpret=interpret, geom=geom,
                              lead_pad=False)[0],
                        seq_axis,
                    )
                    pos = jax.nn.relu(pos) + eps
                w2f = w2f * mu_multiplier(
                    neg, pos, w2f, gamma, l1_reg, l2_reg
                )

            if update_H:
                if mode == "pallas_w":
                    # hybrid: streamed flat-τ fold in place of the
                    # VMEM-gated hgrad accumulator (kernel rows share
                    # the _w2 flat ordering, only the chunk size — Tk
                    # vs Tc — differs)
                    need_pos = beta != 1
                    negHh, posHh = _stream_contractions_h(
                        V2, w2f.reshape(nkr, Tk * R, C), hh, kernel,
                        beta, need_pos, padv,
                    )
                    neg = (
                        jax.nn.relu(halo_adjoint(negHh, halo, seq_axis))
                        + eps
                    )
                    if beta == 1:
                        s2 = jnp.sum(w2f.reshape(-1, R, C), axis=(0, 2))
                        pos = s2.reshape((1, R) + (1,) * nd)
                    else:
                        pos = (
                            jax.nn.relu(
                                halo_adjoint(posHh, halo, seq_axis)
                            )
                            + eps
                        )
                    hp = hp * mu_multiplier(
                        neg, pos, hp, gamma, l1_reg, l2_reg
                    )
                    return w2f, hp

                WH2 = recon(w2f, hh)
                neg_cot, pos_cot = mu_cotangents(V2, WH2, beta)

                def h_contract(cot):
                    out = hgrad(
                        cot_flat_h(cot), w2f, R, Tk, N * La,
                        interpret=interpret, geom=geom,
                    )
                    full = out.reshape((R, N) + act_lead + (Xa,))
                    for d, s in enumerate(lead_in):
                        full = lax.slice_in_dim(
                            full, 0, s, axis=2 + d
                        )
                    full = jnp.moveaxis(full, 1, 0)  # (N, R, …, Xa)
                    return halo_adjoint(full, halo, seq_axis)

                neg = jax.nn.relu(h_contract(neg_cot)) + eps
                if beta == 1:
                    s2 = jnp.sum(w2f.reshape(-1, R, C), axis=(0, 2))
                    pos = s2.reshape((1, R) + (1,) * nd)
                else:
                    pos = jax.nn.relu(h_contract(pos_cot)) + eps
                hp = hp * mu_multiplier(
                    neg, pos, hp, gamma, l1_reg, l2_reg
                )
            return w2f, hp

        W2f = _w2f_padded(W)
        (W2f, Hp), k, converged, trace = _converging_loop(
            one_iter, loss_of, (W2f, Hp), tol, max_iter, verbose,
            record=verbose,
        )
        n_iter = jnp.where(converged, k * 10, max_iter)
        from ..ops.fast_nmfd import _w_from_w2

        out = (_w_from_w2(W2f[: K * R], kernel, R), Hp, n_iter)
        return out + (k, trace[0]) if verbose else out

    def local_fit(V, W, Hp):
        # V: (N, C, *sp_loc), W: (C, R, *k) replicated, Hp: (N, R, *sp_loc)
        if mode in ("pallas", "pallas_w"):
            if nd >= 2:
                return pallas_nd_local_fit(V, W, Hp)
            return pallas_local_fit(V, W, Hp)
        if mode == "stream":
            return stream_local_fit(V, W, Hp)

        split = conv_split and mode == "conv" and halo > 0

        def recon_hh(hh, w):
            if mode == "unrolled":
                return _unfold_halo_nd(hh, w, nd)
            return _conv_halo_nd(hh, w, nd)

        def recon(hp, w):
            if split:
                return _conv_halo_split_nd(
                    hp, halo_recv(hp, halo, seq_axis), w, nd
                )
            return recon_hh(left_halo(hp, halo, seq_axis), w)

        def loss_of(state):
            w, hp = state
            part = beta_div(recon(hp, w), V, beta)
            # subtract the exact constant the auto-padded (V=0, WH=0) cells
            # contribute for fractional β, so the convergence trajectory
            # matches the unpadded problem; clamp at 0 — f32 rounding of the
            # psum'd total could otherwise dip below the exact host constant
            # near a perfect fit and poison the sqrt with NaN
            total = lax.psum(part, seq_axis) - loss_offset
            return jnp.sqrt(2.0 * jnp.maximum(total, 0.0))

        sum_axes = (0,) + tuple(range(2, 2 + nd))

        def one_iter(state):
            w, hp = state
            # One halo exchange per iteration, shared by both factor
            # updates (the reference updates W with the OLD H, so both
            # reconstructions read the same activations —
            # /root/reference/torchnmf/nmf.py:396-410).  W's vjp is
            # forward-only through the exchange; H's activation cotangent
            # ships back through halo_adjoint (split form: the strip
            # adjoint), which IS the transpose jax.vjp derives for
            # left_halo — trajectories are identical while one ppermute
            # (+ concat, in the concat form) per iteration is saved.
            if split:
                recv = halo_recv(hp, halo, seq_axis)
                hh = None
            else:
                hh = left_halo(hp, halo, seq_axis) if shared_hh else None

            if update_W:
                # ---- W update: adjoint wrt the replicated kernel.  NOTE:
                # no explicit psum — shard_map's replication tracking
                # transposes the cotangent of the replicated ``w`` with an
                # automatic psum over the sequence axis; adding one would
                # multiply by the axis size.
                if split:
                    WH, vjp = jax.vjp(
                        lambda ww: _conv_halo_split_nd(hp, recv, ww, nd), w
                    )
                elif shared_hh:
                    WH, vjp = jax.vjp(lambda ww: recon_hh(hh, ww), w)
                else:
                    WH, vjp = jax.vjp(lambda ww: recon(hp, ww), w)
                neg_cot, pos_cot = mu_cotangents(V, WH, beta)
                neg = jax.nn.relu(vjp(neg_cot)[0]) + eps
                if beta == 1:
                    # analytic KL denominator: sum of H over all non-rank
                    # dims (device-varying partial -> explicit psum)
                    pos = lax.psum(
                        jnp.sum(hp, axis=sum_axes, keepdims=True), seq_axis
                    ).reshape(_kl_shape(w.ndim))
                else:
                    pos = jax.nn.relu(vjp(pos_cot)[0]) + eps
                w = w * mu_multiplier(neg, pos, w, gamma, l1_reg, l2_reg)

            if update_H:
                # ---- H update: adjoint THROUGH the halo exchange ---------
                if split:
                    WH, vjp = jax.vjp(
                        lambda hx, rx: _conv_halo_split_nd(hx, rx, w, nd),
                        hp, recv,
                    )

                    def grad_hp(cot):
                        gh, gr = vjp(cot)
                        return halo_adjoint_strip(gh, gr, halo, seq_axis)
                elif shared_hh:
                    WH, vjp = jax.vjp(lambda hx: recon_hh(hx, w), hh)

                    def grad_hp(cot):
                        return halo_adjoint(vjp(cot)[0], halo, seq_axis)
                else:
                    WH, vjp = jax.vjp(lambda hx: recon(hx, w), hp)

                    def grad_hp(cot):
                        return vjp(cot)[0]

                neg_cot, pos_cot = mu_cotangents(V, WH, beta)
                neg = jax.nn.relu(grad_hp(neg_cot)) + eps
                if beta == 1:
                    pos = jnp.sum(w, axis=sum_axes, keepdims=True).reshape(
                        _kl_shape(hp.ndim)
                    )
                else:
                    pos = jax.nn.relu(grad_hp(pos_cot)) + eps
                hp = hp * mu_multiplier(neg, pos, hp, gamma, l1_reg, l2_reg)
            return w, hp

        (W, Hp), k, conv, trace = _converging_loop(
            one_iter, loss_of, (W, Hp), tol, max_iter, verbose,
            record=verbose,
        )
        n_iter = jnp.where(conv, k * 10, max_iter)
        out = (W, Hp, n_iter)
        return out + (k, trace[0]) if verbose else out

    sharded_spec = P(*([None] * (1 + nd)), seq_axis)
    out_specs = (P(), sharded_spec, P())
    if verbose:
        out_specs = out_specs + (P(), P())  # (k, recorded losses)
    mapped = jax.shard_map(
        local_fit,
        mesh=mesh,
        in_specs=(sharded_spec, P(), sharded_spec),
        out_specs=out_specs,
        # Mosaic calls don't carry vma annotations — same opt-out the
        # fused sharded-NMF updaters use (parallel/sharded.py)
        check_vma=(mode not in ("pallas", "pallas_w")),
    )
    return jax.jit(mapped)


def _sharded_deconv_fit(
    V, W, H, mesh, spatial_ndim, beta, tol, max_iter, l1_reg, l2_reg,
    seq_axis, update_W=True, update_H=True, verbose=False,
):
    V = jnp.asarray(V)
    W = jnp.asarray(W)
    H = jnp.asarray(H)
    T = W.shape[-1]
    L_out = V.shape[-1]
    L_in = H.shape[-1]
    if L_in != L_out - T + 1:
        raise ValueError("H trailing length must be L_out - T + 1")
    # leading spatial dims are unsharded; their shapes must already agree
    for d in range(2, 1 + spatial_ndim):
        if H.shape[d] != V.shape[d] - W.shape[d] + 1:
            raise ValueError(
                f"H spatial dim {d} must be V - kernel + 1: got "
                f"{H.shape[d]} vs {V.shape[d]} - {W.shape[d]} + 1"
            )

    n_dev = mesh.shape[seq_axis]
    # Auto-pad the trailing axis so it (a) divides evenly over the mesh axis
    # and (b) gives every device a chunk of at least T-1 frames (the
    # single-neighbor halo width).  Zero padding is exact: padded H entries
    # are MU fixed points (0 · anything = 0), padded V cells never couple
    # back into real H cells, and their constant loss contribution
    # (beta_div(0, 0, β) per cell, nonzero only for fractional β) is
    # subtracted from the convergence metric below.
    chunk = max(-(-L_out // n_dev), T - 1)
    L_pad = chunk * n_dev
    pad_v = L_pad - L_out

    import numpy as _np

    from ..metrics import beta_div as _bd

    cells = pad_v
    for d in range(V.ndim - 1):
        cells *= V.shape[d]
    per_cell = float(_bd(jnp.zeros(()), jnp.zeros(()), beta)) if pad_v else 0.0
    loss_offset = float(per_cell * cells)
    if not _np.isfinite(loss_offset):
        loss_offset = 0.0  # defensive: never poison the loss

    if pad_v:
        vpad = [(0, 0)] * (V.ndim - 1) + [(0, pad_v)]
        V = jnp.pad(V, vpad)

    # zero-pad H's trailing axis to V's (padded) length so both shard into
    # equal chunks: padded entries are MU fixed points
    pad = [(0, 0)] * (H.ndim - 1) + [(0, L_pad - L_in)]
    Hp = jnp.pad(H, pad)

    mode = _halo_unfold_mode(
        int(H.shape[0]),
        tuple(int(s) for s in H.shape[2:1 + spatial_ndim]),  # leading spatial
        chunk, tuple(int(k) for k in W.shape[2:]), int(W.shape[1]),
    )
    from ..ops.autotune import autotune_halo_mode

    # measured per-shard conv-vs-unfold decision above the FLOP threshold
    # (same inversion surface as the single-device engine; timed on one
    # device with the LOCAL chunk+halo shapes — collectives are identical
    # across modes, so no in-mesh timing is needed)
    mode = autotune_halo_mode(
        int(H.shape[0]), int(V.shape[1]),
        tuple(int(s) for s in H.shape[2:1 + spatial_ndim]),
        chunk, tuple(int(k) for k in W.shape[2:]), int(W.shape[1]),
        float(beta), mode,
    )

    from ..ops.pallas_deconv import _halo_nd_first_padded

    # A/B knobs: PNT_HALO_SHARED_HH=0 restores the pre-r5 per-update halo
    # exchanges (tools/measure_halo2d_tax.py) and with it the concat conv
    # form; PNT_HALO_CONV=concat keeps the shared exchange but the
    # materialized concat (tools/bisect_halo2d_tax.py)
    shared = os.environ.get("PNT_HALO_SHARED_HH", "1") != "0"
    fit = _get_sharded_deconv_fit(
        mesh, int(spatial_ndim), int(T), float(beta), float(tol),
        int(max_iter), float(l1_reg), float(l2_reg), seq_axis,
        loss_offset, mode, bool(update_W), bool(update_H), bool(verbose),
        _halo_nd_first_padded(),
        shared,
        halo_conv_split_default() and shared,
    )
    spec = NamedSharding(mesh, P(*([None] * (1 + spatial_ndim)), seq_axis))
    V = jax.device_put(V, spec)
    Hp = jax.device_put(Hp, spec)
    W = jax.device_put(W, NamedSharding(mesh, P()))

    if verbose:
        # record-and-replay: same cadence events as the single-device
        # verbose loop, delivered after the program completes
        from ..ops.solver import _emit_recorded

        W_out, Hp_out, n_iter, k, losses = fit(V, W, Hp)
        _emit_recorded(k, losses)
    else:
        W_out, Hp_out, n_iter = fit(V, W, Hp)
    return W_out, Hp_out[..., :L_in], n_iter


def sharded_nmfd_fit(
    V, W, H, mesh: Mesh, beta: float = 1, tol: float = 1e-4,
    max_iter: int = 200, l1_reg: float = 0.0, l2_reg: float = 0.0,
    seq_axis: str = "seq",
    update_W: bool = True, update_H: bool = True, verbose: bool = False,
):
    """Fit NMFD with the convolution time axis sharded over ``mesh``.

    ``V (N, C, L_out)``, ``W (C, R, T)``, ``H (N, R, L_in)`` with
    ``L_in = L_out - T + 1``.  The trailing axis is zero-padded
    automatically so it divides evenly over the mesh axis with local chunks
    of at least ``T - 1`` frames (single-neighbor halos) — padding is exact
    (padded entries are MU fixed points; the constant loss offset is
    corrected).  Returns ``(W, H, n_iter)`` matching the single-device
    trajectories.  ``verbose`` records the cadence losses on device and
    replays them to the progress handlers after the program (per-device
    live callbacks would double-fire under shard_map).
    """
    return _sharded_deconv_fit(
        V, W, H, mesh, 1, beta, tol, max_iter, l1_reg, l2_reg, seq_axis,
        update_W, update_H, verbose,
    )


def sharded_nmf2d_fit(
    V, W, H, mesh: Mesh, beta: float = 1, tol: float = 1e-4,
    max_iter: int = 200, l1_reg: float = 0.0, l2_reg: float = 0.0,
    seq_axis: str = "seq",
    update_W: bool = True, update_H: bool = True, verbose: bool = False,
):
    """Fit NMF2D with the trailing spatial axis sharded over ``mesh``
    (the leading spatial axis stays local; same halo/divisibility rules
    on the trailing axis)."""
    return _sharded_deconv_fit(
        V, W, H, mesh, 2, beta, tol, max_iter, l1_reg, l2_reg, seq_axis,
        update_W, update_H, verbose,
    )


def sharded_nmf3d_fit(
    V, W, H, mesh: Mesh, beta: float = 1, tol: float = 1e-4,
    max_iter: int = 200, l1_reg: float = 0.0, l2_reg: float = 0.0,
    seq_axis: str = "seq",
    update_W: bool = True, update_H: bool = True, verbose: bool = False,
):
    """Fit NMF3D with the trailing spatial axis sharded over ``mesh``."""
    return _sharded_deconv_fit(
        V, W, H, mesh, 3, beta, tol, max_iter, l1_reg, l2_reg, seq_axis,
        update_W, update_H, verbose,
    )


# --------------------------------------------------------------------------
# Sequence-parallel EM for the shift-invariant PLCA family
# --------------------------------------------------------------------------
@lru_cache(maxsize=None)
def _get_sharded_siplca_fit(
    mesh: Mesh,
    spatial_ndim: int,
    T: int,
    tol: float,
    max_iter: int,
    update_W: bool,
    update_H: bool,
    update_Z: bool,
    W_alpha_active: bool,
    H_alpha_active: bool,
    Z_alpha_active: bool,
    seq_axis: str,
    use_unfold: bool = False,
    n_pad_h: int = 0,
    verbose: bool = False,
):
    from ..ops.solver import _plca_em_iter, _plca_marginal_sum

    halo = T - 1
    nd = spatial_ndim

    def local_fit(V, W, Hp, Z, W_alpha, H_alpha, Z_alpha):
        # V: (N, C, *sp_loc), W: (C, R, *k) + Z: (R,) replicated,
        # Hp: (N, R, *sp_loc)
        norm = lax.psum(jnp.sum(V), seq_axis)
        Vn = V / norm

        def recon3(hp, w, z):
            # kernel scaled along rank, like the reference's
            # conv(H, W.flip * Z.view(-1, 1, ...)) (plca.py:446-606)
            zr = z.reshape((-1,) + (1,) * nd)
            hh = left_halo(hp, halo, seq_axis)
            if use_unfold:
                return _unfold_halo_nd(hh, w * zr, nd)
            return _conv_halo_nd(hh, w * zr, nd)

        def h_marginal(h):
            return lax.psum(_plca_marginal_sum(h), seq_axis)

        # auto-padded trailing H entries must stay exactly zero through the
        # Dirichlet-MAP adjustment (see _plca_em_iter's h_mask)
        h_mask = None
        if n_pad_h and H_alpha_active:
            chunk = Hp.shape[-1]
            gpos = lax.axis_index(seq_axis) * chunk + jnp.arange(chunk)
            real = mesh.shape[seq_axis] * chunk - n_pad_h
            h_mask = (gpos < real).astype(Hp.dtype).reshape(
                (1, 1) + (1,) * (nd - 1) + (chunk,)
            )

        def loss_of(state):
            w, hp, z = state
            WZH = recon3(hp, w, z)
            part = beta_div(WZH * norm, Vn * norm, 1)
            return jnp.sqrt(2.0 * lax.psum(part, seq_axis))

        def log_probability(state):
            # verbose-only posterior log-probability, matching the
            # single-device value (reference plca.py:18-20): the data term
            # and the sharded-H prior term psum over seq; the auto-padded
            # H entries (exact zeros) would each add log(eps)·(Hα-1)
            # relative to the unpadded problem, so that constant is
            # removed
            w, hp, z = state
            WZH = recon3(hp, w, z)
            lp = lax.psum(
                Vn.reshape(-1) @ jnp.log(WZH + eps).reshape(-1), seq_axis
            )
            lp = lp + jnp.sum(jnp.log(w + eps) * (W_alpha - 1.0))
            lp = lp + lax.psum(
                jnp.sum(jnp.log(hp + eps) * (H_alpha - 1.0)), seq_axis
            )
            if n_pad_h:
                rows = hp.size // hp.shape[-1]  # N·R·prod(lead_in), static
                lp = lp - rows * n_pad_h * jnp.log(eps) * (H_alpha - 1.0)
            lp = lp + jnp.sum(jnp.log(z + eps) * (Z_alpha - 1.0))
            return lp

        def one_iter(state):
            w, hp, z = state
            # E-step vjp: W/Z cotangents auto-psum'd over seq (replicated
            # inputs under shard_map); H cotangent's halo frames route
            # through the ppermute transpose inside the vjp
            return _plca_em_iter(
                recon3, update_W, update_H, update_Z,
                W_alpha_active, H_alpha_active, Z_alpha_active,
                Vn, (w, hp, z), W_alpha, H_alpha, Z_alpha,
                h_marginal=h_marginal, h_mask=h_mask,
            )

        (W, Hp, Z), k, conv, trace = _converging_loop(
            one_iter, loss_of, (W, Hp, Z), tol, max_iter, verbose,
            extra_of=log_probability if verbose else None, record=verbose,
        )
        # reference quirk: raw loop index (plca.py:304)
        n_iter = jnp.where(conv, k * 10 - 1, max_iter - 1)
        out = (W, Hp, Z, n_iter, norm)
        return out + (k, trace[0], trace[1]) if verbose else out

    sharded_spec = P(*([None] * (1 + nd)), seq_axis)
    out_specs = (P(), sharded_spec, P(), P(), P())
    if verbose:
        out_specs = out_specs + (P(), P(), P())
    mapped = jax.shard_map(
        local_fit,
        mesh=mesh,
        in_specs=(
            sharded_spec, P(), sharded_spec, P(), P(), P(), P(),
        ),
        out_specs=out_specs,
    )
    return jax.jit(mapped)


def _sharded_siplca_fit(
    V, W, H, Z, mesh, spatial_ndim, tol, max_iter,
    W_alpha, H_alpha, Z_alpha, update_W, update_H, update_Z, seq_axis,
    verbose=False,
):
    from ..ops.solver import alpha_is_active

    V = jnp.asarray(V)
    W = jnp.asarray(W)
    H = jnp.asarray(H)
    Z = jnp.asarray(Z)
    T = W.shape[-1]
    L_out = V.shape[-1]
    L_in = H.shape[-1]
    if L_in != L_out - T + 1:
        raise ValueError("H trailing length must be L_out - T + 1")

    n_dev = mesh.shape[seq_axis]
    # identical auto-pad rules to the MU deconv solver: zero padding is an
    # exact EM fixed point (padded H entries multiply by their posterior —
    # 0 stays 0 — and padded V cells see only padded H), and the KL loss
    # contribution of an all-zero cell is beta_div(0, 0, 1) = 0 exactly, so
    # no loss offset is needed
    chunk = max(-(-L_out // n_dev), T - 1)
    L_pad = chunk * n_dev
    pad_v = L_pad - L_out
    if pad_v:
        vpad = [(0, 0)] * (V.ndim - 1) + [(0, pad_v)]
        V = jnp.pad(V, vpad)
    hpad = [(0, 0)] * (H.ndim - 1) + [(0, L_pad - L_in)]
    Hp = jnp.pad(H, hpad)

    mode = _halo_unfold_mode(
        int(H.shape[0]),
        tuple(int(s) for s in H.shape[2:1 + spatial_ndim]),
        chunk, tuple(int(k) for k in W.shape[2:]), int(W.shape[1]),
    )
    from ..ops.autotune import autotune_halo_mode

    mode = autotune_halo_mode(
        int(H.shape[0]), int(V.shape[1]),
        tuple(int(s) for s in H.shape[2:1 + spatial_ndim]),
        chunk, tuple(int(k) for k in W.shape[2:]), int(W.shape[1]),
        1.0, mode,  # EM E-step cotangents are KL-shaped
        allow_pallas=False,  # EM has no fused per-shard mode: keep the
        # unrolled-vs-conv tuning undiluted by the pallas candidate
    )

    fit = _get_sharded_siplca_fit(
        mesh, int(spatial_ndim), int(T), float(tol), int(max_iter),
        bool(update_W), bool(update_H), bool(update_Z),
        alpha_is_active(W_alpha), alpha_is_active(H_alpha),
        alpha_is_active(Z_alpha), seq_axis,
        mode == "unrolled",  # EM runs under jax.vjp: no streaming form
        int(L_pad - L_in),
        bool(verbose),
    )
    spec = NamedSharding(mesh, P(*([None] * (1 + spatial_ndim)), seq_axis))
    V = jax.device_put(V, spec)
    Hp = jax.device_put(Hp, spec)
    rep = NamedSharding(mesh, P())
    W = jax.device_put(W, rep)
    Z = jax.device_put(Z, rep)

    a = [jnp.float32(W_alpha), jnp.float32(H_alpha), jnp.float32(Z_alpha)]
    if verbose:
        from ..ops.solver import _emit_recorded

        W_out, Hp_out, Z_out, n_iter, norm, k, losses, extras = fit(
            V, W, Hp, Z, *a
        )
        _emit_recorded(k, losses, extras)
    else:
        W_out, Hp_out, Z_out, n_iter, norm = fit(V, W, Hp, Z, *a)
    return W_out, Hp_out[..., :L_in], Z_out, n_iter, norm


def sharded_siplca_fit(
    V, W, H, Z, mesh: Mesh, tol: float = 1e-4, max_iter: int = 200,
    W_alpha=1.0, H_alpha=1.0, Z_alpha=1.0,
    update_W: bool = True, update_H: bool = True, update_Z: bool = True,
    seq_axis: str = "seq", verbose: bool = False,
):
    """EM-fit SIPLCA with the convolution time axis sharded over ``mesh``.

    ``V (N, C, L_out)``, ``W (C, R, T)``, ``H (N, R, L_out - T + 1)``,
    ``Z (R,)`` — all probability-normalized (as the
    :class:`~pytorch_nmf_tpu.models.plca.SIPLCA` constructor does).  One
    halo ``ppermute`` each way per EM iteration plus the replicated-kernel
    psums; trailing lengths auto-pad exactly.  Returns
    ``(W, H, Z, n_iter, norm)`` matching the single-device trajectories
    (same raw-loop-index ``n_iter`` quirk, reference plca.py:304).
    ``verbose`` records the cadence (loss, log-probability) pairs on
    device and replays them after the program completes.
    """
    return _sharded_siplca_fit(
        V, W, H, Z, mesh, 1, tol, max_iter, W_alpha, H_alpha, Z_alpha,
        update_W, update_H, update_Z, seq_axis, verbose,
    )


def sharded_siplca2_fit(
    V, W, H, Z, mesh: Mesh, tol: float = 1e-4, max_iter: int = 200,
    W_alpha=1.0, H_alpha=1.0, Z_alpha=1.0,
    update_W: bool = True, update_H: bool = True, update_Z: bool = True,
    seq_axis: str = "seq", verbose: bool = False,
):
    """EM-fit SIPLCA2 with the trailing spatial axis sharded."""
    return _sharded_siplca_fit(
        V, W, H, Z, mesh, 2, tol, max_iter, W_alpha, H_alpha, Z_alpha,
        update_W, update_H, update_Z, seq_axis, verbose,
    )


def sharded_siplca3_fit(
    V, W, H, Z, mesh: Mesh, tol: float = 1e-4, max_iter: int = 200,
    W_alpha=1.0, H_alpha=1.0, Z_alpha=1.0,
    update_W: bool = True, update_H: bool = True, update_Z: bool = True,
    seq_axis: str = "seq", verbose: bool = False,
):
    """EM-fit SIPLCA3 with the trailing spatial axis sharded."""
    return _sharded_siplca_fit(
        V, W, H, Z, mesh, 3, tol, max_iter, W_alpha, H_alpha, Z_alpha,
        update_W, update_H, update_Z, seq_axis, verbose,
    )
