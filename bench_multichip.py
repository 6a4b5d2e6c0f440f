#!/usr/bin/env python
"""Multi-chip solver-path benchmark: shard_map overhead + weak scaling.

The environment exposes ONE real TPU chip, so true multi-chip numbers are
unavailable; what CAN be measured — and regression-tracked — is the cost
of the explicit-collectives programs themselves: every `sharded_*` solver
runs on an n-device mesh (n = all visible devices; n=1 today) against the
same problem fitted by the plain single-device solver.  At n=1 the
collectives are self-copies, so the ratio isolates the shard_map/halo
machinery's overhead — the fixed tax the multi-chip fast path pays before
ICI scaling buys anything.  On a real pod the same script reports weak
scaling (per-device problem size held constant as n grows).

Prints ONE JSON line: headline = the NMF shard overhead ratio at the
measured device count; grid carries every row.

Run on CPU instead (8 virtual devices) with:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 PNT_FORCE_CPU=1 \\
      python bench_multichip.py
"""

import json
import os
import sys

import numpy as np

if os.environ.get("PNT_FORCE_CPU", "") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench import _marginal_ms_per_iter as _bench_marginal  # noqa: E402

# ---------------------------------------------------------------------------
# Full-scale (non-tiny) per-device case shapes, module-level so
# tools/pretune_bench_shapes.py resolves every autotuned shape this script
# touches ahead of a bench run (the per-device chunk is what the autotuner
# keys on, so these are exact).
# ---------------------------------------------------------------------------
MC_NMF = (5168, 1025, 88)                 # (M_loc, K, R)
MC_NMFD_R8 = (1, 1025, 8, 400, 1250)      # (N, C, R, T, L_loc)
MC_NMFD_FLAG = (1, 1025, 88, 400, 1250)   # flagship rank; betas below
MC_NMFD_FLAG_BETAS = (1.0, 2.0)
MC_NMF2D = (256, 64, 121, 8, 8, 128)      # (C, R, Y, kh, kw, L)
MC_NMF3D = (64, 16, (4, 4, 4), (16, 16), 64)   # (C, R, k, S, L_loc)
MC_NMF3D_FULLFUSED_LLOC = 60
MC_SIPLCA = (513, 8, 200, 3000)           # (C, R, T, L_loc)
MC_PLCA = (5168, 1025, 88)                # (M_loc, K, R)
MC_SPARSE = (8192, 8192, 64, 671_000)     # (M_loc, K, R, nnz per device)


def _marginal_ms_per_iter(make_fit, args, reps=4):
    """bench.py's two-length difference-quotient helper (one timing
    discipline, one implementation), with a shorter device-time target —
    and a tiny one in CI smoke mode."""
    tiny = os.environ.get("PNT_BENCH_TINY", "") == "1"
    return _bench_marginal(
        make_fit, args, reps=reps, target_s=(0.1 if tiny else 1.5)
    )


def main():
    import jax
    import jax.numpy as jnp

    from pytorch_nmf_tpu.ops.autotune import enable_compile_cache

    enable_compile_cache(
        os.environ.get(
            "PNT_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"),
        )
    )

    tiny = os.environ.get("PNT_BENCH_TINY", "") == "1"  # CI smoke mode

    from pytorch_nmf_tpu.models.nmf import NMF, NMFD
    from pytorch_nmf_tpu.ops.fast_nmf import resolve_nmf_updater_factory
    from pytorch_nmf_tpu.ops.solver import get_dense_fit, get_sparse_fit
    from pytorch_nmf_tpu.ops.sparse import SparseCOO, build_ell, nmf_sp_pos_neg
    from pytorch_nmf_tpu.parallel import make_mesh
    from pytorch_nmf_tpu.parallel.halo import _sharded_deconv_fit
    from pytorch_nmf_tpu.parallel.sharded import _get_sharded_nmf_fit, shard_target
    from pytorch_nmf_tpu.parallel.sharded_sparse import sharded_sparse_nmf_fit

    n_dev = jax.device_count()
    mesh = make_mesh({"data": n_dev})
    rng = np.random.RandomState(0)
    grid = []

    # ---- dense NMF: per-device 5168x1025 r88 (weak scaling over rows) ----
    M_loc, K, R = (64, 48, 4) if tiny else MC_NMF
    M = M_loc * n_dev
    V = rng.rand(M, K).astype("f") + 1e-3
    W0 = rng.rand(K, R).astype("f") + 0.1
    H0 = rng.rand(M, R).astype("f") + 0.1
    factory = resolve_nmf_updater_factory()

    def make_plain(n):
        return get_dense_fit(
            NMF.reconstruct, 1.0, float("-inf"), n, True, True,
            0.0, 0.0, False, factory,
        )

    plain_args = (jnp.asarray(V), jnp.asarray(W0), jnp.asarray(H0))
    ms_plain = _marginal_ms_per_iter(make_plain, plain_args)

    from jax.sharding import PartitionSpec as P

    from pytorch_nmf_tpu.ops.pallas_mu import _interpret_mode, pallas_supported

    Vs = shard_target(V, mesh, P("data"))
    Ws = shard_target(W0, mesh, P())
    Hs = shard_target(H0, mesh, P("data", None))

    def make_sharded(n):
        return _get_sharded_nmf_fit(
            mesh, 1.0, float("-inf"), n, 0.0, 0.0, "data", None,
            pallas_supported(), _interpret_mode(),
        )

    ms_shard = _marginal_ms_per_iter(make_sharded, (Vs, Ws, Hs))
    nmf_overhead = ms_shard / ms_plain
    grid.append({
        "metric": f"nmf_shard_overhead_n{n_dev}_{M_loc}x{K}_r{R}_beta1",
        "value": round(nmf_overhead, 4),
        "unit": "x_plain",
        "ms_plain": round(ms_plain, 5),
        "ms_sharded": round(ms_shard, 5),
    })

    # ---- NMFD halo: per-device ~1250 frames of the r8 flagship ----------
    N, C, R, T, L_loc = (1, 12, 3, 5, 16) if tiny else MC_NMFD_R8
    L = L_loc * n_dev
    Vd = rng.rand(N, C, L).astype("f")
    Wd0 = rng.rand(C, R, T).astype("f") + 0.1
    Hd0 = rng.rand(N, R, L - T + 1).astype("f") + 0.1

    from pytorch_nmf_tpu.ops.fast_nmfd import resolve_nmfd_updater_factory

    nmfd_factory = resolve_nmfd_updater_factory()

    def make_plain_nmfd(n):
        return get_dense_fit(
            NMFD.reconstruct, 1.0, float("-inf"), n, True, True,
            0.0, 0.0, False, nmfd_factory,
        )

    ms_plain_d = _marginal_ms_per_iter(
        make_plain_nmfd,
        (jnp.asarray(Vd), jnp.asarray(Wd0), jnp.asarray(Hd0)),
    )

    seq_mesh = make_mesh({"seq": n_dev})

    def make_halo(n):
        def fit(V, W, H):
            return _sharded_deconv_fit(
                V, W, H, seq_mesh, 1, 1.0, float("-inf"), n, 0.0, 0.0,
                "seq",
            )
        return fit

    ms_halo = _marginal_ms_per_iter(
        make_halo, (jnp.asarray(Vd), jnp.asarray(Wd0), jnp.asarray(Hd0))
    )
    grid.append({
        "metric": f"nmfd_halo_overhead_n{n_dev}_{C}x{L_loc}loc_r{R}_T{T}_beta1",
        "value": round(ms_halo / ms_plain_d, 4),
        "unit": "x_plain",
        "ms_plain": round(ms_plain_d, 5),
        "ms_sharded": round(ms_halo, 5),
    })

    # ---- NMFD halo, flagship rank: r88/T400, ~1250 frames/device --------
    # the r8 row above stays on the unfold per-shard mode; this one lands
    # on the fused-Mosaic ("pallas") mode wherever the engine autotune
    # picks it for the local chunk shape (measured n=1 v5e: 11.86 ms/iter
    # vs 11.42 plain — the stream-mode halo it replaces tracked the
    # slower 13.39 stream engine).  beta in {1, 2}: both flagship MU
    # flavors (VERDICT r3 item 1).
    Rf = 4 if tiny else MC_NMFD_FLAG[2]
    Vf = rng.rand(N, C, L).astype("f")
    Wf0 = rng.rand(C, Rf, T).astype("f") + 0.1
    Hf0 = rng.rand(N, Rf, L - T + 1).astype("f") + 0.1

    # plain side rides the AUTOTUNED engine (what model.fit would use) so
    # the ratio compares the halo program against the honest best
    from pytorch_nmf_tpu.ops import recon as _recon
    from pytorch_nmf_tpu.ops.autotune import resolve_deconv_factory

    for beta_f in ((1.0,) if tiny else MC_NMFD_FLAG_BETAS):
        flag_factory = resolve_deconv_factory(
            jnp.asarray(Vf), jnp.asarray(Wf0), jnp.asarray(Hf0), beta_f, 1,
            _recon.deconv1d,
        )

        def make_plain_flag(n, _b=beta_f, _fac=flag_factory):
            return get_dense_fit(
                NMFD.reconstruct, _b, float("-inf"), n, True, True,
                0.0, 0.0, False, _fac,
            )

        ms_plain_f = _marginal_ms_per_iter(
            make_plain_flag,
            (jnp.asarray(Vf), jnp.asarray(Wf0), jnp.asarray(Hf0)),
        )

        def make_halo_flag(n, _b=beta_f):
            def fit(V, W, H):
                return _sharded_deconv_fit(
                    V, W, H, seq_mesh, 1, _b, float("-inf"), n, 0.0, 0.0,
                    "seq",
                )
            return fit

        ms_halo_f = _marginal_ms_per_iter(
            make_halo_flag,
            (jnp.asarray(Vf), jnp.asarray(Wf0), jnp.asarray(Hf0)),
        )
        grid.append({
            "metric": (
                f"nmfd_halo_overhead_n{n_dev}_{C}x{L_loc}loc_r{Rf}_T{T}"
                f"_beta{beta_f:g}"
            ),
            "value": round(ms_halo_f / ms_plain_f, 4),
            "unit": "x_plain",
            "ms_plain": round(ms_plain_f, 5),
            "ms_sharded": round(ms_halo_f, 5),
        })

    # ---- NMF2D halo at the VMEM-gated fused shape --------------------
    # at C=256/r64/128² the full fused mode's hgrad accumulator exceeds
    # the Mosaic scoped-vmem bound on the n=1 local shape, so the halo
    # autotune's fused candidate here is the hybrid fused-W/streamed-H
    # "pallas_w" per-shard mode (smaller pods shrink the local chunk and
    # may re-admit the full mode — the per-shard autotune decides)
    if tiny:
        C2, R2, Y2, ky2, kx2, L2 = 6, 4, 10, 3, 3, 8 * n_dev
    else:
        C2, R2, Y2, ky2, kx2, L2 = MC_NMF2D
    V2 = rng.rand(1, C2, Y2 + ky2 - 1, L2).astype("f")
    W20 = rng.rand(C2, R2, ky2, kx2).astype("f") + 0.1
    H20 = rng.rand(1, R2, Y2, L2 - kx2 + 1).astype("f") + 0.1
    fac2 = resolve_deconv_factory(
        jnp.asarray(V2), jnp.asarray(W20), jnp.asarray(H20), 1.0, 2,
        _recon.deconv2d,
    )

    def make_plain_2d(n):
        from pytorch_nmf_tpu.models.nmf import NMF2D

        return get_dense_fit(
            NMF2D.reconstruct, 1.0, float("-inf"), n, True, True,
            0.0, 0.0, False, fac2,
        )

    ms_plain_2d = _marginal_ms_per_iter(
        make_plain_2d, (jnp.asarray(V2), jnp.asarray(W20), jnp.asarray(H20)),
    )

    def make_halo_2d(n):
        def fit(V, W, H):
            return _sharded_deconv_fit(
                V, W, H, seq_mesh, 2, 1.0, float("-inf"), n, 0.0, 0.0,
                "seq",
            )
        return fit

    ms_halo_2d = _marginal_ms_per_iter(
        make_halo_2d, (jnp.asarray(V2), jnp.asarray(W20), jnp.asarray(H20))
    )
    grid.append({
        "metric": (
            f"nmf2d_halo_overhead_n{n_dev}_{C2}x{Y2}x{L2 // n_dev}loc"
            f"_r{R2}_k{ky2}x{kx2}_beta1"
        ),
        "value": round(ms_halo_2d / ms_plain_2d, 4),
        "unit": "x_plain",
        "ms_plain": round(ms_plain_2d, 5),
        "ms_sharded": round(ms_halo_2d, 5),
    })

    # ---- NMF3D halo: modest volumetric shape, trailing axis sharded -----
    from pytorch_nmf_tpu.models.nmf import NMF3D

    if tiny:
        C3, R3, k3, S3, L3_loc = 4, 2, (2, 2, 2), (4, 4), 8
    else:
        C3, R3, k3, S3, L3_loc = MC_NMF3D
    L3 = L3_loc * n_dev
    V3 = rng.rand(
        1, C3, S3[0] + k3[0] - 1, S3[1] + k3[1] - 1, L3
    ).astype("f")
    W30 = rng.rand(C3, R3, *k3).astype("f") + 0.1
    H30 = rng.rand(1, R3, S3[0], S3[1], L3 - k3[2] + 1).astype("f") + 0.1
    fac3 = resolve_deconv_factory(
        jnp.asarray(V3), jnp.asarray(W30), jnp.asarray(H30), 1.0, 3,
        _recon.deconv3d,
    )

    def make_plain_3d(n):
        return get_dense_fit(
            NMF3D.reconstruct, 1.0, float("-inf"), n, True, True,
            0.0, 0.0, False, fac3,
        )

    ms_plain_3d = _marginal_ms_per_iter(
        make_plain_3d, (jnp.asarray(V3), jnp.asarray(W30), jnp.asarray(H30)),
    )

    def make_halo_3d(n):
        def fit(V, W, H):
            return _sharded_deconv_fit(
                V, W, H, seq_mesh, 3, 1.0, float("-inf"), n, 0.0, 0.0,
                "seq",
            )
        return fit

    ms_halo_3d = _marginal_ms_per_iter(
        make_halo_3d, (jnp.asarray(V3), jnp.asarray(W30), jnp.asarray(H30))
    )
    grid.append({
        "metric": (
            f"nmf3d_halo_overhead_n{n_dev}_{C3}x{S3[0]}x{S3[1]}x{L3_loc}loc"
            f"_r{R3}_k{k3[0]}_beta1"
        ),
        "value": round(ms_halo_3d / ms_plain_3d, 4),
        "unit": "x_plain",
        "ms_plain": round(ms_plain_3d, 5),
        "ms_sharded": round(ms_halo_3d, 5),
    })

    # ---- NMF3D halo, full-fused window: a local chunk small enough that
    # the per-shard hgrad accumulator fits the Mosaic VMEM bound, so the
    # halo solver runs the FULL fused Mosaic mode (the pod-realistic
    # regime; the row above lands on the hybrid "pallas_w") — tracks the
    # r4 first-lead-axis-unpadded layout (tools/measure_halo_firstpad.py)
    L3f_loc = 6 if tiny else MC_NMF3D_FULLFUSED_LLOC
    L3f = L3f_loc * n_dev
    V3f = rng.rand(
        1, C3, S3[0] + k3[0] - 1, S3[1] + k3[1] - 1, L3f
    ).astype("f")
    H3f0 = rng.rand(1, R3, S3[0], S3[1], L3f - k3[2] + 1).astype("f") + 0.1
    fac3f = resolve_deconv_factory(
        jnp.asarray(V3f), jnp.asarray(W30), jnp.asarray(H3f0), 1.0, 3,
        _recon.deconv3d,
    )

    def make_plain_3df(n):
        return get_dense_fit(
            NMF3D.reconstruct, 1.0, float("-inf"), n, True, True,
            0.0, 0.0, False, fac3f,
        )

    ms_plain_3df = _marginal_ms_per_iter(
        make_plain_3df,
        (jnp.asarray(V3f), jnp.asarray(W30), jnp.asarray(H3f0)),
    )
    ms_halo_3df = _marginal_ms_per_iter(
        make_halo_3d, (jnp.asarray(V3f), jnp.asarray(W30), jnp.asarray(H3f0))
    )
    grid.append({
        "metric": (
            f"nmf3d_halo_overhead_n{n_dev}_{C3}x{S3[0]}x{S3[1]}x{L3f_loc}loc"
            f"_r{R3}_k{k3[0]}_beta1_fullfused"
        ),
        "value": round(ms_halo_3df / ms_plain_3df, 4),
        "unit": "x_plain",
        "ms_plain": round(ms_plain_3df, 5),
        "ms_sharded": round(ms_halo_3df, 5),
    })

    # ---- SIPLCA EM halo: spectrogram scale (bench.py's r8 EM row) -------
    from pytorch_nmf_tpu.models.plca import PLCA, SIPLCA
    from pytorch_nmf_tpu.ops.autotune import resolve_plca_recon3
    from pytorch_nmf_tpu.ops.solver import get_plca_fit
    from pytorch_nmf_tpu.parallel.halo import sharded_siplca_fit

    if tiny:
        Cs, Rs, Ts, Ls_loc = 8, 3, 4, 16
    else:
        Cs, Rs, Ts, Ls_loc = MC_SIPLCA
    Ls = Ls_loc * n_dev
    Vsi = jnp.asarray(rng.rand(1, Cs, Ls).astype("f"))
    Wsi = rng.rand(Cs, Rs, Ts).astype("f")
    Wsi /= Wsi.sum(axis=(0, 2), keepdims=True)
    Hsi = rng.rand(1, Rs, Ls - Ts + 1).astype("f")
    Hsi /= Hsi.sum(axis=(0, 2), keepdims=True)
    Zsi = np.full((Rs,), 1.0 / Rs, "f")
    recon3 = resolve_plca_recon3(
        SIPLCA, Vsi, jnp.asarray(Wsi), jnp.asarray(Hsi), jnp.asarray(Zsi)
    )

    def make_plain_si(n):
        inner = get_plca_fit(
            recon3, float("-inf"), n, True, True, True,
            False, False, False,
        )

        def fit(V, W, H, Z):
            return inner(
                V, W, H, Z,
                jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0),
            )

        return fit

    si_args = (Vsi, jnp.asarray(Wsi), jnp.asarray(Hsi), jnp.asarray(Zsi))
    ms_plain_si = _marginal_ms_per_iter(make_plain_si, si_args)

    def make_halo_si(n):
        def fit(V, W, H, Z):
            return sharded_siplca_fit(
                V, W, H, Z, seq_mesh, tol=float("-inf"), max_iter=n
            )
        return fit

    ms_halo_si = _marginal_ms_per_iter(make_halo_si, si_args)
    grid.append({
        "metric": (
            f"siplca_em_halo_overhead_n{n_dev}_{Cs}x{Ls_loc}loc_r{Rs}_T{Ts}"
        ),
        "value": round(ms_halo_si / ms_plain_si, 4),
        "unit": "x_plain",
        "ms_plain": round(ms_plain_si, 5),
        "ms_sharded": round(ms_halo_si, 5),
    })

    # ---- dense PLCA: explicit shard_map EM vs plain (bench.py's shape) --
    from pytorch_nmf_tpu.parallel.sharded import sharded_plca_fit

    Mq_loc, Kq, Rq = (40, 24, 4) if tiny else MC_PLCA
    Mq = Mq_loc * n_dev
    Vq = jnp.asarray(rng.rand(Mq, Kq).astype("f"))
    Wq = rng.rand(Kq, Rq).astype("f"); Wq /= Wq.sum(0)
    Hq = rng.rand(Mq, Rq).astype("f"); Hq /= Hq.sum(0)
    Zq = np.full((Rq,), 1.0 / Rq, "f")

    def make_plain_plca(n):
        inner = get_plca_fit(
            PLCA.reconstruct, float("-inf"), n, True, True, True,
            False, False, False,
        )

        def fit(V, W, H, Z):
            return inner(
                V, W, H, Z,
                jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0),
            )

        return fit

    plca_args = (Vq, jnp.asarray(Wq), jnp.asarray(Hq), jnp.asarray(Zq))
    ms_plain_q = _marginal_ms_per_iter(make_plain_plca, plca_args)

    def make_sharded_plca(n):
        def fit(V, W, H, Z):
            return sharded_plca_fit(
                V, W, H, Z, mesh, tol=float("-inf"), max_iter=n
            )
        return fit

    ms_shard_q = _marginal_ms_per_iter(make_sharded_plca, plca_args)
    grid.append({
        "metric": f"plca_em_shard_overhead_n{n_dev}_{Mq_loc}loc_x{Kq}_r{Rq}",
        "value": round(ms_shard_q / ms_plain_q, 4),
        "unit": "x_plain",
        "ms_plain": round(ms_plain_q, 5),
        "ms_sharded": round(ms_shard_q, 5),
    })

    # ---- sparse ELL: per-device 8192 rows x 8192, ~1% nnz ---------------
    Msp_loc, Ksp, Rsp = (64, 64, 4) if tiny else MC_SPARSE[:3]
    Msp = Msp_loc * n_dev
    nnz = (400 if tiny else MC_SPARSE[3]) * n_dev
    flat = np.unique(
        rng.randint(0, Msp * Ksp, int(nnz * 1.1)).astype(np.int64)
    )
    rng.shuffle(flat)
    flat = np.sort(flat[:nnz])
    idx = np.stack([(flat // Ksp).astype("i4"), (flat % Ksp).astype("i4")])
    V_coo = SparseCOO(idx, rng.rand(len(flat)).astype("f") + 0.01, (Msp, Ksp))
    Wsp = rng.rand(Ksp, Rsp).astype("f") + 0.1
    Hsp = rng.rand(Msp, Rsp).astype("f") + 0.1

    V_ell = build_ell(V_coo)
    def make_plain_sp(n):
        return get_sparse_fit(
            nmf_sp_pos_neg, 1.0, float("-inf"), n, True, True,
            0.0, 0.0, False, False, NMF.reconstruct, None, True,
        )

    ms_plain_sp = _marginal_ms_per_iter(
        make_plain_sp, (V_ell, jnp.asarray(Wsp), jnp.asarray(Hsp))
    )

    def make_sharded_sp(n):
        def fit(V, W, H):
            return sharded_sparse_nmf_fit(
                V, W, H, mesh, beta=1.0, tol=float("-inf"), max_iter=n
            )
        return fit

    ms_shard_sp = _marginal_ms_per_iter(
        make_sharded_sp, (V_coo, Wsp, Hsp)
    )
    grid.append({
        "metric": f"sparse_ell_shard_overhead_n{n_dev}_{Msp_loc}loc_x{Ksp}_r{Rsp}_beta1",
        "value": round(ms_shard_sp / ms_plain_sp, 4),
        "unit": "x_plain",
        "ms_plain": round(ms_plain_sp, 5),
        "ms_sharded": round(ms_shard_sp, 5),
    })

    out = {
        "metric": f"nmf_shard_overhead_n{n_dev}",
        "value": round(nmf_overhead, 4),
        "unit": "x_plain",
        "n_devices": n_dev,
        "grid": grid,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
