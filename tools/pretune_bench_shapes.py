#!/usr/bin/env python
"""Pre-resolve every autotuned (shape, beta) the bench harnesses touch.

Run this on the TPU host after adding or changing any bench shape, then
commit ``autotune_cache.json``: a driver bench run must never autotune
in-line — an in-run autotune both perturbs the timing and can eat the
driver's wall-clock budget (VERDICT r4 items 1-2; the r4 driver timeout
was exactly an un-pre-tuned NMFD r8 beta=2 shape autotuning mid-run).

Coverage (imported from the bench scripts' module-level case tables, so
the tool cannot drift from what the benches actually measure):
  * bench.py — NMFD / NMF2D / NMF3D engine winners and the SIPLCA /
    SIPLCA2 EM recon winners;
  * bench_multichip.py — the plain-side engine winners for its halo rows
    plus, via 2-iteration runs of the actual halo / sharded-EM fits, the
    per-shard halo-mode winners and their local-chunk engine autotunes
    (``tpu|halo*|...`` and chunk+halo-shaped ``tpu|<ndim>|...`` keys).

Prints one line per resolved item and a final summary; exits 0.  Use
``--skip-halo`` to resolve only the single-device engine winners.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
os.environ.setdefault(
    "PNT_AUTOTUNE_CACHE", os.path.join(REPO, "autotune_cache.json")
)

if os.environ.get("PNT_FORCE_CPU", "") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def _cache_snapshot():
    path = os.environ["PNT_AUTOTUNE_CACHE"]
    if not os.path.exists(path):
        return {}
    with open(path) as fh:
        return json.load(fh)


def main():
    import jax
    import jax.numpy as jnp

    from pytorch_nmf_tpu.ops.autotune import (
        enable_compile_cache,
        resolve_deconv_factory,
        resolve_plca_recon3,
    )

    enable_compile_cache(
        os.environ.get("PNT_COMPILE_CACHE", os.path.join(REPO, ".jax_cache"))
    )

    import bench
    import bench_multichip as mc
    from pytorch_nmf_tpu.models.nmf import NMF2D, NMF3D, NMFD
    from pytorch_nmf_tpu.models.plca import SIPLCA, SIPLCA2

    # CI smoke mode: tiny shapes on the CPU mesh (tests/test_bench_scripts)
    tiny = os.environ.get("PNT_PRETUNE_TINY", "") == "1"
    nmfd_cases = bench.NMFD_CASES_TINY if tiny else bench.NMFD_CASES
    nmf2d_cases = bench.NMF2D_CASES_TINY if tiny else bench.NMF2D_CASES
    nmf3d_cases = bench.NMF3D_CASES_TINY if tiny else bench.NMF3D_CASES
    siplca_cases = bench.SIPLCA_CASES_TINY if tiny else bench.SIPLCA_CASES
    siplca2_cases = bench.SIPLCA2_CASES_TINY if tiny else bench.SIPLCA2_CASES
    # bench_multichip's tiny literals (bench_multichip.py main)
    mc_nmfd_r8 = (1, 12, 3, 5, 16) if tiny else mc.MC_NMFD_R8
    mc_flag_r = 4 if tiny else mc.MC_NMFD_FLAG[2]
    mc_flag_betas = (1.0,) if tiny else mc.MC_NMFD_FLAG_BETAS
    mc_nmf3d = ((4, 2, (2, 2, 2), (4, 4), 8) if tiny else mc.MC_NMF3D)
    mc_ff_lloc = 6 if tiny else mc.MC_NMF3D_FULLFUSED_LLOC
    mc_siplca = (8, 3, 4, 16) if tiny else mc.MC_SIPLCA

    before = _cache_snapshot()
    rng = np.random.RandomState(0)
    done = []

    def log(kind, desc):
        done.append(desc)
        print(f"[pretune] {kind}: {desc}", flush=True)

    # ---- bench.py single-device engine winners ---------------------------
    for C, L_out, R, T, beta in nmfd_cases:
        V = jnp.asarray(rng.rand(1, C, L_out).astype("f"))
        W = jnp.asarray(rng.rand(C, R, T).astype("f") + 0.1)
        H = jnp.asarray(rng.rand(1, R, L_out - T + 1).astype("f") + 0.1)
        resolve_deconv_factory(V, W, H, beta, 1, NMFD.reconstruct)
        log("nmfd", f"{C}x{L_out} r{R} T{T} beta{beta:g}")

    for N, C, Hs, Ws_, R, kh, kw, beta in nmf2d_cases:
        V = jnp.asarray(rng.rand(N, C, Hs, Ws_).astype("f"))
        W = jnp.asarray(rng.rand(C, R, kh, kw).astype("f") + 0.1)
        H = jnp.asarray(
            rng.rand(N, R, Hs - kh + 1, Ws_ - kw + 1).astype("f") + 0.1
        )
        resolve_deconv_factory(V, W, H, beta, 2, NMF2D.reconstruct)
        log("nmf2d", f"{C}x{Hs}x{Ws_} r{R} k{kh}x{kw} beta{beta:g}")

    for N, C, S, k, R, beta in nmf3d_cases:
        V = jnp.asarray(rng.rand(N, C, *S).astype("f"))
        W = jnp.asarray(rng.rand(C, R, *k).astype("f") + 0.1)
        H = jnp.asarray(
            rng.rand(N, R, *(s - kk + 1 for s, kk in zip(S, k))).astype("f")
            + 0.1
        )
        resolve_deconv_factory(V, W, H, beta, 3, NMF3D.reconstruct)
        log("nmf3d", f"{C}x{S} r{R} k{k} beta{beta:g}")

    def plca_arrays(cls, v_shape, w_shape, h_shape, R):
        V = jnp.asarray(rng.rand(*v_shape).astype("f"))
        W = rng.rand(*w_shape).astype("f")
        W /= W.sum(axis=tuple(i for i in range(W.ndim) if i != 1),
                   keepdims=True)
        H = rng.rand(*h_shape).astype("f")
        H /= H.sum(axis=tuple(i for i in range(H.ndim) if i != 1),
                   keepdims=True)
        Z = np.full((R,), 1.0 / R, "f")
        return V, jnp.asarray(W), jnp.asarray(H), jnp.asarray(Z)

    for N, C, L_out, R, T in siplca_cases:
        V, W, H, Z = plca_arrays(
            SIPLCA, (N, C, L_out), (C, R, T), (N, R, L_out - T + 1), R
        )
        resolve_plca_recon3(SIPLCA, V, W, H, Z)
        log("siplca", f"{C}x{L_out} r{R} T{T}")

    for N, C, Y, X, R, kh, kw in siplca2_cases:
        V, W, H, Z = plca_arrays(
            SIPLCA2, (N, C, Y, X), (C, R, kh, kw),
            (N, R, Y - kh + 1, X - kw + 1), R,
        )
        resolve_plca_recon3(SIPLCA2, V, W, H, Z)
        log("siplca2", f"{C}x{Y}x{X} r{R} k{kh}x{kw}")

    # ---- bench_multichip.py: plain-side winners + halo-mode winners ------
    if "--skip-halo" not in sys.argv:
        from pytorch_nmf_tpu.ops import recon as _recon
        from pytorch_nmf_tpu.parallel import make_mesh
        from pytorch_nmf_tpu.parallel.halo import (
            _sharded_deconv_fit,
            sharded_siplca_fit,
        )

        n_dev = jax.device_count()
        seq_mesh = make_mesh({"seq": n_dev})

        def halo_fit_once(V, W, H, ndim, beta, desc):
            out = _sharded_deconv_fit(
                V, W, H, seq_mesh, ndim, beta, float("-inf"), 2, 0.0, 0.0,
                "seq",
            )
            np.asarray(out[-1])
            log("halo", desc)

        # NMFD r8 + flagship betas (plain-side winners for the flagship
        # rows resolve through the same L=L_loc*n_dev chunk the bench uses)
        N, C, R8, T, L_loc = mc_nmfd_r8
        L = L_loc * n_dev
        V = jnp.asarray(rng.rand(N, C, L).astype("f"))
        W = jnp.asarray(rng.rand(C, R8, T).astype("f") + 0.1)
        H = jnp.asarray(rng.rand(N, R8, L - T + 1).astype("f") + 0.1)
        halo_fit_once(V, W, H, 1, 1.0, f"nmfd r{R8} L{L_loc}loc beta1")

        Rf = mc_flag_r
        Wf = jnp.asarray(rng.rand(C, Rf, T).astype("f") + 0.1)
        Hf = jnp.asarray(rng.rand(N, Rf, L - T + 1).astype("f") + 0.1)
        for beta in mc_flag_betas:
            resolve_deconv_factory(V, Wf, Hf, beta, 1, _recon.deconv1d)
            log("nmfd-mc-plain", f"r{Rf} L{L_loc}loc beta{beta:g}")
            halo_fit_once(V, Wf, Hf, 1, beta,
                          f"nmfd r{Rf} L{L_loc}loc beta{beta:g}")

        # NMF2D halo row
        C2, R2, Y2, ky2, kx2, L2 = (
            (6, 4, 10, 3, 3, 8 * n_dev) if tiny else mc.MC_NMF2D)
        V2 = jnp.asarray(rng.rand(1, C2, Y2 + ky2 - 1, L2).astype("f"))
        W2 = jnp.asarray(rng.rand(C2, R2, ky2, kx2).astype("f") + 0.1)
        H2 = jnp.asarray(
            rng.rand(1, R2, Y2, L2 - kx2 + 1).astype("f") + 0.1
        )
        resolve_deconv_factory(V2, W2, H2, 1.0, 2, _recon.deconv2d)
        log("nmf2d-mc-plain", f"{C2}x{Y2 + ky2 - 1}x{L2} r{R2}")
        halo_fit_once(V2, W2, H2, 2, 1.0, f"nmf2d {C2} r{R2} L{L2}")

        # NMF3D halo rows (hybrid-mode chunk + full-fused chunk)
        C3, R3, k3, S3, L3_loc = mc_nmf3d
        for lloc, tag in ((L3_loc, "hybrid"),
                          (mc_ff_lloc, "fullfused")):
            L3 = lloc * n_dev
            V3 = jnp.asarray(rng.rand(
                1, C3, S3[0] + k3[0] - 1, S3[1] + k3[1] - 1, L3
            ).astype("f"))
            W3 = jnp.asarray(rng.rand(C3, R3, *k3).astype("f") + 0.1)
            H3 = jnp.asarray(rng.rand(
                1, R3, S3[0], S3[1], L3 - k3[2] + 1
            ).astype("f") + 0.1)
            resolve_deconv_factory(V3, W3, H3, 1.0, 3, _recon.deconv3d)
            log("nmf3d-mc-plain", f"{C3} r{R3} L{lloc}loc ({tag})")
            halo_fit_once(V3, W3, H3, 3, 1.0,
                          f"nmf3d {C3} r{R3} L{lloc}loc ({tag})")

        # SIPLCA EM halo row
        Cs, Rs, Ts, Ls_loc = mc_siplca
        Ls = Ls_loc * n_dev
        Vs, Ws, Hs, Zs = plca_arrays(
            SIPLCA, (1, Cs, Ls), (Cs, Rs, Ts), (1, Rs, Ls - Ts + 1), Rs
        )
        resolve_plca_recon3(SIPLCA, Vs, Ws, Hs, Zs)
        out = sharded_siplca_fit(
            Vs, Ws, Hs, Zs, seq_mesh, tol=float("-inf"), max_iter=2
        )
        np.asarray(out[-1])
        log("siplca-halo", f"{Cs}x{Ls_loc}loc r{Rs} T{Ts}")

    after = _cache_snapshot()
    new = {k: v for k, v in after.items() if before.get(k) != v}
    print(f"[pretune] resolved {len(done)} items; "
          f"{len(new)} new/changed cache entries "
          f"({os.environ['PNT_AUTOTUNE_CACHE']})")
    for k, v in sorted(new.items()):
        print(f"[pretune]   + {k} -> {v}")


if __name__ == "__main__":
    main()
