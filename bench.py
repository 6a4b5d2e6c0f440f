#!/usr/bin/env python
"""Headline benchmark + graded grid: NMF multiplicative-update iteration time.

Covers the reference's benchmark configuration (BASELINE.md: V = 5168x1025
spectrogram-sized matrix, rank 88, dense beta in {0, 0.5, 1, 1.5, 2} and
sparse top-2%-COO beta in {0.5, 1, 1.5, 2}) plus the north-star scale
4096x4096 rank-256 at beta in {1, 2} (BASELINE.md "Targets").

Methodology: every dispatch through the (relay-attached) TPU runtime carries
a large fixed latency (~35-40 ms) that is not device compute.  The honest
per-iteration cost is the MARGINAL rate: time the same compiled on-device
fit at two loop lengths and divide the difference — fixed overhead cancels.

Prints exactly one JSON line.  Headline keys ("metric", "value", "unit",
"vs_baseline") describe the reference benchmark's beta=1 dense row (vs. the
torchnmf CUDA RTX 3070 baseline); the "grid" key carries every measured row
with its own baseline comparison.
"""

import json
import os
import sys
import time

import numpy as np

# CI smoke mode: tiny shapes + short timing targets so the driver-facing
# script is exercised end-to-end on the CPU mesh by the test suite
# (tests/test_bench_scripts.py) and cannot rot between TPU bench runs
TINY = os.environ.get("PNT_BENCH_TINY", "") == "1"
if os.environ.get("PNT_FORCE_CPU", "") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

# seed the deconv engine autotuner from the checked-in winner cache
# (measured on TPU v5e; re-tunes and updates the file for unseen shapes)
os.environ.setdefault(
    "PNT_AUTOTUNE_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "autotune_cache.json"),
)

# torchnmf CUDA (RTX 3070) ms/iter from BASELINE.md; sklearn-CPU ms/iter for
# the sparse 10x-sklearn north-star target.
BASELINE_CUDA_MS = {
    ("dense", 0.0): 1.96,
    ("dense", 0.5): 2.17,
    ("dense", 1.0): 1.31,
    ("dense", 1.5): 2.19,
    ("dense", 2.0): 1.33,
    ("sparse", 0.5): 634.0,
    ("sparse", 1.0): 84.8,
    ("sparse", 1.5): 625.0,
    ("sparse", 2.0): 4.37,
}
BASELINE_SKLEARN_MS = {
    ("sparse", 0.5): 512.0,
    ("sparse", 1.0): 72.9,
    ("sparse", 1.5): 367.0,
    ("sparse", 2.0): 11.6,
}


def _marginal_ms_per_iter(make_fit, args, reps=4, target_s=None):
    """Two-loop-length difference quotient, min over reps.

    The relay runtime's run-to-run variance is ~±100 ms even on mins, so a
    pilot run first rescales the loop lengths until the long run costs
    ~``target_s`` of device time — the difference then dwarfs the noise
    floor for every grid row, fast and slow alike.  If a session still
    produces a non-positive difference, retry once, then fall back to the
    total rate of the long run — biased high by the amortized dispatch
    cost, never negative.  (Shared with ``bench_multichip.py`` — one
    timing discipline, one implementation.)
    """
    FIXED_S = 0.035  # typical relay dispatch+fetch latency
    TARGET_S = target_s if target_s is not None else (0.05 if TINY else 2.0)

    def timed(iters, n_reps=reps):
        fit = make_fit(iters)
        for _ in range(2):  # compile + relay first-execution warmup
            out = fit(*args)
            np.asarray(out[-1])
        times = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            out = fit(*args)
            # sync on the scalar n_iter: any output of the compiled program
            # waits for the whole program, and fetching a factor instead
            # would ship up to ~144 MB (the NMFD kernel) through the relay
            # per timed call
            np.asarray(out[-1])
            times.append(time.perf_counter() - t0)
        return min(times)

    iters_long = 100 if TINY else 500
    t_pilot = timed(iters_long, n_reps=2)
    compute = max(t_pilot - FIXED_S, 0.004)
    if compute < TARGET_S:
        iters_long = min(int(iters_long * TARGET_S / compute), 200_000)
    elif compute > 1.5 * TARGET_S:
        # floor sized for the 500-iter TPU regime; TINY smoke runs keep
        # their ~TARGET_S device-time budget instead of quadrupling it
        iters_long = max(int(iters_long * TARGET_S / compute),
                         50 if TINY else 400)
    iters_short = max(iters_long // 8, 50)

    for _ in range(2):
        t_short = timed(iters_short)
        t_long = timed(iters_long)
        ms = (t_long - t_short) / (iters_long - iters_short) * 1000.0
        if ms > 0:
            return ms
    return t_long / iters_long * 1000.0


def main():
    import jax.numpy as jnp

    from pytorch_nmf_tpu.ops.autotune import enable_compile_cache

    # persistent compile cache: candidate/solver compiles amortize across
    # bench runs (measured 164s -> 0.6s through the relay backend)
    enable_compile_cache(
        os.environ.get(
            "PNT_COMPILE_CACHE",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"),
        )
    )

    from pytorch_nmf_tpu.models.nmf import NMF
    from pytorch_nmf_tpu.ops.fast_nmf import resolve_nmf_updater_factory
    from pytorch_nmf_tpu.ops.solver import get_dense_fit, get_sparse_fit
    from pytorch_nmf_tpu.ops.sparse import nmf_sp_pos_neg, sparse_from_dense

    factory = resolve_nmf_updater_factory()
    rng = np.random.RandomState(0)
    grid = []

    def dense_row(M, K, R, beta, tag):
        V = jnp.asarray(rng.rand(M, K).astype("f") + 1e-3)
        W = jnp.asarray(rng.rand(K, R).astype("f") + 0.1)
        H = jnp.asarray(rng.rand(M, R).astype("f") + 0.1)

        def make_fit(n):
            # tol=-inf: the convergence test ((prev-loss)/init < tol) must
            # NEVER fire during timing — tol=0 still exits early when f32
            # noise makes the loss tick upward near the optimum
            return get_dense_fit(
                NMF.reconstruct, float(beta), float("-inf"), n, True, True,
                0.0, 0.0, False, factory,
            )

        ms = _marginal_ms_per_iter(make_fit, (V, W, H))
        row = {
            "metric": f"nmf_dense_mu_iter_{M}x{K}_r{R}_beta{beta:g}",
            "value": round(ms, 5),
            "unit": "ms/iter",
            "iters_per_sec": round(1000.0 / ms, 1),
        }
        base = BASELINE_CUDA_MS.get(("dense", float(beta)))
        if tag == "ref" and base is not None and not TINY:
            row["vs_baseline"] = round(base / ms, 2)
        grid.append(row)
        return row

    def _sklearn_available():
        try:
            import sklearn  # noqa: F401
            from scipy import sparse  # noqa: F401

            return True
        except ImportError:
            return False

    # live sklearn oracle: auto-enabled when sklearn is importable (the
    # reference benchmark.ipynb cell 4 runs sklearn side-by-side), so the
    # vs_sklearn ratios self-verify wherever possible; --no-sklearn opts
    # out, --with-sklearn asserts it (ImportError skip stays clean)
    with_sklearn = "--with-sklearn" in sys.argv or (
        "--no-sklearn" not in sys.argv and _sklearn_available()
    )

    def sklearn_ms_per_iter(V_csr, R, beta):
        """Live sklearn-MU oracle (reference benchmark.ipynb cell 4 runs
        sklearn side-by-side; enabled with --with-sklearn)."""
        from sklearn.decomposition import NMF as SkNMF

        def timed(iters):
            m = SkNMF(
                n_components=R, solver="mu", beta_loss=float(beta),
                init="random", random_state=0, max_iter=iters, tol=0.0,
            )
            t0 = time.perf_counter()
            import warnings

            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                m.fit(V_csr)
            return time.perf_counter() - t0

        t_short, t_long = timed(5), timed(25)
        return max((t_long - t_short) / 20 * 1000.0, 1e-9)

    def sparse_row(M, K, R, beta):
        Vd = rng.rand(M, K).astype("f")
        thr = float(np.quantile(Vd, 0.98))
        V_np = np.where(Vd > thr, Vd, 0)
        V_sp = sparse_from_dense(V_np)
        W = jnp.asarray(rng.rand(K, R).astype("f") + 0.1)
        H = jnp.asarray(rng.rand(M, R).astype("f") + 0.1)

        from pytorch_nmf_tpu.ops.sparse import should_densify

        densify = should_densify(V_sp)

        def make_fit(n):
            return get_sparse_fit(
                nmf_sp_pos_neg, float(beta), float("-inf"), n, True, True,
                0.0, 0.0, False,
                densify, NMF.reconstruct, factory if densify else None,
            )

        ms = _marginal_ms_per_iter(make_fit, (V_sp, W, H))
        row = {
            "metric": f"nmf_sparse_mu_iter_{M}x{K}_r{R}_2pct_beta{beta:g}",
            "value": round(ms, 5),
            "unit": "ms/iter",
            "iters_per_sec": round(1000.0 / ms, 1),
        }
        if not TINY:
            row["vs_baseline"] = round(
                BASELINE_CUDA_MS[("sparse", float(beta))] / ms, 2
            )
            row["vs_sklearn_cpu"] = round(
                BASELINE_SKLEARN_MS[("sparse", float(beta))] / ms, 2
            )
        if with_sklearn:
            try:
                from scipy import sparse as _sps

                sk_ms = sklearn_ms_per_iter(
                    _sps.csr_matrix(V_np), R, beta
                )
                row["sklearn_live_ms"] = round(sk_ms, 3)
                row["vs_sklearn_live"] = round(sk_ms / ms, 2)
            except ImportError:
                pass
        grid.append(row)
        return row

    REF_M, REF_K, REF_R = (96, 48, 8) if TINY else (5168, 1025, 88)
    NS_M, NS_K, NS_R = (64, 64, 8) if TINY else (4096, 4096, 256)

    # reference benchmark scale (5168x1025 r88) — dense beta grid
    headline = None
    for beta in (0.0, 0.5, 1.0, 1.5, 2.0):
        row = dense_row(REF_M, REF_K, REF_R, beta, tag="ref")
        if beta == 1.0:
            headline = row

    # north-star scale (BASELINE.md "Targets": 4096x4096 rank-256)
    for beta in (1.0, 2.0):
        dense_row(NS_M, NS_K, NS_R, beta, tag="northstar")

    # sparse top-2% COO grid
    for beta in (0.5, 1.0, 1.5, 2.0):
        sparse_row(REF_M, REF_K, REF_R, beta)

    # gather-regime sparse (target too large to densify in practice):
    # dual-ELL fast path at 8192^2, ~1% nnz — no reference baseline exists
    # at this scale (the reference's sparse path is slower than its dense
    # one); reported for regression tracking of the beyond-HBM story
    from pytorch_nmf_tpu.ops.sparse import SparseCOO, build_ell

    Msp, Ksp, Rsp = (256, 256, 8) if TINY else (8192, 8192, 64)
    nnz_target = 2_000 if TINY else 671_000
    flat = np.unique(
        rng.randint(0, Msp * Ksp, int(nnz_target * 1.1)).astype(np.int64)
    )
    rng.shuffle(flat)
    flat = np.sort(flat[:nnz_target])
    sp_idx = np.stack([(flat // Ksp).astype("i4"), (flat % Ksp).astype("i4")])
    V_ell = build_ell(
        SparseCOO(sp_idx, rng.rand(len(flat)).astype("f") + 0.01, (Msp, Ksp))
    )
    W = jnp.asarray(rng.rand(Ksp, Rsp).astype("f") + 0.1)
    H = jnp.asarray(rng.rand(Msp, Rsp).astype("f") + 0.1)

    def make_fit(n):
        return get_sparse_fit(
            nmf_sp_pos_neg, 1.0, float("-inf"), n, True, True,
            0.0, 0.0, False, False, NMF.reconstruct, None, True,
        )

    ms = _marginal_ms_per_iter(make_fit, (V_ell, W, H))
    grid.append({
        "metric": f"nmf_sparse_ell_mu_iter_{Msp}x{Ksp}_r{Rsp}_1pct_beta1",
        "value": round(ms, 5),
        "unit": "ms/iter",
        "iters_per_sec": round(1000.0 / ms, 1),
    })

    # deconvolutional rows (librosa-shaped NMFD flagship + the measured
    # mid-scale path-inversion shape) — the engine per row comes from the
    # per-shape runtime autotuner exactly as a model-API fit would
    # (ops/autotune.py; winners persisted in autotune_cache.json)
    from pytorch_nmf_tpu.models.nmf import NMFD
    from pytorch_nmf_tpu.ops.autotune import resolve_deconv_factory

    nmfd_cases = [
        # (C, L_out, R, T, beta) — flagship grid
        (1025, 5000, 8, 400, 1.0),
        # low-rank β=2: the R·T < L corner where the autocorrelation W
        # denominator (PNT_NMFD_AUTOCORR) is a candidate — this row
        # tracks whichever engine the autotuner measures fastest
        (1025, 5000, 8, 400, 2.0),
        (1025, 5000, 88, 400, 1.0),
        (1025, 5000, 88, 400, 2.0),
        # the round-2 42x inversion shape (ROADMAP "Deconv path
        # selection"): autotune must land on the conv engine here
        (256, 2000, 32, 128, 2.0),
    ] if not TINY else [
        (16, 120, 3, 10, 1.0),
        (16, 120, 3, 10, 2.0),
    ]
    for C, L_out, R, T, beta in nmfd_cases:
        N = 1
        V = jnp.asarray(rng.rand(N, C, L_out).astype("f"))
        W = jnp.asarray(rng.rand(C, R, T).astype("f") + 0.1)
        H = jnp.asarray(rng.rand(N, R, L_out - T + 1).astype("f") + 0.1)
        factory_d = resolve_deconv_factory(V, W, H, beta, 1, NMFD.reconstruct)

        def make_fit(n, _beta=beta, _f=factory_d):
            return get_dense_fit(
                NMFD.reconstruct, _beta, float("-inf"), n, True, True,
                0.0, 0.0, False, _f,
            )

        ms = _marginal_ms_per_iter(make_fit, (V, W, H))
        grid.append({
            "metric": f"nmfd_dense_mu_iter_{C}x{L_out}_r{R}_T{T}_beta{beta:g}",
            "value": round(ms, 5),
            "unit": "ms/iter",
            "iters_per_sec": round(1000.0 / ms, 1),
        })

    # NMF2D (2-D deconv): engine per row from the runtime autotuner.
    #   - 64x128² r16: low-rank spectrogram-patch scale (conv wins)
    #   - 256x64² r64 β∈{1,2}: the fused-kernel scale — the candidate set
    #     is conv vs unfold vs the flat-offset Mosaic engines; the row
    #     tracks whichever actually measures fastest (r3: conv at β=1)
    #   - 256x128² r64: the VMEM-gated scale where the full fused mode is
    #     rejected and the hybrid "pallas_w" is the open candidate
    from pytorch_nmf_tpu.models.nmf import NMF2D

    nmf2d_cases = [
        (1, 8, 24, 24, 4, 3, 3, 1.0),
        (1, 10, 24, 24, 6, 3, 3, 2.0),
    ] if TINY else [
        (1, 64, 128, 128, 16, 8, 8, 1.0),
        (1, 256, 64, 64, 64, 8, 8, 1.0),
        (1, 256, 64, 64, 64, 8, 8, 2.0),
        (1, 256, 128, 128, 64, 8, 8, 1.0),
        # rank-128 shape where the fused flat-offset kernel beats conv
        # (measured r4: pallas 0.778 vs conv 0.921 vs unfold 1.127 ms/iter)
        (1, 512, 64, 64, 128, 8, 8, 1.0),
    ]
    for N, C, Hs, Ws_, R2, kh, kw, beta2 in nmf2d_cases:
        V2d = jnp.asarray(rng.rand(N, C, Hs, Ws_).astype("f"))
        W2d = jnp.asarray(rng.rand(C, R2, kh, kw).astype("f") + 0.1)
        H2d = jnp.asarray(
            rng.rand(N, R2, Hs - kh + 1, Ws_ - kw + 1).astype("f") + 0.1
        )
        fac2d = resolve_deconv_factory(
            V2d, W2d, H2d, beta2, 2, NMF2D.reconstruct
        )

        def make_fit_2d(n, _b=beta2, _f=fac2d):
            return get_dense_fit(
                NMF2D.reconstruct, _b, float("-inf"), n, True, True,
                0.0, 0.0, False, _f,
            )

        ms = _marginal_ms_per_iter(make_fit_2d, (V2d, W2d, H2d))
        grid.append({
            "metric": (
                f"nmf2d_dense_mu_iter_{C}x{Hs}x{Ws_}_r{R2}"
                f"_k{kh}x{kw}_beta{beta2:g}"
            ),
            "value": round(ms, 5),
            "unit": "ms/iter",
            "iters_per_sec": round(1000.0 / ms, 1),
        })

    # NMF3D (volumetric deconv): regression row for the autotuned winner
    from pytorch_nmf_tpu.models.nmf import NMF3D

    N, C3, S3, k3, R3 = (
        (1, 4, (6, 6, 6), (2, 2, 2), 2) if TINY
        else (1, 64, (19, 19, 19), (4, 4, 4), 16)
    )
    V3d = jnp.asarray(rng.rand(N, C3, *S3).astype("f"))
    W3d = jnp.asarray(rng.rand(C3, R3, *k3).astype("f") + 0.1)
    H3d = jnp.asarray(
        rng.rand(N, R3, *(s - k + 1 for s, k in zip(S3, k3))).astype("f")
        + 0.1
    )
    fac3d = resolve_deconv_factory(V3d, W3d, H3d, 1.0, 3, NMF3D.reconstruct)

    def make_fit_3d(n):
        return get_dense_fit(
            NMF3D.reconstruct, 1.0, float("-inf"), n, True, True,
            0.0, 0.0, False, fac3d,
        )

    ms = _marginal_ms_per_iter(make_fit_3d, (V3d, W3d, H3d))
    grid.append({
        "metric": (
            f"nmf3d_dense_mu_iter_{C3}x{S3[0]}x{S3[1]}x{S3[2]}"
            f"_r{R3}_k{k3[0]}_beta1"
        ),
        "value": round(ms, 5),
        "unit": "ms/iter",
        "iters_per_sec": round(1000.0 / ms, 1),
    })

    # Hoyer sparseness-constrained fit (projected gradient + line search)
    from pytorch_nmf_tpu.ops.solver import get_hoyer_fit

    M, K, R = REF_M, REF_K, REF_R
    Vh = jnp.asarray(rng.rand(M, K).astype("f") + 1e-3)
    Wh = jnp.asarray(rng.rand(K, R).astype("f") + 0.1)
    Hh = jnp.asarray(rng.rand(M, R).astype("f") + 0.1)

    def make_fit_hoyer(n):
        return get_hoyer_fit(
            NMF.reconstruct, None, 2.0, n, True, True, 0.5, None, K, M,
        )

    ms = _marginal_ms_per_iter(make_fit_hoyer, (Vh, Wh, Hh))
    grid.append({
        "metric": f"nmf_hoyer_iter_{M}x{K}_r{R}_sW0.5_beta2",
        "value": round(ms, 5),
        "unit": "ms/iter",
        "iters_per_sec": round(1000.0 / ms, 1),
    })

    # BetaMu composed-model trainer (the reference's generic-MU headline,
    # torchnmf/trainer.py): a 3-layer chain, one compiled sweep per step
    import pytorch_nmf_tpu as pnt
    from pytorch_nmf_tpu.trainer import BetaMu

    pnt.manual_seed(0)
    if TINY:
        chain = pnt.Sequential(
            NMF((64, 16), rank=8),
            NMF(W=(32, 16)),
            NMF(W=(64, 32)),
        )
        target = jnp.asarray(rng.rand(64, 64).astype("f"))
    else:
        chain = pnt.Sequential(
            NMF((2048, 256), rank=128),
            NMF(W=(512, 256)),
            NMF(W=(2048, 512)),
        )
        target = jnp.asarray(rng.rand(2048, 2048).astype("f"))
    trainer = BetaMu(chain.parameters(), 1)

    def closure():
        trainer.zero_grad()
        return target, chain(None)

    params = list(chain.parameters())
    for _ in range(3):  # compile + relay warmup
        trainer.step(closure)
    float(params[0].data.ravel()[0])  # drain pending work (scalar sync)
    n_steps = 5 if TINY else 30
    chain_tag = "64x64_r8_16_32" if TINY else "2048x2048_r128_256_512"
    t0 = time.perf_counter()
    for _ in range(n_steps):
        trainer.step(closure)
    float(params[0].data.ravel()[0])
    ms = (time.perf_counter() - t0) / n_steps * 1000.0
    grid.append({
        "metric": f"betamu_chain_step_{chain_tag}_beta1",
        "value": round(ms, 5),
        "unit": "ms/step",
        "note": "includes per-step host dispatch",
    })

    # same chain through the compiled multi-step driver (trainer.run):
    # one dispatch for the whole while_loop of sweeps — the marginal rate
    # is pure device compute
    def make_run(n):
        def fit(*_):
            trainer.run(closure, n)
            return (params[0].data[0, 0],)

        return fit

    ms_run = _marginal_ms_per_iter(make_run, ())
    grid.append({
        "metric": f"betamu_chain_run_{chain_tag}_beta1",
        "value": round(ms_run, 5),
        "unit": "ms/step",
        "note": "compiled while_loop over sweeps (trainer.run)",
    })

    # dense PLCA EM (reference scale; the generic single-VJP E-step —
    # measured faster than the fused Pallas form on v5e, see ROADMAP)
    from pytorch_nmf_tpu.models.plca import PLCA, SIPLCA
    from pytorch_nmf_tpu.ops.solver import get_plca_fit

    Mp, Kp, Rp = (40, 24, 4) if TINY else (5168, 1025, 88)
    Vp = jnp.asarray(rng.rand(Mp, Kp).astype("f"))
    Wpd = rng.rand(Kp, Rp).astype("f"); Wpd /= Wpd.sum(0)
    Hpd = rng.rand(Mp, Rp).astype("f"); Hpd /= Hpd.sum(0)
    Zpd = np.full((Rp,), 1.0 / Rp, "f")

    def make_fit_plca(n):
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

    ms = _marginal_ms_per_iter(
        make_fit_plca,
        (Vp, jnp.asarray(Wpd), jnp.asarray(Hpd), jnp.asarray(Zpd)),
    )
    grid.append({
        "metric": f"plca_em_iter_{Mp}x{Kp}_r{Rp}",
        "value": round(ms, 5),
        "unit": "ms/iter",
        "iters_per_sec": round(1000.0 / ms, 1),
    })

    # shift-invariant PLCA EM (spectrogram-scale; the engine speedups
    # reach it through the E-step VJP — recon selected like the model
    # path does, via the measured per-shape autotuner)
    from pytorch_nmf_tpu.ops.autotune import resolve_plca_recon3

    siplca_shapes = (
        [(1, 24, 200, 3, 10)] if TINY
        else [(1, 513, 3000, 8, 200), (1, 513, 3000, 64, 200)]
    )
    for N, C, L_out, R, T in siplca_shapes:
        V = jnp.asarray(rng.rand(N, C, L_out).astype("f"))
        Wp = rng.rand(C, R, T).astype("f")
        Wp /= Wp.sum(axis=(0, 2), keepdims=True)
        Hp = rng.rand(N, R, L_out - T + 1).astype("f")
        Hp /= Hp.sum(axis=(0, 2), keepdims=True)
        Zp = np.full((R,), 1.0 / R, "f")
        recon3 = resolve_plca_recon3(
            SIPLCA, V, jnp.asarray(Wp), jnp.asarray(Hp), jnp.asarray(Zp)
        )

        def make_fit(n, _r3=recon3):
            inner = get_plca_fit(
                _r3, float("-inf"), n, True, True, True,
                False, False, False,
            )

            def fit(V, W, H, Z):
                return inner(
                    V, W, H, Z,
                    jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0),
                )

            return fit

        ms = _marginal_ms_per_iter(
            make_fit, (V, jnp.asarray(Wp), jnp.asarray(Hp), jnp.asarray(Zp))
        )
        grid.append({
            "metric": f"siplca_em_iter_{C}x{L_out}_r{R}_T{T}",
            "value": round(ms, 5),
            "unit": "ms/iter",
            "iters_per_sec": round(1000.0 / ms, 1),
        })

    # 2-D shift-invariant PLCA EM: tracks the N-D EM recon autotune
    from pytorch_nmf_tpu.models.plca import SIPLCA2

    N2, C2, Y2, X2, R2p, kh2, kw2 = (
        (1, 8, 16, 16, 3, 3, 3) if TINY else (1, 64, 64, 64, 16, 8, 8)
    )
    V2p = jnp.asarray(rng.rand(N2, C2, Y2, X2).astype("f"))
    W2p = rng.rand(C2, R2p, kh2, kw2).astype("f")
    W2p /= W2p.sum(axis=(0, 2, 3), keepdims=True)
    H2p = rng.rand(
        N2, R2p, Y2 - kh2 + 1, X2 - kw2 + 1
    ).astype("f")
    H2p /= H2p.sum(axis=(0, 2, 3), keepdims=True)
    Z2p = np.full((R2p,), 1.0 / R2p, "f")
    recon3_2d = resolve_plca_recon3(
        SIPLCA2, V2p, jnp.asarray(W2p), jnp.asarray(H2p), jnp.asarray(Z2p)
    )

    def make_fit_si2(n):
        inner = get_plca_fit(
            recon3_2d, float("-inf"), n, True, True, True,
            False, False, False,
        )

        def fit(V, W, H, Z):
            return inner(
                V, W, H, Z,
                jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0),
            )

        return fit

    ms = _marginal_ms_per_iter(
        make_fit_si2,
        (V2p, jnp.asarray(W2p), jnp.asarray(H2p), jnp.asarray(Z2p)),
    )
    grid.append({
        "metric": f"siplca2_em_iter_{C2}x{Y2}x{X2}_r{R2p}_k{kh2}x{kw2}",
        "value": round(ms, 5),
        "unit": "ms/iter",
        "iters_per_sec": round(1000.0 / ms, 1),
    })

    # streaming fit (host-resident target, ops/streaming.py): the capacity
    # path's per-iteration rate.  DMA/host-transfer-bound by design — the
    # row tracks regressions in the block pipeline (prefetch overlap,
    # per-block dispatch count), not MXU throughput.  Loop lengths stay
    # under the 10-iteration loss cadence so the marginal rate is the
    # pure stream+update cost.
    from pytorch_nmf_tpu.ops.streaming import streaming_nmf_fit

    Mst, Kst, Rst, blk = (64, 32, 4, 16) if TINY else (2048, 1024, 64, 512)
    V_host = rng.rand(Mst, Kst).astype("f")  # stays host-resident
    Wst0 = rng.rand(Kst, Rst).astype("f") + 0.1
    Hst0 = rng.rand(Mst, Rst).astype("f") + 0.1

    def run_stream(n):
        W0, H0 = jnp.asarray(Wst0), jnp.asarray(Hst0)
        t0 = time.perf_counter()
        Wf, _, _ = streaming_nmf_fit(
            V_host, W0, H0, beta=1.0, tol=float("-inf"), max_iter=n,
            row_block=blk,
        )
        np.asarray(Wf[0, 0])  # scalar sync (host loop may have work queued)
        return time.perf_counter() - t0

    for _ in range(2):  # compile + relay warmup
        run_stream(2)
    t_s = min(run_stream(3) for _ in range(2))
    t_l = min(run_stream(7) for _ in range(2))
    ms = (t_l - t_s) / 4 * 1000.0
    if ms <= 0:  # contaminated host timing: fall back to the total rate
        ms = t_l / 7 * 1000.0
    grid.append({
        "metric": f"nmf_streaming_mu_iter_{Mst}x{Kst}_r{Rst}_blk{blk}_beta1",
        "value": round(ms, 5),
        "unit": "ms/iter",
        "iters_per_sec": round(1000.0 / ms, 1),
        "note": "host-resident target streamed in row blocks "
                "(host-transfer-bound by design; ops/streaming.py)",
    })

    # checkpointed fit (utils/checkpoint.py): absolute overhead per
    # checkpoint boundary vs the uninterrupted fit — segment re-dispatch +
    # boundary loss eval + factor fetch + atomic npz write.  Reported as
    # ms/checkpoint (scale-free: real runs amortize it over `every`
    # iterations), not a ratio, because the fixed relay round-trips would
    # dominate a ratio at bench-sized iteration counts.
    import shutil
    import tempfile

    from pytorch_nmf_tpu.utils.checkpoint import checkpointed_fit

    Mc, Kc, Rc = (48, 24, 4) if TINY else (REF_M, REF_K, REF_R)
    iters_c, every_c = (8, 2) if TINY else (200, 50)
    Vc = jnp.asarray(rng.rand(Mc, Kc).astype("f"))
    Wc0 = rng.rand(Kc, Rc).astype("f") + 0.1
    Hc0 = rng.rand(Mc, Rc).astype("f") + 0.1

    def run_plain_fit():
        m = NMF(W=jnp.asarray(Wc0), H=jnp.asarray(Hc0))
        t0 = time.perf_counter()
        m.fit(Vc, 1, float("-inf"), iters_c)
        np.asarray(m.W.data[0, 0])
        return time.perf_counter() - t0

    def run_ckpt_fit():
        m = NMF(W=jnp.asarray(Wc0), H=jnp.asarray(Hc0))
        d = tempfile.mkdtemp(prefix="pnt_bench_ckpt_")
        try:
            t0 = time.perf_counter()
            checkpointed_fit(
                m, Vc, beta=1, tol=float("-inf"), max_iter=iters_c,
                every=every_c, directory=d, resume=False,
            )
            np.asarray(m.W.data[0, 0])
            return time.perf_counter() - t0
        finally:
            shutil.rmtree(d, ignore_errors=True)

    run_plain_fit(); run_ckpt_fit()  # compile + relay warmup
    t_plain = min(run_plain_fit() for _ in range(2))
    t_ck = min(run_ckpt_fit() for _ in range(2))
    n_seg = -(-iters_c // every_c)
    ms_ckpt = max((t_ck - t_plain) / n_seg * 1000.0, 1e-6)
    grid.append({
        "metric": (
            f"nmf_checkpointed_fit_overhead_{Mc}x{Kc}_r{Rc}"
            f"_seg{every_c}_beta1"
        ),
        "value": round(ms_ckpt, 5),
        "unit": "ms/checkpoint",
        "ms_plain_fit": round(t_plain * 1000.0, 3),
        "ms_ckpt_fit": round(t_ck * 1000.0, 3),
        "n_checkpoints": n_seg,
        "note": "segment re-dispatch + boundary loss + factor fetch + "
                "atomic npz write, per checkpoint (utils/checkpoint.py)",
    })

    out = {
        "metric": headline["metric"],
        "value": headline["value"],
        "unit": "ms/iter",
        "vs_baseline": headline.get("vs_baseline", 0.0),
        "grid": grid,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
