r"""One-time per-shape runtime autotune for the deconvolutional MU engine.

Why this exists (VERDICT r2 item 1, ROADMAP "Deconv path selection"): the
relative cost of the three deconv MU formulations — XLA's conv engine, the
unfold/patch-GEMM engine (:mod:`.fast_nmfd`), and the FFT cross-spectrum
engine at β=2 (:mod:`.fft_nmfd`) — is NOT a simple function of shape.
Measured on TPU v5e:

* flagship (C=1025, R=3-88, T=400, L=5000): unfold beats conv 8-15×
  (XLA's conv rate collapses with tiny R);
* mid-scale (C=256, R=32, T=128, L=2000, β=2): conv beats unfold **42×**
  (0.59 vs 24.8 ms/iter — the slice-op overhead dominates the small GEMMs).

No static heuristic we tried captures both regimes, so the only honest
selector is empirical: compile each applicable candidate once for the
actual (shape, β) about to be fitted, time a few iterations of the real
update pair ON THE REAL DEVICE, and cache the winner next to the solver
cache.  Problems below a FLOP threshold keep the static heuristic — at
sub-ms iteration costs the wrong choice loses microseconds while an
autotune would cost seconds of compilation.

Timing methodology mirrors ``bench.py``: the iteration count is a TRACED
``fori_loop`` bound, so one compiled program serves both loop lengths, and
the per-iteration cost is the two-length difference quotient — the fixed
dispatch+fetch latency of relay-attached TPU runtimes (~35-40 ms) cancels
exactly.  Sync is on a scalar.

Env knobs:

* ``PNT_NMFD_AUTOTUNE=0`` — disable (static heuristic only);
  ``=1`` — force, ignoring the FLOP threshold.
* ``PNT_AUTOTUNE_MIN_FLOPS`` — threshold (default 1e9 conv-MACs/iter).
* ``PNT_AUTOTUNE_CACHE=/path.json`` — opt-in persistent winner cache
  (process-local otherwise).
* The engine kill switches still win: ``PNT_NMFD_UNFOLD=0`` forces conv,
  ``PNT_NMFD_FFT=1`` forces the FFT β=2 engine.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "resolve_deconv_factory",
    "autotune_winner",
    "clear_cache",
    "enable_compile_cache",
]


def install_atomic_cache_puts() -> None:
    """Make JAX's persistent compile-cache writes atomic (tmp +
    ``os.replace``).  Upstream ``lru_cache.LRUCache.put`` is a plain
    ``write_bytes``: a process killed mid-write (``timeout``, a relay
    drop) leaves a truncated entry, and a LATER process segfaults
    deserializing it inside ``compilation_cache.get_executable_and_time``
    (observed on this host).  The patch pre-writes the entry atomically
    and lets the original ``put`` early-return on the existing file;
    eviction-enabled caches (``jax_compilation_cache_max_size`` set —
    never here) keep the upstream path untouched, since their atime
    bookkeeping lives behind a file lock the pre-write doesn't hold."""
    try:
        from jax._src import lru_cache as _lru
    except Exception:  # pragma: no cover - jax internals moved
        return
    orig_put = _lru.LRUCache.put
    if getattr(orig_put, "_pnt_atomic", False):
        return

    def put(self, key, val):
        if key and not self.eviction_enabled:
            cache_path = self.path / f"{key}{_lru._CACHE_SUFFIX}"
            tmp = self.path / (
                f"{key}{_lru._CACHE_SUFFIX}.tmp.{os.getpid()}"
            )
            try:
                if not cache_path.exists():
                    tmp.write_bytes(val)
                    os.replace(tmp, cache_path)
            except OSError:  # non-local fs / no rename: upstream path
                try:
                    tmp.unlink()
                except OSError:
                    pass
        return orig_put(self, key, val)

    put._pnt_atomic = True
    _lru.LRUCache.put = put


def enable_compile_cache(path: str) -> None:
    """Point JAX's persistent compilation cache at ``path`` (no-op if one
    is already configured).  Measured through the relay-attached TPU
    backend: a program whose first-process compile took 164 s loaded from
    the cache in 0.6 s — this is what makes the autotuner's
    compile-every-candidate strategy cheap across processes.  Called by
    ``bench.py``/``bench_multichip.py``; library users opt in themselves
    (JAX exposes the same knob as ``JAX_COMPILATION_CACHE_DIR``).

    Entries written before the atomic-put patch can be truncated, and a
    truncated entry SEGFAULTS the reader inside XLA deserialization — the
    patch cannot cure pre-existing damage, so a cache dir without the
    one-time marker is wiped on first use (tests/conftest.py applies the
    same migration to the test cache)."""
    install_atomic_cache_puts()
    marker = os.path.join(path, ".atomic_puts_ok")
    if os.path.isdir(path) and not os.path.exists(marker):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    with open(marker, "w"):
        pass
    if not jax.config.jax_compilation_cache_dir:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# (platform, spatial_ndim, beta, V_shape, H_shape) -> winner name
_WINNERS = {}
_MIN_FLOPS_DEFAULT = 1e9


def clear_cache() -> None:
    _WINNERS.clear()


def _persist_path():
    return os.environ.get("PNT_AUTOTUNE_CACHE", "")


def _key_str(key) -> str:
    platform, nd, beta, vs, hs = key
    return f"{platform}|{nd}|{beta:g}|{','.join(map(str, vs))}|" \
           f"{','.join(map(str, hs))}"


def _load_persisted(key):
    path = _persist_path()
    if not path or not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f).get(_key_str(key))
    except (OSError, ValueError):
        return None


def _cached(key):
    """Process-local → persistent winner lookup (``None`` on miss).
    Hoisted out of the autotune entry points so mode selectors can check
    for a hit BEFORE building proxy arrays (a cache hit must cost no
    device transfers — the relay backend charges ~35-40 ms per
    dispatch)."""
    if key in _WINNERS:
        return _WINNERS[key]
    persisted = _load_persisted(key)
    if persisted is not None:
        _WINNERS[key] = persisted
    return persisted


def _save_persisted(key, winner: str) -> None:
    path = _persist_path()
    if not path:
        return
    try:
        data = {}
        if os.path.exists(path):
            with open(path) as f:
                data = json.load(f)
        data[_key_str(key)] = winner
        with open(path, "w") as f:
            json.dump(data, f, indent=0, sort_keys=True)
            f.write("\n")  # keep the checked-in cache diff-friendly
    except (OSError, ValueError):  # cache is best-effort
        pass


def _conv_macs_per_iter(V_shape, H_shape) -> float:
    """Rough conv-formulation MACs for ONE MU iteration (the 4 heavy
    contractions of the W+H update pair share this count)."""
    N, C = int(V_shape[0]), int(V_shape[1])
    R = int(H_shape[1])
    Lp = 1
    for s in V_shape[2:]:
        Lp *= int(s)
    K = 1
    for v, h in zip(V_shape[2:], H_shape[2:]):
        K *= int(v) - int(h) + 1
    return 4.0 * N * Lp * K * R * C


def _candidates(beta: float, spatial_ndim: int):
    """(name, factory_or_None) candidates for this config.  ``None`` is
    the generic conv/VJP engine (what ``get_dense_fit`` uses when no
    updater factory is supplied).

    The FFT β=2 engine joins the candidate set only under
    ``PNT_NMFD_FFT=auto``: its f32 FFT rounding is outside the default
    bit-level parity posture (fft_nmfd.py), so default fits must never
    silently adopt it even where it would win the timing — the conv,
    unfold, and pallas candidates are numerically interchangeable (same
    contractions, different summation order), FFT is not.

    The fused Pallas engine (``ops/pallas_deconv``; 1-D direct, 2-D/3-D
    via the flat-offset mode) is a regular candidate wherever Mosaic
    kernels can run (``PNT_NMFD_PALLAS=0`` removes it); its shape gate
    raises inside the timing loop for unsupported configs, which the
    per-candidate try/except absorbs."""
    from .fast_nmfd import (
        _FACTORIES,
        _PALLAS_FACTORIES,
        _PALLAS_INTERPRET_FACTORIES,
        _PALLAS_W_FACTORIES,
        _PALLAS_W_INTERPRET_FACTORIES,
        nmfd_fft_updater_factory,
    )
    from .pallas_mu import _interpret_mode, pallas_supported

    cands = [("unfold", _FACTORIES[spatial_ndim]), ("conv", None)]
    if (
        pallas_supported()
        and os.environ.get("PNT_NMFD_PALLAS", "") != "0"
    ):
        interp = _interpret_mode()
        cands.append((
            "pallas",
            (_PALLAS_INTERPRET_FACTORIES if interp
             else _PALLAS_FACTORIES)[spatial_ndim],
        ))
        # hybrid fused-W/streamed-H: a regular candidate at every
        # spatial rank wherever its own VMEM gate admits it — full-vs-
        # hybrid dominance is rank-dependent (full wins at the r88
        # flagship, hybrid wins 1.37× at r8 — tools/measure_1d_modes.py)
        # so the timing loop decides, never a static exclusion
        # (fast_nmfd._deconv_pallas_updater_factory::_dims)
        cands.append((
            "pallas_w",
            (_PALLAS_W_INTERPRET_FACTORIES if interp
             else _PALLAS_W_FACTORIES)[spatial_ndim],
        ))
    if (
        spatial_ndim == 1
        and beta == 2
        and os.environ.get("PNT_NMFD_FFT", "") == "auto"
    ):
        cands.append(("fft", nmfd_fft_updater_factory))
    if (
        spatial_ndim == 1
        and beta == 2
        and os.environ.get("PNT_NMFD_AUTOCORR", "") != "0"
    ):
        # autocorrelation W denominator (fast_nmfd._h_autocorr_gram):
        # a re-association of the unfold contractions — f32 summation
        # order only, same interchangeability class as conv vs unfold —
        # so a regular candidate (PNT_NMFD_AUTOCORR=0 removes, =1 forces
        # via resolve_deconv_factory); its unrolled-regime gate raises
        # for unsupported shapes like the pallas candidates' gates do
        from .fast_nmfd import nmfd_autocorr_updater_factory

        cands.append(("autocorr", nmfd_autocorr_updater_factory))
    return cands


def _factory_by_name(name: str, beta: float, spatial_ndim: int):
    for n, f in _candidates(beta, spatial_ndim):
        if n == name:
            return f
    return None


def _timing_loop(updaters, recon2, beta, gamma):
    """Jitted ``run(V, W, H, n) -> scalar`` executing ``n`` full MU
    iterations (W then H, like the solver) with a TRACED count — one
    compile serves every loop length."""
    from .solver import _default_updaters, _normalize_updaters

    if updaters is None:
        updaters = _default_updaters(recon2, beta, gamma, 0.0, 0.0)
    upd_W, upd_H, _, prepare, _ = _normalize_updaters(updaters)

    def run(V, W, H, n):
        state0 = (W, H) if prepare is None else prepare(V, W, H)

        def body(i, s):
            w, h = s
            return upd_W(V, w, h), upd_H(V, w, h)

        w, h = lax.fori_loop(0, n, body, state0)
        return h.ravel()[0]  # scalar sync; fetching h waits for the loop

    return jax.jit(run)


def _time_candidate(run, V, W, H, reps: int = 2, reject_above=None) -> float:
    """Marginal seconds/iteration via the two-length difference quotient
    (fixed dispatch latency cancels; CLAUDE.md TPU-timing discipline).

    ``reject_above``: when the PILOT estimate already exceeds this (a
    multiple of the best candidate so far), skip the full two-length
    measurement — the pilot's ±dispatch-latency error cannot flip a
    multiple-times-slower loser into a winner."""

    def timed(n, k=reps):
        best = float("inf")
        for _ in range(k):
            t0 = time.perf_counter()
            float(run(V, W, H, jnp.int32(n)))
            best = min(best, time.perf_counter() - t0)
        return best

    # compile + first-execution warmup (the relay's first run is slow)
    timed(2, k=2)
    pilot = timed(16, k=1)
    per = max((pilot - 0.04) / 16, 1e-5)
    if reject_above is not None and per > reject_above:
        return per
    n_long = int(min(max(0.3 / per, 24), 20000))
    n_short = max(n_long // 4, 4)
    t_short = timed(n_short)
    t_long = timed(n_long)
    d = t_long - t_short
    if d <= 0:  # contaminated measurement; bias-high fallback
        return t_long / n_long
    return d / (n_long - n_short)


def autotune_winner(V, W, H, beta: float, spatial_ndim: int, recon2) -> str:
    """Time every applicable engine for this (shape, β) on the actual
    device and return the winner's name, caching it (process-local, plus
    the opt-in persistent JSON cache)."""
    from .mu import gamma_from_beta

    key = (
        jax.devices()[0].platform,
        spatial_ndim,
        float(beta),
        tuple(int(s) for s in V.shape),
        tuple(int(s) for s in H.shape),
    )
    hit = _cached(key)
    if hit is not None:
        return hit

    gamma = gamma_from_beta(beta)
    results = {}
    for name, factory in _candidates(beta, spatial_ndim):
        try:
            updaters = (
                factory(beta, gamma, 0.0, 0.0) if factory is not None else None
            )
            run = _timing_loop(updaters, recon2, beta, gamma)
            best = min(results.values()) if results else None
            results[name] = _time_candidate(
                run, V, W, H,
                reject_above=(3.0 * best if best is not None else None),
            )
        except Exception:  # candidate failed to compile/run: never fatal
            continue
    if not results:
        winner = "unfold"  # static-heuristic default
    else:
        winner = min(results, key=results.get)
    _WINNERS[key] = winner
    _save_persisted(key, winner)
    return winner


def _plca_timing_loop(recon3):
    """Jitted ``run(V, W, H, Z, n) -> scalar``: ``n`` full EM iterations
    through the given reconstruction (the E-step VJP dominates)."""
    from .solver import _plca_em_iter

    def run(V, W, H, Z, n):
        norm = jnp.sum(V)
        Vn = V / norm

        def body(i, s):
            return _plca_em_iter(
                recon3, True, True, True, False, False, False,
                Vn, s, 1.0, 1.0, 1.0,
            )

        w, h, z = lax.fori_loop(0, n, body, (W, H, Z))
        return h.ravel()[0]

    return jax.jit(run)


def autotune_plca_recon3(V, W, H, Z, conv_recon3, unfold_recon3,
                         pallas_recon3=None) -> str:
    """Winner ('conv' | 'unfold' | 'pallas') for the shift-invariant PLCA
    EM reconstruction — the E-step differentiates through it, so it has
    the same engine-inversion surface as the deconv MU engine.  The
    ``pallas`` candidate (custom-vjp recon with fused Mosaic adjoints,
    1-D only) joins when the caller supplies it."""
    key = (
        jax.devices()[0].platform,
        "plca-em",
        0.0,
        tuple(int(s) for s in V.shape),
        tuple(int(s) for s in H.shape),
    )
    hit = _cached(key)
    if hit is not None:
        return hit

    cands = [("conv", conv_recon3), ("unfold", unfold_recon3)]
    if pallas_recon3 is not None:
        cands.append(("pallas", pallas_recon3))
    results = {}
    for name, recon3 in cands:
        try:
            run = _plca_timing_loop(recon3)
            best = min(results.values()) if results else None

            def wrapped(V_, W_, H_, n, _r=run, _Z=Z):
                return _r(V_, W_, H_, _Z, n)

            results[name] = _time_candidate(
                wrapped, V, W, H,
                reject_above=(3.0 * best if best is not None else None),
            )
        except Exception:
            continue
    winner = min(results, key=results.get) if results else "unfold"
    _WINNERS[key] = winner
    _save_persisted(key, winner)
    return winner


def _plca_pallas_recon3(cls, V, H):
    """The SIPLCA family's fused-adjoint EM reconstruction candidate, or
    ``None`` where it cannot apply (unsupported shapes/backends, kill
    switch).  1-D runs the kernels directly; 2-D/3-D ride the
    flat-offset mode; where the full mode's hgrad accumulator is
    VMEM-gated out, the hybrid fused-W/streamed-H recon
    (``_fit_reconstruct_pallas_w``) stands in."""
    from .pallas_deconv import (
        deconv_pallas_nd_supported,
        deconv_pallas_supported,
        deconv_pallas_w_supported,
    )

    recon3 = getattr(cls, "_fit_reconstruct_pallas", None)
    if recon3 is None:
        return None
    if os.environ.get("PNT_NMFD_PALLAS", "") == "0":
        return None
    ok = (
        deconv_pallas_supported(V.shape, H.shape, V.dtype)
        if len(V.shape) == 3
        else deconv_pallas_nd_supported(V.shape, H.shape, V.dtype)
    )
    if ok:
        return recon3
    hybrid = getattr(cls, "_fit_reconstruct_pallas_w", None)
    if hybrid is not None and deconv_pallas_w_supported(
        V.shape, H.shape, V.dtype
    ):
        return hybrid
    return None


def autotune_halo_mode(
    n_batch: int, C: int, lead_shapes, chunk: int, kernel, R: int,
    beta: float, heuristic_mode: str, allow_pallas: bool = True,
) -> str:
    """Measured per-shard mode for the halo-exchange deconv solvers.

    The halo solvers' per-device work is an ordinary MU iteration through
    either the conv or the patch-GEMM reconstruction on the LOCAL (chunk +
    halo) shapes — the collectives are identical across modes — so a
    single-device timing of exactly that iteration is a faithful proxy,
    and timing inside ``shard_map`` is never needed.  The
    ``"unrolled"``-vs-``"conv"`` decision is tuned directly (``"stream"``
    exists only where unrolled is impossible); the fused-kernel
    ``"pallas"`` mode (every rank, batched included) — or, where the
    halo layout's hgrad accumulator is VMEM-gated out, the hybrid
    ``"pallas_w"`` mode (fused wgrad + streamed XLA fold) — is adopted
    when ``pallas_deconv.halo_pallas_mode`` admits it for the ACTUAL
    per-shard flat layout AND the single-device engine autotune picks a
    Mosaic candidate for the equivalent local-shape problem
    (:func:`autotune_winner` — same update pair, same kernels,
    VALID-vs-full cost delta is the T-1 halo frames).  Below the FLOP
    threshold or with autotune disabled the memory-based heuristic
    stands."""
    mode = os.environ.get("PNT_NMFD_AUTOTUNE", "")
    if mode == "0":
        return heuristic_mode
    kernel = tuple(int(k) for k in kernel)
    lead_shapes = tuple(int(s) for s in lead_shapes)

    nd_k = len(kernel)
    if allow_pallas and nd_k in (1, 2, 3) \
            and os.environ.get("PNT_NMFD_PALLAS", "") != "0":
        from . import pallas_deconv

        # which fused per-shard mode the halo solvers' ACTUAL flat
        # layout admits — the layout differs from the single-device one
        # (leading axes padded to output widths, per-segment halo leads),
        # so the single-device gates must never stand in for this
        # (pallas_deconv.halo_pallas_mode owns the layout invariants,
        # including the batched N-D lead_mid >= kx-1 separator rule)
        admissible = pallas_deconv.halo_pallas_mode(
            n_batch, C, lead_shapes, chunk, kernel, R
        )
        if admissible is not None:
            if os.environ.get("PNT_NMFD_PALLAS", "") == "1":
                return admissible
            lead_out = tuple(
                s + k - 1 for s, k in zip(lead_shapes, kernel[:-1])
            )
            v_proxy = (n_batch, C) + lead_out + (chunk + kernel[-1] - 1,)
            h_proxy = (n_batch, R) + lead_shapes + (chunk,)
            min_flops = float(
                os.environ.get("PNT_AUTOTUNE_MIN_FLOPS", _MIN_FLOPS_DEFAULT)
            )
            if mode == "1" or \
                    _conv_macs_per_iter(v_proxy, h_proxy) >= min_flops:
                # single-device timing of the equivalent local problem
                # (same update pair, same kernels; the VALID-vs-full cost
                # delta is the halo frames).  Cache first: a hit must not
                # build or transfer the proxy arrays.
                key = (
                    jax.devices()[0].platform, nd_k, float(beta),
                    v_proxy, h_proxy,
                )
                winner = _cached(key)
                if winner is None:
                    import numpy as np

                    from . import recon as _recon

                    recon_nd = {
                        1: _recon.deconv1d, 2: _recon.deconv2d,
                        3: _recon.deconv3d,
                    }[nd_k]
                    rng = np.random.RandomState(0)
                    Vp = jnp.asarray(rng.rand(*v_proxy).astype("f") + 0.01)
                    Wp = jnp.asarray(
                        rng.rand(*((C, R) + kernel)).astype("f") + 0.1
                    )
                    Hpp = jnp.asarray(rng.rand(*h_proxy).astype("f") + 0.1)
                    winner = autotune_winner(
                        Vp, Wp, Hpp, beta, nd_k, recon_nd
                    )
                # a Mosaic win on the proxy adopts the halo-admissible
                # fused mode (the proxy's full-vs-hybrid split follows
                # the single-device gates, which can differ from the
                # halo layout's — the W-side kernel, shared by both
                # modes, carries the bulk of the measured win)
                if winner in ("pallas", "pallas_w"):
                    return admissible

    if heuristic_mode != "unrolled":
        return heuristic_mode
    lead_out = tuple(s + k - 1 for s, k in zip(lead_shapes, kernel[:-1]))
    T = kernel[-1]
    v_local = (n_batch, C) + lead_out + (chunk,)
    h_local = (n_batch, R) + lead_shapes + (chunk - T + 1,)
    if mode != "1":
        min_flops = float(
            os.environ.get("PNT_AUTOTUNE_MIN_FLOPS", _MIN_FLOPS_DEFAULT)
        )
        if _conv_macs_per_iter(v_local, h_local) < min_flops:
            return heuristic_mode

    nd = len(kernel)
    key = (
        jax.devices()[0].platform,
        f"halo{nd}",
        float(beta),
        v_local,
        (R,) + kernel,
    )
    hit = _cached(key)
    if hit is not None:
        return hit

    import numpy as np

    from .mu import gamma_from_beta, mu_update

    gamma = gamma_from_beta(beta)
    # local halo'd activation: VALID trailing axis carrying T-1 extra
    # frames (what left_halo supplies inside the solver)
    rng = np.random.RandomState(0)
    Vl = jnp.asarray(rng.rand(*v_local).astype("f") + 0.01)
    Hh = jnp.asarray(
        rng.rand(*((n_batch, R) + lead_shapes + (chunk + T - 1,)))
        .astype("f") + 0.1
    )
    Wl = jnp.asarray(
        rng.rand(*((C, R) + kernel)).astype("f") + 0.1
    )

    def _recons():
        from ..parallel.halo import (
            _conv_halo_nd,
            _conv_halo_split_nd,
            _unfold_halo_nd,
            halo_conv_split_default,
        )

        halo = T - 1
        if halo_conv_split_default() and halo > 0:
            # the solver's conv mode is the split formulation: main conv
            # at native shard width + strip GEMM on the halo frames (the
            # tail stands in for the ppermute'd recv — collectives are
            # identical across modes, so timing them is never needed)
            conv_pair = (
                lambda hp, w: _conv_halo_split_nd(
                    hp, hp[..., -halo:], w, nd
                ),
                Hh[..., :chunk],
            )
        else:
            conv_pair = (lambda hh, w: _conv_halo_nd(hh, w, nd), Hh)
        return {
            "conv": conv_pair,
            "unrolled": (lambda hh, w: _unfold_halo_nd(hh, w, nd), Hh),
        }

    results = {}
    for name, (recon, H_init) in _recons().items():
        try:
            def run(V_, W_, H_, n, _recon=recon):
                def body(i, s):
                    w, hh = s
                    w = mu_update(
                        lambda ww: _recon(hh, ww), V_, w, beta, gamma
                    )
                    hh = mu_update(
                        lambda h2: _recon(h2, w), V_, hh, beta, gamma
                    )
                    return w, hh

                w, hh = lax.fori_loop(0, n, body, (W_, H_))
                return hh.ravel()[0]

            best = min(results.values()) if results else None
            results[name] = _time_candidate(
                jax.jit(run), Vl, Wl, H_init,
                reject_above=(3.0 * best if best is not None else None),
            )
        except Exception:
            continue
    winner = min(results, key=results.get) if results else heuristic_mode
    winner = "unrolled" if winner == "unrolled" else "conv"
    _WINNERS[key] = winner
    _save_persisted(key, winner)
    return winner


def resolve_plca_recon3(cls, V, W, H, Z):
    """Per-fit EM reconstruction selection for the SIPLCA family: env
    forces → FLOP threshold (static heuristic) → measured winner."""
    conv = cls.reconstruct
    unfold = cls._fit_reconstruct
    if unfold is None or os.environ.get("PNT_NMFD_UNFOLD", "") == "0":
        return conv
    pallas = _plca_pallas_recon3(cls, V, H)
    if pallas is not None and os.environ.get("PNT_NMFD_PALLAS", "") == "1":
        return pallas
    mode = os.environ.get("PNT_NMFD_AUTOTUNE", "")
    if mode == "0":
        return cls._resolve_fit_recon3()
    if mode != "1":
        min_flops = float(
            os.environ.get("PNT_AUTOTUNE_MIN_FLOPS", _MIN_FLOPS_DEFAULT)
        )
        if _conv_macs_per_iter(V.shape, H.shape) < min_flops:
            return cls._resolve_fit_recon3()
    winner = autotune_plca_recon3(V, W, H, Z, conv, unfold, pallas)
    if winner == "pallas" and pallas is not None:
        return pallas
    return conv if winner == "conv" else unfold


def _hoyer_timing_loop(recon2, beta):
    """Jitted ``run(V, W, H, n) -> scalar``: ``n`` projected-gradient
    steps — one ``jax.grad`` through the reconstruction per factor, the
    Hoyer solver's dominant cost (the backtracking line search re-evaluates
    the loss, not the gradient, so the grad pass is the faithful proxy)."""
    from ..constants import eps
    from ..metrics import beta_div

    def run(V, W, H, n):
        def body(i, s):
            w, h = s
            gW = jax.grad(lambda w_: beta_div(recon2(h, w_), V, beta))(w)
            w = jnp.maximum(w - 1e-3 * gW, eps)
            gH = jax.grad(lambda h_: beta_div(recon2(h_, w), V, beta))(h)
            h = jnp.maximum(h - 1e-3 * gH, eps)
            return w, h

        w, h = lax.fori_loop(0, n, body, (W, H))
        return h.ravel()[0]

    return jax.jit(run)


def autotune_hoyer_recon2(V, W, H, beta, conv_recon2, unfold_recon2,
                          pallas_recon2=None) -> str:
    """Winner ('conv' | 'unfold' | 'pallas') for the reconstruction the
    dense-target Hoyer solver differentiates through (reference
    nmf.py:510-543) — the projected-gradient steps have the same
    engine-inversion surface as the deconv MU engine and the SIPLCA EM
    recon (the adjoints ARE the patch-GEMM contractions)."""
    key = (
        jax.devices()[0].platform,
        "hoyer-recon2",
        float(beta),
        tuple(int(s) for s in V.shape),
        tuple(int(s) for s in H.shape),
    )
    hit = _cached(key)
    if hit is not None:
        return hit

    cands = [("conv", conv_recon2), ("unfold", unfold_recon2)]
    if pallas_recon2 is not None:
        cands.append(("pallas", pallas_recon2))
    results = {}
    for name, recon2 in cands:
        try:
            run = _hoyer_timing_loop(recon2, beta)
            best = min(results.values()) if results else None
            results[name] = _time_candidate(
                run, V, W, H,
                reject_above=(3.0 * best if best is not None else None),
            )
        except Exception:
            continue
    winner = min(results, key=results.get) if results else "unfold"
    _WINNERS[key] = winner
    _save_persisted(key, winner)
    return winner


def _deconv_pallas_recon2(V_shape, H_shape, dtype):
    """The deconvolutional family's fused-adjoint reconstruction
    candidate for gradient-based solvers (``dH``/``dW`` run the Mosaic
    kernels via the custom-vjp recon), or ``None`` where it cannot apply
    (unsupported shape/backend, kill switch).  1-D runs the kernels
    directly; 2-D/3-D ride the flat-offset mode; VMEM-gated shapes fall
    to the hybrid fused-W/streamed-H recon."""
    from .pallas_deconv import (
        deconv_pallas_nd_supported,
        deconv_pallas_supported,
        deconv_pallas_w_supported,
    )
    from .pallas_mu import pallas_supported

    if not pallas_supported() or os.environ.get("PNT_NMFD_PALLAS", "") == "0":
        return None
    ok = (
        deconv_pallas_supported(V_shape, H_shape, dtype)
        if len(V_shape) == 3
        else deconv_pallas_nd_supported(V_shape, H_shape, dtype)
    )
    if ok:
        from .fast_nmfd import resolve_pallas_unfold_deconv

        return resolve_pallas_unfold_deconv()
    if deconv_pallas_w_supported(V_shape, H_shape, dtype):
        from .fast_nmfd import resolve_pallas_w_unfold_deconv

        return resolve_pallas_w_unfold_deconv()
    return None


def resolve_hoyer_recon2(cls, V, W, H, beta):
    """Per-fit reconstruction selection for dense-target Hoyer fits on
    the deconvolutional family (``sparse_fit`` / ``nmf_hoyer_fit``):
    env forces → FLOP threshold (static hook) → measured winner,
    mirroring :func:`resolve_plca_recon3`."""
    static = cls._fit_recon2()
    conv = cls.reconstruct
    if static is conv:  # kill switch / non-deconv model: nothing to tune
        return static
    if V.dtype == jnp.float64:  # x64 keeps the generic conv formulation
        return conv
    pallas = _deconv_pallas_recon2(V.shape, H.shape, V.dtype)
    if pallas is not None and os.environ.get("PNT_NMFD_PALLAS", "") == "1":
        return pallas
    mode = os.environ.get("PNT_NMFD_AUTOTUNE", "")
    if mode == "0":
        return static
    if mode != "1":
        min_flops = float(
            os.environ.get("PNT_AUTOTUNE_MIN_FLOPS", _MIN_FLOPS_DEFAULT)
        )
        if _conv_macs_per_iter(V.shape, H.shape) < min_flops:
            return static
    winner = autotune_hoyer_recon2(V, W, H, beta, conv, static, pallas)
    if winner == "pallas" and pallas is not None:
        return pallas
    return conv if winner == "conv" else static


def resolve_deconv_factory(V, W, H, beta: float, spatial_ndim: int, recon2):
    """Per-fit engine selection for the deconvolutional family.

    Explicit env forces first (identical semantics to the static
    resolver), then the FLOP threshold, then the measured winner."""
    from .fast_nmfd import (
        _FACTORIES,
        nmfd_fft_updater_factory,
        resolve_nmfd_updater_factory,
    )

    if os.environ.get("PNT_NMFD_UNFOLD", "") == "0":
        return None
    if spatial_ndim == 1 and os.environ.get("PNT_NMFD_FFT", "") == "1":
        return nmfd_fft_updater_factory
    if (
        spatial_ndim == 1
        and beta == 2
        and os.environ.get("PNT_NMFD_AUTOCORR", "") == "1"
    ):
        from .fast_nmfd import nmfd_autocorr_updater_factory

        return nmfd_autocorr_updater_factory
    if os.environ.get("PNT_NMFD_PALLAS", "") == "1":
        # explicit force (testing / known-good shapes); the autotuned
        # path offers the same engine as a measured candidate
        from .fast_nmfd import (
            _PALLAS_FACTORIES,
            _PALLAS_INTERPRET_FACTORIES,
        )
        from .pallas_mu import _interpret_mode, pallas_supported

        if pallas_supported():
            return (
                _PALLAS_INTERPRET_FACTORIES if _interpret_mode()
                else _PALLAS_FACTORIES
            )[spatial_ndim]
    if V.dtype == jnp.float64:  # x64 fits keep the generic conv engine
        return None

    mode = os.environ.get("PNT_NMFD_AUTOTUNE", "")
    if mode == "0":
        return resolve_nmfd_updater_factory(False, spatial_ndim)
    if mode != "1":
        min_flops = float(
            os.environ.get("PNT_AUTOTUNE_MIN_FLOPS", _MIN_FLOPS_DEFAULT)
        )
        if _conv_macs_per_iter(V.shape, H.shape) < min_flops:
            return resolve_nmfd_updater_factory(False, spatial_ndim)

    winner = autotune_winner(V, W, H, beta, spatial_ndim, recon2)
    return _factory_by_name(winner, beta, spatial_ndim)
