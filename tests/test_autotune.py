"""Per-shape runtime autotune for the deconv engine (ops/autotune.py).

Forces the autotuner on small CPU shapes via PNT_NMFD_AUTOTUNE=1 and
checks: a winner is measured and cached, fits through the model API match
the reference-parity trajectory regardless of which engine wins, and the
env kill switches still take precedence.
"""

import numpy as np
import pytest

import pytorch_nmf_tpu as pnt
from pytorch_nmf_tpu.nmf import NMFD
from pytorch_nmf_tpu.ops import autotune

RNG = np.random.RandomState(5)
pnt.manual_seed(5)


@pytest.fixture(autouse=True)
def _fresh_cache():
    autotune.clear_cache()
    yield
    autotune.clear_cache()


def _problem(beta=1.0):
    V = RNG.rand(1, 12, 40).astype("f")
    W0 = RNG.rand(12, 4, 6).astype("f") + 0.1
    H0 = RNG.rand(1, 4, 35).astype("f") + 0.1
    return V, W0, H0


def test_autotune_measures_and_caches(monkeypatch):
    monkeypatch.setenv("PNT_NMFD_AUTOTUNE", "1")
    V, W0, H0 = _problem()
    m = NMFD(W=W0, H=H0)
    m.fit(V, beta=1, tol=-np.inf, max_iter=5)
    assert len(autotune._WINNERS) == 1
    (key, winner), = autotune._WINNERS.items()
    assert winner in ("unfold", "conv")
    assert key[1] == 1 and key[2] == 1.0  # spatial_ndim, beta

    # second fit at the same (shape, beta): cache hit, no re-timing
    calls = []
    monkeypatch.setattr(
        autotune, "_time_candidate",
        lambda *a, **k: calls.append(1) or 1.0,
    )
    m2 = NMFD(W=W0, H=H0)
    m2.fit(V, beta=1, tol=-np.inf, max_iter=5)
    assert not calls


@pytest.mark.slow
def test_autotune_fft_candidate_at_beta2(monkeypatch):
    monkeypatch.setenv("PNT_NMFD_AUTOTUNE", "1")
    V, W0, H0 = _problem()
    import jax.numpy as jnp

    winner = autotune.autotune_winner(
        jnp.asarray(V), jnp.asarray(W0), jnp.asarray(H0), 2.0, 1,
        NMFD.reconstruct,
    )
    assert winner in ("unfold", "conv", "fft")


@pytest.mark.parametrize("forced_winner", ["unfold", "conv", "fft", "autocorr"])
def test_fit_matches_parity_for_any_winner(monkeypatch, forced_winner):
    """Whatever engine the autotuner picks, the model-API trajectory stays
    within the f32-rounding parity envelope of the default path."""
    monkeypatch.setenv("PNT_NMFD_AUTOTUNE", "1")
    V, W0, H0 = _problem()

    ref = NMFD(W=W0, H=H0)
    monkeypatch.setenv("PNT_NMFD_AUTOTUNE", "0")
    ref.fit(V, beta=2, tol=-np.inf, max_iter=5)

    monkeypatch.setenv("PNT_NMFD_AUTOTUNE", "1")
    monkeypatch.setattr(
        autotune, "autotune_winner", lambda *a, **k: forced_winner
    )
    m = NMFD(W=W0, H=H0)
    m.fit(V, beta=2, tol=-np.inf, max_iter=5)

    assert float(np.abs(np.asarray(m.W.data) - np.asarray(ref.W.data)).max()) < 5e-5
    assert float(np.abs(np.asarray(m.H.data) - np.asarray(ref.H.data)).max()) < 5e-5


def test_env_kill_switches_beat_autotune(monkeypatch):
    monkeypatch.setenv("PNT_NMFD_AUTOTUNE", "1")
    monkeypatch.setenv("PNT_NMFD_UNFOLD", "0")
    V, W0, H0 = _problem()
    import jax.numpy as jnp

    out = autotune.resolve_deconv_factory(
        jnp.asarray(V), jnp.asarray(W0), jnp.asarray(H0), 1.0, 1,
        NMFD.reconstruct,
    )
    assert out is None  # conv engine, no timing ran
    assert not autotune._WINNERS


def test_threshold_skips_small_problems(monkeypatch):
    monkeypatch.delenv("PNT_NMFD_AUTOTUNE", raising=False)
    V, W0, H0 = _problem()
    m = NMFD(W=W0, H=H0)
    m.fit(V, beta=1, tol=-np.inf, max_iter=3)
    assert not autotune._WINNERS  # below PNT_AUTOTUNE_MIN_FLOPS


def test_persistent_cache_roundtrip(monkeypatch, tmp_path):
    cache = tmp_path / "autotune.json"
    monkeypatch.setenv("PNT_AUTOTUNE_CACHE", str(cache))
    monkeypatch.setenv("PNT_NMFD_AUTOTUNE", "1")
    V, W0, H0 = _problem()
    m = NMFD(W=W0, H=H0)
    m.fit(V, beta=1, tol=-np.inf, max_iter=3)
    assert cache.exists()
    saved = cache.read_text()
    assert "unfold" in saved or "conv" in saved

    # a fresh process-level cache reloads the winner without timing
    autotune.clear_cache()
    monkeypatch.setattr(
        autotune, "_time_candidate",
        lambda *a, **k: pytest.fail("timed despite persisted winner"),
    )
    m2 = NMFD(W=W0, H=H0)
    m2.fit(V, beta=1, tol=-np.inf, max_iter=3)


def test_plca_em_autotune(monkeypatch):
    """SIPLCA EM consults the autotuner for its E-step reconstruction;
    either winner reproduces the static-path trajectory to f32 rounding."""
    from pytorch_nmf_tpu.plca import SIPLCA

    V = RNG.rand(1, 10, 36).astype("f")
    W0 = RNG.rand(10, 3, 5).astype("f") + 0.1
    H0 = RNG.rand(1, 3, 32).astype("f") + 0.1
    Z0 = np.full((3,), 1 / 3, "f")

    monkeypatch.setenv("PNT_NMFD_AUTOTUNE", "0")
    ref = SIPLCA(W=W0, H=H0, Z=Z0)
    ref.fit(V, tol=-np.inf, max_iter=8)

    monkeypatch.setenv("PNT_NMFD_AUTOTUNE", "1")
    m = SIPLCA(W=W0, H=H0, Z=Z0)
    m.fit(V, tol=-np.inf, max_iter=8)
    assert any(k[1] == "plca-em" for k in autotune._WINNERS)
    assert float(np.abs(np.asarray(m.W.data) - np.asarray(ref.W.data)).max()) < 5e-6
    assert float(np.abs(np.asarray(m.H.data) - np.asarray(ref.H.data)).max()) < 5e-6


def test_hoyer_recon2_autotune(monkeypatch):
    """Dense-target Hoyer fits on the deconv family consult the recon
    autotuner (the projected-gradient steps differentiate through the
    reconstruction, same inversion surface as the MU engine); either
    winner reproduces the static-path trajectory."""
    V = RNG.rand(1, 10, 36).astype("f")
    W0 = RNG.rand(10, 3, 5).astype("f") + 0.1
    H0 = RNG.rand(1, 3, 32).astype("f") + 0.1

    monkeypatch.setenv("PNT_NMFD_AUTOTUNE", "0")
    ref = NMFD(W=W0, H=H0)
    ref.sparse_fit(V, beta=2, max_iter=6, sH=0.4)

    monkeypatch.setenv("PNT_NMFD_AUTOTUNE", "1")
    m = NMFD(W=W0, H=H0)
    m.sparse_fit(V, beta=2, max_iter=6, sH=0.4)
    assert any(k[1] == "hoyer-recon2" for k in autotune._WINNERS)
    assert float(np.abs(np.asarray(m.W.data)
                        - np.asarray(ref.W.data)).max()) < 5e-5
    assert float(np.abs(np.asarray(m.H.data)
                        - np.asarray(ref.H.data)).max()) < 5e-5


def test_halo_mode_autotune(monkeypatch):
    """The halo solvers consult a single-device proxy autotune for their
    per-shard conv-vs-unrolled decision; either winner matches the
    single-device trajectory (the mode changes only the formulation)."""
    import jax

    if jax.device_count() < 4:
        pytest.skip("needs a multi-device mesh")
    from pytorch_nmf_tpu.parallel import make_mesh
    from pytorch_nmf_tpu.parallel.halo import sharded_nmfd_fit

    V = RNG.rand(1, 10, 32).astype("f")
    W0 = RNG.rand(10, 3, 5).astype("f") + 0.1
    H0 = RNG.rand(1, 3, 28).astype("f") + 0.1
    mesh = make_mesh({"seq": 4}, jax.devices()[:4])

    monkeypatch.setenv("PNT_NMFD_AUTOTUNE", "0")
    Wr, Hr, _ = sharded_nmfd_fit(V, W0, H0, mesh, beta=1, tol=0, max_iter=6)

    monkeypatch.setenv("PNT_NMFD_AUTOTUNE", "1")
    autotune.clear_cache()
    Wa, Ha, _ = sharded_nmfd_fit(V, W0, H0, mesh, beta=1, tol=0, max_iter=6)
    assert any(str(k[1]).startswith("halo") for k in autotune._WINNERS)
    assert float(np.abs(np.asarray(Wa) - np.asarray(Wr)).max()) < 5e-6
    assert float(np.abs(np.asarray(Ha) - np.asarray(Hr)).max()) < 5e-6


def test_mu_update_runs_without_analytic_kl_pos():
    """mu_update at β=1 with no pos_precomputed must fall back to the
    vjp(ones) positive term instead of crashing on a None cotangent —
    regression: the halo solvers' conv-vs-unrolled timing loop calls it
    exactly this way, and the crash was silently swallowed by the
    per-candidate try/except, so the β=1 measurement never ran."""
    import jax.numpy as jnp
    import numpy as np

    from pytorch_nmf_tpu.ops.mu import gamma_from_beta, kl_pos_W, mu_update

    rng = np.random.RandomState(3)
    V = jnp.asarray(rng.rand(12, 10).astype("f") + 0.01)
    W = jnp.asarray(rng.rand(12, 4).astype("f") + 0.1)
    H = jnp.asarray(rng.rand(10, 4).astype("f") + 0.1)

    def recon(w):
        return w @ H.T

    out = mu_update(recon, V, W, 1.0, gamma_from_beta(1.0))
    assert bool(jnp.all(jnp.isfinite(out))) and bool(jnp.all(out >= 0))
    # vjp(ones) equals the analytic KL denominator for a linear recon
    # (up to the relu/eps clamp the non-analytic path applies)
    ref = mu_update(recon, V, W, 1.0, gamma_from_beta(1.0),
                    pos_precomputed=kl_pos_W(H[None].swapaxes(1, 2))
                    .reshape(1, -1))
    assert float(jnp.abs(out - ref).max() / jnp.abs(ref).max()) < 1e-4


def test_atomic_cache_puts(tmp_path):
    """The atomic-write patch for JAX's persistent compile cache:
    upstream ``lru_cache.LRUCache.put`` is a plain ``write_bytes``, so a
    process killed mid-write leaves a truncated entry that segfaults a
    later ``get_executable_and_time`` (observed on this host; conftest
    installs the patch for the whole suite).  The patched ``put`` must
    land the full entry via tmp + ``os.replace``, leave no tmp files,
    stay idempotent, and never double-install."""
    from jax._src import lru_cache as _lru

    from pytorch_nmf_tpu.ops.autotune import install_atomic_cache_puts

    install_atomic_cache_puts()
    assert getattr(_lru.LRUCache.put, "_pnt_atomic", False)
    before = _lru.LRUCache.put
    install_atomic_cache_puts()  # second call is a no-op, no re-wrap
    assert _lru.LRUCache.put is before

    cache = _lru.LRUCache(str(tmp_path), max_size=-1)
    assert not cache.eviction_enabled  # our caches never set a max size
    cache.put("k1", b"payload-1")
    assert cache.get("k1") == b"payload-1"
    # no temporary files survive a successful put
    assert [p.name for p in tmp_path.iterdir()] == [
        f"k1{_lru._CACHE_SUFFIX}"
    ]
    # existing entries are never rewritten (upstream contract)
    cache.put("k1", b"different")
    assert cache.get("k1") == b"payload-1"
