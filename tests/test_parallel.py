"""Multi-device semantics on a simulated 8-device CPU mesh (SURVEY.md §4):
sharded solvers must match the single-device trajectories."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import pytorch_nmf_tpu as pnt
from pytorch_nmf_tpu.nmf import NMF, NMFD
from pytorch_nmf_tpu.parallel import make_mesh, shard_target, sharded_nmf_fit

RNG = np.random.RandomState(5)
pnt.manual_seed(5)

needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _problem(M=128, K=64, R=8):
    V = RNG.rand(M, K).astype("f")
    W0 = RNG.rand(K, R).astype("f") + 0.1
    H0 = RNG.rand(M, R).astype("f") + 0.1
    return V, W0, H0


@needs_8
@pytest.mark.parametrize("beta", [0.5, 1, 2])
@pytest.mark.parametrize("model_axis", [None, "model"])
def test_sharded_nmf_fit_matches_single_device(beta, model_axis):
    V, W0, H0 = _problem()
    mesh = make_mesh({"data": 4, "model": 2})

    Wd, Hd, n_iter = sharded_nmf_fit(
        V, W0, H0, mesh, beta=beta, tol=0, max_iter=10, model_axis=model_axis
    )

    ref = NMF(W=W0, H=H0)
    ref.fit(V, beta, 0, 10)

    assert int(n_iter) == 10
    assert float(jnp.abs(Wd - ref.W.data).max()) < 2e-5
    assert float(jnp.abs(Hd - ref.H.data).max()) < 2e-5


@needs_8
def test_sharded_fit_early_stopping_matches():
    V, W0, H0 = _problem()
    mesh = make_mesh({"data": 8})
    Wd, Hd, n_iter = sharded_nmf_fit(
        V, W0, H0, mesh, beta=1, tol=1e-3, max_iter=200
    )
    ref = NMF(W=W0, H=H0)
    n_ref = ref.fit(V, 1, 1e-3, 200)
    # psum reduction order differs from the single-device sum; a borderline
    # chunk decision may flip by one loss-check period
    assert abs(int(n_iter) - n_ref) <= 10


@needs_8
def test_annotation_path_gspmd():
    """The ordinary jitted solver follows NamedSharding'd inputs (GSPMD)."""
    V, W0, H0 = _problem()
    mesh = make_mesh({"data": 8})

    Vs = shard_target(V, mesh, P("data"))
    m = NMF(W=W0, H=H0)
    m.H.data = shard_target(H0, mesh, P("data", None))
    m.W.data = shard_target(W0, mesh, P())
    m.fit(Vs, 1, 0, 10)

    ref = NMF(W=W0, H=H0)
    ref.fit(V, 1, 0, 10)
    assert float(jnp.abs(m.W.data - ref.W.data).max()) < 2e-5
    assert float(jnp.abs(m.H.data - ref.H.data).max()) < 2e-5


@needs_8
def test_annotation_path_conv_model():
    """Length-axis sharding for the deconvolutional model via GSPMD."""
    V = RNG.rand(8, 12, 40).astype("f")
    mesh = make_mesh({"data": 8})
    m = NMFD(V.shape, 4, T=5)
    W0, H0 = m.W.data, m.H.data

    Vs = shard_target(V, mesh, P("data"))
    m.H.data = shard_target(H0, mesh, P("data", None, None))
    m.fit(Vs, 1, 0, 10)

    ref = NMFD(V.shape, 4, T=5)
    ref.load_state_dict({"W": W0, "H": H0})
    ref.fit(V, 1, 0, 10)
    assert float(jnp.abs(m.W.data - ref.W.data).max()) < 2e-5
    assert float(jnp.abs(m.H.data - ref.H.data).max()) < 2e-5


@needs_8
def test_make_mesh_validation():
    with pytest.raises(ValueError):
        make_mesh({"data": 100})


@needs_8
@pytest.mark.parametrize("beta", [0.5, 1, 2])
def test_halo_sharded_nmfd_matches_single_device(beta):
    from pytorch_nmf_tpu.parallel.halo import sharded_nmfd_fit

    N, C, L_out, R, T = 2, 12, 64, 4, 5
    V = RNG.rand(N, C, L_out).astype("f")
    W0 = RNG.rand(C, R, T).astype("f") + 0.1
    H0 = RNG.rand(N, R, L_out - T + 1).astype("f") + 0.1

    mesh = make_mesh({"seq": 8})
    Wd, Hd, n_iter = sharded_nmfd_fit(
        V, W0, H0, mesh, beta=beta, tol=0, max_iter=10
    )
    ref = NMFD(W=W0, H=H0)
    ref.fit(V, beta, 0, 10)
    assert float(jnp.abs(Wd - ref.W.data).max()) < 2e-5
    assert float(jnp.abs(Hd - ref.H.data).max()) < 2e-5


@needs_8
def test_halo_sharded_nmfd_early_stop_matches():
    from pytorch_nmf_tpu.parallel.halo import sharded_nmfd_fit

    N, C, L_out, R, T = 2, 12, 64, 4, 5
    V = RNG.rand(N, C, L_out).astype("f")
    W0 = RNG.rand(C, R, T).astype("f") + 0.1
    H0 = RNG.rand(N, R, L_out - T + 1).astype("f") + 0.1
    mesh = make_mesh({"seq": 8})
    _, _, n_iter = sharded_nmfd_fit(V, W0, H0, mesh, beta=1, tol=1e-3, max_iter=200)
    ref = NMFD(W=W0, H=H0)
    assert int(n_iter) == ref.fit(V, 1, 1e-3, 200)


@needs_8
@pytest.mark.parametrize("beta", [0.5, 1])
def test_halo_auto_pads_non_divisible_length(beta):
    """Non-divisible trailing lengths are zero-padded (exactly) instead of
    raising; trajectories — including the fractional-β early-stop metric —
    must still match the single-device fit."""
    from pytorch_nmf_tpu.parallel.halo import sharded_nmfd_fit

    mesh = make_mesh({"seq": 8})
    V = RNG.rand(1, 4, 60).astype("f")  # 60 not divisible by 8
    W0 = RNG.rand(4, 2, 5).astype("f") + 0.1
    H0 = RNG.rand(1, 2, 56).astype("f") + 0.1
    Wd, Hd, n_iter = sharded_nmfd_fit(
        V, W0, H0, mesh, beta=beta, tol=1e-3, max_iter=50
    )
    ref = NMFD(W=W0, H=H0)
    n_ref = ref.fit(V, beta, 1e-3, 50)
    assert Hd.shape == H0.shape
    assert int(n_iter) == n_ref
    assert float(jnp.abs(Wd - ref.W.data).max()) < 2e-5
    assert float(jnp.abs(Hd - ref.H.data).max()) < 2e-5


@needs_8
def test_halo_auto_pads_short_chunks():
    """Chunks shorter than the halo (T-1) are padded up, not rejected."""
    from pytorch_nmf_tpu.parallel.halo import sharded_nmfd_fit

    mesh = make_mesh({"seq": 8})
    N, C, L_out, R, T = 1, 6, 40, 3, 9  # chunk 5 < halo 8
    V = RNG.rand(N, C, L_out).astype("f")
    W0 = RNG.rand(C, R, T).astype("f") + 0.1
    H0 = RNG.rand(N, R, L_out - T + 1).astype("f") + 0.1
    Wd, Hd, n_iter = sharded_nmfd_fit(V, W0, H0, mesh, beta=1, tol=0, max_iter=10)
    ref = NMFD(W=W0, H=H0)
    ref.fit(V, 1, 0, 10)
    assert float(jnp.abs(Wd - ref.W.data).max()) < 2e-5
    assert float(jnp.abs(Hd - ref.H.data).max()) < 2e-5


@needs_8
def test_annotation_path_plca():
    """PLCA EM under GSPMD sharding matches single-device."""
    from pytorch_nmf_tpu.plca import PLCA

    V = RNG.rand(80, 24).astype("f")
    W0 = RNG.rand(24, 4).astype("f") + 0.1
    H0 = RNG.rand(80, 4).astype("f") + 0.1
    Z0 = np.ones(4, "f") / 4
    mesh = make_mesh({"data": 8})

    m = PLCA(W=W0, H=H0, Z=Z0)
    Wn, Hn, Zn = m.W.data, m.H.data, m.Z.data
    m.H.data = shard_target(Hn, mesh, P("data", None))
    n1, norm1 = m.fit(shard_target(V, mesh, P("data")), 0, 20)

    ref = PLCA(W=W0, H=H0, Z=Z0)
    n2, norm2 = ref.fit(V, 0, 20)
    assert float(jnp.abs(m.W.data - ref.W.data).max()) < 2e-5
    assert float(jnp.abs(m.Z.data - ref.Z.data).max()) < 2e-5


@needs_8
def test_fit_preserves_target_sharding():
    """to_f32 must not gather a GSPMD-sharded target onto one device."""
    V, W0, H0 = _problem()
    mesh = make_mesh({"data": 8})
    Vs = shard_target(V, mesh, P("data"))
    m = NMF(W=W0, H=H0)
    m.H.data = shard_target(H0, mesh, P("data", None))
    m.fit(Vs, 2, 0, 5)
    # the result H should still live on all 8 devices
    assert len(m.H.data.sharding.device_set) == 8


@needs_8
def test_parallel_namespace_exports():
    import pytorch_nmf_tpu as pnt

    assert hasattr(pnt.parallel, "sharded_nmfd_fit")
    assert hasattr(pnt.parallel, "left_halo")


@needs_8
@pytest.mark.parametrize("alphas", [(1.0, 1.0, 1.0), (1.02, 0.99, 1.0)])
def test_sharded_plca_fit_matches_single_device(alphas):
    from pytorch_nmf_tpu.parallel import sharded_plca_fit
    from pytorch_nmf_tpu.plca import PLCA

    W_alpha, H_alpha, Z_alpha = alphas
    V = RNG.rand(80, 24).astype("f")
    W0 = RNG.rand(24, 4).astype("f") + 0.1
    H0 = RNG.rand(80, 4).astype("f") + 0.1
    Z0 = RNG.rand(4).astype("f") + 0.1

    ref = PLCA(W=W0, H=H0, Z=Z0)  # normalizes at init
    Wn, Hn, Zn = ref.W.data, ref.H.data, ref.Z.data

    mesh = make_mesh({"data": 8})
    Wd, Hd, Zd, n_iter, norm = sharded_plca_fit(
        V, Wn, Hn, Zn, mesh, tol=0, max_iter=20,
        W_alpha=W_alpha, H_alpha=H_alpha, Z_alpha=Z_alpha,
    )

    n_ref, norm_ref = ref.fit(V, 0, 20, False, W_alpha, H_alpha, Z_alpha)
    assert int(n_iter) == n_ref
    assert np.isclose(float(norm), float(norm_ref))
    assert float(jnp.abs(Wd - ref.W.data).max()) < 2e-5
    assert float(jnp.abs(Hd - ref.H.data).max()) < 2e-5
    assert float(jnp.abs(Zd - ref.Z.data).max()) < 2e-5


@needs_8
def test_sharded_plca_early_stop_matches():
    from pytorch_nmf_tpu.parallel import sharded_plca_fit
    from pytorch_nmf_tpu.plca import PLCA

    V = RNG.rand(80, 24).astype("f")
    m = PLCA(V.shape, 4)
    Wn, Hn, Zn = m.W.data, m.H.data, m.Z.data
    mesh = make_mesh({"data": 8})
    _, _, _, n_iter, _ = sharded_plca_fit(
        V, Wn, Hn, Zn, mesh, tol=1e-3, max_iter=200
    )
    n_ref, _ = m.fit(V, 1e-3, 200)
    # reduction-order float noise may flip a borderline chunk decision
    assert abs(int(n_iter) - n_ref) <= 10


@needs_8
@pytest.mark.parametrize("beta", [1, 2])
def test_halo_sharded_nmf2d_matches_single_device(beta):
    from pytorch_nmf_tpu.nmf import NMF2D
    from pytorch_nmf_tpu.parallel import sharded_nmf2d_fit

    N, C, Y, X, R, ky, kx = 1, 5, 10, 32, 3, 3, 4
    V = RNG.rand(N, C, Y, X).astype("f")
    W0 = RNG.rand(C, R, ky, kx).astype("f") + 0.1
    H0 = RNG.rand(N, R, Y - ky + 1, X - kx + 1).astype("f") + 0.1

    mesh = make_mesh({"seq": 8})
    Wd, Hd, n_iter = sharded_nmf2d_fit(
        V, W0, H0, mesh, beta=beta, tol=0, max_iter=10
    )
    ref = NMF2D(W=W0, H=H0)
    ref.fit(V, beta, 0, 10)
    assert float(jnp.abs(Wd - ref.W.data).max()) < 2e-5
    assert float(jnp.abs(Hd - ref.H.data).max()) < 2e-5


@needs_8
@pytest.mark.slow
def test_halo_sharded_nmf3d_matches_single_device():
    from pytorch_nmf_tpu.nmf import NMF3D
    from pytorch_nmf_tpu.parallel import sharded_nmf3d_fit

    N, C, Z, Y, X, R = 1, 3, 5, 6, 16, 2
    kz, ky, kx = 2, 2, 2
    V = RNG.rand(N, C, Z, Y, X).astype("f")
    W0 = RNG.rand(C, R, kz, ky, kx).astype("f") + 0.1
    H0 = RNG.rand(N, R, Z - kz + 1, Y - ky + 1, X - kx + 1).astype("f") + 0.1

    mesh = make_mesh({"seq": 8})
    Wd, Hd, n_iter = sharded_nmf3d_fit(
        V, W0, H0, mesh, beta=1, tol=0, max_iter=8
    )
    ref = NMF3D(W=W0, H=H0)
    ref.fit(V, 1, 0, 8)
    assert float(jnp.abs(Wd - ref.W.data).max()) < 2e-5
    assert float(jnp.abs(Hd - ref.H.data).max()) < 2e-5


@needs_8
def test_hybrid_mesh_fallback_and_fit():
    """make_hybrid_mesh: single-slice devices fall back to a flat
    DCN-outer/ICI-inner mesh that drives the sharded solver."""
    from pytorch_nmf_tpu.parallel.mesh import make_hybrid_mesh

    mesh = make_hybrid_mesh({"data": 4}, {"model": 2})
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape == {"data": 4, "model": 2}

    V = RNG.rand(16, 12).astype("f")
    W0 = RNG.rand(12, 3).astype("f") + 0.1
    H0 = RNG.rand(16, 3).astype("f") + 0.1
    Wd, Hd, n = sharded_nmf_fit(V, W0, H0, mesh, beta=1, tol=0, max_iter=5,
                                model_axis="model")
    ref = NMF(W=W0, H=H0)
    ref.fit(V, 1, 0, 5)
    assert float(jnp.abs(Wd - ref.W.data).max()) < 2e-5


@needs_8
def test_halo_unfold_matches_conv_formulation():
    """The per-shard unfold-GEMM reconstruction (default when the patch
    tensor fits the budget) must match the conv formulation to f32
    rounding, for the 1-D and 2-D sharded solvers."""
    import os

    from pytorch_nmf_tpu.parallel import sharded_nmf2d_fit
    from pytorch_nmf_tpu.parallel.halo import (
        _halo_unfold_mode,
        sharded_nmfd_fit,
    )

    rng = np.random.RandomState(7)
    N, C, L_out, R, T = 2, 10, 48, 4, 5
    V = rng.rand(N, C, L_out).astype("f")
    W0 = rng.rand(C, R, T).astype("f") + 0.1
    H0 = rng.rand(N, R, L_out - T + 1).astype("f") + 0.1
    mesh = make_mesh({"seq": 8})

    assert _halo_unfold_mode(N, (), 6, (T,), R) == "unrolled"
    Wu, Hu, nu = sharded_nmfd_fit(V, W0, H0, mesh, beta=1, tol=0, max_iter=10)
    os.environ["PNT_HALO_UNFOLD"] = "0"
    try:
        assert _halo_unfold_mode(N, (), 6, (T,), R) == "conv"
        Wc, Hc, nc = sharded_nmfd_fit(
            V, W0, H0, mesh, beta=1, tol=0, max_iter=10
        )
    finally:
        del os.environ["PNT_HALO_UNFOLD"]
    assert int(nu) == int(nc)
    assert float(jnp.abs(Wu - Wc).max()) < 1e-5
    assert float(jnp.abs(Hu - Hc).max()) < 1e-5

    N, C, Y, X, R, ky, kx = 1, 5, 10, 32, 3, 3, 4
    V = rng.rand(N, C, Y, X).astype("f")
    W0 = rng.rand(C, R, ky, kx).astype("f") + 0.1
    H0 = rng.rand(N, R, Y - ky + 1, X - kx + 1).astype("f") + 0.1
    Wu, Hu, _ = sharded_nmf2d_fit(V, W0, H0, mesh, beta=2, tol=0, max_iter=10)
    os.environ["PNT_HALO_UNFOLD"] = "0"
    try:
        Wc, Hc, _ = sharded_nmf2d_fit(
            V, W0, H0, mesh, beta=2, tol=0, max_iter=10
        )
    finally:
        del os.environ["PNT_HALO_UNFOLD"]
    assert float(jnp.abs(Wu - Wc).max()) < 1e-5
    assert float(jnp.abs(Hu - Hc).max()) < 1e-5


@needs_8
def test_halo_conv_sym_padding_matches_default():
    """``PNT_HALO_CONV=sym`` (symmetric full padding + static slice on the
    halo'd trailing axis) is an A/B lowering knob for the conv per-shard
    mode — same math as the default mixed full/VALID formulation
    (bit-identical on v5e; the CPU conv lowering reorders the f32
    accumulation, so compare to tolerance here).  Measured on v5e: no
    win (tools/measure_halo_conv.py)."""
    import os

    from pytorch_nmf_tpu.parallel import halo

    rng = np.random.RandomState(11)
    mesh = make_mesh({"seq": 4})
    C, R, Y, ky, kx, L = 6, 3, 12, 3, 3, 32
    V = jnp.asarray(rng.rand(1, C, Y + ky - 1, L).astype("f"))
    W0 = jnp.asarray(rng.rand(C, R, ky, kx).astype("f") + 0.1)
    H0 = jnp.asarray(rng.rand(1, R, Y, L - kx + 1).astype("f") + 0.1)

    def run():
        # the env knob is read at trace time inside the cached solver
        halo._get_sharded_deconv_fit.cache_clear()
        out = halo._sharded_deconv_fit(
            V, W0, H0, mesh, 2, 1.0, float("-inf"), 10, 0.0, 0.0, "seq"
        )
        return np.asarray(out[0]), np.asarray(out[1])

    os.environ["PNT_HALO_UNFOLD"] = "0"  # force the conv per-shard mode
    os.environ.pop("PNT_HALO_CONV", None)
    try:
        Wv, Hv = run()
        os.environ["PNT_HALO_CONV"] = "sym"
        Ws, Hs = run()
    finally:
        os.environ.pop("PNT_HALO_CONV", None)
        del os.environ["PNT_HALO_UNFOLD"]
        halo._get_sharded_deconv_fit.cache_clear()
    np.testing.assert_allclose(Wv, Ws, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(Hv, Hs, rtol=1e-5, atol=1e-6)


@needs_8
@pytest.mark.parametrize("beta", [1, 2, 0.5])
def test_halo_conv_split_matches_concat(beta):
    """The split conv formulation (main conv at native shard width via
    padding config + strip GEMM on the received frames — the r5 default,
    measured −16%/iter at the 2-D bench shape) matches the materialized
    concat form (``PNT_HALO_CONV=concat``) and the single-device fit to
    f32 reassociation tolerance, for 1-D and 2-D conv modes, batched,
    with an unevenly-sharded trailing axis."""
    import os

    from pytorch_nmf_tpu.nmf import NMF2D
    from pytorch_nmf_tpu.parallel import halo, sharded_nmf2d_fit

    rng = np.random.RandomState(13)
    mesh = make_mesh({"seq": 8})
    # X=37 shards unevenly over 8 devices (chunk 5, pad 3): exercises the
    # trailing shard-divisibility pad under the split form
    N, C, Y, X, R, ky, kx = 2, 5, 10, 37, 3, 3, 4
    V = rng.rand(N, C, Y, X).astype("f")
    W0 = rng.rand(C, R, ky, kx).astype("f") + 0.1
    H0 = rng.rand(N, R, Y - ky + 1, X - kx + 1).astype("f") + 0.1

    os.environ["PNT_HALO_UNFOLD"] = "0"  # force the conv per-shard mode
    os.environ.pop("PNT_HALO_CONV", None)
    try:
        Ws, Hs, ns = sharded_nmf2d_fit(
            V, W0, H0, mesh, beta=beta, tol=0, max_iter=10
        )
        os.environ["PNT_HALO_CONV"] = "concat"
        Wc, Hc, nc = sharded_nmf2d_fit(
            V, W0, H0, mesh, beta=beta, tol=0, max_iter=10
        )
    finally:
        os.environ.pop("PNT_HALO_CONV", None)
        del os.environ["PNT_HALO_UNFOLD"]
        halo._get_sharded_deconv_fit.cache_clear()
    assert int(ns) == int(nc)
    np.testing.assert_allclose(Ws, Wc, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(Hs, Hc, rtol=1e-5, atol=1e-6)
    ref = NMF2D(W=W0, H=H0)
    ref.fit(V, beta, 0, 10)
    assert float(jnp.abs(Ws - ref.W.data).max()) < 2e-5
    assert float(jnp.abs(Hs - ref.H.data).max()) < 2e-5

    # 1-D conv mode: same split-vs-concat contract
    L, T = 48, 5
    V1 = rng.rand(N, C, L).astype("f")
    W1 = rng.rand(C, R, T).astype("f") + 0.1
    H1 = rng.rand(N, R, L - T + 1).astype("f") + 0.1
    os.environ["PNT_HALO_UNFOLD"] = "0"
    try:
        Ws, Hs, _ = halo.sharded_nmfd_fit(
            V1, W1, H1, mesh, beta=beta, tol=0, max_iter=10
        )
        os.environ["PNT_HALO_CONV"] = "concat"
        Wc, Hc, _ = halo.sharded_nmfd_fit(
            V1, W1, H1, mesh, beta=beta, tol=0, max_iter=10
        )
    finally:
        os.environ.pop("PNT_HALO_CONV", None)
        del os.environ["PNT_HALO_UNFOLD"]
        halo._get_sharded_deconv_fit.cache_clear()
    np.testing.assert_allclose(Ws, Wc, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(Hs, Hc, rtol=1e-5, atol=1e-6)


@needs_8
@pytest.mark.parametrize("beta", [1, 2, 0.5])
def test_halo_stream_matches_conv_formulation(beta):
    """The flat-τ streaming halo path (hand-written adjoints: per-chunk
    psum'd W contractions, reverse-ppermute fold) must match the conv/vjp
    formulation.  K·R > _CHUNK_COLS forces stream mode."""
    import os

    from pytorch_nmf_tpu.ops.fast_nmfd import _CHUNK_COLS
    from pytorch_nmf_tpu.parallel.halo import (
        _halo_unfold_mode,
        sharded_nmfd_fit,
    )

    rng = np.random.RandomState(11)
    N, C, L_out, R, T = 1, 6, 64, 512, 9
    assert T * R > _CHUNK_COLS
    V = rng.rand(N, C, L_out).astype("f")
    W0 = rng.rand(C, R, T).astype("f") + 0.1
    H0 = rng.rand(N, R, L_out - T + 1).astype("f") + 0.1
    mesh = make_mesh({"seq": 8})

    assert _halo_unfold_mode(N, (), L_out // 8, (T,), R) == "stream"
    Ws, Hs, ns = sharded_nmfd_fit(
        V, W0, H0, mesh, beta=beta, tol=0, max_iter=10
    )
    os.environ["PNT_HALO_UNFOLD"] = "0"
    try:
        Wc, Hc, nc = sharded_nmfd_fit(
            V, W0, H0, mesh, beta=beta, tol=0, max_iter=10
        )
    finally:
        del os.environ["PNT_HALO_UNFOLD"]
    assert int(ns) == int(nc)
    # f32 summation-order differences only; R=512 contractions accumulate
    # slightly more rounding than the small-R cases above
    assert float(jnp.abs(Ws - Wc).max()) < 5e-5
    assert float(jnp.abs(Hs - Hc).max()) < 5e-5
    assert bool(jnp.all(jnp.isfinite(Ws))) and bool(jnp.all(Ws >= 0))


@needs_8
@pytest.mark.parametrize("beta, N", [(1, 1), (2, 1), (1, 2)])
@pytest.mark.slow
def test_halo_pallas_matches_conv_formulation(beta, N):
    """The fused Mosaic per-shard mode (``"pallas"``: VALID-mode wgrad /
    hgrad inside shard_map, psum'd numerators, reverse-ppermute halo
    adjoint) must match the conv/vjp formulation.  Forced via
    PNT_NMFD_PALLAS=1 with the interpreter; chunk=256 clears the
    ``deconv_pallas_supported`` length gate.  ``N=2`` exercises the
    segment-stacked batched mode (halo frames as per-segment leads)."""
    import os

    from pytorch_nmf_tpu.parallel.halo import sharded_nmfd_fit

    rng = np.random.RandomState(13)
    C, R, T = 12, 5, 6
    L_out = 4 * 256  # chunk 256 over 4 devices
    V = rng.rand(N, C, L_out).astype("f") + 0.01
    W0 = rng.rand(C, R, T).astype("f") + 0.1
    H0 = rng.rand(N, R, L_out - T + 1).astype("f") + 0.1
    mesh = make_mesh({"seq": 4})

    os.environ["PNT_NMFD_PALLAS"] = "1"
    os.environ["PNT_PALLAS_INTERPRET"] = "1"
    try:
        Wp, Hp, np_ = sharded_nmfd_fit(
            V, W0, H0, mesh, beta=beta, tol=0, max_iter=10
        )
    finally:
        del os.environ["PNT_NMFD_PALLAS"]
        del os.environ["PNT_PALLAS_INTERPRET"]
    os.environ["PNT_NMFD_PALLAS"] = "0"
    os.environ["PNT_NMFD_AUTOTUNE"] = "0"
    try:
        Wc, Hc, nc = sharded_nmfd_fit(
            V, W0, H0, mesh, beta=beta, tol=0, max_iter=10
        )
    finally:
        del os.environ["PNT_NMFD_PALLAS"]
        del os.environ["PNT_NMFD_AUTOTUNE"]
    assert int(np_) == int(nc)
    assert float(jnp.abs(Wp - Wc).max()) < 1e-5
    assert float(jnp.abs(Hp - Hc).max()) < 1e-5
    assert bool(jnp.all(jnp.isfinite(Wp))) and bool(jnp.all(Wp >= 0))


@needs_8
@pytest.mark.parametrize("nd, N", [(2, 1), (3, 1), (2, 2), (3, 2)])
@pytest.mark.slow
def test_halo_pallas_nd_matches_conv_formulation(nd, N):
    """The 2-D/3-D fused per-shard halo mode (flat-offset kernels with a
    VALID trailing axis: middle axes padded to output widths, the
    activation's middle-axis lead prepended manually, W-side cot padded
    trailing / H-side leading on x) must match the conv/vjp
    formulation.  ``N=2`` exercises the batched stacking that reuses
    each segment's lead_mid zeros as the W-side separator."""
    import os

    from pytorch_nmf_tpu.parallel import sharded_nmf2d_fit, sharded_nmf3d_fit

    rng = np.random.RandomState(17)
    mesh = make_mesh({"seq": 4})
    if nd == 2:
        C, R, Y_in, ky, kx = 8, 5, 10, 3, 4
        L = 4 * 128
        V = rng.rand(N, C, Y_in + ky - 1, L).astype("f") + 0.01
        W0 = rng.rand(C, R, ky, kx).astype("f") + 0.1
        H0 = rng.rand(N, R, Y_in, L - kx + 1).astype("f") + 0.1
        fit = sharded_nmf2d_fit
    else:
        C, R, Z_in, Y_in, kz, ky, kx = 5, 4, 4, 6, 2, 3, 3
        L = 4 * 32
        V = rng.rand(
            N, C, Z_in + kz - 1, Y_in + ky - 1, L
        ).astype("f") + 0.01
        W0 = rng.rand(C, R, kz, ky, kx).astype("f") + 0.1
        H0 = rng.rand(N, R, Z_in, Y_in, L - kx + 1).astype("f") + 0.1
        fit = sharded_nmf3d_fit

    os.environ["PNT_NMFD_PALLAS"] = "1"
    os.environ["PNT_PALLAS_INTERPRET"] = "1"
    try:
        Wp, Hp, np_ = fit(V, W0, H0, mesh, beta=1, tol=0, max_iter=8)
    finally:
        del os.environ["PNT_NMFD_PALLAS"]
        del os.environ["PNT_PALLAS_INTERPRET"]
    os.environ["PNT_NMFD_PALLAS"] = "0"
    os.environ["PNT_NMFD_AUTOTUNE"] = "0"
    try:
        Wc, Hc, nc = fit(V, W0, H0, mesh, beta=1, tol=0, max_iter=8)
    finally:
        del os.environ["PNT_NMFD_PALLAS"]
        del os.environ["PNT_NMFD_AUTOTUNE"]
    assert int(np_) == int(nc)
    assert float(jnp.abs(Wp - Wc).max()) < 1e-5
    assert float(jnp.abs(Hp - Hc).max()) < 1e-5


@needs_8
@pytest.mark.parametrize(
    "nd, N, beta",
    [(1, 1, 1.0), (1, 2, 2.0), (2, 1, 2.0), (2, 2, 1.0), (3, 2, 1.0)],
)
@pytest.mark.slow
def test_halo_pallas_w_matches_conv_formulation(nd, N, beta, monkeypatch):
    """The hybrid fused-W/streamed-H per-shard halo mode (``pallas_w``) —
    offered exactly where the halo layout's hgrad accumulator is
    VMEM-gated out; here the hgrad VMEM model is stubbed huge so
    ``halo_pallas_mode`` lands on the hybrid at a test-sized shape —
    must match the conv/vjp formulation."""
    from pytorch_nmf_tpu.ops import pallas_deconv
    from pytorch_nmf_tpu.parallel import halo as halo_mod
    from pytorch_nmf_tpu.parallel import sharded_nmf2d_fit
    from pytorch_nmf_tpu.parallel.halo import sharded_nmfd_fit

    rng = np.random.RandomState(29)
    mesh = make_mesh({"seq": 4})
    monkeypatch.setattr(
        pallas_deconv, "_hgrad_scoped_bytes", lambda *a: 1 << 40
    )
    if nd == 1:
        C, R, T = 12, 5, 6
        L = 4 * 256
        V = rng.rand(N, C, L).astype("f") + 0.01
        W0 = rng.rand(C, R, T).astype("f") + 0.1
        H0 = rng.rand(N, R, L - T + 1).astype("f") + 0.1
        fit = sharded_nmfd_fit
    elif nd == 2:
        C, R, Y_in, ky, kx = 8, 5, 10, 3, 4
        L = 4 * 128
        V = rng.rand(N, C, Y_in + ky - 1, L).astype("f") + 0.01
        W0 = rng.rand(C, R, ky, kx).astype("f") + 0.1
        H0 = rng.rand(N, R, Y_in, L - kx + 1).astype("f") + 0.1
        fit = sharded_nmf2d_fit
    else:
        from pytorch_nmf_tpu.parallel import sharded_nmf3d_fit

        C, R, Z_in, Y_in, kz, ky, kx = 5, 4, 4, 6, 2, 3, 3
        L = 4 * 32
        V = rng.rand(
            N, C, Z_in + kz - 1, Y_in + ky - 1, L
        ).astype("f") + 0.01
        W0 = rng.rand(C, R, kz, ky, kx).astype("f") + 0.1
        H0 = rng.rand(N, R, Z_in, Y_in, L - kx + 1).astype("f") + 0.1
        fit = sharded_nmf3d_fit

    # spy on the mode handed to the solver factory (positional arg 10)
    seen = []
    orig = halo_mod._get_sharded_deconv_fit

    def spy(*args, **kw):
        seen.append(args[10] if len(args) > 10 else kw.get("mode"))
        return orig(*args, **kw)

    monkeypatch.setattr(halo_mod, "_get_sharded_deconv_fit", spy)

    monkeypatch.setenv("PNT_NMFD_PALLAS", "1")
    monkeypatch.setenv("PNT_PALLAS_INTERPRET", "1")
    Wp, Hp, np_ = fit(V, W0, H0, mesh, beta=beta, tol=0, max_iter=8)
    assert seen[-1] == "pallas_w", seen

    monkeypatch.setenv("PNT_NMFD_PALLAS", "0")
    monkeypatch.setenv("PNT_NMFD_AUTOTUNE", "0")
    Wc, Hc, nc = fit(V, W0, H0, mesh, beta=beta, tol=0, max_iter=8)
    assert seen[-1] != "pallas_w"
    assert int(np_) == int(nc)
    assert float(jnp.abs(Wp - Wc).max()) < 1e-5
    assert float(jnp.abs(Hp - Hc).max()) < 1e-5
    assert bool(jnp.all(jnp.isfinite(Wp))) and bool(jnp.all(Wp >= 0))


@needs_8
@pytest.mark.parametrize("nd", [2, 3])
@pytest.mark.slow
def test_halo_nd_first_axis_unpadded_bit_identical(nd, monkeypatch):
    """At N = 1 the halo N-D flat layout keeps the FIRST lead axis
    unpadded (flat-offset strides never involve the outermost extent);
    PNT_HALO_ND_FIRSTPAD=1 restores the padded pre-r4 layout.  The two
    layouts accumulate the same products in the same order, so the
    trajectories must be BIT-identical — and the unpadded accounting
    must widen the full-fused-mode VMEM admission window."""
    from pytorch_nmf_tpu.ops.pallas_deconv import halo_pallas_mode
    from pytorch_nmf_tpu.parallel import sharded_nmf2d_fit, sharded_nmf3d_fit

    rng = np.random.RandomState(23)
    mesh = make_mesh({"seq": 4})
    if nd == 2:
        C, R, Y_in, ky, kx = 8, 5, 10, 3, 4
        L = 4 * 128
        V = rng.rand(1, C, Y_in + ky - 1, L).astype("f") + 0.01
        W0 = rng.rand(C, R, ky, kx).astype("f") + 0.1
        H0 = rng.rand(1, R, Y_in, L - kx + 1).astype("f") + 0.1
        fit = sharded_nmf2d_fit
    else:
        C, R, Z_in, Y_in, kz, ky, kx = 5, 4, 4, 6, 2, 3, 3
        L = 4 * 32
        V = rng.rand(
            1, C, Z_in + kz - 1, Y_in + ky - 1, L
        ).astype("f") + 0.01
        W0 = rng.rand(C, R, kz, ky, kx).astype("f") + 0.1
        H0 = rng.rand(1, R, Z_in, Y_in, L - kx + 1).astype("f") + 0.1
        fit = sharded_nmf3d_fit

    monkeypatch.setenv("PNT_NMFD_PALLAS", "1")
    monkeypatch.setenv("PNT_PALLAS_INTERPRET", "1")
    Wn, Hn, _ = fit(V, W0, H0, mesh, beta=1, tol=0, max_iter=6)
    monkeypatch.setenv("PNT_HALO_ND_FIRSTPAD", "1")
    Wo, Ho, _ = fit(V, W0, H0, mesh, beta=1, tol=0, max_iter=6)
    assert float(jnp.abs(Wn - Wo).max()) == 0.0
    assert float(jnp.abs(Hn - Ho).max()) == 0.0

    # VMEM gate: the 3-D re-admission window (chunk=60, C=64, r16, k4^3:
    # the padded first axis models 16.0 MB > the 15 MiB bound, the
    # unpadded real-slab accounting 13.8 MB admits the full fused mode)
    monkeypatch.setenv("PNT_HALO_ND_FIRSTPAD", "1")
    assert halo_pallas_mode(1, 64, (16, 16), 60, (4, 4, 4), 16) == "pallas_w"
    monkeypatch.delenv("PNT_HALO_ND_FIRSTPAD")
    assert halo_pallas_mode(1, 64, (16, 16), 60, (4, 4, 4), 16) == "pallas"
    # batched stacking always keeps the padded first axis (equal strides)
    assert halo_pallas_mode(2, 64, (16, 16), 60, (4, 4, 4), 16) == "pallas_w"


@needs_8
@pytest.mark.parametrize("beta", [0.5, 1, 2])
@pytest.mark.slow
def test_sharded_sparse_matches_single_device_ell(beta):
    """Row-sharded dual-ELL sparse MU (psum'd W contractions, local H
    updates) must reproduce the single-device ELL trajectory.  M chosen
    non-divisible by the mesh so the row-padding path is exercised."""
    import os

    from pytorch_nmf_tpu.functional import nmf_fit
    from pytorch_nmf_tpu.ops.sparse import sparse_from_dense
    from pytorch_nmf_tpu.parallel import sharded_sparse_nmf_fit

    rng = np.random.RandomState(23)
    M, K, R = 109, 70, 6
    Vd = rng.rand(M, K).astype("f")
    V_sp = sparse_from_dense(np.where(Vd > 0.9, Vd, 0))
    W0 = rng.rand(K, R).astype("f") + 0.1
    H0 = rng.rand(M, R).astype("f") + 0.1

    mesh = make_mesh({"data": 8})
    Ws, Hs, ns = sharded_sparse_nmf_fit(
        V_sp, W0, H0, mesh, beta=beta, tol=0, max_iter=10
    )

    os.environ["PNT_SPARSE_DENSIFY"] = "0"
    os.environ["PNT_SPARSE_ELL"] = "1"
    os.environ["PNT_SPARSE_ELL_MAX_PAD"] = "1e9"
    try:
        W1, H1, n1 = nmf_fit(V_sp, W0, H0, beta=beta, tol=0, max_iter=10)
    finally:
        for k in ("PNT_SPARSE_DENSIFY", "PNT_SPARSE_ELL",
                  "PNT_SPARSE_ELL_MAX_PAD"):
            os.environ.pop(k, None)

    assert int(ns) == int(n1)
    assert float(jnp.abs(Ws - W1).max()) < 5e-5
    assert float(jnp.abs(Hs - H1).max()) < 5e-5
    assert bool(jnp.all(Hs >= 0)) and bool(jnp.all(jnp.isfinite(Ws)))


@needs_8
def test_sharded_sparse_early_stop_and_loss():
    """The sharded split-form cadence loss drives the same early-stop rule
    as the single-device solver."""
    from pytorch_nmf_tpu.ops.sparse import sparse_from_dense
    from pytorch_nmf_tpu.parallel import sharded_sparse_nmf_fit

    rng = np.random.RandomState(31)
    M, K, R = 64, 40, 4
    Vd = rng.rand(M, K).astype("f")
    V_sp = sparse_from_dense(np.where(Vd > 0.8, Vd, 0))
    W0 = rng.rand(K, R).astype("f") + 0.1
    H0 = rng.rand(M, R).astype("f") + 0.1
    mesh = make_mesh({"data": 8})

    _, _, n_loose = sharded_sparse_nmf_fit(
        V_sp, W0, H0, mesh, beta=2, tol=0.5, max_iter=200
    )
    _, _, n_full = sharded_sparse_nmf_fit(
        V_sp, W0, H0, mesh, beta=2, tol=0, max_iter=30
    )
    assert int(n_loose) < 200  # converged early under a loose tolerance
    assert int(n_full) == 30


@needs_8
@pytest.mark.parametrize(
    "alphas",
    # H_alpha > 1 specifically exercises the padded-H Dirichlet-MAP mask:
    # without it, h + (alpha - 1) injects mass into the auto-padding every
    # iteration and the psum'd marginals drift far from single-device
    [(1.0, 1.0, 1.0), (1.02, 0.99, 1.01), (1.0, 1.05, 1.0)],
)
@pytest.mark.slow
def test_halo_sharded_siplca_matches_single_device(alphas):
    """Sequence-parallel SIPLCA EM (halo exchange through the vjp E-step,
    psum'd marginals) must match the single-device trajectories, including
    Dirichlet-MAP priors and the raw-loop-index n_iter quirk."""
    from pytorch_nmf_tpu.parallel import sharded_siplca_fit
    from pytorch_nmf_tpu.plca import SIPLCA

    rng = np.random.RandomState(17)
    N, C, L_out, R, T = 1, 10, 60, 3, 5  # 60 non-divisible by 8: auto-pad
    V = rng.rand(N, C, L_out).astype("f")
    m = SIPLCA(V.shape, R, T=T)
    W0 = np.asarray(m.W.data)
    H0 = np.asarray(m.H.data)
    Z0 = np.asarray(m.Z.data)
    Wa, Ha, Za = alphas

    mesh = make_mesh({"seq": 8})
    Wd, Hd, Zd, n_d, norm_d = sharded_siplca_fit(
        V, W0, H0, Z0, mesh, tol=0, max_iter=20,
        W_alpha=Wa, H_alpha=Ha, Z_alpha=Za,
    )

    ref = SIPLCA(W=W0, H=H0, Z=Z0)
    n_ref, norm_ref = ref.fit(
        V, 0, 20, W_alpha=Wa, H_alpha=Ha, Z_alpha=Za
    )
    assert int(n_d) == n_ref
    assert abs(float(norm_d) - float(norm_ref)) < 1e-3
    assert Hd.shape == H0.shape
    assert float(jnp.abs(Wd - ref.W.data).max()) < 2e-5
    assert float(jnp.abs(Hd - ref.H.data).max()) < 2e-5
    assert float(jnp.abs(Zd - ref.Z.data).max()) < 2e-5


@needs_8
@pytest.mark.slow
def test_halo_sharded_siplca2_matches_single_device():
    from pytorch_nmf_tpu.parallel import sharded_siplca2_fit
    from pytorch_nmf_tpu.plca import SIPLCA2

    rng = np.random.RandomState(19)
    N, C, Y, X, R, ky, kx = 1, 6, 8, 32, 3, 3, 4
    V = rng.rand(N, C, Y, X).astype("f")
    m = SIPLCA2(V.shape, R, kernel_size=(ky, kx))
    W0 = np.asarray(m.W.data)
    H0 = np.asarray(m.H.data)
    Z0 = np.asarray(m.Z.data)

    mesh = make_mesh({"seq": 8})
    Wd, Hd, Zd, n_d, _ = sharded_siplca2_fit(
        V, W0, H0, Z0, mesh, tol=0, max_iter=15
    )
    ref = SIPLCA2(W=W0, H=H0, Z=Z0)
    n_ref, _ = ref.fit(V, 0, 15)
    assert int(n_d) == n_ref
    assert float(jnp.abs(Wd - ref.W.data).max()) < 2e-5
    assert float(jnp.abs(Hd - ref.H.data).max()) < 2e-5
    assert float(jnp.abs(Zd - ref.Z.data).max()) < 2e-5


@needs_8
def test_halo_sharded_siplca_early_stop():
    from pytorch_nmf_tpu.parallel import sharded_siplca_fit
    from pytorch_nmf_tpu.plca import SIPLCA

    rng = np.random.RandomState(29)
    N, C, L_out, R, T = 1, 8, 64, 2, 5
    V = rng.rand(N, C, L_out).astype("f")
    m = SIPLCA(V.shape, R, T=T)
    W0, H0, Z0 = (np.asarray(p.data) for p in (m.W, m.H, m.Z))
    mesh = make_mesh({"seq": 8})
    _, _, _, n_d, _ = sharded_siplca_fit(
        V, W0, H0, Z0, mesh, tol=1e-3, max_iter=200
    )
    ref = SIPLCA(W=W0, H=H0, Z=Z0)
    n_ref, _ = ref.fit(V, 1e-3, 200)
    assert int(n_d) == n_ref


@needs_8
def test_sharded_sparse_hybrid_skewed():
    """Degree-skewed sparse targets shard with the hybrid ELL+COO split
    and match the single-device hybrid trajectory."""
    import os

    from pytorch_nmf_tpu.functional import nmf_fit
    from pytorch_nmf_tpu.ops.sparse import sparse_from_dense
    from pytorch_nmf_tpu.parallel import sharded_sparse_nmf_fit

    rng = np.random.RandomState(41)
    M, K, R = 80, 56, 5
    Vd = np.where(rng.rand(M, K) > 0.93, rng.rand(M, K), 0).astype("f")
    Vd[2, :] = rng.rand(K).astype("f") + 0.1
    Vd[:, 3] = rng.rand(M).astype("f") + 0.1
    V_sp = sparse_from_dense(Vd)
    W0 = rng.rand(K, R).astype("f") + 0.1
    H0 = rng.rand(M, R).astype("f") + 0.1

    mesh = make_mesh({"data": 8})
    Ws, Hs, ns = sharded_sparse_nmf_fit(
        V_sp, W0, H0, mesh, beta=1, tol=0, max_iter=10
    )
    os.environ["PNT_SPARSE_DENSIFY"] = "0"
    os.environ["PNT_SPARSE_ELL"] = "1"
    try:
        W1, H1, n1 = nmf_fit(V_sp, W0, H0, beta=1, tol=0, max_iter=10)
    finally:
        os.environ.pop("PNT_SPARSE_DENSIFY", None)
        os.environ.pop("PNT_SPARSE_ELL", None)
    assert int(ns) == int(n1)
    assert float(jnp.abs(Ws - W1).max()) < 5e-5
    assert float(jnp.abs(Hs - H1).max()) < 5e-5


@needs_8
@pytest.mark.slow
def test_fuzz_halo_stream_random_configs():
    """Randomized sweep of the flat-τ streaming halo mode (forced via
    K·R > _CHUNK_COLS) against the conv/vjp formulation."""
    import os

    from pytorch_nmf_tpu.ops.fast_nmfd import _CHUNK_COLS
    from pytorch_nmf_tpu.parallel.halo import sharded_nmfd_fit

    rng = np.random.RandomState(97)
    mesh = make_mesh({"seq": 8})
    for case in range(3):
        C = int(rng.randint(3, 8))
        T = int(rng.randint(6, 12))
        R = int(-(-(_CHUNK_COLS + 1) // T) + rng.randint(0, 40))
        assert T * R > _CHUNK_COLS
        L_out = int(8 * max(T - 1, rng.randint(6, 12)))
        beta = float(rng.choice([0.5, 1.0, 1.5, 2.0]))

        V = rng.rand(1, C, L_out).astype("f")
        W0 = rng.rand(C, R, T).astype("f") + 0.1
        H0 = rng.rand(1, R, L_out - T + 1).astype("f") + 0.1

        Ws, Hs, ns = sharded_nmfd_fit(
            V, W0, H0, mesh, beta=beta, tol=0, max_iter=7
        )
        os.environ["PNT_HALO_UNFOLD"] = "0"
        try:
            Wc, Hc, nc = sharded_nmfd_fit(
                V, W0, H0, mesh, beta=beta, tol=0, max_iter=7
            )
        finally:
            del os.environ["PNT_HALO_UNFOLD"]
        ctx = (case, C, T, R, L_out, beta)
        assert int(ns) == int(nc), ctx
        assert float(jnp.abs(Ws - Wc).max()) < 5e-5, ctx
        assert float(jnp.abs(Hs - Hc).max()) < 5e-5, ctx
