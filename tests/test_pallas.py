"""Fused Pallas MU kernel correctness via the interpreter (CPU).

The real kernels run on TPU; here they execute through the Pallas
interpreter and must match the straightforward XLA formulation — the
"Pallas path vs naive jnp path" parity pattern (SURVEY.md §4.3).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from pytorch_nmf_tpu.constants import eps
from pytorch_nmf_tpu.ops.pallas_mu import (
    h_side_contractions,
    w_side_contractions,
)


@pytest.fixture(autouse=True, scope="module")
def _interpret_env():
    """Scope the interpreter escape hatch to this module only — other test
    modules must keep exercising the unfused CPU paths."""
    os.environ["PNT_PALLAS_INTERPRET"] = "1"
    yield
    os.environ.pop("PNT_PALLAS_INTERPRET", None)


RNG = np.random.RandomState(0)

# ragged on purpose: exercises the masked edge tiles
M, K, R = 300, 260, 24


@pytest.fixture(scope="module")
def data():
    V = jnp.asarray(RNG.rand(M, K).astype("f"))
    W = jnp.asarray(RNG.rand(K, R).astype("f") + 0.1)
    H = jnp.asarray(RNG.rand(M, R).astype("f") + 0.1)
    return V, W, H


def _reference(V, H, W, beta):
    WH = H @ W.T
    if beta == 1:
        return V / (WH + eps), None
    elif beta == 0:
        r = 1.0 / (WH + eps)
        return r * r * V, r
    else:
        WHe = WH + eps
        return WHe ** (beta - 2) * V, WHe ** (beta - 1)


@pytest.mark.parametrize("beta", [1.0, 0.0, 0.5, 1.5, 3.0])
def test_w_side_matches_xla(data, beta):
    V, W, H = data
    need_pos = beta != 1
    neg, pos = w_side_contractions(V, H, W, beta, need_pos)
    cn, cp = _reference(V, H, W, beta)
    ref_neg = cn.T @ H
    assert neg.shape == (K, R)
    np.testing.assert_allclose(np.asarray(neg), np.asarray(ref_neg), rtol=2e-5)
    if need_pos:
        np.testing.assert_allclose(
            np.asarray(pos), np.asarray(cp.T @ H), rtol=2e-5
        )
    else:
        assert pos is None


@pytest.mark.parametrize("beta", [1.0, 0.0, 1.5])
def test_h_side_matches_xla(data, beta):
    V, W, H = data
    need_pos = beta != 1
    neg, pos = h_side_contractions(V, H, W, beta, need_pos)
    cn, cp = _reference(V, H, W, beta)
    ref_neg = cn @ W
    assert neg.shape == (M, R)
    np.testing.assert_allclose(np.asarray(neg), np.asarray(ref_neg), rtol=2e-5)
    if need_pos:
        np.testing.assert_allclose(
            np.asarray(pos), np.asarray(cp @ W), rtol=2e-5
        )


def test_exact_tile_shapes():
    """No ragged edges: M, K multiples of the blocks."""
    M2, K2 = 512, 1024
    V = jnp.asarray(RNG.rand(M2, K2).astype("f"))
    W = jnp.asarray(RNG.rand(K2, 16).astype("f") + 0.1)
    H = jnp.asarray(RNG.rand(M2, 16).astype("f") + 0.1)
    neg, _ = w_side_contractions(V, H, W, 1.0, False)
    ref = (V / (H @ W.T + eps)).T @ H
    np.testing.assert_allclose(np.asarray(neg), np.asarray(ref), rtol=2e-5)


@pytest.mark.parametrize("beta", [2.0, 1.0, 0.0, 0.5, -1.0])
def test_fused_loss_matches_metric(data, beta):
    from pytorch_nmf_tpu.metrics import beta_div
    from pytorch_nmf_tpu.ops.pallas_mu import fused_beta_loss

    V, W, H = data
    got = float(fused_beta_loss(V, H, W, beta))
    ref = float(beta_div(H @ W.T, V, beta))
    np.testing.assert_allclose(got, ref, rtol=2e-5)


def test_rank_one_kernels():
    """R=1 exercises the minimal lane count in every dot."""
    V = jnp.asarray(RNG.rand(70, 50).astype("f"))
    W = jnp.asarray(RNG.rand(50, 1).astype("f") + 0.1)
    H = jnp.asarray(RNG.rand(70, 1).astype("f") + 0.1)
    neg, _ = w_side_contractions(V, H, W, 1.0, False)
    ref = (V / (H @ W.T + eps)).T @ H
    np.testing.assert_allclose(np.asarray(neg), np.asarray(ref), rtol=2e-5)


def test_wide_rank_kernels():
    """R=160 (not a lane multiple, larger than one lane group)."""
    V = jnp.asarray(RNG.rand(64, 96).astype("f"))
    W = jnp.asarray(RNG.rand(96, 160).astype("f") + 0.1)
    H = jnp.asarray(RNG.rand(64, 160).astype("f") + 0.1)
    neg, pos = h_side_contractions(V, H, W, 0.5, True)
    WH = H @ W.T
    cn = (WH + eps) ** (0.5 - 2) * V
    np.testing.assert_allclose(np.asarray(neg), np.asarray(cn @ W), rtol=2e-5)


@pytest.mark.parametrize("beta", [0.5, 1.0])
@pytest.mark.parametrize("model_axis", [None, "model"])
def test_sharded_fused_fit_matches_single_device(beta, model_axis):
    """Pallas kernels inside the shard_map solver (interpreter mode on the
    CPU mesh) must match the single-device trajectories."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from pytorch_nmf_tpu.nmf import NMF
    from pytorch_nmf_tpu.parallel import make_mesh, sharded_nmf_fit

    M2, K2, R2 = 64, 32, 4
    V = RNG.rand(M2, K2).astype("f")
    W0 = RNG.rand(K2, R2).astype("f") + 0.1
    H0 = RNG.rand(M2, R2).astype("f") + 0.1
    mesh = make_mesh({"data": 4, "model": 2})

    Wd, Hd, n_iter = sharded_nmf_fit(
        V, W0, H0, mesh, beta=beta, tol=0, max_iter=5,
        model_axis=model_axis, use_pallas=True,
    )
    import os

    os.environ["PNT_NO_PALLAS"] = "1"
    try:
        ref = NMF(W=W0, H=H0)
        ref.fit(V, beta, 0, 5)
    finally:
        os.environ.pop("PNT_NO_PALLAS", None)
    assert float(jnp.abs(Wd - ref.W.data).max()) < 2e-5
    assert float(jnp.abs(Hd - ref.H.data).max()) < 2e-5


def test_kl_epilogue_fused_update_matches_manual(data):
    """β=1 fully-fused update (multiplier applied in-kernel) must equal the
    unfused numerator + XLA epilogue."""
    from pytorch_nmf_tpu.ops.mu import kl_pos_H, kl_pos_W
    from pytorch_nmf_tpu.ops.pallas_mu import _fused_contractions

    V, W, H = data
    out, _ = _fused_contractions(
        V, H, W, beta=1.0, need_pos=False, w_side=True, mu_pos=kl_pos_W(H)
    )
    neg, _ = w_side_contractions(V, H, W, 1.0, False)
    ref = W * ((jnp.maximum(neg, 0) + eps) / kl_pos_W(H))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5)

    out_h, _ = _fused_contractions(
        V, H, W, beta=1.0, need_pos=False, w_side=False,
        mu_pos=kl_pos_H(W).reshape(1, -1),
    )
    neg_h, _ = h_side_contractions(V, H, W, 1.0, False)
    ref_h = H * ((jnp.maximum(neg_h, 0) + eps) / kl_pos_H(W))
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(ref_h), rtol=2e-5)


@pytest.mark.parametrize(
    "C, L_in, R, T, Tk",
    [(17, 300, 8, 12, 5), (33, 400, 16, 20, 8), (7, 260, 3, 5, 5)],
)
@pytest.mark.slow
def test_deconv_kernels_match_unfold(C, L_in, R, T, Tk):
    """pallas_deconv.hgrad/wgrad must equal the stream engine's fold and
    patch-einsum contractions (ragged C, T not a Tk multiple, odd R)."""
    from pytorch_nmf_tpu.ops import fast_nmfd as F
    from pytorch_nmf_tpu.ops import pallas_deconv as PD

    Lp = L_in + T - 1
    H = jnp.asarray(RNG.rand(1, R, L_in).astype("f"))
    W = jnp.asarray(RNG.rand(C, R, T).astype("f"))
    cot = jnp.asarray(RNG.rand(1, Lp, C).astype("f"))
    cot_b = jnp.asarray(RNG.rand(1, Lp, C).astype("f"))

    W2 = F._w2(W)
    G = jnp.einsum("nlc,kc->nlk", cot, W2)
    ref_h = jnp.moveaxis(F._fold(G, L_in, T, R), -1, 1)[0]
    nkr = -(-T // Tk)
    W2f = jnp.pad(W2, ((0, (nkr * Tk - T) * R), (0, 0)))
    got_h = PD.hgrad(cot[0], W2f, R, Tk, L_in)
    np.testing.assert_allclose(
        np.asarray(got_h), np.asarray(ref_h),
        rtol=0, atol=2e-6 * float(jnp.abs(ref_h).max()),
    )

    P = F.unfold_patches(H, T)
    outs = PD.wgrad([cot[0], cot_b[0]], jnp.moveaxis(H[0], 0, 1), R, Tk, T)
    for got, ct in ((outs[0], cot), (outs[1], cot_b)):
        ref_w = jnp.einsum("nlk,nlc->kc", P, ct)
        np.testing.assert_allclose(
            np.asarray(got[: T * R]), np.asarray(ref_w),
            rtol=0, atol=2e-6 * float(jnp.abs(ref_w).max()),
        )


def test_deconv_wgrad_fused_epilogue_matches_manual():
    """β=1 fused W epilogue (updated kernel leaves VMEM) must equal the
    raw-numerator + manual multiply path bit-for-bit."""
    from pytorch_nmf_tpu.constants import eps as _eps
    from pytorch_nmf_tpu.ops import fast_nmfd as F
    from pytorch_nmf_tpu.ops import pallas_deconv as PD
    from pytorch_nmf_tpu.ops.mu import kl_pos_W

    C, L_in, R, T, Tk = 33, 400, 16, 20, 8
    Lp = L_in + T - 1
    H = jnp.asarray(RNG.rand(1, R, L_in).astype("f"))
    W = jnp.asarray(RNG.rand(C, R, T).astype("f"))
    cot = jnp.asarray(RNG.rand(1, Lp, C).astype("f"))
    nkr = -(-T // Tk)
    W2f = jnp.pad(F._w2(W), ((0, (nkr * Tk - T) * R), (0, 0)))
    H2 = jnp.moveaxis(H[0], 0, 1)
    pos_r = kl_pos_W(H).reshape(-1)

    import jax

    fused = PD.wgrad([cot[0]], H2, R, Tk, T, mu_w2=W2f, mu_pos=pos_r)[0]
    raw = PD.wgrad([cot[0]], H2, R, Tk, T)[0]
    pos_t = jnp.tile(pos_r, W2f.shape[0] // R)[:, None]
    ref = W2f * ((jax.nn.relu(raw) + _eps) / pos_t)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


@pytest.mark.parametrize("beta", [1.0, 2.0, 0.5])
@pytest.mark.slow
def test_nmfd_pallas_engine_matches_stream(beta):
    """NMFD fits through the forced fused-kernel engine (interpreter) must
    track the stream-engine trajectories; measured on v5e the engine wins
    the flagship shape 1.16-1.18x (ROADMAP), selected by the autotuner."""
    from pytorch_nmf_tpu.nmf import NMFD

    N, C, L, R, T = 1, 20, 400, 6, 12
    V = RNG.rand(N, C, L).astype("f")
    W0 = RNG.rand(C, R, T).astype("f") + 0.1
    H0 = RNG.rand(N, R, L - T + 1).astype("f") + 0.1

    os.environ["PNT_NMFD_PALLAS"] = "1"
    try:
        m = NMFD(W=W0, H=H0)
        m.fit(V, beta, tol=0, max_iter=12)
    finally:
        os.environ.pop("PNT_NMFD_PALLAS", None)

    ref = NMFD(W=W0, H=H0)
    ref.fit(V, beta, tol=0, max_iter=12)
    dW = float(jnp.abs(m.W.data - ref.W.data).max()
               / jnp.abs(ref.W.data).max())
    dH = float(jnp.abs(m.H.data - ref.H.data).max()
               / jnp.abs(ref.H.data).max())
    assert dW < 5e-5 and dH < 5e-5


def test_siplca_em_pallas_recon_matches_default():
    """SIPLCA EM through the custom-vjp fused-adjoint reconstruction
    (forced via PNT_NMFD_PALLAS=1, interpreter) must track the default
    engine's trajectory; measured on v5e it wins 4.1× at R=64 and loses
    at R=8 (M=8 dots starve the MXU) — the EM autotuner picks per shape."""
    import jax

    from pytorch_nmf_tpu.ops.autotune import resolve_plca_recon3
    from pytorch_nmf_tpu.plca import SIPLCA

    N, C, L, R, T = 1, 16, 360, 5, 14
    V = RNG.rand(N, C, L).astype("f")
    W0 = RNG.rand(C, R, T).astype("f")
    H0 = RNG.rand(N, R, L - T + 1).astype("f")
    Z0 = RNG.rand(R).astype("f")

    os.environ["PNT_NMFD_PALLAS"] = "1"
    try:
        m = SIPLCA(W=W0, H=H0, Z=Z0)
        r3 = resolve_plca_recon3(
            SIPLCA, jnp.asarray(V), m.W.data, m.H.data, m.Z.data
        )
        assert r3 is SIPLCA._fit_reconstruct_pallas
        n, _ = m.fit(V, tol=0, max_iter=15)
    finally:
        os.environ.pop("PNT_NMFD_PALLAS", None)

    ref = SIPLCA(W=W0, H=H0, Z=Z0)
    n2, _ = ref.fit(V, tol=0, max_iter=15)
    assert n == n2
    for nm in ("W", "H", "Z"):
        a, b = getattr(m, nm).data, getattr(ref, nm).data
        assert float(jnp.abs(a - b).max() / jnp.abs(b).max()) < 5e-5, nm

    # the kill switch removes the EM candidate
    os.environ["PNT_NMFD_PALLAS"] = "0"
    try:
        from pytorch_nmf_tpu.ops.autotune import _plca_pallas_recon3

        assert _plca_pallas_recon3(SIPLCA, jnp.asarray(V), m.H.data) is None
    finally:
        os.environ.pop("PNT_NMFD_PALLAS", None)


@pytest.mark.slow
def test_siplca2_em_pallas_recon_matches_default():
    """SIPLCA2 EM through the flat-offset fused-adjoint reconstruction
    (forced, interpreter) must track the default engine's trajectory —
    the N-D custom-vjp recon feeding the EM E-step."""
    from pytorch_nmf_tpu.ops.autotune import _plca_pallas_recon3
    from pytorch_nmf_tpu.plca import SIPLCA2

    N, C, R = 1, 9, 4
    Y_in, X_in, ky, kx = 16, 20, 3, 5  # flat 16*24 = 384 >= 256
    V = RNG.rand(N, C, Y_in + ky - 1, X_in + kx - 1).astype("f")
    W0 = RNG.rand(C, R, ky, kx).astype("f")
    H0 = RNG.rand(N, R, Y_in, X_in).astype("f")
    Z0 = RNG.rand(R).astype("f")

    os.environ["PNT_NMFD_PALLAS"] = "1"
    try:
        m = SIPLCA2(W=W0, H=H0, Z=Z0)
        assert _plca_pallas_recon3(
            SIPLCA2, jnp.asarray(V), m.H.data
        ) is SIPLCA2._fit_reconstruct_pallas
        n, _ = m.fit(V, tol=0, max_iter=10)
    finally:
        os.environ.pop("PNT_NMFD_PALLAS", None)

    ref = SIPLCA2(W=W0, H=H0, Z=Z0)
    n2, _ = ref.fit(V, tol=0, max_iter=10)
    assert n == n2
    for nm in ("W", "H", "Z"):
        a, b = getattr(m, nm).data, getattr(ref, nm).data
        assert float(jnp.abs(a - b).max() / jnp.abs(b).max()) < 5e-5, nm


@pytest.mark.slow
def test_pallas_custom_vjp_deconv_batched_adjoints():
    """Regression: the custom-vjp fused deconv's backward must run the
    segment-stacked mode for N > 1 (its shape gate accepts batched
    targets, so a plain flatten would silently corrupt the SIPLCA EM
    E-step's cotangents — caught at ~30-65 absolute error before the
    fix)."""
    import jax

    from pytorch_nmf_tpu.ops import recon
    from pytorch_nmf_tpu.ops.fast_nmfd import unfold_deconv_pallas_interpret
    from pytorch_nmf_tpu.ops.pallas_deconv import (
        deconv_pallas_nd_supported,
        deconv_pallas_supported,
    )

    cases = []
    N, C, R, T, L_in = 3, 11, 6, 9, 120
    H1 = jnp.asarray(RNG.rand(N, R, L_in).astype("f"))
    W1 = jnp.asarray(RNG.rand(C, R, T).astype("f"))
    assert deconv_pallas_supported((N, C, L_in + T - 1), H1.shape,
                                   np.float32)
    cases.append((H1, W1, recon.deconv1d))
    N, C, R, ky, kx, Y, X = 2, 7, 5, 3, 4, 12, 14
    H2 = jnp.asarray(RNG.rand(N, R, Y, X).astype("f"))
    W2 = jnp.asarray(RNG.rand(C, R, ky, kx).astype("f"))
    assert deconv_pallas_nd_supported(
        (N, C, Y + ky - 1, X + kx - 1), H2.shape, np.float32
    )
    cases.append((H2, W2, recon.deconv2d))

    for H, W, ref in cases:
        def loss_p(H_, W_):
            return jnp.sum(jnp.sin(unfold_deconv_pallas_interpret(H_, W_)))

        def loss_r(H_, W_, _ref=ref):
            return jnp.sum(jnp.sin(_ref(H_, W_)))

        gp = jax.grad(loss_p, argnums=(0, 1))(H, W)
        gr = jax.grad(loss_r, argnums=(0, 1))(H, W)
        for a, b in zip(gp, gr):
            scale = float(jnp.abs(b).max())
            assert float(jnp.abs(a - b).max()) < 2e-6 * max(scale, 1.0)


@pytest.mark.slow
def test_pallas_w_custom_vjp_deconv_adjoints():
    """The hybrid custom-vjp recon (fused wgrad + streamed fold) must
    produce the reference gradients — 1-D and 2-D, batched included."""
    import jax

    from pytorch_nmf_tpu.ops import recon
    from pytorch_nmf_tpu.ops.fast_nmfd import unfold_deconv_pallas_w_interpret

    cases = []
    N, C, R, T, L_in = 2, 9, 5, 7, 140
    cases.append((
        jnp.asarray(RNG.rand(N, R, L_in).astype("f")),
        jnp.asarray(RNG.rand(C, R, T).astype("f")),
        recon.deconv1d,
    ))
    N, C, R, ky, kx, Y, X = 2, 6, 4, 3, 4, 11, 15
    cases.append((
        jnp.asarray(RNG.rand(N, R, Y, X).astype("f")),
        jnp.asarray(RNG.rand(C, R, ky, kx).astype("f")),
        recon.deconv2d,
    ))

    for H, W, ref in cases:
        gp = jax.grad(
            lambda h, w: jnp.sum(
                jnp.sin(unfold_deconv_pallas_w_interpret(h, w))
            ),
            argnums=(0, 1),
        )(H, W)
        gr = jax.grad(
            lambda h, w, _ref=ref: jnp.sum(jnp.sin(_ref(h, w))),
            argnums=(0, 1),
        )(H, W)
        for a, b in zip(gp, gr):
            scale = max(float(jnp.abs(b).max()), 1.0)
            assert float(jnp.abs(a - b).max()) < 3e-6 * scale


@pytest.mark.slow
def test_hybrid_recon_stands_in_at_vmem_gated_shapes(monkeypatch):
    """Where the full fused recon's hgrad accumulator is VMEM-gated out
    (here: the full gates stubbed off), the EM and Hoyer resolvers hand
    out the hybrid fused-W/streamed-H custom-vjp recon, and forced fits
    through it track the default engines."""
    import jax

    from pytorch_nmf_tpu.nmf import NMFD
    from pytorch_nmf_tpu.ops import pallas_deconv
    from pytorch_nmf_tpu.ops.autotune import (
        _deconv_pallas_recon2,
        _plca_pallas_recon3,
        resolve_hoyer_recon2,
    )
    from pytorch_nmf_tpu.ops.fast_nmfd import unfold_deconv_pallas_w_interpret
    from pytorch_nmf_tpu.plca import SIPLCA

    monkeypatch.setattr(
        pallas_deconv, "deconv_pallas_supported", lambda *a: False
    )
    monkeypatch.setattr(
        pallas_deconv, "deconv_pallas_nd_supported", lambda *a: False
    )
    monkeypatch.setenv("PNT_NMFD_PALLAS", "1")

    N, C, L, R, T = 1, 14, 340, 5, 12
    V = RNG.rand(N, C, L).astype("f")
    W0 = RNG.rand(C, R, T).astype("f") + 0.1
    H0 = RNG.rand(N, R, L - T + 1).astype("f") + 0.1
    Z0 = RNG.rand(R).astype("f")

    # resolvers hand out the hybrid
    assert _deconv_pallas_recon2(
        V.shape, H0.shape, np.float32
    ) is unfold_deconv_pallas_w_interpret
    r3 = _plca_pallas_recon3(SIPLCA, jnp.asarray(V), jnp.asarray(H0))
    assert r3 is SIPLCA._fit_reconstruct_pallas_w
    r2 = resolve_hoyer_recon2(
        NMFD, jnp.asarray(V), jnp.asarray(W0), jnp.asarray(H0), 2.0
    )
    assert r2 is unfold_deconv_pallas_w_interpret

    # forced EM through the hybrid tracks the default engine
    m = SIPLCA(W=W0, H=H0, Z=Z0)
    n, _ = m.fit(V, tol=0, max_iter=10)
    monkeypatch.setenv("PNT_NMFD_PALLAS", "0")
    ref = SIPLCA(W=W0, H=H0, Z=Z0)
    n2, _ = ref.fit(V, tol=0, max_iter=10)
    assert n == n2
    for nm in ("W", "H", "Z"):
        a, b = getattr(m, nm).data, getattr(ref, nm).data
        assert float(jnp.abs(a - b).max() / jnp.abs(b).max()) < 5e-5, nm

    # forced Hoyer through the hybrid tracks the default recon
    monkeypatch.setenv("PNT_NMFD_PALLAS", "1")
    mh = NMFD(W=W0, H=H0)
    mh.sparse_fit(V, beta=2, max_iter=5, sH=0.4)
    monkeypatch.setenv("PNT_NMFD_PALLAS", "0")
    rh = NMFD(W=W0, H=H0)
    rh.sparse_fit(V, beta=2, max_iter=5, sH=0.4)
    for nm in ("W", "H"):
        a, b = getattr(mh, nm).data, getattr(rh, nm).data
        assert float(jnp.abs(a - b).max() / jnp.abs(b).max()) < 5e-4, nm


@pytest.mark.slow
def test_fuzz_pallas_custom_vjp_adjoints_random_shapes():
    """Randomized sweep of the fused custom-vjp deconv adjoints
    (1-D/2-D/3-D, batched included) against the plain reconstruction's
    autodiff — the net under the segment-stacking index arithmetic."""
    import jax

    from pytorch_nmf_tpu.ops import recon
    from pytorch_nmf_tpu.ops.fast_nmfd import unfold_deconv_pallas_interpret
    from pytorch_nmf_tpu.ops.pallas_deconv import (
        deconv_pallas_nd_supported,
        deconv_pallas_supported,
    )

    rng = np.random.RandomState(2026)
    for case in range(6):
        nd = 1 + case % 3
        N = int(rng.randint(1, 4))
        C = int(rng.randint(3, 9))
        R = int(rng.randint(2, 6))
        if nd == 1:
            ks = (int(rng.randint(2, 10)),)
            L_in = int(-(-280 // N) + rng.randint(0, 20))
            Hs = (N, R, L_in)
        elif nd == 2:
            ks = (int(rng.randint(2, 4)), int(rng.randint(2, 5)))
            Y_in = int(rng.randint(6, 12))
            X_in = int(-(-300 // (N * Y_in)) + ks[1] + rng.randint(0, 6))
            Hs = (N, R, Y_in, X_in)
        else:
            ks = (2, int(rng.randint(2, 3)), int(rng.randint(2, 4)))
            Z_in, Y_in = int(rng.randint(3, 5)), int(rng.randint(4, 7))
            X_in = int(
                -(-300 // (N * Z_in * Y_in)) + ks[2] + rng.randint(0, 4)
            )
            Hs = (N, R, Z_in, Y_in, X_in)
        Vs = (N, C) + tuple(s + k - 1 for s, k in zip(Hs[2:], ks))
        ok = (
            deconv_pallas_supported(Vs, Hs, np.float32) if nd == 1
            else deconv_pallas_nd_supported(Vs, Hs, np.float32)
        )
        assert ok, (case, Vs, Hs)
        H = jnp.asarray(RNG.rand(*Hs).astype("f"))
        W = jnp.asarray(RNG.rand(C, R, *ks).astype("f"))
        ref = getattr(recon, f"deconv{nd}d")
        gp = jax.grad(
            lambda h, w: jnp.sum(jnp.sin(unfold_deconv_pallas_interpret(h, w))),
            argnums=(0, 1),
        )(H, W)
        gr = jax.grad(
            lambda h, w, _ref=ref: jnp.sum(jnp.sin(_ref(h, w))),
            argnums=(0, 1),
        )(H, W)
        for a, b in zip(gp, gr):
            scale = max(float(jnp.abs(b).max()), 1.0)
            assert float(jnp.abs(a - b).max()) < 3e-6 * scale, \
                (case, nd, N, Vs, Hs)


def test_siplca_em_pallas_recon_batched_matches_default():
    """Batched (N > 1) SIPLCA EM through the forced fused-adjoint
    reconstruction must track the default engine — end-to-end exercise
    of the segment-stacked custom-vjp backward."""
    from pytorch_nmf_tpu.plca import SIPLCA

    N, C, L, R, T = 2, 12, 200, 5, 11  # N·L_in = 380 clears the gate
    V = RNG.rand(N, C, L).astype("f")
    W0 = RNG.rand(C, R, T).astype("f")
    H0 = RNG.rand(N, R, L - T + 1).astype("f")
    Z0 = RNG.rand(R).astype("f")

    os.environ["PNT_NMFD_PALLAS"] = "1"
    try:
        m = SIPLCA(W=W0, H=H0, Z=Z0)
        n, _ = m.fit(V, tol=0, max_iter=10)
    finally:
        os.environ.pop("PNT_NMFD_PALLAS", None)

    ref = SIPLCA(W=W0, H=H0, Z=Z0)
    n2, _ = ref.fit(V, tol=0, max_iter=10)
    assert n == n2
    for nm in ("W", "H", "Z"):
        a, b = getattr(m, nm).data, getattr(ref, nm).data
        assert float(jnp.abs(a - b).max() / jnp.abs(b).max()) < 5e-5, nm


def test_nmfd_hoyer_pallas_recon_matches_default():
    """Dense-target Hoyer ``sparse_fit`` through the forced fused-adjoint
    reconstruction (PNT_NMFD_PALLAS=1, interpreter) must track the default
    unfold recon's trajectory — the projected-gradient steps differentiate
    through the custom-vjp recon, closing the ROADMAP lead that the Hoyer
    ``_fit_recon2`` hook lacked the autotune surface the EM already had."""
    from pytorch_nmf_tpu.nmf import NMFD
    from pytorch_nmf_tpu.ops.autotune import resolve_hoyer_recon2
    from pytorch_nmf_tpu.ops.fast_nmfd import resolve_pallas_unfold_deconv

    N, C, L, R, T = 1, 16, 360, 5, 14
    V = RNG.rand(N, C, L).astype("f")
    W0 = RNG.rand(C, R, T).astype("f") + 0.1
    H0 = RNG.rand(N, R, L - T + 1).astype("f") + 0.1

    os.environ["PNT_NMFD_PALLAS"] = "1"
    try:
        m = NMFD(W=W0, H=H0)
        r2 = resolve_hoyer_recon2(
            NMFD, jnp.asarray(V), m.W.data, m.H.data, 2.0
        )
        assert r2 is resolve_pallas_unfold_deconv()
        m.sparse_fit(V, beta=2, max_iter=5, sH=0.4)
    finally:
        os.environ.pop("PNT_NMFD_PALLAS", None)

    ref = NMFD(W=W0, H=H0)
    ref.sparse_fit(V, beta=2, max_iter=5, sH=0.4)
    for nm in ("W", "H"):
        a, b = getattr(m, nm).data, getattr(ref, nm).data
        # discrete line-search decisions amplify f32 reorder noise
        assert float(jnp.abs(a - b).max() / jnp.abs(b).max()) < 5e-4, nm

    # the kill switch removes the candidate
    os.environ["PNT_NMFD_PALLAS"] = "0"
    try:
        from pytorch_nmf_tpu.ops.autotune import _deconv_pallas_recon2

        assert _deconv_pallas_recon2(V.shape, H0.shape, V.dtype) is None
    finally:
        os.environ.pop("PNT_NMFD_PALLAS", None)


def test_autotune_offers_pallas_candidate():
    """The measured candidate set must include the fused engine exactly
    when Mosaic kernels can run (here: interpreter mode) — for every
    spatial rank since the flat-offset mode — and honor the kill
    switch."""
    from pytorch_nmf_tpu.ops.autotune import _candidates
    from pytorch_nmf_tpu.ops.fast_nmfd import (
        nmf2d_pallas_interpret_factory,
        nmf3d_pallas_interpret_factory,
        nmfd_pallas_interpret_factory,
    )

    names = dict(_candidates(1.0, 1))
    assert names.get("pallas") is nmfd_pallas_interpret_factory
    assert dict(_candidates(1.0, 2)).get("pallas") \
        is nmf2d_pallas_interpret_factory
    assert dict(_candidates(1.0, 3)).get("pallas") \
        is nmf3d_pallas_interpret_factory
    os.environ["PNT_NMFD_PALLAS"] = "0"
    try:
        assert "pallas" not in dict(_candidates(1.0, 1))
        assert "pallas" not in dict(_candidates(1.0, 2))
    finally:
        os.environ.pop("PNT_NMFD_PALLAS", None)


@pytest.mark.parametrize(
    "Y_in, X_in, ky, kx, Tk",
    [(16, 20, 3, 5, 16), (12, 24, 4, 4, 5)],
)
def test_deconv_nd_kernels_match_direct(Y_in, X_in, ky, kx, Tk):
    """The flat-offset (N-D) kernel mode must equal the direct 2-D
    patch/fold contractions: pad the activation's trailing axis to the
    output width, flatten row-major, and the wrap-around reads land in
    the zero-pad columns exactly (pallas_deconv.nd_geom)."""
    from pytorch_nmf_tpu.ops import pallas_deconv as PD

    C, R = 7, 5
    Yp, Xp = Y_in + ky - 1, X_in + kx - 1
    K = ky * kx
    nkr = -(-K // Tk)
    H = RNG.rand(R, Y_in, X_in).astype("f")
    W = RNG.rand(C, R, ky, kx).astype("f")
    cot = RNG.rand(Yp * Xp, C).astype("f")
    cot3 = cot.reshape(Yp, Xp, C)
    geom = PD.nd_geom((ky, kx), (Y_in, Xp))
    T_flat = PD._flat_T(geom)

    Hf = np.zeros((Y_in, Xp, R), "f")
    Hf[:, :X_in] = np.moveaxis(H, 0, -1)
    got_w = np.asarray(PD.wgrad(
        [jnp.asarray(cot)], jnp.asarray(Hf.reshape(-1, R)), R, Tk, T_flat,
        geom=geom,
    )[0])[: K * R]
    ref_w = np.zeros((K * R, C), "f")
    for dy in range(ky):
        for dx in range(kx):
            j = dy * kx + dx
            ref_w[j * R:(j + 1) * R] = np.einsum(
                "ryx,yxc->rc", H, cot3[dy:dy + Y_in, dx:dx + X_in]
            )
    np.testing.assert_allclose(
        got_w, ref_w, rtol=0, atol=2e-6 * float(np.abs(ref_w).max())
    )

    W2f = np.pad(
        np.transpose(W, (2, 3, 1, 0)).reshape(K * R, C),
        ((0, (nkr * Tk - K) * R), (0, 0)),
    )
    got_h = np.asarray(PD.hgrad(
        jnp.asarray(cot), jnp.asarray(W2f), R, Tk, Y_in * Xp, geom=geom,
    )).reshape(R, Y_in, Xp)[:, :, :X_in]
    ref_h = np.zeros((R, Y_in, X_in), "f")
    for dy in range(ky):
        for dx in range(kx):
            ref_h += np.moveaxis(
                cot3[dy:dy + Y_in, dx:dx + X_in] @ W[:, :, dy, dx], -1, 0
            )
    np.testing.assert_allclose(
        got_h, ref_h, rtol=0, atol=2e-6 * float(np.abs(ref_h).max())
    )


def test_forced_pallas_rejected_shape_raises_clearly():
    """An explicit PNT_NMFD_PALLAS=1 force at a gate-rejected shape must
    fail with the support-gate ValueError (the autotuned default absorbs
    candidate failures instead)."""
    from pytorch_nmf_tpu.nmf import NMFD
    from pytorch_nmf_tpu.ops.pallas_deconv import deconv_pallas_supported

    N, C, R, T, L_in = 1, 5, 3, 4, 60  # flat length < 256
    Vs = (N, C, L_in + T - 1)
    assert not deconv_pallas_supported(Vs, (N, R, L_in), np.float32)
    V = RNG.rand(*Vs).astype("f") + 0.01
    W0 = RNG.rand(C, R, T).astype("f") + 0.1
    H0 = RNG.rand(N, R, L_in).astype("f") + 0.1

    os.environ["PNT_NMFD_PALLAS"] = "1"
    try:
        m = NMFD(W=W0, H=H0)
        with pytest.raises(ValueError, match="pallas deconv engine"):
            m.fit(V, 1, tol=0, max_iter=2)
    finally:
        os.environ.pop("PNT_NMFD_PALLAS", None)

    # the autotuned default at the same shape fits fine (below the FLOP
    # threshold it keeps the static engine without timing anything)
    m2 = NMFD(W=W0, H=H0)
    m2.fit(V, 1, tol=0, max_iter=2)


@pytest.mark.parametrize("beta", [1.0, 2.0, 0.5])
@pytest.mark.slow
def test_nmfd_pallas_batched_matches_unfold(beta):
    """N > 1 NMFD through the segment-stacked fused engine must track
    the unfold trajectories — per-batch T-1 zero separators on the flat
    axis absorb every cross-batch patch/fold read exactly."""
    from pytorch_nmf_tpu.ops.fast_nmfd import (
        nmfd_pallas_interpret_factory,
        nmfd_unfold_updater_factory,
    )
    from pytorch_nmf_tpu.ops.mu import gamma_from_beta
    from pytorch_nmf_tpu.ops.pallas_deconv import deconv_pallas_supported

    def run_iters(factory, V, W, H, beta, n=4):
        upd_W, upd_H, _, prepare, finish = factory(
            beta, gamma_from_beta(beta), 0.0, 0.0
        )
        w, h = (W, H) if prepare is None else prepare(V, W, H)
        for _ in range(n):
            w = upd_W(V, w, h)
            h = upd_H(V, w, h)
        return finish(V, w, h)

    N, C, R, T, L_in = 3, 11, 6, 9, 120  # N·L_in = 360 clears the gate
    Vs = (N, C, L_in + T - 1)
    assert deconv_pallas_supported(Vs, (N, R, L_in), np.float32)
    V = jnp.asarray(RNG.rand(*Vs).astype("f") + 0.01)
    W0 = jnp.asarray(RNG.rand(C, R, T).astype("f") + 0.1)
    H0 = jnp.asarray(RNG.rand(N, R, L_in).astype("f") + 0.1)
    Wp, Hp = run_iters(nmfd_pallas_interpret_factory, V, W0, H0, beta)
    Wu, Hu = run_iters(nmfd_unfold_updater_factory, V, W0, H0, beta)
    assert float(jnp.abs(Wp - Wu).max()) < 1e-4
    assert float(jnp.abs(Hp - Hu).max()) < 1e-4

    # 2-D batched: the cot segments carry kx-1 pad rows to match the
    # stacked activation's stride
    from pytorch_nmf_tpu.ops.fast_nmfd import (
        nmf2d_pallas_interpret_factory,
        nmf2d_unfold_updater_factory,
    )
    from pytorch_nmf_tpu.ops.pallas_deconv import deconv_pallas_nd_supported

    N, C, R = 2, 7, 5
    Y_in, X_in, ky, kx = 12, 14, 3, 4
    Vs2 = (N, C, Y_in + ky - 1, X_in + kx - 1)
    Hs2 = (N, R, Y_in, X_in)
    assert deconv_pallas_nd_supported(Vs2, Hs2, np.float32)
    V2 = jnp.asarray(RNG.rand(*Vs2).astype("f") + 0.01)
    W02 = jnp.asarray(RNG.rand(C, R, ky, kx).astype("f") + 0.1)
    H02 = jnp.asarray(RNG.rand(*Hs2).astype("f") + 0.1)
    Wp, Hp = run_iters(nmf2d_pallas_interpret_factory, V2, W02, H02, beta)
    Wu, Hu = run_iters(nmf2d_unfold_updater_factory, V2, W02, H02, beta)
    assert float(jnp.abs(Wp - Wu).max()) < 1e-4
    assert float(jnp.abs(Hp - Hu).max()) < 1e-4

    if beta == 1.0:
        # 3-D batched (two trailing axes padded per segment)
        from pytorch_nmf_tpu.ops.fast_nmfd import (
            nmf3d_pallas_interpret_factory,
            nmf3d_unfold_updater_factory,
        )

        N, C, R = 2, 5, 4
        Z_in, Y_in3, X_in3, kz, ky3, kx3 = 4, 6, 8, 2, 3, 3
        Vs3 = (N, C, Z_in + kz - 1, Y_in3 + ky3 - 1, X_in3 + kx3 - 1)
        Hs3 = (N, R, Z_in, Y_in3, X_in3)
        assert deconv_pallas_nd_supported(Vs3, Hs3, np.float32)
        V3 = jnp.asarray(RNG.rand(*Vs3).astype("f") + 0.01)
        W03 = jnp.asarray(RNG.rand(C, R, kz, ky3, kx3).astype("f") + 0.1)
        H03 = jnp.asarray(RNG.rand(*Hs3).astype("f") + 0.1)
        Wp, Hp = run_iters(nmf3d_pallas_interpret_factory, V3, W03, H03,
                           beta)
        Wu, Hu = run_iters(nmf3d_unfold_updater_factory, V3, W03, H03,
                           beta)
        assert float(jnp.abs(Wp - Wu).max()) < 1e-4
        assert float(jnp.abs(Hp - Hu).max()) < 1e-4


@pytest.mark.parametrize("beta", [1.0, 2.0])
@pytest.mark.slow
def test_deconv_pallas_w_hybrid_matches_unfold(beta):
    """The hybrid ``"pallas_w"`` mode (fused wgrad + streamed XLA fold)
    must track the unfold engine; its gate accepts exactly the shapes
    the full fused mode rejects on the hgrad VMEM bound."""
    from pytorch_nmf_tpu.ops.fast_nmfd import (
        _PALLAS_W_INTERPRET_FACTORIES,
        nmf2d_unfold_updater_factory,
    )
    from pytorch_nmf_tpu.ops.mu import gamma_from_beta
    from pytorch_nmf_tpu.ops.pallas_deconv import (
        deconv_pallas_nd_supported,
        deconv_pallas_w_supported,
    )

    def run_iters(factory, V, W, H, beta, n=3):
        upd_W, upd_H, _, prepare, finish = factory(
            beta, gamma_from_beta(beta), 0.0, 0.0
        )
        w, h = (W, H) if prepare is None else prepare(V, W, H)
        for _ in range(n):
            w = upd_W(V, w, h)
            h = upd_H(V, w, h)
        return finish(V, w, h)

    N, C, R = 1, 10, 64
    Y_in = X_in = 121
    ky = kx = 8  # flat 121*128 = 15488: full-mode VMEM bound binds at R=64
    Vs = (N, C, Y_in + ky - 1, X_in + kx - 1)
    Hs = (N, R, Y_in, X_in)
    assert not deconv_pallas_nd_supported(Vs, Hs, np.float32)
    assert deconv_pallas_w_supported(Vs, Hs, np.float32)

    V = jnp.asarray(RNG.rand(*Vs).astype("f") + 0.01)
    W0 = jnp.asarray(RNG.rand(C, R, ky, kx).astype("f") + 0.1)
    H0 = jnp.asarray(RNG.rand(*Hs).astype("f") + 0.1)
    Wp, Hp = run_iters(_PALLAS_W_INTERPRET_FACTORIES[2], V, W0, H0, beta)
    Wu, Hu = run_iters(nmf2d_unfold_updater_factory, V, W0, H0, beta)
    assert float(jnp.abs(Wp - Wu).max() / jnp.abs(Wu).max()) < 5e-5
    assert float(jnp.abs(Hp - Hu).max() / jnp.abs(Hu).max()) < 5e-5

    # batched 1-D hybrid: full mode rejected (stacked hgrad residents),
    # W gate accepts — the stacked wgrad + native-batch fold band
    from pytorch_nmf_tpu.ops.fast_nmfd import nmfd_unfold_updater_factory
    from pytorch_nmf_tpu.ops.pallas_deconv import deconv_pallas_supported

    N, C, R, T, L_in = 4, 6, 24, 10, 8000
    Vs1 = (N, C, L_in + T - 1)
    Hs1 = (N, R, L_in)
    assert not deconv_pallas_supported(Vs1, Hs1, np.float32)
    assert deconv_pallas_w_supported(Vs1, Hs1, np.float32)
    V1 = jnp.asarray(RNG.rand(*Vs1).astype("f") + 0.01)
    W01 = jnp.asarray(RNG.rand(C, R, T).astype("f") + 0.1)
    H01 = jnp.asarray(RNG.rand(*Hs1).astype("f") + 0.1)
    Wp, Hp = run_iters(_PALLAS_W_INTERPRET_FACTORIES[1], V1, W01, H01,
                       beta, n=1)
    Wu, Hu = run_iters(nmfd_unfold_updater_factory, V1, W01, H01, beta,
                       n=1)
    assert float(jnp.abs(Wp - Wu).max()) < 1e-4
    assert float(jnp.abs(Hp - Hu).max()) < 1e-4

    # batched 2-D hybrid: segment-stacked wgrad (stride T_geo-1 + flat
    # L_in, the gate's per-batch lp term) + native-batch streamed fold
    N, C, R = 2, 8, 32
    Y_in = X_in = 121
    ky = kx = 8
    Vs2 = (N, C, Y_in + ky - 1, X_in + kx - 1)
    Hs2 = (N, R, Y_in, X_in)
    assert not deconv_pallas_nd_supported(Vs2, Hs2, np.float32)
    assert deconv_pallas_w_supported(Vs2, Hs2, np.float32)
    V2 = jnp.asarray(RNG.rand(*Vs2).astype("f") + 0.01)
    W02 = jnp.asarray(RNG.rand(C, R, ky, kx).astype("f") + 0.1)
    H02 = jnp.asarray(RNG.rand(*Hs2).astype("f") + 0.1)
    Wp, Hp = run_iters(_PALLAS_W_INTERPRET_FACTORIES[2], V2, W02, H02,
                       beta, n=1)
    Wu, Hu = run_iters(nmf2d_unfold_updater_factory, V2, W02, H02, beta,
                       n=1)
    assert float(jnp.abs(Wp - Wu).max() / jnp.abs(Wu).max()) < 5e-5
    assert float(jnp.abs(Hp - Hu).max() / jnp.abs(Hu).max()) < 5e-5


@pytest.mark.slow
def test_deconv_pallas_w_1d_regular_candidate():
    """The 1-D hybrid engine must be admitted even where the full fused
    mode also compiles — full-vs-hybrid dominance is rank-dependent
    (hybrid wins 1.37× at the r8 flagship corner, full wins at r88 —
    tools/measure_1d_modes.py), so both must reach the autotune timing
    loop instead of a static mutual exclusion."""
    from pytorch_nmf_tpu.ops.fast_nmfd import (
        _PALLAS_W_INTERPRET_FACTORIES,
        nmfd_unfold_updater_factory,
    )
    from pytorch_nmf_tpu.ops.mu import gamma_from_beta
    from pytorch_nmf_tpu.ops.pallas_deconv import (
        deconv_pallas_supported,
        deconv_pallas_w_supported,
    )

    N, C, R, T, L_in = 1, 6, 8, 10, 500
    Vs, Hs = (N, C, L_in + T - 1), (N, R, L_in)
    # both gates admit the shape: the old exclusion would have raised
    assert deconv_pallas_supported(Vs, Hs, np.float32)
    assert deconv_pallas_w_supported(Vs, Hs, np.float32)

    V = jnp.asarray(RNG.rand(*Vs).astype("f") + 0.01)
    W0 = jnp.asarray(RNG.rand(C, R, T).astype("f") + 0.1)
    H0 = jnp.asarray(RNG.rand(*Hs).astype("f") + 0.1)

    def run_iters(factory, n=2):
        upd_W, upd_H, _, prepare, finish = factory(
            1.0, gamma_from_beta(1.0), 0.0, 0.0
        )
        w, h = (W0, H0) if prepare is None else prepare(V, W0, H0)
        for _ in range(n):
            w = upd_W(V, w, h)
            h = upd_H(V, w, h)
        return finish(V, w, h)

    Wp, Hp = run_iters(_PALLAS_W_INTERPRET_FACTORIES[1])
    Wu, Hu = run_iters(nmfd_unfold_updater_factory)
    assert float(jnp.abs(Wp - Wu).max() / jnp.abs(Wu).max()) < 5e-5
    assert float(jnp.abs(Hp - Hu).max() / jnp.abs(Hu).max()) < 5e-5


@pytest.mark.parametrize("beta", [1.0, 2.0, 0.5])
@pytest.mark.slow
def test_nmf2d_pallas_engine_matches_unfold(beta):
    """NMF2D fits through the forced flat-offset fused engine
    (interpreter) must track the unfold-engine trajectories."""
    from pytorch_nmf_tpu.nmf import NMF2D

    N, C, R = 1, 7, 6
    Y_in, X_in, ky, kx = 16, 20, 3, 5  # flat L = 16*24 = 384 >= 256
    V = RNG.rand(N, C, Y_in + ky - 1, X_in + kx - 1).astype("f") + 0.01
    W0 = RNG.rand(C, R, ky, kx).astype("f") + 0.1
    H0 = RNG.rand(N, R, Y_in, X_in).astype("f") + 0.1

    os.environ["PNT_NMFD_PALLAS"] = "1"
    try:
        m = NMF2D(W=W0, H=H0)
        m.fit(V, beta, tol=0, max_iter=10)
    finally:
        os.environ.pop("PNT_NMFD_PALLAS", None)
    ref = NMF2D(W=W0, H=H0)
    ref.fit(V, beta, tol=0, max_iter=10)
    dW = float(jnp.abs(m.W.data - ref.W.data).max()
               / jnp.abs(ref.W.data).max())
    dH = float(jnp.abs(m.H.data - ref.H.data).max()
               / jnp.abs(ref.H.data).max())
    assert dW < 5e-5 and dH < 5e-5


@pytest.mark.slow
def test_nmf3d_pallas_engine_matches_unfold():
    """NMF3D through the forced flat-offset fused engine (interpreter)
    must track the unfold-engine trajectory."""
    from pytorch_nmf_tpu.nmf import NMF3D

    N, C, R = 1, 5, 4
    Z_in, Y_in, X_in, kz, ky, kx = 6, 8, 10, 2, 3, 3  # flat 6*10*12 = 720
    V = RNG.rand(
        N, C, Z_in + kz - 1, Y_in + ky - 1, X_in + kx - 1
    ).astype("f") + 0.01
    W0 = RNG.rand(C, R, kz, ky, kx).astype("f") + 0.1
    H0 = RNG.rand(N, R, Z_in, Y_in, X_in).astype("f") + 0.1

    os.environ["PNT_NMFD_PALLAS"] = "1"
    try:
        m = NMF3D(W=W0, H=H0)
        m.fit(V, 1, tol=0, max_iter=10)
    finally:
        os.environ.pop("PNT_NMFD_PALLAS", None)
    ref = NMF3D(W=W0, H=H0)
    ref.fit(V, 1, tol=0, max_iter=10)
    dW = float(jnp.abs(m.W.data - ref.W.data).max()
               / jnp.abs(ref.W.data).max())
    dH = float(jnp.abs(m.H.data - ref.H.data).max()
               / jnp.abs(ref.H.data).max())
    assert dW < 5e-5 and dH < 5e-5


def test_plca_fused_cotangents_match_vjp():
    """The fused PLCA E-step (ops/fast_plca.py) must reproduce the generic
    single-VJP cotangents of ``H @ (W·Z)ᵀ`` with cotangent ``Vn/(WZH+eps)``
    (reference plca.py:252-253)."""
    import jax

    from pytorch_nmf_tpu.ops import recon as _recon
    from pytorch_nmf_tpu.ops.fast_plca import plca_em_engine_interpret

    M2, K2, R2 = 100, 50, 8
    Vn = jnp.asarray(RNG.rand(M2, K2).astype("f"))
    Vn = Vn / jnp.sum(Vn)
    w = jnp.asarray(RNG.rand(K2, R2).astype("f") + 0.05)
    w = w / w.sum(0)
    h = jnp.asarray(RNG.rand(M2, R2).astype("f") + 0.05)
    h = h / h.sum(0)
    z = jnp.asarray(RNG.rand(R2).astype("f") + 0.05)
    z = z / z.sum()

    gH, gW, gZ = plca_em_engine_interpret()(Vn, w, h, z)

    recon3 = lambda hh, ww, zz: _recon.linear(hh, ww * zz)
    WZH, vjp = jax.vjp(recon3, h, w, z)
    rH, rW, rZ = vjp(Vn / (WZH + eps))

    np.testing.assert_allclose(np.asarray(gH), np.asarray(rH), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(gW), np.asarray(rW), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(gZ), np.asarray(rZ), rtol=2e-5)


def test_plca_model_fused_matches_generic():
    """PLCA.fit with the fused E-step engine (opt-in ``PNT_PLCA_FUSED=1``,
    interpreter mode) must track the generic-VJP trajectory; the resolver
    must decline it for custom-reconstruct subclasses and by default (the
    generic path measured faster on v5e — see ops/fast_plca.py)."""
    from pytorch_nmf_tpu.ops.fast_plca import (
        plca_em_engine_interpret,
        resolve_plca_em_engine,
    )
    from pytorch_nmf_tpu.plca import PLCA

    M2, K2, R2 = 60, 40, 6
    V = RNG.rand(M2, K2).astype("f")
    W0 = RNG.rand(K2, R2).astype("f") + 0.1
    H0 = RNG.rand(M2, R2).astype("f") + 0.1
    Z0 = RNG.rand(R2).astype("f") + 0.1

    os.environ["PNT_PLCA_FUSED"] = "1"
    try:
        m = PLCA(W=W0, H=H0, Z=Z0)
        assert (
            m._resolve_em_engine(jnp.asarray(V), False)
            is plca_em_engine_interpret
        )
        n_iter, norm = m.fit(V, tol=0, max_iter=30)
    finally:
        os.environ.pop("PNT_PLCA_FUSED", None)

    ref = PLCA(W=W0, H=H0, Z=Z0)
    # default: measured-rejected on v5e -> generic VJP E-step
    assert ref._resolve_em_engine(jnp.asarray(V), False) is None
    n_ref, norm_ref = ref.fit(V, tol=0, max_iter=30)

    assert n_iter == n_ref
    np.testing.assert_allclose(float(norm), float(norm_ref), rtol=1e-6)
    assert float(jnp.abs(m.W.data - ref.W.data).max()) < 2e-5
    assert float(jnp.abs(m.H.data - ref.H.data).max()) < 2e-5
    assert float(jnp.abs(m.Z.data - ref.Z.data).max()) < 2e-5

    # even opted-in: a user subclass with its own reconstruct must keep
    # the generic VJP, and multi-device / non-f32 targets decline too
    class Custom(PLCA):
        def reconstruct(self, H, W, Z):
            return super().reconstruct(H, W, Z) * 2.0

    os.environ["PNT_PLCA_FUSED"] = "1"
    try:
        c = Custom(W=W0, H=H0, Z=Z0)
        assert c._resolve_em_engine(jnp.asarray(V), False) is None
        assert resolve_plca_em_engine(jnp.asarray(V, jnp.bfloat16)) is None
        assert m._resolve_em_engine(jnp.asarray(V), True) is None
    finally:
        os.environ.pop("PNT_PLCA_FUSED", None)


@pytest.mark.parametrize("model_axis", [None, "model"])
def test_annotation_path_uses_sharded_pallas_factory(model_axis):
    """A multi-device NamedSharding'd NMF fit must route through the
    shard_map'd fused updaters (VERDICT r1 item 6) and keep trajectory
    parity with the single-device fit."""
    import jax
    from jax.sharding import PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from pytorch_nmf_tpu.nmf import NMF
    from pytorch_nmf_tpu.parallel import make_mesh, shard_target
    from pytorch_nmf_tpu.parallel.sharded import _ShardedUpdaterFactory

    M2, K2, R2 = 64, 32, 4
    V = RNG.rand(M2, K2).astype("f")
    W0 = RNG.rand(K2, R2).astype("f") + 0.1
    H0 = RNG.rand(M2, R2).astype("f") + 0.1
    axes = {"data": 4, "model": 2} if model_axis else {"data": 8}
    mesh = make_mesh(axes)

    m = NMF(W=W0, H=H0)
    # the resolver must pick the interned shard_map factory for this sharding
    v_spec = P("data", model_axis) if model_axis else P("data")
    Vs = shard_target(V, mesh, v_spec)
    factory = m._sharded_updater_factory(Vs)
    assert isinstance(factory, _ShardedUpdaterFactory)
    assert factory.use_pallas and factory.interpret  # module env fixture

    m.fit(Vs, 0.5, 0, 5)

    ref = NMF(W=W0, H=H0)
    ref.fit(V, 0.5, 0, 5)
    assert float(jnp.abs(m.W.data - ref.W.data).max()) < 2e-5
    assert float(jnp.abs(m.H.data - ref.H.data).max()) < 2e-5


def test_halo_pallas_mode_models_the_halo_layout(monkeypatch):
    """``halo_pallas_mode`` gates the fused per-shard halo modes on the
    halo solvers' ACTUAL flat layout — which is strictly bigger than the
    single-device layout the ``deconv_pallas*_supported`` gates model
    (leading local axes padded to output widths; per-segment halo
    leads).  Regression: the single-device gates previously stood in
    and admitted VMEM-over-budget halo layouts (a Mosaic scoped-vmem
    OOM the remote compiler can wedge on)."""
    from pytorch_nmf_tpu.ops.pallas_deconv import (
        _ND_HGRAD_SCOPED_BYTES,
        _hgrad_scoped_bytes,
        deconv_pallas_nd_supported,
        deconv_pallas_supported,
        halo_pallas_mode,
    )

    monkeypatch.setenv("PNT_PALLAS_INTERPRET", "1")

    # 2-D, N=2 (batched): the halo layout pads the leading axis to its
    # OUTPUT width (lead_out = 2+4-1 = 5), so the hgrad accumulator
    # covers 2·5·(4096+7) flat rows (~33 MB > the Mosaic bound) while
    # the single-device model passes.  At N=1 the r4 layout keeps the
    # first lead axis unpadded (2·(4096+7) rows, inside the bound), so
    # the full fused mode stands — and PNT_HALO_ND_FIRSTPAD=1 restores
    # the padded pre-r4 accounting (~16.8 MB) and the hybrid fallback.
    lead_in, k0, kx, chunk, R = (2,), 4, 8, 4096, 4
    v_proxy = (1, 64, lead_in[0] + k0 - 1, chunk + kx - 1)
    h_proxy = (1, R) + lead_in + (chunk,)
    assert deconv_pallas_nd_supported(v_proxy, h_proxy, np.float32)
    xa = chunk + kx - 1
    assert _hgrad_scoped_bytes(
        (k0 - 1) * xa + kx, (lead_in[0] + k0 - 1) * xa, R
    ) > _ND_HGRAD_SCOPED_BYTES
    assert halo_pallas_mode(2, 64, lead_in, chunk, (k0, kx), R) \
        == "pallas_w"
    assert halo_pallas_mode(1, 64, lead_in, chunk, (k0, kx), R) \
        == "pallas"
    monkeypatch.setenv("PNT_HALO_ND_FIRSTPAD", "1")
    assert halo_pallas_mode(1, 64, lead_in, chunk, (k0, kx), R) \
        == "pallas_w"
    monkeypatch.delenv("PNT_HALO_ND_FIRSTPAD")

    # 1-D, N=1: the per-shard kernels run over chunk + T - 1 rows (the
    # halo frames are the segment lead); at a boundary shape the
    # single-device model passes while the halo layout crosses the
    # hgrad bound and must fall to the hybrid
    T, R1, chunk1 = 400, 8, 26272
    v1 = (1, 32, chunk1 + T - 1)
    h1 = (1, R1, chunk1)
    assert deconv_pallas_supported(v1, h1, np.float32)
    assert halo_pallas_mode(1, 32, (), chunk1, (T,), R1) == "pallas_w"
    # well inside the bound the full fused mode stands
    assert halo_pallas_mode(1, 32, (), 2048, (T,), R1) == "pallas"

    # batched N-D separator rule lives in the gate: k0 = 1 gives
    # lead_mid = 0 < kx - 1, so N > 1 cannot reuse the middle-axis lead
    # as the W-side separator — N = 1 is unaffected
    assert halo_pallas_mode(1, 16, (6,), 120, (1, 8), 5) is not None
    assert halo_pallas_mode(2, 16, (6,), 120, (1, 8), 5) is None

    # f64 and sub-256 flat lengths keep the XLA per-shard engines
    assert halo_pallas_mode(
        1, 16, (6,), 120, (1, 8), 5, dtype=np.float64
    ) is None
    assert halo_pallas_mode(1, 16, (2,), 100, (2, 8), 5) is None


def test_auto_blocks_counts_rank_residents():
    """The fused-MU block picker budgets the factor/accumulator tiles
    too: at high rank a full-K block that fits by the V/WH tiles alone
    would overflow VMEM (regression: R was ignored, and an R=512 fit
    chose bk=K past the ~16 MB scoped budget)."""
    from pytorch_nmf_tpu.ops.pallas_mu import _auto_blocks

    # reference-benchmark scale keeps the measured-fastest full-K block
    bm, bk = _auto_blocks(5168, 1025, 88)
    assert (bm, bk) == (512, 1025)
    # same (M, K) at R=512: the rank tiles push past the budget
    bm, bk = _auto_blocks(5168, 1900, 512)
    assert bk == 512
    # small problems keep full-dim blocks
    assert _auto_blocks(40, 30, 4) == (40, 30)
