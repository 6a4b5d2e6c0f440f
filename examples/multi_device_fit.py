"""Multi-device NMF: data x model mesh with explicit collectives.

Demonstrates the two sharding paths on whatever devices are available
(8 virtual CPU devices when run without TPUs — set
``XLA_FLAGS=--xla_force_host_platform_device_count=8``):

1. the explicit shard_map solver (psum-reduced MU contractions), and
2. the GSPMD annotation path (same jitted solver, sharded inputs),

then cross-checks both against a single-device fit.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      JAX_PLATFORMS=cpu python examples/multi_device_fit.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    import pytorch_nmf_tpu as pnt
    from pytorch_nmf_tpu.nmf import NMF
    from pytorch_nmf_tpu.parallel import (
        make_mesh,
        shard_target,
        sharded_nmf_fit,
    )

    n = len(jax.devices())
    print(f"{n} devices: {jax.devices()[0].platform}")
    if n % 2 == 0 and n > 2:
        mesh = make_mesh({"data": n // 2, "model": 2})
        model_axis = "model"
    else:
        mesh = make_mesh({"data": n})
        model_axis = None

    rng = np.random.RandomState(0)
    M, K, R = 512, 256, 16
    V = rng.rand(M, K).astype("f")
    W0 = rng.rand(K, R).astype("f") + 0.1
    H0 = rng.rand(M, R).astype("f") + 0.1

    # 1. explicit collectives
    W1, H1, n_iter = sharded_nmf_fit(
        V, W0, H0, mesh, beta=1, tol=1e-4, max_iter=200,
        model_axis=model_axis,
    )
    print(f"shard_map fit: {int(n_iter)} iterations")

    # 2. GSPMD annotation path
    m = NMF(W=W0, H=H0)
    m.H.data = shard_target(H0, mesh, P("data", None))
    m.fit(shard_target(V, mesh, P("data")), 1, 1e-4, 200)

    # 3. single-device reference
    ref = NMF(W=W0, H=H0)
    ref.fit(V, 1, 1e-4, 200)

    print(
        "max |Δ| explicit vs single:",
        float(jnp.abs(W1 - ref.W.data).max()),
    )
    print(
        "max |Δ| GSPMD    vs single:",
        float(jnp.abs(m.W.data - ref.W.data).max()),
    )

    # 4. distributed SPARSE target: rows sharded, dual-ELL per shard
    from pytorch_nmf_tpu.parallel import sharded_sparse_nmf_fit

    dmesh = make_mesh({"data": n})
    V_sp = pnt.sparse_from_dense(np.where(V > 0.9, V, 0))
    Wsp, Hsp, n_sp = sharded_sparse_nmf_fit(
        V_sp, W0, H0, dmesh, beta=1, tol=1e-4, max_iter=200
    )
    print(f"sharded sparse fit: {int(n_sp)} iterations")

    # 5. sequence-parallel deconvolution (halo exchange) — MU and EM
    from pytorch_nmf_tpu.parallel import sharded_nmfd_fit, sharded_siplca_fit
    from pytorch_nmf_tpu.plca import SIPLCA

    seq_mesh = make_mesh({"seq": n})
    N, C, L_out, T = 1, 32, 16 * n, 6
    Vc = rng.rand(N, C, L_out).astype("f")
    Wc = rng.rand(C, R, T).astype("f") + 0.1
    Hc = rng.rand(N, R, L_out - T + 1).astype("f") + 0.1
    Wd, Hd, n_halo = sharded_nmfd_fit(
        Vc, Wc, Hc, seq_mesh, beta=1, tol=1e-4, max_iter=200
    )
    print(f"halo NMFD fit: {int(n_halo)} iterations")

    # ...or, equivalently, through the MODEL API: a trailing-axis
    # NamedSharding on the target auto-routes fit() to the same halo
    # solver (nothing else to change — the multi-chip analog of the
    # reference's single .cuda() call)
    from pytorch_nmf_tpu.nmf import NMFD

    md = NMFD(W=Wc, H=Hc)
    md.fit(shard_target(Vc, seq_mesh, P(None, None, "seq")), 1, 1e-4, 200)
    print(
        "model-API halo route matches sharded_nmfd_fit:",
        bool(jnp.all(md.W.data == Wd)),
    )

    sip = SIPLCA(Vc.shape, R, T=T)
    _, _, _, n_em, _ = sharded_siplca_fit(
        Vc, np.asarray(sip.W.data), np.asarray(sip.H.data),
        np.asarray(sip.Z.data), seq_mesh, tol=1e-4, max_iter=200,
    )
    print(f"halo SIPLCA EM: {int(n_em) + 1} iterations")


if __name__ == "__main__":
    # honor JAX_PLATFORMS=cpu even where a site plugin (axon) registers
    # another backend at interpreter start — the config call wins
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    main()
