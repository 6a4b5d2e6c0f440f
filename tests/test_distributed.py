"""Multi-PROCESS (pod-story) test: ``distributed.initialize`` +
``global_mesh`` + one sharded NMF fit across 2 real processes.

Each process owns 4 virtual CPU devices; gloo provides the cross-process
collectives.  The result must match the single-process trajectory computed
in the parent (the explicit shard_map solver is already single-device
parity-tested; here the point is that the SAME code runs multi-process).
"""

import os
import socket
import subprocess
import sys
import tempfile
import textwrap

import numpy as np
import pytest

_CHILD = textwrap.dedent(
    """
    import os, sys
    import numpy as np

    pid = int(sys.argv[1]); port = sys.argv[2]; out_npz = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from pytorch_nmf_tpu.parallel import distributed
    from pytorch_nmf_tpu.parallel.sharded import _get_sharded_nmf_fit
    from jax.sharding import NamedSharding, PartitionSpec as P

    distributed.initialize(f"127.0.0.1:{port}", 2, pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    mesh = distributed.global_mesh({"data": 8})

    data = np.load(out_npz)
    V, W0, H0, W_ref, H_ref = (
        data["V"], data["W0"], data["H0"], data["W_ref"], data["H_ref"]
    )
    M = V.shape[0]
    rows = slice(pid * M // 2, (pid + 1) * M // 2)

    v_sh = NamedSharding(mesh, P("data"))
    h_sh = NamedSharding(mesh, P("data", None))
    r_sh = NamedSharding(mesh, P())
    Vg = jax.make_array_from_process_local_data(v_sh, V[rows])
    Hg = jax.make_array_from_process_local_data(h_sh, H0[rows])
    Wg = jax.make_array_from_process_local_data(r_sh, W0)

    fit = _get_sharded_nmf_fit(
        mesh, 1.0, 0.0, 5, 0.0, 0.0, "data", None, False
    )
    W_out, H_out, n_iter = fit(Vg, Wg, Hg)
    assert int(n_iter) == 5

    W_local = np.asarray(W_out.addressable_data(0))  # replicated
    assert np.abs(W_local - W_ref).max() < 2e-5, np.abs(W_local - W_ref).max()
    # this process's H shards must match the reference rows
    H_local = np.concatenate(
        [np.asarray(s.data) for s in sorted(
            H_out.addressable_shards, key=lambda s: s.index[0].start or 0
        )]
    )
    assert np.abs(H_local - H_ref[rows]).max() < 2e-5

    # ---- distributed SPARSE fit (row-sharded dual-ELL) across processes:
    # both processes build the full stacked layouts host-side and feed the
    # rows their devices own
    from pytorch_nmf_tpu.ops.sparse import get_V_norm, sparse_from_dense
    from pytorch_nmf_tpu.parallel.sharded_sparse import (
        _build_sharded_ell, _get_sharded_sparse_fit,
    )

    V_sp = sparse_from_dense(np.where(V > 0.8, V, 0))
    (row_idx, row_val, col_idx, col_val, row_rem, col_rem, n_real,
     M_loc) = _build_sharded_ell(V_sp, 8)
    Hp = np.pad(H0, ((0, 8 * M_loc - M), (0, 0)))

    def half(a):
        per = a.shape[0] // 8
        return a[pid * 4 * per:(pid + 1) * 4 * per]

    def gput(a, spec):
        sh = NamedSharding(mesh, spec)
        if spec == P():
            return jax.make_array_from_process_local_data(sh, np.asarray(a))
        return jax.make_array_from_process_local_data(sh, half(np.asarray(a)))

    row_spec = P("data", None)
    args = (
        gput(row_idx, row_spec), gput(row_val, row_spec),
        gput(col_idx, row_spec), gput(col_val, row_spec),
        tuple(gput(r, P("data")) for r in row_rem),
        tuple(gput(r, P("data")) for r in col_rem),
        gput(n_real, P("data")),
        gput(np.float32(get_V_norm(V_sp, 1.0)), P()),
        gput(W0, P()),
        gput(Hp, row_spec),
    )
    fit_sp = _get_sharded_sparse_fit(mesh, 1.0, 0.0, 5, 0.0, 0.0, "data")
    W_sp, Hp_sp, n_sp = fit_sp(*args)
    assert int(n_sp) == 5
    W_sp_local = np.asarray(W_sp.addressable_data(0))
    assert np.abs(W_sp_local - data["W_sp_ref"]).max() < 2e-5, \
        np.abs(W_sp_local - data["W_sp_ref"]).max()
    print("child", pid, "ok", flush=True)
    """
)


@pytest.mark.skipif(
    os.environ.get("PNT_SKIP_MULTIPROC") == "1",
    reason="multi-process test disabled",
)
@pytest.mark.slow
def test_two_process_sharded_fit(tmp_path):
    rng = np.random.RandomState(13)
    M, K, R = 32, 12, 4
    V = rng.rand(M, K).astype("f")
    W0 = rng.rand(K, R).astype("f") + 0.1
    H0 = rng.rand(M, R).astype("f") + 0.1

    # single-process reference trajectory (same solver semantics)
    from pytorch_nmf_tpu.nmf import NMF

    ref = NMF(W=W0, H=H0)
    ref.fit(V, 1, 0, 5)
    W_ref = np.asarray(ref.W.data)
    H_ref = np.asarray(ref.H.data)

    # single-process ELL reference for the distributed sparse leg
    from pytorch_nmf_tpu.functional import nmf_fit
    from pytorch_nmf_tpu.ops.sparse import sparse_from_dense

    os.environ["PNT_SPARSE_DENSIFY"] = "0"
    os.environ["PNT_SPARSE_ELL"] = "1"
    try:
        W_sp_ref, _, _ = nmf_fit(
            sparse_from_dense(np.where(V > 0.8, V, 0)), W0, H0,
            beta=1, tol=0, max_iter=5,
        )
    finally:
        os.environ.pop("PNT_SPARSE_DENSIFY", None)
        os.environ.pop("PNT_SPARSE_ELL", None)

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    npz = os.path.join(str(tmp_path), "data.npz")
    np.savez(npz, V=V, W0=W0, H0=H0, W_ref=W_ref, H_ref=H_ref,
             W_sp_ref=np.asarray(W_sp_ref))

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PNT_PALLAS_INTERPRET")
    }
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD, str(i), str(port), npz],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo_root,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert f"child {i} ok" in out
