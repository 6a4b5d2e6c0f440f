"""Smoke-run the benchmark harnesses in tiny mode on the CPU mesh so the
driver-facing scripts cannot rot between (TPU) bench runs."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_multichip_tiny_smoke():
    env = dict(os.environ)
    env["PNT_BENCH_TINY"] = "1"
    env["PNT_FORCE_CPU"] = "1"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench_multichip.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["n_devices"] == 8
    # tiny mode runs one flagship beta only; the TPU run adds beta=2
    assert len(out["grid"]) == 9
    for frag in ("nmf_shard", "nmfd_halo", "nmf2d_halo", "nmf3d_halo",
                 "siplca_em_halo", "plca_em_shard", "sparse_ell_shard"):
        assert any(frag in row["metric"] for row in out["grid"]), frag
    for row in out["grid"]:
        assert row["value"] > 0


def test_bench_tiny_smoke(tmp_path):
    env = dict(os.environ)
    env["PNT_BENCH_TINY"] = "1"
    env["PNT_FORCE_CPU"] = "1"
    # keep the checked-in TPU autotune winners and the repo compile cache
    # out of the smoke run
    env["PNT_AUTOTUNE_CACHE"] = str(tmp_path / "autotune_cache.json")
    env["PNT_COMPILE_CACHE"] = str(tmp_path / "jax_cache")
    # live sklearn oracle: exercised when sklearn is importable (the flag
    # must skip cleanly where it is not — both paths are covered by CI
    # environments with/without sklearn)
    try:
        import sklearn  # noqa: F401

        have_sklearn = True
    except ImportError:
        have_sklearn = False
    args = [sys.executable, os.path.join(REPO, "bench.py"), "--with-sklearn"]
    proc = subprocess.run(
        args, env=env, cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["value"] > 0
    metrics = {row["metric"] for row in out["grid"]}
    # one row per benchmark family must be present in tiny mode too
    for frag in ("nmf_dense", "nmf_sparse_mu", "nmf_sparse_ell", "nmfd_dense",
                 "nmf2d_dense", "nmf_hoyer", "betamu_chain_step",
                 "betamu_chain_run", "siplca_em", "nmf_streaming",
                 "nmf_checkpointed_fit_overhead"):
        assert any(frag in m for m in metrics), (frag, metrics)
    for row in out["grid"]:
        assert row["value"] > 0, row
    sparse_rows = [r for r in out["grid"] if "nmf_sparse_mu" in r["metric"]]
    if have_sklearn:
        assert all("sklearn_live_ms" in r and r["sklearn_live_ms"] > 0
                   for r in sparse_rows), sparse_rows
        assert all("vs_sklearn_live" in r for r in sparse_rows)
    else:
        assert all("sklearn_live_ms" not in r for r in sparse_rows)
