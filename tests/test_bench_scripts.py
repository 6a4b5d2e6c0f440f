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
    assert len(out["grid"]) == 5
    assert any("nmf2d_halo" in row["metric"] for row in out["grid"])
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
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["value"] > 0
    metrics = {row["metric"] for row in out["grid"]}
    # one row per benchmark family must be present in tiny mode too
    for frag in ("nmf_dense", "nmf_sparse_mu", "nmf_sparse_ell", "nmfd_dense",
                 "nmf2d_dense", "nmf_hoyer", "betamu_chain_step",
                 "betamu_chain_run", "siplca_em"):
        assert any(frag in m for m in metrics), (frag, metrics)
    for row in out["grid"]:
        assert row["value"] > 0, row
