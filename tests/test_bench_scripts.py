"""Smoke-run the benchmark harnesses in tiny mode on the CPU mesh so the
driver-facing scripts cannot rot between (TPU) bench runs."""

import json
import os
import subprocess

import pytest
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
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


def _tiny_env(tmp_path):
    env = dict(os.environ)
    env["PNT_BENCH_TINY"] = "1"
    env["PNT_FORCE_CPU"] = "1"
    # keep the checked-in TPU autotune winners and the repo compile cache
    # out of the smoke run
    env["PNT_AUTOTUNE_CACHE"] = str(tmp_path / "autotune_cache.json")
    env["PNT_COMPILE_CACHE"] = str(tmp_path / "jax_cache")
    return env


@pytest.mark.slow
def test_bench_tiny_smoke(tmp_path):
    env = _tiny_env(tmp_path)
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
    # roofline fields ride every compute-shaped row (MFU itself is
    # TPU-only, so the CPU smoke sees model_tflops without mfu_vs_peak)
    shaped = [r for r in out["grid"]
              if r["metric"].startswith(("nmf_dense", "nmfd_dense",
                                         "nmf2d_dense", "nmf3d_dense"))]
    assert shaped and all(r["model_tflops"] > 0 for r in shaped)
    assert all("mfu_vs_peak" not in r for r in shaped)
    # live torch-CPU oracle on the reference-scale dense rows (torch and
    # the reference library are importable in this environment)
    try:
        sys.path.insert(0, "/root/reference")
        import torch  # noqa: F401
        import torchnmf  # noqa: F401

        have_torch = True
    except ImportError:
        have_torch = False
    ref_dense = [r for r in out["grid"]
                 if r["metric"].startswith("nmf_dense_mu_iter_96x48")]
    assert ref_dense
    if have_torch:
        assert all(r["torch_cpu_live_ms"] > 0 and "vs_torch_cpu_live" in r
                   for r in ref_dense), ref_dense
    # bookkeeping fields from the budget/signal-safe runner
    assert out["elapsed_s"] >= 0
    assert all(row["t_s"] >= 0 for row in out["grid"])
    assert "truncated" not in out and "stopped_early" not in out
    # family-coverage-first ordering: every family's representative row
    # precedes the deferred beta variants (here: the checkpoint row, the
    # last coverage row, must come before the deferred dense beta=0 one)
    order = [r["metric"] for r in out["grid"]]
    i_cov = next(i for i, m in enumerate(order) if "checkpointed" in m)
    i_var = next(
        i for i, m in enumerate(order)
        if m.startswith("nmf_dense") and m.endswith("beta0")
    )
    assert i_cov < i_var, order


def test_bench_budget_truncation(tmp_path):
    """A 1-second budget still yields the headline row plus an explicit
    truncated list — the driver-timeout contract (VERDICT r4 item 1)."""
    env = _tiny_env(tmp_path)
    env["PNT_BENCH_BUDGET_S"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--no-sklearn", "--no-torch"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    # the headline row always runs, budget notwithstanding
    assert out["grid"] and out["grid"][0]["metric"].startswith(
        "nmf_dense_mu_iter_96x48_r8_beta1")
    assert out["metric"] == out["grid"][0]["metric"]
    assert out["value"] > 0
    assert out["truncated"], out
    assert "nmf_checkpointed_fit_overhead" in out["truncated"]


def test_bench_sigterm_partial_dump(tmp_path):
    """SIGTERM mid-run dumps the partial JSON and exits 0 — what the
    driver's kill timer sends first (VERDICT r4 item 1)."""
    import signal as _signal
    import time as _time

    env = _tiny_env(tmp_path)
    sentinel = tmp_path / "first_row_done"
    env["PNT_BENCH_TEST_HANG"] = str(sentinel)
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--no-sklearn", "--no-torch"],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True,
    )
    try:
        deadline = _time.monotonic() + 600
        while not sentinel.exists():
            assert proc.poll() is None, proc.stderr.read()[-3000:]
            assert _time.monotonic() < deadline, "bench never hit row 1"
            _time.sleep(0.2)
        proc.send_signal(_signal.SIGTERM)
        stdout, stderr = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
    assert proc.returncode == 0, stderr[-3000:]
    out = json.loads(stdout.strip().splitlines()[-1])
    assert out["stopped_early"].startswith("signal")
    assert len(out["grid"]) == 1 and out["grid"][0]["value"] > 0


@pytest.mark.slow
def test_pretune_tool_tiny_smoke(tmp_path):
    """tools/pretune_bench_shapes.py resolves every bench-table shape
    (tiny variants on the CPU mesh) and exits cleanly."""
    env = _tiny_env(tmp_path)
    env["PNT_PRETUNE_TINY"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "pretune_bench_shapes.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = proc.stdout.strip().splitlines()
    assert any(line.startswith("[pretune] resolved") for line in lines)
    # every bench family is touched: nmfd/nmf2d/nmf3d engines, the PLCA
    # EM recons, and the halo fits
    for frag in ("nmfd", "nmf2d", "nmf3d", "siplca", "siplca2", "halo"):
        assert any(f"[pretune] {frag}:" in line for line in lines), frag
