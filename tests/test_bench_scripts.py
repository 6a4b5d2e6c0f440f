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
    assert len(out["grid"]) == 3
    for row in out["grid"]:
        assert row["value"] > 0
