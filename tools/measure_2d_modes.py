"""On-device A/B of the NMF2D per-engine candidates at one shape.

Times every applicable deconv engine (unfold / conv / pallas / pallas_w)
for a given 2-D problem in ONE process (CLAUDE.md: A/B within one
process; marginal two-length difference quotient) and prints a JSON
line per candidate.  Default shape is the VMEM-gated fused corner
C=256/r64/128*128/k8x8 where the full fused mode is rejected and the
hybrid ``pallas_w`` is the open question.

Usage::

    python tools/measure_2d_modes.py [C R Y X ky kx beta]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    argv = [float(a) for a in sys.argv[1:]]
    # pad partial overrides with the defaults so e.g. ``C R`` alone works
    defaults = [256, 64, 128, 128, 8, 8]
    C, R, Y, X, ky, kx = (
        [int(a) for a in argv[:6]] + defaults[len(argv[:6]):]
    )
    beta = argv[6] if len(argv) > 6 else 1.0

    import jax.numpy as jnp

    from pytorch_nmf_tpu.ops.autotune import (
        _candidates,
        _time_candidate,
        _timing_loop,
        enable_compile_cache,
    )
    from pytorch_nmf_tpu.ops.mu import gamma_from_beta
    from pytorch_nmf_tpu.models.nmf import NMF2D

    # repo-local cache (shared with bench.py), not cwd-relative
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    enable_compile_cache(os.path.join(repo_root, ".jax_cache"))

    rng = np.random.RandomState(0)
    V = jnp.asarray(rng.rand(1, C, Y + ky - 1, X + kx - 1).astype("f") + 1e-3)
    W = jnp.asarray(rng.rand(C, R, ky, kx).astype("f") + 0.1)
    H = jnp.asarray(rng.rand(1, R, Y, X).astype("f") + 0.1)
    gamma = gamma_from_beta(beta)

    rows = []
    for name, factory in _candidates(beta, 2):
        try:
            updaters = None if factory is None else factory(
                beta, gamma, 0.0, 0.0
            )
            run = _timing_loop(updaters, NMF2D.reconstruct, beta, gamma)
            per = _time_candidate(run, V, W, H)
        except Exception as e:  # shape gates raise for inapplicable modes
            rows.append({"engine": name, "skipped": str(e)[:90]})
            continue
        rows.append({
            "engine": name,
            "ms_per_iter": round(per * 1e3, 5),
            "shape": f"C{C}_r{R}_{Y}x{X}_k{ky}x{kx}_beta{beta:g}",
        })
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
