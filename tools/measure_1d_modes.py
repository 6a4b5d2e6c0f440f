"""On-device A/B of the NMFD (1-D deconv) per-engine candidates.

Times every applicable deconv engine (unfold / conv / pallas /
pallas_w / autocorr / fft where offered) for a given 1-D problem in ONE
process (CLAUDE.md: A/B within one process; marginal two-length
difference quotient) and prints a JSON line per candidate.  Default
shape is the low-rank flagship corner C=1025/r8/T400/L5000 (the
reference's librosa workload, torchnmf nmf.py:704-763) where the fused
kernels' per-dot M = R starves the MXU.

``--force-hybrid`` is HISTORICAL (pre-r4 reproduction only): it stubs the
full-mode predicate so ``pallas_w`` is admitted where the full fused mode
compiles.  Since r4 the 1-D mutual-exclusion gate is gone —
``fast_nmfd._deconv_pallas_updater_factory::_dims`` admits ``pallas_w``
wherever its own VMEM gate passes — so the default candidate sweep
already times the hybrid un-stubbed and the flag is a no-op for current
behavior.

Usage::

    python tools/measure_1d_modes.py [C R L_out T beta] [--force-hybrid]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    force_hybrid = "--force-hybrid" in sys.argv[1:]
    vals = [float(a) for a in argv]
    defaults = [1025, 8, 5000, 400]
    C, R, L_out, T = (
        [int(a) for a in vals[:4]] + defaults[len(vals[:4]):]
    )
    beta = vals[4] if len(vals) > 4 else 1.0

    import jax.numpy as jnp

    from pytorch_nmf_tpu.ops.autotune import (
        _candidates,
        _time_candidate,
        _timing_loop,
        enable_compile_cache,
    )
    from pytorch_nmf_tpu.ops.mu import gamma_from_beta
    from pytorch_nmf_tpu.models.nmf import NMFD

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    enable_compile_cache(os.path.join(repo_root, ".jax_cache"))

    if force_hybrid:
        # measurement-only: make the 1-D hybrid gate (not full_ok and
        # w_ok) admit the shape by stubbing the full-mode predicate the
        # factory resolves at call time from the pallas_deconv module;
        # the pallas candidate itself is timed un-stubbed first below.
        from pytorch_nmf_tpu.ops import pallas_deconv as _pd

        _real_full = _pd.deconv_pallas_supported

    rng = np.random.RandomState(0)
    L_in = L_out - T + 1
    V = jnp.asarray(rng.rand(1, C, L_out).astype("f") + 1e-3)
    W = jnp.asarray(rng.rand(C, R, T).astype("f") + 0.1)
    H = jnp.asarray(rng.rand(1, R, L_in).astype("f") + 0.1)
    gamma = gamma_from_beta(beta)

    rows = []
    for name, factory in _candidates(beta, 1):
        patched = force_hybrid and name == "pallas_w"
        if patched:
            from pytorch_nmf_tpu.ops import pallas_deconv as _pd

            _pd.deconv_pallas_supported = lambda *a, **k: False
        try:
            updaters = None if factory is None else factory(
                beta, gamma, 0.0, 0.0
            )
            run = _timing_loop(updaters, NMFD.reconstruct, beta, gamma)
            per = _time_candidate(run, V, W, H)
        except Exception as e:  # shape gates raise for inapplicable modes
            rows.append({"engine": name, "skipped": str(e)[:90]})
            continue
        finally:
            if patched:
                _pd.deconv_pallas_supported = _real_full
        rows.append({
            "engine": name + ("(forced)" if patched else ""),
            "ms_per_iter": round(per * 1e3, 5),
            "shape": f"C{C}_r{R}_L{L_out}_T{T}_beta{beta:g}",
        })
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
