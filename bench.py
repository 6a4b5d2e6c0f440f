#!/usr/bin/env python
"""Headline benchmark: dense NMF multiplicative-update iteration time.

Reproduces the reference's benchmark configuration
(examples/benchmarks/benchmark.ipynb: V = 5168x1025 spectrogram-sized
matrix, rank 88, beta=1 KL) and reports milliseconds per MU iteration on
the available accelerator.

Baseline: the reference (torchnmf v0.3.4) on an RTX 3070 measures
0.00131 s/iter at beta=1 (BASELINE.md).  ``vs_baseline`` is the speedup
factor over that number (>1 means faster).

Prints exactly one JSON line:
  {"metric": ..., "value": ..., "unit": "ms/iter", "vs_baseline": ...}
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pytorch_nmf_tpu.models.nmf import NMF
    from pytorch_nmf_tpu.ops.fast_nmf import nmf_updater_factory
    from pytorch_nmf_tpu.ops.solver import get_dense_fit

    M, K, R = 5168, 1025, 88
    BETA = 1.0
    BASELINE_MS = 1.31  # torchnmf CUDA RTX 3070, beta=1 (BASELINE.md)

    rng = np.random.RandomState(0)
    V = jnp.asarray(rng.rand(M, K).astype("f"))
    W = jnp.asarray(rng.rand(K, R).astype("f") + 0.1)
    H = jnp.asarray(rng.rand(M, R).astype("f") + 0.1)

    # Each dispatch through the (relay-attached) TPU runtime carries a
    # large fixed latency (~35 ms here) that is not device compute.  The
    # honest per-iteration cost is the MARGINAL rate: time the same fit at
    # two loop lengths and divide the difference — fixed overhead cancels.
    ITERS_SHORT = 100
    ITERS_LONG = 1000

    def timed(iters):
        fit = get_dense_fit(
            NMF.reconstruct, BETA, 0.0, iters, True, True, 0.0, 0.0, False,
            nmf_updater_factory,
        )
        for _ in range(2):  # compile + relay first-execution warmup
            out = fit(V, W, H)
            np.asarray(out[0])
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fit(V, W, H)
            np.asarray(out[0])
            times.append(time.perf_counter() - t0)
        return min(times)

    t_short = timed(ITERS_SHORT)
    t_long = timed(ITERS_LONG)
    ms_per_iter = (t_long - t_short) / (ITERS_LONG - ITERS_SHORT) * 1000.0
    print(
        json.dumps(
            {
                "metric": f"nmf_dense_mu_iter_{M}x{K}_r{R}_beta1",
                "value": round(ms_per_iter, 5),
                "unit": "ms/iter",
                "vs_baseline": round(BASELINE_MS / ms_per_iter, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
