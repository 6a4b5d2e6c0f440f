"""Benchmark grid reproducing the reference's benchmark notebook.

The reference measures seconds/iteration of dense and sparse (top-2% COO)
NMF at V = 5168x1025, rank 88, over a β grid, against sklearn's MU solver
(examples/benchmarks/benchmark.ipynb; numbers recorded in BASELINE.md).
This script runs the same grid on whatever accelerator JAX sees, and — when
the upstream torch implementation is importable — the reference CPU numbers
side by side.

Run:  python examples/benchmarks/benchmark.py [--quick]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def _time_fit_total(make_fit, args, iters):
    fit = make_fit(iters)
    out = fit(*args)
    np.asarray(out[0])
    out = fit(*args)
    np.asarray(out[0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fit(*args)
        np.asarray(out[0])
        times.append(time.perf_counter() - t0)
    return min(times)


def time_ours(V, W0, H0, beta, iters, sparse=None):
    """Marginal per-iteration rate: the same two-loop-length difference
    quotient as bench.py, so the fixed per-dispatch relay latency (~35-40 ms
    on the axon TPU) is measured out instead of being smeared into the
    figure."""
    from pytorch_nmf_tpu.models.nmf import NMF
    from pytorch_nmf_tpu.ops.fast_nmf import resolve_nmf_updater_factory
    from pytorch_nmf_tpu.ops.solver import get_dense_fit, get_sparse_fit
    from pytorch_nmf_tpu.ops.sparse import nmf_sp_pos_neg

    if sparse is not None:
        def make_fit(n):
            return get_sparse_fit(
                nmf_sp_pos_neg, float(beta), 0.0, n, True, True, 0.0, 0.0
            )

        args = (sparse, W0, H0)
    else:
        factory = resolve_nmf_updater_factory()

        def make_fit(n):
            return get_dense_fit(
                NMF.reconstruct, float(beta), 0.0, n, True, True, 0.0, 0.0,
                False, factory,
            )

        args = (V, W0, H0)

    short = max(iters // 10, 1)
    t_short = _time_fit_total(make_fit, args, short)
    t_long = _time_fit_total(make_fit, args, iters)
    return (t_long - t_short) / (iters - short)


def time_torch_reference(V, W0, H0, beta, iters):
    try:
        import sys

        sys.path.insert(0, "/root/reference")
        import torch
        from torchnmf.nmf import NMF as TNMF
    except ImportError:
        return None
    m = TNMF(W=torch.tensor(np.asarray(W0)), H=torch.tensor(np.asarray(H0)))
    Vt = torch.tensor(V)
    m.fit(Vt, beta, 0, 2)  # warm
    t0 = time.perf_counter()
    m.fit(Vt, beta, 0, iters)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="smaller problem")
    ap.add_argument("--with-torch", action="store_true",
                    help="also time the upstream torch CPU implementation")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pytorch_nmf_tpu.ops.sparse import sparse_from_dense

    if args.quick:
        M, K, R, iters = 1024, 512, 32, 30
    else:
        M, K, R, iters = 5168, 1025, 88, 60

    rng = np.random.RandomState(0)
    V = rng.rand(M, K).astype("f")
    W0 = jnp.asarray(rng.rand(K, R).astype("f") + 0.1)
    H0 = jnp.asarray(rng.rand(M, R).astype("f") + 0.1)
    thr = float(np.quantile(V, 0.98))
    V_sp = sparse_from_dense(np.where(V > thr, V, 0))
    Vj = jnp.asarray(V)

    dev = jax.devices()[0]
    print(f"device: {dev}, V {M}x{K} rank {R}, {iters} iters/measurement\n")
    print(f"{'workload':<16}{'beta':>6}{'ours (s/iter)':>16}"
          f"{'torch CPU (s/iter)':>20}")
    for beta in [0, 0.5, 1, 1.5, 2]:
        ours = time_ours(Vj + (0.01 if beta <= 0 else 0), W0, H0, beta, iters)
        ref = (
            time_torch_reference(V + (0.01 if beta <= 0 else 0),
                                 W0, H0, beta, iters)
            if args.with_torch else None
        )
        print(f"{'dense':<16}{beta:>6}{ours:>16.5f}"
              f"{(f'{ref:.5f}' if ref else '-'):>20}")
    for beta in [0.5, 1, 1.5, 2]:
        ours = time_ours(None, W0, H0, beta, iters, sparse=V_sp)
        print(f"{'sparse (2% nnz)':<16}{beta:>6}{ours:>16.5f}{'-':>20}")


if __name__ == "__main__":
    main()
