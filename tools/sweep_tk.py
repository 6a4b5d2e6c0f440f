"""Flat-τ tile-size (Tk) sweep for the fused deconv kernels.

Run ON TPU (takes the real device): times one full MU iteration of the
1-D flagship shape (C=1025, L=5000, R=88, T=400) and the NMF2D
fused-kernel shape (C=256, r64, 64², k8²) for each candidate
``PNT_PALLAS_TK`` in a fresh subprocess (the constant is read at import).

Usage::

    python tools/sweep_tk.py            # sweep 8 16 24 32
    python tools/sweep_tk.py 16 32      # explicit candidates

The measured default is Tk=16; adopt a different value only if a
candidate wins by >5% on BOTH shapes (relay session variance is ±15% —
A/B within one process per CLAUDE.md, which is why each candidate's two
shapes run in the same subprocess)."""

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) if "__file__" in dir() else ".")
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from pytorch_nmf_tpu.ops.autotune import enable_compile_cache
enable_compile_cache(os.path.join(os.getcwd(), ".jax_cache"))
from pytorch_nmf_tpu.ops.fast_nmfd import (
    _PALLAS_FACTORIES, _PALLAS_INTERPRET_FACTORIES,
)
from pytorch_nmf_tpu.ops.mu import gamma_from_beta
from pytorch_nmf_tpu.ops.pallas_mu import _interpret_mode
import time

def marginal_ms(factory, V, W, H, beta):
    upd_W, upd_H, _, prepare, _ = factory(beta, gamma_from_beta(beta), 0.0, 0.0)
    def run(V, W, H, n):
        s0 = (W, H) if prepare is None else prepare(V, W, H)
        def body(i, s):
            w, h = s
            return upd_W(V, w, h), upd_H(V, w, h)
        w, h = lax.fori_loop(0, n, body, s0)
        return h.ravel()[0]
    run = jax.jit(run)
    def timed(n, k=3):
        best = float("inf")
        for _ in range(k):
            t0 = time.perf_counter()
            float(run(V, W, H, jnp.int32(n)))
            best = min(best, time.perf_counter() - t0)
        return best
    timed(2, k=2)
    n_long, n_short = 64, 16
    d = timed(n_long) - timed(n_short)
    return d / (n_long - n_short) * 1000.0

facs = _PALLAS_INTERPRET_FACTORIES if _interpret_mode() else _PALLAS_FACTORIES
rng = np.random.RandomState(0)
out = {"tk": int(os.environ.get("PNT_PALLAS_TK", "16"))}
V = jnp.asarray(rng.rand(1, 1025, 5000).astype("f") + 0.01)
W = jnp.asarray(rng.rand(1025, 88, 400).astype("f") + 0.1)
H = jnp.asarray(rng.rand(1, 88, 4601).astype("f") + 0.1)
out["nmfd_beta1_ms"] = marginal_ms(facs[1], V, W, H, 1.0)
V2 = jnp.asarray(rng.rand(1, 256, 64, 64).astype("f") + 0.01)
W2 = jnp.asarray(rng.rand(256, 64, 8, 8).astype("f") + 0.1)
H2 = jnp.asarray(rng.rand(1, 64, 57, 57).astype("f") + 0.1)
out["nmf2d_beta1_ms"] = marginal_ms(facs[2], V2, W2, H2, 1.0)
print(json.dumps(out))
"""


def main():
    cands = [int(a) for a in sys.argv[1:]] or [8, 16, 24, 32]
    results = []
    for tk in cands:
        env = dict(os.environ, PNT_PALLAS_TK=str(tk))
        r = subprocess.run(
            [sys.executable, "-c", _CHILD], env=env, capture_output=True,
            text=True, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
        )
        line = (r.stdout.strip().splitlines() or ["{}"])[-1]
        try:
            results.append(json.loads(line))
        except ValueError:
            print(f"Tk={tk} FAILED:\n{r.stderr[-2000:]}", file=sys.stderr)
    for row in results:
        print(json.dumps(row))


if __name__ == "__main__":
    main()
