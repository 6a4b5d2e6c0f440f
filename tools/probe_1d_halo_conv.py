#!/usr/bin/env python
"""A/B the 1-D flagship halo's per-shard mode: stream vs split-conv.

The r88/T400 halo row sits at ~1.13x plain; the stream heuristic is
never timed against conv (autotune_halo_mode returns non-"unrolled"
heuristics directly).  With the r5 split conv formulation the conv mode
became a credible candidate, so this probe measures both at the
bench_multichip flagship shape.

MEASURED 2026-08-20 (v5e, n=1, one process): stream 4.4725 vs
split-conv 4.4752 ms/iter — a 0.06% tie.  Two structurally different
engines (hand-differentiated tau-chunk streaming vs implicit-pad conv +
strip GEMM) landing within noise of each other says the residual 1-D
halo tax is not a formulation artifact: it is the n=1 structural work
on the trailing shard pad (H 851 -> 1250 columns at this shape), which
shrinks relatively as pods add devices.  The stream heuristic stands.
"""
import os, sys, json
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PNT_AUTOTUNE_CACHE", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "autotune_cache.json"))
import jax, jax.numpy as jnp
from bench import _marginal_ms_per_iter
from bench_multichip import MC_NMFD_FLAG
from pytorch_nmf_tpu.ops.autotune import enable_compile_cache
from pytorch_nmf_tpu.parallel import make_mesh
from pytorch_nmf_tpu.parallel.halo import _sharded_deconv_fit

enable_compile_cache(os.environ.get(
    "PNT_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache")))
rng = np.random.RandomState(0)
N, C, R, T, L_loc = MC_NMFD_FLAG
n_dev = jax.device_count()
L = L_loc * n_dev
V = jnp.asarray(rng.rand(N, C, L).astype('f'))
W0 = jnp.asarray(rng.rand(C, R, T).astype('f') + 0.1)
H0 = jnp.asarray(rng.rand(N, R, L - T + 1).astype('f') + 0.1)
mesh = make_mesh({"seq": n_dev})

results = {}
for label, env in (("stream_default", {}), ("conv_split", {"PNT_HALO_UNFOLD": "0"})):
    os.environ.pop("PNT_HALO_UNFOLD", None)
    os.environ.update(env)

    def make(n):
        def fit(Vv, Ww, Hh):
            return _sharded_deconv_fit(
                Vv, Ww, Hh, mesh, 1, 1.0, float("-inf"), n, 0.0, 0.0, "seq")
        return fit

    results[label] = _marginal_ms_per_iter(make, (V, W0, H0))
    print(f"[probe] {label}: {results[label]:.4f} ms/iter", file=sys.stderr)
os.environ.pop("PNT_HALO_UNFOLD", None)
print(json.dumps({k: round(v, 5) for k, v in results.items()}))
