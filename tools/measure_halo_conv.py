"""On-device A/B of the halo conv trailing-axis formulation.

Times the n=1 sharded 2-D (or 3-D) deconv fit with the conv per-shard
mode under both trailing-axis formulations — VALID on the halo'd input
(default) vs symmetric full padding + static slice (``PNT_HALO_CONV=
sym``) — in ONE process (CLAUDE.md: A/B within one process; marginal
two-length difference quotient).  The sym variant computes ~2(T-1)/chunk
more output columns but may pick up the faster all-symmetric XLA:TPU
conv lowering the single-device solvers enjoy; this tool decides.

Usage::

    python tools/measure_halo_conv.py [nd]   # nd in (2, 3), default 2
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    nd = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    import jax.numpy as jnp

    from bench import _marginal_ms_per_iter
    from pytorch_nmf_tpu.ops.autotune import enable_compile_cache
    from pytorch_nmf_tpu.parallel import halo, make_mesh

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    enable_compile_cache(os.path.join(repo_root, ".jax_cache"))

    mesh = make_mesh({"seq": 1})
    rng = np.random.RandomState(0)
    if nd == 2:
        # the bench_multichip NMF2D halo row's shape
        C, R, Y, ky, kx, L = 256, 64, 121, 8, 8, 128
        V = rng.rand(1, C, Y + ky - 1, L).astype("f")
        W0 = rng.rand(C, R, ky, kx).astype("f") + 0.1
        H0 = rng.rand(1, R, Y, L - kx + 1).astype("f") + 0.1
    else:
        # the bench_multichip NMF3D halo row's shape
        C, R, k, S, L = 64, 16, (4, 4, 4), (16, 16), 64
        V = rng.rand(1, C, S[0] + k[0] - 1, S[1] + k[1] - 1,
                     L).astype("f")
        W0 = rng.rand(C, R, *k).astype("f") + 0.1
        H0 = rng.rand(1, R, S[0], S[1], L - k[2] + 1).astype("f") + 0.1
    args = (jnp.asarray(V), jnp.asarray(W0), jnp.asarray(H0))

    def make_fit(n):
        def fit(V, W, H):
            return halo._sharded_deconv_fit(
                V, W, H, mesh, nd, 1.0, float("-inf"), n, 0.0, 0.0, "seq",
            )
        return fit

    rows = []
    for variant in ("valid", "sym"):
        if variant == "sym":
            os.environ["PNT_HALO_CONV"] = "sym"
        else:
            os.environ.pop("PNT_HALO_CONV", None)
        # the env knob is read at trace time inside the cached solver:
        # drop the cache so each variant re-traces
        halo._get_sharded_deconv_fit.cache_clear()
        ms = _marginal_ms_per_iter(make_fit, args, target_s=1.5)
        rows.append({
            "variant": variant,
            "ms_per_iter": round(ms, 5),
            "shape": f"nd{nd}_C{C}_r{R}_halo_n1",
        })
    os.environ.pop("PNT_HALO_CONV", None)
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
