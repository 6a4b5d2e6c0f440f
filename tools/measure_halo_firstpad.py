"""On-device A/B of the halo N-D first-lead-axis layout.

Times the n=1 sharded 3-D deconv fit with the fused per-shard modes
under both activation layouts — first lead axis unpadded (default since
r4) vs padded to its output width (``PNT_HALO_ND_FIRSTPAD=1``, the
pre-r4 layout) — in ONE process (CLAUDE.md: A/B within one process;
marginal two-length difference quotient).  Two shapes:

* ``chunk=55`` — both layouts admit the full fused ``"pallas"`` mode:
  the delta is the pure hgrad real-slab saving (19/16 fewer accumulator
  columns and dot FLOPs at this shape);
* ``chunk=60`` — the VMEM re-admission window: the padded layout models
  past the 15 MiB hgrad bound and falls back to the hybrid
  ``"pallas_w"``, the unpadded one runs the full fused mode.

Usage::

    python tools/measure_halo_firstpad.py [chunk ...]   # default 55 60
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    chunks = [int(a) for a in sys.argv[1:]] or [55, 60]

    import jax.numpy as jnp

    from bench import _marginal_ms_per_iter
    from pytorch_nmf_tpu.ops.autotune import enable_compile_cache
    from pytorch_nmf_tpu.ops.pallas_deconv import halo_pallas_mode
    from pytorch_nmf_tpu.parallel import halo, make_mesh

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    enable_compile_cache(os.path.join(repo_root, ".jax_cache"))

    mesh = make_mesh({"seq": 1})
    rng = np.random.RandomState(0)
    C, R, k, S = 64, 16, (4, 4, 4), (16, 16)
    # force the fused per-shard modes (the admitted one per layout)
    os.environ["PNT_NMFD_PALLAS"] = "1"

    rows = []
    try:
        for chunk in chunks:
            L = chunk  # n=1: the local chunk IS the global trailing axis
            V = rng.rand(1, C, S[0] + k[0] - 1, S[1] + k[1] - 1,
                         L).astype("f")
            W0 = rng.rand(C, R, *k).astype("f") + 0.1
            H0 = rng.rand(1, R, S[0], S[1], L - k[2] + 1).astype("f") + 0.1
            args = (jnp.asarray(V), jnp.asarray(W0), jnp.asarray(H0))

            def make_fit(n):
                def fit(V, W, H):
                    return halo._sharded_deconv_fit(
                        V, W, H, mesh, 3, 1.0, float("-inf"), n, 0.0, 0.0,
                        "seq",
                    )
                return fit

            for variant in ("unpadded", "firstpad"):
                if variant == "firstpad":
                    os.environ["PNT_HALO_ND_FIRSTPAD"] = "1"
                else:
                    os.environ.pop("PNT_HALO_ND_FIRSTPAD", None)
                mode = halo_pallas_mode(1, C, S, chunk, k, R)
                halo._get_sharded_deconv_fit.cache_clear()
                ms = _marginal_ms_per_iter(make_fit, args, target_s=1.5)
                rows.append({
                    "variant": variant,
                    "mode": mode,
                    "chunk": chunk,
                    "ms_per_iter": round(ms, 5),
                    "shape": f"nd3_C{C}_r{R}_k4_halo_n1",
                })
    finally:
        os.environ.pop("PNT_HALO_ND_FIRSTPAD", None)
        os.environ.pop("PNT_NMFD_PALLAS", None)
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
