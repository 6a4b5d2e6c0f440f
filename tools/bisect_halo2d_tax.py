#!/usr/bin/env python
"""Bisect the n=1 NMF2D halo shape tax (VERDICT r4 item 5, round-5 follow-up).

``tools/measure_halo2d_tax.py`` (run on device 2026-08-19) attributed the
1.21x overhead almost entirely to the local formulation: plain 1.702 vs
padded-local-control 2.014 ms/iter (shape tax 0.312 ms = 94% of the total),
collectives 0.033 ms, shared-exchange gain 0.022 ms.  The padded control and
the plain fit run the SAME conv FLOPs (the T-1 halo columns replace the
symmetric left pad), so the tax must be in how the trailing axis is
expressed.  This tool ladders the candidate formulations, single device,
marginal ms/iter, same MU engine (``get_dense_fit`` with the generic
conv/VJP updaters — the halo conv mode's structure):

  plain    H width 121, conv pads ((ky-1,ky-1),(kx-1,kx-1))   [baseline]
  padcfg   H width 128, conv pads ((ky-1,ky-1),(kx-1,0))      [pad-in-config:
           isolates the trailing zero-pad 121->128 alone]
  matpad   H width 128, materialized left pad -> 135, VALID    [what the halo
           concat builds today; expect ~2.01]
  split    H width 128, main conv pads (kx-1,0) + tiny strip conv on the
           T-1 "received" frames added to the left output edge [the
           candidate halo restructure: no concat, grads at native width;
           the strip input derives from h's tail so XLA cannot fold it —
           timing-representative, not the exact n=1 math]

Deltas tell which restructure (if any) recovers the 0.31 ms.  Prints one
JSON line.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
os.environ.setdefault(
    "PNT_AUTOTUNE_CACHE", os.path.join(REPO, "autotune_cache.json")
)

if os.environ.get("PNT_FORCE_CPU", "") == "1":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    import jax.numpy as jnp
    from jax import lax

    from bench import _marginal_ms_per_iter
    from bench_multichip import MC_NMF2D
    from pytorch_nmf_tpu.ops.autotune import enable_compile_cache
    from pytorch_nmf_tpu.ops.solver import get_dense_fit

    enable_compile_cache(
        os.environ.get("PNT_COMPILE_CACHE", os.path.join(REPO, ".jax_cache"))
    )

    tiny = os.environ.get("PNT_BENCH_TINY", "") == "1"
    C2, R2, Y2, ky2, kx2, L2 = (
        (6, 4, 10, 3, 3, 8) if tiny else MC_NMF2D
    )
    rng = np.random.RandomState(0)
    V = jnp.asarray(rng.rand(1, C2, Y2 + ky2 - 1, L2).astype("f"))
    W0 = jnp.asarray(rng.rand(C2, R2, ky2, kx2).astype("f") + 0.1)
    H0 = jnp.asarray(rng.rand(1, R2, Y2, L2 - kx2 + 1).astype("f") + 0.1)
    L_in = int(H0.shape[-1])
    pad_h = L2 - L_in  # n=1 shard pad (= kx2-1)
    halo = kx2 - 1
    Hp0 = jnp.pad(H0, ((0, 0), (0, 0), (0, 0), (0, pad_h)))

    def conv(h, w, trailing_pads):
        Wf = jnp.flip(w, axis=(2, 3))
        dn = lax.conv_dimension_numbers(
            h.shape, Wf.shape, ("NCHW", "OIHW", "NCHW")
        )
        return lax.conv_general_dilated(
            h, Wf, (1, 1), [(ky2 - 1, ky2 - 1), trailing_pads],
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )

    def recon_plain(h, w):
        return conv(h, w, (kx2 - 1, kx2 - 1))

    def recon_padcfg(h, w):
        return conv(h, w, (kx2 - 1, 0))

    def recon_matpad(h, w):
        hh = jnp.pad(h, ((0, 0), (0, 0), (0, 0), (halo, 0)))
        return conv(hh, w, (0, 0))

    def recon_split(h, w):
        out = conv(h, w, (kx2 - 1, 0))
        recv = h[..., -halo:]  # timing stand-in for the ppermute'd frames
        strip = conv(recv, w, (kx2 - 1, 0))[..., :halo]
        return out.at[..., :halo].add(strip)

    results = {}
    for name, recon, h0 in (
        ("plain", recon_plain, H0),
        ("padcfg", recon_padcfg, Hp0),
        ("matpad", recon_matpad, Hp0),
        ("split", recon_split, Hp0),
    ):
        def make(n, recon=recon):
            return get_dense_fit(
                recon, 1.0, float("-inf"), n, True, True,
                0.0, 0.0, False, None,
            )

        results[name] = _marginal_ms_per_iter(make, (V, W0, h0))
        print(f"[bisect] {name}: {results[name]:.4f} ms/iter",
              file=sys.stderr)

    out = {
        "shape": f"{C2}x{Y2}x{L2}_r{R2}_k{ky2}x{kx2}",
        "ms": {k: round(v, 5) for k, v in results.items()},
        "pad_tax_ms": round(results["padcfg"] - results["plain"], 5),
        "materialize_tax_ms": round(
            results["matpad"] - results["padcfg"], 5
        ),
        "split_vs_plain_x": round(results["split"] / results["plain"], 4),
        "split_vs_matpad_ms": round(
            results["matpad"] - results["split"], 5
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
