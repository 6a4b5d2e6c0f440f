#!/usr/bin/env python
"""Decompose the n=1 NMF2D halo-overhead tax (VERDICT r4 item 5).

The committed r4 grid row ``nmf2d_halo_overhead_n1_256x121x128loc`` sits at
1.22x plain (+0.36 ms/iter absolute) against a <=1.15x bar.  The conv FLOPs
of the halo'd local problem are identical to the plain solver's (the T-1
halo frames replace the symmetric left pad), so the tax must be some mix
of (a) the H trailing pad 121->128 (shard divisibility) changing shapes /
layouts, (b) shard_map + collectives (2 fwd ppermute + 1 reverse + loss
psum per cadence), and (c) the per-update halo exchange duplication.

This tool times, in ONE process (A/B across sessions is +-15% noise —
CLAUDE.md), at the bench_multichip MC_NMF2D shape:

  1. plain          — the autotuned single-device fit (H width 121);
  2. padded-local   — the same single-device conv fit on the PADDED local
                      shapes (H width 128, materialized left-pad T-1,
                      VALID trailing): isolates the pure shape/layout
                      tax, no collectives;
  3. halo (dup)     — the real sharded fit, per-update halo exchanges +
                      materialized concat (pre-r5, PNT_HALO_SHARED_HH=0);
  4. halo (shared)  — one exchange per iteration, still the concat form
                      (PNT_HALO_CONV=concat);
  5. halo (split)   — the r5 default: main conv at native shard width
                      (pad in the conv config) + strip GEMM on the
                      received frames (tools/bisect_halo2d_tax.py).

Deltas: (2)-(1) = shape tax; (3)-(2) = shard_map/collective tax;
(3)-(4) = shared-exchange gain; (4)-(5) = split-form gain.  Measured
2026-08-19 (v5e, one process): plain 1.702, padded-local 2.014 (the
materialized concat is the tax — the bisect tool puts the pad-in-config
variant at 1.738), halo_dup 2.047, halo_shared 2.025.  Prints one JSON
line.
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
    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import _marginal_ms_per_iter
    from bench_multichip import MC_NMF2D
    from pytorch_nmf_tpu.models.nmf import NMF2D
    from pytorch_nmf_tpu.ops import recon as _recon
    from pytorch_nmf_tpu.ops.autotune import (
        enable_compile_cache,
        resolve_deconv_factory,
    )
    from pytorch_nmf_tpu.ops.solver import get_dense_fit
    from pytorch_nmf_tpu.parallel import make_mesh
    from pytorch_nmf_tpu.parallel.halo import _sharded_deconv_fit

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
    pad_h = L2 - L_in  # the shard-divisibility trailing pad (n=1: T-1=7)

    results = {}

    # ---- 1. plain (autotuned) -------------------------------------------
    fac = resolve_deconv_factory(V, W0, H0, 1.0, 2, _recon.deconv2d)

    def make_plain(n):
        return get_dense_fit(
            NMF2D.reconstruct, 1.0, float("-inf"), n, True, True,
            0.0, 0.0, False, fac,
        )

    results["plain"] = _marginal_ms_per_iter(make_plain, (V, W0, H0))
    print(f"[tax] plain: {results['plain']:.4f} ms/iter", file=sys.stderr)

    # ---- 2. padded-local: same conv math on the halo'd SHAPES, single
    # device, zero collectives.  H carries the trailing zero pad; the
    # recon left-pads by T-1 (what the halo frames occupy) and runs VALID
    # on the trailing axis — output length L2, exactly the halo local
    # program's conv (parallel/halo.py::_conv_halo_nd).
    Hp0 = jnp.pad(H0, ((0, 0), (0, 0), (0, 0), (0, pad_h)))

    def recon_padded(h, w):
        hh = jnp.pad(h, ((0, 0), (0, 0), (0, 0), (kx2 - 1, 0)))
        Wf = jnp.flip(w, axis=(2, 3))
        dn = lax.conv_dimension_numbers(
            hh.shape, Wf.shape, ("NCHW", "OIHW", "NCHW")
        )
        return lax.conv_general_dilated(
            hh, Wf, (1, 1), [(ky2 - 1, ky2 - 1), (0, 0)],
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )

    def make_padded(n):
        return get_dense_fit(
            recon_padded, 1.0, float("-inf"), n, True, True,
            0.0, 0.0, False, None,
        )

    results["padded_local"] = _marginal_ms_per_iter(
        make_padded, (V, W0, Hp0)
    )
    print(f"[tax] padded_local: {results['padded_local']:.4f} ms/iter",
          file=sys.stderr)

    # ---- 3/4/5. the real halo fit: per-update concat exchanges (pre-r5),
    # shared concat exchange, and the r5-default split form (main conv at
    # native shard width + strip GEMM; tools/bisect_halo2d_tax.py)
    mesh = make_mesh({"seq": jax.device_count()})
    for label, env in (
        ("halo_dup", {"PNT_HALO_SHARED_HH": "0"}),
        ("halo_shared", {"PNT_HALO_SHARED_HH": "1",
                         "PNT_HALO_CONV": "concat"}),
        ("halo_split", {"PNT_HALO_SHARED_HH": "1"}),
    ):
        os.environ.pop("PNT_HALO_CONV", None)
        os.environ.update(env)

        def make_halo(n):
            def fit(Vv, Ww, Hh):
                return _sharded_deconv_fit(
                    Vv, Ww, Hh, mesh, 2, 1.0, float("-inf"), n, 0.0, 0.0,
                    "seq",
                )
            return fit

        results[label] = _marginal_ms_per_iter(make_halo, (V, W0, H0))
        print(f"[tax] {label}: {results[label]:.4f} ms/iter",
              file=sys.stderr)
    os.environ.pop("PNT_HALO_SHARED_HH", None)
    os.environ.pop("PNT_HALO_CONV", None)

    out = {
        "shape": f"{C2}x{Y2}x{L2}_r{R2}_k{ky2}x{kx2}",
        "n_devices": jax.device_count(),
        "ms": {k: round(v, 5) for k, v in results.items()},
        "shape_tax_ms": round(results["padded_local"] - results["plain"], 5),
        "collective_tax_ms": round(
            results["halo_dup"] - results["padded_local"], 5
        ),
        "shared_hh_gain_ms": round(
            results["halo_dup"] - results["halo_shared"], 5
        ),
        "split_gain_ms": round(
            results["halo_shared"] - results["halo_split"], 5
        ),
        "overhead_shared_x": round(
            results["halo_shared"] / results["plain"], 4
        ),
        "overhead_split_x": round(
            results["halo_split"] / results["plain"], 4
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
