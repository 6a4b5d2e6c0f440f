"""Basic tutorial: the core workflow in five short sections.

Script equivalent of the reference's examples/basic_tutorial.ipynb.

Run:  python examples/basic_tutorial.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax.numpy as jnp

    import pytorch_nmf_tpu as pnt
    from pytorch_nmf_tpu.metrics import beta_div, sparseness
    from pytorch_nmf_tpu.nmf import NMF

    pnt.manual_seed(0)
    rng = np.random.RandomState(0)

    # --- 1. factorize a non-negative matrix --------------------------------
    V = rng.rand(100, 50).astype("f")
    model = NMF(V.shape, rank=8)
    n_iter = model.fit(V, beta=1)  # KL-divergence multiplicative updates
    print(f"1. NMF converged in {n_iter} iterations; "
          f"KL = {float(beta_div(model(), V, 1)):.3f}")

    # --- 2. different divergences -------------------------------------------
    for beta in [0, 1, 2]:
        m = NMF(V.shape, 8)
        m.fit(V + 0.01, beta=beta, max_iter=100)
        print(f"2. beta={beta}: final divergence "
              f"{float(beta_div(m(), V + 0.01, beta)):.3f}")

    # --- 3. fixed templates (supervised decomposition) ----------------------
    templates = model.W.data  # reuse learned templates
    m = NMF(W=templates, H=(100, 8), trainable_W=False)
    m.fit(V, beta=1)
    assert bool(jnp.all(m.W.data == templates))
    print("3. frozen-template fit leaves W untouched")

    # --- 4. sparse targets ---------------------------------------------------
    V_sparse = pnt.sparse_from_dense(np.where(V > 0.9, V, 0))
    m = NMF(V.shape, 8)
    m.fit(V_sparse, beta=1)
    print(f"4. sparse target ({V_sparse.nnz} nnz) fit ok")

    # --- 5. sparseness-constrained factors ----------------------------------
    m = NMF(V.shape, 8)
    m.sparse_fit(V, beta=2, sW=0.6, max_iter=50)
    s = float(sparseness(m.W.data[:, 0]))
    print(f"5. Hoyer-constrained fit: column sparseness = {s:.3f} "
          f"(target 0.6)")


if __name__ == "__main__":
    main()
