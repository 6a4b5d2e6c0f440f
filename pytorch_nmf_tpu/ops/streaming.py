r"""Streaming NMF fit for targets larger than device memory.

The mesh solvers (:mod:`pytorch_nmf_tpu.parallel`) are the fast path when
the target fits the *pod's* combined HBM.  This module covers the capacity
case beyond that: ``V`` stays on the host (a numpy array or ``np.memmap``)
and streams through the device in row blocks.

The MU algebra makes this exact, not approximate: for ``V ≈ H Wᵀ``

* the W-update numerator/denominator are **sums over row blocks** of the
  per-block cotangent contractions (relu/eps applied to the accumulated
  totals, exactly like the in-memory engine);
* each H row block updates independently given the (new) ``W``;
* the β-divergence is a sum over blocks.

So the streamed trajectory equals the in-memory trajectory to float32
summation order (tested).  Reference semantics are preserved: W updates
against the old H, H against the new W, loss every 10 iterations with the
``(prev - loss)/init < tol`` stop rule (torchnmf/nmf.py:297-409).

Cost model: every iteration moves ``V`` host→device once per factor
update.  This is PCIe/DMA-bound by design — use it when ``V`` simply does
not fit, and the mesh solvers otherwise.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import eps
from ..metrics import beta_div
from .mu import gamma_from_beta, mu_cotangents, mu_multiplier

__all__ = ["streaming_nmf_fit"]


@lru_cache(maxsize=None)
def _block_fns(beta: float, gamma: float, l1_reg: float, l2_reg: float):
    """Jitted per-block kernels shared across calls."""

    @jax.jit
    def w_contract(Vb, W, Hb):
        WH = jnp.dot(Hb, W.T, preferred_element_type=jnp.float32)
        neg_cot, pos_cot = mu_cotangents(jnp.asarray(Vb), WH, beta)
        neg = jnp.dot(neg_cot.T, Hb, preferred_element_type=jnp.float32)
        if beta == 1:
            pos = jnp.sum(Hb, axis=0, keepdims=True)
        else:
            pos = jnp.dot(pos_cot.T, Hb, preferred_element_type=jnp.float32)
        return neg, pos

    @jax.jit
    def w_update(W, neg_acc, pos_acc):
        neg = jax.nn.relu(neg_acc) + eps
        if beta == 1:
            pos = pos_acc  # analytic column sums (no relu/eps)
        else:
            pos = jax.nn.relu(pos_acc) + eps
        return W * mu_multiplier(neg, pos, W, gamma, l1_reg, l2_reg)

    @jax.jit
    def h_update(Vb, W, Hb):
        WH = jnp.dot(Hb, W.T, preferred_element_type=jnp.float32)
        neg_cot, pos_cot = mu_cotangents(jnp.asarray(Vb), WH, beta)
        neg = jax.nn.relu(
            jnp.dot(neg_cot, W, preferred_element_type=jnp.float32)
        ) + eps
        if beta == 1:
            pos = jnp.sum(W, axis=0)
        else:
            pos = jax.nn.relu(
                jnp.dot(pos_cot, W, preferred_element_type=jnp.float32)
            ) + eps
        return Hb * mu_multiplier(neg, pos, Hb, gamma, l1_reg, l2_reg)

    @jax.jit
    def block_loss(Vb, W, Hb):
        WH = jnp.dot(Hb, W.T, preferred_element_type=jnp.float32)
        return beta_div(WH, jnp.asarray(Vb), beta)

    return w_contract, w_update, h_update, block_loss


def streaming_nmf_fit(
    V,
    W,
    H,
    beta: float = 1,
    tol: float = 1e-4,
    max_iter: int = 200,
    l1_reg: float = 0.0,
    l2_reg: float = 0.0,
    row_block: int = 8192,
    update_W: bool = True,
    update_H: bool = True,
):
    """Fit ``V ≈ H Wᵀ`` with a host-resident target streamed in row blocks.

    ``V`` may be any array-like the blocks of which numpy can slice — in
    particular an ``np.memmap`` over a file far larger than HBM.  ``W`` and
    ``H`` live on device.  Returns ``(W, H, n_iter)`` with the same values
    (to f32 summation order) and iteration-count semantics as the
    in-memory solver.
    """
    gamma = gamma_from_beta(beta)
    w_contract, w_update, h_update, block_loss = _block_fns(
        float(beta), float(gamma), float(l1_reg), float(l2_reg)
    )

    M = V.shape[0]
    n_blocks = -(-M // row_block)
    W = jnp.asarray(W)
    # H is updated block-wise; keep blocks as a list of device arrays so a
    # huge H never needs to be contiguous on device
    H_blocks = [
        jnp.asarray(np.asarray(H[b * row_block:(b + 1) * row_block]))
        for b in range(n_blocks)
    ]

    # one-block-ahead prefetch on a worker thread: numpy slice/copy of a
    # memmap releases the GIL, so disk/page-cache reads overlap the device
    # compute of the previous block
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(max_workers=1)

    def _read(b):
        return np.asarray(V[b * row_block:(b + 1) * row_block])

    def blocks():
        fut = pool.submit(_read, 0)
        for b in range(n_blocks):
            cur = fut.result()
            if b + 1 < n_blocks:
                fut = pool.submit(_read, b + 1)
            yield cur, b

    def total_loss(Wc):
        acc = 0.0
        for Vb, b in blocks():
            acc += float(block_loss(Vb, Wc, H_blocks[b]))
        return float(np.sqrt(2.0 * acc))

    loss_init = total_loss(W)
    prev = loss_init
    n_iter = max_iter
    converged = False

    try:
        for it in range(max_iter):
            if update_W:
                neg_acc = None
                pos_acc = None
                for Vb, b in blocks():
                    neg_b, pos_b = w_contract(Vb, W, H_blocks[b])
                    neg_acc = neg_b if neg_acc is None else neg_acc + neg_b
                    pos_acc = pos_b if pos_acc is None else pos_acc + pos_b
                W = w_update(W, neg_acc, pos_acc)
            if update_H:
                for Vb, b in blocks():
                    H_blocks[b] = h_update(Vb, W, H_blocks[b])

            if it % 10 == 9:
                loss = total_loss(W)
                if (prev - loss) / loss_init < tol:
                    n_iter = it + 1
                    converged = True
                    break
                prev = loss

    finally:
        # shut down on every exit path: a device error mid-fit must not
        # leak the prefetch worker and its in-flight host block
        pool.shutdown(wait=False)
    H_out = jnp.concatenate(H_blocks, axis=0) if n_blocks > 1 else H_blocks[0]
    return W, H_out, n_iter
