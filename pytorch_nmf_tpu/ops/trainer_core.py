r"""Jittable functional cores for the composed-model trainers.

The class-based trainers (:mod:`pytorch_nmf_tpu.trainer`) mirror the
reference's eager, closure-mutating interface.  These are their TPU-native
counterparts: pure functions over parameter pytrees that jit end-to-end, so
a full coordinate-wise MU sweep (or projected-gradient step) is ONE compiled
XLA program instead of per-parameter Python dispatch.

Semantics match the reference trainer observables
(torchnmf/trainer.py:36-121, 147-190): parameters update sequentially in
pytree-leaf order, each against the already-updated predecessors; the β=1
positive cotangent is ``ones_like``; regularizers and the ``(neg+eps)/
(pos+eps)`` assembly follow trainer.py:100-114.
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import eps
from .mu import gamma_from_beta, get_norm, mu_cotangents
from .projection import hoyer_l1_target, proj_columns

__all__ = ["betamu_step", "sparsity_proj_step"]


def betamu_step(
    predict_fn: Callable,
    params: Any,
    V,
    beta: float = 1,
    l1_reg: float = 0.0,
    l2_reg: float = 0.0,
    orthogonal: float = 0.0,
    trainable: Optional[Any] = None,
):
    """One coordinate-wise multiplicative-update sweep, fully jittable.

    Args:
        predict_fn: pure ``params_pytree -> reconstruction``.
        params: pytree of non-negative arrays.
        V: target.
        trainable: optional bool pytree (same structure) freezing leaves.

    Returns:
        ``(new_params, grads)`` where ``grads`` carries the true
        β-divergence gradient per leaf (the reference's ``p.grad``
        observable, trainer.py:98; ``None``-shaped zeros for frozen leaves).

    Wrap in ``jax.jit`` with ``static_argnums=(0,)`` (or close over
    ``predict_fn``); each leaf's update re-evaluates the model forward by
    VJP — the same cost model as the reference's per-parameter closure
    re-evaluation, but compiled as one program where XLA dedupes shared
    subgraphs.
    """
    gamma = gamma_from_beta(beta)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    if trainable is None:
        t_leaves = [True] * len(leaves)
    else:
        t_leaves = jax.tree_util.tree_flatten(trainable)[0]

    grads = [None] * len(leaves)
    for i in range(len(leaves)):
        if not t_leaves[i]:
            grads[i] = jnp.zeros_like(leaves[i])
            continue

        def f(x, _i=i):
            ls = list(leaves)
            ls[_i] = x
            return predict_fn(jax.tree_util.tree_unflatten(treedef, ls))

        WH, vjp = jax.vjp(f, leaves[i])
        # β cotangent pair with the trainer's β=1 ones convention
        # (reference trainer.py:78-91)
        neg_cot, pos_cot = mu_cotangents(V, WH, beta, kl_pos_ones=True)
        neg_raw = vjp(neg_cot)[0]
        pos_raw = vjp(pos_cot)[0]
        neg = jax.nn.relu(neg_raw)
        pos = jax.nn.relu(pos_raw)
        grads[i] = pos_raw - neg

        p = leaves[i]
        if l1_reg > 0:
            pos = pos + l1_reg
        if l2_reg > 0:
            pos = pos + l2_reg * p
        if orthogonal > 0:
            pos = pos + orthogonal * (jnp.sum(p, axis=1, keepdims=True) - p)
        multiplier = (neg + eps) / (pos + eps)
        if gamma != 1:
            multiplier = multiplier**gamma
        leaves[i] = p * multiplier

    return (
        jax.tree_util.tree_unflatten(treedef, leaves),
        jax.tree_util.tree_unflatten(treedef, grads),
    )


def sparsity_proj_step(
    loss_fn: Callable,
    params: Any,
    lr,
    sparsity: float,
    dim: int = 1,
    max_iter: int = 10,
    return_grads: bool = False,
):
    """One Hoyer projected-gradient step with backtracking, fully jittable.

    Args:
        loss_fn: pure ``params_pytree -> scalar loss``.
        lr: current step size (carry it between calls; adapts ×0.5/×1.2
            like the reference, trainer.py:185-187).
        return_grads: also return the loss gradient pytree (the class
            trainer's ``p.grad`` observable).

    Returns ``(new_params, new_lr, loss)``, plus ``grads`` when
    ``return_grads``.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    init_loss, grads = jax.value_and_grad(
        lambda ls: loss_fn(jax.tree_util.tree_unflatten(treedef, ls))
    )(leaves)

    def project_all(ls, step):
        out = []
        for p, g in zip(ls, grads):
            L1 = hoyer_l1_target(p.size // p.shape[dim], sparsity)
            norms = get_norm(p, dim)
            out.append(proj_columns(p - step * g, L1, axis=dim, norms=norms))
        return out

    def attempt(ls, step):
        new = project_all(ls, step)
        return new, loss_fn(jax.tree_util.tree_unflatten(treedef, new))

    new_leaves, loss = attempt(leaves, lr)

    def cond(st):
        i, step, cur, l = st
        return (i < max_iter) & (l > init_loss)

    def body(st):
        i, step, cur, l = st
        # reference-style undo onto the projected value, then halve
        cur = [p + step * g for p, g in zip(cur, grads)]
        step = step * 0.5
        new, l = attempt(cur, step)
        return i + 1, step, new, l

    _, lr, new_leaves, loss = lax.while_loop(
        cond, body, (jnp.int32(1), jnp.asarray(lr, jnp.float32),
                     new_leaves, loss)
    )
    # reference semantics when every attempt fails (trainer.py:180-187):
    # undo the last step onto the projected value and halve once more
    failed = loss > init_loss
    new_leaves = [
        jnp.where(failed, p + lr * g, p) for p, g in zip(new_leaves, grads)
    ]
    lr = jnp.where(failed, lr * 0.5, lr)
    out = (
        jax.tree_util.tree_unflatten(treedef, new_leaves),
        lr * 1.2,
        loss,
    )
    if return_grads:
        return out + (jax.tree_util.tree_unflatten(treedef, grads),)
    return out
