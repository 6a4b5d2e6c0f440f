r"""Jitted training loops (the solver layer).

Each public factory returns a fully-jitted fit function closed over the
static configuration (β, tol, max_iter, trainability, regularization),
caching compiled programs per configuration via ``lru_cache``.  The host
model layer (:mod:`pytorch_nmf_tpu.models`) only moves data in and out.

Design notes (vs. reference ``BaseComponent.fit``, torchnmf/nmf.py:297-409):

* The reference's Python ``for`` loop with an every-10-iteration loss check
  becomes a ``lax.while_loop`` over 10-iteration ``fori_loop`` chunks — the
  same loss cadence and stopping rule ``(prev - loss)/loss_init < tol``
  (nmf.py:393-407), but compiled once and kept on-device; the only
  host↔device traffic is the final result (plus an optional progress
  callback).
* Update ordering matches the reference exactly: W updates against the old
  H, then H updates against the *new* W within one iteration
  (nmf.py:367-391) — sequential, not simultaneous.
* Early-exit iteration counts reproduce the reference's returned values:
  break at the check of iteration ``10c-1`` returns ``10c``
  (PLCA returns ``10c-1``; plca.py:304 returns the raw loop variable).
* ``sparse_fit`` (Hoyer'04 sparseness-constrained fitting,
  nmf.py:411-599) runs its data-dependent backtracking line search and
  projection loops as bounded ``lax.while_loop``s, entirely under jit.
"""

from functools import lru_cache
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..constants import eps
from ..metrics import beta_div, kl_div
from .mu import (
    gamma_from_beta,
    kl_pos_H,
    kl_pos_W,
    mu_multiplier,
    mu_update,
    renorm,
)
from .projection import hoyer_l1_target, proj_columns, proj_columns_explicit
from .sparse import (
    SparseCOO,
    coo_rem_neg_grad,
    coo_rem_neg_scalar,
    ell_neg_grad,
    ell_neg_scalar,
    get_V_norm,
    nmf_ell_pos_grad,
    nmf_ell_pos_scalar,
)

__all__ = [
    "get_dense_fit",
    "get_batched_dense_fit",
    "get_sparse_fit",
    "get_hoyer_fit",
    "get_plca_fit",
    "push_progress_handler",
    "pop_progress_handler",
]


# --------------------------------------------------------------------------
# Progress reporting: solvers emit (chunk_index, loss) through
# ``jax.debug.callback``; the host fit() installs a handler (e.g. tqdm).
#
# The stack is process-global BY DESIGN: the debug callback may fire on a
# runtime thread, not the thread that entered fit(), so a thread-local
# lookup would find nothing; and a per-fit identity would have to travel
# through the compiled program as a traced argument, splitting the solver
# cache per fit call.  Every registered handler observes every event (so
# a user's LossHistory recorder coexists with the fit's tqdm bar); the
# consequence is purely cosmetic: two fits running verbose CONCURRENTLY
# (already inadvisable — two device programs queue against each other)
# would deliver both fits' interleaved events to every handler.  Mutation
# is lock-guarded so concurrent push/pop cannot corrupt the stack.
# --------------------------------------------------------------------------
import threading as _threading

_PROGRESS_HANDLERS = []
_PROGRESS_LOCK = _threading.Lock()


def push_progress_handler(fn) -> None:
    with _PROGRESS_LOCK:
        _PROGRESS_HANDLERS.append(fn)


def pop_progress_handler() -> None:
    with _PROGRESS_LOCK:
        if _PROGRESS_HANDLERS:
            _PROGRESS_HANDLERS.pop()


def _emit_progress(chunk_idx, loss, extra=None):
    with _PROGRESS_LOCK:  # snapshot: the callback thread races pop()
        handlers = list(_PROGRESS_HANDLERS)
    # every registered handler observes the event, so a user-installed
    # recorder (utils.LossHistory) coexists with the fit's own tqdm bar
    extra = None if extra is None else float(extra)  # device scalar -> host
    for handler in handlers:
        handler(int(chunk_idx), float(loss), extra)


def _progress(verbose: bool, chunk_idx, loss, extra=None):
    if verbose:
        if extra is None:
            jax.debug.callback(
                lambda c, l: _emit_progress(c, l), chunk_idx, loss
            )
        else:
            jax.debug.callback(
                lambda c, l, e: _emit_progress(c, l, e), chunk_idx, loss, extra
            )


_CB_SUPPORT: Optional[bool] = None


def host_callbacks_supported() -> bool:
    """Whether the default backend can execute ``jax.debug.callback``.

    Standard PJRT backends (cpu/gpu/tpu) support host callbacks; the
    relay-attached ``axon`` backend raises UNIMPLEMENTED ("does not
    support host send/recv callbacks") at *execution* time, which would
    kill every ``verbose=True`` fit.  Unknown platforms are probed once
    with a trivial callback program.  ``PNT_PROGRESS_CALLBACKS=0/1``
    forces the answer (read on every call, so tests can exercise the
    recorded-trace fallback on CPU).
    """
    import os

    env = os.environ.get("PNT_PROGRESS_CALLBACKS")
    if env is not None:
        return env != "0"
    global _CB_SUPPORT
    if _CB_SUPPORT is None:
        dev = jax.devices()[0]
        platform = dev.platform
        # the axon relay backend registers as platform "axon" but its
        # devices REPORT platform "tpu" — the reliable marker is the PJRT
        # platform_version string ("PJRT C API\naxon 0.1.0; ...")
        version = str(
            getattr(getattr(dev, "client", None), "platform_version", "")
        )
        if "axon" in version or platform == "axon":
            _CB_SUPPORT = False
        elif platform in ("cpu", "gpu", "tpu", "cuda", "rocm"):
            _CB_SUPPORT = True
        else:
            try:
                jax.jit(
                    lambda x: (jax.debug.callback(lambda v: None, x), x + 1)[1]
                )(jnp.float32(0)).block_until_ready()
                jax.effects_barrier()
                _CB_SUPPORT = True
            except Exception:
                _CB_SUPPORT = False
    return _CB_SUPPORT


def _record_bit_resolved(factory):
    """Resolve the verbose record-mode bit OUTSIDE the solver lru cache.

    ``factory`` is the lru-cached solver factory taking a trailing
    ``_record`` keyword.  The bit depends on the backend and on the
    ``PNT_PROGRESS_CALLBACKS`` override, not just the call arguments, so
    it must be recomputed per call — baking it into the cached body would
    let a flipped override serve a stale program shape.
    """
    import functools
    import inspect

    sig = inspect.signature(factory)

    @functools.wraps(factory)
    def wrapper(*args, **kwargs):
        bound = sig.bind_partial(*args, **kwargs)
        bound.apply_defaults()
        verbose = bool(bound.arguments.get("verbose", False))
        kwargs["_record"] = verbose and not host_callbacks_supported()
        return factory(*args, **kwargs)

    wrapper.cache_clear = factory.cache_clear
    wrapper.cache_info = factory.cache_info
    return wrapper


def _emit_recorded(k, losses, extras=None) -> None:
    """Replay a record-mode fit's cadence trace to the progress handlers.

    ``k`` chunk events were recorded on device (the callback-free
    fallback); handlers observe them in order after the program completes
    — same events, same payloads as the streaming path, just not live.
    """
    import numpy as np

    k = int(k)
    losses = np.asarray(losses)
    extras_np = None if extras is None else np.asarray(extras)
    for c in range(k):
        _emit_progress(
            c + 1, float(losses[c]),
            None if extras_np is None else float(extras_np[c]),
        )


# --------------------------------------------------------------------------
# Default (generic) per-factor updaters via the VJP MU engine.
# --------------------------------------------------------------------------
def _default_updaters(recon2, beta, gamma, l1_reg, l2_reg):
    def upd_W(V, W, H):
        pos_pre = kl_pos_W(H) if beta == 1 else None
        return mu_update(
            lambda w: recon2(H, w), V, W, beta, gamma, l1_reg, l2_reg, pos_pre
        )

    def upd_H(V, W, H):
        pos_pre = kl_pos_H(W) if beta == 1 else None
        return mu_update(
            lambda h: recon2(h, W), V, H, beta, gamma, l1_reg, l2_reg, pos_pre
        )

    return upd_W, upd_H


def _normalize_updaters(updaters):
    """Factory return values come in three arities:

    * ``(upd_W, upd_H)``
    * ``(upd_W, upd_H, loss_terms)``
    * ``(upd_W, upd_H, loss_terms, prepare, finish)`` — the extended
      protocol: ``prepare(V, W, H) -> (w_state, h_state)`` converts the
      factors into the updaters' preferred loop-carried layout once at fit
      entry (e.g. the NMFD Pallas kernels carry ``W`` as the flattened
      ``(T·R, C)`` GEMM operand) and ``finish(V, w_state, h_state) ->
      (W, H)`` converts back once at exit.  ``upd_*``/``loss_terms`` then
      operate on the state layout.

    Any other arity is rejected: a prepare without its inverse would leak
    the internal layout to the caller.
    """
    assert len(updaters) in (2, 3, 5), (
        f"updater factory returned {len(updaters)} elements; expected "
        "(upd_W, upd_H[, loss_terms[, prepare, finish]])"
    )
    return (tuple(updaters) + (None,) * 5)[:5]


def _converging_loop(
    one_iter: Callable,
    loss_of: Callable,
    state0,
    tol: float,
    max_iter: int,
    verbose: bool,
    extra_of: Optional[Callable] = None,
    record: bool = False,
):
    """Shared chunked-while convergence loop.

    ``state0`` is the factor pytree; ``one_iter(state) -> state``;
    ``loss_of(state) -> scalar`` (already in the reference's
    ``sqrt(2·divergence)`` scale); ``extra_of`` optionally computes an
    additional verbose-only scalar (PLCA's log-likelihood).
    Returns ``(state, n_chunks, converged, trace)``.

    ``trace`` is ``None`` unless ``record`` is set (the caller resolved
    that the verbose events cannot stream through ``jax.debug.callback``,
    :func:`host_callbacks_supported`); then the loop records the cadence
    ``(loss[, extra])`` values into preallocated carry arrays instead, and
    ``trace = (losses, extras-or-None)`` for the caller to replay via
    :func:`_emit_recorded` after the program runs.
    """
    loss_init = loss_of(state0)
    n_chunks = max_iter // 10
    rem = max_iter % 10
    record = record and verbose

    def chunk_body(carry):
        state, prev, k, _, losses, extras = carry
        state = lax.fori_loop(0, 10, lambda i, s: one_iter(s), state)
        loss = loss_of(state)
        conv = (prev - loss) / loss_init < tol
        if record:
            losses = losses.at[k].set(loss)
            if extra_of is not None:
                extras = extras.at[k].set(extra_of(state))
        elif verbose and extra_of is not None:
            _progress(verbose, k + 1, loss, extra_of(state))
        else:
            _progress(verbose, k + 1, loss)
        return state, loss, k + 1, conv, losses, extras

    def cond(carry):
        _, _, k, conv, _, _ = carry
        return (~conv) & (k < n_chunks)

    # at least one slot: max_iter < 10 records nothing (k stays 0) but the
    # traced ``at[k].set`` needs a non-empty array
    n_rec = max(n_chunks, 1)
    losses0 = jnp.zeros((n_rec,), jnp.float32) if record else jnp.float32(0)
    extras0 = (
        jnp.zeros((n_rec,), jnp.float32)
        if record and extra_of is not None
        else jnp.float32(0)
    )
    state, _, k, conv, losses, extras = lax.while_loop(
        cond, chunk_body,
        (state0, loss_init, jnp.int32(0), False, losses0, extras0),
    )
    if rem:
        state = lax.cond(
            conv,
            lambda s: s,
            lambda s: lax.fori_loop(0, rem, lambda i, t: one_iter(t), s),
            state,
        )
    trace = None
    if record:
        trace = (losses, extras if extra_of is not None else None)
    return state, k, conv, trace


# --------------------------------------------------------------------------
# Dense β-divergence MU fit (reference fit, dense path; nmf.py:355-409)
# --------------------------------------------------------------------------
@_record_bit_resolved
@lru_cache(maxsize=None)
def get_dense_fit(
    recon2: Callable,
    beta: float,
    tol: float,
    max_iter: int,
    update_W: bool,
    update_H: bool,
    l1_reg: float,
    l2_reg: float,
    verbose: bool = False,
    updater_factory: Optional[Callable] = None,
    _record: bool = False,
):
    """Returns jitted ``fit(V, W, H) -> (W, H, n_iter)``."""
    gamma = gamma_from_beta(beta)
    updaters = (
        updater_factory(beta, gamma, l1_reg, l2_reg) if updater_factory else None
    )
    if updaters is None:
        updaters = _default_updaters(recon2, beta, gamma, l1_reg, l2_reg)
    # factories may supply a fused loss / layout hooks (extended protocol)
    upd_W, upd_H, loss_terms, prepare, finish = _normalize_updaters(updaters)

    def fit(V, W, H):
        def loss_of(state):
            w, h = state
            if loss_terms is not None:
                return jnp.sqrt(2.0 * loss_terms(V, w, h))
            return jnp.sqrt(2.0 * beta_div(recon2(h, w), V, beta))

        def one_iter(state):
            w, h = state
            if update_W:
                w = upd_W(V, w, h)
            if update_H:
                h = upd_H(V, w, h)
            return w, h

        state0 = (W, H) if prepare is None else prepare(V, W, H)
        state, k, conv, trace = _converging_loop(
            one_iter, loss_of, state0, tol, max_iter, verbose,
            record=_record,
        )
        W, H = state if finish is None else finish(V, *state)
        n_iter = jnp.where(conv, k * 10, max_iter)
        if trace is not None:
            return W, H, n_iter, k, trace[0]
        return W, H, n_iter

    jf = jax.jit(fit)
    if not _record:
        return jf

    def fit_posthoc(V, W, H):
        W, H, n_iter, k, losses = jf(V, W, H)
        _emit_recorded(k, losses)
        return W, H, n_iter

    return fit_posthoc


# --------------------------------------------------------------------------
# Batched dense fit: many factorizations in ONE program (vmapped updates
# with per-problem early stopping — a capability the reference lacks).
# --------------------------------------------------------------------------
@lru_cache(maxsize=None)
def get_batched_dense_fit(
    recon2: Callable,
    beta: float,
    tol: float,
    max_iter: int,
    update_W: bool,
    update_H: bool,
    l1_reg: float,
    l2_reg: float,
    updater_factory: Optional[Callable] = None,
):
    """Returns jitted ``fit(V, W, H) -> (W, H, n_iter)`` over a leading
    batch axis: ``V (B, ...)``, ``W (B, ...)``, ``H (B, ...)``,
    ``n_iter (B,)``.

    Updates are vmapped; the convergence loop runs while ANY problem is
    unconverged, but factors of already-converged problems are frozen so
    each problem's trajectory and stopping decision match what it would do
    alone (same chunked cadence and stop rule as :func:`get_dense_fit`).
    """
    gamma = gamma_from_beta(beta)
    updaters = (
        updater_factory(beta, gamma, l1_reg, l2_reg) if updater_factory else None
    )
    if updaters is None:
        updaters = _default_updaters(recon2, beta, gamma, l1_reg, l2_reg)
    upd_W, upd_H, loss_terms, prepare, _ = _normalize_updaters(updaters)
    assert prepare is None, (
        "layout-transforming updater factories are not supported by the "
        "batched solver"
    )

    def fit(V, W, H):
        B = V.shape[0]

        def loss_one(v, w, h):
            if loss_terms is not None:
                return jnp.sqrt(2.0 * loss_terms(v, w, h))
            return jnp.sqrt(2.0 * beta_div(recon2(h, w), v, beta))

        loss_of = jax.vmap(loss_one)

        def one_iter_one(v, w, h):
            if update_W:
                w = upd_W(v, w, h)
            if update_H:
                h = upd_H(v, w, h)
            return w, h

        one_iter = jax.vmap(one_iter_one)

        def masked(conv, old, new):
            m = conv.reshape((B,) + (1,) * (old.ndim - 1))
            return jnp.where(m, old, new)

        loss_init = loss_of(V, W, H)
        n_chunks = max_iter // 10
        rem = max_iter % 10

        def chunk_body(carry):
            w, h, prev, k, conv, n_iter = carry
            w2, h2 = lax.fori_loop(
                0, 10, lambda i, s: one_iter(V, *s), (w, h)
            )
            w2 = masked(conv, w, w2)
            h2 = masked(conv, h, h2)
            loss = loss_of(V, w2, h2)
            loss = jnp.where(conv, prev, loss)
            newly = (~conv) & ((prev - loss) / loss_init < tol)
            n_iter = jnp.where(newly, (k + 1) * 10, n_iter)
            return w2, h2, loss, k + 1, conv | newly, n_iter

        def cond(carry):
            _, _, _, k, conv, _ = carry
            return (~jnp.all(conv)) & (k < n_chunks)

        carry0 = (
            W, H, loss_init, jnp.int32(0),
            jnp.zeros((B,), bool), jnp.full((B,), max_iter, jnp.int32),
        )
        W, H, _, k, conv, n_iter = lax.while_loop(cond, chunk_body, carry0)
        if rem:
            w2, h2 = lax.fori_loop(
                0, rem, lambda i, s: one_iter(V, *s), (W, H)
            )
            W = masked(conv, W, w2)
            H = masked(conv, H, h2)
        return W, H, n_iter

    return jax.jit(fit)


# --------------------------------------------------------------------------
# Sparse-target β-divergence MU fit (reference fit, sparse path;
# nmf.py:351-353, 371-374, 383-387, 396-398 + _sp_double_backward_update)
# --------------------------------------------------------------------------
def _sp_factor_update(pos_neg_p, p, gamma, l1_reg, l2_reg, pos_pre=None):
    """MU step from scalar pos/neg functions of a single factor.

    ``pos_neg_p(p) -> (pos, neg)``; numerator/denominator are the gradients
    of the two scalars (reference ``_sp_double_backward_update``,
    nmf.py:95-119).
    """
    neg = jax.nn.relu(jax.grad(lambda x: pos_neg_p(x)[1])(p)) + eps
    if pos_pre is not None:
        pos = pos_pre
    else:
        pos = jax.nn.relu(jax.grad(lambda x: pos_neg_p(x)[0])(p)) + eps
    return p * mu_multiplier(neg, pos, p, gamma, l1_reg, l2_reg)


@_record_bit_resolved
@lru_cache(maxsize=None)
def get_sparse_fit(
    pos_neg: Callable,
    beta: float,
    tol: float,
    max_iter: int,
    update_W: bool,
    update_H: bool,
    l1_reg: float,
    l2_reg: float,
    verbose: bool = False,
    densify: bool = False,
    recon2: Optional[Callable] = None,
    updater_factory: Optional[Callable] = None,
    ell: bool = False,
    _record: bool = False,
):
    """Returns jitted ``fit(V_sparse, W, H) -> (W, H, n_iter)``.

    ``pos_neg(V, H, W, beta) -> (pos, neg)`` is the model's closed-form scalar
    pair (for NMF, :func:`pytorch_nmf_tpu.ops.sparse.nmf_sp_pos_neg`).
    The MU numerators/denominators are the two scalar gradients — XLA turns
    the gather transposes into the segment-sum scatters directly (a
    hand-written closed form measured no faster on TPU).

    ``densify=True`` selects the TPU fast path: the target is scattered to
    dense ONCE at fit entry and the per-iteration updates run through the
    fused dense updaters (``updater_factory`` / the generic VJP engine on
    ``recon2``) — algebraically identical because zero entries contribute
    nothing to any β cotangent (reference parity oracle:
    tests/test_nmf_sparse.py dense-vs-sparse equivalence; reference
    torchnmf tests/test_nmf_sparse.py).  The every-10-iterations loss keeps
    the exact sparse split form ``V_norm + pos - neg`` (reference
    nmf.py:358,398) so convergence decisions match the gather path.

    ``ell=True`` selects the dual-ELL fast path for the gather regime
    (targets too large to densify): ``fit`` then takes a
    :class:`~pytorch_nmf_tpu.ops.sparse.SparseELL` and the per-iteration
    numerators come from :func:`~pytorch_nmf_tpu.ops.sparse.ell_neg_grad`
    (dense reductions over the padded nnz axis — no scatters), the
    denominators from closed forms.  Same relu/eps placement as the
    ``jax.grad`` path; trajectories differ only by f32 summation order.
    NMF-layout-specific (``V ~ H W^T``), like the reference's sparse
    support (nmf.py:617-638).
    """
    gamma = gamma_from_beta(beta)

    dense_updaters = None
    if densify:
        updaters = (
            updater_factory(beta, gamma, l1_reg, l2_reg)
            if updater_factory
            else None
        )
        if updaters is None:
            updaters = _default_updaters(recon2, beta, gamma, l1_reg, l2_reg)
        upd_W_d, upd_H_d, _, prepare, _ = _normalize_updaters(updaters)
        assert prepare is None, (
            "layout-transforming updater factories are not supported by "
            "the sparse densify path"
        )
        dense_updaters = (upd_W_d, upd_H_d)

    def fit(V, W, H):
        V_coo = V.coo if ell else V
        V_norm = get_V_norm(V_coo, beta)
        Vd = V_coo.to_dense() if densify else None

        def loss_of(state):
            w, h = state
            if ell:
                # cadence loss from the row-ELL side: same split form and
                # eps placement as the gather pair, but the nnz access is
                # the same blocked one-factor-gather reduction the updates
                # use — measured materially cheaper than the two-factor
                # COO gather at bench scale (the sharded solver's form;
                # f32 summation order is the only difference)
                pos = nmf_ell_pos_scalar(w, h, beta)
                neg = ell_neg_scalar(V.row_idx, V.row_val, h, w, beta)
                if V.row_rem[2].shape[0]:
                    neg = neg + coo_rem_neg_scalar(V.row_rem, h, w, beta)
            else:
                pos, neg = pos_neg(V_coo, h, w, beta)
            return jnp.sqrt(2.0 * (V_norm + pos - neg))

        def ell_update(p, neg_raw, pos_pre, pos_raw):
            neg = jax.nn.relu(neg_raw) + eps
            pos = (
                pos_pre if pos_pre is not None
                else jax.nn.relu(pos_raw) + eps
            )
            return p * mu_multiplier(neg, pos, p, gamma, l1_reg, l2_reg)

        def one_iter(state):
            w, h = state
            if densify:
                upd_W, upd_H = dense_updaters
                if update_W:
                    w = upd_W(Vd, w, h)
                if update_H:
                    h = upd_H(Vd, w, h)
                return w, h
            if ell:
                if update_W:
                    neg_raw = ell_neg_grad(V.col_idx, V.col_val, w, h, beta)
                    if V.col_rem[2].shape[0]:  # hybrid: over-cap spill
                        neg_raw = neg_raw + coo_rem_neg_grad(
                            V.col_rem, w, h, beta
                        )
                    w = ell_update(
                        w,
                        neg_raw,
                        kl_pos_W(h) if beta == 1 else None,
                        None if beta == 1
                        else nmf_ell_pos_grad(w, h, beta, want_H=False),
                    )
                if update_H:
                    neg_raw = ell_neg_grad(V.row_idx, V.row_val, h, w, beta)
                    if V.row_rem[2].shape[0]:
                        neg_raw = neg_raw + coo_rem_neg_grad(
                            V.row_rem, h, w, beta
                        )
                    h = ell_update(
                        h,
                        neg_raw,
                        kl_pos_H(w) if beta == 1 else None,
                        None if beta == 1
                        else nmf_ell_pos_grad(w, h, beta, want_H=True),
                    )
                return w, h
            if update_W:
                pos_pre = kl_pos_W(h) if beta == 1 else None
                w = _sp_factor_update(
                    lambda x: pos_neg(V, h, x, beta), w, gamma, l1_reg, l2_reg, pos_pre
                )
            if update_H:
                pos_pre = kl_pos_H(w) if beta == 1 else None
                h = _sp_factor_update(
                    lambda x: pos_neg(V, x, w, beta), h, gamma, l1_reg, l2_reg, pos_pre
                )
            return w, h

        (W, H), k, conv, trace = _converging_loop(
            one_iter, loss_of, (W, H), tol, max_iter, verbose,
            record=_record,
        )
        n_iter = jnp.where(conv, k * 10, max_iter)
        if trace is not None:
            return W, H, n_iter, k, trace[0]
        return W, H, n_iter

    jf = jax.jit(fit)
    if not _record:
        return jf

    def fit_posthoc(V, W, H):
        W, H, n_iter, k, losses = jf(V, W, H)
        _emit_recorded(k, losses)
        return W, H, n_iter

    return fit_posthoc


# --------------------------------------------------------------------------
# Hoyer sparseness-constrained fit (reference sparse_fit; nmf.py:411-599)
# --------------------------------------------------------------------------
def _backtrack_project(
    loss_baseline, loss_of_new, p, grad, stepsize, L1_scale
):
    """Backtracking line search with per-column Hoyer projection.

    Mirrors reference nmf.py:515-535: try ``p - ss*grad`` projected column-
    wise onto (L1_scale·norm_j, norm_j²); halve the step until the new loss
    is no worse, at most 10 attempts; the *last* candidate is kept even if
    it failed, and the step size is then grown by 1.2.
    """

    def attempt(ss):
        pnew = p - ss * grad
        pnew = proj_columns(pnew, L1_scale)
        return pnew, loss_of_new(pnew)

    pnew, new_loss = attempt(stepsize)

    def cond(st):
        i, ss, pn, nl = st
        return (i < 10) & (nl > loss_baseline)

    def body(st):
        i, ss, pn, nl = st
        ss = ss * 0.5
        pn, nl = attempt(ss)
        return i + 1, ss, pn, nl

    i, stepsize, pnew, new_loss = lax.while_loop(
        cond, body, (jnp.int32(1), stepsize, pnew, new_loss)
    )
    # the reference halves once more when the final (10th) attempt fails
    stepsize = jnp.where(new_loss > loss_baseline, stepsize * 0.5, stepsize)
    return pnew, stepsize * 1.2


@_record_bit_resolved
@lru_cache(maxsize=None)
def get_hoyer_fit(
    recon2: Optional[Callable],
    pos_neg: Optional[Callable],
    beta: float,
    max_iter: int,
    update_W: bool,
    update_H: bool,
    sW: Optional[float],
    sH: Optional[float],
    W_col_dim: int,
    H_col_dim: int,
    verbose: bool = False,
    _record: bool = False,
):
    """Returns jitted ``fit(V, W, H) -> (W, H, n_iter)``.

    Exactly one of ``recon2`` (dense target) / ``pos_neg`` (sparse target)
    is not None.  ``W_col_dim``/``H_col_dim`` are the flattened sizes of one
    rank column, needed for the Hoyer L1 targets (nmf.py:460-461, 469-470).
    """
    gamma = gamma_from_beta(beta)
    sparse = pos_neg is not None
    L1a = hoyer_l1_target(W_col_dim, sW) if sW is not None else None
    L1s = hoyer_l1_target(H_col_dim, sH) if sH is not None else None

    def fit(V, W, H):
        if sparse:
            V_norm = get_V_norm(V, beta)

            def loss_W(w, h):  # differentiable full loss as fn of factors
                pos, neg = pos_neg(V, h, w, beta)
                return V_norm + pos - neg

            loss_H = loss_W
        else:

            def loss_W(w, h):
                return beta_div(recon2(h, w), V, beta)

            loss_H = loss_W

        # initial projection of constrained factors to unit L2 (nmf.py:459-475)
        if sW is not None and update_W:
            W = proj_columns_explicit(W, L1a, 1.0)
        if sH is not None and update_H:
            H = proj_columns_explicit(H, L1s, 1.0)

        if not sparse:
            upd_W, upd_H = _default_updaters(recon2, beta, gamma, 0.0, 0.0)

        def one_iter(state):
            w, h, ssW, ssH = state
            if update_W:
                if sW is None:
                    if sparse:
                        pos_pre = kl_pos_W(h) if beta == 1 else None
                        w = _sp_factor_update(
                            lambda x: pos_neg(V, h, x, beta), w, gamma, 0.0, 0.0, pos_pre
                        )
                    else:
                        w = upd_W(V, w, h)
                else:
                    base, grad = jax.value_and_grad(loss_W)(w, h)
                    w, ssW = _backtrack_project(
                        base, lambda x: loss_W(x, h), w, grad, ssW, L1a
                    )
            if update_H:
                if sH is None:
                    if sparse:
                        pos_pre = kl_pos_H(w) if beta == 1 else None
                        h = _sp_factor_update(
                            lambda x: pos_neg(V, x, w, beta), h, gamma, 0.0, 0.0, pos_pre
                        )
                    else:
                        h = upd_H(V, w, h)
                else:
                    base, grad = jax.value_and_grad(loss_H, argnums=1)(w, h)
                    h, ssH = _backtrack_project(
                        base, lambda x: loss_H(w, x), h, grad, ssH, L1s
                    )
                # reference renorms W,H onto unit-H whenever H is trainable
                # (nmf.py:585, runs in both the MU and projection branches)
                w, h = renorm(w, h, "H")
            return w, h, ssW, ssH

        state = (W, H, jnp.float32(1.0), jnp.float32(1.0))
        record = _record
        losses = jnp.zeros((max_iter // 10,), jnp.float32)
        if verbose:
            # reference cadence: loss evaluated and displayed every 10
            # iterations only (nmf.py:587-598)
            def chunk(c, carry):
                s, losses = carry
                s = lax.fori_loop(0, 10, lambda i, t: one_iter(t), s)
                loss = jnp.sqrt(2.0 * loss_W(s[0], s[1]))
                if record:
                    losses = losses.at[c].set(loss)
                else:
                    _progress(True, c + 1, loss)
                return s, losses

            state, losses = lax.fori_loop(
                0, max_iter // 10, chunk, (state, losses)
            )
            state = lax.fori_loop(
                0, max_iter % 10, lambda i, t: one_iter(t), state
            )
        else:
            state = lax.fori_loop(
                0, max_iter, lambda i, t: one_iter(t), state
            )
        W, H, _, _ = state
        if record:
            return W, H, jnp.int32(max_iter), losses
        return W, H, jnp.int32(max_iter)

    jf = jax.jit(fit)
    if not _record:
        return jf

    def fit_posthoc(V, W, H):
        W, H, n_iter, losses = jf(V, W, H)
        # no early stop in this solver: every cadence chunk ran
        _emit_recorded(max_iter // 10, losses)
        return W, H, n_iter

    return fit_posthoc


@lru_cache(maxsize=None)
def get_batched_hoyer_fit(
    recon2: Callable,
    beta: float,
    max_iter: int,
    update_W: bool,
    update_H: bool,
    sW: Optional[float],
    sH: Optional[float],
    W_col_dim: int,
    H_col_dim: int,
):
    """Batched Hoyer fit: ``fit(V (B,...), W (B,...), H (B,...))
    -> (W, H, n_iter (B,))`` for dense targets.

    The Hoyer solver has no early stopping (it always runs ``max_iter``;
    reference nmf.py:587-599), so batching is a plain ``vmap`` of the
    single-problem solver — each problem's backtracking line searches run
    independently (``lax.while_loop`` batching freezes finished lanes), so
    every trajectory matches what it would do alone.
    """
    inner = get_hoyer_fit(
        recon2, None, beta, max_iter, update_W, update_H,
        sW, sH, W_col_dim, H_col_dim,
    )
    return jax.jit(jax.vmap(inner))


# --------------------------------------------------------------------------
# PLCA EM fit (reference plca.py:193-304)
# --------------------------------------------------------------------------
def _plca_marginal_sum(x):
    """Sum over all axes but the rank axis, keepdims — the probability
    normalizer (reference plca.py:23-31 ``get_norm``)."""
    x = jnp.asarray(x)
    if x.ndim > 1:
        axes = tuple(d for d in range(x.ndim) if d != 1)
        return jnp.sum(x, axis=axes, keepdims=True)
    return jnp.sum(x)


def _threshold_eps(x):
    """``F.threshold(x, eps, eps)``: replace values <= eps with eps."""
    return jnp.where(x > eps, x, eps)


def alpha_is_active(alpha) -> bool:
    """Whether a Dirichlet prior hyperparameter differs from the neutral 1
    (array-valued alphas always count as active)."""
    return not (isinstance(alpha, (int, float)) and alpha == 1)


def _plca_em_iter(
    recon3, update_W, update_H, update_Z,
    W_alpha_active, H_alpha_active, Z_alpha_active,
    Vn, state, W_alpha, H_alpha, Z_alpha,
    h_marginal=None, h_mask=None, cotangents=None,
):
    """One EM iteration: a single VJP E-step (cotangent ``Vn/(WZH+eps)``,
    reference plca.py:252-253) + closed-form M-step renormalizations with
    optional Dirichlet MAP (plca.py:255-289).  Pure — shared by the single
    and batched solvers, and by the sequence-parallel SIPLCA solver, whose
    ``h_marginal`` psums the H marginal over the sharded time axis (the W/Z
    cotangents arrive already globally summed by shard_map's replication
    tracking; the H cotangent's halo frames route through the ppermute
    transpose inside the vjp) and ``h_mask`` re-zeroes auto-padded H
    entries after the Dirichlet-MAP adjustment — zero entries are EM fixed
    points under the multiplicative update, but ``h + (alpha - 1)`` (and
    the eps threshold) would inject mass into the padding and corrupt the
    psum'd marginal.

    ``cotangents`` (optional) replaces the VJP E-step with a fused engine
    ``(Vn, w, h, z) -> (gH, gW, gZ)`` — same math and eps placement, the
    recon/ratio computed tile-wise in VMEM (see :mod:`ops.fast_plca`)."""
    if h_marginal is None:
        h_marginal = _plca_marginal_sum
    w, h, z = state
    if cotangents is not None:
        gH, gW, gZ = cotangents(Vn, w, h, z)
    else:
        WZH, vjp = jax.vjp(lambda hh, ww, zz: recon3(hh, ww, zz), h, w, z)
        gH, gW, gZ = vjp(Vn / (WZH + eps))

    Z_prior = None
    if update_Z:
        z = z * jax.nn.relu(gZ)
        Z_prior = z
        if Z_alpha_active:
            z = _threshold_eps(z + (Z_alpha - 1.0))
        z = z / jnp.sum(z)

    if update_W:
        w = w * jax.nn.relu(gW)
        if Z_prior is None:
            W_divider = _plca_marginal_sum(w)
            Z_prior = W_divider.reshape(-1)
        else:
            W_divider = Z_prior.reshape((-1,) + (1,) * (w.ndim - 2))
        w = w / W_divider
        if W_alpha_active:
            w = _threshold_eps(w + (W_alpha - 1.0))
            w = w / _plca_marginal_sum(w)

    if update_H:
        h = h * jax.nn.relu(gH)
        if Z_prior is None:
            H_divider = h_marginal(h)
        else:
            H_divider = Z_prior.reshape((-1,) + (1,) * (h.ndim - 2))
        h = h / H_divider
        if H_alpha_active:
            h = _threshold_eps(h + (H_alpha - 1.0))
            if h_mask is not None:
                h = h * h_mask
            h = h / h_marginal(h)

    return w, h, z


@_record_bit_resolved
@lru_cache(maxsize=None)
def get_plca_fit(
    recon3: Callable,
    tol: float,
    max_iter: int,
    update_W: bool,
    update_H: bool,
    update_Z: bool,
    W_alpha_active: bool,
    H_alpha_active: bool,
    Z_alpha_active: bool,
    verbose: bool = False,
    em_engine: Optional[Callable] = None,
    _record: bool = False,
):
    """Returns jitted ``fit(V, W, H, Z, W_alpha, H_alpha, Z_alpha)
    -> (W, H, Z, n_iter, norm)``.

    One EM iteration is a single VJP with cotangent ``V/(WZH+eps)`` (the
    E-step; reference plca.py:252-253) followed by closed-form M-step
    marginal renormalizations with optional Dirichlet-MAP adjustment
    (plca.py:255-289).  ``V`` arrives unnormalized; normalization by its sum
    happens inside (plca.py:241-242).

    ``em_engine`` (optional, hashable factory) supplies fused E-step
    cotangents — e.g. :func:`ops.fast_plca.plca_em_engine_pallas` for the
    dense model; the loss cadence and M-step stay shared.
    """
    em_cotangents = em_engine() if em_engine is not None else None

    def fit(V, W, H, Z, W_alpha, H_alpha, Z_alpha):
        norm = jnp.sum(V)
        Vn = V / norm

        def log_probability(state):
            # posterior log-probability shown alongside the loss when
            # verbose (reference ``_log_probability``, plca.py:18-20)
            w, h, z = state
            WZH = recon3(h, w, z)
            lp = Vn.reshape(-1) @ jnp.log(WZH + eps).reshape(-1)
            lp = lp + jnp.sum(jnp.log(w + eps) * (W_alpha - 1.0))
            lp = lp + jnp.sum(jnp.log(h + eps) * (H_alpha - 1.0))
            lp = lp + jnp.sum(jnp.log(z + eps) * (Z_alpha - 1.0))
            return lp

        def loss_of(state):
            w, h, z = state
            WZH = recon3(h, w, z)
            return jnp.sqrt(2.0 * kl_div(WZH * norm, Vn * norm))

        def one_iter(state):
            return _plca_em_iter(
                recon3, update_W, update_H, update_Z,
                W_alpha_active, H_alpha_active, Z_alpha_active,
                Vn, state, W_alpha, H_alpha, Z_alpha,
                cotangents=em_cotangents,
            )

        (W, H, Z), k, conv, trace = _converging_loop(
            one_iter, loss_of, (W, H, Z), tol, max_iter, verbose,
            extra_of=log_probability, record=_record,
        )
        # reference returns the raw loop index: 10c-1 on early break,
        # max_iter-1 otherwise (plca.py:304)
        n_iter = jnp.where(conv, k * 10 - 1, max_iter - 1)
        if trace is not None:
            return W, H, Z, n_iter, norm, k, trace[0], trace[1]
        return W, H, Z, n_iter, norm

    jf = jax.jit(fit)
    if not _record:
        return jf

    def fit_posthoc(V, W, H, Z, W_alpha, H_alpha, Z_alpha):
        W, H, Z, n_iter, norm, k, losses, extras = jf(
            V, W, H, Z, W_alpha, H_alpha, Z_alpha
        )
        _emit_recorded(k, losses, extras)
        return W, H, Z, n_iter, norm

    return fit_posthoc


@lru_cache(maxsize=None)
def get_batched_plca_fit(
    recon3: Callable,
    tol: float,
    max_iter: int,
    update_W: bool,
    update_H: bool,
    update_Z: bool,
    W_alpha_active: bool,
    H_alpha_active: bool,
    Z_alpha_active: bool,
):
    """Batched EM: ``fit(V (B,...), W (B,...), H (B,...), Z (B,R), alphas)
    -> (W, H, Z, n_iter (B,), norm (B,))`` — vmapped iterations with
    per-problem early stopping (converged problems' factors freeze, so
    each trajectory matches running alone; same n_iter quirk)."""

    def fit(V, W, H, Z, W_alpha, H_alpha, Z_alpha):
        B = V.shape[0]
        norm = jnp.sum(V.reshape(B, -1), axis=1)
        Vn = V / norm.reshape((B,) + (1,) * (V.ndim - 1))

        def em_one(vn, w, h, z):
            return _plca_em_iter(
                recon3, update_W, update_H, update_Z,
                W_alpha_active, H_alpha_active, Z_alpha_active,
                vn, (w, h, z), W_alpha, H_alpha, Z_alpha,
            )

        one_iter = jax.vmap(em_one)

        def loss_one(vn, w, h, z, nrm):
            WZH = recon3(h, w, z)
            return jnp.sqrt(2.0 * kl_div(WZH * nrm, vn * nrm))

        loss_of = jax.vmap(loss_one)

        def masked(conv, old, new):
            m = conv.reshape((B,) + (1,) * (old.ndim - 1))
            return jnp.where(m, old, new)

        loss_init = loss_of(Vn, W, H, Z, norm)
        n_chunks = max_iter // 10
        rem = max_iter % 10

        def chunk_body(carry):
            w, h, z, prev, k, conv, n_iter = carry
            w2, h2, z2 = lax.fori_loop(
                0, 10, lambda i, s: one_iter(Vn, *s), (w, h, z)
            )
            w2 = masked(conv, w, w2)
            h2 = masked(conv, h, h2)
            z2 = masked(conv, z, z2)
            loss = loss_of(Vn, w2, h2, z2, norm)
            loss = jnp.where(conv, prev, loss)
            newly = (~conv) & ((prev - loss) / loss_init < tol)
            n_iter = jnp.where(newly, (k + 1) * 10 - 1, n_iter)
            return w2, h2, z2, loss, k + 1, conv | newly, n_iter

        def cond(carry):
            return (~jnp.all(carry[5])) & (carry[4] < n_chunks)

        carry0 = (
            W, H, Z, loss_init, jnp.int32(0),
            jnp.zeros((B,), bool), jnp.full((B,), max_iter - 1, jnp.int32),
        )
        W, H, Z, _, k, conv, n_iter = lax.while_loop(cond, chunk_body, carry0)
        if rem:
            w2, h2, z2 = lax.fori_loop(
                0, rem, lambda i, s: one_iter(Vn, *s), (W, H, Z)
            )
            W = masked(conv, W, w2)
            H = masked(conv, H, h2)
            Z = masked(conv, Z, z2)
        return W, H, Z, n_iter, norm

    return jax.jit(fit)
