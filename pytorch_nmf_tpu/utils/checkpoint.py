"""Checkpoint / resume.

The reference's checkpoint story is ``nn.Module.state_dict()`` /
``load_state_dict()`` (SURVEY.md §5); resume is re-entering ``fit`` since
updates mutate factors in place.  The same semantics hold here — models
expose ``state_dict``/``load_state_dict`` — and this module adds durable
on-disk persistence:

* :func:`save` / :func:`load` — single-file ``.npz`` checkpoints (portable,
  dependency-free).
* :func:`save_orbax` / :func:`load_orbax` — orbax-checkpoint backed
  persistence for sharded arrays on real meshes (each host writes its
  shards), used when fitting on multi-chip topologies.  Optional: requires
  ``orbax-checkpoint``.
"""

import os
from collections import OrderedDict

import jax.numpy as jnp
import numpy as np

__all__ = [
    "save", "load", "save_orbax", "load_orbax",
    "checkpointed_fit", "checkpointed_plca_fit",
]


def _as_state(obj):
    """Accept a Module (uses its state_dict) or a plain mapping."""
    if hasattr(obj, "state_dict"):
        return obj.state_dict()
    return OrderedDict(obj)


def save(path: str, obj) -> None:
    """Save a model's (or mapping's) arrays to a single ``.npz`` file."""
    state = _as_state(obj)
    np.savez(path, **{k: np.asarray(v) for k, v in state.items()})


def load(path: str, model=None):
    """Load an ``.npz`` checkpoint; if ``model`` is given, load into it and
    return it, otherwise return the state mapping."""
    with np.load(path) as data:
        state = OrderedDict((k, jnp.asarray(data[k])) for k in data.files)
    if model is not None:
        model.load_state_dict(state)
        return model
    return state


_META_PREFIX = "__ckpt_"


def _run_id(model, V, tag: str, fit_kwargs) -> str:
    """Checkpoint identity: model class, target shape, every factor's
    shape and trainability, and the full fit configuration — two runs
    that would follow different trajectories must never pass each other's
    identity check."""
    shapes = ";".join(
        f"{k}{tuple(v.shape)}" for k, v in model.state_dict().items()
    )
    trainable = ",".join(
        str(int(p.requires_grad)) for p in model.parameters()
    )
    cfg = ",".join(f"{k}={fit_kwargs[k]!r}" for k in sorted(fit_kwargs))
    return (
        f"{type(model).__name__}|V{tuple(V.shape)}|{shapes}"
        f"|tr={trainable}|{tag}|{cfg}"
    )


def _ckpt_files(directory: str):
    try:
        names = sorted(
            n for n in os.listdir(directory)
            if n.startswith("ckpt_") and n.endswith(".npz")
        )
    except FileNotFoundError:
        return []
    return [os.path.join(directory, n) for n in names]


def checkpointed_fit(
    model, V, beta: float = 1, tol: float = 1e-4, max_iter: int = 200,
    every: int = 50, directory: str = "checkpoints", resume: bool = True,
    keep: int = 2, **fit_kwargs,
):
    """Long-running β-MU ``fit`` with periodic on-disk checkpoints and
    exact resume.

    Runs ``model.fit`` in segments of ``every`` iterations (each segment is
    one compiled on-device program — the only extra dispatch cost is one
    relay round-trip per segment) and persists the factors plus the
    convergence bookkeeping (iteration cursor, the initial loss of the
    whole run, the loss at the last boundary) after each segment.  A
    killed job re-enters with ``resume=True`` and continues from the last
    checkpoint with the SAME convergence baseline — the reference's
    stopping rule ``(prev - loss) / loss_init < tol`` (nmf.py:405) is
    evaluated at segment boundaries against the original ``loss_init``,
    so convergence decisions are checked at ``every``-iteration
    granularity rather than the in-segment 10-iteration cadence (in-fit
    early stop is disabled within segments to keep the cursor exact).

    Works for every β-MU model (``NMF`` and the deconvolutional family)
    with dense targets, and for ``NMF`` with
    :class:`~pytorch_nmf_tpu.ops.sparse.SparseCOO` targets (the only model
    with sparse support, as in the reference).  The checkpoint records a
    run identity (model/shape/rank/beta) and a converged flag, so resuming
    a finished run is a no-op and pointing at another run's directory
    raises instead of silently continuing it.  Returns the total number of
    iterations run across all sessions.
    """
    from ..metrics import beta_div
    from ..ops.sparse import SparseCOO, get_V_norm

    if every < 1:
        raise ValueError("every must be >= 1")
    os.makedirs(directory, exist_ok=True)

    is_sp = isinstance(V, SparseCOO)
    if is_sp:
        if type(model)._sp_pos_neg is None:
            raise NotImplementedError(
                f"{type(model).__name__} does not support sparse targets."
            )
        V_norm = get_V_norm(V, float(beta))
    run_id = _run_id(model, V, f"beta={float(beta)}", fit_kwargs)

    def current_loss():
        if is_sp:
            pos, neg = type(model)._sp_pos_neg(
                V, model.H.data, model.W.data, float(beta)
            )
            return float(jnp.sqrt(2.0 * (V_norm + pos - neg)))
        return float(jnp.sqrt(2.0 * beta_div(model(), V, float(beta))))

    def run_segment(seg):
        model.fit(V, beta, float("-inf"), seg, **fit_kwargs)

    return _checkpoint_loop(
        model, run_id, current_loss, run_segment,
        tol, max_iter, every, directory, resume, keep,
    )


def _checkpoint_loop(model, run_id, current_loss, run_segment,
                     tol, max_iter, every, directory, resume, keep):
    """Shared segmented-fit loop: resume (with identity and converged-flag
    checks), run compiled segments, persist atomically, prune, stop on the
    reference convergence rule against the original baseline."""
    done = 0
    loss_init = None
    prev_loss = None
    files = _ckpt_files(directory) if resume else []
    if files:
        with np.load(files[-1]) as data:
            # meta keys are read defensively so checkpoints from older
            # layout versions still resume (missing fields just disable
            # the corresponding check)
            if _META_PREFIX + "run_id" in data.files:
                stored_id = str(data[_META_PREFIX + "run_id"])
                if stored_id != run_id:
                    raise ValueError(
                        f"checkpoint directory {directory!r} belongs to a "
                        f"different run ({stored_id} != {run_id}); point "
                        "each fit at its own directory or pass resume=False"
                    )
            state = OrderedDict(
                (k, jnp.asarray(data[k])) for k in data.files
                if not k.startswith(_META_PREFIX)
            )
            missing = [
                k for k in ("iter", "loss_init", "prev_loss")
                if _META_PREFIX + k not in data.files
            ]
            if missing:
                raise ValueError(
                    f"checkpoint {files[-1]!r} lacks resume metadata "
                    f"({missing}); it was not written by checkpointed_fit "
                    "— pass resume=False or point at a segmented-fit "
                    "directory"
                )
            done = int(data[_META_PREFIX + "iter"])
            loss_init = float(data[_META_PREFIX + "loss_init"])
            prev_loss = float(data[_META_PREFIX + "prev_loss"])
            converged = bool(
                data[_META_PREFIX + "converged"]
            ) if _META_PREFIX + "converged" in data.files else False
            stored_tol = float(
                data[_META_PREFIX + "tol"]
            ) if _META_PREFIX + "tol" in data.files else None
        model.load_state_dict(state)
        # idempotent resume after a converged run — but only for the SAME
        # tolerance; a tighter tol re-evaluates at the next boundary
        if converged and stored_tol == tol:
            return done

    if loss_init is None:
        loss_init = current_loss()
        prev_loss = loss_init

    while done < max_iter:
        seg = min(every, max_iter - done)
        run_segment(seg)
        done += seg

        loss = current_loss()
        conv = (prev_loss - loss) / loss_init < tol
        state = {k: np.asarray(v) for k, v in model.state_dict().items()}
        state[_META_PREFIX + "iter"] = np.int64(done)
        state[_META_PREFIX + "loss_init"] = np.float64(loss_init)
        state[_META_PREFIX + "prev_loss"] = np.float64(loss)
        state[_META_PREFIX + "converged"] = np.bool_(conv)
        state[_META_PREFIX + "tol"] = np.float64(tol)
        state[_META_PREFIX + "run_id"] = np.str_(run_id)
        path = os.path.join(directory, f"ckpt_{done:08d}.npz")
        # the tmp name must NOT match the _ckpt_files pattern, or a crash
        # mid-write would leave a truncated file that poisons every
        # subsequent resume
        tmp = os.path.join(directory, f".tmp_ckpt_{done:08d}.npz")
        np.savez(tmp, **state)
        os.replace(tmp, path)
        for old in _ckpt_files(directory)[:-keep]:
            os.remove(old)

        if conv:
            break
        prev_loss = loss

    return done


def checkpointed_plca_fit(
    model, V, tol: float = 1e-4, max_iter: int = 200,
    every: int = 50, directory: str = "checkpoints", resume: bool = True,
    keep: int = 2, **fit_kwargs,
):
    """:func:`checkpointed_fit` for the PLCA family's EM ``fit``.

    Same segmented-persistence/resume semantics; the convergence metric is
    the reference's ``sqrt(2 * kl_div(WZH * norm, V))`` (plca.py:291-301)
    evaluated at segment boundaries against the original baseline.
    Returns ``(total_iterations, norm)``.  Re-entering ``fit`` is an exact
    resume because the factors stay probability-normalized between calls.
    """
    from ..metrics import kl_div

    if every < 1:
        raise ValueError("every must be >= 1")
    os.makedirs(directory, exist_ok=True)

    V = jnp.asarray(V)
    norm = jnp.sum(V)
    run_id = _run_id(model, V, "plca", fit_kwargs)

    def current_loss():
        return float(jnp.sqrt(2.0 * kl_div(model() * norm, V)))

    def run_segment(seg):
        model.fit(V, float("-inf"), seg, **fit_kwargs)

    done = _checkpoint_loop(
        model, run_id, current_loss, run_segment,
        tol, max_iter, every, directory, resume, keep,
    )
    return done, norm


def save_orbax(path: str, obj) -> None:
    """Persist via orbax-checkpoint (supports sharded jax.Arrays)."""
    import orbax.checkpoint as ocp

    state = {k: v for k, v in _as_state(obj).items()}
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state)
    ckptr.wait_until_finished()


def load_orbax(path: str, model=None):
    """Restore an orbax checkpoint; into ``model`` when given."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if model is not None:
        template = {k: v for k, v in model.state_dict().items()}
        state = ckptr.restore(os.path.abspath(path), target=template)
        model.load_state_dict(state)
        return model
    return ckptr.restore(os.path.abspath(path))
