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

__all__ = ["save", "load", "save_orbax", "load_orbax"]


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
