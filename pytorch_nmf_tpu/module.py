"""Minimal module/parameter system for stateful model wrappers.

The reference library leans on ``torch.nn.Module``/``torch.nn.Parameter`` for
parameter registration, ``state_dict`` checkpointing and train-time mutation
(SURVEY.md component #10).  JAX has no equivalent mutable-parameter machinery,
so this file supplies a deliberately small, TPU-friendly one:

* :class:`Parameter` — a mutable cell holding an immutable ``jax.Array``
  (``.data``), a ``requires_grad`` flag, and a ``.grad`` slot (populated by
  the trainers for the "grad = pos - neg = true β-divergence gradient"
  observable; reference ``torchnmf/trainer.py:98``).  It implements
  ``__jax_array__`` plus the common operator dunders, so it can be used
  directly inside traced JAX code; during differentiation the trainers
  temporarily *substitute* a tracer for its value via
  :meth:`Parameter.substituted` — the functional replacement for torch's
  ``requires_grad`` toggling.
* :class:`Module` — parameter/submodule registration, ``state_dict`` /
  ``load_state_dict`` (the checkpoint/resume mechanism, SURVEY.md §5), and a
  ``__call__`` → ``forward`` convention.
* :class:`Sequential` — model chaining, mirroring the reference's
  "Model Concatenation" pattern (docs/source/notes/intro.rst; used by
  tests/test_trainer.py:15-19 in the reference).

The solvers themselves are pure jitted functions over ``jax.Array`` pytrees
(see :mod:`pytorch_nmf_tpu.ops.solver`); models only use this machinery at
the Python boundary.
"""

import copy
from collections import OrderedDict
from contextlib import contextmanager
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Parameter", "Module", "Sequential", "manual_seed", "next_rng_key"]


# --------------------------------------------------------------------------
# Global RNG for parameter init (reference uses torch's global RNG;
# ``torch.randn(*size).abs()`` at nmf.py:221,234).  We keep an explicit,
# reseedable JAX key chain.  Deterministic by default.  Created lazily:
# importing the library must NOT initialize the XLA backend (multi-host
# programs must be able to call ``jax.distributed.initialize`` first).
# --------------------------------------------------------------------------
_GLOBAL_KEY = [None]


def manual_seed(seed: int) -> None:
    """Reset the global RNG used for shape-based parameter initialization."""
    _GLOBAL_KEY[0] = jax.random.key(seed)


def next_rng_key():
    """Split and return a fresh key from the global RNG chain."""
    if _GLOBAL_KEY[0] is None:
        _GLOBAL_KEY[0] = jax.random.key(0)
    _GLOBAL_KEY[0], sub = jax.random.split(_GLOBAL_KEY[0])
    return sub


class Parameter:
    """A mutable holder of an immutable ``jax.Array``.

    ``data`` is the current value; ``requires_grad`` marks it as trainable
    for the solvers and trainers; ``grad`` is populated by the trainers.
    """

    __slots__ = ("data", "requires_grad", "grad", "_override")

    def __init__(self, data, requires_grad: bool = True):
        self.data = jnp.asarray(data)
        self.requires_grad = bool(requires_grad)
        self.grad = None
        self._override = None

    # -- value access ------------------------------------------------------
    @property
    def value(self):
        """Current value; a tracer while inside a :meth:`substituted` scope."""
        return self.data if self._override is None else self._override

    @contextmanager
    def substituted(self, x):
        """Temporarily substitute ``x`` (typically a JAX tracer) for the value.

        This is the functional analogue of enabling autograd on a torch
        Parameter: inside the scope, any model forward that reads this
        parameter sees ``x`` and therefore becomes differentiable w.r.t. it.
        """
        prev = self._override
        self._override = x
        try:
            yield
        finally:
            self._override = prev

    def __jax_array__(self):
        return self.value

    # -- tensor-like conveniences -------------------------------------------
    @property
    def shape(self) -> Tuple[int, ...]:
        return self.value.shape

    @property
    def ndim(self) -> int:
        return self.value.ndim

    @property
    def dtype(self):
        return self.value.dtype

    @property
    def size(self) -> int:
        return self.value.size

    def numel(self) -> int:
        return int(np.prod(self.data.shape)) if self.data.shape else 1

    def __array__(self, dtype=None):
        a = np.asarray(self.data)
        return a.astype(dtype) if dtype is not None else a

    def __getitem__(self, idx):
        return self.value[idx]

    def __len__(self):
        return self.value.shape[0]

    def __repr__(self):
        return f"Parameter(shape={tuple(self.data.shape)}, requires_grad={self.requires_grad})"

    def __deepcopy__(self, memo):
        new = Parameter(self.data, self.requires_grad)
        new.grad = self.grad
        return new

    # arithmetic — delegate to the current value so Parameters compose
    # transparently inside user reconstruction code.
    def __add__(self, o):
        return self.value + o

    def __radd__(self, o):
        return o + self.value

    def __sub__(self, o):
        return self.value - o

    def __rsub__(self, o):
        return o - self.value

    def __mul__(self, o):
        return self.value * o

    def __rmul__(self, o):
        return o * self.value

    def __truediv__(self, o):
        return self.value / o

    def __rtruediv__(self, o):
        return o / self.value

    def __pow__(self, o):
        return self.value**o

    def __matmul__(self, o):
        return self.value @ o

    def __rmatmul__(self, o):
        return o @ self.value

    def __neg__(self):
        return -self.value

    def __ge__(self, o):
        return self.value >= o

    def __le__(self, o):
        return self.value <= o

    def __gt__(self, o):
        return self.value > o

    def __lt__(self, o):
        return self.value < o

    # elementwise like every other comparison above; hashing stays
    # object-identity (Parameters key caches and sets by identity)
    __hash__ = object.__hash__

    def __eq__(self, o):
        if isinstance(o, Parameter):
            o = o.value
        return self.value == o

    def __ne__(self, o):
        if isinstance(o, Parameter):
            o = o.value
        return self.value != o

    def sum(self, *a, **k):
        return self.value.sum(*a, **k)

    def min(self, *a, **k):
        return self.value.min(*a, **k)

    def max(self, *a, **k):
        return self.value.max(*a, **k)

    def reshape(self, *a, **k):
        return self.value.reshape(*a, **k)

    @property
    def T(self):
        return self.value.T


def as_array(x):
    """Convert Parameter / numpy / jax / torch inputs to a ``jax.Array``.

    torch tensors (duck-typed via ``detach``/``cpu``) are accepted so
    reference-shaped code can hand its existing data over unchanged —
    including tensors that require grad (detached first)."""
    if isinstance(x, Parameter):
        return x.value
    if hasattr(x, "detach") and hasattr(x, "cpu"):  # torch duck-type
        x = x.detach().cpu().numpy()
    return jnp.asarray(x)


def _to_param(v):
    """Factor-state dtype rule at the checkpoint/params boundary (lazy
    import: ``models._common`` imports from this module)."""
    from .models._common import to_param

    return to_param(v)


class Module:
    """Tiny registration/checkpoint container for model classes."""

    def __init__(self):
        object.__setattr__(self, "_parameters", OrderedDict())
        object.__setattr__(self, "_modules", OrderedDict())

    # -- attribute plumbing -------------------------------------------------
    def register_parameter(self, name: str, param: Optional[Parameter]) -> None:
        self._parameters[name] = param

    def __setattr__(self, name, value):
        if isinstance(value, Parameter):
            self._parameters[name] = value
        elif isinstance(value, Module):
            self._modules[name] = value
        elif name in getattr(self, "_parameters", {}):
            # torch parity (nn.Module.__setattr__): a plain array assigned
            # to a registered parameter name would silently shadow the
            # Parameter — fit/state_dict would keep using the old factor.
            # Assign ``model.W.data = new_W`` or a Parameter instead.
            raise TypeError(
                f"cannot assign {type(value).__name__!r} as parameter "
                f"{name!r} (Parameter expected; use .{name}.data = ... "
                "to rebind the value)"
            )
        else:
            object.__setattr__(self, name, value)

    def __getattr__(self, name):
        # only called when normal lookup fails
        params = object.__getattribute__(self, "_parameters")
        if name in params:
            return params[name]
        modules = object.__getattribute__(self, "_modules")
        if name in modules:
            return modules[name]
        raise AttributeError(
            f"'{type(self).__name__}' object has no attribute '{name}'"
        )

    # -- iteration ----------------------------------------------------------
    def parameters(self, recurse: bool = True) -> Iterator[Parameter]:
        for _, p in self.named_parameters(recurse=recurse):
            yield p

    def named_parameters(
        self, prefix: str = "", recurse: bool = True
    ) -> Iterator[Tuple[str, Parameter]]:
        for name, p in self._parameters.items():
            if p is not None:
                yield prefix + name, p
        if recurse:
            for mname, m in self._modules.items():
                yield from m.named_parameters(prefix=prefix + mname + ".")

    def children(self) -> Iterator["Module"]:
        yield from self._modules.values()

    # -- checkpointing --------------------------------------------------------
    def state_dict(self) -> "OrderedDict[str, jax.Array]":
        return OrderedDict((k, p.data) for k, p in self.named_parameters())

    def load_state_dict(self, state, strict: bool = True) -> None:
        """Load parameter values by name.  ``strict=True`` (default) raises
        on missing or unexpected keys; ``strict=False`` ignores both."""
        own = dict(self.named_parameters())
        if strict:
            missing = sorted(set(own) - set(state))
            if missing:
                raise KeyError(f"Missing key(s) in state_dict: {missing}")
        for k, v in state.items():
            if k not in own:
                if strict:
                    raise KeyError(f"Unexpected key in state_dict: {k!r}")
                continue
            if tuple(own[k].data.shape) != tuple(jnp.shape(v)):
                raise ValueError(
                    f"Shape mismatch for {k!r}: "
                    f"{tuple(own[k].data.shape)} vs {tuple(jnp.shape(v))}"
                )
            own[k].data = _to_param(v)

    def zero_grad(self) -> None:
        for p in self.parameters():
            p.grad = None

    # -- call convention -------------------------------------------------------
    def forward(self, *args, **kwargs):
        raise NotImplementedError

    def __call__(self, *args, **kwargs):
        return self.forward(*args, **kwargs)

    # -- functionalization -------------------------------------------------------
    def pure_call(self):
        """Export this module as ``(fn, params)`` for the functional APIs.

        ``params`` is a dict of the current parameter values keyed by
        dotted names; ``fn(params, *args, **kwargs)`` runs ``forward`` with
        those values substituted — pure in ``params``, so it composes with
        ``jax.jit`` / ``jax.grad`` and the trainer cores in
        :mod:`pytorch_nmf_tpu.ops.trainer_core`::

            fn, params = model.pure_call()
            step = jax.jit(lambda p, v: betamu_step(
                lambda q: fn(q, None), p, v, beta=1))
        """
        import contextlib

        named = dict(self.named_parameters())

        def fn(params, *args, **kwargs):
            with contextlib.ExitStack() as stack:
                for name, value in params.items():
                    stack.enter_context(named[name].substituted(value))
                return self.forward(*args, **kwargs)

        return fn, {n: p.data for n, p in named.items()}

    def load_params(self, params) -> None:
        """Write a ``pure_call``-style params dict back into the module."""
        named = dict(self.named_parameters())
        for name, value in params.items():
            named[name].data = _to_param(value)

    def __deepcopy__(self, memo):
        new = object.__new__(type(self))
        object.__setattr__(new, "_parameters", OrderedDict())
        object.__setattr__(new, "_modules", OrderedDict())
        for k, v in self.__dict__.items():
            if k in ("_parameters", "_modules"):
                continue
            object.__setattr__(new, k, copy.deepcopy(v, memo))
        for k, p in self._parameters.items():
            new._parameters[k] = copy.deepcopy(p, memo) if p is not None else None
        for k, m in self._modules.items():
            new._modules[k] = copy.deepcopy(m, memo)
        return new

    # -- repr ----------------------------------------------------------------
    def extra_repr(self) -> str:
        return ""

    def __repr__(self):
        lines = []
        extra = self.extra_repr()
        for name, m in self._modules.items():
            mod_str = repr(m)
            mod_str = "\n".join(
                "  " + line for line in mod_str.splitlines()
            )
            lines.append(f"({name}): {mod_str.strip()}")
        main = type(self).__name__ + "(" + extra
        if lines:
            main += "\n" + "\n".join("  " + ln for ln in lines) + "\n"
        main += ")"
        return main


class Sequential(Module):
    """Chain modules: the output of one becomes the first input of the next.

    Mirrors the reference's composed-model pattern where an upstream NMF's
    output acts as the activation ``H`` of the next stage
    (reference tests/test_trainer.py:15-19).
    """

    def __init__(self, *modules: Module):
        super().__init__()
        for i, m in enumerate(modules):
            self._modules[str(i)] = m

    def __iter__(self):
        return iter(self._modules.values())

    def __getitem__(self, idx):
        return list(self._modules.values())[idx]

    def forward(self, x=None):
        for m in self._modules.values():
            x = m(x)
        return x
