r"""Optimizer-style trainers for composed models.

TPU-native re-design of the reference trainer layer (torchnmf/trainer.py):

* :class:`BetaMu` — the classic coordinate-wise multiplicative updater for
  *arbitrary composed* non-negative models (chained NMFs, source-filter
  models, ...).  Where the reference re-enables autograd one parameter at a
  time and back-propagates two cotangents through the user's closure
  (trainer.py:68-115), here each parameter is *substituted* with a JAX
  tracer (:meth:`Parameter.substituted`) so the closure becomes a pure
  function of that parameter, and one ``jax.vjp`` applies both cotangents.
  Semantics match the reference observable-for-observable, including
  leaving ``p.grad = pos - neg`` — the true β-divergence gradient
  (trainer.py:98; asserted by reference tests/test_trainer.py:54-73).
* :class:`SparsityProj` — Hoyer sparseness-constrained projected gradient
  with backtracking line search over the whole parameter group
  (trainer.py:124-190).

Both keep the reference's ``step(closure)`` interface and param-group
hyperparameters.  The coordinate-wise closure re-evaluation is inherently
sequential (that is the algorithm); each per-parameter VJP is still a traced
XLA computation, so the heavy math runs on the TPU.
"""

from typing import Callable

import jax
import jax.numpy as jnp

from .constants import eps
from .module import Parameter
from .ops.mu import gamma_from_beta, mu_cotangents
from .ops.projection import proj_columns

__all__ = ["BetaMu", "SparsityProj"]


def _output_depends_on_input(f, x) -> bool:
    """True when ``f(x)``'s primary output is data-dependent on ``x``.

    The functional analogue of the reference's ``WH.requires_grad`` check
    (trainer.py:75-77): abstractly trace ``f`` and walk the jaxpr's
    reachability from the input variable to the first output.  Conservative
    on opaque sub-jaxprs (any reachable input marks all outputs reachable),
    and assumes dependence if the analysis fails.
    """
    from jax.extend.core import Literal

    try:
        closed = jax.make_jaxpr(f)(x)
    except Exception:
        return True
    jaxpr = closed.jaxpr
    reachable = set(jaxpr.invars)
    for eqn in jaxpr.eqns:
        if any(
            not isinstance(a, Literal) and a in reachable
            for a in eqn.invars
        ):
            reachable.update(eqn.outvars)
    out = jaxpr.outvars[0]
    return not isinstance(out, Literal) and out in reachable


def _outputs_depend_on_inputs(f, xs):
    """Per-input dependence of ``f(xs)``'s primary output, in one trace.

    ``xs`` is a list of arrays; returns ``[bool] * len(xs)``.  Same
    conservative jaxpr reachability as :func:`_output_depends_on_input`,
    but tracks a bitmask of reaching inputs per variable so one
    ``make_jaxpr`` covers every parameter.  Assumes full dependence when
    the trace fails.
    """
    from jax.extend.core import Literal

    try:
        closed = jax.make_jaxpr(f)(xs)
    except Exception:
        return [True] * len(xs)
    jaxpr = closed.jaxpr
    masks = {v: 1 << i for i, v in enumerate(jaxpr.invars)}
    for eqn in jaxpr.eqns:
        m = 0
        for a in eqn.invars:
            if not isinstance(a, Literal):
                m |= masks.get(a, 0)
        if m:
            for ov in eqn.outvars:
                masks[ov] = masks.get(ov, 0) | m
    out = jaxpr.outvars[0]
    om = 0 if isinstance(out, Literal) else masks.get(out, 0)
    return [bool(om >> i & 1) for i in range(len(xs))]


def _closure_fingerprint(closure, optimized_params=()):
    """Identity key for a user closure: its code object plus the ids of
    everything it captures — cells, referenced globals, AND default
    arguments (``lambda V=V: ...`` puts the capture in ``__defaults__``,
    not ``__closure__``).  Captured Modules/Parameters additionally
    contribute the ids of their current ``.data`` arrays, so rebinding a
    non-optimized parameter between steps (``model.W.data = new_W``)
    retraces instead of silently reusing baked constants.

    Two lambdas created on the same source line capturing the same objects
    compare equal — the common ``for _ in range(n): trainer.step(lambda:
    (V, model()))`` pattern hits the compiled cache.  Returns
    ``(key, refs)`` where ``refs`` must be kept alive alongside the cache
    entry (a strong reference pins each id against reuse), or ``None`` when
    the callable is not introspectable (fall back to the eager path).

    Known limit (documented): arrays mutated IN PLACE (e.g. refilling a
    captured numpy buffer) keep their id and will NOT retrigger tracing —
    pass fresh arrays or use the functional trainer cores for that pattern.
    """
    code = getattr(closure, "__code__", None)
    if code is None:
        return None
    refs = []
    for c in closure.__closure__ or ():
        try:
            v = c.cell_contents
        except ValueError:  # empty cell (e.g. self-referential def)
            continue
        if v is not closure:
            refs.append(v)
    refs.extend(getattr(closure, "__defaults__", None) or ())
    globs = getattr(closure, "__globals__", {})
    refs.extend(globs[n] for n in code.co_names if n in globs)
    # bound methods capture through the instance (``self.V``), not cells:
    # the instance and its attribute values join the key, so rebinding
    # ``obj.V = new_target`` between steps misses the cache instead of
    # replaying a sweep with the old target baked in as a constant
    self_obj = getattr(closure, "__self__", None)
    if self_obj is not None:
        refs.append(self_obj)
        refs.extend(getattr(self_obj, "__dict__", {}).values())
    # data ids of any captured NON-OPTIMIZED Parameter (directly or inside a
    # captured Module): their values are baked constants, so rebinding
    # .data must miss the cache.  The optimizer's own parameters are jit
    # arguments (substituted fresh every step) — including them would
    # defeat the cache, since the optimizer rebinds them each step.
    from .module import Module

    managed = {id(p) for p in optimized_params}
    data_refs = []
    for r in refs:
        if isinstance(r, Parameter) and id(r) not in managed:
            data_refs.append(r.data)
        elif isinstance(r, Module):
            data_refs.extend(
                p.data for p in r.parameters() if id(p) not in managed
            )
    refs = refs + data_refs
    key = (code,) + tuple(id(r) for r in refs)
    return key, refs


# compiled-step cache: bounded LRU so long-lived optimizers over many
# distinct closures do not pin unbounded captured data (each entry's refs
# deliberately keep the captured objects alive while cached)
_STEP_CACHE_MAX = 8


def _cache_get(cache, key):
    entry = cache.get(key)
    if entry is not None:
        cache.move_to_end(key)
    return entry


def _cache_put(cache, key, entry):
    cache[key] = entry
    cache.move_to_end(key)
    while len(cache) > _STEP_CACHE_MAX:
        cache.popitem(last=False)


def _substitute_all(params, vals):
    """ExitStack substituting every Parameter with the matching value."""
    import contextlib

    stack = contextlib.ExitStack()
    for p, v in zip(params, vals):
        stack.enter_context(p.substituted(v))
    return stack


class _Optimizer:
    """Minimal param-group container mirroring ``torch.optim.Optimizer``."""

    def __init__(self, params, defaults: dict):
        self.defaults = defaults
        self.param_groups = []
        params = list(params)
        if len(params) == 0:
            raise ValueError("optimizer got an empty parameter list")
        if isinstance(params[0], dict):
            for g in params:
                group = dict(defaults)
                group.update(g)
                group["params"] = list(group["params"])
                self.add_param_group(group)
        else:
            group = dict(defaults)
            group["params"] = params
            self.add_param_group(group)

    def add_param_group(self, group: dict):
        for p in group["params"]:
            if not isinstance(p, Parameter):
                raise TypeError(
                    f"optimizer can only optimize Parameters, got {type(p)}"
                )
        self.param_groups.append(group)

    def zero_grad(self):
        for group in self.param_groups:
            for p in group["params"]:
                p.grad = None


class BetaMu(_Optimizer):
    r"""Multiplicative updater minimizing the β-divergence of any composed
    non-negative model (reference trainer.py:7-121).

    Args:
        params: iterable of :class:`Parameter` or param-group dicts.
        beta: β-divergence to minimize. Default 1.
        l1_reg / l2_reg / orthogonal: regularization penalties added to the
            MU denominator (reference trainer.py:100-106).

    ``step(closure)`` expects ``closure() -> (target, predict)``.  The
    closure is re-evaluated once per parameter (coordinate-wise MU), with
    all *other* parameters held at their current values — exactly the
    reference cost model (trainer.py:73).
    """

    def __init__(self, params, beta=1, l1_reg=0, l2_reg=0, orthogonal=0,
                 jit_compile=True):
        if not 0.0 <= l1_reg:
            raise ValueError(f"Invalid l1_reg value: {l1_reg}")
        if not 0.0 <= l2_reg:
            raise ValueError(f"Invalid l2_reg value: {l2_reg}")
        if not 0.0 <= orthogonal:
            raise ValueError(f"Invalid orthogonal value: {orthogonal}")
        super().__init__(
            params,
            dict(beta=beta, l1_reg=l1_reg, l2_reg=l2_reg, orthogonal=orthogonal),
        )
        self.jit_compile = bool(jit_compile)
        from collections import OrderedDict

        self._step_cache = OrderedDict()

    # -- compiled path -------------------------------------------------------
    def _all_params_and_hypers(self):
        params, hypers = [], []
        for group in self.param_groups:
            for p in group["params"]:
                params.append(p)
                hypers.append((
                    group["beta"], group["l1_reg"], group["l2_reg"],
                    group["orthogonal"],
                ))
        return params, hypers

    def _build_sweep(self, closure, params, hypers):
        """Trace the closure once to derive the per-parameter dependence
        mask, then express the FULL coordinate-wise sweep as one traceable
        function ``sweep(vals) -> (updated_masked, grads_masked)``.
        Everything the closure captures besides the optimizer's parameters
        is baked in as compile-time constants — sound because the cache key
        pins the identity of every captured object."""
        vals0 = [p.data for p in params]

        def probe(vals):
            with _substitute_all(params, vals):
                _, WH = closure()
            return WH

        deps = _outputs_depend_on_inputs(probe, vals0)
        mask = [p.requires_grad and d for p, d in zip(params, deps)]

        def sweep(vals):
            cur = list(vals)
            grads = [None] * len(cur)
            for i in range(len(cur)):
                if not mask[i]:
                    continue
                beta, l1_reg, l2_reg, ortho = hypers[i]
                gamma = gamma_from_beta(beta)

                def f(x, _i=i):
                    vs = list(cur)
                    vs[_i] = x
                    with _substitute_all(params, vs):
                        V, WH = closure()
                    return WH, jnp.asarray(V)

                WH, vjp, V = jax.vjp(f, cur[i], has_aux=True)
                # β-specific cotangent pair; β=1 uses ones for the
                # positive side (reference trainer.py:83)
                neg_cot, pos_cot = mu_cotangents(
                    V, WH, beta, kl_pos_ones=True
                )

                neg_raw = vjp(neg_cot)[0]
                pos_raw = vjp(pos_cot)[0]
                neg = jax.nn.relu(neg_raw)
                pos = jax.nn.relu(pos_raw)
                grads[i] = pos_raw - neg

                p_val = cur[i]
                if l1_reg > 0:
                    pos = pos + l1_reg
                if l2_reg > 0:
                    pos = pos + l2_reg * p_val
                if ortho > 0:
                    pos = pos + ortho * (
                        jnp.sum(p_val, axis=1, keepdims=True) - p_val
                    )
                multiplier = (neg + eps) / (pos + eps)
                if gamma != 1:
                    multiplier = multiplier**gamma
                cur[i] = p_val * multiplier
            updated = [cur[i] for i in range(len(cur)) if mask[i]]
            out_grads = [grads[i] for i in range(len(cur)) if mask[i]]
            return updated, out_grads

        return sweep, mask

    def _build_step(self, closure, params, hypers):
        sweep, mask = self._build_sweep(closure, params, hypers)
        return jax.jit(sweep), mask

    def _build_run(self, closure, params, hypers):
        """Compile ``n`` coordinate-wise sweeps as ONE on-device loop.

        A ``lax.while_loop`` carries the full parameter list (plus the
        final sweep's gradients), so the step count is a *dynamic* scalar —
        one compilation serves every ``steps`` value.  Each loop iteration
        is the exact jaxpr :meth:`_build_step` compiles, so ``run(c, n)``
        reproduces ``n`` ``step(c)`` calls without ``n`` host dispatches.
        """
        sweep, mask = self._build_sweep(closure, params, hypers)
        mask_idx = [i for i, m in enumerate(mask) if m]

        def run_fn(vals, n):
            def merge(cur, updated):
                out = list(cur)
                for j, i in enumerate(mask_idx):
                    out[i] = updated[j]
                return out

            init_grads = [jnp.zeros_like(vals[i]) for i in mask_idx]

            def body(state):
                k, cur, _ = state
                updated, grads = sweep(cur)
                return k + 1, merge(cur, updated), grads

            _, final, grads = jax.lax.while_loop(
                lambda s: s[0] < n, body,
                (jnp.int32(0), list(vals), init_grads),
            )
            return [final[i] for i in mask_idx], grads

        return jax.jit(run_fn), mask

    def _step_compiled(self, closure, key, refs):
        params, hypers = self._all_params_and_hypers()
        full_key = key + (
            tuple(id(p) for p in params),
            tuple(p.requires_grad for p in params),
            tuple((tuple(p.data.shape), str(p.data.dtype)) for p in params),
            tuple(hypers),
        )
        entry = _cache_get(self._step_cache, full_key)
        if entry is None:
            jitted, mask = self._build_step(closure, params, hypers)
            # strong refs pin the captured objects' ids for the cache's life
            entry = (jitted, mask, refs, params)
            _cache_put(self._step_cache, full_key, entry)
        jitted, mask, _, _ = entry
        updated, grads = jitted([p.data for p in params])
        it = iter(range(len(updated)))
        for p, m in zip(params, mask):
            if m:
                j = next(it)
                p.data = updated[j]
                p.grad = grads[j]
        return None

    def _run_compiled(self, closure, steps, key, refs):
        params, hypers = self._all_params_and_hypers()
        full_key = ("run",) + key + (
            tuple(id(p) for p in params),
            tuple(p.requires_grad for p in params),
            tuple((tuple(p.data.shape), str(p.data.dtype)) for p in params),
            tuple(hypers),
        )
        entry = _cache_get(self._step_cache, full_key)
        if entry is None:
            jitted, mask = self._build_run(closure, params, hypers)
            entry = (jitted, mask, refs, params)
            _cache_put(self._step_cache, full_key, entry)
        jitted, mask, _, _ = entry
        updated, grads = jitted(
            [p.data for p in params], jnp.int32(steps)
        )
        it = iter(range(len(updated)))
        for p, m in zip(params, mask):
            if m:
                j = next(it)
                p.data = updated[j]
                p.grad = grads[j]
        return None

    def step(self, closure: Callable):
        """Performs a single coordinate-wise MU pass over all parameters.

        The full sweep runs as ONE compiled XLA program when the closure is
        introspectable (cached per closure structure + parameter set);
        otherwise falls back to the eager per-parameter VJP path with
        identical semantics.
        """
        if self.jit_compile:
            opt_params = [p for g in self.param_groups for p in g["params"]]
            fp = _closure_fingerprint(closure, opt_params)
            if fp is not None:
                return self._step_compiled(closure, *fp)
        return self._step_eager(closure)

    def run(self, closure: Callable, steps: int):
        """Equivalent to calling :meth:`step` ``steps`` times, compiled to
        ONE on-device loop (TPU-native extension; no reference analogue —
        the reference user loops ``trainer.step`` from Python,
        /root/reference/README.md:96-101).

        The step count is a dynamic scalar of a single compiled
        ``lax.while_loop`` program, so changing ``steps`` does not
        recompile.  After return, each updated parameter's ``.grad`` holds
        the FINAL sweep's β-divergence gradient, exactly as a last
        ``step()`` would leave it.  Falls back to Python-looped steps when
        the closure is not introspectable or ``jit_compile=False``.
        """
        steps = int(steps)
        if steps < 0:
            raise ValueError(f"Invalid steps value: {steps}")
        if steps == 0:
            return None
        if self.jit_compile:
            opt_params = [p for g in self.param_groups for p in g["params"]]
            fp = _closure_fingerprint(closure, opt_params)
            if fp is not None:
                return self._run_compiled(closure, steps, *fp)
        for _ in range(steps):
            self._step_eager(closure)
        return None

    def _step_eager(self, closure: Callable):
        for group in self.param_groups:
            beta = group["beta"]
            l1_reg = group["l1_reg"]
            l2_reg = group["l2_reg"]
            ortho = group["orthogonal"]
            gamma = gamma_from_beta(beta)

            for p in group["params"]:
                if not p.requires_grad:
                    continue

                def f(x):
                    with p.substituted(x):
                        V, WH = closure()
                    return WH, jnp.asarray(V)

                # Skip parameters the closure output does not depend on —
                # the reference's ``if not WH.requires_grad: continue``
                # (trainer.py:75-77); updating a disconnected parameter
                # would crush it to ~eps under regularization.
                if not _output_depends_on_input(f, p.data):
                    continue

                WH, vjp, V = jax.vjp(f, p.data, has_aux=True)

                # β-specific cotangent pair; β=1 uses ones for the positive
                # side here (reference trainer.py:83), unlike the fit solver.
                neg_cot, pos_cot = mu_cotangents(
                    V, WH, beta, kl_pos_ones=True
                )

                neg_raw = vjp(neg_cot)[0]
                pos_raw = vjp(pos_cot)[0]
                neg = jax.nn.relu(neg_raw)
                pos = jax.nn.relu(pos_raw)

                # observable: the true β-divergence gradient
                # (reference trainer.py:93-98)
                p.grad = pos_raw - neg

                if l1_reg > 0:
                    pos = pos + l1_reg
                if l2_reg > 0:
                    pos = pos + l2_reg * p.data
                if ortho > 0:
                    pos = pos + ortho * (
                        jnp.sum(p.data, axis=1, keepdims=True) - p.data
                    )

                pos = pos + eps
                neg = neg + eps
                multiplier = neg / pos
                if gamma != 1:
                    multiplier = multiplier**gamma
                p.data = p.data * multiplier
        return None


class SparsityProj(_Optimizer):
    r"""Hoyer sparseness-constrained projected gradient
    (reference trainer.py:124-190).

    Args:
        params: parameters to constrain.
        sparsity: target Hoyer sparseness in (0, 1).
        dim: axis indexing the rank columns. Default 1.
        max_iter: max closure evaluations per step (backtracking budget).

    ``step(closure)`` expects ``closure() -> loss``.
    """

    def __init__(self, params, sparsity, dim=1, max_iter=10, jit_compile=True):
        if not 0.0 < sparsity < 1.0:
            raise ValueError(f"Invalid sparsity value: {sparsity}")
        super().__init__(
            params, dict(sparsity=sparsity, lr=1, dim=dim, max_iter=max_iter)
        )
        self.jit_compile = bool(jit_compile)
        from collections import OrderedDict

        self._step_cache = OrderedDict()

    # -- compiled path -------------------------------------------------------
    def _build_sweep(self, closure):
        from .ops.trainer_core import sparsity_proj_step

        all_params = [p for g in self.param_groups for p in g["params"]]
        vals0 = [p.data for p in all_params]

        def probe(vals):
            with _substitute_all(all_params, vals):
                return jnp.asarray(closure())

        deps = _outputs_depend_on_inputs(probe, vals0)
        mask = [p.requires_grad and d for p, d in zip(all_params, deps)]

        # group -> indices (into all_params) of its active params
        group_idxs = []
        k = 0
        for g in self.param_groups:
            idxs = []
            for _ in g["params"]:
                if mask[k]:
                    idxs.append(k)
                k += 1
            group_idxs.append(idxs)
        statics = [
            (g["sparsity"], g["dim"], g["max_iter"]) for g in self.param_groups
        ]

        def sweep(vals, lrs):
            cur = list(vals)
            new_lrs = []
            grads_out = [None] * len(cur)
            loss = probe(cur)  # loss when no group has active params
            for idxs, (sparsity, dim, max_iter), lr in zip(
                group_idxs, statics, lrs
            ):
                if not idxs:
                    new_lrs.append(jnp.asarray(lr, jnp.float32))
                    continue

                def loss_fn(group_vals, _idxs=tuple(idxs)):
                    vs = list(cur)
                    for j, gi in enumerate(_idxs):
                        vs[gi] = group_vals[j]
                    with _substitute_all(all_params, vs):
                        return jnp.asarray(closure())

                new_vals, new_lr, loss, grads = sparsity_proj_step(
                    loss_fn, [cur[gi] for gi in idxs], lr,
                    sparsity, dim, max_iter, return_grads=True,
                )
                for j, gi in enumerate(idxs):
                    cur[gi] = new_vals[j]
                    grads_out[gi] = grads[j]
                new_lrs.append(new_lr)
            updated = [cur[i] for i in range(len(cur)) if mask[i]]
            out_grads = [grads_out[i] for i in range(len(cur)) if mask[i]]
            return updated, new_lrs, loss, out_grads

        return sweep, mask, all_params

    def _build_step(self, closure):
        sweep, mask, all_params = self._build_sweep(closure)
        return jax.jit(sweep), mask, all_params

    def _build_run(self, closure):
        """Compile ``n`` projected-gradient steps (each with its own
        backtracking line search and the reference's cross-step lr
        grow/shrink schedule) as ONE on-device ``lax.while_loop`` with a
        dynamic step count — the exact per-step jaxpr of
        :meth:`_build_step`, minus the per-step host dispatch."""
        sweep, mask, all_params = self._build_sweep(closure)
        mask_idx = [i for i, m in enumerate(mask) if m]

        def run_fn(vals, lrs, n):
            def one(cur, lrs):
                updated, new_lrs, loss, grads = sweep(cur, lrs)
                merged = list(cur)
                for j, i in enumerate(mask_idx):
                    merged[i] = updated[j]
                return merged, new_lrs, loss, grads

            # first step outside the loop fixes the carry's dtypes/shapes
            # (run() guarantees n >= 1)
            cur, lrs, loss, grads = one(list(vals), lrs)

            def body(state):
                k, cur, lrs, _, _ = state
                cur, lrs, loss, grads = one(cur, lrs)
                return k + 1, cur, lrs, loss, grads

            _, cur, lrs, loss, grads = jax.lax.while_loop(
                lambda s: s[0] < n, body,
                (jnp.int32(1), cur, lrs, loss, grads),
            )
            return [cur[i] for i in mask_idx], lrs, loss, grads

        return jax.jit(run_fn), mask, all_params

    def _step_compiled(self, closure, key, refs):
        all_params = [p for g in self.param_groups for p in g["params"]]
        full_key = key + (
            tuple(id(p) for p in all_params),
            tuple(p.requires_grad for p in all_params),
            tuple((tuple(p.data.shape), str(p.data.dtype)) for p in all_params),
            tuple((g["sparsity"], g["dim"], g["max_iter"])
                  for g in self.param_groups),
        )
        entry = _cache_get(self._step_cache, full_key)
        if entry is None:
            jitted, mask, params = self._build_step(closure)
            entry = (jitted, mask, refs, params)
            _cache_put(self._step_cache, full_key, entry)
        jitted, mask, _, params = entry
        lrs = [jnp.float32(g["lr"]) for g in self.param_groups]
        updated, new_lrs, loss, grads = jitted([p.data for p in params], lrs)
        j = 0
        for p, m in zip(params, mask):
            if m:
                p.data = updated[j]
                p.grad = grads[j]
                j += 1
        for g, lr in zip(self.param_groups, new_lrs):
            g["lr"] = float(lr)
        return loss

    def _run_compiled(self, closure, steps, key, refs):
        all_params = [p for g in self.param_groups for p in g["params"]]
        full_key = ("run",) + key + (
            tuple(id(p) for p in all_params),
            tuple(p.requires_grad for p in all_params),
            tuple((tuple(p.data.shape), str(p.data.dtype)) for p in all_params),
            tuple((g["sparsity"], g["dim"], g["max_iter"])
                  for g in self.param_groups),
        )
        entry = _cache_get(self._step_cache, full_key)
        if entry is None:
            jitted, mask, params = self._build_run(closure)
            entry = (jitted, mask, refs, params)
            _cache_put(self._step_cache, full_key, entry)
        jitted, mask, _, params = entry
        lrs = [jnp.float32(g["lr"]) for g in self.param_groups]
        updated, new_lrs, loss, grads = jitted(
            [p.data for p in params], lrs, jnp.int32(steps)
        )
        j = 0
        for p, m in zip(params, mask):
            if m:
                p.data = updated[j]
                p.grad = grads[j]
                j += 1
        for g, lr in zip(self.param_groups, new_lrs):
            g["lr"] = float(lr)
        return loss

    def step(self, closure: Callable):
        """One projected-gradient step with backtracking line search.

        Compiled to a single XLA program when the closure is introspectable
        (cached per closure structure + parameter set); otherwise the eager
        path below runs the same algorithm.
        """
        if self.jit_compile:
            opt_params = [p for g in self.param_groups for p in g["params"]]
            fp = _closure_fingerprint(closure, opt_params)
            if fp is not None:
                return self._step_compiled(closure, *fp)
        return self._step_eager(closure)

    def run(self, closure: Callable, steps: int):
        """Equivalent to calling :meth:`step` ``steps`` times — including
        the lr schedule carried across steps — compiled to ONE on-device
        loop with a dynamic step count (TPU-native extension; the reference
        user loops ``trainer.step`` from Python).  Returns the final step's
        loss; each constrained parameter's ``.grad`` holds the final
        step's gradient.  Falls back to Python-looped steps when the
        closure is not introspectable or ``jit_compile=False``.
        """
        steps = int(steps)
        if steps < 0:
            raise ValueError(f"Invalid steps value: {steps}")
        if steps == 0:
            return None
        if self.jit_compile:
            opt_params = [p for g in self.param_groups for p in g["params"]]
            fp = _closure_fingerprint(closure, opt_params)
            if fp is not None:
                return self._run_compiled(closure, steps, *fp)
        loss = None
        for _ in range(steps):
            loss = self._step_eager(closure)
        return loss

    def _step_eager(self, closure: Callable):
        loss = None
        for group in self.param_groups:
            sparsity = group["sparsity"]
            lr = group["lr"]
            dim = group["dim"]
            max_iter = group["max_iter"]

            params = [p for p in group["params"] if p.requires_grad]

            # Skip parameters the closure's loss does not depend on — the
            # reference leaves those untouched (``p.grad is None`` check,
            # trainer.py:165-166); projecting them would silently mutate a
            # disconnected parameter.
            def _connected(p):
                def f1(x):
                    with p.substituted(x):
                        return jnp.asarray(closure())

                return _output_depends_on_input(f1, p.data)

            params = [p for p in params if _connected(p)]
            if not params:
                loss = closure()
                continue

            def f(datas):
                ctxs = [p.substituted(x) for p, x in zip(params, datas)]
                for c in ctxs:
                    c.__enter__()
                try:
                    return jnp.asarray(closure())
                finally:
                    for c in reversed(ctxs):
                        c.__exit__(None, None, None)

            init_loss, grads = jax.value_and_grad(f)([p.data for p in params])
            for p, g in zip(params, grads):
                p.grad = g

            for _ in range(max_iter):
                for p, g in zip(params, grads):
                    # projection targets use the norms of the *current*
                    # parameter, before this attempt's gradient step
                    # (reference trainer.py:170-177)
                    x = jnp.moveaxis(p.data, dim, 0)
                    x = x.reshape(p.data.shape[dim], -1)
                    norms = jnp.sqrt(jnp.sum(x * x, axis=1))
                    N = p.data.size // p.data.shape[dim]
                    L1 = N**0.5 * (1 - sparsity) + sparsity
                    stepped = p.data - lr * g
                    p.data = proj_columns(stepped, L1, axis=dim, norms=norms)

                loss = closure()
                if float(loss) <= float(init_loss):
                    break

                # the reference "undoes" by adding the step back onto the
                # *projected* value (trainer.py:183-184) — mirror exactly
                for p, g in zip(params, grads):
                    p.data = p.data + lr * g
                lr *= 0.5

            lr *= 1.2
            group["lr"] = lr
        return loss
