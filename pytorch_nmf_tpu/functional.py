"""Functional API: pure, jittable entry points.

The stateful model classes mirror the reference's interface; this module is
the TPU-native face of the same machinery — explicit arrays in, new arrays
out, everything composable with ``jax.jit`` / ``vmap`` / sharding:

* :func:`nmf_fit` / :func:`nmfd_fit` / ... — dense β-divergence MU fits.
* :func:`plca_fit` — EM for the PLCA family.
* :func:`mu_update` — one generic MU step for any reconstruction closure.
* :func:`betamu_step` / :func:`sparsity_proj_step` — composed-model
  trainer cores over parameter pytrees.
* :func:`proj_func` — the Hoyer sparseness projection.
"""

from .models import nmf as _nmf_models
from .models._common import validate_target as _validate
from .models import plca as _plca_models
from .ops.mu import gamma_from_beta, mu_update, renorm  # noqa: F401
from .ops.projection import proj_func  # noqa: F401
from .ops.solver import (
    get_dense_fit,
    get_hoyer_fit,
    get_plca_fit,
    get_sparse_fit,
)
from .ops.sparse import SparseCOO
from .ops.streaming import streaming_nmf_fit  # noqa: F401
from .ops.trainer_core import betamu_step, sparsity_proj_step  # noqa: F401

__all__ = [
    "nmf_fit",
    "nmf_fit_batched",
    "streaming_nmf_fit",
    "nmfd_fit",
    "nmf2d_fit",
    "nmf3d_fit",
    "nmf_hoyer_fit",
    "nmf_hoyer_fit_batched",
    "plca_fit",
    "plca_fit_batched",
    "mu_update",
    "betamu_step",
    "sparsity_proj_step",
    "proj_func",
    "gamma_from_beta",
    "renorm",
]




def _params(*xs):
    """Factor-state dtype normalization shared with the model layer
    (``models/_common.to_param``): bf16 promotes to f32 — bfloat16 is a
    TARGET-storage knob, and the solvers' f32-pinned loop carries
    type-mismatch on bf16 state — while f64-under-x64 is honored."""
    from .models._common import to_param

    return tuple(to_param(x) for x in xs)


def _fit(model_cls, V, W, H, beta, tol, max_iter, update_W, update_H,
         l1_reg, l2_reg):
    _validate(V, beta)
    W, H = _params(W, H)
    if isinstance(V, SparseCOO):
        if model_cls._sp_pos_neg is None:
            raise NotImplementedError(
                f"{model_cls.__name__} does not support sparse targets"
            )
        from .ops.sparse import maybe_ell, should_densify

        densify = should_densify(V)
        ell_obj = None
        if not densify and model_cls._sp_ell_capable:
            ell_obj = maybe_ell(V)
        fit = get_sparse_fit(
            model_cls._sp_pos_neg, float(beta), float(tol), int(max_iter),
            update_W, update_H, float(l1_reg), float(l2_reg), False,
            densify, model_cls.reconstruct,
            (model_cls._updater_resolver()
             if densify and model_cls._updater_resolver is not None else None),
            ell_obj is not None,
        )
        if ell_obj is not None:
            V = ell_obj
    else:
        updater_factory = (
            model_cls._updater_resolver(dtype=getattr(V, "dtype", None))
            if model_cls._updater_resolver is not None
            else None
        )
        fit = get_dense_fit(
            model_cls.reconstruct, float(beta), float(tol), int(max_iter),
            update_W, update_H, float(l1_reg), float(l2_reg), False,
            updater_factory,
        )
    return fit(V, W, H)


def nmf_fit(V, W, H, beta=1, tol=1e-4, max_iter=200, update_W=True,
            update_H=True, l1_reg=0.0, l2_reg=0.0):
    """Fit ``V ≈ H Wᵀ``; returns ``(W, H, n_iter)``.  ``V`` may be dense or
    a :class:`SparseCOO`."""
    return _fit(_nmf_models.NMF, V, W, H, beta, tol, max_iter, update_W,
                update_H, l1_reg, l2_reg)


def nmf_fit_batched(V, W, H, beta=1, tol=1e-4, max_iter=200, update_W=True,
                    update_H=True, l1_reg=0.0, l2_reg=0.0, model_cls=None):
    """Fit MANY factorizations in one compiled program.

    ``V (B, ...)``, ``W (B, ...)``, ``H (B, ...)`` carry a leading batch
    axis; updates are vmapped and each problem early-stops independently
    (its factors freeze once its own tolerance fires).  Returns
    ``(W, H, n_iter)`` with ``n_iter (B,)``.  ``model_cls`` selects the
    reconstruction (default plain ``NMF``; any dense model family works).
    """
    from .ops.solver import get_batched_dense_fit

    model_cls = model_cls or _nmf_models.NMF
    _validate(V, beta)
    W, H = _params(W, H)
    if model_cls is _nmf_models.NMF:
        # the Gram-trick beta=2 updaters are plain GEMMs and vmap cleanly;
        # other beta values use the generic VJP engine under vmap
        from .ops.fast_nmf import nmf_updater_factory_xla as factory
    else:
        factory = None
    fit = get_batched_dense_fit(
        model_cls.reconstruct, float(beta), float(tol), int(max_iter),
        update_W, update_H, float(l1_reg), float(l2_reg), factory,
    )
    return fit(V, W, H)


def plca_fit_batched(V, W, H, Z, model_cls=None, tol=1e-4, max_iter=200,
                     update_W=True, update_H=True, update_Z=True,
                     W_alpha=1.0, H_alpha=1.0, Z_alpha=1.0):
    """EM-fit MANY PLCA problems in one compiled program.

    Leading batch axis on ``V``/``W``/``H``/``Z``; vmapped EM iterations
    with per-problem early stopping.  Returns ``(W, H, Z, n_iter, norm)``
    with ``n_iter (B,)`` and ``norm (B,)``.
    """
    import jax.numpy as jnp

    from .ops.solver import alpha_is_active, get_batched_plca_fit

    model_cls = model_cls or _plca_models.PLCA
    W, H, Z = _params(W, H, Z)
    recon3 = model_cls._resolve_fit_recon3()
    fit = get_batched_plca_fit(
        recon3, float(tol), int(max_iter),
        update_W, update_H, update_Z,
        alpha_is_active(W_alpha), alpha_is_active(H_alpha),
        alpha_is_active(Z_alpha),
    )
    return fit(
        V, W, H, Z,
        jnp.asarray(W_alpha, jnp.float32),
        jnp.asarray(H_alpha, jnp.float32),
        jnp.asarray(Z_alpha, jnp.float32),
    )


def nmfd_fit(V, W, H, beta=1, tol=1e-4, max_iter=200, update_W=True,
             update_H=True, l1_reg=0.0, l2_reg=0.0):
    """Fit the 1-D deconvolutional model; returns ``(W, H, n_iter)``."""
    return _fit(_nmf_models.NMFD, V, W, H, beta, tol, max_iter, update_W,
                update_H, l1_reg, l2_reg)


def nmf2d_fit(V, W, H, beta=1, tol=1e-4, max_iter=200, update_W=True,
              update_H=True, l1_reg=0.0, l2_reg=0.0):
    """Fit the 2-D deconvolutional model; returns ``(W, H, n_iter)``."""
    return _fit(_nmf_models.NMF2D, V, W, H, beta, tol, max_iter, update_W,
                update_H, l1_reg, l2_reg)


def nmf3d_fit(V, W, H, beta=1, tol=1e-4, max_iter=200, update_W=True,
              update_H=True, l1_reg=0.0, l2_reg=0.0):
    """Fit the 3-D deconvolutional model; returns ``(W, H, n_iter)``."""
    return _fit(_nmf_models.NMF3D, V, W, H, beta, tol, max_iter, update_W,
                update_H, l1_reg, l2_reg)


def nmf_hoyer_fit(V, W, H, beta=2, max_iter=200, sW=None, sH=None,
                  update_W=True, update_H=True, model_cls=None):
    """Hoyer'04 sparseness-constrained fit; returns ``(W, H, n_iter)``.

    ``model_cls`` defaults to plain ``NMF``; any NMF-family class works for
    dense targets.  Sparse COO targets are supported for ``NMF`` only.
    """
    _validate(V, beta)
    model_cls = model_cls or _nmf_models.NMF
    is_sp = isinstance(V, SparseCOO)
    if is_sp and model_cls._sp_pos_neg is None:
        raise NotImplementedError(
            f"{model_cls.__name__} does not support sparse targets"
        )
    W, H = _params(W, H)
    fit = get_hoyer_fit(
        None if is_sp
        else model_cls._resolve_fit_recon2_shaped(V, W, H, beta),
        model_cls._sp_pos_neg if is_sp else None,
        float(beta),
        int(max_iter),
        update_W,
        update_H,
        None if sW is None or not update_W else float(sW),
        None if sH is None or not update_H else float(sH),
        int(W.size // W.shape[1]),
        int(H.size // H.shape[1]),
    )
    return fit(V, W, H)


def nmf_hoyer_fit_batched(V, W, H, beta=2, max_iter=200, sW=None, sH=None,
                          update_W=True, update_H=True, model_cls=None):
    """Hoyer-fit MANY problems in one compiled program (dense targets).

    Leading batch axis on ``V``/``W``/``H``; returns ``(W, H, n_iter)``
    with ``n_iter (B,)``.  Each problem's backtracking trajectories match
    running it alone through :func:`nmf_hoyer_fit`.
    """
    from .ops.solver import get_batched_hoyer_fit

    _validate(V, beta)
    model_cls = model_cls or _nmf_models.NMF
    if isinstance(V, SparseCOO):
        raise NotImplementedError(
            "batched Hoyer fits support dense targets only"
        )
    W, H = _params(W, H)
    fit = get_batched_hoyer_fit(
        # static hook on purpose: the batched solver vmaps over problems
        # and the custom-vjp Mosaic recon is not offered under vmap
        model_cls._fit_recon2(),
        float(beta),
        int(max_iter),
        update_W,
        update_H,
        None if sW is None or not update_W else float(sW),
        None if sH is None or not update_H else float(sH),
        int(W[0].size // W.shape[2]),
        int(H[0].size // H.shape[2]),
    )
    return fit(V, W, H)


def plca_fit(V, W, H, Z, model_cls=None, tol=1e-4, max_iter=200,
             update_W=True, update_H=True, update_Z=True,
             W_alpha=1.0, H_alpha=1.0, Z_alpha=1.0):
    """EM-fit a PLCA-family model; returns ``(W, H, Z, n_iter, norm)``.

    ``model_cls`` selects the reconstruction (default plain ``PLCA``; pass
    ``SIPLCA``/``SIPLCA2``/``SIPLCA3`` for the shift-invariant variants).
    """
    import jax.numpy as jnp

    from .ops.solver import alpha_is_active

    model_cls = model_cls or _plca_models.PLCA
    W, H, Z = _params(W, H, Z)
    recon3 = model_cls._resolve_fit_recon3()
    fit = get_plca_fit(
        recon3, float(tol), int(max_iter),
        update_W, update_H, update_Z,
        alpha_is_active(W_alpha), alpha_is_active(H_alpha),
        alpha_is_active(Z_alpha),
    )
    return fit(
        V, W, H, Z,
        jnp.asarray(W_alpha, jnp.float32),
        jnp.asarray(H_alpha, jnp.float32),
        jnp.asarray(Z_alpha, jnp.float32),
    )
