r"""PLCA model family: ``BaseComponent``, ``PLCA``, ``SIPLCA``, ``SIPLCA2``,
``SIPLCA3``.

TPU-native re-design of the reference PLCA layer (torchnmf/plca.py).
Probabilistic Latent Component Analysis factorizes a (normalized) non-
negative tensor as a mixture of per-component marginal distributions with a
latent prior ``Z``; fitting is EM where the E-step is a single VJP with
cotangent ``V/(WZH+eps)`` and the M-step renormalizes the resulting
unnormalized posterior marginals (reference plca.py:250-289), with optional
Dirichlet MAP priors.

Construction normalizes every given factor to a probability distribution
over its non-rank axes (reference plca.py:94-127); ``Z`` defaults to the
uniform prior when only ``rank`` is given (plca.py:121).
"""

from collections.abc import Iterable as Iterabc
from typing import Iterable, Optional, Tuple, Union

import jax.numpy as jnp

from ..module import Module, Parameter, as_array
from ..ops import recon as _recon
from ..ops import solver as _solver
from ._common import (
    assert_nonneg,
    is_tensor_like,
    pair,
    rand_abs_normal,
    single,
    to_f32,
    to_param,
    triple,
    validate_target,
)
from .nmf import _progress_scope

__all__ = ["BaseComponent", "PLCA", "SIPLCA", "SIPLCA2", "SIPLCA3"]


def _prob_norm(x):
    """Sum over all-but-rank axes, keepdims (reference plca.py:23-31)."""
    if x.ndim > 1:
        axes = tuple(d for d in range(x.ndim) if d != 1)
        return jnp.sum(x, axis=axes, keepdims=True)
    return jnp.sum(x)


class BaseComponent(Module):
    r"""Base class for all PLCA modules (reference plca.py:34-304).

    Like the NMF base but with a latent prior vector ``Z``; all stored
    factors are probability-normalized at construction.
    """

    rank: int
    out_channels: Optional[int]
    kernel_size: Optional[Tuple[int, ...]]

    def __init__(
        self,
        rank: int = None,
        W=None,
        H=None,
        Z=None,
        trainable_W: bool = True,
        trainable_H: bool = True,
        trainable_Z: bool = True,
    ):
        super().__init__()

        infer_rank = None
        if is_tensor_like(W):
            assert_nonneg(as_array(W), "W")
            self.register_parameter("W", Parameter(to_param(W), trainable_W))
        elif isinstance(W, Iterabc):
            self.register_parameter("W", Parameter(rand_abs_normal(tuple(W))))
        else:
            self.register_parameter("W", None)

        if self._parameters.get("W") is not None:
            p = self._parameters["W"]
            p.data = p.data / _prob_norm(p.data)
            infer_rank = p.shape[1]

        if is_tensor_like(H):
            assert_nonneg(as_array(H), "H")
            self.register_parameter("H", Parameter(to_param(H), trainable_H))
        elif isinstance(H, Iterabc):
            self.register_parameter("H", Parameter(rand_abs_normal(tuple(H))))
        else:
            self.register_parameter("H", None)

        if self._parameters.get("H") is not None:
            p = self._parameters["H"]
            p.data = p.data / _prob_norm(p.data)
            infer_rank = p.shape[1]

        if is_tensor_like(Z):
            Zarr = to_param(Z)
            assert Zarr.ndim == 1, "Z should be one dimensional."
            assert_nonneg(Zarr, "Z")
            rank = int(Zarr.shape[0])
            self.register_parameter("Z", Parameter(Zarr, trainable_Z))
        elif isinstance(rank, int):
            self.register_parameter(
                "Z", Parameter(jnp.ones(rank, jnp.float32) / rank)
            )
        else:
            self.register_parameter("Z", None)

        if self._parameters.get("Z") is not None:
            p = self._parameters["Z"]
            p.data = p.data / _prob_norm(p.data)
            infer_rank = p.shape[0]

        if infer_rank is None:
            assert rank, "A rank should be given when W, H and Z are not available!"
        else:
            if self._parameters.get("Z") is not None:
                assert (
                    self._parameters["Z"].shape[0] == infer_rank
                ), "Latent size of Z does not match with others!"
            if self._parameters.get("H") is not None:
                assert (
                    self._parameters["H"].shape[1] == infer_rank
                ), "Latent size of H does not match with others!"
            if self._parameters.get("W") is not None:
                assert (
                    self._parameters["W"].shape[1] == infer_rank
                ), "Latent size of W does not match with others!"
                self.out_channels = self._parameters["W"].shape[0]
                if self._parameters["W"].ndim > 2:
                    self.kernel_size = tuple(self._parameters["W"].shape[2:])
            rank = infer_rank

        self.rank = int(rank)

    def extra_repr(self) -> str:
        s = f"{self.rank}"
        if self._parameters.get("W") is not None:
            s += f", out_channels={self.out_channels}"
            if hasattr(self, "kernel_size"):
                s += f", kernel_size={self.kernel_size}"
        return s

    def forward(self, H=None, W=None, Z=None, norm: float = None):
        """Reconstruct, optionally rescaled by ``norm``
        (reference plca.py:153-183)."""
        if H is None:
            H = self.H
        if W is None:
            W = self.W
        if Z is None:
            Z = self.Z
        result = self.reconstruct(H, W, Z)
        if norm is None:
            return result
        return result * norm

    @staticmethod
    def reconstruct(H, W, Z):
        raise NotImplementedError

    # Reconstruction used INSIDE the EM solver (the E-step differentiates
    # through it); deconvolutional subclasses substitute the unfold-GEMM
    # form whose adjoints are patch-GEMM contractions.  ``None`` (the
    # default, covering user subclasses that only define ``reconstruct``)
    # resolves to ``reconstruct``; the env kill switch is honored per call
    # so cached solvers never hold a stale decision.
    _fit_reconstruct = None

    @classmethod
    def _resolve_fit_recon3(cls):
        import os

        if (
            cls._fit_reconstruct is None
            or os.environ.get("PNT_NMFD_UNFOLD", "") == "0"
        ):
            return cls.reconstruct
        return cls._fit_reconstruct

    def _resolve_fit_recon3_shaped(self, V, W, H, Z):
        """Shape-aware EM reconstruction selection: large shift-invariant
        problems consult the runtime autotuner (the E-step's conv-vs-
        unfold balance inverts with shape exactly like the deconv MU
        engine); everything else keeps the static resolution."""
        cls = type(self)
        if cls._fit_reconstruct is None:
            return cls.reconstruct
        from ..ops.autotune import resolve_plca_recon3

        return resolve_plca_recon3(cls, V, W, H, Z)

    def fit(
        self,
        V,
        tol: float = 1e-4,
        max_iter: int = 200,
        verbose: bool = False,
        W_alpha: Union[float, jnp.ndarray] = 1.0,
        H_alpha: Union[float, jnp.ndarray] = 1.0,
        Z_alpha: Union[float, jnp.ndarray] = 1.0,
    ):
        r"""EM fitting maximizing the posterior log-probability with optional
        Dirichlet priors (reference plca.py:193-304).

        Returns ``(n_iter, norm)`` where ``norm`` is ``V.sum()`` — the scale
        factor to pass back into :meth:`forward` to reconstruct in the
        original units.
        """
        V = to_f32(V)
        # single fused min-reduction guard (see models/_common.py)
        validate_target(V, 1)

        W, H, Z = (
            self._parameters["W"],
            self._parameters["H"],
            self._parameters["Z"],
        )

        try:
            multi_device = len(V.devices()) > 1
        except (AttributeError, TypeError):
            multi_device = False
        if multi_device:
            # scope entered around the routed call: record-mode replay
            # events need the progress handler installed
            with _progress_scope(verbose, max_iter):
                routed = self._try_halo_fit(
                    V, W, H, Z, float(tol), int(max_iter),
                    W_alpha, H_alpha, Z_alpha, bool(verbose),
                )
            if routed is not None:
                W_new, H_new, Z_new, n_iter, norm = routed
                W.data, H.data, Z.data = W_new, H_new, Z_new
                return int(n_iter), norm

        fit_fn = _solver.get_plca_fit(
            self._resolve_fit_recon3_shaped(V, W.data, H.data, Z.data),
            float(tol),
            int(max_iter),
            W.requires_grad,
            H.requires_grad,
            Z.requires_grad,
            _solver.alpha_is_active(W_alpha),
            _solver.alpha_is_active(H_alpha),
            _solver.alpha_is_active(Z_alpha),
            bool(verbose),
            em_engine=self._resolve_em_engine(V, multi_device),
        )
        with _progress_scope(verbose, max_iter):
            W_new, H_new, Z_new, n_iter, norm = fit_fn(
                V,
                W.data,
                H.data,
                Z.data,
                jnp.asarray(W_alpha, jnp.float32),
                jnp.asarray(H_alpha, jnp.float32),
                jnp.asarray(Z_alpha, jnp.float32),
            )
        W.data, H.data, Z.data = W_new, H_new, Z_new
        return int(n_iter), norm

    def _try_halo_fit(
        self, V, W, H, Z, tol, max_iter, W_alpha, H_alpha, Z_alpha, verbose
    ):
        """Hook: multi-device EM through a purpose-built shard_map solver,
        or ``None`` to decline (→ GSPMD).  The shift-invariant family
        overrides this (see :class:`_SIPLCABase`); :class:`PLCA` routes
        sample-sharded 2-D targets to
        :func:`~pytorch_nmf_tpu.parallel.sharded.sharded_plca_fit`.
        Verbose fits record the cadence events on device and replay them
        (ops/solver record-and-replay channel)."""
        return None

    def _resolve_em_engine(self, V, multi_device):
        """Hook: a fused E-step engine factory for this fit call, or
        ``None`` for the generic VJP E-step.  :class:`PLCA` overrides this
        (dense recon → fused ratio-GEMM cotangents)."""
        return None


class _SIPLCABase(BaseComponent):
    """Shared shift-invariant behavior: trailing-axis halo auto-routing
    (mirrors the NMFD family; VERDICT r2 item 3)."""

    _spatial_ndim = 1

    def _try_halo_fit(
        self, V, W, H, Z, tol, max_iter, W_alpha, H_alpha, Z_alpha, verbose
    ):
        from ._common import trailing_seq_axis

        axis = trailing_seq_axis(V)
        if axis is None:
            return None
        from ..parallel.halo import _sharded_siplca_fit

        return _sharded_siplca_fit(
            V, W.data, H.data, Z.data, V.sharding.mesh, self._spatial_ndim,
            tol, max_iter, W_alpha, H_alpha, Z_alpha,
            W.requires_grad, H.requires_grad, Z.requires_grad, axis,
            verbose,
        )


class PLCA(BaseComponent):
    r"""Probabilistic Latent Component Analysis:
    :math:`P(n, c) \approx \sum_z P(c|z) P(z) P(n|z)`, i.e.
    ``V ≈ H diag(Z) Wᵀ`` (reference plca.py:307-373)."""

    def __init__(self, Vshape: Iterable[int] = None, rank: int = None, **kwargs):
        if isinstance(Vshape, Iterabc):
            M, K = Vshape
            rank = rank if rank else K
            kwargs["W"] = (K, rank)
            kwargs["H"] = (M, rank)
        super().__init__(rank, **kwargs)

    @staticmethod
    def reconstruct(H, W, Z):
        W = as_array(W)
        Z = as_array(Z)
        return _recon.linear(H, W * Z)

    def _try_halo_fit(
        self, V, W, H, Z, tol, max_iter, W_alpha, H_alpha, Z_alpha, verbose
    ):
        """Auto-route ``PLCA().fit(V_sharded)`` to the explicit-psum
        shard_map EM (:func:`~pytorch_nmf_tpu.parallel.sharded.
        sharded_plca_fit`) when the target carries a recognizable 2-D
        ``P(data)`` NamedSharding — the same single-``fit``-call UX the
        deconvolutional family gets from the halo route (reference
        plca.py:193 ``fit`` + README.md:66-68 single-``.cuda()`` UX).
        Declines (→ GSPMD) for any other layout, for user subclasses with
        a custom ``reconstruct`` (the explicit solver hard-codes the
        dense recon), and when the sample axis does not divide evenly
        over the mesh axis (shard_map requires it)."""
        if type(self).reconstruct is not PLCA.reconstruct:
            return None
        from jax.sharding import NamedSharding

        sh = getattr(V, "sharding", None)
        if not isinstance(sh, NamedSharding) or getattr(V, "ndim", 0) != 2:
            return None
        if V.dtype == jnp.float64:
            # x64 posture keeps doubles on the generic engine (the
            # explicit solver pins f32 accumulation)
            return None
        spec = sh.spec
        data_ax = spec[0] if len(spec) > 0 else None
        rest = spec[1] if len(spec) > 1 else None
        if not isinstance(data_ax, str) or rest is not None:
            return None
        mesh = sh.mesh
        n_dev = mesh.shape[data_ax]
        if V.shape[0] % n_dev or H.shape[0] % n_dev:
            return None
        from ..parallel.sharded import sharded_plca_fit

        return sharded_plca_fit(
            V, W.data, H.data, Z.data, mesh, tol, max_iter,
            W_alpha, H_alpha, Z_alpha,
            W.requires_grad, H.requires_grad, Z.requires_grad,
            data_axis=data_ax, verbose=verbose,
        )

    def _resolve_em_engine(self, V, multi_device):
        # opt-in (PNT_PLCA_FUSED=1; measured slower than the generic VJP
        # on v5e — see ops/fast_plca.py); fused engines are single-device
        # Mosaic programs and user subclasses with a custom reconstruct
        # must keep the generic VJP E-step
        if multi_device or type(self).reconstruct is not PLCA.reconstruct:
            return None
        from ..ops.fast_plca import resolve_plca_em_engine

        return resolve_plca_em_engine(V)


class SIPLCA(_SIPLCABase):
    r"""Shift-Invariant PLCA, 1-D (Smaragdis & Raj 2007;
    reference plca.py:376-449)."""

    def __init__(
        self,
        Vshape: Iterable[int] = None,
        rank: int = None,
        T: Union[int, Tuple[int]] = 1,
        **kwargs,
    ):
        if isinstance(Vshape, Iterabc):
            (T,) = single(T)
            batch, K, M = Vshape
            rank = rank if rank else K
            kwargs["W"] = (K, rank, T)
            kwargs["H"] = (batch, rank, M - T + 1)
        super().__init__(rank, **kwargs)

    @staticmethod
    def reconstruct(H, W, Z):
        return _recon.deconv1d(H, _recon.scaled_kernel(W, Z, 1))

    @staticmethod
    def _fit_reconstruct(H, W, Z):
        from ..ops.fast_nmfd import unfold_deconv

        return unfold_deconv(H, _recon.scaled_kernel(W, Z, 1))

    @staticmethod
    def _fit_reconstruct_pallas(H, W, Z):
        # EM reconstruction with fused-Mosaic adjoints: the E-step's VJP
        # runs ops/pallas_deconv.hgrad/wgrad (third measured autotune
        # candidate; ops/autotune.py::resolve_plca_recon3)
        from ..ops.fast_nmfd import resolve_pallas_unfold_deconv

        return resolve_pallas_unfold_deconv()(
            H, _recon.scaled_kernel(W, Z, 1)
        )

    @staticmethod
    def _fit_reconstruct_pallas_w(H, W, Z):
        # hybrid fused-W/streamed-H EM adjoints for shapes where the
        # full fused recon's hgrad accumulator is VMEM-gated out
        from ..ops.fast_nmfd import resolve_pallas_w_unfold_deconv

        return resolve_pallas_w_unfold_deconv()(
            H, _recon.scaled_kernel(W, Z, 1)
        )


class SIPLCA2(_SIPLCABase):
    r"""Shift-Invariant PLCA across 2 dimensions
    (reference plca.py:452-525)."""

    _spatial_ndim = 2

    def __init__(
        self,
        Vshape: Iterable[int] = None,
        rank: int = None,
        kernel_size: Union[int, Tuple[int, int]] = 1,
        **kwargs,
    ):
        if isinstance(Vshape, Iterabc):
            kernel_size = pair(kernel_size)
            kh, kw = kernel_size
            batch, channel, K, M = Vshape
            rank = rank if rank else K
            kwargs["W"] = (channel, rank) + kernel_size
            kwargs["H"] = (batch, rank, K - kh + 1, M - kw + 1)
        super().__init__(rank, **kwargs)

    @staticmethod
    def reconstruct(H, W, Z):
        return _recon.deconv2d(H, _recon.scaled_kernel(W, Z, 2))

    @staticmethod
    def _fit_reconstruct(H, W, Z):
        from ..ops.fast_nmfd import unfold_deconv

        return unfold_deconv(H, _recon.scaled_kernel(W, Z, 2))

    @staticmethod
    def _fit_reconstruct_pallas(H, W, Z):
        # flat-offset fused-Mosaic EM adjoints (same custom-vjp recon as
        # SIPLCA; ops/fast_nmfd._make_pallas_unfold_deconv handles N-D)
        from ..ops.fast_nmfd import resolve_pallas_unfold_deconv

        return resolve_pallas_unfold_deconv()(
            H, _recon.scaled_kernel(W, Z, 2)
        )

    @staticmethod
    def _fit_reconstruct_pallas_w(H, W, Z):
        from ..ops.fast_nmfd import resolve_pallas_w_unfold_deconv

        return resolve_pallas_w_unfold_deconv()(
            H, _recon.scaled_kernel(W, Z, 2)
        )


class SIPLCA3(_SIPLCABase):
    r"""Shift-Invariant PLCA across 3 dimensions
    (reference plca.py:528-606)."""

    _spatial_ndim = 3

    def __init__(
        self,
        Vshape: Iterable[int] = None,
        rank: int = None,
        kernel_size: Union[int, Tuple[int, int, int]] = 1,
        **kwargs,
    ):
        if isinstance(Vshape, Iterabc):
            kernel_size = triple(kernel_size)
            k1, k2, k3 = kernel_size
            batch, channel, N, K, M = Vshape
            rank = rank if rank else K
            kwargs["W"] = (channel, rank) + kernel_size
            kwargs["H"] = (batch, rank, N - k1 + 1, K - k2 + 1, M - k3 + 1)
        super().__init__(rank, **kwargs)

    @staticmethod
    def reconstruct(H, W, Z):
        return _recon.deconv3d(H, _recon.scaled_kernel(W, Z, 3))

    @staticmethod
    def _fit_reconstruct(H, W, Z):
        from ..ops.fast_nmfd import unfold_deconv

        return unfold_deconv(H, _recon.scaled_kernel(W, Z, 3))

    @staticmethod
    def _fit_reconstruct_pallas(H, W, Z):
        from ..ops.fast_nmfd import resolve_pallas_unfold_deconv

        return resolve_pallas_unfold_deconv()(
            H, _recon.scaled_kernel(W, Z, 3)
        )

    @staticmethod
    def _fit_reconstruct_pallas_w(H, W, Z):
        from ..ops.fast_nmfd import resolve_pallas_w_unfold_deconv

        return resolve_pallas_w_unfold_deconv()(
            H, _recon.scaled_kernel(W, Z, 3)
        )
