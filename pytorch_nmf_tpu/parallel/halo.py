r"""Sequence-parallel deconvolutional NMF via halo exchange.

The reference's long-sequence workload is NMFD over audio spectrograms
(T≈400-frame kernels over thousands of frames, one cuDNN conv1d call;
reference nmf.py:779, examples/librosa_example.py).  On a TPU mesh the
convolution *time axis* is the natural shard axis; correctness then needs a
halo of ``T - 1`` frames exchanged between ring neighbors each iteration —
the ring-attention-style blockwise structure, without attention
(SURVEY.md §5 "long-context / sequence parallelism").

Construction:

* ``H`` is zero-padded along time from ``L_in`` to ``L_out`` so both the
  target ``V`` and the activations shard evenly; padded entries start at
  zero and *stay* zero under multiplicative updates (0 · anything = 0), so
  the padded problem is exactly equivalent to the unpadded one.
* The forward map per device is: ``ppermute`` the last ``T-1`` local frames
  from the left neighbor, concatenate, VALID-convolve with the flipped
  kernel → the device's ``L_out/D`` output frames.
* The MU numerator/denominator come from ``jax.vjp`` **through the halo
  exchange**: the cotangent of ``ppermute`` is the reverse ``ppermute``, so
  the adjoint right-halo falls out of autodiff instead of hand-written
  index bookkeeping.  Kernel gradients are partial over local frames and
  ``psum`` over the sequence axis.

Per MU iteration per factor: one halo ``ppermute`` (forward), one reverse
``ppermute`` (adjoint), one ``psum`` for the kernel contraction — all ICI.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import eps
from ..ops.mu import gamma_from_beta, mu_multiplier

__all__ = ["left_halo", "sharded_nmfd_fit"]


def left_halo(x, halo: int, axis_name: str):
    """Prepend the last ``halo`` frames of the left ring neighbor along the
    trailing axis (device 0 receives zeros).  Differentiable: the VJP is the
    reverse permutation of the trailing-edge cotangent."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    tail = x[..., x.shape[-1] - halo:]
    recv = lax.ppermute(
        tail, axis_name, [(d, (d + 1) % n) for d in range(n)]
    )
    recv = jnp.where(idx == 0, jnp.zeros_like(recv), recv)
    return jnp.concatenate([recv, x], axis=-1)


def _conv_valid_flipped(H, W):
    """True convolution, VALID padding: out length = L - T + 1."""
    Wf = jnp.flip(W, axis=2)
    dn = lax.conv_dimension_numbers(H.shape, Wf.shape, ("NCH", "OIH", "NCH"))
    return lax.conv_general_dilated(
        H, Wf, (1,), [(0, 0)], dimension_numbers=dn,
        preferred_element_type=jnp.float32,
    )


def _cotangents(V, WH, beta):
    if beta == 2:
        return V, WH
    elif beta == 1:
        return V / (WH + eps), None
    elif beta == 0:
        r = 1.0 / (WH + eps)
        return r * r * V, r
    else:
        WHe = WH + eps
        return WHe ** (beta - 2) * V, WHe ** (beta - 1)


def _beta_terms(V, WH, beta):
    if beta == 2:
        d = WH - V
        return 0.5 * jnp.sum(d * d)
    elif beta == 1:
        return jnp.sum(V * (jnp.log(V + eps) - jnp.log(WH + eps)) - V + WH)
    elif beta == 0:
        te, ie = V + eps, WH + eps
        return jnp.sum(te / ie - jnp.log(te) + jnp.log(ie) - 1.0)
    else:
        t = V + eps if beta < 0 else V
        ie = WH + eps
        return jnp.sum(
            t**beta + (beta - 1) * ie**beta - beta * t * ie ** (beta - 1)
        ) / (beta * (beta - 1))


@lru_cache(maxsize=None)
def _get_sharded_nmfd_fit(
    mesh: Mesh,
    T: int,
    beta: float,
    tol: float,
    max_iter: int,
    l1_reg: float,
    l2_reg: float,
    seq_axis: str,
):
    gamma = gamma_from_beta(beta)
    halo = T - 1

    def local_fit(V, W, Hp):
        # V: (N, C, L_loc), W: (C, R, T) replicated, Hp: (N, R, L_loc)
        def recon_W(w):
            return _conv_valid_flipped(left_halo(Hp, halo, seq_axis), w)

        def loss_of(state):
            w, hp = state
            WH = _conv_valid_flipped(left_halo(hp, halo, seq_axis), w)
            part = _beta_terms(V, WH, beta)
            return jnp.sqrt(2.0 * lax.psum(part, seq_axis))

        def one_iter(state):
            w, hp = state

            # ---- W update: adjoint wrt the replicated kernel.  NOTE: no
            # explicit psum here — ``w`` enters shard_map replicated (P()),
            # so shard_map's replication tracking transposes its cotangent
            # with an automatic psum over the sequence axis; adding another
            # would multiply the gradient by the axis size.
            WH, vjp = jax.vjp(
                lambda ww: _conv_valid_flipped(
                    left_halo(hp, halo, seq_axis), ww
                ),
                w,
            )
            neg_cot, pos_cot = _cotangents(V, WH, beta)
            neg = jax.nn.relu(vjp(neg_cot)[0]) + eps
            if beta == 1:
                # analytic KL denominator: sum of H over all non-rank dims
                # (device-varying partial -> explicit psum)
                pos = lax.psum(
                    jnp.sum(hp, axis=(0, 2), keepdims=True), seq_axis
                ).reshape(1, -1, 1)
            else:
                pos = jax.nn.relu(vjp(pos_cot)[0]) + eps
            w = w * mu_multiplier(neg, pos, w, gamma, l1_reg, l2_reg)

            # ---- H update: adjoint THROUGH the halo exchange -------------
            WH, vjp = jax.vjp(
                lambda hh: _conv_valid_flipped(
                    left_halo(hh, halo, seq_axis), w
                ),
                hp,
            )
            neg_cot, pos_cot = _cotangents(V, WH, beta)
            neg = jax.nn.relu(vjp(neg_cot)[0]) + eps
            if beta == 1:
                pos = jnp.sum(w, axis=(0, 2), keepdims=True).reshape(1, -1, 1)
            else:
                pos = jax.nn.relu(vjp(pos_cot)[0]) + eps
            hp = hp * mu_multiplier(neg, pos, hp, gamma, l1_reg, l2_reg)
            return w, hp

        loss_init = loss_of((W, Hp))
        n_chunks = max_iter // 10
        rem = max_iter % 10

        def chunk_body(carry):
            state, prev, k, _ = carry
            state = lax.fori_loop(0, 10, lambda i, s: one_iter(s), state)
            loss = loss_of(state)
            conv = (prev - loss) / loss_init < tol
            return state, loss, k + 1, conv

        (W, Hp), _, k, conv = lax.while_loop(
            lambda c: (~c[3]) & (c[2] < n_chunks),
            chunk_body,
            ((W, Hp), loss_init, jnp.int32(0), False),
        )
        if rem:
            (W, Hp) = lax.cond(
                conv,
                lambda s: s,
                lambda s: lax.fori_loop(0, rem, lambda i, t: one_iter(t), s),
                (W, Hp),
            )
        n_iter = jnp.where(conv, k * 10, max_iter)
        return W, Hp, n_iter

    mapped = jax.shard_map(
        local_fit,
        mesh=mesh,
        in_specs=(P(None, None, seq_axis), P(), P(None, None, seq_axis)),
        out_specs=(P(), P(None, None, seq_axis), P()),
    )
    return jax.jit(mapped)


def sharded_nmfd_fit(
    V,
    W,
    H,
    mesh: Mesh,
    beta: float = 1,
    tol: float = 1e-4,
    max_iter: int = 200,
    l1_reg: float = 0.0,
    l2_reg: float = 0.0,
    seq_axis: str = "seq",
):
    """Fit NMFD with the convolution time axis sharded over ``mesh``.

    ``V (N, C, L_out)``, ``W (C, R, T)``, ``H (N, R, L_in)`` with
    ``L_in = L_out - T + 1``.  Requires ``L_out`` divisible by the mesh
    axis size and local chunks at least ``T - 1`` frames (single-neighbor
    halos).  Returns ``(W, H, n_iter)`` matching the single-device
    trajectories.
    """
    V = jnp.asarray(V)
    W = jnp.asarray(W)
    H = jnp.asarray(H)
    T = W.shape[2]
    N, C, L_out = V.shape
    L_in = H.shape[2]
    assert L_in == L_out - T + 1, "H length must be L_out - T + 1"
    n_dev = mesh.shape[seq_axis]
    if L_out % n_dev:
        raise ValueError(
            f"L_out={L_out} must divide evenly over the {seq_axis} axis "
            f"({n_dev} devices)"
        )
    if L_out // n_dev < T - 1:
        raise ValueError(
            f"local chunk {L_out // n_dev} < halo {T - 1}: use fewer devices "
            "or a shorter kernel"
        )

    # zero-pad H to L_out: padded entries are fixed points of the MU update
    Hp = jnp.pad(H, ((0, 0), (0, 0), (0, L_out - L_in)))

    fit = _get_sharded_nmfd_fit(
        mesh, int(T), float(beta), float(tol), int(max_iter),
        float(l1_reg), float(l2_reg), seq_axis,
    )
    spec = NamedSharding(mesh, P(None, None, seq_axis))
    V = jax.device_put(V, spec)
    Hp = jax.device_put(Hp, spec)
    W = jax.device_put(W, NamedSharding(mesh, P()))

    W_out, Hp_out, n_iter = fit(V, W, Hp)
    return W_out, Hp_out[:, :, :L_in], n_iter
