"""Mesh construction helpers (single-slice ICI and multi-slice ICI×DCN)."""

from typing import Dict, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "make_hybrid_mesh"]


def make_mesh(
    axes: Dict[str, int], devices: Optional[Sequence] = None
) -> Mesh:
    """Build a :class:`jax.sharding.Mesh` from ``{axis_name: size}``.

    Example::

        mesh = make_mesh({"data": 4, "rank": 2})   # 8 devices

    Axis sizes must multiply to the number of devices used.  With
    ``devices=None``, uses ``jax.devices()`` (all of them) — pass a subset
    to pin the mesh to specific chips.
    """
    if devices is None:
        devices = jax.devices()
    names = tuple(axes.keys())
    sizes = tuple(int(axes[n]) for n in names)
    n_needed = int(np.prod(sizes))
    if n_needed > len(devices):
        raise ValueError(
            f"mesh {axes} needs {n_needed} devices, only {len(devices)} available"
        )
    dev_array = np.asarray(devices[:n_needed]).reshape(sizes)
    return Mesh(dev_array, names)


def make_hybrid_mesh(
    dcn_axes: Dict[str, int],
    ici_axes: Dict[str, int],
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh for multi-slice topologies: ``dcn_axes`` span slices (the slow
    data-center network), ``ici_axes`` stay within a slice (fast
    inter-chip links).

    The MU solvers' heavy collectives are the per-iteration ``psum`` s of
    the factor contractions — put the model/feature axis in ``ici_axes``
    and the sample (data) axis in ``dcn_axes`` so only the small
    numerator/denominator reductions cross DCN::

        mesh = make_hybrid_mesh({"data": n_slices}, {"model": 4})

    Uses ``jax.experimental.mesh_utils.create_hybrid_device_mesh`` when the
    devices carry slice information; otherwise (CPU tests, single slice)
    falls back to a flat mesh with the same combined axis order
    (DCN-outer, ICI-inner).
    """
    names = tuple(dcn_axes.keys()) + tuple(ici_axes.keys())
    dcn_shape = tuple(int(v) for v in dcn_axes.values())
    ici_shape = tuple(int(v) for v in ici_axes.values())
    if devices is None:
        devices = jax.devices()
    has_slices = (
        len({getattr(d, "slice_index", 0) for d in devices}) > 1
    )
    if has_slices:
        from jax.experimental import mesh_utils

        # create_hybrid_device_mesh multiplies the two shapes elementwise,
        # so give every logical axis a pure-ICI or pure-DCN extent
        inner = (1,) * len(dcn_shape) + ici_shape
        outer = dcn_shape + (1,) * len(ici_shape)
        dev_array = mesh_utils.create_hybrid_device_mesh(
            inner, outer, devices=devices
        )
        return Mesh(dev_array, names)
    merged = dict(dcn_axes)
    merged.update(ici_axes)
    return make_mesh(merged, devices)
