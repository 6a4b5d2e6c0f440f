"""Mesh construction helpers."""

from typing import Dict, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh"]


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
