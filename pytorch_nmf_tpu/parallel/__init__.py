"""Multi-device execution: meshes, sharded solvers, and halo-exchange convs.

The reference library is single-process, single-device (SURVEY.md §2); this
subpackage is the genuinely new TPU-native layer: ``jax.sharding.Mesh`` +
``NamedSharding`` annotated solvers (XLA GSPMD inserts the collectives) and
an explicit ``shard_map`` MU step with ``psum``-reduced numerators and
denominators for full control over ICI traffic.
"""

from . import distributed  # noqa: F401
from .halo import (  # noqa: F401
    left_halo,
    sharded_nmf2d_fit,
    sharded_nmf3d_fit,
    sharded_nmfd_fit,
    sharded_siplca2_fit,
    sharded_siplca3_fit,
    sharded_siplca_fit,
)
from .mesh import make_hybrid_mesh, make_mesh  # noqa: F401
from .sharded import shard_target, sharded_nmf_fit, sharded_plca_fit  # noqa: F401
from .sharded_sparse import sharded_sparse_nmf_fit  # noqa: F401
