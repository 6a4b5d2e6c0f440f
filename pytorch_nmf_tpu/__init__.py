"""pytorch_nmf_tpu — a TPU-native non-negative factorization framework.

A from-scratch JAX/XLA/Pallas re-design with the full capability surface of
the reference ``torchnmf`` library (NMF / NMFD / NMF2D / NMF3D, PLCA /
SIPLCA / SIPLCA2 / SIPLCA3, β-divergence metrics, sparse COO targets,
Hoyer sparseness-constrained fitting, and optimizer-style trainers for
composed models), plus first-class multi-device sharding
(:mod:`pytorch_nmf_tpu.parallel`) that the reference never had.

Compute runs as jitted XLA programs on the MXU; hot multiplicative-update
paths use fused Pallas kernels; training loops live on-device as
``lax.while_loop`` programs with host-side progress callbacks.
"""

from . import functional, metrics, nmf, plca, trainer  # noqa: F401
from . import models, native, ops, parallel, utils  # noqa: F401
from .module import Module, Parameter, Sequential, manual_seed  # noqa: F401
from .ops.sparse import (  # noqa: F401
    SparseCOO,
    from_torch_sparse,
    sparse_coo_tensor,
    sparse_from_dense,
)

name = "pytorch_nmf_tpu"
# Single source of truth for the release string; setup.py parses this line.
__version__ = "1.0.0"
