"""Compute-path building blocks: reconstructions, the MU update engine,
solvers, Hoyer projection, sparse COO targets, and fused Pallas kernels."""

from . import fast_nmf, mu, projection, recon, solver, sparse  # noqa: F401
from .sparse import SparseCOO, sparse_coo_tensor, sparse_from_dense  # noqa: F401
