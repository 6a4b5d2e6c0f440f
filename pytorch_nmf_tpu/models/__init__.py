"""Model families: NMF (and its 1/2/3-D deconvolutional variants) and PLCA
(and its shift-invariant variants)."""

from . import nmf, plca  # noqa: F401
from .nmf import NMF, NMF2D, NMF3D, NMFD  # noqa: F401
from .plca import PLCA, SIPLCA, SIPLCA2, SIPLCA3  # noqa: F401
