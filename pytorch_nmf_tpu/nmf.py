"""User-facing NMF module — mirrors the reference import surface
(``from pytorch_nmf_tpu.nmf import NMF, NMFD, ...``)."""

from .models.nmf import BaseComponent, NMF, NMF2D, NMF3D, NMFD  # noqa: F401

__all__ = ["BaseComponent", "NMF", "NMFD", "NMF2D", "NMF3D"]
