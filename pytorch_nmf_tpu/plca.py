"""User-facing PLCA module — mirrors the reference import surface
(``from pytorch_nmf_tpu.plca import PLCA, SIPLCA, ...``)."""

from .models.plca import BaseComponent, PLCA, SIPLCA, SIPLCA2, SIPLCA3  # noqa: F401

__all__ = ["PLCA", "SIPLCA", "SIPLCA2", "SIPLCA3", "BaseComponent"]
