"""Loader registry.

The reference discovers loaders by folder name
(reference: src/sed/loader/loader_interface.py); here a plain registry keyed
by the config's ``core.loader`` value.
"""

from __future__ import annotations

from typing import Callable

from sed_spark.loader.flash import FlashLikeLoader
from sed_spark.loader.generic import GenericLoader
from sed_spark.loader.mpes import MpesLoader

_REGISTRY: dict[str, Callable] = {
    "generic": GenericLoader,
    "parquet": GenericLoader,
    "flash": FlashLikeLoader,
    "sxp": FlashLikeLoader,
    "mpes": MpesLoader,
}


def get_loader(name: str, **kwargs):
    try:
        cls = _REGISTRY[name]
    except KeyError as exc:
        raise ValueError(
            f"no loader {name!r}; available: {sorted(_REGISTRY)}",
        ) from exc
    return cls(**kwargs)


def register_loader(name: str, cls: Callable) -> None:
    _REGISTRY[name] = cls
