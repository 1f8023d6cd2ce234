"""Metadata tree handling.

Re-expression of the reference's ``MetaHandler``
(reference: src/sed/core/metadata.py:12-120): a nested dict attached to the
processing session and to binned results, with explicit duplicate policies.
Driver-side only — metadata never enters the distributed plan.
"""

from __future__ import annotations

import json
from copy import deepcopy
from typing import Any


class DuplicateEntryError(ValueError):
    pass


class MetaHandler:
    """Nested metadata dict with duplicate policies (raise/overwrite/merge/append)."""

    def __init__(self, meta: dict[str, Any] | None = None) -> None:
        self._m: dict[str, Any] = dict(meta) if meta else {}

    def __getitem__(self, key: str) -> Any:
        return self._m[key]

    def __contains__(self, key: str) -> bool:
        return key in self._m

    @property
    def metadata(self) -> dict[str, Any]:
        return self._m

    def add(self, entry: Any, name: str, duplicate_policy: str = "raise") -> None:
        if name not in self._m:
            self._m[name] = deepcopy(entry)
            return
        if duplicate_policy == "raise":
            raise DuplicateEntryError(
                f"Attempt to add duplicate entry {name!r}; use overwrite/merge/append",
            )
        if duplicate_policy == "overwrite":
            self._m[name] = deepcopy(entry)
        elif duplicate_policy == "merge":
            if isinstance(self._m[name], dict) and isinstance(entry, dict):
                self._m[name] = _deep_merge(self._m[name], entry)
            else:
                self._m[name] = deepcopy(entry)
        elif duplicate_policy == "append":
            i = 1
            while f"{name}_{i}" in self._m:
                i += 1
            self._m[f"{name}_{i}"] = deepcopy(entry)
        else:
            raise ValueError(f"Unknown duplicate policy {duplicate_policy!r}")

    def to_json(self) -> str:
        return json.dumps(self._m, default=repr, indent=2)


def _deep_merge(base: dict, new: dict) -> dict:
    out = dict(base)
    for k, v in new.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = deepcopy(v)
    return out
