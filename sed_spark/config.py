"""Layered configuration (folder > user > system > default).

Port of the reference's config loading semantics
(reference: src/sed/core/config.py:33-120): later (lower-priority) layers
fill in keys the higher-priority layers left unset, via recursive dict
merge. Validation uses a pydantic model mirroring the essential fields of
src/sed/core/config_model.py:345-357 (core + dataframe sections); unknown
sections pass through untouched so facility configs keep working.

Also provides the ``@``-alias resolution layer
(reference: src/sed/core/processor.py:1994-1996,2129-2131): column names
starting with ``@`` are looked up in ``dataframe.columns``.
"""

from __future__ import annotations

import os
from typing import Any

try:
    from pydantic import BaseModel, ConfigDict
except ImportError:  # pragma: no cover
    BaseModel = None  # type: ignore[assignment]

__all__ = [
    "parse_config",
    "complete_dictionary",
    "resolve_column_alias",
    "read_env_var",
    "save_env_var",
    "SedConfig",
]


def _env_file_path() -> str:
    """The user-level ``.env`` store (reference src/sed/core/config.py's
    read_env_var/save_env_var persistence layer)."""
    base = os.environ.get(
        "XDG_CONFIG_HOME", os.path.join(os.path.expanduser("~"), ".config"),
    )
    return os.path.join(base, "sed_spark", ".env")


def read_env_var(name: str) -> str | None:
    """Resolve ``name`` from the process environment first, then from
    the user ``.env`` file; None when unset in both."""
    if name in os.environ:
        return os.environ[name]
    path = _env_file_path()
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            key, _, value = line.partition("=")
            if key.strip() == name:
                return value.strip()
    return None


def save_env_var(name: str, value: str) -> None:
    """Persist ``name=value`` to the user ``.env`` file (replacing any
    existing entry), so e.g. an access token survives across sessions.

    The file can hold bearer tokens (e.g. ``SCICAT_TOKEN`` via
    :class:`~sed_spark.loader.metadata.MetadataRetriever`), so it is
    written 0600 and its directory 0700 — never group/world readable
    (the reference leaves it at umask default, a token-store flaw)."""
    path = _env_file_path()
    parent = os.path.dirname(path)
    os.makedirs(parent, exist_ok=True)
    try:
        os.chmod(parent, 0o700)
    except OSError:
        pass  # e.g. foreign-owned dir; the file mode below still holds
    lines: list[str] = []
    if os.path.exists(path):
        with open(path, encoding="utf-8") as fh:
            lines = [
                ln for ln in fh.read().splitlines()
                if ln.strip().partition("=")[0].strip() != name
            ]
    lines.append(f"{name}={value}")
    fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o600)
    with os.fdopen(fd, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")
    os.chmod(path, 0o600)  # O_CREAT mode doesn't apply to existing files


def complete_dictionary(dictionary: dict, base_dictionary: dict) -> dict:
    """Recursively fill missing keys of ``dictionary`` from
    ``base_dictionary`` (reference src/sed/core/config.py:229-260)."""
    out = dict(dictionary)
    for key, base_val in (base_dictionary or {}).items():
        if key not in out:
            out[key] = base_val
        elif isinstance(out[key], dict) and isinstance(base_val, dict):
            out[key] = complete_dictionary(out[key], base_val)
    return out


if BaseModel is not None:

    class DataframeSection(BaseModel):
        model_config = ConfigDict(extra="allow")

        columns: dict[str, str] = {}
        units: dict[str, str] = {}
        channels: dict[str, dict] = {}
        jitter_cols: list[str] = []
        jitter_amps: float | list[float] = 0.5
        timed_dataframe_unit_time: float = 0.001

    class CoreSection(BaseModel):
        model_config = ConfigDict(extra="allow")

        loader: str = "generic"
        paths: dict[str, Any] | None = None
        num_cores: int | None = None

    class SedConfig(BaseModel):
        model_config = ConfigDict(extra="allow")

        core: CoreSection = CoreSection()
        dataframe: DataframeSection = DataframeSection()

else:  # pragma: no cover
    SedConfig = None  # type: ignore[assignment]


DEFAULT_CONFIG: dict[str, Any] = {
    "core": {"loader": "generic"},
    "dataframe": {
        "columns": {
            "x": "X",
            "y": "Y",
            "tof": "t",
            "adc": "ADC",
            "kx": "kx",
            "ky": "ky",
            "energy": "energy",
            "delay": "delay",
        },
        "jitter_cols": ["@x", "@y", "@tof"],
        "jitter_amps": 0.5,
        "timed_dataframe_unit_time": 0.001,
    },
}


def _load_yaml(path: str) -> dict:
    import yaml

    with open(path) as f:
        return yaml.safe_load(f) or {}


def parse_config(
    config: dict | str | None = None,
    folder_config: dict | str | None = None,
    user_config: dict | str | None = None,
    system_config: dict | str | None = None,
    default_config: dict | str = DEFAULT_CONFIG,
    verify_config: bool = True,
) -> dict:
    """Merge the four config layers, highest priority first
    (reference src/sed/core/config.py:33-120: provided > folder > user >
    system > default), then validate.

    String arguments are YAML paths; missing optional layer files are
    skipped silently, like the reference.
    """
    layers: list[dict] = []
    for layer, default_path in (
        (config, None),
        (folder_config, "./sed_config.yaml"),
        (user_config, os.path.expanduser("~/.config/sed/config.yaml")),
        (system_config, "/etc/sed/config.yaml"),
        (default_config, None),
    ):
        if layer is None and default_path is not None:
            layer = default_path if os.path.exists(default_path) else None
        if layer is None:
            continue
        if isinstance(layer, str):
            if not os.path.exists(layer):
                raise FileNotFoundError(f"config file {layer!r} not found")
            layer = _load_yaml(layer)
        layers.append(layer)

    merged: dict = {}
    for layer in layers:
        merged = complete_dictionary(merged, layer)

    if verify_config and SedConfig is not None:
        merged = SedConfig(**merged).model_dump()
    return merged


def resolve_column_alias(name: str, config: dict) -> str:
    """``"@tof"`` → ``config["dataframe"]["columns"]["tof"]``
    (reference src/sed/core/processor.py:1994-1996)."""
    if not name.startswith("@"):
        return name
    key = name[1:]
    columns = (config.get("dataframe") or {}).get("columns") or {}
    if key not in columns:
        raise KeyError(f"column alias {name!r} not found in dataframe.columns")
    return columns[key]
