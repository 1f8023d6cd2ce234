"""NeXus (NXmpes) export: dependency-free tree construction, gated write.

The reference delegates the whole export to ``pynxtools`` (reference
src/sed/io/nexus.py:14-47), which assembles an NXmpes HDF5 file from an
xarray + YAML config. Neither ``pynxtools`` nor ``h5py`` is available in
this runtime, so the component is split by responsibility:

* :func:`nexus_tree` — builds the complete NXmpes/NXdata hierarchy (groups,
  datasets, attributes) from a :class:`BinnedData` result as a plain nested
  dict, following the public NeXus format conventions: an ``NXentry`` with
  ``definition``, an ``NXdata`` group carrying ``@signal``/``@axes``/
  ``@AXISNAME_indices``, one dataset per axis with units, and recursive
  ``NXcollection`` groups for metadata. Pure Python/numpy — fully tested.
* :func:`write_nexus_h5` — serializes that tree to HDF5; gated on ``h5py``.
* :func:`to_nexus` — reference-parity entry point: ``pynxtools`` conversion
  when importable, direct :func:`write_nexus_h5` fallback, clear error
  otherwise.

Node shape: ``{"attrs": {...}, "children": {...}}`` for groups and
``{"attrs": {...}, "data": scalar|ndarray}`` for datasets.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from sed_spark.binning.core import BinnedData

__all__ = ["nexus_tree", "write_nexus_h5", "to_nexus"]

_AXIS_UNITS = {
    "energy": "eV",
    "E": "eV",
    "delay": "ps",
    "kx": "1/angstrom",
    "ky": "1/angstrom",
    "t": "ns",
    "ADC": "",
}


def _group(attrs: dict[str, Any] | None = None) -> dict[str, Any]:
    return {"attrs": dict(attrs or {}), "children": {}}


def _dataset(data: Any, attrs: dict[str, Any] | None = None) -> dict[str, Any]:
    return {"attrs": dict(attrs or {}), "data": data}


def _metadata_group(meta: dict[str, Any]) -> dict[str, Any]:
    """Recursive dict → NXcollection group tree (scalars/arrays as datasets)."""
    g = _group({"NX_class": "NXcollection"})
    for key in sorted(meta):
        val = meta[key]
        if isinstance(val, dict):
            g["children"][str(key)] = _metadata_group(val)
        else:
            g["children"][str(key)] = _dataset(
                np.asarray(val) if isinstance(val, (list, tuple)) else val,
            )
    return g


def nexus_tree(
    res: BinnedData,
    definition: str = "NXmpes",
    title: str = "sed_spark binned data",
    metadata: dict[str, Any] | None = None,
    units: dict[str, str] | None = None,
) -> dict[str, Any]:
    """NXmpes hierarchy for a binned cube, as a serializer-agnostic tree.

    Layout (NeXus NXdata conventions):

    - root ``@default="entry"``
    - ``entry`` (``NXentry``): ``definition``, ``title``, ``@default="data"``
    - ``entry/data`` (``NXdata``): ``@signal="data"``, ``@axes``,
      ``@{axis}_indices``; the counts cube as ``data`` and one float64
      dataset per axis (bin centers) with a ``units`` attribute
    - ``entry/process`` (``NXprocess``): program provenance + bin spec
    - ``entry/metadata``: recursive ``NXcollection`` mirror of ``metadata``
    """
    unit_map = {**_AXIS_UNITS, **(units or {})}
    root = _group({"default": "entry", "NX_class": "NXroot"})
    entry = _group({"NX_class": "NXentry", "default": "data"})
    root["children"]["entry"] = entry
    entry["children"]["definition"] = _dataset(definition)
    entry["children"]["title"] = _dataset(title)

    data = _group(
        {
            "NX_class": "NXdata",
            "signal": "data",
            "axes": list(res.dims),
            **{f"{d}_indices": i for i, d in enumerate(res.dims)},
        },
    )
    data["children"]["data"] = _dataset(
        np.asarray(res.data), {"units": "counts"},
    )
    for d in res.dims:
        data["children"][d] = _dataset(
            np.asarray(res.coords[d], dtype=np.float64),
            {"units": unit_map.get(d, "")},
        )
    entry["children"]["data"] = data

    process = _group({"NX_class": "NXprocess"})
    process["children"]["program"] = _dataset("sed_spark")
    for i, d in enumerate(res.dims):
        process["children"][f"axis_{i}"] = _dataset(d)
        process["children"][f"nbins_{i}"] = _dataset(int(len(res.coords[d])))
    entry["children"]["process"] = process

    if metadata:
        entry["children"]["metadata"] = _metadata_group(metadata)
    return root


def _write_node(h5group, name: str, node: dict[str, Any]) -> None:
    if "children" in node:
        sub = h5group.create_group(name)
        for k, v in node["attrs"].items():
            sub.attrs[k] = v
        for child_name, child in node["children"].items():
            _write_node(sub, child_name, child)
    else:
        ds = h5group.create_dataset(name, data=node["data"])
        for k, v in node["attrs"].items():
            ds.attrs[k] = v


def write_nexus_h5(tree: dict[str, Any], faddr: str) -> None:
    """Serialize a :func:`nexus_tree` to HDF5 (requires ``h5py``)."""
    try:
        import h5py
    except ImportError as exc:  # pragma: no cover - depends on environment
        raise ImportError(
            "write_nexus_h5 requires the optional dependency h5py",
        ) from exc
    with h5py.File(faddr, "w") as f:
        for k, v in tree["attrs"].items():
            f.attrs[k] = v
        for name, node in tree["children"].items():
            _write_node(f, name, node)


def to_nexus(
    res: BinnedData,
    faddr: str,
    reader: str = "mpes",
    definition: str = "NXmpes",
    input_files: Any = (),
    **kwds: Any,
) -> None:
    """NXmpes export (reference src/sed/io/nexus.py:14-47).

    Uses the ``pynxtools`` converter when installed (reference parity path);
    otherwise writes the :func:`nexus_tree` directly via ``h5py``.
    """
    try:
        from pynxtools.dataconverter.convert import convert
    except ImportError:
        write_nexus_h5(
            nexus_tree(res, definition=definition, metadata=kwds.get("metadata")),
            faddr,
        )
        return
    files = (input_files,) if isinstance(input_files, str) else tuple(input_files)
    convert(
        input_file=files,
        objects=(res,),
        reader=reader,
        nxdl=definition,
        output=faddr,
        **kwds,
    )
