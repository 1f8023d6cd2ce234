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

__all__ = [
    "nexus_tree",
    "write_nexus_h5",
    "to_nexus",
    "validate_nexus_tree",
    "NXMPES_REQUIRED",
]

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
    start_time: str | None = None,
    instrument: dict[str, Any] | None = None,
    sample: dict[str, Any] | None = None,
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
    - optional ``start_time`` dataset plus ``entry/instrument``
      (``NXinstrument``) and ``entry/sample`` (``NXsample``) groups built
      from plain dicts — the fields the NXmpes application definition
      requires of a complete file (see :func:`validate_nexus_tree`)
    """
    unit_map = {**_AXIS_UNITS, **(units or {})}
    root = _group({"default": "entry", "NX_class": "NXroot"})
    entry = _group({"NX_class": "NXentry", "default": "data"})
    root["children"]["entry"] = entry
    entry["children"]["definition"] = _dataset(definition)
    entry["children"]["title"] = _dataset(title)
    if start_time is not None:
        entry["children"]["start_time"] = _dataset(str(start_time))
    if instrument is not None:
        inst = _metadata_group(instrument)
        inst["attrs"]["NX_class"] = "NXinstrument"
        entry["children"]["instrument"] = inst
    if sample is not None:
        smp = _metadata_group(sample)
        smp["attrs"]["NX_class"] = "NXsample"
        entry["children"]["sample"] = smp

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


#: minimal required-content checklist for an NXmpes file, derived from
#: the PUBLIC NXmpes application definition (nexusformat.org NXDL:
#: NXmpes requires an NXentry carrying title, start_time, definition =
#: NXmpes, an NXinstrument, an NXsample, and an NXdata with an energy
#: axis). Paths are '/'-joined dataset/group names under the root.
NXMPES_REQUIRED: tuple[tuple[str, str], ...] = (
    ("entry", "group"),
    ("entry/title", "dataset"),
    ("entry/start_time", "dataset"),
    ("entry/definition", "dataset"),
    ("entry/instrument", "group"),
    ("entry/sample", "group"),
    ("entry/data", "group"),
    ("entry/data/energy", "dataset"),
)


def _tree_get(tree: dict[str, Any], path: str) -> dict[str, Any] | None:
    node: dict[str, Any] | None = tree
    for part in path.split("/"):
        if node is None or "children" not in node:
            return None
        node = node["children"].get(part)
    return node


def validate_nexus_tree(
    tree: dict[str, Any],
    definition: str = "NXmpes",
    strict: bool = False,
) -> list[str]:
    """Dependency-free NeXus validation: returns a list of problems
    (empty = passes), or raises ``ValueError`` when ``strict``.

    Two layers, both from PUBLIC format rules:

    * **NXdata contract** (the part every NeXus consumer relies on):
      ``@signal`` names an existing dataset; every ``@axes`` entry has a
      dataset whose length matches the signal's shape along its
      ``@AXISNAME_indices`` dimension; axis datasets carry a ``units``
      attribute.
    * **Application-definition checklist** (``NXMPES_REQUIRED``): the
      required groups/datasets of the public NXmpes NXDL, including
      ``definition`` matching ``definition``.

    This is a CHECKLIST validator, deliberately smaller than pynxtools'
    full NXDL walk (reference src/sed/io/nexus.py:14-47 delegates to it);
    it catches the structural mistakes that make a file unreadable, and
    the reference's converter remains the strict path when installed.
    """
    problems: list[str] = []
    for path, kind in NXMPES_REQUIRED:
        node = _tree_get(tree, path)
        if node is None:
            problems.append(f"missing required {kind} {path!r}")
        elif kind == "group" and "children" not in node:
            problems.append(f"{path!r} must be a group, found a dataset")
        elif kind == "dataset" and "children" in node:
            problems.append(f"{path!r} must be a dataset, found a group")
    defn = _tree_get(tree, "entry/definition")
    if defn is not None and "data" in defn and defn["data"] != definition:
        problems.append(
            f"entry/definition is {defn['data']!r}, expected {definition!r}",
        )
    data = _tree_get(tree, "entry/data")
    if data is not None and "children" in data:
        # hand-built / foreign trees may lack "attrs" on any node; a
        # malformed node is a validation PROBLEM, never a validator crash
        attrs, children = data.get("attrs", {}), data["children"]
        signal = attrs.get("signal")
        if signal is None:
            problems.append("entry/data lacks the @signal attribute")
        elif signal not in children:
            problems.append(f"@signal={signal!r} names no dataset")
        else:
            shape = np.shape(children[signal].get("data"))
            for axis in attrs.get("axes", []):
                if axis not in children:
                    problems.append(f"@axes entry {axis!r} has no dataset")
                    continue
                idx = attrs.get(f"{axis}_indices")
                if idx is None:
                    problems.append(f"missing @{axis}_indices attribute")
                elif not (0 <= int(idx) < len(shape)) or (
                    len(np.shape(children[axis].get("data")))
                    and np.shape(children[axis]["data"])[0] != shape[int(idx)]
                ):
                    problems.append(
                        f"axis {axis!r} length does not match signal dim "
                        f"{idx} of shape {shape}",
                    )
                if "units" not in children[axis].get("attrs", {}):
                    problems.append(f"axis {axis!r} lacks a units attribute")
    if strict and problems:
        raise ValueError(
            "NeXus tree fails validation:\n  " + "\n  ".join(problems),
        )
    return problems


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
    strict_validation: bool = False,
    **kwds: Any,
) -> None:
    """NXmpes export (reference src/sed/io/nexus.py:14-47).

    Uses the ``pynxtools`` converter when installed (reference parity
    path); otherwise writes the :func:`nexus_tree` directly via ``h5py``
    after :func:`validate_nexus_tree` — problems warn by default (the
    tree may legitimately lack e.g. ``start_time`` when the caller has
    no acquisition metadata) and raise under ``strict_validation``.
    Tree-building kwargs (``metadata``, ``start_time``, ``instrument``,
    ``sample``, ``title``, ``units``) are consumed HERE on both paths —
    they feed :func:`nexus_tree` on the fallback path and are popped
    before the pynxtools ``convert(**kwds)`` call, so the same call
    signature behaves identically whether or not pynxtools is installed
    (remaining kwds go to the converter/reader only). On the pynxtools
    path the converter builds its own tree from the reader's metadata
    flow, so tree-only kwargs cannot be threaded through — passing any
    emits a loud warning (instead of silently vanishing from the
    exported file).
    """
    tree_kwds = {
        k: kwds.pop(k)
        for k in ("metadata", "start_time", "instrument", "sample",
                  "title", "units")
        if k in kwds
    }
    try:
        from pynxtools.dataconverter.convert import convert
    except ImportError:
        tree = nexus_tree(res, definition=definition, **tree_kwds)
        problems = validate_nexus_tree(
            tree, definition=definition, strict=strict_validation,
        )
        if problems:
            import warnings

            warnings.warn(
                "NeXus tree incomplete against the NXmpes checklist: "
                + "; ".join(problems),
                stacklevel=2,
            )
        write_nexus_h5(tree, faddr)
        return
    if tree_kwds:
        import warnings

        warnings.warn(
            "to_nexus: tree-building kwargs "
            + ", ".join(sorted(tree_kwds))
            + " are consumed by the dependency-free writer only; the "
            "pynxtools converter path builds its tree from the reader's "
            "metadata flow and these values will NOT reach the exported "
            "file — pass them through the reader's metadata instead",
            stacklevel=2,
        )
    files = (input_files,) if isinstance(input_files, str) else tuple(input_files)
    convert(
        input_file=files,
        objects=(res,),
        reader=reader,
        nxdl=definition,
        output=faddr,
        **kwds,
    )
