"""Binned-result sinks and sources.

Driver-side writers/readers for the collected :class:`BinnedData` cube,
mirroring the reference's io package (reference: src/sed/io/hdf5.py:84-190,
src/sed/io/tiff.py:40-98, src/sed/io/nexus.py:14-47). The distributed part
of an export at 100 TB scale is the histogram query itself; the dense result
is small (≤ the bin cube), so these run on the driver by design — identical
to the reference's architecture.

Formats:

* ``.npz`` — engine-native numpy round trip (always available).
* ``.h5`` — gated on ``h5py`` (data + axes + recursive metadata groups,
  same layout as the reference's ``to_h5``).
* ``.tiff`` — a dependency-free baseline-TIFF writer/reader pair. The
  reference shapes output as ImageJ TZCYXS (tiff.py:18-37); we write the
  trailing 2-D (Y, X) planes as pages of a multi-page grayscale float32
  TIFF, which covers the same export surface without ``tifffile``.
* ``.nxs`` — NeXus export needs ``pynxtools``; stubbed with a clear error.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Any

import numpy as np

from sed_spark.binning.core import BinnedData

__all__ = [
    "save",
    "to_npz",
    "load_npz",
    "to_h5",
    "load_h5",
    "to_tiff",
    "load_tiff",
    "to_nexus",
]


def save(res: BinnedData, faddr: str, **kwds) -> None:
    """Extension-dispatched export (reference src/sed/core/processor.py:2480-2573)."""
    ext = Path(faddr).suffix.lower()
    if ext == ".npz":
        to_npz(res, faddr)
    elif ext in (".h5", ".hdf5"):
        to_h5(res, faddr, **kwds)
    elif ext in (".tif", ".tiff"):
        to_tiff(res, faddr)
    elif ext == ".nxs":
        to_nexus(res, faddr, **kwds)
    else:
        raise NotImplementedError(f"unsupported file format {ext!r}")


# ---------------------------------------------------------------------------
# npz (engine-native)
# ---------------------------------------------------------------------------

def to_npz(res: BinnedData, faddr: str) -> None:
    arrays: dict[str, Any] = {"data": res.data, "dims": np.array(res.dims)}
    for name in res.dims:
        arrays[f"coord_{name}"] = res.coords[name]
    np.savez(faddr, **arrays)


def load_npz(faddr: str) -> BinnedData:
    with np.load(faddr, allow_pickle=False) as f:
        dims = [str(d) for d in f["dims"]]
        return BinnedData(
            data=f["data"],
            dims=dims,
            coords={d: f[f"coord_{d}"] for d in dims},
        )


# ---------------------------------------------------------------------------
# HDF5 (reference src/sed/io/hdf5.py:84-190 layout: binned/BinnedData + axes)
# ---------------------------------------------------------------------------

def _require_h5py():
    try:
        import h5py
    except ImportError as exc:  # pragma: no cover - depends on environment
        raise ImportError(
            "to_h5/load_h5 require the optional dependency h5py",
        ) from exc
    return h5py


def to_h5(res: BinnedData, faddr: str, mode: str = "w") -> None:
    h5py = _require_h5py()
    with h5py.File(faddr, mode) as f:
        dataset = f.create_dataset("binned/BinnedData", data=res.data)
        dataset.attrs["typeID"] = str(type(res.data))
        for i, name in enumerate(res.dims):
            axis = f.create_dataset(f"axes/ax{i}", data=res.coords[name])
            axis.attrs["name"] = name
        _write_meta_group(f, "metadata", res.attrs.get("metadata", {}))


def _write_meta_group(f, path: str, meta: dict) -> None:
    for key, value in meta.items():
        if isinstance(value, dict):
            _write_meta_group(f, f"{path}/{key}", value)
        else:
            try:
                f.create_dataset(f"{path}/{key}", data=value)
            except TypeError:
                f.create_dataset(f"{path}/{key}", data=str(value))


def load_h5(faddr: str, mode: str = "r") -> BinnedData:
    h5py = _require_h5py()
    with h5py.File(faddr, mode) as f:
        data = np.asarray(f["binned/BinnedData"])
        dims, coords = [], {}
        for i in range(data.ndim):
            axis = f[f"axes/ax{i}"]
            name = axis.attrs.get("name", f"ax{i}")
            if isinstance(name, bytes):
                name = name.decode()
            dims.append(str(name))
            coords[str(name)] = np.asarray(axis)
        return BinnedData(data=data, dims=dims, coords=coords)


# ---------------------------------------------------------------------------
# TIFF — minimal baseline multi-page grayscale writer/reader (pure numpy).
# Follows the public TIFF 6.0 baseline spec: one strip per page, little
# endian, SampleFormat=IEEEFP for float32.
# ---------------------------------------------------------------------------

_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_BYTE_COUNTS = 279
_TAG_SAMPLE_FORMAT = 339


def to_tiff(res: BinnedData, faddr: str) -> None:
    """Write the cube as float32 multi-page TIFF (pages = leading dims).

    The reference exports a TZCYXS-ordered ImageJ stack (src/sed/io/tiff.py:
    40-98); a ≤2-D result becomes a single page, higher-D results one page
    per leading-index combination.
    """
    data = np.asarray(res.data, dtype="<f4")
    if data.ndim == 1:
        data = data[None, None, :]
    elif data.ndim == 2:
        data = data[None, :, :]
    else:
        data = data.reshape(-1, data.shape[-2], data.shape[-1])
    npages, height, width = data.shape

    with open(faddr, "wb") as f:
        f.write(b"II*\x00")
        ifd_ptr_pos = f.tell()
        f.write(struct.pack("<I", 0))  # patched per page
        for page in range(npages):
            strip = data[page].tobytes()
            strip_offset = f.tell()
            f.write(strip)
            ifd_offset = f.tell()
            # patch previous IFD pointer to this IFD
            f.seek(ifd_ptr_pos)
            f.write(struct.pack("<I", ifd_offset))
            f.seek(ifd_offset)
            entries = [
                (_TAG_WIDTH, 3, 1, width),
                (_TAG_LENGTH, 3, 1, height),
                (_TAG_BITS, 3, 1, 32),
                (_TAG_COMPRESSION, 3, 1, 1),
                (_TAG_PHOTOMETRIC, 3, 1, 1),
                (_TAG_STRIP_OFFSETS, 4, 1, strip_offset),
                (_TAG_ROWS_PER_STRIP, 3, 1, height),
                (_TAG_STRIP_BYTE_COUNTS, 4, 1, len(strip)),
                (_TAG_SAMPLE_FORMAT, 3, 1, 3),  # IEEE float
            ]
            f.write(struct.pack("<H", len(entries)))
            for tag, typ, count, value in entries:
                f.write(struct.pack("<HHII", tag, typ, count, value))
            ifd_ptr_pos = f.tell()
            f.write(struct.pack("<I", 0))


def load_tiff(faddr: str) -> np.ndarray:
    """Read back a stack written by :func:`to_tiff` (pages, height, width)."""
    with open(faddr, "rb") as f:
        raw = f.read()
    if raw[:4] != b"II*\x00":
        raise ValueError("not a little-endian TIFF")
    pages = []
    (ifd_offset,) = struct.unpack_from("<I", raw, 4)
    while ifd_offset:
        (n_entries,) = struct.unpack_from("<H", raw, ifd_offset)
        tags = {}
        for i in range(n_entries):
            tag, _typ, _count, value = struct.unpack_from(
                "<HHII", raw, ifd_offset + 2 + 12 * i,
            )
            tags[tag] = value
        width, height = tags[_TAG_WIDTH], tags[_TAG_LENGTH]
        off, nbytes = tags[_TAG_STRIP_OFFSETS], tags[_TAG_STRIP_BYTE_COUNTS]
        page = np.frombuffer(raw, dtype="<f4", count=nbytes // 4, offset=off)
        pages.append(page.reshape(height, width))
        (ifd_offset,) = struct.unpack_from("<I", raw, ifd_offset + 2 + 12 * n_entries)
    return np.stack(pages)


# ---------------------------------------------------------------------------
# NeXus
# ---------------------------------------------------------------------------

def to_nexus(res: BinnedData, faddr: str, **kwds) -> None:
    """NXmpes export (reference src/sed/io/nexus.py:14-47): NXdata tree
    construction is dependency-free in :mod:`sed_spark.nexus`; the HDF5
    serialization is gated on pynxtools/h5py."""
    from sed_spark.nexus import to_nexus as _to_nexus

    _to_nexus(res, faddr, **kwds)
