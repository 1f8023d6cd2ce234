"""Sink/source round trips on the collected result (reference tests/test_io.py)."""

import numpy as np
import pytest

from sed_spark import io as sio
from sed_spark.binning.core import BinnedData


@pytest.fixture()
def binned():
    rng = np.random.default_rng(7)
    data = rng.random((4, 6, 8)).astype("float32")
    return BinnedData(
        data=data,
        dims=["energy", "kx", "ky"],
        coords={
            "energy": np.linspace(-2, 2, 4),
            "kx": np.linspace(-1, 1, 6),
            "ky": np.linspace(-1, 1, 8),
        },
        attrs={"metadata": {"run": {"id": 42}}},
    )


def test_npz_round_trip(binned, tmp_path):
    path = str(tmp_path / "out.npz")
    sio.save(binned, path)
    back = sio.load_npz(path)
    np.testing.assert_array_equal(back.data, binned.data)
    assert back.dims == binned.dims
    for d in binned.dims:
        np.testing.assert_allclose(back.coords[d], binned.coords[d])


def test_tiff_round_trip(binned, tmp_path):
    path = str(tmp_path / "out.tiff")
    sio.save(binned, path)
    stack = sio.load_tiff(path)
    assert stack.shape == (4, 6, 8)
    np.testing.assert_array_equal(stack, binned.data)


def test_tiff_1d_and_2d(tmp_path):
    one = BinnedData(np.arange(5, dtype="float32"), ["t"],
                     {"t": np.arange(5.0)})
    sio.to_tiff(one, str(tmp_path / "a.tif"))
    assert sio.load_tiff(str(tmp_path / "a.tif")).shape == (1, 1, 5)
    two = BinnedData(np.ones((3, 4), dtype="float32"), ["x", "y"],
                     {"x": np.arange(3.0), "y": np.arange(4.0)})
    sio.to_tiff(two, str(tmp_path / "b.tif"))
    assert sio.load_tiff(str(tmp_path / "b.tif")).shape == (1, 3, 4)


def test_h5_round_trip_if_available(binned, tmp_path):
    pytest.importorskip("h5py")
    path = str(tmp_path / "out.h5")
    sio.to_h5(binned, path)
    back = sio.load_h5(path)
    np.testing.assert_array_equal(back.data, binned.data)
    assert back.dims == binned.dims


def test_unknown_extension(binned, tmp_path):
    with pytest.raises(NotImplementedError):
        sio.save(binned, str(tmp_path / "out.xyz"))
