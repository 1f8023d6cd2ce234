"""NXmpes tree construction (serializer-agnostic part of the NeXus sink)."""

from __future__ import annotations

import numpy as np
import pytest

from sed_spark.binning.core import BinnedData
from sed_spark.nexus import nexus_tree, write_nexus_h5


def _res():
    return BinnedData(
        data=np.arange(12.0).reshape(3, 4),
        dims=["energy", "delay"],
        coords={
            "energy": np.array([0.5, 1.5, 2.5]),
            "delay": np.array([-1.0, 0.0, 1.0, 2.0]),
        },
    )


def test_nxdata_signal_axes_and_indices():
    tree = nexus_tree(_res())
    assert tree["attrs"]["default"] == "entry"
    entry = tree["children"]["entry"]
    assert entry["attrs"]["NX_class"] == "NXentry"
    assert entry["children"]["definition"]["data"] == "NXmpes"
    data = entry["children"]["data"]
    assert data["attrs"]["signal"] == "data"
    assert data["attrs"]["axes"] == ["energy", "delay"]
    assert data["attrs"]["energy_indices"] == 0
    assert data["attrs"]["delay_indices"] == 1
    np.testing.assert_array_equal(
        data["children"]["data"]["data"], _res().data,
    )
    np.testing.assert_array_equal(
        data["children"]["energy"]["data"], [0.5, 1.5, 2.5],
    )
    assert data["children"]["energy"]["attrs"]["units"] == "eV"
    assert data["children"]["delay"]["attrs"]["units"] == "ps"


def test_metadata_recurses_and_process_records_bins():
    meta = {"instrument": {"beamline": "X", "hv": 21.7}, "run": 42}
    tree = nexus_tree(_res(), metadata=meta)
    entry = tree["children"]["entry"]
    md = entry["children"]["metadata"]
    assert md["attrs"]["NX_class"] == "NXcollection"
    assert md["children"]["run"]["data"] == 42
    assert md["children"]["instrument"]["children"]["hv"]["data"] == 21.7
    proc = entry["children"]["process"]
    assert proc["children"]["axis_0"]["data"] == "energy"
    assert proc["children"]["nbins_1"]["data"] == 4


def test_write_gated_on_h5py(tmp_path):
    pytest.importorskip("h5py", reason="h5py absent: write path is gated")
    out = tmp_path / "r.nxs"
    write_nexus_h5(nexus_tree(_res()), str(out))
    import h5py

    with h5py.File(out) as f:
        assert f["entry/data"].attrs["signal"] == "data"
        np.testing.assert_array_equal(f["entry/data/data"][()], _res().data)
