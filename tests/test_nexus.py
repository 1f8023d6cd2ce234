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


def test_validator_passes_complete_tree_and_lists_gaps():
    from sed_spark.nexus import validate_nexus_tree

    # bare tree: structural NXdata contract holds, but the NXmpes
    # checklist flags the missing acquisition fields
    bare = nexus_tree(_res())
    probs = validate_nexus_tree(bare)
    assert any("start_time" in p for p in probs)
    assert any("instrument" in p for p in probs)
    assert any("sample" in p for p in probs)
    assert not any("signal" in p or "axes" in p for p in probs)
    # complete tree: checklist-clean
    full = nexus_tree(
        _res(),
        start_time="2026-08-15T00:00:00Z",
        instrument={"beamline": "X", "energy_resolution": 0.03},
        sample={"name": "WSe2"},
    )
    assert validate_nexus_tree(full) == []
    inst = full["children"]["entry"]["children"]["instrument"]
    assert inst["attrs"]["NX_class"] == "NXinstrument"
    assert inst["children"]["beamline"]["data"] == "X"


def test_validator_catches_structural_breakage():
    import pytest as _pytest

    from sed_spark.nexus import validate_nexus_tree

    tree = nexus_tree(
        _res(), start_time="t", instrument={"a": 1}, sample={"name": "s"},
    )
    data = tree["children"]["entry"]["children"]["data"]
    # a broken signal pointer short-circuits the (shape-dependent) axis
    # checks — one problem, loudly
    data["attrs"]["signal"] = "nope"
    probs = validate_nexus_tree(tree)
    assert any("@signal='nope'" in p for p in probs)
    with _pytest.raises(ValueError, match="fails validation"):
        validate_nexus_tree(tree, strict=True)
    # with the signal intact, a stripped units attribute is caught
    data["attrs"]["signal"] = "data"
    del data["children"]["delay"]["attrs"]["units"]
    probs = validate_nexus_tree(tree)
    assert any("units" in p for p in probs)


def test_validator_reports_missing_attrs_instead_of_crashing():
    # hand-built / foreign trees may lack "attrs" on any node — the
    # validator must report the gap as a problem, not raise KeyError
    from sed_spark.nexus import validate_nexus_tree

    tree = nexus_tree(
        _res(), start_time="t", instrument={"a": 1}, sample={"name": "s"},
    )
    data = tree["children"]["entry"]["children"]["data"]
    del data["children"]["energy"]["attrs"]  # axis node with no attrs at all
    probs = validate_nexus_tree(tree)
    assert any("energy" in p and "units" in p for p in probs)
    # data group itself stripped of attrs: reported as a missing @signal
    del data["attrs"]
    probs = validate_nexus_tree(tree)
    assert any("@signal" in p for p in probs)


def test_to_nexus_pops_tree_kwargs_before_pynxtools_convert(monkeypatch):
    # the same to_nexus call must behave identically whether pynxtools is
    # installed or not: tree-building kwargs never leak into convert()
    import sys
    import types

    from sed_spark import nexus as nexus_mod

    seen = {}

    def fake_convert(**kwargs):
        seen.update(kwargs)

    pkg = types.ModuleType("pynxtools")
    dc = types.ModuleType("pynxtools.dataconverter")
    cv = types.ModuleType("pynxtools.dataconverter.convert")
    cv.convert = fake_convert
    pkg.dataconverter = dc
    dc.convert = cv
    monkeypatch.setitem(sys.modules, "pynxtools", pkg)
    monkeypatch.setitem(sys.modules, "pynxtools.dataconverter", dc)
    monkeypatch.setitem(sys.modules, "pynxtools.dataconverter.convert", cv)
    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        nexus_mod.to_nexus(
            _res(), "/tmp/ignored.nxs",
            start_time="2026-08-16T00:00:00Z",
            instrument={"beamline": "X"},
            sample={"name": "WSe2"},
            title="t",
            units={"energy": "eV"},
            metadata={"run": 1},
            eln_data="converter-only.yml",
        )
    tree_only = {"start_time", "instrument", "sample", "title", "units",
                 "metadata"}
    assert tree_only.isdisjoint(seen)
    # round 10: dropping caller metadata must be LOUD on the converter
    # path — the values cannot be threaded into pynxtools' own tree
    assert any(
        "will NOT reach the exported file" in str(w.message) for w in caught
    )
    assert seen["eln_data"] == "converter-only.yml"
    assert seen["nxdl"] == "NXmpes"


def test_validator_checks_axis_length_against_signal_dim():
    from sed_spark.nexus import validate_nexus_tree

    tree = nexus_tree(
        _res(), start_time="t", instrument={"a": 1}, sample={"name": "s"},
    )
    data = tree["children"]["entry"]["children"]["data"]
    data["children"]["energy"]["data"] = data["children"]["energy"]["data"][:2]
    probs = validate_nexus_tree(tree)
    assert any("does not match signal dim" in p for p in probs)
