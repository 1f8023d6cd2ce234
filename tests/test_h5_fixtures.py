"""HDF5 fixture tests for the gated raw-ingestion paths.

These exercise the code that is dependency-gated in this runtime
(`MpesLoader._stage_h5`, `extract_bias`, NeXus write): they skip cleanly
when h5py is absent and light up the moment it lands, so the gated
branches never rot into dead code. The HDF5 layout mirrors the reference
mpes raw files (src/sed/loader/mpes/loader.py:56-179,392-431): one
dataset per channel, an msMarkers dataset of cumulative event indices,
and scalar file attributes (bias).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

h5py = pytest.importorskip("h5py")

from sed_spark.loader.mpes import (  # noqa: E402
    MpesLoader,
    extract_bias,
    synthesize_timestamps,
)

CHANNELS = {
    "X": {"dataset_key": "Stream_0"},
    "Y": {"dataset_key": "Stream_1"},
    "t": {"dataset_key": "Stream_2"},
}


@pytest.fixture()
def mpes_h5(tmp_path):
    """Two tiny mpes-shaped files: per-channel datasets + msMarkers +
    bias attribute. Returns (paths, per-file channel arrays, markers)."""
    rng = np.random.default_rng(7)
    paths, data, markers = [], {}, {}
    for f, n_events in enumerate((60, 35)):
        path = tmp_path / f"scan_{f}.h5"
        cols = {
            name: rng.uniform(0, 2048, n_events).astype(np.float64)
            for name in CHANNELS
        }
        # cumulative event index at each full ms (reference msMarkers
        # form), incl. an empty millisecond (duplicate marker)
        cum = np.array([n_events // 3, n_events // 3, n_events], dtype=np.int64)
        with h5py.File(path, "w") as h5:
            for name, spec in CHANNELS.items():
                h5.create_dataset(spec["dataset_key"], data=cols[name])
            h5.create_dataset("msMarkers", data=cum)
            h5.attrs["KTOF:Lens:Sample:V"] = 16.7777
            h5.create_dataset("bias_ds", data=np.float64(31.2345))
        paths.append(str(path))
        data[f] = cols
        markers[f] = cum
    return paths, data, markers


def test_stage_h5_roundtrip_through_loader(spark, mpes_h5):
    paths, data, _ = mpes_h5
    loader = MpesLoader(spark=spark, config={"channels": CHANNELS})
    df, meta = loader.read_dataframe(files=paths, ftype="h5")
    assert set(df.columns) >= {"X", "Y", "t", "file_id"}
    # float32 cast like the reference (mpes/loader.py:386-389)
    assert dict(df.dtypes)["X"] == "float"
    got = df.orderBy("file_id").toPandas()
    assert got.groupby("file_id").size().to_dict() == {0: 60, 1: 35}
    for f, cols in data.items():
        sel = got[got.file_id == f]
        np.testing.assert_allclose(
            np.sort(sel["X"].to_numpy()),
            np.sort(cols["X"].astype(np.float32)),
            rtol=1e-6,
        )


def test_stage_h5_dtype_override(spark, mpes_h5):
    paths, _, _ = mpes_h5
    loader = MpesLoader(
        spark=spark,
        config={"channels": CHANNELS, "channel_dtypes": {"t": "float64"}},
    )
    df, _ = loader.read_dataframe(files=paths[:1], ftype="h5")
    assert dict(df.dtypes)["t"] == "double"
    assert dict(df.dtypes)["X"] == "float"


def test_h5_markers_feed_stepwise_timestamp_synthesis(spark, mpes_h5):
    """Read msMarkers back from the raw files and run the distributed
    stepwise synthesis; oracle is the reference's fill loop verbatim
    (mpes/loader.py:417-427)."""
    paths, data, cum_markers = mpes_h5
    starts = {0: 1000.0, 1: 2000.0}
    # per-ms counts from the cumulative form stored in the file
    markers = {}
    for f, path in enumerate(paths):
        with h5py.File(path, "r") as h5:
            cum = np.asarray(h5["msMarkers"], dtype=np.float64)
        markers[f] = np.diff(np.concatenate([[0.0], cum]))
    rows = [
        (f, r) for f, cols in data.items() for r in range(len(cols["X"]))
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["file_id", "row_index"]),
    )
    got = (
        synthesize_timestamps(df, markers, starts)
        .orderBy("file_id", "row_index")
        .toPandas()
    )
    for f, cum in cum_markers.items():
        n = int(cum[-1])
        want = np.zeros(n)
        want[0:cum[0]] = starts[f]
        for i in range(len(cum) - 1):
            want[cum[i]:cum[i + 1]] = starts[f] + (i + 1) / 1000
        want[cum[-1]:n] = starts[f] + len(cum) / 1000
        sel = got[got.file_id == f].sort_values("row_index")
        np.testing.assert_allclose(
            sel["timeStamp"].to_numpy(), want, rtol=0, atol=1e-12,
        )


def test_extract_bias_attr_and_dataset(mpes_h5):
    paths, _, _ = mpes_h5
    # '@'-prefix -> H5 attribute; plain key -> dataset (reference
    # energy.py:1709-1729), both rounded to 2 decimals
    np.testing.assert_allclose(
        extract_bias(paths, "@KTOF:Lens:Sample:V"), [16.78, 16.78],
    )
    np.testing.assert_allclose(extract_bias(paths, "bias_ds"), [31.23, 31.23])


def test_nexus_write_if_available(tmp_path):
    from sed_spark.binning.core import BinnedData
    from sed_spark.io import to_nexus

    data = np.arange(12, dtype=np.float32).reshape(3, 4)
    res = BinnedData(
        data=data,
        dims=["kx", "energy"],
        coords={"kx": np.linspace(-2, 2, 3), "energy": np.linspace(-1, 1, 4)},
    )
    out = tmp_path / "out.nxs"
    to_nexus(res, str(out))
    with h5py.File(out, "r") as f:
        entries = list(f.keys())
        assert entries, "NeXus file has no entry group"
