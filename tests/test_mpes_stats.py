"""Tests for the mpes-style loader pieces and parquet footer statistics."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sed_spark.loader import get_loader
from sed_spark.loader.mpes import (
    MpesLoader,
    count_rate_from_markers,
    synthesize_timestamps,
    timed_dataframe_from_markers,
)
from sed_spark.loader.stats import (
    elapsed_time_from_stats,
    file_stats_df,
    parquet_file_stats,
)


@pytest.fixture(scope="module")
def marker_setup():
    """Two files with known ms markers: file 0 has 10+20+30 events over
    3 ms, file 1 has 5+5 events over 2 ms."""
    markers = {0: np.array([10.0, 20.0, 30.0]), 1: np.array([5.0, 5.0])}
    starts = {0: 1000.0, 1: 2000.0}
    return markers, starts


def test_synthesize_timestamps_matches_numpy(spark, marker_setup):
    markers, starts = marker_setup
    rows = []
    for f, m in markers.items():
        for r in range(int(m.sum())):
            rows.append((f, r))
    pdf = pd.DataFrame(rows, columns=["file_id", "row_index"])
    df = spark.createDataFrame(pdf)
    got = (
        synthesize_timestamps(df, markers, starts)
        .orderBy("file_id", "row_index")
        .toPandas()
    )
    for f, m in markers.items():
        # oracle = the reference's stepwise fill loop verbatim
        # (mpes/loader.py:417-427), on the cumulative marker form
        n = int(m.sum())
        ms_marker = np.cumsum(m).astype(int)
        want = np.zeros(n)
        want[0:ms_marker[0]] = starts[f]
        for i in range(len(ms_marker) - 1):
            want[ms_marker[i]:ms_marker[i + 1]] = starts[f] + (i + 1) / 1000
        want[ms_marker[-1]:n] = starts[f] + len(ms_marker) / 1000
        sel = got[got.file_id == f].sort_values("row_index")
        np.testing.assert_allclose(sel["timeStamp"].to_numpy(), want, rtol=0, atol=1e-12)
    # monotone within each file, and bounded by the acquisition span
    for f, m in markers.items():
        ts = got[got.file_id == f].sort_values("row_index")["timeStamp"].to_numpy()
        assert (np.diff(ts) >= 0).all()
        assert ts[0] >= starts[f]
        assert ts[-1] <= starts[f] + len(m) * 1e-3


def test_timed_dataframe_from_markers(spark, marker_setup):
    markers, starts = marker_setup
    timed = timed_dataframe_from_markers(spark, markers, starts)
    pdf = timed.orderBy("file_id", "ms_index").toPandas()
    assert len(pdf) == 5  # 3 ms + 2 ms
    f0 = pdf[pdf.file_id == 0]
    np.testing.assert_allclose(f0["timeStamp"], [1000.0, 1000.001, 1000.002])
    np.testing.assert_allclose(f0["events_in_ms"], [10.0, 20.0, 30.0])


def test_count_rate_from_markers(marker_setup):
    markers, _ = marker_setup
    rates = count_rate_from_markers(markers, rolling_ms=2)
    t, r = rates[0]
    # rolling window of 2 ms: (10+20)/2ms, (20+30)/2ms in events/s
    np.testing.assert_allclose(r, [15000.0, 25000.0])
    assert len(t) == len(r)


def test_mpes_loader_registry_and_h5_gating(spark):
    loader = get_loader("mpes", spark=spark)
    assert isinstance(loader, MpesLoader)
    from sed_spark.loader.mpes import HAS_H5PY

    if not HAS_H5PY:
        with pytest.raises(NotImplementedError):
            loader.read_dataframe(files=["/nonexistent.h5"], ftype="h5")


def test_parquet_file_stats_footer_only(tmp_path, spark, events_pdf):
    paths = []
    for f in range(2):
        p = str(tmp_path / f"part{f}.parquet")
        events_pdf[events_pdf.file_id == f][["X", "t", "timeStamp"]].to_parquet(p)
        paths.append(p)
    stats = parquet_file_stats(paths, columns=["t", "timeStamp"])
    for f, s in enumerate(stats):
        sub = events_pdf[events_pdf.file_id == f]
        assert s["num_rows"] == len(sub)
        assert np.isclose(s["min"]["t"], sub["t"].min())
        assert np.isclose(s["max"]["t"], sub["t"].max())
    # elapsed time from footers == max-min of timestamps, summed
    want = sum(
        float(events_pdf[events_pdf.file_id == f]["timeStamp"].max()
              - events_pdf[events_pdf.file_id == f]["timeStamp"].min())
        for f in range(2)
    )
    got = elapsed_time_from_stats(stats)
    assert np.isclose(got, want)


def test_file_stats_df_matches_footers(tmp_path, spark, events_pdf, events_df):
    stats_df = file_stats_df(events_df, ["t"]).orderBy("file_id").toPandas()
    for _, row in stats_df.iterrows():
        sub = events_pdf[events_pdf.file_id == row.file_id]
        assert row.num_rows == len(sub)
        assert np.isclose(row.t_min, sub["t"].min())
        assert np.isclose(row.t_max, sub["t"].max())
