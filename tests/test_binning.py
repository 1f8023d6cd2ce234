"""Binning engine vs numpy oracle.

Mirrors the reference's kernel-vs-oracle strategy
(reference tests/test_binning.py:80-175: numba kernel asserted against
np.histogramdd)."""

import numpy as np
import pytest

from sed_spark.binning import bin_dataframe, normalize_bins
from sed_spark.binning.spec import bin_centers_to_bin_edges


def shifted_ranges(bins, ranges):
    out = []
    for nb, (lo, hi) in zip(bins, ranges):
        half = (hi - lo) / nb / 2
        out.append((lo - half, hi - half))
    return out


def test_hist_1d_matches_numpy(events_df, events_pdf):
    bins, ranges = [100], [(60_000.0, 120_000.0)]
    res = bin_dataframe(events_df, bins=bins, axes=["t"], ranges=ranges)
    ref, _ = np.histogramdd(
        events_pdf[["t"]].to_numpy(), bins=bins, range=shifted_ranges(bins, ranges),
    )
    assert res.shape == (100,)
    np.testing.assert_allclose(res.data, ref)


def test_hist_2d_matches_numpy(events_df, events_pdf):
    bins, ranges = [32, 48], [(0.0, 2048.0), (0.0, 2048.0)]
    res = bin_dataframe(events_df, bins=bins, axes=["X", "Y"], ranges=ranges)
    ref, _ = np.histogramdd(
        events_pdf[["X", "Y"]].to_numpy(), bins=bins, range=shifted_ranges(bins, ranges),
    )
    np.testing.assert_allclose(res.data, ref)


def test_hist_tuple_spec(events_df, events_pdf):
    res = bin_dataframe(events_df, bins=[(2_000.0, 20_000.0, 50)], axes=["ADC"])
    ref, _ = np.histogramdd(
        events_pdf[["ADC"]].to_numpy(),
        bins=[50],
        range=shifted_ranges([50], [(2_000.0, 20_000.0)]),
    )
    np.testing.assert_allclose(res.data, ref)


def test_hist_centers_spec(events_df, events_pdf):
    centers = np.linspace(65_000, 115_000, 64)
    res = bin_dataframe(events_df, bins=[centers], axes=["t"])
    edges = bin_centers_to_bin_edges(centers)
    ref, _ = np.histogramdd(events_pdf[["t"]].to_numpy(), bins=[edges])
    np.testing.assert_allclose(res.data, ref)
    np.testing.assert_allclose(res.coords["t"], centers)


def test_last_edge_inclusive_and_out_of_range(spark):
    import pandas as pd

    pdf = pd.DataFrame({"v": [0.0, 0.5, 1.0, 1.0000001, -0.3, np.nan]})
    df = spark.createDataFrame(pdf)
    res = bin_dataframe(df, bins=[(0.0, 1.0, 2)], axes=["v"])
    # shifted edges: [-0.25, 0.25, 0.75]; 0.0->bin0, 0.5->bin1;
    # 1.0, 1.0000001, -0.3 outside; NaN dropped
    assert res.data.sum() == 2
    np.testing.assert_allclose(res.data, [1, 1])


def test_exact_last_edge(spark):
    import pandas as pd

    pdf = pd.DataFrame({"v": [0.75]})
    df = spark.createDataFrame(pdf)
    res = bin_dataframe(df, bins=[(0.0, 1.0, 2)], axes=["v"])
    # 0.75 is exactly the (shifted) last edge -> counted in last bin
    np.testing.assert_allclose(res.data, [0, 1])


def test_methods_agree_4d(events_df, events_pdf):
    """All four physical strategies produce identical cubes."""
    bins = [12, 12, 12, 12]
    ranges = [(0.0, 2048.0), (0.0, 2048.0), (60_000.0, 120_000.0),
              (2_000.0, 20_000.0)]
    axes = ["X", "Y", "t", "ADC"]
    a = bin_dataframe(events_df, bins=bins, axes=axes, ranges=ranges,
                      method="groupby")
    ref, _ = np.histogramdd(
        events_pdf[axes].to_numpy(), bins=bins, range=shifted_ranges(bins, ranges),
    )
    np.testing.assert_allclose(a.data, ref)
    for method in ("chunked", "taskblob", "blockshuffle"):
        b = bin_dataframe(events_df, bins=bins, axes=axes, ranges=ranges,
                          method=method)
        np.testing.assert_array_equal(a.data, b.data)


def test_chunked_non_divisible_cube(events_df, events_pdf):
    """51^3 = 132651 cells -> nchunks=2, span=66326, last chunk is one cell
    short of span: the combine/assembly path must trim, not broadcast-error."""
    bins = [51, 51, 51]
    ranges = [(0.0, 2048.0), (0.0, 2048.0), (60_000.0, 120_000.0)]
    axes = ["X", "Y", "t"]
    a = bin_dataframe(events_df, bins=bins, axes=axes, ranges=ranges,
                      method="groupby")
    for method in ("chunked", "blockshuffle"):
        b = bin_dataframe(events_df, bins=bins, axes=axes, ranges=ranges,
                          method=method)
        np.testing.assert_array_equal(a.data, b.data)


def test_jitter_binning_total_preserved(events_df):
    res = bin_dataframe(
        events_df,
        bins=[100],
        axes=["t"],
        ranges=[(50_000.0, 130_000.0)],
        jitter=["t"],
        jitter_seed=7,
    )
    # jitter of half a bin at interior bins keeps all rows in range
    assert res.data.sum() == events_df.count()


def test_normalize_bins_dict():
    axes = normalize_bins({"t": (0.0, 10.0, 5), "X": (0.0, 1.0, 2)})
    assert [a.name for a in axes] == ["t", "X"]
    assert [a.nbins for a in axes] == [5, 2]


def test_normalize_bins_errors():
    with pytest.raises(ValueError):
        normalize_bins(10, axes=["t"])  # no ranges
    with pytest.raises(ValueError):
        normalize_bins([10, 10], axes=["t"], ranges=[(0, 1), (0, 1)])


def test_bin_dataframe_occupancy_hint_same_result(spark, events_df):
    # the hint only resizes the aggregation's reducer count — a sharply
    # peaked workload can opt out of the cube-sized raw-key shuffle; the
    # histogram itself must be identical
    from sed_spark.binning import bin_dataframe

    kw = dict(
        bins=[40, 40], axes=["X", "Y"],
        ranges=[(0.0, 2048.0), (0.0, 2048.0)],
    )
    base = bin_dataframe(events_df, **kw)
    hinted = bin_dataframe(events_df, occupancy_hint=100, **kw)
    assert (base.data == hinted.data).all()


# ---------------------------------------------------------------------------
# literal-edges grammar + equi-depth edges
# ---------------------------------------------------------------------------

def test_axis_from_edges_passthrough_and_validation():
    import pytest

    from sed_spark.binning import axis_from_edges, normalize_bins

    ax = axis_from_edges("x", [0.0, 1.0, 4.0, 10.0])
    assert ax.nbins == 3 and ax.lo == 0.0 and ax.hi == 10.0
    # normalize_bins passes pre-built axes through untouched (no
    # centers->edges round trip that would move literal edges)
    out = normalize_bins([ax])
    assert out[0] is ax
    with pytest.raises(ValueError, match="increasing"):
        axis_from_edges("x", [0.0, 2.0, 1.0])
    with pytest.raises(ValueError, match="at least 2"):
        axis_from_edges("x", [0.0])


def test_equidepth_histogram_balances_counts(spark):
    import numpy as np

    from sed_spark.binning import (
        axis_from_edges,
        equidepth_edges,
        sparse_histogram,
    )

    # heavily skewed data: exponential-ish via value**3 over [0, 1000]
    n = 20_000
    df = spark.range(n).selectExpr("CAST(id*id*id AS DOUBLE)/4e7 AS v")
    edges = equidepth_edges(df, "v", 10, exact=True)
    assert len(edges) == 11 and np.all(np.diff(edges) > 0)
    agg, _, names = sparse_histogram(
        df, bins=[axis_from_edges("v", edges)], count_alias="cnt",
    )
    counts = {r[names[0]]: r["cnt"] for r in agg.collect()}
    # each of the 10 bins holds ~n/10 rows
    assert set(counts) == set(range(10))
    assert all(abs(c - n / 10) <= n / 100 + 2 for c in counts.values())


def test_equidepth_edges_errors(spark):
    import pytest

    from sed_spark.binning import equidepth_edges

    df = spark.range(10).selectExpr("CAST(1.0 AS DOUBLE) AS v")
    # a constant column has no distinct quantiles
    with pytest.raises(ValueError, match="degenerate"):
        equidepth_edges(df, "v", 4, exact=True)
    with pytest.raises(ValueError, match="nbins"):
        equidepth_edges(df, "v", 0)
    empty = df.filter("v IS NULL")
    with pytest.raises(ValueError, match="no non-null"):
        equidepth_edges(empty, "v", 4, exact=True)
