"""N-dimensional histogram ("binning") on Spark.

The reference's entire partial/final machinery — per-partition Numba kernels,
batched scheduling, striped tree-sum combine (src/sed/binning/binning.py:200-427,
src/sed/binning/numba_bin.py) — collapses in Spark to ONE declarative job:

    select(bin-index expressions) -> groupBy(bins) -> count()

Catalyst/Tungsten provide column pruning to the parquet scan, whole-stage
codegen of the floor expressions, map-side partial aggregation, and a shuffle
whose width AQE sizes at runtime. The sparse (bin, count) result is collected
and densified on the driver; for event data the number of OCCUPIED bins is
bounded by the cube size, orders of magnitude below the event count, so the
collect is small even at 100 TB input.

Bin-index semantics replicate the reference kernel exactly
(src/sed/binning/numba_bin.py:53-61): ``j = round((x-lo)*1/width, 11)``
truncated toward zero, last edge inclusive, rows outside [lo, hi] (and NaNs)
dropped. Explicit (non-uniform) edges use left-closed bins with the last edge
inclusive (src/sed/binning/numba_bin.py:72-102).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from sed_spark.binning.spec import BinAxis, bin_centers_to_bin_edges, normalize_bins

__all__ = [
    "BinnedData",
    "bin_dataframe",
    "sparse_histogram",
    "bin_index_expr",
    "normalization_histogram_from_timestamps",
    "normalization_histogram_from_timed_dataframe",
]


@dataclass
class BinnedData:
    """Dense N-D histogram result (xarray-like: data + named coords + attrs).

    Stands in for the reference's ``xr.DataArray`` output
    (src/sed/binning/binning.py:408-427) without requiring xarray.
    """

    data: np.ndarray
    dims: list[str]
    coords: dict[str, np.ndarray]
    attrs: dict[str, Any] = field(default_factory=dict)

    @property
    def shape(self) -> tuple[int, ...]:
        return self.data.shape

    def __getitem__(self, idx):
        return self.data[idx]

    def axis(self, name: str) -> np.ndarray:
        return self.coords[name]

    def sum(self) -> float:
        return float(self.data.sum())

    def to_xarray(self):
        import xarray as xr  # optional dependency

        return xr.DataArray(data=self.data, coords=self.coords, dims=self.dims,
                            attrs=self.attrs)


# ---------------------------------------------------------------------------
# bin-index expressions
# ---------------------------------------------------------------------------

def bin_index_expr(axis: BinAxis, col: Column | None = None) -> tuple[Column, Column]:
    """Return ``(bin_index, is_valid)`` Columns for one axis.

    Uniform path is a pure JVM expression replicating the reference kernel's
    rounding (numba_bin.py:53-61). Non-uniform explicit edges use a
    left-closed binary-search equivalent built from ``width_bucket`` over the
    edge array via an aggregate expression (still JVM-side).
    """
    c = (col if col is not None else F.col(axis.name)).cast("double")
    if axis.uniform:
        delta = 1.0 / ((axis.hi - axis.lo) / axis.nbins)
        j = F.round((c - F.lit(axis.lo)) * F.lit(delta), 11)
        valid = c.isNotNull() & (j >= 0) & (j <= axis.nbins)
        idx = (
            F.when(j == axis.nbins, F.lit(axis.nbins - 1))
            .otherwise(F.floor(j))
            .cast(IntegerType())
        )
        return idx, valid
    # explicit edges: j such that edges[j] <= x < edges[j+1]; x == last edge
    # maps to the last bin. aggregate(edges, 0, acc + (x >= e)) counts edges
    # <= x — JVM-side, O(n_edges) but n_edges is small for explicit-edge use.
    edges = axis.edges
    arr = F.array(*[F.lit(float(e)) for e in edges[1:-1]])
    # count of interior edges <= x gives the left-closed bin index
    idx = F.aggregate(
        arr,
        F.lit(0),
        lambda acc, e: acc + F.when(c >= e, 1).otherwise(0),
    ).cast(IntegerType())
    valid = c.isNotNull() & (c >= float(edges[0])) & (c <= float(edges[-1]))
    return idx, valid


def _bin_columns(
    df: DataFrame,
    axes: list[BinAxis],
    jitter: Sequence[str] | dict | None = None,
    jitter_seed: int | None = None,
) -> tuple[DataFrame, list[str]]:
    """Project the bin-index columns (with optional per-axis jitter)."""
    cols: dict[str, Column] = {}
    names: list[str] = []
    valid_all: Column | None = None
    for i, ax in enumerate(axes):
        src: Column = F.col(ax.name)
        if jitter is not None:
            jmap = {k: None for k in jitter} if not isinstance(jitter, dict) else jitter
            if ax.name in jmap:
                pars = jmap[ax.name] or {}
                amp = pars.get("amplitude", 0.5)
                mode = pars.get("mode", "uniform")
                binsize = ax.width if ax.uniform else float(ax.edges[1] - ax.edges[0])
                # per-axis independent noise (reference bin_partition:144-166)
                seed = None if jitter_seed is None else jitter_seed + i
                if mode == "uniform":
                    noise = (F.rand(seed) if seed is not None else F.rand()) * 2.0 - 1.0
                else:
                    noise = F.randn(seed) if seed is not None else F.randn()
                src = src + F.lit(amp * binsize) * noise
        idx, valid = bin_index_expr(ax, src)
        bname = f"__bin_{ax.name}"
        cols[bname] = idx
        names.append(bname)
        valid_all = valid if valid_all is None else (valid_all & valid)
    out = df.withColumns(cols).filter(valid_all)
    return out, names


def sparse_histogram(
    df: DataFrame,
    bins,
    axes: Sequence[str] | None = None,
    ranges: Sequence[tuple[float, float]] | None = None,
    jitter=None,
    jitter_seed: int | None = None,
    extra_group_cols: Sequence[str] = (),
    count_alias: str = "count",
) -> tuple[DataFrame, list[BinAxis], list[str]]:
    """Build the sparse histogram query: groupBy(bin indices).count().

    Returns (lazy DataFrame, normalized axes, bin column names). This is the
    distributed core; everything else is driver-side densification.
    ``extra_group_cols`` supports the reference's ``return_partitions``
    (per-file hypercubes, binning.py:403-415) by adding e.g. ``file_id``.
    """
    norm = normalize_bins(bins, axes, ranges)
    proj, bin_names = _bin_columns(df, norm, jitter, jitter_seed)
    group_cols = list(extra_group_cols) + bin_names
    agg = proj.groupBy(*group_cols).agg(F.count(F.lit(1)).alias(count_alias))
    return agg, norm, bin_names


def bin_dataframe(
    df: DataFrame,
    bins,
    axes: Sequence[str] | None = None,
    ranges: Sequence[tuple[float, float]] | None = None,
    jitter=None,
    jitter_seed: int | None = None,
    dtype: str = "float32",
) -> BinnedData:
    """N-dimensional histogram, densified to a :class:`BinnedData`.

    Spark equivalent of the reference's ``bin_dataframe``
    (src/sed/binning/binning.py:200-427). The final cast to float32 follows
    binning.py:408,421.
    """
    agg, norm, bin_names = sparse_histogram(
        df, bins, axes, ranges, jitter=jitter, jitter_seed=jitter_seed,
    )
    shape = tuple(ax.nbins for ax in norm)
    sparse = agg.toPandas()
    dense = np.zeros(shape, dtype=np.uint64)
    if len(sparse):
        idx = tuple(sparse[n].to_numpy(dtype=np.int64) for n in bin_names)
        dense[idx] = sparse["count"].to_numpy(dtype=np.uint64)
    coords = {ax.name: ax.bin_centers() for ax in norm}
    return BinnedData(
        data=dense.astype(dtype),
        dims=[ax.name for ax in norm],
        coords=coords,
        attrs={"units": "counts"},
    )


# ---------------------------------------------------------------------------
# normalization histograms
# ---------------------------------------------------------------------------

def normalization_histogram_from_timestamps(
    df: DataFrame,
    axis: str,
    bin_centers: np.ndarray,
    time_stamp_column: str,
    order_col: str,
    group_col: str = "file_id",
) -> BinnedData:
    """Acquisition-time-per-bin histogram from event timestamps.

    Reference (src/sed/binning/binning.py:430-463): per-event dwell time
    ``ts.diff()`` then a sum grouped by ``pd.cut(axis, edges)`` — i.e.
    RIGHT-closed intervals (lo, hi]. The diff is a window ``lag`` within each
    file partition ordered by the load order (the reference's diff also
    restarts at dask partition boundaries).
    """
    from pyspark.sql import Window

    edges = bin_centers_to_bin_edges(np.asarray(bin_centers, dtype=np.float64))
    nbins = len(edges) - 1
    lo, hi = float(edges[0]), float(edges[-1])
    width = (hi - lo) / nbins

    w = Window.partitionBy(group_col).orderBy(order_col)
    dt = F.col(time_stamp_column) - F.lag(time_stamp_column).over(w)
    x = F.col(axis).cast("double")
    # pd.cut: right-closed (lo, hi] -> ceil((x-lo)/width) - 1
    j = F.ceil((x - F.lit(lo)) / F.lit(width)) - 1
    valid = x.isNotNull() & (x > lo) & (x <= hi)
    binned = (
        df.withColumn("__dt", dt)
        .withColumn("__bin", j.cast(IntegerType()))
        .filter(valid)
        .groupBy("__bin")
        .agg(F.sum("__dt").alias("norm"))
        .toPandas()
    )
    dense = np.full(nbins, np.nan)
    if len(binned):
        dense[binned["__bin"].to_numpy(dtype=np.int64)] = binned["norm"].to_numpy()
    centers = np.asarray(bin_centers, dtype=np.float64)
    return BinnedData(data=dense, dims=[axis], coords={axis: centers})


def normalization_histogram_from_timed_dataframe(
    df: DataFrame,
    axis: str,
    bin_centers: np.ndarray,
    time_unit: float,
) -> BinnedData:
    """Count histogram on the timed table × time_unit
    (reference src/sed/binning/binning.py:466-494)."""
    res = bin_dataframe(df, bins=[np.asarray(bin_centers, dtype=np.float64)],
                        axes=[axis], dtype="float64")
    res.data = res.data * time_unit
    return res
