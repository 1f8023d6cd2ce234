"""SedProcessor-style session facade.

Mirrors the user-facing API surface of the reference's ``SedProcessor``
(reference: src/sed/core/processor.py) on Spark: holds the lazy event and
timed DataFrames plus a metadata tree, and chains pure-expression transforms
onto both. Nothing executes until ``compute()`` (the histogram query) or an
explicit action — same lazy contract as the reference, but the "plan" is a
Catalyst logical plan instead of a dask task graph.
"""

from __future__ import annotations

import math
from collections.abc import Sequence
from typing import Any

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from sed_spark import dfops
from sed_spark.binning import (
    BinnedData,
    bin_dataframe,
    normalization_histogram_from_timed_dataframe,
    normalization_histogram_from_timestamps,
)
from sed_spark.calibrator import delay as delay_cal
from sed_spark.calibrator import energy as energy_cal
from sed_spark.calibrator import momentum as momentum_cal
from sed_spark.loader import get_loader
from sed_spark.metadata import MetaHandler
from sed_spark.session import get_spark


class SedProcessor:
    """Single-event data processing session on Spark."""

    def __init__(
        self,
        spark: SparkSession | None = None,
        config: dict[str, Any] | str | None = None,
        loader: str | None = None,
        metadata: dict | None = None,
        **config_kwds,
    ) -> None:
        from sed_spark.config import parse_config

        self.spark = spark or get_spark()
        self.config = parse_config(config, **config_kwds)
        self._dataframe: DataFrame | None = None
        self._timed_dataframe: DataFrame | None = None
        self._attributes = MetaHandler(metadata)
        loader_name = loader or self.config.get("core", {}).get("loader", "generic")
        self.loader = get_loader(loader_name, spark=self.spark, config=self.config)

    def _col(self, name: str) -> str:
        """Resolve an ``@`` column alias against the session config
        (reference src/sed/core/processor.py:1994-1996)."""
        from sed_spark.config import resolve_column_alias

        return resolve_column_alias(name, self.config)

    # -- loading -----------------------------------------------------------
    @property
    def dataframe(self) -> DataFrame:
        if self._dataframe is None:
            raise RuntimeError("no dataframe loaded — call load() first")
        return self._dataframe

    @property
    def timed_dataframe(self) -> DataFrame | None:
        return self._timed_dataframe

    @property
    def attributes(self) -> MetaHandler:
        return self._attributes

    def load(
        self,
        dataframe: DataFrame | None = None,
        files: Sequence[str] | None = None,
        folder: str | None = None,
        timed_dataframe: DataFrame | None = None,
        **kwds,
    ) -> "SedProcessor":
        """Load events from an existing DataFrame, file list, or folder
        (reference src/sed/core/processor.py:408-493)."""
        if dataframe is not None:
            self._dataframe = dataframe
            metadata: dict = {}
        else:
            self._dataframe, metadata = self.loader.read_dataframe(
                files=files, folder=folder, **kwds,
            )
        self._timed_dataframe = timed_dataframe
        if metadata:
            self._attributes.add(metadata, "loader", duplicate_policy="merge")
        return self

    # -- helpers -----------------------------------------------------------
    def _apply_both(self, fn, timed_ok_columns: Sequence[str] | None = None, **kwargs):
        """Apply a transform to the event df and (when its inputs exist
        there) the timed df — the reference's double bookkeeping
        (src/sed/core/processor.py:854-866)."""
        self._dataframe = fn(self._dataframe, **kwargs)
        if self._timed_dataframe is not None:
            need = timed_ok_columns or []
            if all(c in self._timed_dataframe.columns for c in need):
                self._timed_dataframe = fn(self._timed_dataframe, **kwargs)

    # -- generic ops -------------------------------------------------------
    def filter_column(
        self,
        col: str,
        lower_bound: float = -math.inf,
        upper_bound: float = math.inf,
    ) -> "SedProcessor":
        """(reference src/sed/core/processor.py:495-534)"""
        col = self._col(col)
        self._apply_both(
            dfops.apply_filter,
            timed_ok_columns=[col],
            col=col,
            lower_bound=lower_bound,
            upper_bound=upper_bound,
        )
        self._attributes.add(
            {"filter": {"col": col, "lower_bound": lower_bound, "upper_bound": upper_bound}},
            "filter",
            duplicate_policy="merge",
        )
        return self

    def add_jitter(
        self,
        cols: Sequence[str] | None = None,
        amps: float | Sequence[float] | None = None,
        jitter_type: str = "uniform",
        seed: int | None = None,
    ) -> "SedProcessor":
        """In-place jitter on the listed columns, defaulting to the config's
        jitter_cols with @ aliases resolved
        (reference src/sed/core/processor.py:1974-2025)."""
        dfconf = self.config.get("dataframe", {})
        if cols is None:
            cols = dfconf.get("jitter_cols", [])
        if amps is None:
            amps = dfconf.get("jitter_amps", 0.5)
        cols = [self._col(c) for c in cols]
        self._dataframe = dfops.apply_jitter(
            self._dataframe, cols, cols_jittered=cols, amps=amps,
            jitter_type=jitter_type, seed=seed,
        )
        self._attributes.add({"jitter": {"cols": cols}}, "jitter", "merge")
        return self

    def add_time_stamped_data(
        self,
        time_stamps: np.ndarray,
        data: np.ndarray,
        dest_column: str,
        time_stamp_column: str = "timeStamp",
    ) -> "SedProcessor":
        self._apply_both(
            dfops.add_time_stamped_data,
            timed_ok_columns=[time_stamp_column],
            time_stamps=time_stamps,
            data=data,
            dest_column=dest_column,
            time_stamp_column=time_stamp_column,
        )
        return self

    # -- calibration chain -------------------------------------------------
    def apply_energy_correction(self, **kwds) -> "SedProcessor":
        tof = kwds.get("tof_column", "t")
        self._apply_both(
            energy_cal.apply_energy_correction, timed_ok_columns=[tof], **kwds,
        )
        return self

    def append_energy_axis(self, **kwds) -> "SedProcessor":
        tof = kwds.get("tof_column", "t")
        self._apply_both(energy_cal.append_energy_axis, timed_ok_columns=[tof], **kwds)
        return self

    def add_energy_offset(self, **kwds) -> "SedProcessor":
        self._dataframe = energy_cal.add_offsets(self._dataframe, **kwds)
        return self

    def align_dld_sectors(self, sector_delays: Sequence[float], **kwds) -> "SedProcessor":
        self._dataframe = energy_cal.align_dld_sectors(
            self._dataframe, sector_delays, **kwds,
        )
        return self

    def append_tof_ns_axis(
        self,
        tof_column: str = "t",
        tof_ns_column: str = "t_ns",
        binwidth: float = 4.125e-12,
        binning: int = 1,
    ) -> "SedProcessor":
        def _fn(df):
            from pyspark.sql import functions as F

            return df.withColumn(
                tof_ns_column,
                energy_cal.tof2ns_expr(F.col(tof_column), binwidth, binning),
            )

        self._apply_both(_fn, timed_ok_columns=[tof_column])
        return self

    def apply_momentum_calibration(self, **kwds) -> "SedProcessor":
        x = kwds.get("x_column", "X")
        y = kwds.get("y_column", "Y")
        self._apply_both(momentum_cal.append_k_axis, timed_ok_columns=[x, y], **kwds)
        return self

    def apply_momentum_correction(self, dfield: np.ndarray, **kwds) -> "SedProcessor":
        self._dataframe = momentum_cal.apply_dfield(self._dataframe, dfield, **kwds)
        return self

    def calibrate_delay_axis(self, **kwds) -> "SedProcessor":
        adc = kwds.get("adc_column", "ADC")
        self._apply_both(delay_cal.append_delay_axis, timed_ok_columns=[adc], **kwds)
        return self

    def add_delay_offset(self, **kwds) -> "SedProcessor":
        self._dataframe = delay_cal.add_offsets(self._dataframe, **kwds)
        return self

    # -- the aggregation query --------------------------------------------
    def compute(
        self,
        bins,
        axes: Sequence[str] | None = None,
        ranges: Sequence[tuple[float, float]] | None = None,
        normalize_to_acquisition_time: bool | str = False,
        filters: Sequence[dict] | None = None,
        max_file_id: int | None = None,
        **kwds,
    ) -> BinnedData:
        """Run the N-D histogram (reference src/sed/core/processor.py:2150-2314).

        ``max_file_id`` replaces the reference's partition pruning
        (processor.py:2229-2235) with a ``file_id`` predicate that prunes at
        the parquet-footer level.
        """
        df = self._dataframe
        if max_file_id is not None:
            from pyspark.sql import functions as F

            df = df.filter(F.col("file_id") < max_file_id)
        if filters:
            for f in filters:
                df = dfops.apply_filter(
                    df,
                    f["col"],
                    f.get("lower_bound", -math.inf),
                    f.get("upper_bound", math.inf),
                )
        result = bin_dataframe(df, bins, axes, ranges, **kwds)

        if normalize_to_acquisition_time:
            axis = (
                normalize_to_acquisition_time
                if isinstance(normalize_to_acquisition_time, str)
                else result.dims[0]
            )
            norm = self.get_normalization_histogram(axis, result.coords[axis])
            with np.errstate(divide="ignore", invalid="ignore"):
                result.data = result.data / norm.data.reshape(
                    [-1 if d == axis else 1 for d in result.dims],
                )
            result.attrs["normalized"] = axis
        result.attrs["metadata"] = self._attributes.metadata
        return result

    def save(self, result: BinnedData, faddr: str, **kwds) -> None:
        """Extension-dispatched export of a computed result
        (reference src/sed/core/processor.py:2480-2573)."""
        from sed_spark import io as sio

        sio.save(result, faddr, **kwds)

    def get_normalization_histogram(
        self,
        axis: str,
        bin_centers: np.ndarray,
        use_time_stamps: bool = False,
        time_stamp_column: str = "timeStamp",
        order_col: str = "row_index",
        time_unit: float = 0.001,
    ) -> BinnedData:
        """(reference src/sed/core/processor.py:2316-2391)"""
        if use_time_stamps or self._timed_dataframe is None:
            return normalization_histogram_from_timestamps(
                self._dataframe, axis, bin_centers, time_stamp_column, order_col,
            )
        return normalization_histogram_from_timed_dataframe(
            self._timed_dataframe, axis, bin_centers, time_unit,
        )
