"""Delay calibration: pump–probe delay stage ADC → picoseconds.

Pure Column expressions mirroring the reference's ``DelayCalibrator``
(reference: src/sed/calibrator/delay.py).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sed_spark import dfops

__all__ = ["mm_to_ps", "delay_expr", "append_delay_axis", "add_offsets"]


def mm_to_ps(delay_mm, time0_mm: float):
    """Delay-stage mm → relative ps, double-pass: ``(mm − t0)/0.15``
    (reference src/sed/calibrator/delay.py:434-449). Driver-side scalar."""
    return (np.asarray(delay_mm) - time0_mm) / 0.15


def delay_expr(
    adc: Column,
    adc_range: tuple[float, float],
    delay_range: tuple[float, float],
) -> Column:
    """Linear ADC→delay map
    ``delay = d0 + (adc − a0)·(d1 − d0)/(a1 − a0)``
    (reference src/sed/calibrator/delay.py:214-220)."""
    a0, a1 = float(adc_range[0]), float(adc_range[1])
    d0, d1 = float(delay_range[0]), float(delay_range[1])
    return F.lit(d0) + (adc.cast("double") - F.lit(a0)) * F.lit(d1 - d0) / F.lit(a1 - a0)


def append_delay_axis(
    df: DataFrame,
    adc_column: str = "ADC",
    delay_column: str = "delay",
    adc_range: tuple[float, float] | None = None,
    delay_range: tuple[float, float] | None = None,
    delay_range_mm: tuple[float, float] | None = None,
    time0: float | None = None,
) -> DataFrame:
    """Append the calibrated delay column. ``delay_range`` may come directly
    or via stage positions in mm + time0 (reference delay.py:82-233)."""
    if delay_range is None:
        if delay_range_mm is None or time0 is None:
            raise ValueError("need delay_range, or delay_range_mm + time0")
        rng = mm_to_ps(np.asarray(delay_range_mm, dtype=np.float64), float(time0))
        delay_range = (float(rng[0]), float(rng[1]))
    if adc_range is None:
        raise ValueError("adc_range is required")
    return df.withColumn(delay_column, delay_expr(F.col(adc_column), adc_range, delay_range))


def add_offsets(
    df: DataFrame,
    delay_column: str = "delay",
    constant: float | None = None,
    flip_delay_axis: bool = False,
    columns: str | Sequence[str] | None = None,
    weights: float | Sequence[float] | None = None,
    reductions: str | Sequence[str] | None = None,
    preserve_mean: bool | Sequence[bool] = False,
) -> DataFrame:
    """Constant/column offsets and axis flip on the delay column
    (reference src/sed/calibrator/delay.py:235-402)."""
    out = df
    if columns is not None:
        if isinstance(columns, str):
            columns = [columns]
        if weights is None:
            weights = [1.0] * len(columns)
        out = dfops.offset_by_other_columns(
            out,
            target_column=delay_column,
            offset_columns=columns,
            weights=weights,
            reductions=reductions,
            preserve_mean=preserve_mean,
        )
    if constant is not None:
        out = out.withColumn(delay_column, F.col(delay_column) + F.lit(float(constant)))
    if flip_delay_axis:
        out = out.withColumn(delay_column, -F.col(delay_column))
    return out
