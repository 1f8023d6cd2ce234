"""Momentum calibration: detector (x, y) → momentum (kx, ky).

Two parts, mirroring the reference's ``MomentumCorrector``
(reference: src/sed/calibrator/momentum.py):

* the affine detector→k conversion — pure Column expressions;
* the non-affine distortion correction ``apply_dfield`` — bilinear lookup of
  each event's (x, y) in a precomputed inverse deformation field
  (momentum.py:2104-2140, scipy ``map_coordinates(order=1)`` semantics).
  This is the engine's ONE genuinely non-expressible transform: implemented
  as an Arrow-batched pandas UDF over the dense grid, which Spark ships to
  executors inside the serialized closure (one copy per executor process —
  the 2×2048×2048 float64 field is ~64 MB, well within broadcast budget).

The driver-side deformation-field *estimation* (spline warp from symmetry
landmarks, momentum.py:627-826) needs scipy and is deferred; the dataflow
operator below accepts any precomputed field.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

__all__ = [
    "k_coordinates_expr",
    "append_k_axis",
    "bilinear_sample",
    "apply_dfield",
]


def k_coordinates_expr(
    r_det: Column,
    c_det: Column,
    r_start: float,
    c_start: float,
    r_center: float,
    c_center: float,
    r_conversion: float,
    c_conversion: float,
    r_step: float,
    c_step: float,
) -> tuple[Column, Column]:
    """Affine detector→momentum conversion
    ``k = conv · ((r − (start + step·center)) / step)``
    (reference src/sed/calibrator/momentum.py:2066-2101)."""
    r_det0 = r_start + r_step * r_center
    c_det0 = c_start + c_step * c_center
    k_r = F.lit(float(r_conversion)) * (
        (r_det.cast("double") - F.lit(float(r_det0))) / F.lit(float(r_step))
    )
    k_c = F.lit(float(c_conversion)) * (
        (c_det.cast("double") - F.lit(float(c_det0))) / F.lit(float(c_step))
    )
    return k_r, k_c


def append_k_axis(
    df: DataFrame,
    x_column: str = "X",
    y_column: str = "Y",
    kx_column: str = "kx",
    ky_column: str = "ky",
    **params,
) -> DataFrame:
    """Append kx/ky columns (reference src/sed/calibrator/momentum.py:1890-1990)."""
    kx, ky = k_coordinates_expr(F.col(x_column), F.col(y_column), **params)
    return df.withColumns({kx_column: kx, ky_column: ky})


def bilinear_sample(
    grid: np.ndarray,
    rows: np.ndarray,
    cols: np.ndarray,
    mode: str = "constant",
) -> np.ndarray:
    """Bilinear interpolation of ``grid`` at fractional (rows, cols).

    ``mode="constant"`` matches ``scipy.ndimage.map_coordinates(grid,
    [rows, cols], order=1, mode='constant', cval=0)`` semantics — the
    reference's dfield lookup (momentum.py:2119-2124) — without the scipy
    dependency: points outside the grid sample 0 for the out-of-bounds
    corners. ``mode="nearest"`` clamps to the edge instead (used by the
    field inversion, where cval=0 would make boundary iterates diverge).
    """
    h, w = grid.shape
    if mode == "nearest":
        rows = np.clip(rows, 0.0, h - 1.0)
        cols = np.clip(cols, 0.0, w - 1.0)
        r0 = np.minimum(np.floor(rows).astype(np.int64), h - 2)
        c0 = np.minimum(np.floor(cols).astype(np.int64), w - 2)
        fr = rows - r0
        fc = cols - c0
        v00 = grid[r0, c0]
        v01 = grid[r0, c0 + 1]
        v10 = grid[r0 + 1, c0]
        v11 = grid[r0 + 1, c0 + 1]
        top = v00 * (1 - fc) + v01 * fc
        bot = v10 * (1 - fc) + v11 * fc
        return top * (1 - fr) + bot * fr
    r0 = np.floor(rows).astype(np.int64)
    c0 = np.floor(cols).astype(np.int64)
    fr = rows - r0
    fc = cols - c0

    def sample(ri, ci):
        ok = (ri >= 0) & (ri < h) & (ci >= 0) & (ci < w)
        out = np.zeros(rows.shape, dtype=np.float64)
        out[ok] = grid[ri[ok], ci[ok]]
        return out

    v00 = sample(r0, c0)
    v01 = sample(r0, c0 + 1)
    v10 = sample(r0 + 1, c0)
    v11 = sample(r0 + 1, c0 + 1)
    top = v00 * (1 - fc) + v01 * fc
    bot = v10 * (1 - fc) + v11 * fc
    return top * (1 - fr) + bot * fr


def apply_dfield(
    df: DataFrame,
    dfield: np.ndarray,
    x_column: str = "X",
    y_column: str = "Y",
    new_x_column: str = "Xm",
    new_y_column: str = "Ym",
    detector_ranges: tuple[tuple[float, float], tuple[float, float]] = (
        (0.0, 2048.0),
        (0.0, 2048.0),
    ),
) -> DataFrame:
    """Non-affine distortion correction via inverse deformation field.

    Reference semantics (src/sed/calibrator/momentum.py:2104-2140): scale
    each event's (x, y) into grid index space, then bilinear-sample
    ``dfield[0]`` → corrected x and ``dfield[1]`` → corrected y.

    Implemented as one Arrow-batched pandas UDF producing a struct of both
    corrected coordinates (a single pass over the grid per batch).
    """
    dfield = np.ascontiguousarray(np.asarray(dfield, dtype=np.float64))
    if dfield.ndim != 3 or dfield.shape[0] != 2:
        raise ValueError("dfield must have shape (2, H, W)")
    (xmin, xmax), (ymin, ymax) = detector_ranges
    h, w = dfield.shape[1], dfield.shape[2]
    x_scale = (h - 1) / (xmax - xmin)
    y_scale = (w - 1) / (ymax - ymin)
    fx, fy = dfield[0], dfield[1]

    from pyspark.sql.types import StructField, StructType

    out_type = StructType(
        [StructField("x", DoubleType()), StructField("y", DoubleType())],
    )

    @F.pandas_udf(out_type)
    def _warp(x: pd.Series, y: pd.Series) -> pd.DataFrame:
        rows = (x.to_numpy(dtype=np.float64) - xmin) * x_scale
        cols = (y.to_numpy(dtype=np.float64) - ymin) * y_scale
        return pd.DataFrame(
            {
                "x": bilinear_sample(fx, rows, cols),
                "y": bilinear_sample(fy, rows, cols),
            },
        )

    tmp = "__dfield__"
    out = df.withColumn(tmp, _warp(F.col(x_column), F.col(y_column)))
    return (
        out.withColumn(new_x_column, F.col(f"{tmp}.x"))
        .withColumn(new_y_column, F.col(f"{tmp}.y"))
        .drop(tmp)
    )
