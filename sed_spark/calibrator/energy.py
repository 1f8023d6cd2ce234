"""Energy calibration: TOF → energy transforms as pure Column expressions.

Re-expresses the physics formulas of the reference's ``EnergyCalibrator``
(reference: src/sed/calibrator/energy.py) as Spark Column builders; Catalyst
fuses them into whole-stage-codegen projections, so the full calibration
chain costs one pass over the data with zero Python in the loop.

Driver-side parameter *fitting* (bias-series peak tracking) lives in
:mod:`sed_spark.calibrator.fitting`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sed_spark import dfops

# m_e/2 in eV·s²/m² units as used by the reference (energy.py:2414)
_TOF2EV_CONST = 2.84281e-12

__all__ = [
    "tof2ev_expr",
    "tof2evpoly_expr",
    "tof2ns_expr",
    "correction_expr",
    "append_energy_axis",
    "apply_energy_correction",
    "align_dld_sectors",
    "add_offsets",
]


def tof2ev_expr(
    t: Column,
    tof_distance: float,
    time_offset: float,
    binwidth: float,
    binning: int,
    energy_scale: str = "kinetic",
    energy_offset: float = 0.0,
) -> Column:
    """``E = sign · 2.84281e-12 · (d/(t·binwidth·binning − t0))² + E0``
    (reference src/sed/calibrator/energy.py:2381-2418). ``t`` is the TOF in
    bin numbers; upcast to double per energy.py:891."""
    sign = 1.0 if energy_scale == "kinetic" else -1.0
    tt = t.cast("double") * F.lit(float(binwidth)) * F.lit(float(binning)) - F.lit(
        float(time_offset),
    )
    ratio = F.lit(float(tof_distance)) / tt
    return F.lit(_TOF2EV_CONST * sign) * ratio * ratio + F.lit(float(energy_offset))


def tof2evpoly_expr(
    t: Column,
    poly_a: Sequence[float],
    energy_offset: float = 0.0,
) -> Column:
    """Polynomial TOF→energy: ``Σ poly_a[::-1][i]·t^(i+1) + E0`` with
    ``poly_a`` highest-order-first and no constant term
    (reference src/sed/calibrator/energy.py:2420-2445).

    Built in Horner form over ``t``: a1·t + a2·t² + … = t·(a1 + t·(a2 + …)).
    """
    td = t.cast("double")
    rev = list(poly_a)  # highest-order-first; rev[-1] is the linear term
    acc: Column = F.lit(float(rev[0]))
    for coeff in rev[1:]:
        acc = acc * td + F.lit(float(coeff))
    return acc * td + F.lit(float(energy_offset))


def tof2ns_expr(t: Column, binwidth: float, binning: int) -> Column:
    """``t · 1e9 · binwidth · binning``
    (reference src/sed/calibrator/energy.py:2447-2464)."""
    return t.cast("double") * F.lit(1e9) * F.lit(float(binwidth)) * F.lit(float(binning))


def correction_expr(
    x: Column,
    y: Column,
    correction_type: str,
    center: tuple[float, float],
    amplitude: float,
    **kwds,
) -> Column:
    """TOF correction surface over detector (x, y)
    (reference src/sed/calibrator/energy.py:1730-1842). All four profiles are
    closed-form radial expressions — pure JVM arithmetic."""
    cx, cy = float(center[0]), float(center[1])
    dx = x.cast("double") - F.lit(cx)
    dy = y.cast("double") - F.lit(cy)
    r2 = dx * dx + dy * dy
    amp = float(amplitude)

    if correction_type == "spherical":
        diameter = float(kwds["diameter"])
        return -(
            (F.lit(1.0) - F.sqrt(F.lit(1.0) - r2 / F.lit(diameter**2)))
            * F.lit(100.0 * amp)
        )
    if correction_type == "Lorentzian":
        import math

        gamma = float(kwds["gamma"])
        return F.lit(100000.0 * amp / (gamma * math.pi)) * (
            F.lit(gamma**2) / (r2 + F.lit(gamma**2)) - F.lit(1.0)
        )
    if correction_type == "Gaussian":
        import math

        sigma = float(kwds["sigma"])
        return F.lit(20000.0 * amp / math.sqrt(2 * math.pi * sigma**2)) * (
            F.exp(-r2 / F.lit(2 * sigma**2)) - F.lit(1.0)
        )
    if correction_type == "Lorentzian_asymmetric":
        import math

        gamma = float(kwds["gamma"])
        gamma2 = float(kwds.get("gamma2", gamma))
        amp2 = float(kwds.get("amplitude2", amp))
        corr_y = F.lit(100000.0 * amp / (gamma * math.pi)) * (
            F.lit(gamma**2) / (dy * dy + F.lit(gamma**2)) - F.lit(1.0)
        )
        corr_x = F.lit(100000.0 * amp2 / (gamma2 * math.pi)) * (
            F.lit(gamma2**2) / (dx * dx + F.lit(gamma2**2)) - F.lit(1.0)
        )
        return corr_y + corr_x
    raise NotImplementedError(f"correction type {correction_type!r}")


def append_energy_axis(
    df: DataFrame,
    tof_column: str = "t",
    energy_column: str = "energy",
    calibration_type: str = "poly",
    **params,
) -> DataFrame:
    """Append the calibrated energy column, dispatching fit vs poly
    calibration (reference src/sed/calibrator/energy.py:797-943)."""
    t = F.col(tof_column)
    if calibration_type in ("poly", "tof2evpoly"):
        expr = tof2evpoly_expr(t, params["coeffs"], params.get("E0", 0.0))
    elif calibration_type in ("fit", "tof2ev"):
        expr = tof2ev_expr(
            t,
            tof_distance=params["d"],
            time_offset=params["t0"],
            binwidth=params.get("binwidth", 4.125e-12),
            binning=params.get("binning", 1),
            energy_scale=params.get("energy_scale", "kinetic"),
            energy_offset=params.get("E0", 0.0),
        )
    else:
        raise ValueError(f"unknown calibration type {calibration_type!r}")
    return df.withColumn(energy_column, expr)


def apply_energy_correction(
    df: DataFrame,
    tof_column: str = "t",
    new_tof_column: str | None = None,
    correction_type: str = "spherical",
    center: tuple[float, float] = (0.0, 0.0),
    amplitude: float = 1.0,
    x_column: str = "X",
    y_column: str = "Y",
    **kwds,
) -> DataFrame:
    """``tm = t + correction_function(x, y)``
    (reference src/sed/calibrator/energy.py:1373-1469)."""
    corr = correction_expr(
        F.col(x_column), F.col(y_column), correction_type, center, amplitude, **kwds,
    )
    out_col = new_tof_column or tof_column
    return df.withColumn(out_col, F.col(tof_column).cast("double") + corr)


def align_dld_sectors(
    df: DataFrame,
    sector_delays: Sequence[float],
    tof_column: str = "dldTimeSteps",
    sector_id_column: str = "dldSectorID",
) -> DataFrame:
    """Subtract per-sector delay: ``t -= sector_delays[sector_id]``, float32
    (reference src/sed/calibrator/energy.py:1489-1535).

    The 8-row lookup is a literal-array ``element_at`` — no join, no UDF,
    broadcast-free (the array rides inside the expression).
    """
    arr = F.array(*[F.lit(float(d)) for d in sector_delays])
    delay = F.element_at(arr, F.col(sector_id_column).cast("int") + 1)
    return df.withColumn(
        tof_column,
        (F.col(tof_column).cast("double") - delay).cast("float"),
    )


def add_offsets(
    df: DataFrame,
    energy_column: str = "energy",
    constant: float | None = None,
    columns: str | Sequence[str] | None = None,
    weights: float | Sequence[float] | None = None,
    reductions: str | Sequence[str] | None = None,
    preserve_mean: bool | Sequence[bool] = False,
    energy_scale: str = "kinetic",
) -> DataFrame:
    """Signed constant + weighted column offsets on the energy axis
    (reference src/sed/calibrator/energy.py:1537-1706). For
    ``energy_scale='binding'`` the signs flip (energy.py:1601-1605)."""
    scale_sign = -1.0 if energy_scale == "binding" else 1.0
    out = df
    if columns is not None:
        if isinstance(columns, str):
            columns = [columns]
        if weights is None:
            weights = [1.0] * len(columns)
        if isinstance(weights, (int, float)):
            weights = [float(weights)] * len(columns)
        weights = [scale_sign * w for w in weights]
        out = dfops.offset_by_other_columns(
            out,
            target_column=energy_column,
            offset_columns=columns,
            weights=weights,
            reductions=reductions,
            preserve_mean=preserve_mean,
        )
    if constant is not None:
        out = out.withColumn(
            energy_column,
            F.col(energy_column) + F.lit(scale_sign * float(constant)),
        )
    return out
