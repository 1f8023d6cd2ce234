"""Calibrator expressions vs numpy oracles
(model: reference tests/calibrator/test_energy.py, test_delay.py,
test_momentum.py — formula-level assertions on appended columns)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from sed_spark.calibrator import delay as delay_cal
from sed_spark.calibrator import energy as energy_cal
from sed_spark.calibrator import momentum as momentum_cal


def _tof_df(spark, n=200):
    rng = np.random.default_rng(5)
    return (
        pd.DataFrame(
            {
                "t": rng.uniform(60_000, 120_000, n),
                "X": rng.uniform(0, 2048, n),
                "Y": rng.uniform(0, 2048, n),
                "ADC": rng.uniform(2_000, 20_000, n),
            },
        ),
        spark,
    )


def test_tof2ev(spark):
    pdf, spark = _tof_df(spark)
    df = spark.createDataFrame(pdf)
    d, t0, E0, bw, binning = 1.0, 1e-6, 10.0, 4.125e-12, 2
    out = energy_cal.append_energy_axis(
        df, calibration_type="fit", d=d, t0=t0, E0=E0, binwidth=bw, binning=binning,
        energy_scale="kinetic",
    ).toPandas()
    expected = 2.84281e-12 * (d / (pdf["t"] * bw * binning - t0)) ** 2 + E0
    np.testing.assert_allclose(out["energy"], expected, rtol=1e-12)


def test_tof2ev_binding_flips_sign(spark):
    pdf, spark = _tof_df(spark, 50)
    df = spark.createDataFrame(pdf)
    kin = energy_cal.append_energy_axis(
        df, calibration_type="fit", d=1.0, t0=0.0, E0=0.0, energy_scale="kinetic",
    ).toPandas()["energy"]
    bind = energy_cal.append_energy_axis(
        df, calibration_type="fit", d=1.0, t0=0.0, E0=0.0, energy_scale="binding",
    ).toPandas()["energy"]
    np.testing.assert_allclose(bind, -kin, rtol=1e-12)


def test_tof2evpoly(spark):
    pdf, spark = _tof_df(spark)
    df = spark.createDataFrame(pdf)
    # poly_a highest-order-first, no constant (reference energy.py:2420-2445)
    poly = [1e-14, -2e-9, 3e-4]
    out = energy_cal.append_energy_axis(
        df, calibration_type="poly", coeffs=poly, E0=5.0,
    ).toPandas()
    t = pdf["t"].to_numpy()
    expected = poly[2] * t + poly[1] * t**2 + poly[0] * t**3 + 5.0
    np.testing.assert_allclose(out["energy"], expected, rtol=1e-10)


def test_tof2ns(spark):
    pdf, spark = _tof_df(spark, 10)
    df = spark.createDataFrame(pdf)
    out = df.withColumn(
        "t_ns", energy_cal.tof2ns_expr(F.col("t"), 4.125e-12, 2),
    ).toPandas()
    np.testing.assert_allclose(out["t_ns"], pdf["t"] * 1e9 * 4.125e-12 * 2, rtol=1e-12)


def test_energy_corrections_match_reference_formulas(spark):
    pdf, spark = _tof_df(spark)
    df = spark.createDataFrame(pdf)
    x, y = pdf["X"].to_numpy(), pdf["Y"].to_numpy()
    r2 = (x - 1024.0) ** 2 + (y - 1024.0) ** 2

    out = energy_cal.apply_energy_correction(
        df, correction_type="spherical", center=(1024.0, 1024.0), amplitude=2.0,
        diameter=3000.0, new_tof_column="tm",
    ).toPandas()
    corr = -((1 - np.sqrt(1 - r2 / 3000.0**2)) * 100 * 2.0)
    np.testing.assert_allclose(out["tm"], pdf["t"] + corr, rtol=1e-9)

    out = energy_cal.apply_energy_correction(
        df, correction_type="Lorentzian", center=(1024.0, 1024.0), amplitude=2.0,
        gamma=700.0, new_tof_column="tm",
    ).toPandas()
    corr = 100000 * 2.0 / (700.0 * np.pi) * (700.0**2 / (r2 + 700.0**2) - 1)
    np.testing.assert_allclose(out["tm"], pdf["t"] + corr, rtol=1e-9)

    out = energy_cal.apply_energy_correction(
        df, correction_type="Gaussian", center=(1024.0, 1024.0), amplitude=2.0,
        sigma=700.0, new_tof_column="tm",
    ).toPandas()
    corr = (
        20000 * 2.0 / np.sqrt(2 * np.pi * 700.0**2) * (np.exp(-r2 / (2 * 700.0**2)) - 1)
    )
    np.testing.assert_allclose(out["tm"], pdf["t"] + corr, rtol=1e-9)


def test_align_dld_sectors(spark):
    pdf = pd.DataFrame(
        {"dldTimeSteps": [100.0, 200.0, 300.0], "dldSectorID": [0, 3, 7]},
    )
    df = spark.createDataFrame(pdf)
    delays = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]
    out = energy_cal.align_dld_sectors(df, delays).toPandas()
    np.testing.assert_allclose(out["dldTimeSteps"], [100.0, 197.0, 293.0])


def test_delay_axis_and_offsets(spark):
    pdf, spark = _tof_df(spark)
    df = spark.createDataFrame(pdf)
    out = delay_cal.append_delay_axis(
        df, adc_range=(2_000.0, 20_000.0), delay_range=(-5.0, 5.0),
    ).toPandas()
    expected = -5.0 + (pdf["ADC"] - 2_000.0) * 10.0 / 18_000.0
    np.testing.assert_allclose(out["delay"], expected, rtol=1e-12)

    # via stage positions in mm
    out2 = delay_cal.append_delay_axis(
        df, adc_range=(2_000.0, 20_000.0), delay_range_mm=(10.0, 11.5), time0=10.75,
    ).toPandas()
    rng = delay_cal.mm_to_ps(np.array([10.0, 11.5]), 10.75)
    expected2 = rng[0] + (pdf["ADC"] - 2_000.0) * (rng[1] - rng[0]) / 18_000.0
    np.testing.assert_allclose(out2["delay"], expected2, rtol=1e-12)

    df_d = delay_cal.append_delay_axis(
        df, adc_range=(2_000.0, 20_000.0), delay_range=(-5.0, 5.0),
    )
    out3 = delay_cal.add_offsets(df_d, constant=1.5, flip_delay_axis=True).toPandas()
    np.testing.assert_allclose(out3["delay"], -(expected + 1.5), rtol=1e-12)


def test_momentum_affine(spark):
    pdf, spark = _tof_df(spark)
    df = spark.createDataFrame(pdf)
    params = dict(
        r_start=0.0, c_start=0.0, r_center=256.0, c_center=256.0,
        r_conversion=0.0195, c_conversion=0.0195, r_step=2.0, c_step=2.0,
    )
    out = momentum_cal.append_k_axis(df, **params).toPandas()
    kx = 0.0195 * ((pdf["X"] - (0.0 + 2.0 * 256.0)) / 2.0)
    ky = 0.0195 * ((pdf["Y"] - (0.0 + 2.0 * 256.0)) / 2.0)
    np.testing.assert_allclose(out["kx"], kx, rtol=1e-12)
    np.testing.assert_allclose(out["ky"], ky, rtol=1e-12)


def test_apply_dfield_identity_and_shift(spark):
    # identity deformation field under the span/h node convention: grid
    # node i sits at detector coordinate lo + i*span/h
    h = w = 65
    xs = np.arange(h) * (2048.0 / h)
    ys = np.arange(w) * (2048.0 / w)
    fx = np.tile(xs[:, None], (1, w))
    fy = np.tile(ys[None, :], (h, 1))
    dfield = np.stack([fx + 10.0, fy - 20.0])  # constant shift
    rng = np.random.default_rng(9)
    # stay below node h-1 (detector 2048*(h-1)/h): beyond it the constant-0
    # padding decays the sample, same as the reference's cval=0 edge
    hi = 2048.0 * (h - 1) / h
    pdf = pd.DataFrame(
        {"X": rng.uniform(0, hi, 500), "Y": rng.uniform(0, hi, 500)},
    )
    df = spark.createDataFrame(pdf)
    out = (
        momentum_cal.apply_dfield(df, dfield, detector_ranges=((0, 2048), (0, 2048)))
        .toPandas()
    )
    # bilinear interpolation of a linear field is exact
    np.testing.assert_allclose(out["Xm"], pdf["X"] + 10.0, rtol=1e-9)
    np.testing.assert_allclose(out["Ym"], pdf["Y"] - 20.0, rtol=1e-9)


def test_apply_dfield_join_matches_udf_and_numpy(spark):
    from sed_spark.calibrator.momentum import bilinear_sample

    h, w = 33, 47
    rng = np.random.default_rng(4)
    fx = rng.uniform(0, 2048, (h, w))
    fy = rng.uniform(0, 2048, (h, w))
    dfield = np.stack([fx, fy])
    # include out-of-range and exactly-on-edge points
    pdf = pd.DataFrame(
        {
            "X": np.concatenate(
                [rng.uniform(-100, 2200, 400),
                 [0.0, 2048.0, -1e-9, 2048.0 + 1e-9, np.nan, np.inf, 1.0, 1e300]],
            ),
            "Y": np.concatenate(
                [rng.uniform(-100, 2200, 400),
                 [2048.0, 0.0, -5.0, 2060.0, 1.0, 1.0, np.nan, -1e300]],
            ),
        },
    )
    pdf["id"] = np.arange(len(pdf))
    df = spark.createDataFrame(pdf)
    ranges = ((0.0, 2048.0), (0.0, 2048.0))
    out_join = (
        momentum_cal.apply_dfield(df, dfield, detector_ranges=ranges, method="join")
        .orderBy("id").toPandas()
    )
    out_udf = (
        momentum_cal.apply_dfield(df, dfield, detector_ranges=ranges, method="udf")
        .orderBy("id").toPandas()
    )
    rows = (pdf["X"].to_numpy() - 0.0) * (h / 2048.0)
    cols = (pdf["Y"].to_numpy() - 0.0) * (w / 2048.0)
    want_x = bilinear_sample(fx, rows, cols)
    want_y = bilinear_sample(fy, rows, cols)
    for out in (out_join, out_udf):
        np.testing.assert_allclose(out["Xm"], want_x, rtol=0, atol=1e-9)
        np.testing.assert_allclose(out["Ym"], want_y, rtol=0, atol=1e-9)
    # the two physical strategies agree bit-for-bit
    np.testing.assert_array_equal(out_join["Xm"].to_numpy(), out_udf["Xm"].to_numpy())
    np.testing.assert_array_equal(out_join["Ym"].to_numpy(), out_udf["Ym"].to_numpy())


def test_energy_add_offsets(spark):
    pdf = pd.DataFrame({"energy": [1.0, 2.0, 3.0], "bam": [0.1, 0.2, 0.3]})
    df = spark.createDataFrame(pdf)
    out = energy_cal.add_offsets(
        df, constant=1.0, columns="bam", weights=1.0, preserve_mean=True,
    ).toPandas()
    expected = pdf["energy"] + (pdf["bam"] - 0.2) + 1.0
    np.testing.assert_allclose(out["energy"], expected, rtol=1e-12)
    # binding scale flips signs
    out2 = energy_cal.add_offsets(
        df, constant=1.0, columns="bam", weights=1.0, energy_scale="binding",
    ).toPandas()
    np.testing.assert_allclose(out2["energy"], pdf["energy"] - pdf["bam"] - 1.0, rtol=1e-12)
