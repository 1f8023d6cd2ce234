"""Calibration parameter estimation vs synthetic ground truth
(reference tests/calibrator/test_energy.py drives the same fits on CSV
fixtures; here the fixtures are generated from the forward model)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sed_spark.calibrator.estimation import (
    _tof2ev,
    _tof2evpoly,
    bin_traces,
    find_correspondence,
    fit_energy_calibration,
    normspec,
    peakdetect1d,
    peaksearch,
    poly_energy_calibration,
    savgol_coeffs,
)

BINWIDTH = 4.125e-12
BINNING = 2


def synth_landmarks(d=1.2, t0=2e-7, e0=-50.0, biases=None):
    """Invert the tof2ev model: peak TOF positions for a bias series whose
    feature sits at kinetic energy (ref - bias)."""
    biases = np.asarray(biases if biases is not None else np.arange(10, 20.0))
    from sed_spark.calibrator.energy import _TOF2EV_CONST

    ek = -e0 - biases  # feature kinetic energy per trace (arbitrary model)
    tof_s = d * np.sqrt(_TOF2EV_CONST / ek) + t0
    return tof_s / (BINWIDTH * BINNING), -biases


def test_peakdetect1d_finds_gaussians():
    x = np.linspace(0, 100, 2000)
    y = (np.exp(-((x - 30) ** 2) / 4) + 0.8 * np.exp(-((x - 70) ** 2) / 4))
    maxs, _ = peakdetect1d(y, x, lookahead=50, delta=0.1)
    assert len(maxs) == 2
    np.testing.assert_allclose(maxs[:, 0], [30, 70], atol=0.2)


def test_peaksearch_windows():
    x = np.linspace(0, 100, 2000)
    y = np.exp(-((x - 30) ** 2) / 4) + 0.8 * np.exp(-((x - 70) ** 2) / 4)
    peaks = peaksearch(np.vstack([y, y]), x, [(20, 40), (60, 80)])
    np.testing.assert_allclose(peaks[:, 0], [30, 70], atol=0.2)


def test_normspec_range_and_smooth():
    traces = np.vstack([np.linspace(0, 5, 100), np.linspace(3, 4, 100)])
    normed = normspec(traces, smooth=True, span=7, order=2)
    assert normed.shape == traces.shape
    np.testing.assert_allclose(normed.min(axis=1), 0, atol=1e-9)
    np.testing.assert_allclose(normed.max(axis=1), 1, atol=1e-9)


def test_savgol_preserves_polynomial():
    # an order-2 kernel reproduces quadratics exactly
    k = savgol_coeffs(9, 2)
    x = np.arange(-4.0, 5.0)
    quad = 3 + 2 * x + 0.5 * x**2
    np.testing.assert_allclose(quad @ k[::-1], 3.0, atol=1e-10)


def test_find_correspondence_identity_and_shift():
    a = np.sin(np.linspace(0, 6, 80))
    path = find_correspondence(a, a)
    np.testing.assert_array_equal(path[:, 0], path[:, 1])


def test_poly_energy_calibration_recovers_differential_structure():
    pos, vals = synth_landmarks()
    t = np.linspace(pos.min() - 200, pos.max() + 200, 500)
    cal = poly_energy_calibration(pos, vals, ref_energy=-18.0, order=3, t=t)
    # the solved system is T·a = b: poly(pos0) - poly(pos_k) = vals0 - vals_k
    poly = _tof2evpoly(cal["coeffs"], 0.0, pos)
    np.testing.assert_allclose(poly[0] - poly[1:], vals[0] - vals[1:], atol=5e-3)
    # kinetic scale: energy decreases with increasing TOF
    assert "axis" in cal and cal["axis"].shape == t.shape
    assert np.all(np.diff(cal["axis"]) < 0)


def test_fit_energy_calibration_recovers_parameters():
    d_true, t0_true = 1.2, 2e-7
    pos, vals = synth_landmarks(d=d_true, t0=t0_true)
    cal = fit_energy_calibration(pos, vals, BINWIDTH, BINNING, ref_energy=-18.0)
    pred = _tof2ev(cal["d"], cal["t0"], BINWIDTH, BINNING, "kinetic",
                   cal["E0"], pos)
    # differential bias structure reproduced and the reference-trace landmark
    # anchored at ref_energy + bias (the reference's E0 convention)
    np.testing.assert_allclose(pred - pred[0], vals - vals[0], atol=1e-6)
    np.testing.assert_allclose(pred[0], -18.0 + vals[0], atol=1e-6)
    np.testing.assert_allclose(cal["d"], d_true, rtol=1e-3)


def test_calibrate_from_traces_end_to_end():
    from sed_spark.calibrator.estimation import calibrate_from_traces

    d_true, t0_true, e0 = 1.1, 1.5e-7, -50.0
    biases = np.arange(10.0, 20.0)
    pos, _ = synth_landmarks(d=d_true, t0=t0_true, e0=e0, biases=biases)
    # synthetic gaussian traces peaked at the model landmark positions
    tof = np.linspace(pos.min() - 2000, pos.max() + 2000, 3000)
    traces = np.vstack([
        np.exp(-((tof - p) ** 2) / (2 * 80.0**2)) for p in pos
    ])
    width = tof[1] - tof[0]
    cal = calibrate_from_traces(
        traces, tof, biases,
        ref_range=(pos[0] - 400, pos[0] + 400), ref_energy=-0.5,
        method="lmfit", binwidth=BINWIDTH, binning=BINNING,
        pkwindow=10,
    )
    assert np.all(np.diff(cal["axis"]) < 0)  # kinetic scale
    np.testing.assert_allclose(cal["d"], d_true, rtol=5e-2)
    # landmark of the reference trace lands at ref_energy + vals[0]
    pred = _tof2ev(cal["d"], cal["t0"], BINWIDTH, BINNING, "kinetic",
                   cal["E0"], pos[0])
    np.testing.assert_allclose(pred, -0.5 - biases[0], atol=width * 0.01)


def test_bin_traces_per_file(spark):
    import pandas as pd

    rng = np.random.default_rng(5)
    frames = []
    for fid, center in enumerate([30.0, 50.0]):
        frames.append(pd.DataFrame({
            "file_id": fid,
            "t": rng.normal(center, 2.0, 4000),
        }))
    df = spark.createDataFrame(pd.concat(frames))
    traces, tof, file_ids = bin_traces(df, tof_column="t", bins=100,
                                       tof_range=(0.0, 100.0))
    assert traces.shape == (2, 100)
    assert file_ids == [0, 1]
    np.testing.assert_allclose(tof[np.argmax(traces[0])], 30.0, atol=1.5)
    np.testing.assert_allclose(tof[np.argmax(traces[1])], 50.0, atol=1.5)
