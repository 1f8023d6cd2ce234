"""Headless estimation/calibration workflow on the SedProcessor facade."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import yaml

from sed_spark.calibrator.estimation import _tof2ev
from sed_spark.processor import SedProcessor

from tests.test_estimation import BINNING, BINWIDTH, synth_landmarks


def test_energy_calibration_workflow(spark):
    """load_bias_series -> find_bias_peaks -> calibrate_energy_axis on the
    facade recovers the forward TOF-energy model."""
    rng = np.random.default_rng(11)
    d_true, t0_true, e0 = 1.1, 1.5e-7, -50.0
    biases = np.arange(10.0, 20.0)
    pos, _ = synth_landmarks(d=d_true, t0=t0_true, e0=e0, biases=biases)
    frames = [
        pd.DataFrame({"file_id": fid, "t": rng.normal(p, 80.0, 30_000)})
        for fid, p in enumerate(pos)
    ]
    proc = SedProcessor(spark=spark, config={"core": {"loader": "generic"}})
    proc.load(dataframe=spark.createDataFrame(pd.concat(frames)))

    lo, hi = float(pos.min() - 2000), float(pos.max() + 2000)
    proc.load_bias_series(
        biases=biases, tof_column="t", bins=2000, tof_range=(lo, hi),
    )
    traces = proc._bias_series["traces"]
    assert traces.shape == (len(biases), 2000)
    peaks = proc.find_bias_peaks(
        ranges=(float(pos[0] - 400), float(pos[0] + 400)),
        ref_id=0, pkwindow=10,
    )
    assert peaks.shape == (len(biases), 2)
    cal = proc.calibrate_energy_axis(
        ref_energy=-0.5, method="lmfit",
        binwidth=BINWIDTH, binning=BINNING,
    )
    assert proc._calibrations["energy_calibration"] is cal
    np.testing.assert_allclose(cal["d"], d_true, rtol=5e-2)
    binw = proc._bias_series["tof"][1] - proc._bias_series["tof"][0]
    pred = _tof2ev(cal["d"], cal["t0"], BINWIDTH, BINNING, "kinetic",
                   cal["E0"], pos[0])
    np.testing.assert_allclose(pred, -0.5 - biases[0], atol=3 * binw)


def test_momentum_workflow_and_persistence(spark, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "X": rng.uniform(0, 255, 4000),
            "Y": rng.uniform(0, 255, 4000),
            "ADC": rng.uniform(2000, 20000, 4000),
            "file_id": 0,
        },
    )
    proc = SedProcessor(spark=spark, config={"core": {"loader": "generic"}})
    proc.load(dataframe=spark.createDataFrame(pdf))

    # feature ring (slightly perturbed hexagon) + center
    ctr = np.array([128.0, 128.0])
    ang = np.linspace(0, 2 * np.pi, 6, endpoint=False)
    ring = ctr + 60 * np.column_stack([np.cos(ang), np.sin(ang)])
    ring += rng.normal(0, 1.0, ring.shape)
    feats = np.vstack([ring, ctr])
    proc.define_features(feats, rotation_symmetry=6, include_center=True)
    proc.generate_splinewarp(shape=(64, 64))
    assert proc._deform_fields[0].shape == (64, 64)
    proc.pose_adjustment(scale=1.05, xtrans=1.0, ytrans=-1.0, angle=2.0)

    proc.apply_momentum_correction_from_fields(
        detector_ranges=((0.0, 255.0), (0.0, 255.0)),
        new_x_column="Xm", new_y_column="Ym",
    )
    assert "Xm" in proc.dataframe.columns

    cal = proc.calibrate_momentum_axes(
        point_a=[188.0, 128.0], point_b=[128.0, 128.0],
        k_distance=1.2, apply=True,
    )
    assert cal["r_conversion"] == pytest.approx(1.2 / 60.0)
    assert "kx" in proc.dataframe.columns

    # persistence: every recorded calibration lands in the folder config
    proc.calibrate_delay_axis(
        adc_range=(2000.0, 20000.0), delay_range=(-5.0, 5.0),
    )
    proc.save_workflow_params()
    saved = yaml.safe_load(open("sed_config.yaml"))
    assert saved["momentum"]["calibration"]["r_conversion"] == pytest.approx(0.02)
    assert saved["momentum"]["transformations"]["scale"] == 1.05
    assert "correction" in saved["momentum"]
    assert saved["delay"]["calibration"]["adc_range"] == [2000.0, 20000.0]

    # and a fresh processor picks the config up
    proc2 = SedProcessor(spark=spark, config="sed_config.yaml")
    assert proc2.config["momentum"]["calibration"]["r_center"] == 128.0


def test_view_event_histogram_headless(spark):
    pdf = pd.DataFrame(
        {"t": np.linspace(0, 999, 1000), "file_id": [0] * 500 + [1] * 500},
    )
    proc = SedProcessor(spark=spark, config={"core": {"loader": "generic"}})
    proc.load(dataframe=spark.createDataFrame(pdf))
    hists = proc.view_event_histogram(
        dfpid=0, axes=["t"], bins=[10], ranges=[(0.0, 1000.0)],
    )
    assert set(hists) == {"t"}
    assert hists["t"].data.sum() == 500
