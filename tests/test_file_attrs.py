"""Per-file attribute broadcast (reference loader/mpes/loader.py:155-169
``add_value``) and the bias-series calibration workflow wired through it
(reference calibrator/energy.py:1709-1729 ``extract_bias`` +
energy.py:501-599 ``calibrate``)."""

import numpy as np
import pandas as pd
import pytest

from sed_spark.calibrator.estimation import _tof2ev, bin_traces, calibrate_from_traces
from sed_spark.loader.mpes import attach_file_attrs, extract_bias_from_attrs

from tests.test_estimation import BINNING, BINWIDTH, synth_landmarks


def _base_df(spark):
    from pyspark.sql import functions as F

    return spark.range(0, 100).withColumn("file_id", F.col("id") % 3)


def test_attach_file_attrs_from_dict(spark):
    df = _base_df(spark)
    out = attach_file_attrs(
        df, {0: {"bias": 10.0}, 1: {"bias": 10.5}, 2: {"bias": 11.0}},
    ).toPandas()
    assert len(out) == 100
    np.testing.assert_allclose(
        out["bias"], 10.0 + 0.5 * (out["id"] % 3).to_numpy(),
    )


def test_attach_file_attrs_missing_file_gives_null(spark):
    df = _base_df(spark)
    out = attach_file_attrs(df, {0: {"bias": 1.0}, 1: {"bias": 2.0}}).toPandas()
    assert out[out.file_id == 2]["bias"].isna().all()
    assert out[out.file_id < 2]["bias"].notna().all()


def test_attach_file_attrs_from_spark_df(spark):
    df = _base_df(spark)
    dim = spark.createDataFrame(
        pd.DataFrame({"file_id": [0, 1, 2], "gain": [1.0, 2.0, 3.0]}),
    )
    out = attach_file_attrs(df, dim).toPandas()
    np.testing.assert_allclose(out["gain"], (out["id"] % 3).to_numpy() + 1.0)


def test_attach_file_attrs_plan_is_broadcast(spark):
    df = _base_df(spark)
    out = attach_file_attrs(df, {0: {"bias": 1.0}})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_extract_bias_from_attrs_rounds_and_strips_at():
    attrs = {
        1: {"KTOF:Lens:Sample:V": 16.9999999},
        0: {"KTOF:Lens:Sample:V": 10.004},
        2: {"KTOF:Lens:Sample:V": 12.345},
    }
    got = extract_bias_from_attrs(attrs, "@KTOF:Lens:Sample:V")
    # sorted by file id, rounded to 2 decimals (reference energy.py:1723)
    np.testing.assert_allclose(got, [10.0, 17.0, 12.35])
    got2 = extract_bias_from_attrs(attrs, "KTOF:Lens:Sample:V")
    np.testing.assert_allclose(got, got2)


def test_bias_series_calibration_through_file_attrs(spark):
    """End-to-end: events with file_id -> bin_traces -> biases from the
    file-attr table -> calibrate_from_traces recovers the forward model."""
    rng = np.random.default_rng(11)
    d_true, t0_true, e0 = 1.1, 1.5e-7, -50.0
    biases = np.arange(10.0, 20.0)
    pos, _ = synth_landmarks(d=d_true, t0=t0_true, e0=e0, biases=biases)
    frames = []
    attrs = {}
    for fid, (p, b) in enumerate(zip(pos, biases)):
        frames.append(
            pd.DataFrame(
                {"file_id": fid, "t": rng.normal(p, 80.0, 30_000)},
            ),
        )
        attrs[fid] = {"sampleBias": float(b) + 0.0012}  # rounds to b
    df = spark.createDataFrame(pd.concat(frames))

    lo, hi = pos.min() - 2000, pos.max() + 2000
    traces, tof, file_ids = bin_traces(
        df, tof_column="t", bins=2000, tof_range=(float(lo), float(hi)),
    )
    got_biases = extract_bias_from_attrs(attrs, "@sampleBias")
    np.testing.assert_allclose(got_biases, biases)

    cal = calibrate_from_traces(
        traces, tof, got_biases,
        ref_range=(pos[0] - 400, pos[0] + 400), ref_energy=-0.5,
        method="lmfit", binwidth=BINWIDTH, binning=BINNING, pkwindow=10,
    )
    np.testing.assert_allclose(cal["d"], d_true, rtol=5e-2)
    pred = _tof2ev(cal["d"], cal["t0"], BINWIDTH, BINNING, "kinetic",
                   cal["E0"], pos[0])
    # binned traces: landmark recovered to within a couple of bins
    binw = tof[1] - tof[0]
    np.testing.assert_allclose(pred, -0.5 - biases[0], atol=3 * binw)
