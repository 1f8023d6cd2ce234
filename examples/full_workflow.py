#!/usr/bin/env python
"""End-to-end sed_spark workflow on the sf0.001 testdata.

Run: PYTHONPATH=/root/repo python examples/full_workflow.py

Demonstrates the full reference-style session: load events → jitter →
momentum distortion correction (deformation field) → momentum calibration
→ energy correction + calibration → delay calibration → 2-D histogram →
acquisition-independent export (npz + TIFF), plus the calibration
persistence round-trip.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
from pyspark.sql import functions as F

from sed_spark.processor import SedProcessor

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    proc = SedProcessor(config={"core": {"loader": "generic"}})

    # shape the generic events table into detector-style columns
    raw = proc.spark.read.parquet(f"{SF_DIR}/events.parquet")
    events = raw.select(
        "event_id",
        (F.col("value") * 1000.0 + 60000.0).alias("t"),
        ((F.col("user_id") % 150).cast("double") * 13.0).alias("X"),
        ((F.col("event_id") % 2048).cast("double")).alias("Y"),
        (F.col("value") * 36.0 + 2000.0).alias("ADC"),
        (F.col("event_id") % 4).alias("file_id"),
    )
    proc.load(dataframe=events)
    proc.add_jitter(["X", "Y", "t", "ADC"], seed=42)

    # momentum distortion: feature ring -> TPS spline warp -> pose tweak
    ctr = np.array([1024.0, 1024.0])
    ang = np.linspace(0, 2 * np.pi, 6, endpoint=False)
    ring = ctr + 400 * np.column_stack([np.cos(ang), np.sin(ang)])
    proc.define_features(np.vstack([ring, ctr]), rotation_symmetry=6)
    proc.generate_splinewarp(shape=(128, 128))
    proc.pose_adjustment(scale=1.02, xtrans=2.0, ytrans=-3.0, angle=1.0)
    proc.apply_momentum_correction_from_fields(
        detector_ranges=((0.0, 2048.0), (0.0, 2048.0)),
        new_x_column="Xm", new_y_column="Ym",
    )

    # momentum calibration from two symmetry points
    proc.calibrate_momentum_axes(
        point_a=[1424.0, 1024.0], point_b=[1024.0, 1024.0],
        k_distance=1.2, apply=False,
    )
    cal = proc._calibrations["momentum_calibration"]
    proc.apply_momentum_calibration(
        x_column="Xm", y_column="Ym", **cal,
    )

    # energy correction + calibration, delay axis
    proc.apply_energy_correction(
        correction_type="spherical", center=(1024.0, 1024.0),
        amplitude=2.0, diameter=3000.0,
    )
    proc.append_energy_axis(
        calibration_type="poly", coeffs=[1e-14, -2e-9, 3e-4], E0=1.0,
    )
    proc.calibrate_delay_axis(
        adc_range=(2000.0, 20000.0), delay_range=(-5.0, 5.0),
    )

    # the aggregation query: 2-D (energy, delay) histogram
    res = proc.compute(
        bins=[60, 40], axes=["energy", "delay"],
        ranges=[(-500.0, 2000.0), (-5.0, 5.0)],
    )
    assert res.data.shape == (60, 40) and res.data.sum() > 0
    print(f"histogram: shape={res.data.shape} counts={int(res.data.sum())}")

    with tempfile.TemporaryDirectory() as d:
        proc.save(res, f"{d}/result.npz")
        proc.save(res, f"{d}/result.tiff")
        os.chdir(d)
        proc.save_workflow_params()
        print("exports:", sorted(os.listdir(d)))

    # round-5 additions on the calibrated event table:
    # equi-depth energy bins (balanced counts on the skewed axis) and a
    # Z-order-clustered copy (detector-region queries prune files on
    # BOTH X and Y footer stats)
    from sed_spark.binning import axis_from_edges, equidepth_edges
    from sed_spark.binning import sparse_histogram
    from sed_spark.loader.bucketing import write_zordered

    edges = equidepth_edges(proc.dataframe, "energy", 8, exact=True)
    agg, _, names = sparse_histogram(
        proc.dataframe, bins=[axis_from_edges("energy", edges)],
    )
    eqd = {r[names[0]]: r["count"] for r in agg.collect()}
    print(f"equi-depth energy bins (counts): {sorted(eqd.values())}")
    with tempfile.TemporaryDirectory() as zd:
        write_zordered(
            proc.dataframe.select("X", "Y", "energy"),
            f"{zd}/events_z", ["X", "Y"], n_files=8,
        )
        n_z = proc.spark.read.parquet(f"{zd}/events_z").count()
        print(f"z-ordered copy holds {n_z} rows in 8 XY-local files")

    print("workflow OK")


if __name__ == "__main__":
    main()
