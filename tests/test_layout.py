"""Z-order layout: Morton value correctness, writer locality, guards."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from sed_spark import layout


def _py_zvalue(vals, ranges, bits):
    """Pure-Python Morton reference."""
    k = len(vals)
    z = 0
    for j, (v, (lo, hi)) in enumerate(zip(vals, ranges)):
        n = 1 << bits
        if v is None:
            b = 0
        else:
            b = min(max(int(math.floor((float(v) - lo) / ((hi - lo) / n))), 0), n - 1)
        for bit in range(bits):
            z |= ((b >> bit) & 1) << (bit * k + j)
    return z


def test_zorder_value_matches_python_reference(spark):
    rows = [
        (0.0, 0.0), (1023.9, 511.9), (512.0, 256.0), (-5.0, 600.0),
        (17.3, 33.9), (None, 100.0), (999.99, None), (1024.0, 512.0),
    ]
    ranges = [(0.0, 1024.0), (0.0, 512.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = [
        r["__zval"]
        for r in layout.zorder_value(df, ["x", "y"], ranges, bits_per_dim=10)
        .collect()
    ]
    want = [_py_zvalue(r, ranges, 10) for r in rows]
    assert got == want


def test_zorder_bin_clamps_and_guards(spark):
    df = spark.createDataFrame([(-1.0,), (0.0,), (7.999,), (8.0,), (99.0,)], ["x"])
    got = [
        r["b"]
        for r in df.select(
            layout.zorder_bin(F.col("x"), 0.0, 8.0, 3).alias("b"),
        ).collect()
    ]
    assert got == [0, 0, 7, 7, 7]
    with pytest.raises(ValueError, match="hi > lo"):
        layout.zorder_bin(F.col("x"), 1.0, 1.0, 3)
    with pytest.raises(ValueError, match="bits"):
        layout.zorder_bin(F.col("x"), 0.0, 1.0, 0)
    with pytest.raises(ValueError, match="62"):
        layout.zorder_value(
            spark.range(1).select(F.col("id").cast("double").alias("x")),
            ["x", "x", "x", "x"], [(0.0, 1.0)] * 4, bits_per_dim=16,
        )


def test_zorder_write_improves_two_dim_locality(spark, tmp_path):
    # uniform 2-d data: a z-ordered layout's per-file bounding boxes must
    # be dramatically tighter than an arbitrary (id-ordered) layout's on
    # BOTH dims — that tightness IS the row-group pruning win
    n, files = 20_000, 16
    df = spark.range(n).select(
        (F.rand(1) * 1000.0).alias("x"), (F.rand(2) * 1000.0).alias("y"),
    )
    zpath = os.path.join(str(tmp_path), "z")
    npath = os.path.join(str(tmp_path), "naive")
    layout.zorder_write(
        df, zpath, ["x", "y"], [(0.0, 1000.0), (0.0, 1000.0)],
        n_files=files, bits_per_dim=10,
    )
    df.repartition(files).write.parquet(npath)

    def mean_area(path):
        rows = layout.file_range_stats(spark, path, ["x", "y"]).collect()
        assert len(rows) >= files // 2
        return sum(
            (r["x_max"] - r["x_min"]) * (r["y_max"] - r["y_min"]) for r in rows
        ) / len(rows)

    z_area, naive_area = mean_area(zpath), mean_area(npath)
    # naive files each span ~the whole 1000x1000 domain; 16 z-files split
    # the curve into 16 contiguous chunks (~4x4 grid -> ~1/16 the area,
    # plus curve-boundary slack). 4x is a conservative floor.
    assert z_area * 4 < naive_area, (z_area, naive_area)


def test_zorder_write_round_trips_all_rows(spark, tmp_path):
    df = spark.range(5000).select(
        F.col("id"),
        (F.col("id") % 97).cast("double").alias("x"),
        (F.col("id") % 89).cast("double").alias("y"),
    )
    p = os.path.join(str(tmp_path), "z")
    layout.zorder_write(
        df, p, ["x", "y"], [(0.0, 97.0), (0.0, 89.0)], n_files=8,
        bits_per_dim=8, keep_zval=True,
    )
    back = spark.read.parquet(p)
    assert back.count() == 5000
    assert "__zval" in back.columns
    assert back.select(F.sum("id")).first()[0] == sum(range(5000))
