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


def test_zorder_edges_beat_uniform_on_skewed_data(spark, tmp_path):
    # x ~ (uniform)^4 concentrates 84% of rows in the bottom 50% of the
    # domain's first 6% — uniform z-bins put them all in a few cells, so
    # a dense-region predicate touches ~every file; equi-depth edges
    # keep per-file bounds tight exactly where the rows are
    from sed_spark.binning import equidepth_edges

    n, files, bits = 80_000, 32, 8
    df = spark.range(n).select(
        (F.pow(F.rand(7), 4.0) * 1000.0).alias("x"),
        (F.rand(8) * 1000.0).alias("y"),
    ).persist()
    ex = equidepth_edges(df, "x", 1 << bits)
    ey = equidepth_edges(df, "y", 1 << bits)
    upath, epath = str(tmp_path / "uni"), str(tmp_path / "eq")
    layout.zorder_write(
        df, upath, ["x", "y"], ranges=[(0.0, 1000.0), (0.0, 1000.0)],
        n_files=files, bits_per_dim=bits,
    )
    layout.zorder_write(
        df, epath, ["x", "y"], edges=[ex, ey],
        n_files=files, bits_per_dim=bits,
    )
    # a 5%-of-rows slice DEEP in the dense region: [q10, q15] of x. All
    # of q0..q25 lives inside uniform bin 0 (x < 1000/256 holds ~25% of
    # (u^4)-distributed rows), so the uniform layout must scan that whole
    # mega-cell; equi-depth bins hold ~n/256 rows each, so the pruner
    # scans ~the slice
    q10, q15 = df.approxQuantile("x", [0.10, 0.15], 0.001)

    def rows_scanned(path):
        rows = layout.file_range_stats(spark, path, ["x"]).collect()
        assert len(rows) >= files // 2
        return sum(
            r["num_rows"]
            for r in rows
            if r["x_min"] <= q15 and r["x_max"] >= q10
        )

    u_rows, e_rows = rows_scanned(upath), rows_scanned(epath)
    # measured band: uniform scans ~72% (the bin-0 mega-cell plus its
    # z-neighbors), equi-depth ~34%; assert a conservative 1.5x margin
    assert e_rows * 3 <= u_rows * 2, (e_rows, u_rows)
    df.unpersist()


def test_zorder_edge_bin_reference_and_guards(spark):
    edges = [0.0, 1.0, 1.0, 4.0, 9.0]  # duplicate edge collapses
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (0.5,), (1.0,), (3.9,), (4.0,), (9.0,), (99.0,),
         (None,)],
        "x double",
    )
    got = [
        r["b"]
        for r in df.select(
            layout.zorder_edge_bin(F.col("x"), edges, 2).alias("b"),
        ).collect()
    ]
    #        -5   0  0.5   1  3.9   4    9   99  NULL
    assert got == [0, 0, 0, 1, 1, 2, 2, 2, 0]
    import pytest as _pt

    with _pt.raises(ValueError, match="distinct"):
        layout.zorder_edge_bin(F.col("x"), [1.0, 1.0], 2)
    with _pt.raises(ValueError, match="bins exceed"):
        layout.zorder_edge_bin(F.col("x"), [0.0, 1.0, 2.0, 3.0, 4.0, 5.0], 2)
    with _pt.raises(ValueError, match="exactly one"):
        layout.zorder_value(df, ["x"], ranges=[(0.0, 1.0)], edges=[[0.0, 1.0]])
    with _pt.raises(ValueError, match="exactly one"):
        layout.zorder_value(df, ["x"])


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


def test_bloom_file_index_prunes_and_matches(spark, tmp_path):
    from sed_spark import layout

    path = str(tmp_path / "bloomed")
    df = spark.range(0, 4000).select(
        (F.col("id") % 400).alias("k"), F.col("id").alias("v"),
    )
    # hash-partition on k: every file holds a SUBSET of keys, but each
    # file's k min/max spans nearly the full range — the exact workload
    # where footer range stats prune nothing and the Bloom index must
    df.repartition(8, "k").write.mode("overwrite").parquet(path)
    idx = layout.bloom_file_index(spark, path, "k").persist()
    all_files = {r["file"] for r in idx.select("file").distinct().collect()}
    assert len(all_files) == 8

    for key in (0, 7, 399):
        cands = layout.bloom_candidate_files(idx, key)
        # the key lives in exactly one partition file; false positives
        # may add a file or two but never all of them
        assert 1 <= len(cands) < len(all_files)
        got = layout.read_with_bloom_prune(spark, path, idx, "k", key)
        want = spark.read.parquet(path).filter(F.col("k") == key)
        assert sorted(r["v"] for r in got.collect()) == sorted(
            r["v"] for r in want.collect()
        )
        assert got.count() == 10
        # the scan's file list is really pruned (no false negatives by
        # construction; this asserts the skipping actually happened)
        plan = got._jdf.queryExecution().executedPlan().toString()
        for f in all_files - set(cands):
            assert f.rsplit("/", 1)[-1] not in plan

    # absent key: no candidate files, empty result, dataset schema
    missing = layout.read_with_bloom_prune(spark, path, idx, "k", 12345)
    assert missing.columns == ["k", "v"] and missing.count() == 0
    idx.unpersist()


def test_bloom_file_index_rejects_unsafe_key_types(spark, tmp_path):
    from sed_spark import layout

    path = str(tmp_path / "bloomed_double")
    spark.range(0, 100).select(
        (F.col("id") * 1.5).alias("k"), F.col("id").alias("v"),
    ).write.mode("overwrite").parquet(path)
    with pytest.raises(ValueError, match="render identically"):
        layout.bloom_file_index(spark, path, "k")


def test_compaction_plan_groups_reach_target(spark):
    from sed_spark import layout

    sizes = [500, 400, 300, 200, 120, 90, 60, 30, 10, 5]
    files = spark.createDataFrame(
        [(f"f{i:02d}", s) for i, s in enumerate(sizes)],
        "path string, size_bytes long",
    )
    got = layout.compaction_plan(files, target=600).collect()
    groups: dict = {}
    for r in got:
        groups.setdefault(r["compaction_group"], []).append(
            (r["path"], r["size_bytes"]),
        )
    # python mirror: size desc, path asc; grp = floor((cum - s)/target)
    order = sorted(((s, p) for p, s in [(f"f{i:02d}", s) for i, s in enumerate(sizes)]),
                   key=lambda t: (-t[0], t[1]))
    cum, want = 0, {}
    for s, p in order:
        cum += s
        want.setdefault((cum - s) // 600, []).append((p, s))
    assert {g: sorted(v) for g, v in groups.items()} == \
        {g: sorted(v) for g, v in want.items()}
    # contract: totals average ~target and never exceed target + the
    # group's largest member (boundary-crossing files may shorten the
    # NEXT group — documented cumsum-interval semantics)
    totals = {g: sum(s for _, s in v) for g, v in groups.items()}
    for g, t in totals.items():
        assert t <= 600 + max(s for _, s in groups[g])
    assert sum(totals.values()) == sum(sizes)
    # an over-target file monopolizes its group
    big = spark.createDataFrame(
        [("huge", 10_000), ("a", 10), ("b", 10)],
        "path string, size_bytes long",
    )
    bg = {r["path"]: r["compaction_group"]
          for r in layout.compaction_plan(big, target=600).collect()}
    assert bg["huge"] == 0 and bg["a"] == bg["b"] and bg["a"] > 0

    with pytest.raises(ValueError, match="target"):
        layout.compaction_plan(files, target=0)


def test_compaction_plan_handles_duplicate_listing_rows(spark):
    from sed_spark import layout

    # two identical (path, size) rows must each get a ROWS-frame cumsum,
    # not a shared RANGE-peer cumsum that inflates both
    files = spark.createDataFrame(
        [("a", 500), ("a", 500), ("b", 200)],
        "path string, size_bytes long",
    )
    got = sorted(
        (r["path"], r["compaction_group"])
        for r in layout.compaction_plan(files, target=600).collect()
    )
    # cum: 500 (grp 0), 1000 (grp 0: floor(500/600)), 1200 (grp 1)
    assert got == [("a", 0), ("a", 0), ("b", 1)]
