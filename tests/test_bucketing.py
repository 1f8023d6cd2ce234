"""Bucketed staging: the join must run with no Exchange on either side."""

from __future__ import annotations

from pyspark.sql import functions as F

from sed_spark.loader.bucketing import stage_bucketed


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("train_id"), (F.col("id") * 2).alias("tof"),
    )
    right = spark.range(0, 10_000).select(
        F.col("id").alias("train_id"), (F.col("id") % 7).alias("bias"),
    )
    lt = stage_bucketed(
        left, "t_left", ["train_id"], n_buckets=8,
        sort_cols=["train_id"], path=str(tmp_path / "l"),
    )
    rt = stage_bucketed(
        right, "t_right", ["train_id"], n_buckets=8,
        sort_cols=["train_id"], path=str(tmp_path / "r"),
    )
    joined = lt.hint("merge").join(rt, "train_id")
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # and the aggregation on the bucket key is shuffle-free too
    agg = lt.groupBy("train_id").agg(F.sum("tof").alias("s"))
    agg.collect()
    aplan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in aplan, aplan
    assert joined.count() == 10_000
