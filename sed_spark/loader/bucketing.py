"""Bucketed staging: co-located joins/aggregations without a shuffle.

The FEL loaders stage per-channel parquet and then equi-join everything on
the (train, pulse, electron) index (reference buffer_handler.py staging +
dataframe concat). At 100 TB the join shuffle dominates; Spark's answer is
BUCKETING: write each staged table hash-partitioned into the same number
of buckets on the join key, and every later equi-join or aggregation on
that key reads the buckets as pre-shuffled partitions — SortMergeJoin with
NO Exchange on either side, across jobs and sessions.

This is the staging-format decision the reference cannot express (dask has
no cross-job partitioning contract); it is the single biggest lever for
repeated joins over the same staged data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def stage_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 64,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
) -> DataFrame:
    """Persist ``df`` as a bucketed (+ optionally sorted) parquet table.

    ``sort_cols`` additionally sorts within each bucket file, which lets
    SortMergeJoin skip its sort too. ``path`` makes it an external table
    (tests use a tmp dir; production uses the staging volume). Returns
    the re-read table, whose scans carry the bucket distribution.
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(int(n_buckets), *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return df.sparkSession.table(table)
