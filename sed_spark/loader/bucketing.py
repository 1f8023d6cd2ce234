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


def zorder_key_expr(
    cols: Sequence[str],
    mins: Sequence[float],
    maxs: Sequence[float],
    bits_per_col: int = 16,
):
    """Morton (Z-order) key Column for up to 4 numeric columns: each
    value quantizes to ``bits_per_col`` bits on its [min, max] range and
    the bits interleave — close keys mean close in EVERY dimension.

    Pure integer/bit expressions (whole-stage codegen; no UDF): at
    ``16 bits × 4 cols`` the key fits comfortably in an int64.
    """
    from pyspark.sql import functions as F

    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder supports 1-4 columns")
    if bits_per_col * len(cols) > 63:
        raise ValueError("bits_per_col * n_cols must fit a signed int64")
    n = len(cols)
    levels = (1 << bits_per_col) - 1
    quantized = []
    for c, lo, hi in zip(cols, mins, maxs):
        lo, hi = float(lo), float(hi)
        if not hi > lo:
            raise ValueError(f"column {c!r} has degenerate range [{lo}, {hi}]")
        q = F.floor(
            (F.col(c) - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(levels)),
        ).cast("long")
        quantized.append(F.greatest(F.lit(0), F.least(F.lit(levels), q)))
    key = F.lit(0).cast("long")
    for bit in range(bits_per_col):
        for ci, q in enumerate(quantized):
            key = key + F.shiftleft(
                F.shiftright(q, bit) % 2, bit * n + ci,
            ).cast("long")
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 64,
    bits_per_col: int = 16,
    ranges: Sequence[tuple[float, float]] | None = None,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve of
    ``cols`` — the multi-dimensional data-skipping layout: each output
    file covers a small hyper-rectangle of the key space, so parquet
    min/max footer stats prune files for predicates on ANY of the
    clustered columns, not just the first sort key of a lexicographic
    sort.

    One range shuffle on the Morton key (``repartitionByRange`` sizes
    the ``n_files`` splits by sampling) + a within-partition sort; the
    column ranges come from one min/max aggregate unless supplied.
    At 100 TB this is the layout decision that turns "scan everything
    for a detector-region query" into "read the few files whose X AND Y
    stats overlap it".
    """
    from pyspark.sql import functions as F

    if ranges is None:
        row = df.agg(
            *[F.min(c).alias(f"_lo{i}") for i, c in enumerate(cols)],
            *[F.max(c).alias(f"_hi{i}") for i, c in enumerate(cols)],
        ).collect()[0]
        mins = [row[f"_lo{i}"] for i in range(len(cols))]
        maxs = [row[f"_hi{i}"] for i in range(len(cols))]
    else:
        mins = [r[0] for r in ranges]
        maxs = [r[1] for r in ranges]
    key = zorder_key_expr(cols, mins, maxs, bits_per_col=bits_per_col)
    (
        df.withColumn("__zkey", key)
        .repartitionByRange(int(n_files), "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
