"""Z-order (Morton curve) data layout for multi-dimensional locality.

At 100 TB, the difference between scanning a corpus and scanning 0.1%
of it is FILE SKIPPING: parquet readers prune row groups whose column
min/max stats exclude the predicate. A table sorted by one column prunes
on that column only; a table laid out along a Z-order curve over k
columns gets useful min/max bounds on ALL k — each output file covers a
contiguous z-range, which is a small stack of hyperrectangles in bin
space, so every dimension's per-file range is ~``domain / 2^(bits
written)`` instead of the full domain. This is the layout trick behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``; here it is plain Spark: one
projection for the z-value, one ``repartitionByRange`` (range exchange),
one within-partition sort, one parquet write — no service, no format
extension.

Everything is exact integer expression arithmetic (floor-binning then
bit interleave), so the same values are reproducible in any engine —
the DuckDB oracle replays them digit-for-digit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zorder_bin",
    "zorder_value",
    "zorder_write",
    "file_range_stats",
]


def zorder_bin(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Equi-width bin index of ``col`` in ``[lo, hi)`` over ``2^bits``
    bins, clamped to the edge bins (out-of-range rows sort to the
    boundary instead of corrupting the interleave). NULL stays NULL —
    callers decide placement (``zorder_value`` sends NULLs to bin 0)."""
    if hi <= lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    if not 1 <= bits <= 20:
        raise ValueError("bits must be in [1, 20]")
    n = 1 << bits
    raw = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        / F.lit((float(hi) - float(lo)) / n),
    ).cast("long")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1))


def zorder_value(
    df: DataFrame,
    cols: Sequence[str],
    ranges: Sequence[tuple[float, float]],
    bits_per_dim: int = 12,
    out_col: str = "__zval",
) -> DataFrame:
    """Adds the Morton interleave of the ``cols`` bin indices: bit ``b``
    of dimension ``j`` lands at position ``b * k + j``, so the z-value
    orders rows by "all dims coarsely, then finer" — a static expression
    tree of shift/mask/or terms (``bits_per_dim * k`` terms), zero
    shuffle, codegen-friendly.

    ``bits_per_dim * len(cols)`` must stay <= 62 (signed BIGINT in both
    Spark and the SQL mirror). NULLs bin to 0 (they sort first, like
    NULLS FIRST)."""
    k = len(cols)
    if k < 1 or k != len(ranges):
        raise ValueError("cols and ranges must be same nonzero length")
    if bits_per_dim * k > 62:
        raise ValueError(
            f"bits_per_dim * dims = {bits_per_dim * k} exceeds 62 bits",
        )
    z = F.lit(0).cast("long")
    for j, (c, (lo, hi)) in enumerate(zip(cols, ranges)):
        b = F.coalesce(
            zorder_bin(F.col(c), lo, hi, bits_per_dim), F.lit(0).cast("long"),
        )
        for bit in range(bits_per_dim):
            z = z + F.shiftleft(
                F.shiftright(b, bit).bitwiseAND(F.lit(1)), bit * k + j,
            ).cast("long")
    return df.withColumn(out_col, z)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    ranges: Sequence[tuple[float, float]],
    n_files: int,
    bits_per_dim: int = 12,
    mode: str = "overwrite",
    keep_zval: bool = False,
) -> None:
    """Write ``df`` as ``n_files`` parquet files laid out along the
    Z-order curve over ``cols``: range-partition on the z-value (one
    range exchange — Spark samples the z distribution, so skewed data
    still yields balanced files) and sort within each partition, so
    every file covers a contiguous z-range and parquet's row-group
    min/max stats stay tight on EVERY z-ordered column.

    The z-value column is dropped by default (it is derivable); pass
    ``keep_zval=True`` to persist it for z-range predicates."""
    zdf = zorder_value(df, cols, ranges, bits_per_dim)
    out = zdf.repartitionByRange(n_files, F.col("__zval")).sortWithinPartitions(
        "__zval",
    )
    if not keep_zval:
        out = out.drop("__zval")
    out.write.mode(mode).parquet(path)


def file_range_stats(
    spark,
    path: str,
    cols: Sequence[str],
) -> DataFrame:
    """Per-FILE min/max of each column for a written dataset — the exact
    bounds a reader's row-group pruner sees. The locality metric for a
    layout: sum of per-file ranges, lower = fewer files touched per
    point/range predicate. One aggregate over the data grouped by
    ``input_file_name()``."""
    df = spark.read.parquet(path)
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(F.count(F.lit(1)).alias("num_rows"), *aggs)
    )
