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
    "zorder_edge_bin",
    "zorder_value",
    "zorder_write",
    "file_range_stats",
    "bloom_file_index",
    "bloom_candidate_files",
    "read_with_bloom_prune",
    "compaction_plan",
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


def zorder_edge_bin(col: Column, edges: Sequence[float], bits: int) -> Column:
    """Bin index of ``col`` against EXPLICIT ascending edges (e.g. from
    :func:`sed_spark.binning.equidepth_edges` — the right binning for a
    skewed dimension, where uniform bins would collapse most rows into
    a handful of z-cells and the layout's pruning power with them).
    The index is the count of interior edges <= x (left-closed bins,
    self-clamping: below-range -> 0, above-range -> last bin), NULL ->
    bin 0. Duplicate quantile edges (heavy ties) are collapsed, so the
    bin count may be below ``2^bits`` — the interleave just leaves high
    values unused."""
    uniq: list[float] = []
    for e in edges:
        fe = float(e)
        if not uniq or fe > uniq[-1]:
            uniq.append(fe)
    if len(uniq) < 2:
        raise ValueError("edges must contain at least 2 distinct values")
    if len(uniq) - 1 > (1 << bits):
        raise ValueError(
            f"{len(uniq) - 1} bins exceed 2^{bits}; raise bits_per_dim",
        )
    from sed_spark.ext import lit_double_array

    interior = lit_double_array(uniq[1:-1])
    c = col.cast("double")
    idx = F.aggregate(
        interior,
        F.lit(0).cast("long"),
        lambda acc, e: acc + F.when(c >= e, 1).otherwise(0),
    )
    return F.coalesce(idx, F.lit(0).cast("long"))


def zorder_value(
    df: DataFrame,
    cols: Sequence[str],
    ranges: Sequence[tuple[float, float]] | None = None,
    bits_per_dim: int = 12,
    out_col: str = "__zval",
    edges: Sequence[Sequence[float]] | None = None,
) -> DataFrame:
    """Adds the Morton interleave of the ``cols`` bin indices: bit ``b``
    of dimension ``j`` lands at position ``b * k + j``, so the z-value
    orders rows by "all dims coarsely, then finer" — a static expression
    tree of shift/mask/or terms (``bits_per_dim * k`` terms), zero
    shuffle, codegen-friendly.

    Binning is uniform over ``ranges`` by default; pass ``edges`` (one
    ascending edge list per dim, e.g. ``equidepth_edges`` output) to bin
    skewed dimensions by quantile instead — pruning selectivity then
    holds in the DENSE region, where uniform bins would put most rows in
    one z-cell (see the layout test: a 5%-of-rows predicate touches
    every uniform file but a fraction of the equi-depth ones).

    ``bits_per_dim * len(cols)`` must stay <= 62 (signed BIGINT in both
    Spark and the SQL mirror). NULLs bin to 0 (they sort first, like
    NULLS FIRST)."""
    k = len(cols)
    if (ranges is None) == (edges is None):
        raise ValueError("pass exactly one of ranges / edges")
    spec = ranges if edges is None else edges
    if k < 1 or k != len(spec):
        raise ValueError("cols and ranges/edges must be same nonzero length")
    if bits_per_dim * k > 62:
        raise ValueError(
            f"bits_per_dim * dims = {bits_per_dim * k} exceeds 62 bits",
        )
    z = F.lit(0).cast("long")
    for j, (c, s) in enumerate(zip(cols, spec)):
        if edges is None:
            lo, hi = s
            b = F.coalesce(
                zorder_bin(F.col(c), lo, hi, bits_per_dim),
                F.lit(0).cast("long"),
            )
        else:
            b = zorder_edge_bin(F.col(c), s, bits_per_dim)
        for bit in range(bits_per_dim):
            z = z + F.shiftleft(
                F.shiftright(b, bit).bitwiseAND(F.lit(1)), bit * k + j,
            ).cast("long")
    return df.withColumn(out_col, z)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    ranges: Sequence[tuple[float, float]] | None = None,
    n_files: int = 64,
    bits_per_dim: int = 12,
    mode: str = "overwrite",
    keep_zval: bool = False,
    edges: Sequence[Sequence[float]] | None = None,
) -> None:
    """Write ``df`` as ``n_files`` parquet files laid out along the
    Z-order curve over ``cols``: range-partition on the z-value (one
    range exchange — Spark samples the z distribution, so skewed data
    still yields balanced files) and sort within each partition, so
    every file covers a contiguous z-range and parquet's row-group
    min/max stats stay tight on EVERY z-ordered column.

    The z-value column is dropped by default (it is derivable); pass
    ``keep_zval=True`` to persist it for z-range predicates. ``edges``
    switches to explicit (e.g. equi-depth) binning per dim — see
    :func:`zorder_value`."""
    zdf = zorder_value(df, cols, ranges, bits_per_dim, edges=edges)
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


# ---------------------------------------------------------------------------
# per-file Bloom skipping index
# ---------------------------------------------------------------------------

def bloom_file_index(
    spark,
    path: str,
    key_col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
    salt: str = "fidx",
) -> DataFrame:
    """Per-FILE Bloom set-bit table ``(file, bit)`` over ``key_col`` for
    a written dataset — file skipping for HIGH-CARDINALITY point
    lookups, where footer min/max pruning is useless (a hash-distributed
    id column spans nearly the full value range in every file, so range
    stats prune nothing; a Bloom bit pattern still identifies which
    files can possibly hold one key).

    One scan grouped by ``input_file_name()``: each key fans into
    ``k_hashes`` bits (the md5 cells of :mod:`sed_spark.ext.sketch` —
    reproducible in any engine), distinct per file. The index is at most
    ``files × m_bits`` rows, in practice ``files × min(m_bits, keys·k)``
    — a driver-manageable sidecar to persist next to the data. Like any
    Bloom structure it has NO false negatives: a probe never skips a
    file that contains the key.
    """
    from sed_spark.ext.sketch import _hash32

    df = spark.read.parquet(path)
    _check_bloom_key_type(df, key_col)
    k = F.col(key_col).cast("string")
    return (
        df.select(
            F.input_file_name().alias("file"),
            F.explode(
                F.array(*[
                    (_hash32(k, f"{salt}:{j}") % m_bits)
                    for j in range(k_hashes)
                ]),
            ).alias("bit"),
        )
        .distinct()
    )


#: key-column types whose Spark CAST-to-string matches Python's str()
#: rendering — the probe-side mirror depends on that equality. Doubles
#: ('1.0E7' vs '10000000.0') and booleans ('true' vs 'True') do NOT
#: match and would produce silent false negatives, so they are rejected.
_BLOOM_KEY_TYPES = ("string", "tinyint", "smallint", "int", "bigint")


def _check_bloom_key_type(df: DataFrame, key_col: str) -> None:
    dt = dict(df.dtypes).get(key_col)
    if dt not in _BLOOM_KEY_TYPES:
        raise ValueError(
            f"bloom file index key column {key_col!r} has type {dt!r}; "
            f"only {_BLOOM_KEY_TYPES} render identically in Spark's "
            "string cast and the Python probe mirror — cast the key to "
            "string at write time for other types",
        )


def _probe_bits(key, m_bits: int, k_hashes: int, salt: str) -> list[int]:
    """Driver-side mirror of the index's bit derivation (md5 first-8-hex,
    same string form the Column cast produces for int/string keys — the
    only types :func:`_check_bloom_key_type` admits)."""
    import hashlib

    return [
        int(
            hashlib.md5(f"{key}:{salt}:{j}".encode()).hexdigest()[:8], 16,
        ) % m_bits
        for j in range(k_hashes)
    ]


def bloom_candidate_files(
    index: DataFrame,
    key,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
    salt: str = "fidx",
) -> list[str]:
    """Files whose Bloom pattern contains ALL probe bits of ``key`` —
    the candidate list a point lookup must read (complete by the
    no-false-negative property; may contain extra files at the Bloom
    false-positive rate). One filter + one files-sized aggregate."""
    bits = sorted(set(_probe_bits(key, m_bits, k_hashes, salt)))
    matched = (
        index.filter(F.col("bit").isin(bits))
        .groupBy("file")
        .agg(F.count_distinct("bit").alias("__n"))
        .filter(F.col("__n") == len(bits))
    )
    return sorted(r["file"] for r in matched.collect())


def read_with_bloom_prune(
    spark,
    path: str,
    index: DataFrame,
    key_col: str,
    key,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
    salt: str = "fidx",
) -> DataFrame:
    """Point lookup that reads ONLY the index's candidate files, then
    applies the exact predicate — result-identical to filtering the full
    dataset (the unit tests pin both the equality and that non-candidate
    files are genuinely absent from the scan)."""
    files = bloom_candidate_files(index, key, m_bits, k_hashes, salt)
    if not files:
        # no file can contain the key: an empty frame in the dataset's
        # schema, without scanning any data file
        return (
            spark.read.parquet(path).filter(F.lit(False))
        )
    return spark.read.parquet(*files).filter(F.col(key_col) == F.lit(key))


def compaction_plan(
    files: DataFrame,
    size_col: str = "size_bytes",
    file_col: str = "path",
    target: int = 128 * 1024 * 1024,
    group_col: str = "compaction_group",
) -> DataFrame:
    """Assign small files to rewrite groups of ~``target`` combined size
    — the OPTIMIZE/compaction planner for the small-file problem every
    long-lived ingestion layout develops (a 100 TB table written by
    streaming micro-batches ends up with millions of KB-scale files;
    scans then pay one open + footer read per file).

    Deterministic contiguous bin packing: files ordered (size DESC,
    name) get a running total, and ``group = floor((cumsum - size) /
    target)`` — every file lands wholly in one group, group totals
    average ``target`` and never exceed ``target`` plus the group's
    largest member. A file that overshoots a boundary shortens (or
    skips) the following group — the price of expressing the plan as
    one window cumsum instead of a sequential greedy accumulator; for
    compaction, "~target-sized rewrites" is the actual requirement. A
    single over-``target`` file monopolizes its group, and big-first
    ordering keeps giant files from padding many groups. The window is
    GLOBAL by design: the input is a file-METADATA table (one row per
    file — millions of rows at the extreme, never data-sized), so one
    task ranks it; the rewrite itself (read group, write one file) is
    the distributed part and is per-group parallel.
    """
    from pyspark.sql.window import Window

    if target <= 0:
        raise ValueError(f"target must be positive, got {target}")
    # explicit ROWS frame: the default RANGE frame treats duplicate
    # (size, path) rows as peers, giving each a cumsum that includes
    # both and breaking the per-group bound on non-unique listings
    w = (
        Window.orderBy(F.col(size_col).desc(), F.col(file_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(size_col).over(w)
    return files.withColumn(
        group_col,
        F.floor((cum - F.col(size_col)) / F.lit(float(target))).cast("long"),
    )
