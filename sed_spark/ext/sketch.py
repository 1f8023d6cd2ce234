"""Mergeable distributed sketches: Count-Min and HyperLogLog.

At 100 TB you cannot afford an exact pass for every "how often does this
token appear" or "how many distinct URLs" question. Sketches answer them
from a bounded-size summary that is built in one distributed aggregation
and MERGED across shards/days/batches with plain ``sum``/``max`` — the
incremental-corpus story: sketch each new batch, merge into the running
summary, never rescan history.

Determinism contract (what makes these oracle-checkable): bucket and
register assignment use the first 8 hex digits of ``md5`` (the same
cross-engine-exact hash the suite uses everywhere), and the HyperLogLog
harmonic denominator sums ``2^-rho`` terms — exact dyadic rationals
whose double sums never round, so they are order-independent and the
estimate is a pure function of the data, not of partitioning.

- Count-Min (Cormode & Muthukrishnan 2005): ``depth`` rows of ``width``
  counters; ``estimate = min over rows of counter[h_j(key)]``. Always an
  over-estimate; error ≤ e/width · total-weight with prob 1 - e^-depth.
- HyperLogLog (Flajolet et al. 2007): ``2^p`` registers keep the max
  leading-zero rank of a 32-bit hash; harmonic mean + the standard
  small-range (linear counting) and large-range corrections.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_build",
    "bloom_merge",
    "bloom_probe",
    "bloom_bitmap",
    "bloom_m_bits",
    "bloom_probe_expr",
    "bloom_reduced_join",
    "cms_build",
    "cms_merge",
    "cms_query",
    "cms_query_df",
    "hll_register_cols",
    "hll_registers",
    "hll_merge",
    "hll_estimate",
    "hll_registers_by",
    "hll_merge_by",
    "hll_estimate_by",
    "kmv_sketch",
    "kmv_by",
    "kmv_merge",
    "kmv_estimate",
    "kmv_set_estimates",
]


def _hash32(key: Column, salt: str) -> Column:
    """First 8 hex digits of md5(key || ':' || salt) as a long in
    [0, 2^32) — bit-identical to DuckDB's
    ``('0x' || substr(md5(...), 1, 8))::UBIGINT``."""
    return F.conv(
        F.substring(F.md5(F.concat(key, F.lit(":" + salt))), 1, 8), 16, 10,
    ).cast("long")


def cms_build(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    width: int = 1024,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Build a Count-Min sketch: ``(depth, bucket, cnt)`` — sparse rows
    only (absent counters are zero), at most ``depth * width`` of them
    regardless of corpus size.

    One explode-free pass when ``df`` is already keyed: each row fans
    out to ``depth`` (row, bucket) cells via a literal sequence — a
    single hash aggregate whose output is sketch-sized. ``weight_col``
    (default: count 1 per row) admits pre-aggregated ``(key, cnt)``
    input so the heavy corpus aggregation happens once upstream.
    """
    if width < 1 or depth < 1:
        raise ValueError("width and depth must be >= 1")
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    k = F.col(key_col).cast("string")
    rows = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("depth"),
                    (_hash32(k, f"{salt}:{j}") % width).alias("bucket"),
                )
                for j in range(depth)
            ]),
        ).alias("cell"),
        w.alias("_w"),
    )
    return (
        rows.select("cell.depth", "cell.bucket", "_w")
        .groupBy("depth", "bucket")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with identical (width, depth, salt):
    counter-wise sum. This is the shard/day/batch combine step."""
    return (
        a.unionByName(b)
        .groupBy("depth", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_query(
    sketch: DataFrame,
    keys: Sequence[str],
    width: int = 1024,
    depth: int = 4,
    salt: str = "cms",
) -> DataFrame:
    """Point-estimate the weight of each key: ``(key, est)``.

    The query keys are a literal table (broadcast by size); delegates to
    :func:`cms_query_df`, so both entry points share one probe plan.
    """
    if not keys:
        raise ValueError("keys must be a non-empty sequence")
    spark = sketch.sparkSession
    kdf = spark.createDataFrame([(k,) for k in keys], "key string")
    return cms_query_df(
        sketch, kdf, "key", width=width, depth=depth, salt=salt,
        broadcast_keys=True,
    )


def cms_query_df(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "key",
    width: int = 1024,
    depth: int = 4,
    salt: str = "cms",
    broadcast_keys: bool = True,
) -> DataFrame:
    """Point-estimate the weight of every DISTINCT key in a DataFrame
    column: ``(key_col, est)`` — the probe shape for key sets that are
    themselves query results (heavy-hitter candidates, a new batch's
    vocabulary) rather than literals. Each key fans into its ``depth``
    cells, equi-joins the sketch (which is at most ``depth * width``
    rows — set ``broadcast_keys=False`` for huge key sets and the
    SKETCH side broadcasts instead), and takes the min counter, absent
    cells counting as zero. Parameters must match the build."""
    if width < 1 or depth < 1:
        raise ValueError("width and depth must be >= 1")
    kdf = keys.select(F.col(key_col).cast("string").alias("key")).distinct()
    cells = kdf.select(
        "key",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("depth"),
                    (_hash32(F.col("key"), f"{salt}:{j}") % width)
                    .alias("bucket"),
                )
                for j in range(depth)
            ]),
        ).alias("cell"),
    ).select("key", "cell.depth", "cell.bucket")
    if broadcast_keys:
        cells = F.broadcast(cells)
        joined = cells.join(sketch, ["depth", "bucket"], "left")
    else:
        joined = cells.join(
            F.broadcast(sketch), ["depth", "bucket"], "left",
        )
    return (
        joined
        .groupBy("key")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
        .withColumnRenamed("key", key_col)
    )


def hll_register_cols(
    key: Column, p: int, salt: str = "hll",
) -> tuple[Column, Column]:
    """The ``(register, rho)`` column pair for one key — shared by the
    batch builder and the streaming windowed variant.

    The 32-bit hash splits into the top ``p`` bits (register index) and
    the remaining ``32 - p`` bits ``w``; ``rho = (32 - p) + 1 -
    bit_length(w)`` (``w = 0`` ⇒ the max rank ``33 - p``). ``bit_length``
    is ``length(bin(w))`` — a string op both engines implement without
    leading zeros, so no floating-point ``log2`` edge cases.
    """
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    h = _hash32(key.cast("string"), salt)
    rest = 1 << (32 - p)
    w = h % rest
    rho = F.when(
        w > 0, F.lit(32 - p + 1) - F.length(F.bin(w)),
    ).otherwise(F.lit(32 - p + 1))
    # (h - w) is an exact multiple of rest, so the division is exact —
    # equivalent to h >> (32 - p) without relying on float rounding
    return ((h - w) / F.lit(rest)).cast("long"), rho.cast("int")


def hll_registers(
    df: DataFrame,
    key_col: str,
    p: int = 8,
    salt: str = "hll",
) -> DataFrame:
    """Build the HyperLogLog register table ``(register, max_rho)`` —
    at most ``2^p`` rows (only touched registers appear).

    One hash aggregate; duplicates collapse inside the ``max`` (that is
    the whole point of HLL — no distinct shuffle of the corpus). See
    :func:`hll_register_cols` for the bit split.
    """
    register, rho = hll_register_cols(F.col(key_col), p, salt)
    return (
        df.select(register.alias("register"), rho.alias("rho"))
        .groupBy("register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two register tables built with identical (p, salt):
    register-wise max."""
    return (
        a.unionByName(b)
        .groupBy("register")
        .agg(F.max("max_rho").alias("max_rho"))
    )


def hll_alpha(p: int) -> float:
    """The standard bias-correction constant for ``m = 2^p`` registers."""
    m = 1 << p
    if p == 4:
        return 0.673
    if p == 5:
        return 0.697
    if p == 6:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(
    registers: DataFrame, p: int = 8, round_decimals: int = 6,
) -> DataFrame:
    """Distinct-count estimate from a register table: one row
    ``(n_registers_set, raw_est, estimate)``.

    The harmonic denominator ``(m - V) · 1 + Σ 2^-max_rho`` sums exact
    dyadic doubles (every ``2^-rho`` with ``rho ≤ 33`` is representable
    and ``m · 2^33 ≪ 2^53``), so it never rounds and is independent of
    aggregation order — the estimate is reproducible bit-for-bit. The
    standard corrections apply: linear counting below ``5m/2`` when
    empty registers remain, and the 32-bit large-range correction above
    ``2^32/30``.
    """
    m = 1 << p
    alpha = hll_alpha(p)
    agg = registers.agg(
        F.count(F.lit(1)).alias("n_registers_set"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("_h"),
    )
    denom = (F.lit(float(m)) - F.col("n_registers_set")) + F.coalesce(
        F.col("_h"), F.lit(0.0),
    )
    raw = F.lit(alpha * m * m) / denom
    v = F.lit(m) - F.col("n_registers_set")  # empty registers
    two32 = 4294967296.0
    corrected = (
        F.when(
            (raw <= F.lit(2.5 * m)) & (v > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / v),
        )
        .when(
            raw > F.lit(two32 / 30.0),
            F.lit(-two32) * F.log(F.lit(1.0) - raw / F.lit(two32)),
        )
        .otherwise(raw)
    )
    return agg.select(
        "n_registers_set",
        F.round(raw, round_decimals).alias("raw_est"),
        F.round(corrected, round_decimals).alias("estimate"),
    )


def hll_registers_by(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    p: int = 8,
    salt: str = "hll",
) -> DataFrame:
    """Per-GROUP HyperLogLog register tables in one aggregate:
    ``(*group_cols, register, max_rho)`` — at most ``2^p`` rows per
    group. The grouped analog of :func:`hll_registers` (same bit split,
    same salt, so a group's rows merge with any other table built with
    identical ``(p, salt)`` via :func:`hll_merge_by`); the shape behind
    "distinct users per event type over 100 TB" without a
    count-distinct expand or a corpus distinct shuffle — the shuffle
    carries at most ``groups * 2^p`` partial rows."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    register, rho = hll_register_cols(F.col(key_col), p, salt)
    return (
        df.select(*group_cols, register.alias("register"), rho.alias("rho"))
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge_by(
    a: DataFrame, b: DataFrame, group_cols: Sequence[str],
) -> DataFrame:
    """Merge two grouped register tables built with identical
    ``(p, salt)``: register-wise max per group."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "register")
        .agg(F.max("max_rho").alias("max_rho"))
    )


def hll_estimate_by(
    registers: DataFrame,
    group_cols: Sequence[str],
    p: int = 8,
    round_decimals: int = 6,
) -> DataFrame:
    """Per-group distinct-count estimates from a grouped register table:
    ``(*group_cols, n_registers_set, raw_est, estimate)`` — the same
    dyadic-exact harmonic sum and the same linear-counting /
    large-range corrections as :func:`hll_estimate`, per group."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    m = 1 << p
    alpha = hll_alpha(p)
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_registers_set"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("_h"),
    )
    denom = (F.lit(float(m)) - F.col("n_registers_set")) + F.coalesce(
        F.col("_h"), F.lit(0.0),
    )
    raw = F.lit(alpha * m * m) / denom
    v = F.lit(m) - F.col("n_registers_set")
    two32 = 4294967296.0
    corrected = (
        F.when(
            (raw <= F.lit(2.5 * m)) & (v > 0),
            F.lit(float(m)) * F.log(F.lit(float(m)) / v),
        )
        .when(
            raw > F.lit(two32 / 30.0),
            F.lit(-two32) * F.log(F.lit(1.0) - raw / F.lit(two32)),
        )
        .otherwise(raw)
    )
    return agg.select(
        *group_cols,
        "n_registers_set",
        F.round(raw, round_decimals).alias("raw_est"),
        F.round(corrected, round_decimals).alias("estimate"),
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Build a Bloom filter as its SET-BIT table ``(bit,)`` — the sparse
    representation of an ``m_bits``-wide filter (absent rows are zero
    bits), at most ``min(m_bits, k_hashes · n_keys)`` rows.

    The membership pre-filter for incremental dedup at scale: the prior
    corpus's content hashes compress to set-bit positions; a new batch
    probes them and splits into DEFINITELY-NEW (at least one bit unset —
    Bloom filters have no false negatives, so these skip the exact
    anti-join entirely) and maybe-seen (a small, false-positive-bounded
    slice that alone pays the exact :func:`~sed_spark.ext.dedup.
    incremental_dedup` check). Merging day N's filter into the running
    one is a union-distinct — same mergeability contract as the other
    sketches. Size ``m_bits ≈ -n·ln(fp)/ln(2)²`` for a target false-
    positive rate; the bit table broadcasts when small and hash-joins on
    an integer key when not.
    """
    if m_bits < 2 or k_hashes < 1:
        raise ValueError("m_bits must be >= 2 and k_hashes >= 1")
    k = F.col(key_col).cast("string")
    return (
        df.select(
            F.explode(
                F.array(*[
                    (_hash32(k, f"{salt}:{j}") % m_bits)
                    for j in range(k_hashes)
                ]),
            ).alias("bit"),
        )
        .distinct()
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two filters built with identical (m_bits, k_hashes, salt):
    the union of set bits (bitwise OR in the sparse representation)."""
    return a.unionByName(b).distinct()


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Membership test: adds ``maybe_seen`` (1 = every probed bit set,
    0 = definitely never inserted) to ``df``.

    Each probe key fans into ``k_hashes`` (row, bit) cells, left-joins
    the set-bit table on the integer bit key, and takes the min
    present-flag per row — one join against a table bounded by the
    filter width, never against the corpus it summarizes.
    """
    if m_bits < 2 or k_hashes < 1:
        raise ValueError("m_bits must be >= 2 and k_hashes >= 1")
    k = F.col(key_col).cast("string")
    # collapse the k probe cells per INPUT ROW, not per distinct column
    # tuple: grouping on *df.columns would silently deduplicate identical
    # input rows, returning fewer rows than it claims to annotate
    tagged = df.withColumn("__rid", F.monotonically_increasing_id())
    cells = tagged.select(
        "*",
        F.explode(
            F.array(*[
                (_hash32(k, f"{salt}:{j}") % m_bits)
                for j in range(k_hashes)
            ]),
        ).alias("bit"),
    )
    marked = bloom.select("bit", F.lit(1).alias("__set"))
    return (
        cells.join(marked, "bit", "left")
        .groupBy("__rid", *df.columns)
        .agg(
            F.min(F.coalesce("__set", F.lit(0))).cast("int")
            .alias("maybe_seen"),
        )
        .drop("__rid")
    )


def bloom_bitmap(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
    salt: str = "bloom",
) -> list[int]:
    """Collect a Bloom filter as ``m_bits // 32`` packed 32-bit words
    (kept in longs so every mask is a non-negative exact double: Spark's
    shift builtins take only literal shift amounts, ``pow(2, b)`` for
    b ≤ 31 is exact and sign-free) — the DENSE driver-side form of
    :func:`bloom_build`'s sparse set-bit table, sized for embedding in
    an expression tree (1 MiB of longs at the default 2^20 bits; 2^23
    bits ≈ 1% fp at 1M keys is 8 MiB).

    The set bits pack distributively: one groupBy on ``bit // 32`` with
    a ``bit_or`` of the per-bit masks, so at most ``m_bits / 32`` rows
    reach the driver regardless of key count — a bounded, sketch-sized
    collect, the same altitude as the CMS/HLL register collects.
    """
    if m_bits % 32 != 0:
        raise ValueError(f"m_bits must be a multiple of 32, got {m_bits}")
    rows = (
        bloom_build(df, key_col, m_bits, k_hashes, salt)
        .groupBy(F.floor(F.col("bit") / 32).cast("int").alias("w"))
        .agg(
            F.bit_or(
                F.pow(F.lit(2.0), F.col("bit") % 32).cast("long"),
            ).alias("word"),
        )
        .collect()
    )
    words = [0] * (m_bits // 32)
    for r in rows:
        words[r["w"]] = r["word"]
    return words


def bloom_probe_expr(
    key: Column,
    words: Sequence[int],
    k_hashes: int = 4,
    salt: str = "bloom",
) -> Column:
    """Pure-EXPRESSION Bloom membership test against a
    :func:`bloom_bitmap`: true = maybe present, false = definitely not,
    NULL key → NULL. The bitmap rides the plan as one literal
    ``array<long>``, so the probe is ``k_hashes`` md5s + bit tests —
    zero joins, zero shuffles, usable as a scan-level pre-filter (the
    expression form Spark's own runtime bloom-filter join inserts, but
    engine-controlled and deterministic).

    Each hash is computed exactly ONCE: the k bit positions are built
    as one ``array`` and the word/mask tests run over a ``forall``
    lambda binding, so the md5 subtree is never duplicated between the
    word index and the bit mask (measured ~30%% faster than the
    inlined-twice form at 2e7 rows, identical rows).
    """
    from sed_spark.ext import lit_long_array

    words = list(words)
    m_bits = len(words) * 32
    if m_bits == 0 or k_hashes < 1:
        raise ValueError("words must be non-empty and k_hashes >= 1")
    # one SQL parse, not len(words) py4j literal calls (measured 2.4 s
    # of pure driver time at the 4.5k-word auto-sized bitmap)
    arr = lit_long_array(words)
    k = key.cast("string")
    positions = F.array(
        *[_hash32(k, f"{salt}:{j}") % m_bits for j in range(k_hashes)],
    )
    # NULL key → NULL hashes → NULL per-bit tests → forall yields NULL
    return F.forall(
        positions,
        lambda h: F.element_at(arr, F.floor(h / 32).cast("int") + 1)
        .bitwiseAND(F.pow(F.lit(2.0), h % 32).cast("long")) != 0,
    )


def bloom_m_bits(
    n_keys: float,
    fp_target: float = 0.01,
    max_m_bits: int = 1 << 24,
) -> int:
    """Bloom bitmap size for ``n_keys`` distinct keys at ``fp_target``:
    the standard ``m = -n·ln(fp)/ln(2)²`` rounded up to a multiple of 32
    (the packed-word unit), floored at 2^14 bits and capped at
    ``max_m_bits`` (the literal-array plan/driver budget — 2^24 bits is
    a 2 MiB array; past the cap the caller trades fp rate for plan
    size, and :func:`bloom_reduced_join` warns when pruning is gone)."""
    import math

    if not 0.0 < fp_target < 1.0:
        raise ValueError(f"fp_target must be in (0, 1), got {fp_target}")
    if max_m_bits % 32 != 0 or max_m_bits < 1 << 14:
        raise ValueError(
            f"max_m_bits must be a multiple of 32 >= 2^14, got {max_m_bits}",
        )
    want = max(1.0, float(n_keys)) * -math.log(fp_target) / (math.log(2.0) ** 2)
    return min(int(max_m_bits), max(1 << 14, 32 * math.ceil(want / 32)))


def bloom_reduced_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    how: str = "inner",
    m_bits: int | None = None,
    k_hashes: int = 4,
    salt: str = "bloomjoin",
    fp_target: float = 0.01,
    max_m_bits: int = 1 << 24,
    check_saturation: bool | None = None,
) -> DataFrame:
    """Semi-join reduction: rows of ``left`` whose key is DEFINITELY
    absent from ``right`` (Bloom filters have no false negatives) never
    enter the join — for ``inner``/``left_semi`` they are dropped before
    the shuffle; for ``left``/``left_anti`` they short-circuit to the
    pass-through branch with no join at all. Row-identical to
    ``left.join(right, on, how)`` by construction: false positives only
    ever ROUTE a row into the exact join, so the fp rate buys less
    pruning, never a wrong answer.

    This is the classic distributed-DB semi-join reduction made
    explicit: build the filter from the (smaller) right side's keys
    (one aggregate, ≤ ``m_bits/32`` longs to the driver via
    :func:`bloom_bitmap`), probe the (huge) left side with the
    codegen'd :func:`bloom_probe_expr` AT THE SCAN, and shuffle only
    the maybe-present slice. At a selective 100 TB join the shuffle
    shrinks by the non-match fraction — the same effect as Spark's AQE
    runtime bloom filter, but deterministic, cross-format, and under
    caller control.

    **Sizing** (round 10): by default (``m_bits=None``) the bitmap is
    auto-sized from an HLL estimate of the right side's distinct keys —
    ``m ≈ -n·ln(fp_target)/ln(2)²`` rounded up to a multiple of 32,
    floored at 2^14 bits and capped at ``max_m_bits`` (default 2^24
    bits = a 2 MiB literal array, a documented driver/plan budget). A
    fixed bitmap silently loses its reason to exist when the key count
    outgrows it (the fp rate → 1 and nothing prunes — correctness is
    unaffected, Bloom filters have no false negatives), so on the
    auto-sizing path the implied fp rate ``(1 - e^(-k·n/m))^k`` is
    checked against the estimate and a warning fires when it exceeds
    0.5. The HLL estimate is one extra (sketch-sized) pass over the
    right side; callers who pass ``m_bits`` explicitly have pre-sized
    the filter and do NOT pay it — the function stays lazy for them.
    Pass ``check_saturation=True`` to force the estimate + warning
    even with an explicit ``m_bits`` (or ``False`` to suppress it on
    the auto path — sizing then falls back to the same estimate, so
    the scan still runs, only the warning is muted).

    NULL left keys never equi-join, so they route to the pass-through
    branch (kept for ``left``/``left_anti``, dropped for
    ``inner``/``left_semi``) without probing. For ``how="left"`` the
    pass-through branch appends the right columns as typed NULLs via
    ``unionByName``, which requires left/right column names (beyond the
    key) to be disjoint — the same overlap a plain
    ``left.join(right, on, "left")`` would tolerate as ambiguous
    duplicates is rejected here with an explicit error.
    """
    import math
    import warnings

    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(
            "how must be inner/left/left_semi/left_anti, got " + repr(how),
        )
    if how == "left":
        overlap = sorted(
            (set(left.columns) & set(right.columns)) - {on},
        )
        if overlap:
            raise ValueError(
                "bloom_reduced_join(how='left') appends right columns to "
                "the pass-through branch by name, so non-key column names "
                f"must be disjoint; overlapping: {overlap}. Rename or drop "
                "them first (a plain left join would keep both as "
                "ambiguous duplicates).",
            )
    keys = right.select(on).filter(F.col(on).isNotNull())
    # the sketch-sized HLL pass runs only when needed: always for
    # auto-sizing (m_bits=None), otherwise only on explicit opt-in —
    # an explicit m_bits keeps the function lazy and single-pass
    need_estimate = m_bits is None or check_saturation is True
    n_est = None
    if need_estimate:
        n_est = max(
            1.0,
            float(
                hll_estimate(hll_registers(keys, on, p=12), p=12)
                .collect()[0]["estimate"],
            ),
        )
    if m_bits is None:
        m_bits = bloom_m_bits(n_est, fp_target, max_m_bits)
    if n_est is not None and check_saturation is not False:
        implied_fp = (
            1.0 - math.exp(-k_hashes * n_est / m_bits)
        ) ** k_hashes
        if implied_fp > 0.5:
            warnings.warn(
                f"bloom_reduced_join: ~{n_est:.0f} distinct right keys "
                f"saturate a {m_bits}-bit filter (implied fp "
                f"{implied_fp:.2f}) — the join stays correct but the "
                "probe prunes almost nothing; raise m_bits/max_m_bits "
                "or skip the reduction",
                stacklevel=2,
            )
    words = bloom_bitmap(keys, on, m_bits, k_hashes, salt)
    probe = bloom_probe_expr(F.col(on), words, k_hashes, salt)
    maybe = left.filter(F.coalesce(probe, F.lit(False)))
    if how in ("inner", "left_semi"):
        return maybe.join(right, [on], how)
    definite = left.filter(~F.coalesce(probe, F.lit(False)))
    if how == "left_anti":
        return maybe.join(right, [on], "left_anti").unionByName(definite)
    # left: pass-through rows append the right columns as typed NULLs
    joined = maybe.join(right, [on], "left")
    pads = [
        F.lit(None).cast(f.dataType).alias(f.name)
        for f in right.schema.fields
        if f.name != on
    ]
    return joined.unionByName(definite.select("*", *pads))


def _kmv_est_expr(kmv: Column, k: int) -> Column:
    """Distinct-count estimate from a bottom-k sketch column: exact
    ``size`` when the set fit entirely (< k hashes kept), else the
    classic KMV estimator ``(k-1)/u_k`` with ``u_k = (h_k + 1)/2^32``
    (Bar-Yossef et al. 2002). All arithmetic is a constant multiply and
    ONE division of exactly-representable doubles, so any IEEE engine
    reproduces it bit-for-bit."""
    n = F.size(kmv)
    kth = F.element_at(kmv, k).cast("double")
    return F.when(n < k, n.cast("double")).otherwise(
        F.lit(float((k - 1) * 4294967296)) / (kth + F.lit(1.0)),
    )


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    k: int = 256,
    salt: str = "kmv",
) -> DataFrame:
    """K-minimum-values distinct sketch: the ``k`` smallest distinct
    32-bit hashes of ``key_col``, as ONE row ``(kmv: array<long>)``
    sorted ascending.

    The sketch HLL cannot be: a bottom-k hash SAMPLE of the set, so two
    sketches support union (merge), intersection, and Jaccard estimates
    (:func:`kmv_set_estimates`) — "how many users are in BOTH segments"
    over 100 TB without a distinct-pair join. NULL keys are excluded
    (the ``count distinct`` convention).

    Shuffle contract: each input partition is first reduced to its own
    k smallest DISTINCT hashes (Arrow batches + ``np.unique``, running
    state ≤ 2k values — a naive global ``distinct()`` first would
    shuffle EVERY distinct hash, the full count-distinct cost, when
    only k survive), so the exchange carries ≤ k·partitions rows into
    one TakeOrdered(k) — never a global sort. Determinism is the md5
    hash: the same data yields the same sketch on any engine or
    partitioning. Error ~ 1/sqrt(k) relative.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    import numpy as np
    import pyarrow as pa

    h = _hash32(F.col(key_col).cast("string"), salt)
    hashed = df.select(h.alias("h")).filter(F.col("h").isNotNull())

    def _partition_bottom_k(batches):
        seen = None
        for b in batches:
            arr = np.unique(b.column("h").to_numpy(zero_copy_only=False))
            if len(arr) > k:
                arr = arr[:k]  # np.unique output is sorted ascending
            seen = arr if seen is None else np.unique(
                np.concatenate([seen, arr]),
            )[:k]
        if seen is not None and len(seen):
            yield pa.RecordBatch.from_arrays(
                [pa.array(seen, pa.int64())], ["h"],
            )

    return (
        hashed.mapInArrow(_partition_bottom_k, "h long")
        .distinct()
        .orderBy("h")
        .limit(k)
        .agg(F.array_sort(F.collect_list("h")).alias("kmv"))
    )


def kmv_by(
    df: DataFrame,
    by: str | Sequence[str],
    key_col: str,
    k: int = 256,
    salt: str = "kmv",
) -> DataFrame:
    """Per-group KMV sketches ``(by..., kmv)`` — distinct ``key_col``
    reach per segment with set algebra across groups.

    Distinct ``(group, hash)`` first (bounds the data to true distincts),
    then a rank window PARTITIONED BY the group — never a global sort;
    per-partition work is bounded by the group's distinct count, and the
    uniform hash order makes the bottom-k scan cheap. NULL keys are
    excluded like :func:`kmv_sketch`'s (a NULL hash would sort FIRST,
    burn a rank slot, and silently shrink the sketch by one) — but a
    group whose keys are ALL NULL still appears, with an empty sketch
    (distinct-reach 0), matching ``count(distinct ...) group by``."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql.window import Window

    keys = [by] if isinstance(by, str) else list(by)
    h = _hash32(F.col(key_col).cast("string"), salt)
    dist = (
        df.select(*keys, h.alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
    )
    w = Window.partitionBy(*keys).orderBy("h")
    sketches = (
        dist.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(*keys)
        .agg(F.array_sort(F.collect_list("h")).alias("kmv"))
    )
    # NULL-SAFE join-back so a NULL GROUP KEY keeps its real sketch
    # (plain equi-join would hand it the empty-array fallback)
    groups = df.select(*keys).distinct()
    ren = {kk: f"__gk_{i}" for i, kk in enumerate(keys)}
    r = sketches
    for kk, nk in ren.items():
        r = r.withColumnRenamed(kk, nk)
    cond = None
    for kk, nk in ren.items():
        c = F.col(kk).eqNullSafe(F.col(nk))
        cond = c if cond is None else cond & c
    return (
        groups.join(r, cond, "left")
        .select(
            *keys,
            F.coalesce(
                "kmv", F.array().cast("array<long>"),
            ).alias("kmv"),
        )
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Union two sketches built with the same (k, salt): the k smallest
    of the combined distinct hashes — the sketch of the UNION of the
    underlying sets (shard/day merge)."""
    pair = a.select(F.col("kmv").alias("__ka")).crossJoin(
        b.select(F.col("kmv").alias("__kb")),
    )
    return pair.select(
        F.slice(
            F.array_sort(F.array_distinct(F.concat("__ka", "__kb"))), 1, k,
        ).alias("kmv"),
    )


def kmv_estimate(sk: DataFrame, k: int = 256) -> DataFrame:
    """Distinct-count estimate from a sketch (or per-group sketches —
    every non-``kmv`` column passes through): ``(..., n_hashes,
    estimate)``; exact when the whole set fit in the sketch."""
    other = [c for c in sk.columns if c != "kmv"]
    return sk.select(
        *other,
        F.size("kmv").alias("n_hashes"),
        _kmv_est_expr(F.col("kmv"), k).alias("estimate"),
    )


def kmv_set_estimates(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Set algebra from two sketches: ONE row ``(n_union_hashes,
    n_common, union_est, jaccard_est, intersect_est)``.

    The union sketch is the bottom-k of the combined hashes; ``rho`` =
    how many of its members appear in BOTH input sketches. Jaccard ≈
    rho/k, intersection ≈ jaccard · |A ∪ B| (Beyer et al. 2007) — the
    segment-overlap question (users in both cohorts, terms shared by two
    corpora) answered from two k-element summaries. When the union fit
    entirely (< k hashes), all three are exact."""
    pair = a.select(F.col("kmv").alias("__ka")).crossJoin(
        b.select(F.col("kmv").alias("__kb")),
    )
    ku = F.slice(
        F.array_sort(F.array_distinct(F.concat("__ka", "__kb"))), 1, k,
    )
    staged = pair.select("__ka", "__kb", ku.alias("__ku"))
    nu = F.size("__ku")
    rho = F.size(
        F.filter(
            F.col("__ku"),
            lambda x: F.array_contains(F.col("__ka"), x)
            & F.array_contains(F.col("__kb"), x),
        ),
    )
    union_est = _kmv_est_expr(F.col("__ku"), k)
    exact = nu < k  # union fully captured -> everything is exact
    jaccard = F.when(
        exact,
        F.when(nu == 0, F.lit(0.0)).otherwise(
            rho.cast("double") / nu.cast("double"),
        ),
    ).otherwise(rho.cast("double") / F.lit(float(k)))
    intersect = F.when(exact, rho.cast("double")).otherwise(
        (rho.cast("double") / F.lit(float(k))) * union_est,
    )
    return staged.select(
        nu.alias("n_union_hashes"),
        rho.alias("n_common"),
        union_est.alias("union_est"),
        jaccard.alias("jaccard_est"),
        intersect.alias("intersect_est"),
    )
