"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k as a pure Column-expression scan (dot
product via ``zip_with`` + ``aggregate`` — JVM higher-order functions, no
UDF, no shuffle until the tiny top-k sort). Scale path: LSH bucketing via
random hyperplane signs so candidate generation is a bucket equi-join
instead of a full scan per query.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["dot_expr", "norm2_expr", "cosine_expr", "cosine_topk", "hyperplane_lsh_buckets"]


def _sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot_expr(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ with explicit double upcast, sequential fold."""
    return _sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def norm2_expr(a: Column) -> Column:
    """Σ aᵢ² (squared L2 norm)."""
    return _sum(F.transform(a, lambda x: x.cast("double") * x.cast("double")))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (F.sqrt(norm2_expr(a)) * F.sqrt(norm2_expr(b)))


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int | None = 6,
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.

    The query vector rides inside the expression tree (no broadcast join);
    the scan is embarrassingly parallel and the only shuffle is the global
    top-k (Spark's TakeOrderedAndProject — per-partition heaps then a
    driver merge, not a full sort).
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    sim = cosine_expr(F.col(vec_col), q)
    if round_decimals is not None:
        sim = F.round(sim, round_decimals)
    return (
        df.select(F.col(id_col), sim.alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def hyperplane_lsh_buckets(
    df: DataFrame,
    planes: Sequence[Sequence[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH: bucket id = sign bits of ⟨v, pᵢ⟩.

    At scale, index build is one pass; query-time ANN probes only matching
    buckets (equi-join on ``bucket``), turning O(N) scans into
    O(N / 2^planes) candidate sets.
    """
    bucket = None
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(v)) for v in p])
        bit = F.when(dot_expr(F.col(vec_col), arr) >= 0, F.lit(1 << i)).otherwise(
            F.lit(0),
        )
        bucket = bit if bucket is None else bucket + bit
    return df.select(F.col(id_col), F.col(vec_col), bucket.cast("int").alias("bucket"))
