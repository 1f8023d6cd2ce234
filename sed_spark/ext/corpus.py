"""Corpus-management operators: URL/domain analysis and deterministic
dataset splitting.

Web-corpus curation needs per-domain accounting (domain blocklists,
source balancing, per-domain dedup budgets) and reproducible
train/validation/test assignment that is stable across runs, machines,
and corpus growth. Both are pure Column expressions — a 100 TB scan is
one projection; the only shuffle is the (small-keyed) domain rollup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_urls", "domain_stats", "hash_split"]

#: scheme://host[:port][/path] — the regex subset with identical
#: Java/RE2 semantics (no lookaround, no backrefs). The host must start
#: and end with an alphanumeric so sentence-final punctuation
#: ("visit https://example.com. Next…") is not absorbed into the domain.
URL_PATTERN = (
    r"https?://[a-zA-Z0-9]([a-zA-Z0-9.-]*[a-zA-Z0-9])?(:\d+)?(/[^\s]*)?"
)
_HOST_PATTERN = r"https?://([a-zA-Z0-9]([a-zA-Z0-9.-]*[a-zA-Z0-9])?)"


def extract_urls(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per URL occurrence: (id, url, domain).

    ``domain`` is the URL's host lowercased with a leading ``www.``
    stripped — registrable-domain extraction (public-suffix lists) is a
    lookup-table join away and deliberately out of scope here.
    """
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)
    out = df.select(F.col(id_col), F.explode(urls).alias("url"))
    host = F.lower(F.regexp_extract(F.col("url"), _HOST_PATTERN, 1))
    domain = F.regexp_replace(host, r"^www\.", "")
    return out.withColumn("domain", domain)


def domain_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain rollup: URL count, distinct referencing documents.

    The aggregate shuffles on the domain key only — at corpus scale the
    result is dimension-table sized (millions of domains, not billions
    of documents) and feeds blocklist joins / per-domain sampling caps.
    """
    return (
        extract_urls(df, id_col, text_col)
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
        )
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "",
    split_col: str = "split",
    method: str = "xxhash64",
) -> DataFrame:
    """Deterministic dataset split by content of the id, not by row
    position: ``split`` = the bucket whose cumulative weight interval
    contains a hash of (id, salt) scaled into [0, 1).

    Unlike ``randomSplit`` (seed + partition-layout dependent, so the
    same document can change splits when the corpus repartitions), the
    assignment is a pure function of (id, salt): stable across runs,
    cluster sizes, and corpus growth — new documents never move old
    ones between splits. ``salt`` derives independent splits from the
    same ids. Weights are normalized; iteration order fixes interval
    order.

    ``method`` picks the hash: ``"xxhash64"`` (default — fastest,
    Spark-native) or ``"md5"`` (``u`` = the first 8 hex digits of
    ``md5(id || salt)`` over 2^32) — slower per row but every engine
    with an md5 builtin reproduces the assignment bit-for-bit, which
    is what makes a split auditable OUTSIDE the engine that produced
    it (and is the variant the DuckDB oracle checks).
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(float(w) < 0 for w in weights.values()):
        raise ValueError(f"weights must be non-negative, got {weights}")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    if method == "xxhash64":
        # xxhash64 is signed; scale into [0, 1) — double precision (53
        # bits of the hash) is ample for split assignment and stays a
        # pure, deterministic function of (id, salt)
        u = (
            F.xxhash64(F.col(id_col).cast("string"), F.lit(salt)).cast("double")
            / F.lit(float(2 ** 64))
            + F.lit(0.5)
        )
    elif method == "md5":
        u = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))),
                    1, 8,
                ),
                16, 10,
            ).cast("double")
            / F.lit(float(2 ** 32))
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    expr: Column | None = None
    acc = 0.0
    items = list(weights.items())
    for name, wgt in items[:-1]:
        acc += float(wgt) / total
        cond = u < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)
