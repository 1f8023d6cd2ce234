"""Lexical retrieval operators: TF-IDF weighting and BM25 scoring.

A training-data pipeline needs keyword retrieval at corpus scale —
finding the documents that match a benchmark query (decontamination by
retrieval), surfacing near-matches for an eval prompt, or weighting
terms for cheap relevance features. These operators build the classic
inverted-index statistics (term frequency, document frequency, document
length) as plain DataFrame aggregations and score with pure Column
expressions, so Catalyst keeps everything JVM-side.

Scale design
------------
``bm25_score`` filters the exploded postings to the (tiny, literal)
query-term set BEFORE any aggregation, so only the matching postings —
a ``len(query)``-term slice of the inverted index — ever shuffle; the
corpus-wide constants (N, avgdl) come from one scalar aggregate that is
broadcast back via ``crossJoin(broadcast(...))``, never collected on the
driver. ``tf_idf`` aggregates the full postings list once per grain
(term df, then per-doc tf); its vocabulary-sized df table joins back by
term — Spark auto-broadcasts it when bounded, and at web scale a
frequency floor (``min_df``) keeps the long tail of hapaxes out of the
join entirely.

Tokenization matches :func:`sed_spark.ext.text.n_words_expr`: non-empty
runs between spaces. The DuckDB oracle mirrors it with
``list_filter(string_split_regex(text, ' '))``.

Formulas (Robertson/Sparck-Jones BM25, the Okapi defaults):

- ``idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))``
- ``bm25(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b*dl/avgdl))``
- ``tfidf(t, d) = tf * (ln((N+1) / (df+1)) + 1)`` (smoothed, sklearn-style)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "doc_terms",
    "term_doc_freq",
    "tf_idf",
    "tf_idf_top_term",
    "bm25_score",
]


def _tokens(text_col: str):
    return F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))


def doc_terms(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Postings list: one ``(id, term)`` row per token occurrence."""
    return df.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("term"),
    )


def term_doc_freq(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """``(term, df)`` document frequencies.

    ``min_df`` floors the table: at web scale most of the vocabulary is
    hapaxes that no query will ever hit — dropping them here keeps the
    df table broadcast-sized for the join-back in :func:`tf_idf`.
    """
    out = (
        doc_terms(df, id_col, text_col)
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    if min_df > 1:
        out = out.filter(F.col("df") >= min_df)
    return out


def tf_idf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Per-``(id, term)`` smoothed TF-IDF weights.

    One postings explode feeds both aggregations (term df across docs,
    tf within each doc); the corpus size N rides in on the same scalar
    broadcast as in :func:`bm25_score`. Weight is rounded to 6 decimals
    so downstream order-by tie-breaks agree across engines.
    """
    postings = doc_terms(df, id_col, text_col)
    tf = postings.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = term_doc_freq(df, id_col, text_col, min_df=min_df)
    n_docs = df.agg(F.count(F.lit(1)).alias("_n_docs"))
    idf = F.log((F.col("_n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))) + F.lit(
        1.0,
    )
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "term",
            "tf",
            "df",
            F.round(F.col("tf") * idf, 6).alias("tfidf"),
        )
    )


def tf_idf_top_term(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Each document's highest-TF-IDF term: ``(id, top_term, top_tfidf)``.

    Deterministic tie-break: highest rounded weight, then lexicographically
    smallest term — the ordering runs on the ROUNDED weight so both
    engines break ties identically even when their ``ln`` differs in the
    last ulp. One shuffle (by ``id_col``); per-doc term counts are
    document-length-bounded, so the sort is local and skew-free.
    """
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc(),
    )
    return (
        tf_idf(df, id_col, text_col, min_df=min_df)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            F.col("term").alias("top_term"),
            F.col("tfidf").alias("top_tfidf"),
        )
    )


def bm25_score(
    df: DataFrame,
    query_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every matching document to ``query_terms``.

    Returns ``(id, bm25)`` for documents containing at least one query
    term, rounded to 6 decimals. The literal query-term filter lands
    inside the explode projection (only matching postings shuffle), the
    per-query-term document frequencies aggregate that filtered slice,
    and N/avgdl come from one scalar aggregate over the corpus — three
    small aggregations, no driver collect, no full inverted index.
    """
    if not query_terms:
        raise ValueError("query_terms must be a non-empty sequence")
    terms = sorted(set(query_terms))
    # one corpus pass feeds everything per-doc: the document length rides
    # along with the exploded postings (no second scan + doc-level join
    # to fetch it back), and the literal query filter drops non-matching
    # postings before any shuffle
    toks = df.select(
        F.col(id_col),
        F.size(_tokens(text_col)).alias("dl"),
        _tokens(text_col).alias("_toks"),
    )
    postings = toks.select(
        F.col(id_col), "dl", F.explode("_toks").alias("term"),
    ).filter(F.col("term").isin(list(terms)))
    # per-(doc, term) tf over matching postings only; dl is constant
    # within the group
    tf = postings.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"),
    )
    # per-query-term document frequency: tf already holds one row per
    # (doc, term), so df is a count over it — the shuffle under tf's
    # aggregate is shared with the scoring branch via ReusedExchange
    # instead of re-scanning the corpus
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # corpus constants: N and average document length (exact-integer sum
    # over exact-integer lengths, divided once — identical doubles in any
    # engine)
    consts = toks.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        F.sum("dl").alias("_sum_dl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)),
    )
    avgdl = F.col("_sum_dl").cast("double") / F.col("_n_docs")
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl
    )
    per_term = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(consts))
        .groupBy(id_col)
        .agg(F.round(F.sum(per_term), 6).alias("bm25"))
    )
