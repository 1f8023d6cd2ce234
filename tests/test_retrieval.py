"""TF-IDF / BM25 retrieval operators vs pure-Python references."""

from __future__ import annotations

import math

import pytest

from sed_spark.ext import retrieval

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat"),
    (2, "fish swim"),
    (3, ""),
    (4, "  spaced   out  words "),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _toks(t):
    return [w for w in t.split(" ") if w]


def ref_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {i: _toks(t) for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfq = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        sc, hit = 0.0, False
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            hit = True
            idf = math.log(1 + (n - dfq[t] + 0.5) / (dfq[t] + 0.5))
            sc += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if hit:
            out[i] = round(sc, 6)
    return out


def ref_tfidf(docs):
    toks = {i: _toks(t) for i, t in docs}
    n = len(docs)
    df = {}
    for v in toks.values():
        for t in set(v):
            df[t] = df.get(t, 0) + 1
    out = {}
    for i, v in toks.items():
        for t in set(v):
            idf = math.log((n + 1) / (df[t] + 1)) + 1
            out[(i, t)] = round(v.count(t) * idf, 6)
    return out


def test_bm25_matches_reference(spark, docs_df):
    terms = ["the", "sat", "fish"]
    got = {
        r["doc_id"]: r["bm25"]
        for r in retrieval.bm25_score(docs_df, terms).collect()
    }
    assert got == ref_bm25(DOCS, terms)


def test_bm25_excludes_docs_without_any_query_term(spark, docs_df):
    got = retrieval.bm25_score(docs_df, ["fish"]).collect()
    assert {r["doc_id"] for r in got} == {2}


def test_bm25_duplicate_query_terms_collapse(spark, docs_df):
    once = {r["doc_id"]: r["bm25"]
            for r in retrieval.bm25_score(docs_df, ["sat"]).collect()}
    twice = {r["doc_id"]: r["bm25"]
             for r in retrieval.bm25_score(docs_df, ["sat", "sat"]).collect()}
    assert once == twice


def test_bm25_empty_query_raises(docs_df):
    with pytest.raises(ValueError, match="non-empty"):
        retrieval.bm25_score(docs_df, [])


def test_tf_idf_matches_reference(spark, docs_df):
    got = {
        (r["doc_id"], r["term"]): r["tfidf"]
        for r in retrieval.tf_idf(docs_df).collect()
    }
    assert got == ref_tfidf(DOCS)


def test_tf_idf_min_df_floors_vocabulary(spark, docs_df):
    got = retrieval.tf_idf(docs_df, min_df=2).collect()
    terms = {r["term"] for r in got}
    # only 'the' and 'sat' appear in >= 2 documents
    assert terms == {"the", "sat"}
    assert all(r["df"] >= 2 for r in got)


def test_top_term_argmax_and_tie_break(spark, docs_df):
    ref = ref_tfidf(DOCS)
    expected = {}
    for (i, t), w in ref.items():
        cur = expected.get(i)
        # highest rounded weight, then lexicographically smallest term
        if cur is None or (-w, t) < (-cur[1], cur[0]):
            expected[i] = (t, w)
    got = {
        r["doc_id"]: (r["top_term"], r["top_tfidf"])
        for r in retrieval.tf_idf_top_term(docs_df).collect()
    }
    assert got == expected
    # empty doc has no terms, hence no row
    assert 3 not in got


def test_doc_terms_skips_empty_tokens(spark, docs_df):
    rows = retrieval.doc_terms(docs_df).collect()
    assert all(r["term"] != "" for r in rows)
    got4 = sorted(r["term"] for r in rows if r["doc_id"] == 4)
    assert got4 == ["out", "spaced", "words"]
