"""Unit tests for the training-data extension operators (ext/)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sed_spark.ext import similarity


@pytest.fixture(scope="module")
def emb_df(spark):
    """60 random 16-dim vectors plus two planted near-duplicate pairs."""
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((60, 16)).astype(np.float32)
    vecs[50] = vecs[10] + 0.01 * rng.standard_normal(16).astype(np.float32)
    vecs[51] = vecs[20] + 0.01 * rng.standard_normal(16).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(60), "embedding": [list(map(float, v)) for v in vecs]})
    return spark.createDataFrame(pdf), vecs


def _np_cos(a, b):
    a, b = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_cosine_topk_matches_numpy(emb_df):
    df, vecs = emb_df
    q = [float(v) for v in vecs[10]]
    got = similarity.cosine_topk(df, q, k=5).collect()
    sims = np.round([_np_cos(v, q) for v in vecs], 6)
    order = np.lexsort((np.arange(60), -sims))[:5]
    assert [r.vec_id for r in got] == [int(i) for i in order]
    assert got[0].vec_id == 10  # self-match first
    assert got[1].vec_id == 50  # planted near-dup second


def test_expanded_scoring_mode_is_bit_identical(emb_df):
    # EXPANDED_SCORING swaps interpreted folds for flat codegen sums;
    # the two must produce IDENTICAL rows for every scoring family
    df, vecs = emb_df
    q = [float(v) for v in vecs[10]]
    cents = similarity.deterministic_planes(4, 16, seed=5)
    books = [
        [[((m * 100 + j * 10 + i) % 7 - 3) / 3.0 for i in range(4)]
         for j in range(4)]
        for m in range(4)
    ]
    los, his = similarity.sq8_fit(df)

    def snap():
        return {
            "cos": similarity.cosine_topk(df, q, k=5).collect(),
            "ivf": similarity.ivf_topk(df, cents, q, k=5, nprobe=2).collect(),
            "pq": similarity.pq_topk(df, books, q, k=5).collect(),
            "sq8": similarity.sq8_topk(df, los, his, q, k=5).collect(),
            "ivfpq": similarity.ivfpq_topk(
                df, cents, books, q, k=5, nprobe=2,
            ).collect(),
        }

    assert similarity.EXPANDED_SCORING is False  # suite-safe default
    fold = snap()
    similarity.EXPANDED_SCORING = True
    try:
        expanded = snap()
    finally:
        similarity.EXPANDED_SCORING = False
    assert fold == expanded


def test_embedding_near_dup_finds_planted_pairs(emb_df):
    df, _ = emb_df
    planes = similarity.deterministic_planes(16, 16, seed=5)
    pairs = {
        (r.a_id, r.b_id)
        for r in similarity.embedding_near_dup(
            df, planes=planes, n_bands=8, threshold=0.9,
        ).collect()
    }
    # near-identical vectors agree on every hyperplane sign, so banded LSH
    # cannot miss them, and nothing else is remotely that similar
    assert pairs == {(10, 50), (20, 51)}


def test_lsh_band_buckets_shape(emb_df):
    df, _ = emb_df
    planes = similarity.deterministic_planes(16, 16, seed=5)
    b = similarity.lsh_band_buckets(df, planes, n_bands=4)
    rows = b.collect()
    assert len(rows) == 60 * 4
    assert all(0 <= r.bucket < 16 for r in rows)
    # identical vectors land in identical buckets per band
    by_id = {(r.vec_id, r.band): r.bucket for r in rows}
    assert all(by_id[(10, band)] == by_id[(50, band)] for band in range(4))


def test_ivf_assign_matches_numpy_argmax(emb_df):
    df, vecs = emb_df
    cents = similarity.deterministic_planes(4, 16, seed=9)
    got = {r.vec_id: r.bucket for r in similarity.ivf_assign(df, cents).collect()}
    c = np.asarray(cents)
    sims = np.round(
        (vecs.astype(np.float64) @ c.T)
        / (np.linalg.norm(vecs.astype(np.float64), axis=1, keepdims=True)
           * np.linalg.norm(c, axis=1)),
        6,
    )
    want = sims.argmax(axis=1) + 1
    assert got == {i: int(want[i]) for i in range(60)}


def test_ivf_topk_subset_of_bucket(emb_df):
    df, vecs = emb_df
    cents = similarity.deterministic_planes(4, 16, seed=9)
    q = [float(v) for v in vecs[10]]
    got = similarity.ivf_topk(df, cents, q, k=5)
    rows = got.collect()
    assert 0 < len(rows) <= 5
    assert rows[0].vec_id == 10  # query vector is in its own probe bucket
    buckets = {r.vec_id: r.bucket for r in similarity.ivf_assign(df, cents).collect()}
    assert len({buckets[r.vec_id] for r in rows}) == 1  # single probed bucket


def test_batch_cosine_topk_matches_single_query(spark):
    import numpy as np

    from sed_spark.ext.similarity import batch_cosine_topk, cosine_topk

    rng = np.random.default_rng(3)
    rows = [(i, rng.standard_normal(8).astype("float32").tolist()) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"),
    )
    batch = batch_cosine_topk(df, q, k=5)
    got = {
        qid: [(r["vec_id"], r["cos_sim"]) for r in rows_]
        for qid, rows_ in (
            (qid, sorted(
                [r for r in batch.collect() if r["query_id"] == qid],
                key=lambda r: r["rank"],
            ))
            for qid in (0, 1)
        )
    }
    for qid in (0, 1):
        qvec = rows[qid][1]
        single = cosine_topk(df, qvec, k=5).collect()
        assert got[qid] == [(r["vec_id"], r["cos_sim"]) for r in single]


def test_batch_cosine_topk_prune_equals_no_prune(spark):
    import numpy as np

    from sed_spark.ext.similarity import batch_cosine_topk

    rng = np.random.default_rng(9)
    rows = [(i, rng.standard_normal(8).astype("float32").tolist()) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(7)
    q = df.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"),
    )
    a = sorted(map(tuple, batch_cosine_topk(df, q, k=4, prune=True).collect()))
    b = sorted(map(tuple, batch_cosine_topk(df, q, k=4, prune=False).collect()))
    assert a == b


def test_batch_cosine_topk_engines_bit_identical(spark):
    # the vectorized arrow scorer must reproduce the Column-expression
    # fold bit-for-bit (same dim-order accumulation, same HALF_UP round)
    import numpy as np

    from sed_spark.ext.similarity import batch_cosine_topk

    rng = np.random.default_rng(17)
    rows = [(i, rng.standard_normal(16).astype("float32").tolist()) for i in range(80)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(5)
    q = df.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"),
    )
    a = sorted(map(tuple, batch_cosine_topk(df, q, k=6, engine="arrow").collect()))
    b = sorted(map(tuple, batch_cosine_topk(df, q, k=6, engine="expr").collect()))
    assert a == b


def test_winnow_fingerprint_matches_python_reference(spark):
    import hashlib

    from sed_spark.ext.text import winnow_fingerprint

    def py_winnow(s, k=8, w=4):
        hs = [
            hashlib.md5(s[i:i + k].encode()).hexdigest()
            for i in range(max(len(s) - k + 1, 0))
        ]
        if len(hs) - w + 1 > 0:
            sel = [min(hs[j:j + w]) for j in range(len(hs) - w + 1)]
        else:
            sel = hs
        sel = sorted(set(sel))
        return hashlib.md5("".join(sel).encode()).hexdigest(), len(sel)

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "short",   # shorter than k: zero k-grams
        "exactly8",  # exactly one k-gram (fewer hashes than one window)
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["winnow_digest"], r["n_selected"])
        for r in winnow_fingerprint(df).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == py_winnow(t), f"doc {i}: {t!r}"


def test_winnow_shared_substring_guarantee(spark):
    # winnowing guarantee: a shared substring of length >= k + w - 1
    # yields overlapping selected hashes -> docs built around the same
    # long substring share selection content, so equal docs share digest
    from sed_spark.ext.text import winnow_fingerprint

    core = "a shared run of characters long enough to winnow"
    df = spark.createDataFrame(
        [(0, core), (1, core), (2, "completely different payload here")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r["winnow_digest"] for r in winnow_fingerprint(df).collect()}
    assert rows[0] == rows[1]
    assert rows[0] != rows[2]


def test_resize_stub_composes_with_decode(spark):
    from sed_spark.ext.multimodal import decode_stub, resize_stub, to_binary_payload

    df = to_binary_payload(
        spark.createDataFrame([(0, "hello"), (1, "")], ["doc_id", "text"]),
    )
    resized = resize_stub(df, target=(8, 4))
    rows = {r["doc_id"]: r for r in resized.collect()}
    assert all(r["width"] == 8 and r["height"] == 4 for r in rows.values())
    assert all(len(bytes(r["payload"])) == 32 for r in rows.values())
    # deterministic: same payload -> same resized bytes
    again = {r["doc_id"]: r for r in resize_stub(df, target=(8, 4)).collect()}
    assert bytes(rows[0]["payload"]) == bytes(again[0]["payload"])
    # binary output feeds straight back into the decode stage
    feats = decode_stub(resized)
    assert feats.count() == 2
    assert all(r["n_bytes"] == 32 for r in feats.collect())


def test_frame_sample_stub_expansion(spark):
    from sed_spark.ext.multimodal import frame_sample_stub, to_binary_payload

    text = "x" * 100  # 7 frames of 16 bytes -> sampled idx 0 and 4
    df = to_binary_payload(
        spark.createDataFrame([(0, text), (1, "")], ["doc_id", "text"]),
    )
    rows = frame_sample_stub(df, every=4, frame_bytes=16).collect()
    got = sorted((r["doc_id"], r["frame_idx"], r["n_frames"]) for r in rows)
    assert got == [(0, 0, 7), (0, 4, 7)]
    by_idx = {r["frame_idx"]: bytes(r["frame"]) for r in rows}
    assert by_idx[0] == b"x" * 16
    assert by_idx[4] == b"x" * 16


def test_frame_sample_stub_validates_args(spark):
    import pytest

    from sed_spark.ext.multimodal import frame_sample_stub, to_binary_payload

    df = to_binary_payload(
        spark.createDataFrame([(0, "abc")], ["doc_id", "text"]),
    )
    with pytest.raises(ValueError, match="every"):
        frame_sample_stub(df, every=0)
    with pytest.raises(ValueError, match="frame_bytes"):
        frame_sample_stub(df, frame_bytes=0)


def test_benchmark_contamination(spark):
    from sed_spark.ext.dedup import benchmark_contamination

    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "quick brown fox runs away from everything here"),
            (2, "completely unrelated text with no overlap at all"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "a quick brown fox story")], ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_hits"], r["is_contaminated"])
        for r in benchmark_contamination(corpus, bench, shingle_n=3).collect()
    }
    # shared 3-gram: "quick brown fox" appears in docs 0 and 1
    assert got[0] == (1, 1)
    assert got[1] == (1, 1)
    assert got[2] == (0, 0)


def test_kmeans_fit_recovers_planted_clusters(spark):
    import numpy as np

    from sed_spark.ext.similarity import ivf_assign, kmeans_fit

    rng = np.random.default_rng(5)
    # three tight angular clusters around orthogonal-ish directions
    dirs = np.eye(3, 8, dtype=np.float64) * 10
    rows = []
    for i in range(90):
        c = i % 3
        v = dirs[c] + 0.1 * rng.standard_normal(8)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = kmeans_fit(df, k=3, max_iter=8)
    assert len(cents) == 3 and len(cents[0]) == 8
    # every vector lands in the same bucket as the others of its cluster
    got = {r["vec_id"]: r["bucket"] for r in ivf_assign(df, cents).collect()}
    for c in range(3):
        buckets = {got[i] for i in range(90) if i % 3 == c}
        assert len(buckets) == 1, f"cluster {c} split across {buckets}"
    # and the three planted clusters map to three distinct buckets
    assert len({got[0], got[1], got[2]}) == 3


def test_kmeans_fit_deterministic(spark):
    import numpy as np

    from sed_spark.ext.similarity import kmeans_fit

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.standard_normal(6)]) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).repartition(5)
    a = kmeans_fit(df, k=4, max_iter=5)
    b = kmeans_fit(df, k=4, max_iter=5)
    assert a == b


def test_ivf_topk_nprobe_recall_increases(spark, emb_df):
    # nprobe = all buckets degrades to the exact scan, so its result must
    # equal brute-force top-k; nprobe=1 returns a subset of one bucket
    from sed_spark.ext.similarity import cosine_topk, deterministic_planes, ivf_topk

    df, vecs = emb_df
    cents = deterministic_planes(4, 16, seed=9)
    q = [float(v) for v in vecs[10]]
    exact = [(r.vec_id, r.cos_sim) for r in cosine_topk(df, q, k=5).collect()]
    full_probe = [
        (r.vec_id, r.cos_sim)
        for r in ivf_topk(df, cents, q, k=5, nprobe=len(cents)).collect()
    ]
    assert full_probe == exact
    one_probe = ivf_topk(df, cents, q, k=5, nprobe=1).collect()
    assert 0 < len(one_probe) <= 5
    assert set(r.vec_id for r in one_probe) <= set(range(60))


def test_benchmark_contamination_short_docs_get_rows(spark):
    from sed_spark.ext.dedup import benchmark_contamination

    corpus = spark.createDataFrame(
        [(0, "one two"), (1, "the quick brown fox here")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(9, "quick brown fox")], ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_grams"], r["n_hits"], r["hit_frac"], r["is_contaminated"])
        for r in benchmark_contamination(corpus, bench, shingle_n=3).collect()
    }
    # doc 0 is shorter than one shingle: zero grams, clean, but PRESENT
    assert got[0] == (0, 0, 0.0, 0)
    assert got[1][1] >= 1 and got[1][3] == 1


def test_batch_cosine_topk_empty_queries(spark):
    from sed_spark.ext.similarity import batch_cosine_topk

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], ["vec_id", "embedding"],
    )
    q = df.filter(F.col("vec_id") > 99).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"),
    )
    out = batch_cosine_topk(df, q, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "vec_id", "cos_sim", "rank"]


def test_n_words_messy_whitespace(spark):
    # round-3 verdict: the length-arithmetic word count inflated on
    # consecutive/leading/trailing spaces and returned 1 for ""
    from sed_spark.ext import text

    docs = spark.createDataFrame(
        [
            (0, "a  b"), (1, " lead"), (2, "trail "), (3, ""),
            (4, "   "), (5, "one"), (6, "a b  c   d"),
        ],
        ["doc_id", "text"],
    )
    m = {r.doc_id: r for r in text.metrics(docs).collect()}
    assert [m[i].n_words for i in range(7)] == [2, 1, 1, 0, 0, 1, 4]
    # wordless docs get NULL ratios, not a divide-by-zero
    assert m[3].avg_word_len is None and m[4].stopword_ratio is None
    assert m[5].avg_word_len == 3.0
    q = {r.doc_id: r for r in text.quality_features(docs).collect()}
    assert [q[i].n_words for i in range(7)] == [2, 1, 1, 0, 0, 1, 4]
    t = {r.doc_id: r for r in text.token_stats(docs).collect()}
    assert [t[i].ws_tokens for i in range(7)] == [2, 1, 1, 0, 0, 1, 4]


def test_batch_cosine_topk_zero_norm_consistent(spark):
    # zero-norm vectors must be excluded identically by both engines
    # (numpy lexsort ranks NaN last; the window DESC ranked NaN first)
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((20, 8)).tolist()
    vecs[7] = [0.0] * 8  # zero-norm corpus row
    corpus = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(20), "embedding": vecs}),
    )
    queries = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": [0, 1],
                "query_vec": [vecs[3], [0.0] * 8],  # one zero-norm query
            },
        ),
    )
    out = {}
    for engine in ("arrow", "expr"):
        rows = similarity.batch_cosine_topk(
            corpus, queries, k=5, engine=engine,
        ).collect()
        out[engine] = sorted(
            (r.query_id, r.vec_id, r.cos_sim, r.rank) for r in rows
        )
    assert out["arrow"] == out["expr"]
    got_ids = {r[1] for r in out["arrow"]}
    assert 7 not in got_ids  # zero-norm corpus row never a candidate
    assert {r[0] for r in out["arrow"]} == {0}  # zero-norm query: no rows


def test_incremental_dedup_against_seen_corpus(spark):
    from sed_spark.ext.dedup import exact_dedup, incremental_dedup

    existing = spark.createDataFrame(
        [(0, "alpha"), (1, "beta")], ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            (10, "alpha"),   # already in the corpus -> dropped
            (11, "gamma"),   # fresh
            (12, "gamma"),   # within-batch duplicate -> one canonical
            (13, "delta"),   # fresh
        ],
        ["doc_id", "text"],
    )
    seen = exact_dedup(existing).select("text_hash")
    got = {
        r["keep_id"]: r["group_size"]
        for r in incremental_dedup(new, seen).collect()
    }
    assert got == {11: 2, 13: 1}
    # the surviving hashes ARE the delta for the next increment
    nxt = incremental_dedup(
        new, seen.unionAll(incremental_dedup(new, seen).select("text_hash")),
    )
    assert nxt.count() == 0


def test_ivf_written_index_partition_pruned(spark, tmp_path, emb_df):
    # the written index turns nprobe into IO savings: the probe must read
    # ONLY the probed bucket directories, and return exactly what the
    # in-plan ivf_topk filter returns
    df, vecs = emb_df
    cents = similarity.deterministic_planes(4, 16, seed=9)
    path = str(tmp_path / "ivf_index")
    similarity.ivf_write_index(df, cents, path)

    q = [float(v) for v in vecs[5]]
    probed = similarity.ivf_probe_index(spark, path, cents, q, k=5)
    want = similarity.ivf_topk(df, cents, q, k=5).collect()
    assert probed.collect() == want

    # partition pruning: the bucket predicate must land in the scan's
    # PartitionFilters (planning-time directory elimination), not a
    # post-scan Filter (inputFiles() can't show this — it lists the
    # relation's files before pruning)
    probes = similarity._rank_probes(cents, q, 1, 6)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and f"= {probes[0]})" in pf[0]
    # and the data filter side must NOT re-filter on bucket
    assert "PushedFilters: []" in pf[0] or "bucket" not in (
        pf[0].split("PushedFilters:")[-1]
    )


def test_pack_sequences_matches_python_reference(spark):
    # concat-and-chunk packing: pack/offset of each document's first
    # token must equal the single-stream prefix-sum reference, across
    # bucket seams (the two-phase distributed prefix sum is exact)
    from sed_spark.ext.text import pack_sequences

    rng = np.random.default_rng(5)
    toks = [int(t) for t in rng.integers(1, 900, size=300)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], ["doc_id", "n_tok"],
    )
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"])
        for r in pack_sequences(
            df.repartition(7), "n_tok", budget=1024, n_buckets=13,
        ).collect()
    }
    start = 0
    for i, t in enumerate(toks):
        assert got[i] == (start // 1024, start % 1024), i
        start += t
    # offsets always inside the pack
    assert all(0 <= off < 1024 for _, off in got.values())


def test_pack_sequences_empty_and_validation(spark):
    import pytest

    from sed_spark.ext.text import pack_sequences

    df = spark.createDataFrame([], "doc_id bigint, n_tok int")
    out = pack_sequences(df, "n_tok", budget=64)
    assert out.count() == 0
    assert {"pack_id", "pack_offset"} <= set(out.columns)
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, "n_tok", budget=0)


def test_verify_pairs_editdist_matches_python(spark):
    from sed_spark.ext.dedup import verify_pairs_editdist

    def lev(a, b):
        # classic Wagner-Fischer
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    texts = ["kitten", "sitting", "kitten!", "totally different words here"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"],
    )
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], ["a_id", "b_id"],
    )
    got = {(r["a_id"], r["b_id"]): r["edit_dist"]
           for r in verify_pairs_editdist(pairs, docs).collect()}
    assert got == {(0, i): lev(texts[0], texts[i]) for i in (1, 2, 3)}
    # banded variant: pairs above the bound are dropped (JVM early-exit)
    kept = {(r["a_id"], r["b_id"])
            for r in verify_pairs_editdist(pairs, docs, max_dist=3).collect()}
    assert kept == {(0, 1), (0, 2)}
    # keep_exceeded annotates instead of dropping: -1 sentinel past bound
    ann = {(r["a_id"], r["b_id"]): r["edit_dist"]
           for r in verify_pairs_editdist(
               pairs, docs, max_dist=3, keep_exceeded=True).collect()}
    assert ann[(0, 3)] == -1 and ann[(0, 1)] == 3


def test_normalize_text_expr(spark):
    from sed_spark.ext.dedup import normalize_text_expr

    rows = [
        (0, "Hello,   World!"),
        (1, "hello world"),
        (2, "  HELLO ... world  "),
        (3, "different"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["nt"]
           for r in df.select(
               "doc_id", normalize_text_expr(F.col("text")).alias("nt"),
           ).collect()}
    assert got[0] == got[1] == got[2] == "hello world"
    assert got[3] == "different"


def _np_semdedup(vecs, centroids, threshold, keep):
    """Pure-numpy reference for semantic_dedup's dominance semantics."""
    cents = np.asarray(centroids, dtype=np.float64)
    v = np.asarray(vecs, dtype=np.float64)
    sims = np.round(
        v @ cents.T
        / (np.linalg.norm(v, axis=1)[:, None] * np.linalg.norm(cents, axis=1)),
        6,
    )
    bucket = sims.argmax(axis=1)
    cent_sim = sims[np.arange(len(v)), bucket]
    out = {}
    for a in range(len(v)):
        dropped = False
        for b in range(len(v)):
            if a == b or bucket[a] != bucket[b]:
                continue
            if keep == "min_id":
                dom = b < a
            else:
                dom = cent_sim[b] < cent_sim[a] or (
                    cent_sim[b] == cent_sim[a] and b < a
                )
            if dom and round(_np_cos(v[a], v[b]), 6) >= threshold:
                dropped = True
                break
        out[a] = (int(bucket[a]) + 1, 0 if dropped else 1)
    return out


@pytest.mark.parametrize("keep", ["min_id", "far_from_centroid"])
def test_semantic_dedup_matches_numpy(emb_df, keep):
    df, vecs = emb_df
    cents = similarity.deterministic_planes(4, 16, seed=5)
    got = {
        r["vec_id"]: (r["cluster"], r["is_kept"])
        for r in similarity.semantic_dedup(
            df, cents, threshold=0.9, keep=keep,
        ).collect()
    }
    assert got == _np_semdedup(vecs, cents, 0.9, keep)
    # the planted near-dups (50≈10, 51≈20) must lose to their originals
    # whenever they landed in the same cluster with min_id priority
    if keep == "min_id":
        for dup, orig in ((50, 10), (51, 20)):
            if got[dup][0] == got[orig][0]:
                assert got[orig][1] == 1
                assert got[dup][1] == 0


def test_semantic_dedup_far_from_centroid_keeps_atypical(spark):
    # two same-cluster near-identical docs: the one FARTHER from the
    # centroid must win under the paper's policy even with the higher id
    cents = [[1.0, 0.0, 0.0, 0.0]]
    rows = [
        (0, [1.0, 0.01, 0.0, 0.0]),   # very typical
        (1, [1.0, 0.09, 0.0, 0.0]),   # same dup group, less typical
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["is_kept"]
        for r in similarity.semantic_dedup(
            df, cents, threshold=0.99, keep="far_from_centroid",
        ).collect()
    }
    assert got == {0: 0, 1: 1}
    # min_id keeps the other one
    got2 = {
        r["vec_id"]: r["is_kept"]
        for r in similarity.semantic_dedup(
            df, cents, threshold=0.99, keep="min_id",
        ).collect()
    }
    assert got2 == {0: 1, 1: 0}


def test_semantic_dedup_rejects_unknown_policy(emb_df):
    df, _ = emb_df
    with pytest.raises(ValueError, match="keep policy"):
        similarity.semantic_dedup(df, [[1.0] * 16], keep="nope")
    with pytest.raises(ValueError, match="keep policy"):
        similarity.semantic_dedup_multi(df, [[1.0] * 16], keeps=("nope",))


def test_semantic_dedup_multi_matches_per_policy(emb_df):
    # the shared-pass variant must be row-identical to per-policy
    # semantic_dedup under BOTH policies (it is an optimization of the
    # pair join, not a different dominance rule)
    df, _ = emb_df
    cents = similarity.deterministic_planes(4, 16, seed=5)
    multi = similarity.semantic_dedup_multi(
        df, cents, threshold=0.9, keeps=("min_id", "far_from_centroid"),
    )
    for keep in ("min_id", "far_from_centroid"):
        single = {
            r["vec_id"]: (r["cluster"], r["is_kept"])
            for r in similarity.semantic_dedup(
                df, cents, threshold=0.9, keep=keep,
            ).collect()
        }
        shared = {
            r["vec_id"]: (r["cluster"], r["is_kept"])
            for r in multi[keep].collect()
        }
        assert shared == single


def test_semantic_contamination_flags_and_argmax(spark):
    import numpy as np

    rows = [
        (0, [1.0, 0.0, 0.0]),    # = bench 10 -> cos 1.0
        (1, [0.0, 1.0, 0.0]),    # = bench 11 -> cos 1.0
        (2, [0.9, 0.1, 0.0]),    # near bench 10
        (3, [0.0, 0.0, 1.0]),    # orthogonal to both -> clean
        (10, [1.0, 0.0, 0.0]),   # the benchmark members themselves
        (11, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bench = df.filter("vec_id >= 10")
    got = {
        r.vec_id: r
        for r in similarity.semantic_contamination(
            df, bench, threshold=0.95,
        ).collect()
    }
    assert len(got) == 6
    # numpy oracle: max cosine + argmax (ties -> lowest bench id)
    vecs = {i: np.array(v) for i, v in rows}
    for i, v in vecs.items():
        cos = {
            b: round(float(v @ vecs[b] / (np.linalg.norm(v) * np.linalg.norm(vecs[b]))), 6)
            for b in (10, 11)
        }
        best = max(sorted(cos), key=lambda b: (cos[b], -b))
        assert got[i].bench_id == best, i
        assert got[i].max_cos_bench == cos[best], i
        assert got[i].is_contaminated == int(cos[best] >= 0.95), i
    assert got[0].is_contaminated == 1
    assert got[3].is_contaminated == 0
    assert got[10].is_contaminated == 1  # bench members self-match

    # empty benchmark: every row kept, NULL scores, flag 0
    empty = bench.filter("vec_id < 0")
    kept = similarity.semantic_contamination(df, empty).collect()
    assert len(kept) == 6
    assert all(r.is_contaminated == 0 and r.max_cos_bench is None for r in kept)


def _np_classifier(texts, weights, bias=0.0):
    import hashlib
    import math

    out = []
    for t in texts:
        toks = [w for w in t.lower().split(" ") if w]
        if toks:
            mean_w = sum(
                weights[int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
                        % len(weights)]
                for w in toks
            ) / len(toks)
        else:
            mean_w = 0.0
        out.append(round(1.0 / (1.0 + math.exp(-(bias + mean_w))), 6))
    return out


def test_classifier_score_matches_python(spark):
    from sed_spark.ext import text

    rows = [
        (0, "the quick brown fox"),
        (1, "THE QUICK brown  fox"),   # case/whitespace-normalized = same score
        (2, ""),                        # wordless -> sigmoid(bias)
        (3, "völlig unmöglich ascii-free tökens"),
        (4, "one"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    w = text.hashed_weights(64, seed=3)
    expect = _np_classifier([t for _, t in rows], w, bias=0.25)
    got = {
        r.doc_id: r.quality_score
        for r in text.classifier_score(docs, w, bias=0.25).collect()
    }
    assert [got[i] for i in range(5)] == expect
    assert got[0] == got[1]
    import math
    assert got[2] == round(1 / (1 + math.exp(-0.25)), 6)


def test_classifier_score_engines_agree(spark):
    from sed_spark.ext import text

    rng = np.random.default_rng(9)
    docs = spark.createDataFrame(
        [
            (i, " ".join(rng.choice(["alpha", "beta", "gamma", "delta",
                                     "x1", "y2"], size=rng.integers(0, 12))))
            for i in range(40)
        ],
        ["doc_id", "text"],
    )
    w = text.hashed_weights(32)
    lit = {r.doc_id: r.quality_score
           for r in text.classifier_score(docs, w, engine="literal").collect()}
    join = {r.doc_id: r.quality_score
            for r in text.classifier_score(docs, w, engine="join").collect()}
    assert lit == join
    with pytest.raises(ValueError, match="engine"):
        text.classifier_score(docs, w, engine="nope")


def test_strip_boilerplate_c4_line_dedup(spark):
    from sed_spark.ext import dedup

    docs = spark.createDataFrame(
        [
            (0, "unique zero\ncookie notice\nmore zero"),
            (1, "cookie notice\nunique one"),
            (2, "unique two\ncookie notice"),
            (3, "cookie notice"),            # fully boilerplate -> ""
            (4, "all mine\nstill mine"),
            (5, ""),                          # empty doc survives empty
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.text
        for r in dedup.strip_boilerplate(docs, min_docs=2).collect()
    }
    assert got == {
        0: "unique zero\nmore zero",
        1: "unique one",
        2: "unique two",
        3: "",
        4: "all mine\nstill mine",
        5: "",   # its single empty line is shared with doc 3's absence? no:
                 # "" appears only in doc 5 -> kept, and rejoins to ""
    }


def test_strip_boilerplate_preserves_line_order_and_duplicate_lines(spark):
    from sed_spark.ext import dedup

    # within-doc duplicate lines are NOT cross-document boilerplate;
    # order must be positional, not lexicographic
    docs = spark.createDataFrame(
        [(0, "b\na\nb\nzz"), (1, "zz\nother")],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.text
        for r in dedup.strip_boilerplate(docs, min_docs=2).collect()
    }
    assert got == {0: "b\na\nb", 1: "other"}


def test_boilerplate_stats_matches_python(spark):
    from sed_spark.ext import dedup

    texts = {
        0: "the quick brown fox jumps over dog",
        1: "the quick brown cat naps all day",
        2: "the quick brown fox jumps again now",
        3: "completely different words here only once",
        4: "x",   # shorter than one shingle -> zero grams
    }
    docs = spark.createDataFrame(
        list(texts.items()), ["doc_id", "text"],
    )
    n, min_docs = 3, 2
    gram_sets = {
        i: {
            " ".join(ws[j:j + n])
            for ws in [t.split()]
            for j in range(len(ws) - n + 1)
        }
        for i, t in texts.items()
    }
    from collections import Counter
    df_counts = Counter(g for s in gram_sets.values() for g in s)
    expect = {}
    for i, s in gram_sets.items():
        nb = sum(1 for g in s if df_counts[g] >= min_docs)
        expect[i] = (
            len(s), nb, round(nb / len(s), 6) if s else 0.0,
        )
    got = {
        r.doc_id: (r.n_grams, r.n_bp, r.bp_frac)
        for r in dedup.boilerplate_stats(
            docs, shingle_n=n, min_docs=min_docs,
        ).collect()
    }
    assert got == expect
    assert got[4] == (0, 0, 0.0)
    # "the quick brown" is in 3 docs -> boilerplate for all three
    assert all(got[i][1] >= 1 for i in (0, 1, 2))
    assert got[3][1] == 0


def test_duplicate_spans_interval_union(spark):
    from sed_spark.ext import dedup

    # docs 0 and 1 share the run "a b c d" (two overlapping 3-windows:
    # [0,3) and [1,4) -> one merged island covering 4 tokens) and the
    # disjoint window "x y z"; doc 2 shares nothing.
    docs = spark.createDataFrame(
        [
            (0, "a b c d q q q x y z"),
            (1, "p a b c d p p x y z"),
            (2, "m n o m n o m n o m"),  # self-repeats only: not cross-doc
            (3, "t u"),                   # shorter than the window
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (
            r.n_tokens, r.n_windows, r.n_dup_windows,
            r.covered_tokens, r.dup_span_frac,
        )
        for r in dedup.duplicate_spans(docs, window=3, min_docs=2).collect()
    }
    # doc 0: dup windows at pos 0,1 ("a b c","b c d") and pos 7 ("x y z")
    #   islands [0,4) + [7,10) -> 7 covered tokens of 10
    assert got[0] == (10, 8, 3, 7, 0.7)
    # doc 1: dup windows at pos 1,2 and pos 7 -> [1,5) + [7,10) -> 7
    assert got[1] == (10, 8, 3, 7, 0.7)
    # doc 2: its windows repeat within the doc only -> distinct-doc df is 1
    assert got[2] == (10, 8, 0, 0, 0.0)
    # doc 3: no windows at all
    assert got[3] == (2, 0, 0, 0, 0.0)


def test_dsir_fit_and_score_match_python(spark):
    import hashlib
    import math

    from sed_spark.ext import text

    target_rows = [(0, "a b a b"), (1, "a b c")]
    raw_rows = [(0, "a b a b"), (1, "a b c"), (2, "c d e f"), (3, "f g")]
    dim = 16

    def grams(t):
        w = t.split(" ")
        return [f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % dim

    def counts(rows):
        c = {}
        for _, t in rows:
            for g in grams(t):
                b = bucket(g)
                c[b] = c.get(b, 0) + 1
        return c

    ct, cr = counts(target_rows), counts(raw_rows)
    tot_t, tot_r = sum(ct.values()) + dim, sum(cr.values()) + dim
    expect_ratios = [
        math.log((ct.get(b, 0) + 1) / tot_t)
        - math.log((cr.get(b, 0) + 1) / tot_r)
        for b in range(dim)
    ]

    tgt = spark.createDataFrame(target_rows, ["doc_id", "text"])
    raw = spark.createDataFrame(raw_rows, ["doc_id", "text"])
    got_ratios = text.dsir_fit(tgt, raw, dim=dim)
    assert got_ratios == expect_ratios  # exact: integer counts + same log

    got = {
        r.doc_id: (r.n_feats, r.dsir_logweight)
        for r in text.dsir_score(raw, got_ratios).collect()
    }
    for i, t in raw_rows:
        gs = grams(t)
        acc = 0.0
        for g in gs:  # left-to-right fold, matching the aggregate HOF
            acc += expect_ratios[bucket(g)]
        assert got[i] == (len(gs), round(acc, 6))
    # target-like docs must outweigh off-target docs
    assert got[0][1] > got[2][1] and got[1][1] > got[3][1]


def test_vocab_tokenizer_support_ops(spark):
    from sed_spark.ext import vocab

    docs = spark.createDataFrame(
        [
            (0, "aa bb aa"),
            (1, "aa cc"),
            (2, "dd"),
            (3, "e e e"),  # single-char word: no pairs
        ],
        ["doc_id", "text"],
    )
    v = {r.word: (r.tf, r.df) for r in vocab.word_doc_freq(docs).collect()}
    assert v == {
        "aa": (3, 2), "bb": (1, 1), "cc": (1, 1), "dd": (1, 1), "e": (3, 1),
    }

    # pair counts are tf-weighted over the VOCAB (aa->'aa' tf 3, bb 1, ...)
    pc = {r.pair: r.cnt for r in vocab.bpe_pair_counts(docs).collect()}
    assert pc == {"aa": 3, "bb": 1, "cc": 1, "dd": 1}

    vd = {
        r.doc_id: (r.rarest_word_df, r.df_sum)
        for r in vocab.vocab_doc_stats(docs).collect()
    }
    # doc 0 distinct words {aa, bb}: min df 1, sum 3; doc 3 {e}: (1, 1)
    assert vd == {0: (1, 3), 1: (1, 3), 2: (1, 1), 3: (1, 1)}

    tp = {
        r.doc_id: (r.top_pair, r.top_pair_count)
        for r in vocab.doc_top_pair(docs).collect()
    }
    # doc 0: 'aa' appears twice (two occurrences of the word), 'bb' once
    assert tp == {0: ("aa", 2), 1: ("aa", 1), 2: ("dd", 1), 3: ("", 0)}


def _py_bpe_train(word_tf, n_merges):
    """Pure-Python Sennrich-style reference (no end-of-word marker)."""
    sym = {w: [c for c in w] for w in word_tf}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, tf in word_tf.items():
            s = sym[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + tf
        if not counts:
            break
        top = max(counts.items(), key=lambda kv: (kv[1], [-ord(c) for c in kv[0][0]], ))
        # deterministic: max count, then lexicographically smallest (l, r)
        best_cnt = max(counts.values())
        cands = sorted(p for p, c in counts.items() if c == best_cnt)
        a, b = cands[0]
        merges.append((a, b))
        for w in sym:
            s, out = sym[w], []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            sym[w] = out
    return merges, sym


def test_bpe_train_matches_python_reference(spark):
    from sed_spark.ext import vocab

    docs = spark.createDataFrame(
        [
            (0, "low lower low"),
            (1, "lowest low newer"),
            (2, "wider new newer"),
        ],
        ["doc_id", "text"],
    )
    word_tf = {}
    for _, t in [(0, "low lower low"), (1, "lowest low newer"),
                 (2, "wider new newer")]:
        for w in t.split(" "):
            word_tf[w] = word_tf.get(w, 0) + 1

    for k in (1, 3, 6):
        expect_merges, expect_sym = _py_bpe_train(dict(word_tf), k)
        got = vocab.bpe_train(docs, n_merges=k)
        assert got == expect_merges, f"k={k}"

    merges, expect_sym = _py_bpe_train(dict(word_tf), 6)
    counts = {
        r.doc_id: r.n_bpe_tokens
        for r in vocab.bpe_token_counts(docs, merges).collect()
    }
    def doc_count(t):
        return sum(len(expect_sym[w]) for w in t.split(" "))
    assert counts == {
        0: doc_count("low lower low"),
        1: doc_count("lowest low newer"),
        2: doc_count("wider new newer"),
    }

    # overlap semantics: [a,a,a] + merge (a,a) -> [aa, a]
    d2 = spark.createDataFrame([(0, "aaa")], ["doc_id", "text"])
    m = vocab.bpe_train(d2, n_merges=1)
    assert m == [("a", "a")]
    c2 = vocab.bpe_token_counts(d2, m).collect()
    assert c2[0].n_bpe_tokens == 2

    import pytest as _pytest
    with _pytest.raises(ValueError, match="n_merges"):
        vocab.bpe_train(docs, n_merges=0)


def test_bpe_train_local_engine_matches_distributed(spark):
    # both merge-loop engines must emit the identical merge list; the
    # local path (vocab fits local_vocab_threshold) must also cost a
    # CONSTANT number of Spark jobs, vs ~2 per merge for the distributed
    # loop — that's its reason to exist (32k merges = ~64k round-trips)
    from sed_spark.ext import vocab

    rows = [
        (i, " ".join(f"tok{j % 17}ab repeat{j % 5}" for j in range(i + 3)))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    # count jobs via a dedicated job group: in a shared module-scoped
    # session, unrelated async jobs (AQE / broadcast cleanup from earlier
    # tests) land between two getJobIdsForGroup(None) reads and inflate
    # the delta — counting only our group's ids is race-free
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def run_grouped(group: str, fn):
        sc.setJobGroup(group, group)
        try:
            out = fn()
        finally:
            sc.setJobGroup("", "")
        return out, len(tracker.getJobIdsForGroup(group))

    local, local_jobs = run_grouped(
        "bpe-local", lambda: vocab.bpe_train(docs, n_merges=10),
    )
    dist, dist_jobs = run_grouped(
        "bpe-dist",
        lambda: vocab.bpe_train(docs, n_merges=10, local_vocab_threshold=0),
    )

    assert local == dist
    assert len(local) == 10
    # local path: the limit-probe collect only (plus at most a couple of
    # planning jobs); distributed: >= 2 jobs per merge
    assert local_jobs <= 4, local_jobs
    assert dist_jobs >= 20, dist_jobs

    # an over-threshold vocabulary falls back to the distributed loop
    # and still produces the same merges
    assert vocab.bpe_train(docs, n_merges=10, local_vocab_threshold=3) == dist

    # tie-break parity on an adversarial corpus: many equal-count pairs
    tie_docs = spark.createDataFrame(
        [(0, "ab cd ef gh"), (1, "cd ef gh ab")], ["doc_id", "text"],
    )
    assert vocab.bpe_train(tie_docs, n_merges=4) == vocab.bpe_train(
        tie_docs, n_merges=4, local_vocab_threshold=0,
    )


def test_bpe_encode_matches_python_reference(spark):
    from sed_spark.ext import vocab

    docs = spark.createDataFrame(
        [(0, "low lower low"), (1, "lowest low newer"), (2, "wider new newer")],
        ["doc_id", "text"],
    )
    merges = vocab.bpe_train(docs, n_merges=6)
    v = vocab.word_doc_freq(docs)
    sym2id = vocab.bpe_vocab(v, merges)

    def py_apply(word):
        s = list(word)
        for a, b in merges:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return s

    want = {
        r["doc_id"]: [
            sym2id[t] for w in r["text"].split(" ") for t in py_apply(w)
        ]
        for r in docs.collect()
    }
    got = {
        r["doc_id"]: list(r["token_ids"])
        for r in vocab.bpe_encode(docs, merges).collect()
    }
    assert got == want
    # id space: base alphabet first (sorted), merges after, contiguous
    n_chars = len({c for r in docs.collect() for c in r["text"] if c != " "})
    assert set(sym2id.values()) == set(range(n_chars + len(
        {a + b for a, b in merges},
    )))
    # round-trip: ids -> symbols -> concatenation recovers the text sans
    # spaces (the id map is injective on the used symbols)
    id2sym = {i: s for s, i in sym2id.items()}
    for r in docs.collect():
        toks = got[r["doc_id"]]
        assert "".join(id2sym[t] for t in toks) == r["text"].replace(" ", "")

    # OOV contract: a word absent from an explicit vocab table encodes
    # as a single unk_id IN PLACE (never silently dropped); in-vocab
    # words whose chars are in the foreign alphabet encode normally
    foreign = spark.createDataFrame(
        [("low", 1, 1), ("zzz", 1, 1)], ["word", "tf", "df"],
    )
    unk = {
        r["doc_id"]: list(r["token_ids"])
        for r in vocab.bpe_encode(
            docs, [], vocab=foreign, unk_id=-9,
        ).collect()
    }
    # doc 0 = "low lower low": the bare "low"s are 3 single chars each
    # (all in foreign's alphabet l,o,w,z); "lower" is not a foreign
    # vocab word -> exactly one -9 in the middle slot
    assert unk[0][:3] == unk[0][4:] and len(unk[0]) == 7
    assert unk[0][3] == -9
    # empty text encodes to an empty array
    empty = vocab.bpe_encode(
        spark.createDataFrame([(7, "")], ["doc_id", "text"]), merges,
    ).collect()
    assert empty[0]["token_ids"] == []


def test_chunk_documents_overlap_and_clamping(spark):
    from sed_spark.ext import text

    words20 = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(0, words20), (1, "a b c"), (2, "solo")],
        ["doc_id", "text"],
    )
    rows = text.chunk_documents(
        docs, chunk_tokens=8, overlap=2,
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for v in by_doc.values():
        v.sort(key=lambda r: r.chunk_idx)

    # doc 0: 20 tokens, stride 6 -> starts 0, 6, 12 -> 3 chunks
    w = words20.split(" ")
    assert [r.n_chunks for r in by_doc[0]] == [3, 3, 3]
    assert by_doc[0][0].chunk_text == " ".join(w[0:8])
    assert by_doc[0][1].chunk_text == " ".join(w[6:14])
    assert by_doc[0][2].chunk_text == " ".join(w[12:20])  # clamped to end
    assert by_doc[0][2].n_chunk_tokens == 8
    # consecutive chunks share exactly `overlap` tokens
    assert by_doc[0][0].chunk_text.split(" ")[-2:] == w[6:8]

    # short docs: one chunk, whole text
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk_text == "a b c"
    assert by_doc[1][0].n_chunk_tokens == 3
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "solo"

    import pytest as _pytest
    with _pytest.raises(ValueError, match="overlap"):
        text.chunk_documents(docs, chunk_tokens=8, overlap=8)
    with _pytest.raises(ValueError, match="chunk_tokens"):
        text.chunk_documents(docs, chunk_tokens=0)


def test_incremental_lsh_pairs_match_batch_restriction(spark):
    from sed_spark.ext import dedup

    # word-soup docs with planted near-dups across the even/odd boundary
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (0, base),
            (1, base + " extra"),            # near-dup of 0 (new batch)
            (2, "completely different words here nothing shared at all"),
            (3, base + " tail"),             # near-dup of 0/1 (new batch)
            (4, "completely different words here nothing shared at all"),
            (5, "another unrelated document with its own vocabulary set"),
        ],
        ["doc_id", "text"],
    )
    sigs = dedup.minhash_signatures(docs, n_bands=4)
    batch = {
        (r.a_id, r.b_id)
        for r in dedup.lsh_candidate_pairs(sigs, n_bands=4).collect()
    }
    index = dedup.melt_bands(sigs.filter(F.col("doc_id") % 2 == 0), n_bands=4)
    inc = {
        (r.a_id, r.b_id)
        for r in dedup.incremental_lsh_pairs(
            sigs.filter(F.col("doc_id") % 2 == 1), index, n_bands=4,
        ).collect()
    }
    # incremental = batch pairs touching at least one odd (new) doc
    assert inc == {p for p in batch if p[0] % 2 == 1 or p[1] % 2 == 1}
    assert (0, 1) in inc and (1, 3) in inc     # cross and within-batch
    assert (2, 4) in batch and (2, 4) not in inc  # old-old pair excluded


def test_lm_familiarity_integer_exact(spark):
    from sed_spark.ext import vocab

    ref = spark.createDataFrame(
        [(0, "a b a b c"), (2, "a b x")],
        ["doc_id", "text"],
    )
    # reference LM bigram counts: "a b"x3, "b a"x1, "b c"x1, "b x"x1
    lm = {r.g: r.cnt for r in vocab.bigram_counts(ref).collect()}
    assert lm == {"a b": 3, "b a": 1, "b c": 1, "b x": 1}

    new = spark.createDataFrame(
        [
            (1, "a b c"),     # "a b"(3) seen, "b c"(1) seen -> sum 4
            (3, "z q a b"),   # "z q","q a" unseen, "a b" seen -> 2 unseen
            (5, "solo"),      # no bigrams
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.n_bigrams, r.n_unseen, r.seen_cnt_sum)
        for r in vocab.lm_familiarity(
            new, vocab.bigram_counts(ref),
        ).collect()
    }
    assert got == {1: (2, 0, 4), 3: (3, 2, 3), 5: (0, 0, 0)}


def test_strip_duplicate_spans_removes_covered_tokens(spark):
    from sed_spark.ext import dedup

    docs = spark.createDataFrame(
        [
            (0, "a b c d q q q x y z"),
            (1, "p a b c d p p x y z"),
            (2, "m n o m n o m n o m"),
            (3, "t u"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: r.text
        for r in dedup.strip_duplicate_spans(
            docs, window=3, min_docs=2,
        ).collect()
    }
    # doc 0: islands [0,4) and [7,10) removed -> tokens 4..6 survive
    assert got[0] == "q q q"
    # doc 1: islands [1,5) and [7,10) removed -> tokens 0,5,6 survive
    assert got[1] == "p p p"
    # docs with no cross-document spans are untouched
    assert got[2] == "m n o m n o m n o m"
    assert got[3] == "t u"


def test_minhash_jaccard_estimate_counts_equal_bands(spark):
    from sed_spark.ext import dedup

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy dog"),  # identical
            (2, "a wholly different sentence with other words here"),
        ],
        ["doc_id", "text"],
    )
    sigs = dedup.minhash_signatures(docs, n_bands=4)
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2)], ["a_id", "b_id"],
    )
    got = {
        (r.a_id, r.b_id): r.jaccard_est
        for r in dedup.minhash_jaccard_estimate(pairs, sigs).collect()
    }
    assert got[(0, 1)] == 1.0   # identical docs: all 4 band sigs equal
    assert got[(0, 2)] == 0.0   # disjoint shingle sets: none equal


def test_html_to_text_extraction(spark):
    from sed_spark.ext import text

    rows = [
        (0, "<html><head><script>if (a < b) { x(); }</script>"
            "<style>p { margin: 0 }</style></head>"
            "<body><h1>Title</h1><p>Hello   world</p>"
            "<!-- secret --><div>bye</div></body></html>"),
        (1, "Tom &amp; Jerry &lt;3 &quot;quoted&#39; and&nbsp;spaced"),
        (2, "no markup at all"),
        (3, "<p>double escape: &amp;lt; stays literal</p>"),
        (4, "<P CLASS='x'>case</P><SCRIPT>drop()</SCRIPT>"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "html"])
    got = {r.doc_id: r.text
           for r in text.extract_html_text(df).collect()}
    assert got[0] == "Title Hello world bye"
    assert got[1] == 'Tom & Jerry <3 "quoted\' and spaced'
    assert got[2] == "no markup at all"
    # &amp;lt; -> &lt; literally (amp decoded LAST, no double decode)
    assert got[3] == "double escape: &lt; stays literal"
    # tag stripping and script removal are case-insensitive
    assert got[4] == "case"


# ---------------------------------------------------------------------------
# classifier_fit: distributed logistic regression
# ---------------------------------------------------------------------------

FIT_DOCS = [
    (0, "customer wants a table", 1),
    (1, "the customer pays", 1),
    (2, "fish swim fast", 0),
    (3, "", 0),
    (4, "spark joins tables", 0),
    (5, "good customer again", 1),
]


def _ref_classifier_fit(docs, dim, lr=2.0, n_iter=8, q=9):
    """Pure-Python transcription of the documented semantics."""
    import hashlib
    import math

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % dim

    m = len(docs)
    w, b = [0.0] * dim, 0.0
    for _ in range(n_iter):
        gw, gb = [0.0] * dim, 0.0
        for _, t, y in docs:
            tk = [x for x in t.lower().split() if x]
            z = b + (sum(w[bucket(x)] for x in tk) / len(tk) if tk else 0.0)
            r = 1.0 / (1.0 + math.exp(-z)) - y
            gb += r
            for x in tk:
                gw[bucket(x)] += r / len(tk)
        w = [round(wi - lr * g / m, q) for wi, g in zip(w, gw)]
        b = round(b - lr * gb / m, q)
    return w, b


def test_classifier_fit_matches_python_reference(spark):
    from sed_spark.ext import text

    dim = 16
    df = spark.createDataFrame(FIT_DOCS, ["doc_id", "text", "y"])
    got_w, got_b = text.classifier_fit(df, "y", dim=dim)
    ref_w, ref_b = _ref_classifier_fit(FIT_DOCS, dim)
    # quantized to 9 decimals each iteration; only sum-order ulps differ
    assert max(abs(a - c) for a, c in zip(got_w, ref_w)) < 1e-8
    assert abs(got_b - ref_b) < 1e-8


def test_classifier_fit_is_deterministic_and_learns(spark):
    from sed_spark.ext import text

    df = spark.createDataFrame(FIT_DOCS, ["doc_id", "text", "y"])
    w1, b1 = text.classifier_fit(df, "y", dim=16)
    w2, b2 = text.classifier_fit(df, "y", dim=16)
    assert (w1, b1) == (w2, b2)
    sc = {
        r["doc_id"]: r["quality_score"]
        for r in text.classifier_score(df, w1, bias=b1).collect()
    }
    pos = sum(sc[i] for i in (0, 1, 5)) / 3
    neg = sum(sc[i] for i in (2, 3, 4)) / 3
    assert pos > neg + 0.05


def test_classifier_fit_early_stop_and_errors(spark):
    import pytest

    from sed_spark.ext import text

    df = spark.createDataFrame(FIT_DOCS, ["doc_id", "text", "y"])
    # an absurdly large tol stops after one iteration == n_iter=1
    w_tol, b_tol = text.classifier_fit(df, "y", dim=16, tol=1e9)
    w_one, b_one = text.classifier_fit(df, "y", dim=16, n_iter=1)
    assert (w_tol, b_tol) == (w_one, b_one)
    with pytest.raises(ValueError, match="dim"):
        text.classifier_fit(df, "y", dim=0)
    with pytest.raises(ValueError, match="n_iter"):
        text.classifier_fit(df, "y", n_iter=0)
    with pytest.raises(ValueError, match="empty"):
        text.classifier_fit(df.filter("doc_id < 0"), "y")


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------

def _pq_ref_codes(vecs, books):
    """Brute-force argmin-squared-L2 encoder (ties to lowest code)."""
    m, dsub = len(books), len(books[0][0])
    out = []
    for v in vecs:
        codes = []
        for mm in range(m):
            sub = v[mm * dsub:(mm + 1) * dsub]
            d = [
                sum((float(x) - float(c)) ** 2 for x, c in zip(sub, cent))
                for cent in books[mm]
            ]
            codes.append(d.index(min(d)))
        out.append(codes)
    return out


def test_pq_encode_is_argmin_squared_l2(spark):
    import numpy as np

    from sed_spark.ext import similarity as S

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(200, 16)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    books = S.pq_train(df, m=4, k=4, max_iter=3)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in S.pq_encode(df, books).collect()
    }
    ref = _pq_ref_codes([[float(x) for x in v] for v in vecs], books)
    assert [got[i] for i in range(len(vecs))] == ref


def test_pq_train_is_reproducible_and_improves_quantization(spark):
    import numpy as np

    from sed_spark.ext import similarity as S

    rng = np.random.default_rng(5)
    # clustered subvectors so training has something to learn
    centers = rng.normal(size=(4, 16)) * 3
    vecs = centers[rng.integers(0, 4, 300)] + rng.normal(size=(300, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    b1 = S.pq_train(df, m=4, k=4, max_iter=4)
    b2 = S.pq_train(df, m=4, k=4, max_iter=4)
    assert b1 == b2

    def recon_err(books):
        codes = _pq_ref_codes([[float(x) for x in v] for v in vecs], books)
        err = 0.0
        dsub = len(books[0][0])
        for v, cs in zip(vecs, codes):
            for mm, c in enumerate(cs):
                sub = v[mm * dsub:(mm + 1) * dsub]
                err += sum(
                    (float(x) - float(y)) ** 2
                    for x, y in zip(sub, books[mm][c])
                )
        return err

    # more training passes must not increase reconstruction error
    b_short = S.pq_train(df, m=4, k=4, max_iter=1)
    assert recon_err(b1) <= recon_err(b_short) + 1e-9


def test_pq_topk_ranks_query_reconstruction_first(spark):
    import numpy as np

    from sed_spark.ext import similarity as S

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(300, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    books = S.pq_train(df, m=4, k=8, max_iter=3)
    q = [float(x) for x in vecs[42]]
    top = S.pq_topk(df, books, q, k=10).collect()
    ids = [r["vec_id"] for r in top]
    # the query's own row shares its reconstruction, so it must appear
    assert 42 in ids
    # scores are descending with deterministic id tie-break
    scores = [r["cos_sim"] for r in top]
    assert scores == sorted(scores, reverse=True)
    # zero-norm query rejected
    import pytest

    with pytest.raises(ValueError, match="nonzero"):
        S.pq_topk(df, books, [0.0] * 16, k=5)


def test_pq_train_validation(spark):
    import pytest

    from sed_spark.ext import similarity as S

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="divisible"):
        S.pq_train(df, m=2, k=1)
    with pytest.raises(ValueError, match="at least k"):
        S.pq_train(df.limit(1), m=1, k=4)


def test_simhash_pairs_matches_brute_force(spark):
    import itertools
    import random

    from sed_spark.ext import dedup

    rng = random.Random(17)
    # clustered fingerprints: base patterns with few flipped bits
    bases = [rng.randrange(1 << 16) for _ in range(8)]
    fps = []
    for i in range(120):
        h = bases[i % 8]
        for _ in range(rng.randrange(0, 3)):
            h ^= 1 << rng.randrange(16)
        fps.append((i, h))
    df = spark.createDataFrame(fps, ["doc_id", "simhash"])
    for d in (1, 3, 5):
        got = sorted(
            (r["a_id"], r["b_id"], r["hamming"])
            for r in dedup.simhash_pairs(df, max_hamming=d).collect()
        )
        ref = sorted(
            (a, b, bin(ha ^ hb).count("1"))
            for (a, ha), (b, hb) in itertools.combinations(fps, 2)
            if bin(ha ^ hb).count("1") <= d
        )
        assert got == ref, f"d={d}"
        # every emitted pair appears exactly once (band dedup works)
        keys = [(a, b) for a, b, _ in got]
        assert len(keys) == len(set(keys))


def test_simhash_pairs_validation(spark):
    import pytest

    from sed_spark.ext import dedup

    df = spark.createDataFrame([(0, 1)], ["doc_id", "simhash"])
    with pytest.raises(ValueError, match="max_hamming"):
        dedup.simhash_pairs(df, max_hamming=16)


def test_ivfpq_matches_numpy_reconstruction_reference(spark):
    import numpy as np

    from sed_spark.ext import similarity as S

    rng = np.random.default_rng(9)
    centers = rng.normal(size=(3, 32)) * 2
    vecs = centers[rng.integers(0, 3, 240)] + rng.normal(size=(240, 32)) * 0.5
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    coarse = [[float(x) for x in c] for c in centers]
    books = S.ivfpq_train(df, coarse, m=4, k=4, max_iter=2)
    # reproducible like every other fit
    assert books == S.ivfpq_train(df, coarse, m=4, k=4, max_iter=2)

    q = [float(x) for x in vecs[7]]
    got = [
        (r["vec_id"], r["cos_sim"])
        for r in S.ivfpq_topk(df, coarse, books, q, k=10, nprobe=1).collect()
    ]

    C = np.array(coarse)
    B = [np.array(b) for b in books]
    qv = np.array(q)
    qh = qv / np.linalg.norm(qv)

    def bucket(v):
        sims = np.round(
            C @ v / (np.linalg.norm(C, axis=1) * np.linalg.norm(v)), 6,
        )
        return int(np.argmax(sims))

    pb = bucket(qv)
    scores = {}
    for i, vrow in enumerate(vecs):
        v = np.array([float(np.float32(x)) for x in vrow])
        b = bucket(v)
        if b != pb:
            continue
        resid = v - C[b]
        rec = C[b].copy()
        for mi in range(4):
            sub = resid[mi * 8:(mi + 1) * 8]
            d = ((B[mi] - sub) ** 2).sum(axis=1)
            rec[mi * 8:(mi + 1) * 8] += B[mi][int(np.argmin(d))]
        scores[i] = round(float(qh @ rec / np.linalg.norm(rec)), 6)
    ref = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [g[0] for g in got] == [r[0] for r in ref]
    assert all(abs(g[1] - r[1]) < 2e-6 for g, r in zip(got, ref))


def test_ivfpq_residual_books_beat_raw_books_on_reconstruction(spark):
    import numpy as np

    from sed_spark.ext import similarity as S

    rng = np.random.default_rng(13)
    centers = rng.normal(size=(4, 32)) * 4
    vecs = centers[rng.integers(0, 4, 300)] + rng.normal(size=(300, 32)) * 0.3
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    coarse = [[float(x) for x in c] for c in centers]
    res_books = S.ivfpq_train(df, coarse, m=4, k=4, max_iter=3)
    raw_books = S.pq_train(df, m=4, k=4, max_iter=3)

    C = np.array(coarse)

    def bucket(v):
        sims = np.round(
            C @ v / (np.linalg.norm(C, axis=1) * np.linalg.norm(v)), 6,
        )
        return int(np.argmax(sims))

    def err(books, residual):
        B = [np.array(b) for b in books]
        total = 0.0
        for vrow in vecs:
            v = np.array([float(np.float32(x)) for x in vrow])
            target = v - C[bucket(v)] if residual else v
            for mi in range(4):
                sub = target[mi * 8:(mi + 1) * 8]
                d = ((B[mi] - sub) ** 2).sum(axis=1)
                total += float(d.min())
        return total

    # removing the between-cluster variance first must tighten the cells
    assert err(res_books, True) < err(raw_books, False)


def test_sq8_matches_python_reference_and_bounds(spark):
    import math

    import numpy as np

    from sed_spark.ext import similarity as S

    rng = np.random.default_rng(21)
    vecs = rng.normal(size=(150, 8)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    los, his = S.sq8_fit(df)
    assert los == [float(np.min(vecs[:, i])) for i in range(8)]
    assert his == [float(np.max(vecs[:, i])) for i in range(8)]
    codes = {r["vec_id"]: list(r["codes"])
             for r in S.sq8_encode(df, los, his).collect()}
    assert all(0 <= c <= 255 for cs in codes.values() for c in cs)

    q = [float(x) for x in vecs[3]]
    got = [(r["vec_id"], r["cos_sim"])
           for r in S.sq8_topk(df, los, his, q, k=10).collect()]

    def r6(x):
        return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)

    qn = math.sqrt(sum(v * v for v in q))
    qh = [v / qn for v in q]
    scores = {}
    for i, vr in enumerate(vecs):
        xh = []
        for x, lo, hi in zip(vr, los, his):
            s = hi - lo if hi > lo else 0.0
            if s > 0:
                c = math.floor(min(255.0, max(0.0, (float(x) - lo) / s * 255.0)))
                xh.append(lo + c / 255.0 * s)
            else:
                xh.append(lo)
        num = sum(a * b for a, b in zip(xh, qh))
        den = math.sqrt(sum(a * a for a in xh))
        scores[i] = r6(num / den)
    ref = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == [tuple(x) for x in ref]
    # the quantization is coarse but the query's own row must rank top
    assert got[0][0] == 3

    import pytest

    with pytest.raises(ValueError, match="nonzero"):
        S.sq8_topk(df, los, his, [0.0] * 8)


def test_exact_rerank_and_pq_rerank(spark):
    import numpy as np

    from sed_spark.ext import similarity

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(200, 8)).round(3)
    df = spark.createDataFrame(
        [(i, [float(v) for v in vecs[i]]) for i in range(200)],
        "vec_id int, embedding array<float>",
    )
    q = [float(v) for v in vecs[0]]
    exact = similarity.cosine_topk(df, q, k=5)
    # rerank restricted to the exact winners reproduces them
    got = similarity.exact_rerank(df, exact.select("vec_id"), q, k=5)
    assert [r["vec_id"] for r in got.collect()] == [
        r["vec_id"] for r in exact.collect()
    ]
    # a full-corpus shortlist makes pq_topk_rerank EXACT regardless of
    # code resolution (every id survives to the exact stage)
    books = similarity.pq_train(df, m=2, k=4, vec_col="embedding", max_iter=2)
    full = similarity.pq_topk_rerank(df, books, q, k=5, refine=40)
    assert [r["vec_id"] for r in full.collect()] == [
        r["vec_id"] for r in exact.collect()
    ]
    with pytest.raises(ValueError, match="refine"):
        similarity.pq_topk_rerank(df, books, q, refine=0)


def test_exact_rerank_candidates_broadcast_plan(spark):
    import numpy as np

    from sed_spark.ext import similarity

    rng = np.random.default_rng(12)
    df = spark.createDataFrame(
        [(i, [float(v) for v in rng.normal(size=8)]) for i in range(50)],
        "vec_id int, embedding array<float>",
    )
    cand = df.select("vec_id").limit(10)
    plan = (
        similarity.exact_rerank(df, cand, [1.0] * 8, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # candidate ids broadcast into a semi join — no corpus shuffle
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_random_project_matches_driver_mirror_and_preserves_angles(spark):
    import numpy as np

    from sed_spark.ext.similarity import (
        project_vector,
        random_project,
        rp_sign_matrix,
    )

    rng = np.random.RandomState(5)
    # clustered vectors: pairwise cosines span [~0, ~1], so the JL check
    # below measures real structure (i.i.d. uniform vectors are all
    # near-orthogonal and a 16-dim projection's noise would swamp the
    # ~0-centered cosine spread)
    centers = rng.uniform(-1, 1, (6, 64))
    vecs = np.array(
        [centers[i % 6] + 0.15 * rng.uniform(-1, 1, 64) for i in range(60)],
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    # unrounded projection equals the Python mirror bit-for-bit
    got = {
        r["vec_id"]: r["rp"]
        for r in random_project(
            df, 64, 16, round_decimals=None,
        ).select("vec_id", "rp").collect()
    }
    for i in range(60):
        assert got[i] == project_vector(list(vecs[i]), 64, 16)

    # JL: pairwise cosines in 16-dim track the 64-dim cosines
    signs = np.array(rp_sign_matrix(64, 16), dtype=float)
    proj = vecs @ signs.T / np.sqrt(16.0)

    def cosines(m):
        n = m / np.linalg.norm(m, axis=1, keepdims=True)
        return (n @ n.T)[np.triu_indices(60, 1)]

    full, low = cosines(vecs), cosines(proj)
    assert np.corrcoef(full, low)[0, 1] > 0.7
    assert np.abs(full - low).max() < 0.6

    import pytest as pt

    with pt.raises(ValueError, match="dims"):
        random_project(df, 64, 0)


def test_random_project_raises_on_dimension_mismatch(spark):
    import pytest as pt
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from sed_spark.ext.similarity import random_project

    df = spark.createDataFrame(
        [(0, [1.0] * 64), (1, [1.0] * 32)],
        "vec_id long, embedding array<double>",
    )
    with pt.raises(SparkRuntimeException, match="expected 64-dim"):
        random_project(df, 64, 8).select("rp").collect()


def test_random_project_null_vector_passes_through(spark):
    from sed_spark.ext.similarity import random_project

    df = spark.createDataFrame(
        [(0, [1.0] * 16), (1, None)],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r["rp"] for r in random_project(df, 16, 4).collect()}
    assert got[1] is None and got[0] is not None


def test_prefix_similarity_join_exact_vs_brute_force(spark):
    # the prefix-filtered join is EXACT: against a brute-force pairwise
    # Jaccard over full distinct shingle sets it must return the same
    # pairs and values at every threshold, positional filter on or off
    import itertools
    import random

    from sed_spark.ext.dedup import prefix_similarity_join

    rng = random.Random(99)
    words = [f"w{i}" for i in range(10)]
    rows = []
    for i in range(50):
        rows.append((i, " ".join(rng.choice(words)
                                 for _ in range(rng.randint(1, 12)))))
    for i in range(50, 62):  # near-dups: one-word edits of earlier docs
        src = rows[rng.randrange(50)][1].split(" ")
        if len(src) > 3:
            src[rng.randrange(len(src))] = rng.choice(words)
        rows.append((i, " ".join(src)))

    def shingles(text, n=3):
        w = text.split(" ")
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for tau in (0.3, 0.7, 1.0):
        want = {}
        for (i, a), (j, b) in itertools.combinations(rows, 2):
            sa, sb = shingles(a), shingles(b)
            if not sa or not sb:
                continue
            c = len(sa & sb)
            u = len(sa | sb)
            if u and c / u >= tau:
                want[(i, j)] = (c, c / u)
        for positional in (True, False):
            got = {
                (r["a_id"], r["b_id"]): (r["n_common"], r["jaccard"])
                for r in prefix_similarity_join(
                    df, threshold=tau, positional=positional,
                ).collect()
            }
            assert set(got) == set(want), (tau, positional)
            for k, (c, j) in want.items():
                assert got[k][0] == c and abs(got[k][1] - j) < 1e-12, (tau, k)


def test_prefix_similarity_join_validation(spark):
    import pytest as pt

    from sed_spark.ext.dedup import prefix_similarity_join

    df = spark.createDataFrame([(0, "a b c")], ["doc_id", "text"])
    for bad in (0.0, -0.1, 1.5):
        with pt.raises(ValueError, match="threshold"):
            prefix_similarity_join(df, threshold=bad)


def test_pick_head_df_threshold_selection():
    from sed_spark.ext.dedup import _pick_head_df

    # greedy from the most frequent down; stops before the bucket that
    # overflows the budget
    assert _pick_head_df([(4, 100), (3, 3000), (2, 9_000_000),
                          (1, 5_000_000)], 1 << 17) == 3
    # everything with df >= 2 fits
    assert _pick_head_df([(5, 10), (2, 50), (1, 1000)], 100) == 2
    # head bucket alone overflows -> no head, pure token order
    assert _pick_head_df([(2, 10**9), (1, 10)], 1 << 17) is None
    # nothing repeats
    assert _pick_head_df([(1, 42)], 1 << 17) is None
    assert _pick_head_df([], 1 << 17) is None
    # unsorted input is handled (the operator feeds raw collect rows)
    assert _pick_head_df([(1, 9), (3, 5), (2, 7)], 100) == 2


def test_prefix_similarity_join_set_col_mode(spark):
    # set_col names a precomputed array column (URL sets, feature bags):
    # Jaccard is exact over the distinct elements, brute-force checked
    import itertools
    import random

    from sed_spark.ext.dedup import prefix_similarity_join

    rng = random.Random(11)
    universe = [f"t{i}" for i in range(30)]
    rows = []
    for i in range(40):
        k = rng.randint(0, 8)
        rows.append((i, rng.sample(universe, k)))
    rows.append((40, None))  # NULL set pairs with nothing
    df = spark.createDataFrame(rows, "doc_id int, tags array<string>")
    for tau in (0.4, 0.8):
        want = {}
        for (i, a), (j, b) in itertools.combinations(rows[:40], 2):
            sa, sb = set(a), set(b)
            if not sa or not sb:
                continue
            c, u = len(sa & sb), len(sa | sb)
            if u and c / u >= tau:
                want[(i, j)] = c
        got = {
            (r["a_id"], r["b_id"]): r["n_common"]
            for r in prefix_similarity_join(
                df, set_col="tags", threshold=tau,
            ).collect()
        }
        assert got == want, tau


def test_shared_grams_and_islands_row_identical(spark):
    """The r11 sharing hooks must not change any row: passing a
    precomputed (checkpointed) gram table to benchmark_contamination /
    boilerplate_stats, or a precomputed span_islands pair to
    duplicate_spans / strip_duplicate_spans, is plan reuse only."""
    from sed_spark.ext import dedup

    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog the quick brown fox"),
            (1, "quick brown fox runs away from everything here yes indeed today"),
            (2, "completely unrelated text with no overlap at all whatsoever done"),
            (3, ""),
            (4, "the quick brown fox jumps over the lazy dog again and again"),
        ],
        ["doc_id", "text"],
    )
    bench = corpus.filter("doc_id % 2 = 0")

    grams = dedup.exploded_shingles(
        corpus, n=3, distinct=True,
    ).localCheckpoint(eager=True)
    base_cont = dedup.benchmark_contamination(corpus, bench, shingle_n=3)
    shared_cont = dedup.benchmark_contamination(
        corpus, bench, shingle_n=3, grams=grams,
    )
    key = lambda rows: sorted(tuple(r) for r in rows)  # noqa: E731
    assert key(base_cont.collect()) == key(shared_cont.collect())

    base_bp = dedup.boilerplate_stats(corpus, shingle_n=3, min_docs=2)
    shared_bp = dedup.boilerplate_stats(
        corpus, shingle_n=3, min_docs=2, grams=grams,
    )
    assert key(base_bp.collect()) == key(shared_bp.collect())

    words, dup_pos = dedup.span_islands(corpus, window=3, min_docs=2)
    islands = (words, dup_pos.localCheckpoint(eager=True))
    for fn in (dedup.duplicate_spans, dedup.strip_duplicate_spans):
        base = fn(corpus, window=3, min_docs=2)
        shared = fn(corpus, window=3, min_docs=2, islands=islands)
        assert key(base.collect()) == key(shared.collect()), fn.__name__


def test_shared_words_and_bigrams_row_identical(spark):
    """The r12 sharing hooks must not change any row: passing a
    precomputed word explode (``words=``) to word_doc_freq /
    vocab_doc_stats / doc_top_pair / collocations, or a precomputed
    bigram explode (``grams=``) to bigram_counts / lm_familiarity /
    collocations, is plan reuse only — including the even-half LM
    filter commuting through the per-document explode."""
    from pyspark.sql import functions as F

    from sed_spark.ext import text, vocab
    from sed_spark.ext.dedup import exploded_shingles

    corpus = spark.createDataFrame(
        [
            (0, "aa bb aa cc dd aa bb"),
            (1, "bb cc bb cc bb cc dd"),
            (2, "zz yy xx ww vv uu tt ss"),
            (3, ""),
            (4, "aa bb aa bb aa bb aa bb"),
            (5, "single"),
        ],
        ["doc_id", "text"],
    )
    wx = vocab.exploded_words(corpus)
    g2 = exploded_shingles(corpus, n=2)
    key = lambda rows: sorted(tuple(r) for r in rows)  # noqa: E731

    v_base = vocab.word_doc_freq(corpus)
    v_shared = vocab.word_doc_freq(corpus, words=wx)
    assert key(v_base.collect()) == key(v_shared.collect())

    assert key(vocab.vocab_doc_stats(corpus, v_base).collect()) == key(
        vocab.vocab_doc_stats(corpus, v_shared, words=wx).collect(),
    )
    assert key(vocab.doc_top_pair(corpus).collect()) == key(
        vocab.doc_top_pair(corpus, words=wx).collect(),
    )

    even = corpus.filter(F.col("doc_id") % 2 == 0)
    lm_base = vocab.bigram_counts(even)
    lm_shared = vocab.bigram_counts(
        corpus, grams=g2.filter(F.col("doc_id") % 2 == 0),
    )
    assert key(lm_base.collect()) == key(lm_shared.collect())

    assert key(vocab.lm_familiarity(corpus, lm_base).collect()) == key(
        vocab.lm_familiarity(corpus, lm_shared, grams=g2).collect(),
    )

    assert key(text.collocations(corpus, min_count=2).collect()) == key(
        text.collocations(corpus, min_count=2, words=wx, grams=g2).collect(),
    )
