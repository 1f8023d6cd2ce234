"""Unigram-LM tokenizer: trainer engines, segmentation DP, encode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sed_spark.ext.vocab import (
    UNIGRAM_UNK_SCORE_MICRO,
    _viterbi_local,
    unigram_encode,
    unigram_segment_expr,
    unigram_token_counts,
    unigram_train,
    unigram_vocab,
)

DOCS = [
    (0, "spark sparkly park parking lot"),
    (1, "spark spark park lot lot lot"),
    (2, "parking sparkly spark"),
    (3, "a lot of sparkly parks"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_segment_expr_matches_python_viterbi(spark):
    # random piece tables + random words: the expression DP and the
    # driver-side reference must agree exactly, tie-breaks included
    import random

    rng = random.Random(7)
    alpha = "abcd"
    pieces = {c: 2_000_000 for c in alpha}
    for _ in range(12):
        k = rng.randint(2, 4)
        p = "".join(rng.choice(alpha) for _ in range(k))
        pieces[p] = rng.randrange(500_000, 3_000_000)
    plist = sorted(pieces.items())
    words = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 10)))
        for _ in range(60)
    ] + ["", "a", "xyz"]  # empty word, single char, out-of-alphabet
    df = spark.createDataFrame([(w,) for w in words], ["word"])
    got = {
        r["word"]: tuple(r["seg"])
        for r in df.select(
            "word",
            unigram_segment_expr(F.col("word"), plist, 4).alias("seg"),
        ).collect()
    }
    for w in words:
        want = _viterbi_local(w, pieces, 4) if w else ()
        assert got[w] == want, (w, got[w], want)


def test_unigram_train_engines_identical(spark):
    df = _docs(spark)
    local = unigram_train(df, vocab_size=16, max_piece_len=3, n_iter=2,
                          seed_size=40)
    dist = unigram_train(df, vocab_size=16, max_piece_len=3, n_iter=2,
                         seed_size=40, local_vocab_threshold=0)
    assert local == dist
    assert len(local) == 16
    pieces = [p for p, _ in local]
    assert pieces == sorted(pieces)
    # every alphabet char survives pruning
    alphabet = {c for _, t in DOCS for c in t.replace(" ", "")}
    assert alphabet <= set(pieces)
    # scores are positive quantized micro-nats (count < total always)
    assert all(isinstance(s, int) and s > 0 for _, s in local)


def test_unigram_train_guards(spark):
    df = _docs(spark)
    with pytest.raises(ValueError, match="vocab_size"):
        unigram_train(df, vocab_size=1)
    with pytest.raises(ValueError, match="below alphabet"):
        unigram_train(df, vocab_size=3, max_piece_len=2, n_iter=1)


def test_unigram_token_counts_and_encode_roundtrip(spark):
    df = _docs(spark)
    pieces = unigram_train(df, vocab_size=20, max_piece_len=3, n_iter=2,
                           seed_size=40)
    counts = {
        r["doc_id"]: r["n_unigram_tokens"]
        for r in unigram_token_counts(df, pieces).collect()
    }
    enc = {
        r["doc_id"]: list(r["token_ids"])
        for r in unigram_encode(df, pieces).collect()
    }
    assert set(counts) == set(enc) == {0, 1, 2, 3}
    # token counts equal the encoded sequence lengths
    for d in counts:
        assert counts[d] == len(enc[d]), d
    # ids decode back to the original text through the id->piece table
    id2p = {i: p for p, i in unigram_vocab(pieces).items()}
    scores = dict(pieces)
    for doc_id, text in DOCS:
        want = [
            p for w in text.split(" ") for p in _viterbi_local(w, scores, 3)
        ]
        assert [id2p[i] for i in enc[doc_id]] == want
        assert "".join(want) == text.replace(" ", "")


def test_unigram_encode_oov_contract(spark):
    # vocab table from corpus A, encode corpus B: a word missing from the
    # vocab -> one unk; an out-of-alphabet char in a KNOWN word cannot
    # happen (vocab words define the alphabet), so unk fallback pieces
    # only appear via the foreign-vocab path
    base = _docs(spark)
    pieces = unigram_train(base, vocab_size=20, max_piece_len=3, n_iter=1,
                           seed_size=40)
    from sed_spark.ext.vocab import word_doc_freq

    vocab = word_doc_freq(base)
    other = spark.createDataFrame(
        [(9, "spark zzz lot"), (10, "")], ["doc_id", "text"],
    )
    enc = {
        r["doc_id"]: list(r["token_ids"])
        for r in unigram_encode(other, pieces, vocab=vocab, unk_id=-1).collect()
    }
    scores = dict(pieces)
    want_spark = [unigram_vocab(pieces)[p]
                  for p in _viterbi_local("spark", scores, 3)]
    want_lot = [unigram_vocab(pieces)[p]
                for p in _viterbi_local("lot", scores, 3)]
    assert enc[9] == want_spark + [-1] + want_lot
    assert enc[10] == []


def test_unigram_oov_char_segments_at_unk_cost(spark):
    # out-of-alphabet chars take the single-char unk fallback instead of
    # failing the DP
    plist = [("a", 1_000_000), ("ab", 1_500_000), ("b", 1_000_000)]
    df = spark.createDataFrame([("aZb",), ("ZZ",)], ["word"])
    got = {
        r["word"]: tuple(r["seg"])
        for r in df.select(
            "word", unigram_segment_expr(F.col("word"), plist).alias("seg"),
        ).collect()
    }
    assert got["aZb"] == ("a", "Z", "b")
    assert got["ZZ"] == ("Z", "Z")
    assert _viterbi_local("aZb", dict(plist), 2) == ("a", "Z", "b")
    assert UNIGRAM_UNK_SCORE_MICRO > 10 * 1_500_000


def test_unigram_max_word_len_caps_dp_with_per_char_fallback(spark):
    # a pathological long token (URL / DNA run) must not build the O(n²)
    # DP payload: past max_word_len both engines segment per character,
    # identically (round-8 ADVICE)
    from sed_spark.ext.vocab import UNIGRAM_MAX_WORD_LEN

    plist = [("a", 1_000_000), ("ab", 900_000), ("b", 1_000_000)]
    long_word = "ab" * 40  # 80 chars > default cap of 64
    short_word = "abab"
    df = spark.createDataFrame(
        [(long_word,), (short_word,)], ["word"],
    )
    got = {
        r["word"]: tuple(r["seg"])
        for r in df.select(
            "word", unigram_segment_expr(F.col("word"), plist).alias("seg"),
        ).collect()
    }
    assert got[long_word] == tuple(long_word)  # per-char fallback
    assert got[short_word] == ("ab", "ab")  # DP still wins under the cap
    assert _viterbi_local(long_word, dict(plist), 2) == tuple(long_word)
    assert _viterbi_local(short_word, dict(plist), 2) == ("ab", "ab")
    # an explicit tighter cap applies on both sides too
    got6 = df.select(
        "word",
        unigram_segment_expr(F.col("word"), plist, max_word_len=6)
        .alias("seg"),
    ).collect()
    by_word = {r["word"]: tuple(r["seg"]) for r in got6}
    assert by_word[short_word] == ("ab", "ab")  # 4 <= 6: DP
    assert by_word[long_word] == tuple(long_word)
    assert _viterbi_local("abababab", dict(plist), 2, max_word_len=6) == tuple(
        "abababab",
    )
    assert len(long_word) > UNIGRAM_MAX_WORD_LEN
    # training over a corpus containing the pathological token completes
    # and the engines stay bit-identical
    docs = spark.createDataFrame(
        [(0, f"ab ab {long_word}"), (1, "ab b a")], ["doc_id", "text"],
    )
    kw = dict(vocab_size=4, max_piece_len=2, n_iter=2, seed_size=10)
    local = unigram_train(docs, **kw)
    dist = unigram_train(docs, local_vocab_threshold=0, **kw)
    assert local == dist


def test_unigram_engines_identical_on_random_corpora(spark):
    # property check: for random word-soup corpora the driver-local and
    # distributed-E-step fits must be bit-identical, and the expression
    # apply must agree with the Python Viterbi under the learned pieces
    import random

    from sed_spark.ext.vocab import word_doc_freq

    rng = random.Random(1234)
    alpha = "abcdef"
    for trial in range(3):
        words = [
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 8)))
            for _ in range(30)
        ]
        docs = spark.createDataFrame(
            [
                (i, " ".join(rng.choice(words)
                             for _ in range(rng.randint(3, 12))))
                for i in range(25)
            ],
            ["doc_id", "text"],
        )
        kw = dict(vocab_size=12, max_piece_len=3, n_iter=2, seed_size=30)
        local = unigram_train(docs, **kw)
        dist = unigram_train(docs, local_vocab_threshold=0, **kw)
        assert local == dist, f"trial {trial}"
        scores = dict(local)
        vocab = word_doc_freq(docs)
        got = {
            r["word"]: tuple(r["seg"])
            for r in vocab.select(
                "word",
                unigram_segment_expr(F.col("word"), local, 3).alias("seg"),
            ).collect()
        }
        for w, seg in got.items():
            assert seg == _viterbi_local(w, scores, 3), (trial, w)


# ---------------------------------------------------------------------------
# WordPiece greedy encoder
# ---------------------------------------------------------------------------

def test_wordpiece_matches_python_mirror_and_bert_rules(spark):
    from sed_spark.ext.vocab import (
        _wordpiece_local,
        wordpiece_pieces_expr,
    )

    # BERT-style vocab: word-initial surfaces plain, continuations ##'d
    vocab = ["un", "##aff", "##able", "##ing", "play", "##play",
             "a", "##a", "##b", "b", "affable"]
    words = ["unaffable", "playing", "play", "unplayable",
             "aaa", "abba", "zzz", "az", "a", ""]
    df = spark.createDataFrame([(w,) for w in words], ["word"])
    got = {
        r["word"]: tuple(r["ps"])
        for r in df.select(
            "word",
            wordpiece_pieces_expr(F.col("word"), vocab).alias("ps"),
        ).collect()
    }
    pset = frozenset(vocab)
    for w in words:
        assert got[w] == _wordpiece_local(w, pset, 7), (w, got[w])
    # the canonical example: longest-match-first, continuations prefixed
    assert got["unaffable"] == ("un", "##aff", "##able")
    assert got["playing"] == ("play", "##ing")
    # all-or-nothing: one uncovered position poisons the whole word
    assert got["zzz"] == ("[UNK]",)
    assert got["az"] == ("[UNK]",)  # 'z' has no continuation piece
    assert got[""] == ()


def test_wordpiece_token_counts_join_shape(spark):
    from sed_spark.ext.vocab import wordpiece_token_counts

    docs = spark.createDataFrame(
        [(0, "play playing zzz"), (1, "unaffable play")],
        ["doc_id", "text"],
    )
    vocab = ["un", "##aff", "##able", "##ing", "play"]
    got = {
        r["doc_id"]: r["n_wordpiece_tokens"]
        for r in wordpiece_token_counts(docs, vocab).collect()
    }
    # doc 0: play(1) + play,##ing(2) + [UNK](1) = 4
    # doc 1: un,##aff,##able(3) + play(1) = 4
    assert got == {0: 4, 1: 4}


def test_wordpiece_train_engines_identical_and_encode_consistent(spark):
    from sed_spark.ext.vocab import (
        _wordpiece_local,
        wordpiece_pieces_expr,
        wordpiece_train,
    )

    df = _docs(spark)
    local = wordpiece_train(df, n_merges=6)
    dist = wordpiece_train(df, n_merges=6, local_vocab_threshold=0)
    assert local == dist
    # base symbols: word-initial chars plain + continuation chars ##'d,
    # then 6 fused surfaces in merge order
    base = [p for p in local if len(p.lstrip("#")) == 1 or p in ("##",)]
    assert len(local) == len(set(local))
    initials = {t.split(" ")[0][0] for _, t in DOCS} | {
        w[0] for _, t in DOCS for w in t.split(" ")
    }
    assert all(w[0] in local for _, t in DOCS for w in t.split(" ") if w)
    # every trained piece either starts a word or continues one
    for p in local:
        assert p == p.strip(), p
    # the greedy encoder over the trained vocab reproduces the mirror
    # and covers the training corpus without [UNK]
    pset = frozenset(local)
    max_len = max(len(p) - (2 if p.startswith("##") else 0) for p in local)
    words = sorted({w for _, t in DOCS for w in t.split(" ")})
    wdf = spark.createDataFrame([(w,) for w in words], ["word"])
    got = {
        r["word"]: tuple(r["ps"])
        for r in wdf.select(
            "word",
            wordpiece_pieces_expr(F.col("word"), local).alias("ps"),
        ).collect()
    }
    for w in words:
        assert got[w] == _wordpiece_local(w, pset, max_len), w
        assert "[UNK]" not in got[w], w
        # decode: strip ## and re-concatenate
        assert "".join(p.lstrip("#") if p.startswith("##") else p
                       for p in got[w]) == w


def test_wordpiece_train_prefers_likelihood_over_raw_count(spark):
    # BPE picks the most FREQUENT pair; WordPiece the most LIKELY one:
    # "xy" appears 4x but x and y are everywhere (score 4/(8*8));
    # "qz" appears 2x and q/z appear nowhere else (score 2/(2*2)) —
    # WordPiece must fuse q+z first, BPE would fuse x+y
    from sed_spark.ext.vocab import bpe_train, wordpiece_train

    docs = spark.createDataFrame(
        [(0, "xy xy qz"), (1, "xy xy qz yx yx yx yx")],
        ["doc_id", "text"],
    )
    wp = wordpiece_train(docs, n_merges=1)
    assert wp[-1] == "qz"
    assert bpe_train(docs, n_merges=1) == [("x", "y")]


def test_wordpiece_train_degenerate_inputs(spark):
    from sed_spark.ext.vocab import wordpiece_train

    # single-char words: no pairs, the loop breaks early and the vocab
    # is just the base symbols
    docs = spark.createDataFrame([(0, "a b a c")], ["doc_id", "text"])
    assert wordpiece_train(docs, n_merges=5) == ["a", "b", "c"]
    # n_merges above the available merge count: stops when pairs run dry
    docs2 = spark.createDataFrame([(0, "ab ab")], ["doc_id", "text"])
    got = wordpiece_train(docs2, n_merges=50)
    assert got == ["##b", "a", "ab"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_merges"):
        wordpiece_train(docs, n_merges=0)
