"""Tokenizer-training support: corpus vocabulary statistics and BPE merge
candidates.

A tokenizer-training pipeline over a 100 TB corpus never iterates the
corpus per merge — it aggregates once into a vocabulary-sized word-count
table and trains on that (Sennrich et al., "Neural Machine Translation of
Rare Words with Subword Units", ACL 2016 — their learner runs on a word
frequency dict, not raw text). These operators produce exactly that
shape:

* :func:`word_doc_freq` — the one corpus-sized aggregation (two-stage,
  map-side partials, no count-distinct expand).
* :func:`bpe_pair_counts` — the first BPE merge iteration, computed from
  the VOCABULARY table: the explode is vocabulary-sized, not corpus-sized.
* :func:`vocab_doc_stats` / :func:`doc_top_pair` — per-document rarity
  and merge-candidate signals (join back on the word / pair key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "char_pairs_expr",
    "exploded_words",
    "word_doc_freq",
    "bpe_pair_counts",
    "vocab_doc_stats",
    "doc_top_pair",
    "symbols_expr",
    "bigram_counts",
    "lm_familiarity",
    "bpe_apply_expr",
    "bpe_train",
    "bpe_token_counts",
    "bpe_vocab",
    "bpe_encode",
    "unigram_train",
    "unigram_segment_expr",
    "unigram_token_counts",
    "unigram_vocab",
    "unigram_encode",
    "UNIGRAM_UNK_SCORE_MICRO",
    "wordpiece_pieces_expr",
    "wordpiece_token_counts",
    "wordpiece_train",
    "wordpiece_symbols_expr",
    "WORDPIECE_SCORE_SCALE",
]


def char_pairs_expr(word: Column) -> Column:
    """Adjacent character pairs of a word as an array (the BPE merge
    candidates of one symbol sequence before any merge has been applied).
    Words shorter than 2 characters yield an empty array."""
    n = F.length(word) - 1
    return F.when(
        n > 0,
        F.transform(F.sequence(F.lit(1), n), lambda i: word.substr(i, F.lit(2))),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))


def exploded_words(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The shared ``(id, word)`` tokenize-explode every word-level vocab
    operator consumes (one row per word OCCURRENCE, not distinct).
    Callers running several such operators over the same corpus can build
    this once (optionally persist it) and pass it via their ``words=``
    parameters so the corpus is read and split a single time — the same
    ``vocab=``/``grams=``/``islands=`` sharing pattern as rounds 9-11."""
    from sed_spark.ext import scale_out

    return scale_out(df).select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    )


def word_doc_freq(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    words: DataFrame | None = None,
) -> DataFrame:
    """Corpus vocabulary table ``(word, tf, df)``: total occurrences and
    the number of distinct documents containing the word.

    Scale design: two-stage aggregation — (doc, word) counts first
    (map-side partial counts collapse within-document repeats before the
    shuffle), then a vocabulary-keyed rollup where ``count(*)`` over the
    (doc, word)-distinct rows IS the document frequency. No
    ``count(distinct ...)`` expand, and the second shuffle's input is
    already collapsed to one row per (doc, word).

    ``words`` accepts a precomputed :func:`exploded_words` frame so the
    corpus tokenize-explode is shared across operators.
    """
    w = words if words is not None else exploded_words(df, id_col, text_col)
    per_doc = w.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("__c"))
    return per_doc.groupBy("word").agg(
        F.sum("__c").cast("long").alias("tf"),
        F.count(F.lit(1)).alias("df"),
    )


def bpe_pair_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Corpus-weighted adjacent character-pair frequencies ``(pair, cnt)``
    — the statistic the first BPE merge iteration maximizes (Sennrich et
    al. 2016). Pass a precomputed :func:`word_doc_freq` table to reuse it
    across iterations.

    Scale design: computed from the vocabulary table, never the corpus —
    the pair explode touches |vocab| rows, and each pair's count is the
    tf-weighted sum (one vocabulary-sized shuffle on the pair key).
    """
    if vocab is None:
        vocab = word_doc_freq(df, id_col, text_col)
    pairs = vocab.select(
        "tf", F.explode(char_pairs_expr(F.col("word"))).alias("pair"),
    )
    return pairs.groupBy("pair").agg(F.sum("tf").cast("long").alias("cnt"))


def vocab_doc_stats(
    df: DataFrame,
    vocab: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    words: DataFrame | None = None,
) -> DataFrame:
    """Per-document corpus-rarity statistics against the vocabulary table:
    ``rarest_word_df`` (document frequency of the document's rarest word)
    and ``df_sum`` (sum of document frequencies over the document's
    DISTINCT words) — integer-exact signals (hapax-dense garbage scores a
    low ``rarest_word_df``; boilerplate-heavy text a high one), engine- and
    order-independent by construction.

    Scale design: (doc, word)-distinct explode, equi-join on the word key
    against the vocabulary (dimension-sized relative to the corpus — AQE
    broadcasts it when it fits, otherwise both sides shuffle on the word
    key), then one document-keyed aggregate.

    ``words`` accepts a precomputed :func:`exploded_words` frame (shared
    tokenize-explode).
    """
    if vocab is None:
        vocab = word_doc_freq(df, id_col, text_col, words=words)
    dw = (
        words if words is not None
        else exploded_words(df, id_col, text_col)
    ).distinct()
    return (
        dw.join(vocab.select("word", "df"), "word")
        .groupBy(id_col)
        .agg(
            F.min("df").alias("rarest_word_df"),
            F.sum("df").cast("long").alias("df_sum"),
        )
    )


def doc_top_pair(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    words: DataFrame | None = None,
) -> DataFrame:
    """Each document's most frequent adjacent character pair (over every
    word occurrence; ties broken lexicographically) — the document-local
    merge candidate. Joined against :func:`bpe_pair_counts` on the pair
    key, it pins the corpus-level table through a per-document probe.

    Returns ``(id_col, top_pair, top_pair_count)``; documents with no
    pair (all single-character words) get ``('', 0)``.

    ``words`` accepts a precomputed :func:`exploded_words` frame (shared
    tokenize-explode).
    """
    from pyspark.sql.window import Window

    w_src = words if words is not None else exploded_words(df, id_col, text_col)
    pairs = w_src.select(
        F.col(id_col),
        F.explode(char_pairs_expr(F.col("word"))).alias("pair"),
    )
    counted = pairs.groupBy(id_col, "pair").agg(
        F.count(F.lit(1)).alias("__c"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__c").desc(), F.col("pair").asc(),
    )
    top = (
        counted.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col(id_col),
            F.col("pair").alias("top_pair"),
            F.col("__c").alias("top_pair_count"),
        )
    )
    return (
        df.select(id_col)
        .join(top, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("top_pair", F.lit("")).alias("top_pair"),
            F.coalesce("top_pair_count", F.lit(0)).cast("long")
            .alias("top_pair_count"),
        )
    )


def symbols_expr(word: Column) -> Column:
    """A word as its initial symbol sequence: one single-character symbol
    per character (the state BPE training starts from; no end-of-word
    marker — a documented simplification vs Sennrich et al.'s ``</w>``)."""
    return F.when(
        F.length(word) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: word.substr(i, F.lit(1)),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))


def bpe_apply_expr(symbols: Column, merges) -> Column:
    """Apply an ordered BPE merge list to a symbol-array column, entirely
    in expressions. Each merge is one ``aggregate`` fold over the array:
    append the next symbol, or — when the accumulator's last symbol is the
    merge's left and the incoming one its right — replace the last symbol
    with the fusion. The fold is left-to-right and never re-examines a
    freshly fused symbol, which is exactly the non-overlapping scan of the
    reference algorithm (``[a,a,a]`` + merge ``(a,a)`` → ``[aa, a]``)."""
    def make_step(a: str, b: str):
        fused = a + b

        def step(acc, x):
            hit = (
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (x == F.lit(b))
            )
            return F.when(
                hit,
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(fused)),
                ),
            ).otherwise(F.concat(acc, F.array(x)))

        return step

    out = symbols
    for a, b in merges:
        out = F.aggregate(
            out, F.expr("CAST(array() AS array<string>)"), make_step(a, b),
        )
    return out


def bpe_train(
    df: DataFrame,
    n_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
    local_vocab_threshold: int = 2_000_000,
) -> list[tuple[str, str]]:
    """Distributed BPE tokenizer training (Sennrich et al., ACL 2016):
    iteratively fuse the corpus's most frequent adjacent symbol pair.
    Returns the ordered merge list (ties broken lexicographically, so the
    fit is deterministic). Stops early when no pair remains.

    Scale design: the corpus is aggregated ONCE into the (word, tf)
    vocabulary table (:func:`word_doc_freq`); the merge loop only ever
    touches that vocabulary-sized table — 100 TB of text never gets
    re-read or re-shuffled after the first aggregate, matching how
    reference BPE learners run on a frequency dict rather than raw text.

    The loop itself has two engines with IDENTICAL output (same counts,
    same ``(cnt DESC, l, r)`` tie-break — unit-tested against each other
    and against an independent pure-Python reference):

    * **driver-local** (vocabulary ≤ ``local_vocab_threshold`` rows,
      checked with a ``limit(threshold+1)`` probe so oversized vocabs
      cost one early-exiting job, not a full count): the (tf, symbols)
      table is collected once and merges run in-process with incremental
      pair-count maintenance. A production 32k-merge vocabulary costs
      ZERO Spark jobs per merge instead of 2 (~64k driver round-trips).
      Even the default threshold holds a 2M-word vocabulary in roughly
      a GB of driver heap — raise/lower it to match the driver's memory.
    * **distributed** (above the threshold, or ``local_vocab_threshold=0``
      to force it): per merge, one pair-count aggregate (map-side
      partials) whose top-1 row reaches the driver, then one
      expression-only fold updating the symbol arrays, checkpointed so
      plans don't stack.
    """
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    if vocab is None:
        vocab = word_doc_freq(df, id_col, text_col)
    sym_plan = vocab.select("tf", symbols_expr(F.col("word")).alias("sym"))
    if local_vocab_threshold > 0:
        probe = sym_plan.limit(local_vocab_threshold + 1).collect()
        if len(probe) <= local_vocab_threshold:
            return _bpe_train_local(
                [(list(r.sym), int(r.tf)) for r in probe], n_merges,
            )
    sym = sym_plan.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts = (
            sym.select(
                "tf",
                F.explode(
                    F.when(
                        F.size("sym") >= 2,
                        F.transform(
                            F.sequence(F.lit(0), F.size("sym") - 2),
                            lambda i: F.struct(
                                F.element_at(F.col("sym"), (i + 1).cast("int"))
                                .alias("l"),
                                F.element_at(F.col("sym"), (i + 2).cast("int"))
                                .alias("r"),
                            ),
                        ),
                    ).otherwise(
                        F.expr(
                            "CAST(array() AS array<struct<l:string,r:string>>)",
                        ),
                    ),
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("tf").alias("cnt"))
        )
        top = pair_counts.orderBy(
            F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc(),
        ).limit(1).collect()
        if not top:
            break
        a, b = top[0].l, top[0].r
        merges.append((a, b))
        sym = sym.select(
            "tf", bpe_apply_expr(F.col("sym"), [(a, b)]).alias("sym"),
        ).localCheckpoint(eager=True)
    return merges


def _apply_merge_local(s: list[str], a: str, b: str) -> list[str]:
    """One merge on one symbol list — the exact greedy left-to-right
    non-overlapping scan of :func:`bpe_apply_expr`'s fold (``[a,a,a]`` +
    merge ``(a,a)`` → ``[aa, a]``)."""
    out: list[str] = []
    fused = a + b
    for x in s:
        if out and out[-1] == a and x == b:
            out[-1] = fused
        else:
            out.append(x)
    return out


def _bpe_train_local(
    words: list[tuple[list[str], int]], n_merges: int,
) -> list[tuple[str, str]]:
    """Driver-local BPE merge loop over the collected (symbols, tf)
    vocabulary — bit-identical merge lists to the distributed loop (same
    tf-weighted pair counts, same ``(cnt DESC, l ASC, r ASC)`` pick).

    Incremental maintenance: a pair→count map plus a pair→word-index
    inverted list; each merge touches only the words containing the fused
    pair, so total work is proportional to affected words, not
    ``n_merges × vocabulary``. A fused pair can never reappear (symbols
    only ever grow), so its inverted list is processed exactly once.
    """
    from collections import defaultdict

    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for idx, (s, tf) in enumerate(words):
        for i in range(len(s) - 1):
            p = (s[i], s[i + 1])
            pair_counts[p] += tf
            pair_words[p].add(idx)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best: tuple[int, str, str] | None = None
        for (l, r), c in pair_counts.items():
            if c <= 0:
                continue
            key = (-c, l, r)
            if best is None or key < best:
                best = key
        if best is None:
            break
        a, b = best[1], best[2]
        merges.append((a, b))
        for idx in pair_words.pop((a, b), ()):
            s, tf = words[idx]
            for i in range(len(s) - 1):
                pair_counts[(s[i], s[i + 1])] -= tf
            s = _apply_merge_local(s, a, b)
            words[idx] = (s, tf)
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                pair_counts[p] += tf
                pair_words[p].add(idx)
        pair_counts.pop((a, b), None)
    return merges


def bpe_token_counts(
    df: DataFrame,
    merges,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Per-document token count under a trained BPE merge list — the
    context-window accounting a packing/budgeting stage needs. The merges
    are applied once per VOCABULARY word (expression fold, vocabulary-
    sized), then each document sums its word occurrences' subtoken counts
    through an equi-join on the word key: the corpus is never re-tokenized
    row by row. Returns ``(id_col, n_bpe_tokens)``."""
    from sed_spark.ext import scale_out

    if vocab is None:
        vocab = word_doc_freq(df, id_col, text_col)
    per_word = vocab.select(
        "word",
        F.size(bpe_apply_expr(symbols_expr(F.col("word")), merges))
        .alias("__n_sub"),
    )
    w = scale_out(df).select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    )
    return (
        w.join(per_word, "word")
        .groupBy(id_col)
        .agg(F.sum("__n_sub").cast("long").alias("n_bpe_tokens"))
    )


def bpe_vocab(vocab: DataFrame, merges) -> dict[str, int]:
    """Symbol → token-id mapping for a trained merge list: base
    single-character symbols first (sorted, ids ``0..B-1``), then each
    merge's fused symbol in merge order (``B``, ``B+1``, ...; a fused
    string that already exists — e.g. two merge paths producing the same
    surface form — keeps its first id). The alphabet comes from the
    vocabulary table's words, so the collect is alphabet-sized (one row
    per distinct character), never corpus- or vocabulary-sized."""
    chars = sorted(
        r["sym"]
        for r in vocab.select(
            F.explode(symbols_expr(F.col("word"))).alias("sym"),
        ).distinct().collect()
    )
    sym2id = {c: i for i, c in enumerate(chars)}
    for a, b in merges:
        fused = a + b
        if fused not in sym2id:
            sym2id[fused] = len(sym2id)
    return sym2id


def bpe_encode(
    df: DataFrame,
    merges,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
    unk_id: int = -1,
) -> DataFrame:
    """Per-document TOKEN-ID sequences under a trained merge list —
    ``(id_col, token_ids array<int>)`` in original word order, the array
    a packing stage (:func:`sed_spark.ext.text.pack_sequences`) or a
    shard writer feeds a trainer.

    Scale design (same contract as :func:`bpe_token_counts`): the merges
    are applied once per VOCABULARY word and mapped to ids through a
    literal map (alphabet + merges entries — tokenizer-sized, rides in
    the expression tree), so the corpus itself is never re-tokenized row
    by row. Documents then ``posexplode`` their words, join the per-word
    id arrays on the word key, and reassemble with
    ``array_sort(collect_list(struct(pos, ids)))`` + ``flatten`` — the
    per-document group is document-sized, never corpus-sized.

    Out-of-vocabulary handling (both cases yield ``unk_id``, never silent
    loss): a corpus WORD absent from an explicitly passed ``vocab`` table
    encodes as a single ``unk_id`` (left join + coalesce — the word keeps
    its position in the sequence); a SYMBOL outside the vocabulary's
    alphabet (possible only when ``vocab`` is a different corpus's table)
    encodes each unmapped subtoken as ``unk_id``.
    """
    from sed_spark.ext import scale_out

    if vocab is None:
        vocab = word_doc_freq(df, id_col, text_col)
    sym2id = bpe_vocab(vocab, merges)
    id_map = F.create_map(
        *[F.lit(x) for kv in sym2id.items() for x in kv],
    )
    per_word = vocab.select(
        "word",
        F.transform(
            bpe_apply_expr(symbols_expr(F.col("word")), merges),
            lambda s: F.coalesce(
                F.element_at(id_map, s), F.lit(int(unk_id)),
            ).cast("int"),
        ).alias("__ids"),
    )
    pos_words = scale_out(df).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("__pos", "word"),
    ).filter(F.col("word") != "")  # empty split tokens are not OOV words
    per_doc = (
        pos_words.join(per_word, "word", "left")
        .select(
            id_col,
            "__pos",
            # word not in the vocab table at all -> one unk_id, keeping
            # its slot in the sequence (silent drop would shorten the
            # sample a packing stage hands the trainer)
            F.coalesce(
                "__ids", F.array(F.lit(int(unk_id)).cast("int")),
            ).alias("__ids"),
        )
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__ids")),
                    ),
                    lambda x: x["__ids"],
                ),
            ).alias("token_ids"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(
                "token_ids", F.expr("CAST(array() AS array<int>)"),
            ).alias("token_ids"),
        )
    )


def bigram_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    grams: DataFrame | None = None,
) -> DataFrame:
    """Corpus word-bigram counts ``(g, cnt)`` — the n-gram language-model
    table (the n=2 row of a count-based LM). One explode + one keyed
    aggregate with map-side partials; the result is vocabulary²-bounded,
    in practice Zipf-truncated far below that.

    ``grams`` accepts a precomputed non-distinct ``exploded_shingles(df,
    n=2)`` frame so the corpus bigram explode is shared across operators.
    """
    if grams is None:
        from sed_spark.ext.dedup import exploded_shingles

        grams = exploded_shingles(df, id_col, text_col, n=2)
    return grams.groupBy("g").agg(F.count(F.lit(1)).alias("cnt"))


def lm_familiarity(
    df: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    grams: DataFrame | None = None,
) -> DataFrame:
    """Count-based n-gram LM familiarity — the integer-exact core of a
    CCNet-style perplexity gate (Wenzek et al., LREC 2020: score new data
    with an LM trained on a reference corpus; low-likelihood documents
    are tail quality): each document's word bigrams are looked up in the
    ``lm`` count table (:func:`bigram_counts` of the REFERENCE corpus,
    not of ``df`` itself) and aggregated to

    * ``n_bigrams``   — the document's bigram count,
    * ``n_unseen``    — bigrams absent from the LM (the OOV-rate signal),
    * ``seen_cnt_sum``— sum of the LM counts of the seen bigrams (the
      monotone integer core of the log-likelihood; callers turn it into
      a float score with whatever smoothing policy they deploy).

    Integer-exact by construction, so the verdicts are engine- and
    order-independent. Scale design: one explode, one equi-join on the
    gram key (the LM table is dimension-sized relative to the corpus —
    AQE broadcasts it when it fits), one document-keyed aggregate.

    ``grams`` accepts a precomputed non-distinct ``exploded_shingles(df,
    n=2)`` frame (shared bigram explode).
    """
    if grams is None:
        from sed_spark.ext.dedup import exploded_shingles

        grams = exploded_shingles(df, id_col, text_col, n=2)
    scored = grams.join(
        lm.select(F.col("g"), F.col("cnt").alias("__lm_cnt")), "g", "left",
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(
            F.when(F.col("__lm_cnt").isNull(), 1).otherwise(0),
        ).cast("long").alias("n_unseen"),
        F.sum(F.coalesce("__lm_cnt", F.lit(0))).cast("long")
        .alias("seen_cnt_sum"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("n_unseen", F.lit(0)).alias("n_unseen"),
            F.coalesce("seen_cnt_sum", F.lit(0)).alias("seen_cnt_sum"),
        )
    )


# ---------------------------------------------------------------------------
# unigram language-model tokenizer (SentencePiece-style)
# ---------------------------------------------------------------------------

#: cost charged to an out-of-alphabet single character during Viterbi
#: segmentation (~100 nats in micro-nats — worse than any real piece, so
#: it is only ever taken when no trained piece covers the position)
UNIGRAM_UNK_SCORE_MICRO = 100_000_000

# Viterbi DP states carry their piece arrays — O(n²) bytes over a word of
# n chars. Per VOCABULARY word that is pennies for natural words, but one
# pathological token (a URL, a DNA string, an unsegmented CJK run) would
# blow executor memory, so words beyond this cap take a per-char fallback
# segmentation instead of the DP — the same class of guard as BERT's
# max_input_chars_per_word (=100; long words there become [UNK]).
# 64² small states ≈ a few KiB — safe; both engines apply the identical
# cap so fits stay bit-identical.
UNIGRAM_MAX_WORD_LEN = 64


def _unigram_quantize(counts: dict[str, int]) -> dict[str, int]:
    """Integer micro-nat scores from exact integer piece counts:
    ``score = round(-1e6 * ln(count / total))``. The ONLY float op of the
    whole unigram pipeline happens here, on the driver, once per M-step —
    every engine-side comparison (Spark expression DP, DuckDB oracle,
    Python reference) is then pure integer arithmetic on these quantized
    literals, so segmentations are bit-identical across engines."""
    import math

    total = sum(counts.values())
    return {
        p: int(round(-1e6 * math.log(c / total)))
        for p, c in counts.items()
    }


def _viterbi_local(
    word: str,
    scores: dict[str, int],
    max_piece_len: int,
    unk: int = UNIGRAM_UNK_SCORE_MICRO,
    max_word_len: int = UNIGRAM_MAX_WORD_LEN,
) -> tuple[str, ...]:
    """Driver-side Viterbi segmentation — the exact tie-break contract of
    :func:`unigram_segment_expr` (and unit-tested against it): per
    position, minimize ``(cum_cost, cum_ntok, max_len - k, pieces)`` over
    candidate last-piece lengths ``k``; an out-of-vocabulary single
    character is always a candidate at ``unk`` cost, so segmentation
    never fails. Words longer than ``max_word_len`` take the per-char
    fallback — the same guard, and the same reason, as the expression
    twin."""
    n = len(word)
    if n > max_word_len:
        return tuple(word)
    dp: list[tuple[int, int, int, tuple[str, ...]]] = [(0, 0, 0, ())] * (n + 1)
    for i in range(1, n + 1):
        cands = []
        for k in range(1, min(max_piece_len, i) + 1):
            piece = word[i - k:i]
            c = scores.get(piece)
            if c is None:
                if k != 1:
                    continue
                c = unk
            prev = dp[i - k]
            cands.append(
                (prev[0] + c, prev[1] + 1, max_piece_len - k, prev[3] + (piece,)),
            )
        dp[i] = min(cands)
    return dp[n][3]


def _unigram_em_local(
    words: list[tuple[str, int]],
    seed_counts: dict[str, int],
    vocab_size: int,
    max_piece_len: int,
    n_iter: int,
    max_word_len: int = UNIGRAM_MAX_WORD_LEN,
) -> list[tuple[str, int]]:
    """Shared M-step/prune driver logic over a count callback-free local
    E-step (the distributed engine computes the SAME per-round counts
    with the expression DP and re-enters :func:`_unigram_finalize`)."""
    counts = dict(seed_counts)
    for _ in range(n_iter):
        scores = _unigram_quantize(counts)
        counts = _unigram_estep_counts_local(
            words, scores, max_piece_len, max_word_len,
        )
    return _unigram_finalize(counts, vocab_size)


def _unigram_estep_counts_local(
    words: list[tuple[str, int]],
    scores: dict[str, int],
    max_piece_len: int,
    max_word_len: int = UNIGRAM_MAX_WORD_LEN,
) -> dict[str, int]:
    counts: dict[str, int] = {}
    for w, tf in words:
        for p in _viterbi_local(w, scores, max_piece_len,
                                max_word_len=max_word_len):
            counts[p] = counts.get(p, 0) + tf
    # hard-EM zeros: unused single chars keep a floor count of 1 (the
    # alphabet must stay covered); unused multi-char pieces drop
    for p in scores:
        if p not in counts and len(p) == 1:
            counts[p] = 1
    return counts


def _unigram_finalize(
    counts: dict[str, int], vocab_size: int,
) -> list[tuple[str, int]]:
    """Prune to ``vocab_size`` (every single char survives — coverage —
    plus the top multi-char pieces by ``(count DESC, piece ASC)``), then
    requantize over the survivors. Returns ``(piece, score_micro)``
    sorted by piece — the deterministic id order of
    :func:`unigram_vocab`."""
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    if vocab_size < len(chars):
        raise ValueError(
            f"vocab_size={vocab_size} below alphabet size {len(chars)}",
        )
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[: vocab_size - len(chars)]
    kept = dict(chars)
    kept.update(dict(multi))
    scores = _unigram_quantize(kept)
    return sorted(scores.items())


def _all_substrings_expr(word: Column, max_piece_len: int) -> Column:
    """Every substring of length 1..max_piece_len as a (flattened) array
    — the unigram seed candidates of one word."""
    n = F.length(word)
    return F.when(
        n > 0,
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.transform(
                    F.sequence(F.lit(1), F.least(F.lit(max_piece_len), n - i + 1)),
                    lambda k: word.substr(i, k),
                ),
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))


def unigram_segment_expr(
    word: Column,
    pieces,
    max_piece_len: int | None = None,
    unk_score_micro: int = UNIGRAM_UNK_SCORE_MICRO,
    max_word_len: int = UNIGRAM_MAX_WORD_LEN,
) -> Column:
    """Viterbi-best unigram-LM segmentation of a word column as an
    ``array<string>`` of pieces, entirely in expressions — the engine-side
    twin of :func:`_viterbi_local`.

    ``pieces`` is the trained ``[(piece, score_micro), ...]`` list; it
    rides in the expression tree as a literal map (tokenizer-sized), so
    the DP is pure integer arithmetic — bit-identical on any engine. One
    left-to-right ``aggregate`` fold builds the DP table (an array of
    ``(cost, ntok, kneg, ps)`` states, one per prefix); each step takes
    the ``array_min`` over the ≤``max_piece_len`` candidate last pieces,
    which encodes the deterministic tie-break ``(lower cost, fewer
    tokens, longer last piece, lexicographic pieces)``. States carry
    their piece arrays, so no backtracking pass re-reads the table
    (words are whitespace tokens — the O(n²) state payload is bytes, and
    the fold only ever runs per VOCABULARY word, never per corpus row).

    The O(n²) payload is ENFORCED bounded: a word longer than
    ``max_word_len`` (default :data:`UNIGRAM_MAX_WORD_LEN`) skips the DP
    and segments per character — a CaseWhen branch, evaluated only for
    the offending rows, so one pathological vocabulary token (URL, DNA
    string, no-whitespace CJK run) degrades ITS OWN segmentation instead
    of blowing executor memory. :func:`_viterbi_local` mirrors the cap
    exactly, keeping the two engines bit-identical."""
    pieces = list(pieces)
    if max_piece_len is None:
        max_piece_len = max((len(p) for p, _ in pieces), default=1)
    score_map = F.create_map(
        *[F.lit(x) for p, s in pieces for x in (p, int(s))],
    )
    n = F.length(word)

    def step(acc, i):
        cands = []
        for k in range(1, max_piece_len + 1):
            piece = word.substr(i - F.lit(k) + 1, F.lit(k))
            cost = F.element_at(score_map, piece).cast("long")
            if k == 1:
                cost = F.coalesce(cost, F.lit(int(unk_score_micro)).cast("long"))
            prev = F.element_at(acc, i - F.lit(k) + 1)
            cands.append(
                F.when(
                    (F.lit(k) <= i) & cost.isNotNull(),
                    F.struct(
                        (prev["cost"] + cost).alias("cost"),
                        (prev["ntok"] + F.lit(1)).alias("ntok"),
                        F.lit(max_piece_len - k).alias("kneg"),
                        F.concat(prev["ps"], F.array(piece)).alias("ps"),
                    ),
                ),
            )
        best = F.array_min(F.array(*cands))
        return F.concat(acc, F.array(best))

    init = F.array(
        F.struct(
            F.lit(0).cast("long").alias("cost"),
            F.lit(0).cast("int").alias("ntok"),
            F.lit(0).cast("int").alias("kneg"),
            F.expr("CAST(array() AS array<string>)").alias("ps"),
        ),
    )
    dp = F.aggregate(
        # sequence(1, 0) would be DESCENDING — clamp and gate on n > 0;
        # the sequence is also capped so the DP never materializes past
        # max_word_len even transiently (the per-char branch wins anyway)
        F.sequence(F.lit(1), F.greatest(F.least(n, F.lit(max_word_len)), F.lit(1))),
        init,
        step,
        lambda acc: F.element_at(acc, -1)["ps"],
    )
    per_char = F.filter(F.split(word, ""), lambda c: c != F.lit(""))
    return (
        F.when(n > F.lit(max_word_len), per_char)
        .when(n > 0, dp)
        .otherwise(F.expr("CAST(array() AS array<string>)"))
    )


def unigram_train(
    df: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
    max_piece_len: int = 4,
    n_iter: int = 2,
    seed_size: int = 1_000,
    local_vocab_threshold: int = 2_000_000,
    max_word_len: int = UNIGRAM_MAX_WORD_LEN,
) -> list[tuple[str, int]]:
    """Distributed unigram-LM tokenizer training (the SentencePiece
    unigram model, Kudo, ACL 2018), deterministic hard-EM variant:

    1. **seed** — every substring of length 1..``max_piece_len`` of the
       vocabulary's words, tf-weighted; the whole alphabet plus the top
       ``seed_size`` multi-char candidates by ``(count DESC, piece ASC)``;
    2. **EM** — ``n_iter`` rounds of Viterbi (hard) E-step piece counts
       and a quantizing M-step (:func:`_unigram_quantize`: the one float
       op, driver-side; everything the engines compare is integer).
       Kudo's full EM marginalizes the lattice in floats — the hard-EM
       simplification is what makes the fit reproducible cross-engine,
       the same determinism trade the suite's BPE trainer makes;
    3. **prune** — all single chars plus the best multi-char pieces to
       ``vocab_size``, requantized (:func:`_unigram_finalize`).

    Scale contract (same as :func:`bpe_train`): the corpus is aggregated
    ONCE into the (word, tf) vocabulary (:func:`word_doc_freq`); 100 TB
    of text is never re-read. Two engines with IDENTICAL output
    (unit-tested against each other):

    * **driver-local** (vocabulary ≤ ``local_vocab_threshold``, probed
      with ``limit(threshold+1)``): the word/tf list collects once and
      EM runs in-process;
    * **distributed**: each E-step is ONE vocabulary-sized job — the
      expression DP (:func:`unigram_segment_expr`) segments every vocab
      word under the round's literal score map, explodes the pieces and
      tf-weights one hash aggregate; only the tokenizer-sized
      (piece, count) table reaches the driver for the M-step.

    Words longer than ``max_word_len`` segment per character in every
    E-step (both engines, identically) — the DP's O(n²) state payload
    is bounded no matter what pathological tokens the corpus contains;
    see :data:`UNIGRAM_MAX_WORD_LEN`.

    Returns ``[(piece, score_micro), ...]`` sorted by piece.
    """
    if vocab_size < 2:
        raise ValueError(f"vocab_size must be >= 2, got {vocab_size}")
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0, got {n_iter}")
    if vocab is None:
        vocab = word_doc_freq(df, id_col, text_col)
    wtf_plan = vocab.select("word", "tf")
    if local_vocab_threshold > 0:
        probe = wtf_plan.limit(local_vocab_threshold + 1).collect()
        if len(probe) <= local_vocab_threshold:
            words = [(r.word, int(r.tf)) for r in probe]
            seed = _unigram_seed_local(words, max_piece_len, seed_size)
            return _unigram_em_local(
                words, seed, vocab_size, max_piece_len, n_iter,
                max_word_len,
            )
    # distributed engine: vocab-sized jobs, tokenizer-sized collects
    sym = wtf_plan.localCheckpoint(eager=True)
    sub_counts = (
        sym.select(
            "tf",
            F.explode(
                _all_substrings_expr(F.col("word"), max_piece_len),
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("tf").cast("long").alias("cnt"))
    )
    chars = sub_counts.filter(F.length("piece") == 1).collect()
    multi = (
        sub_counts.filter(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(seed_size)
        .collect()
    )
    counts = {r.piece: int(r.cnt) for r in chars}
    counts.update({r.piece: int(r.cnt) for r in multi})
    for _ in range(n_iter):
        scores = _unigram_quantize(counts)
        seg = sym.select(
            "tf",
            F.explode(
                unigram_segment_expr(
                    F.col("word"), sorted(scores.items()), max_piece_len,
                    max_word_len=max_word_len,
                ),
            ).alias("piece"),
        )
        rows = seg.groupBy("piece").agg(
            F.sum("tf").cast("long").alias("cnt"),
        ).collect()
        counts = {r.piece: int(r.cnt) for r in rows}
        for p in scores:
            if p not in counts and len(p) == 1:
                counts[p] = 1
    return _unigram_finalize(counts, vocab_size)


def _unigram_seed_local(
    words: list[tuple[str, int]], max_piece_len: int, seed_size: int,
) -> dict[str, int]:
    counts: dict[str, int] = {}
    for w, tf in words:
        n = len(w)
        for i in range(n):
            for k in range(1, min(max_piece_len, n - i) + 1):
                p = w[i:i + k]
                counts[p] = counts.get(p, 0) + tf
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_size]
    chars.update(dict(multi))
    return chars


def unigram_vocab(pieces) -> dict[str, int]:
    """Piece → token-id mapping: pieces sorted lexicographically get ids
    ``0..V-1`` — a pure function of the piece SET, so any engine (and the
    pinned reference) derives identical ids."""
    return {p: i for i, (p, _) in enumerate(sorted(pieces))}


def unigram_token_counts(
    df: DataFrame,
    pieces,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
    max_word_len: int = UNIGRAM_MAX_WORD_LEN,
) -> DataFrame:
    """Per-document token count under a trained unigram piece list —
    the same vocabulary-sized apply + word-key join shape as
    :func:`bpe_token_counts` (the corpus is never segmented row by row).
    Returns ``(id_col, n_unigram_tokens)``."""
    from sed_spark.ext import scale_out

    if vocab is None:
        vocab = word_doc_freq(df, id_col, text_col)
    per_word = vocab.select(
        "word",
        F.size(
            unigram_segment_expr(F.col("word"), pieces,
                                 max_word_len=max_word_len),
        ).alias("__n_sub"),
    )
    w = scale_out(df).select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    )
    return (
        w.join(per_word, "word")
        .groupBy(id_col)
        .agg(F.sum("__n_sub").cast("long").alias("n_unigram_tokens"))
    )


def unigram_encode(
    df: DataFrame,
    pieces,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
    unk_id: int = -1,
    max_word_len: int = UNIGRAM_MAX_WORD_LEN,
) -> DataFrame:
    """Per-document TOKEN-ID sequences under a trained unigram piece
    list — ``(id_col, token_ids array<int>)`` in original word order;
    the unigram twin of :func:`bpe_encode` with the identical OOV
    contract: a word absent from an explicitly passed ``vocab`` table
    encodes as one ``unk_id``; a segmentation falling back to an
    out-of-vocabulary single character encodes that piece as ``unk_id``.
    """
    from sed_spark.ext import scale_out

    if vocab is None:
        vocab = word_doc_freq(df, id_col, text_col)
    sym2id = unigram_vocab(pieces)
    id_map = F.create_map(
        *[F.lit(x) for kv in sym2id.items() for x in kv],
    )
    per_word = vocab.select(
        "word",
        F.transform(
            unigram_segment_expr(F.col("word"), pieces,
                                 max_word_len=max_word_len),
            lambda s: F.coalesce(
                F.element_at(id_map, s), F.lit(int(unk_id)),
            ).cast("int"),
        ).alias("__ids"),
    )
    pos_words = scale_out(df).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("__pos", "word"),
    ).filter(F.col("word") != "")
    per_doc = (
        pos_words.join(per_word, "word", "left")
        .select(
            id_col,
            "__pos",
            F.coalesce(
                "__ids", F.array(F.lit(int(unk_id)).cast("int")),
            ).alias("__ids"),
        )
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__ids")),
                    ),
                    lambda x: x["__ids"],
                ),
            ).alias("token_ids"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(
                "token_ids", F.expr("CAST(array() AS array<int>)"),
            ).alias("token_ids"),
        )
    )


# ---------------------------------------------------------------------------
# WordPiece greedy encoder (BERT-family tokenization)
# ---------------------------------------------------------------------------

def _wordpiece_local(
    word: str,
    piece_set: frozenset | set,
    max_piece_len: int,
    unk_token: str = "[UNK]",
    cont_prefix: str = "##",
) -> tuple[str, ...]:
    """Driver-side mirror of :func:`wordpiece_pieces_expr` — BERT's
    WordpieceTokenizer rule: greedy LONGEST-match-first left to right;
    pieces matched past the word start must carry the continuation
    prefix in the vocab (``##ing``); any position with no match makes
    the WHOLE word ``unk_token`` (the published algorithm's all-or-
    nothing contract, unlike unigram's per-char fallback)."""
    n = len(word)
    if n == 0:
        return ()
    out: list[str] = []
    i = 0
    while i < n:
        matched = None
        for k in range(min(max_piece_len, n - i), 0, -1):
            cand = word[i:i + k] if i == 0 else cont_prefix + word[i:i + k]
            if cand in piece_set:
                matched = cand
                break
        if matched is None:
            return (unk_token,)
        out.append(matched)
        i += len(matched) - (len(cont_prefix) if i > 0 else 0)
    return tuple(out)


def wordpiece_pieces_expr(
    word: Column,
    pieces,
    max_piece_len: int | None = None,
    unk_token: str = "[UNK]",
    cont_prefix: str = "##",
) -> Column:
    """WordPiece segmentation of a word column as ``array<string>``,
    entirely in expressions (the greedy twin of
    :func:`unigram_segment_expr`'s Viterbi DP).

    ``pieces`` is the vocab's piece iterable — word-initial surfaces
    plain, continuation surfaces ``##``-prefixed, exactly how BERT
    vocabularies ship. It rides as a literal map (value 1 — only
    membership matters), so matching is pure string lookups: bit-
    identical on any engine. One fold over positions; each step tries
    the LONGEST candidate first (a coalesce over length-descending
    lookups). A position with no match poisons the word to
    ``[unk_token]`` — the published all-or-nothing rule.
    """
    plist = sorted(set(pieces))
    if max_piece_len is None:
        max_piece_len = max(
            (len(p) - (len(cont_prefix) if p.startswith(cont_prefix) else 0)
             for p in plist),
            default=1,
        )
    member = F.create_map(
        *[F.lit(x) for p in plist for x in (p, 1)],
    )
    n = F.length(word)

    def step(acc, _):
        pos = acc["pos"]  # 0-based chars consumed
        at_start = pos == 0
        cands = []
        for k in range(max_piece_len, 0, -1):
            surface = word.substr(pos + 1, F.lit(k))
            cand = F.when(
                at_start, surface,
            ).otherwise(F.concat(F.lit(cont_prefix), surface))
            cands.append(
                F.when(
                    (pos + F.lit(k) <= n)
                    & F.element_at(member, cand).isNotNull(),
                    cand,
                ),
            )
        best = F.coalesce(*cands, F.lit(None).cast("string"))
        step_len = F.length(best) - F.when(
            at_start, F.lit(0),
        ).otherwise(F.lit(len(cont_prefix)))
        done_or_failed = (pos >= n) | acc["failed"]
        return F.when(done_or_failed, acc).otherwise(
            F.when(
                best.isNull(),
                F.struct(
                    n.alias("pos"),
                    F.lit(True).alias("failed"),
                    F.array(F.lit(unk_token)).alias("ps"),
                ),
            ).otherwise(
                F.struct(
                    (pos + step_len).alias("pos"),
                    F.lit(False).alias("failed"),
                    F.concat(acc["ps"], F.array(best)).alias("ps"),
                ),
            ),
        )

    init = F.struct(
        F.lit(0).cast("int").alias("pos"),
        F.lit(False).alias("failed"),
        F.expr("CAST(array() AS array<string>)").alias("ps"),
    )
    folded = F.aggregate(
        # each step consumes >= 1 char, so n steps always finish;
        # sequence(1, 0) would be descending — clamp and gate on n > 0
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        init,
        step,
        lambda acc: acc["ps"],
    )
    return F.when(n > 0, folded).otherwise(
        F.expr("CAST(array() AS array<string>)"),
    )


def wordpiece_token_counts(
    df: DataFrame,
    pieces,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
    unk_token: str = "[UNK]",
) -> DataFrame:
    """Per-document token count under a WordPiece vocab — the same
    vocabulary-sized apply + word-key join shape as
    :func:`bpe_token_counts` / :func:`unigram_token_counts`. Returns
    ``(id_col, n_wordpiece_tokens)``."""
    from sed_spark.ext import scale_out

    if vocab is None:
        vocab = word_doc_freq(df, id_col, text_col)
    per_word = vocab.select(
        "word",
        F.size(
            wordpiece_pieces_expr(F.col("word"), pieces,
                                  unk_token=unk_token),
        ).alias("__n_sub"),
    )
    w = scale_out(df).select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    )
    return (
        w.join(per_word, "word")
        .groupBy(id_col)
        .agg(F.sum("__n_sub").cast("long").alias("n_wordpiece_tokens"))
    )


# ---------------------------------------------------------------------------
# WordPiece trainer (Schuster & Nakajima 2012 / BERT likelihood merges)
# ---------------------------------------------------------------------------

#: fixed-point multiplier for the WordPiece merge score. The published
#: objective picks the adjacent pair maximizing cnt(xy)/(cnt(x)*cnt(y));
#: ranking exact fractions distributedly needs one sortable integer, so
#: both engines (and the pinned reference) use the FLOOR-quotient
#: cnt(xy)*SCALE div (cnt(x)*cnt(y)) — exact integer semantics, and the
#: quotient fits int64 because cnt(xy) <= min(cnt(x), cnt(y)) bounds it
#: by SCALE.
WORDPIECE_SCORE_SCALE = 10**18


def wordpiece_symbols_expr(word: Column, cont_prefix: str = "##") -> Column:
    """A word as its initial WordPiece symbol sequence: first character
    plain, every later character continuation-prefixed (``abc`` →
    ``[a, ##b, ##c]``) — the training start state."""
    n = F.length(word)
    tail = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(2), F.greatest(n, F.lit(2))),
            lambda i: F.concat(F.lit(cont_prefix), word.substr(i, F.lit(1))),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    return F.when(
        n > 0,
        F.concat(F.array(word.substr(F.lit(1), F.lit(1))), tail),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))


def _wp_fuse(a: str, b: str, cont_prefix: str = "##") -> str:
    """Fused surface of an adjacent symbol pair: the right symbol is
    always a continuation (it follows something), so the fusion strips
    its prefix and keeps the left symbol's position status."""
    return a + b[len(cont_prefix):]


def _wp_apply_expr(symbols: Column, a: str, b: str,
                   cont_prefix: str = "##") -> Column:
    """One WordPiece merge as the same left-to-right non-overlapping
    fold as :func:`bpe_apply_expr`, with the prefix-stripping fusion."""
    fused = _wp_fuse(a, b, cont_prefix)

    def step(acc, x):
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b))
        )
        return F.when(
            hit,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(fused)),
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(
        symbols, F.expr("CAST(array() AS array<string>)"), step,
    )


def _wp_train_local(
    words: list[tuple[list[str], int]],
    n_merges: int,
    cont_prefix: str = "##",
) -> list[str]:
    """Driver-local WordPiece merge loop — identical pick rule to the
    distributed engine: maximize the floor-quotient likelihood score,
    ties by ``(l, r)`` lexicographic."""
    vocab_new: list[str] = []
    for _ in range(n_merges):
        unit: dict[str, int] = {}
        pair: dict[tuple[str, str], int] = {}
        for s, tf in words:
            for x in s:
                unit[x] = unit.get(x, 0) + tf
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                pair[p] = pair.get(p, 0) + tf
        if not pair:
            break
        best = None
        for (l, r), c in pair.items():
            score = c * WORDPIECE_SCORE_SCALE // (unit[l] * unit[r])
            key = (-score, l, r)
            if best is None or key < best:
                best = key
        a, b = best[1], best[2]
        fused = _wp_fuse(a, b, cont_prefix)
        vocab_new.append(fused)
        for idx, (s, tf) in enumerate(words):
            out: list[str] = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = fused
                else:
                    out.append(x)
            words[idx] = (out, tf)
    return vocab_new


def wordpiece_train(
    df: DataFrame,
    n_merges: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
    cont_prefix: str = "##",
    local_vocab_threshold: int = 2_000_000,
) -> list[str]:
    """Distributed WordPiece vocabulary training (Schuster & Nakajima,
    ICASSP 2012 — the BERT tokenizer's learner): iteratively fuse the
    adjacent symbol pair with the highest LIKELIHOOD score
    ``cnt(xy)/(cnt(x)·cnt(y))`` (where BPE uses raw ``cnt(xy)``),
    starting from first-char-plain / ``##``-continuation symbols.
    Scores rank through the exact integer floor quotient
    (:data:`WORDPIECE_SCORE_SCALE`), ties by ``(l, r)`` — the fit is a
    pure function of the corpus on any engine.

    Returns the learned vocabulary: base symbols (every word-initial
    char plain + every continuation char ``##``-prefixed, sorted) then
    each merge's fused surface in merge order — directly consumable by
    :func:`wordpiece_pieces_expr` / :func:`wordpiece_token_counts`.

    Scale contract (same as :func:`bpe_train` / :func:`unigram_train`):
    ONE corpus aggregation into the (word, tf) vocabulary; the merge
    loop is driver-local under ``local_vocab_threshold`` or, above it,
    per merge ONE vocabulary-sized pair+unit count aggregate whose
    top-1 scored row reaches the driver, then an expression-only fold.
    """
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    if vocab is None:
        vocab = word_doc_freq(df, id_col, text_col)
    sym_plan = vocab.select(
        "tf", wordpiece_symbols_expr(F.col("word"), cont_prefix).alias("sym"),
    )
    if local_vocab_threshold > 0:
        probe = sym_plan.limit(local_vocab_threshold + 1).collect()
        if len(probe) <= local_vocab_threshold:
            words = [(list(r.sym), int(r.tf)) for r in probe]
            base = sorted({x for s, _ in words for x in s})
            return base + _wp_train_local(words, n_merges, cont_prefix)
    sym = sym_plan.localCheckpoint(eager=True)
    base = sorted(
        r.x
        for r in sym.select(F.explode("sym").alias("x")).distinct().collect()
    )
    merges: list[str] = []
    for _ in range(n_merges):
        units = (
            sym.select("tf", F.explode("sym").alias("x"))
            .groupBy("x")
            .agg(F.sum("tf").cast("long").alias("cnt"))
        )
        pairs = (
            sym.select(
                "tf",
                F.explode(
                    F.when(
                        F.size("sym") >= 2,
                        F.transform(
                            F.sequence(F.lit(0), F.size("sym") - 2),
                            lambda i: F.struct(
                                F.element_at(F.col("sym"), (i + 1).cast("int"))
                                .alias("l"),
                                F.element_at(F.col("sym"), (i + 2).cast("int"))
                                .alias("r"),
                            ),
                        ),
                    ).otherwise(
                        F.expr(
                            "CAST(array() AS array<struct<l:string,r:string>>)",
                        ),
                    ),
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("tf").cast("long").alias("cnt"))
        )
        # decimal widening BEFORE the multiply (a long product of
        # cnt * 10^18 overflows); the floor quotient itself fits long
        scored = (
            pairs.join(units.select(F.col("x").alias("l"),
                                    F.col("cnt").alias("cl")), "l")
            .join(units.select(F.col("x").alias("r"),
                               F.col("cnt").alias("cr")), "r")
            .select(
                "l", "r",
                F.expr(
                    f"CAST(CAST(cnt AS DECIMAL(38,0)) * "
                    f"{WORDPIECE_SCORE_SCALE} div "
                    "(CAST(cl AS DECIMAL(38,0)) * cr) AS BIGINT)",
                ).alias("score"),
            )
        )
        top = scored.orderBy(
            F.col("score").desc(), F.col("l").asc(), F.col("r").asc(),
        ).limit(1).collect()
        if not top:
            break
        a, b = top[0].l, top[0].r
        merges.append(_wp_fuse(a, b, cont_prefix))
        sym = sym.select(
            "tf", _wp_apply_expr(F.col("sym"), a, b, cont_prefix).alias("sym"),
        ).localCheckpoint(eager=True)
    return base + merges
