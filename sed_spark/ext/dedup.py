"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Scale design notes
------------------
* Everything before the pair-join is per-row Column expressions (split /
  transform / aggregate higher-order functions) — no shuffle, no UDF.
* The candidate-pair joins shuffle on (band, signature) or shingle — the
  standard LSH blocking that keeps the join linear-ish instead of O(n²).
* For web-scale corpora pass ``max_doc_freq`` to drop ubiquitous shingles
  before the inverted-index join (frequency blocking), which bounds the
  worst-case join fanout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "shingle_expr",
    "shingles_from_words",
    "exploded_shingles",
    "exact_dedup",
    "incremental_dedup",
    "minhash_signatures",
    "melt_bands",
    "lsh_candidate_pairs",
    "incremental_lsh_pairs",
    "jaccard_pairs",
    "prefix_similarity_join",
    "simhash16",
    "simhash_pairs",
    "benchmark_contamination",
    "boilerplate_stats",
    "strip_boilerplate",
    "duplicate_spans",
    "strip_duplicate_spans",
    "minhash_jaccard_estimate",
    "normalize_text_expr",
    "verify_pairs_editdist",
]


def shingles_from_words(words: Column, n: int = 3) -> Column:
    """Word n-gram shingles from an ALREADY-MATERIALIZED words array column.

    ``words`` is referenced n+1 times (n ``element_at`` per gram + ``size``);
    it MUST be a plain attribute, not an inline ``split`` — otherwise the
    split re-evaluates once per reference *per sequence element* inside the
    ``transform`` lambda (no CSE across lambda bodies), which is quadratic
    per row. Use :func:`exploded_shingles` / a projected ``split`` alias;
    CollapseProject's expression-cost check (SPARK-36718) then refuses to
    re-inline the expensive producer.
    """
    count = F.size(words) - (n - 1)

    def gram(i: Column) -> Column:
        return F.concat_ws(" ", *[F.element_at(words, i + k + 1) for k in range(n)])

    return F.when(
        count > 0, F.transform(F.sequence(F.lit(0), count - 1), gram),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))


def shingle_expr(text_col: Column, n: int = 3) -> Column:
    """Word n-gram shingles of a whitespace-tokenized text column.

    Convenience form for one-shot use on SMALL data: inlines the split into
    every gram reference. Hot paths must project the split first and call
    :func:`shingles_from_words` (see its docstring for why).
    """
    return shingles_from_words(F.split(text_col, " "), n)


def exploded_shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    distinct: bool = False,
    out_col: str = "g",
) -> DataFrame:
    """(id, shingle) rows with the split materialized exactly once per row.

    Two stacked projections: ``split`` aliased in the inner one, the gram
    ``transform`` referencing the alias in the outer one — the per-row cost
    is O(len + n·n_grams) instead of O(n·n_grams·len).
    """
    from sed_spark.ext import scale_out

    words = scale_out(df).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__words"),
    )
    grams = shingles_from_words(F.col("__words"), n)
    if distinct:
        grams = F.array_distinct(grams)
    return words.select(F.col(id_col), F.explode(grams).alias(out_col))


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact content dedup: hash-groupBy on md5(text), keep the smallest id.

    Returns (text_hash, keep_id, group_size); one shuffle on the hash.
    """
    return df.groupBy(F.md5(F.col(text_col)).alias("text_hash")).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("group_size"),
    )


def incremental_dedup(
    new_docs: DataFrame,
    seen_hashes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_col: str = "text_hash",
) -> DataFrame:
    """Exact dedup of a NEW ingestion batch against an already-curated
    corpus — the incremental shape every growing training set needs: the
    prior corpus is represented ONLY by its content-hash table
    (``seen_hashes``, one ``hash_col`` column), never rescanned.

    Two steps, both keyed on the hash: an anti-join drops new documents
    whose content the corpus already has, then the within-batch
    hash-groupBy picks one canonical per surviving group. Returns
    (text_hash, keep_id, group_size) for the batch's survivors — the
    hash column doubles as the delta to append to ``seen_hashes`` for
    the next increment.

    Scale: work is O(batch) + a join against the hash table, which a
    real deployment bucket-partitions by ``hash_col`` so the anti-join
    is co-located (or broadcast when the corpus is small). The
    full-corpus alternative — union + re-dedup — rescans everything per
    increment and is exactly what this avoids.
    """
    hashed = new_docs.select(
        F.col(id_col), F.md5(F.col(text_col)).alias(hash_col),
    )
    fresh = hashed.join(
        seen_hashes.select(hash_col), hash_col, "left_anti",
    )
    return fresh.groupBy(hash_col).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("group_size"),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document MinHash signature: one min-hash per band.

    Band b's hash of shingle g is ``md5("{b}|" + g)``; the band signature is
    the lexicographic min over the document's shingles (min over a multiset
    equals min over the set, so no distinct pass is needed). Explode +
    single hash-aggregate; Catalyst does map-side partial mins.
    """
    grams = exploded_shingles(df, id_col, text_col, shingle_n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{b}|"), F.col("g")))).alias(f"sig_{b}")
        for b in range(n_bands)
    ]
    return grams.groupBy(id_col).agg(*aggs)


def melt_bands(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_bands: int = 4,
) -> DataFrame:
    """``(id, band, sig)`` rows from a :func:`minhash_signatures` table —
    the LSH *index* shape: persisted/bucketed on (band, sig), it is what a
    growing-corpus deployment keeps around between ingestion batches."""
    return signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"sig_{b}").alias("sig"))
                    for b in range(n_bands)
                ],
            ),
        ).alias("bs"),
    ).select(id_col, "bs.band", "bs.sig")


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_bands: int = 4,
) -> DataFrame:
    """LSH banding: documents sharing ANY band signature become a candidate
    pair. Melt bands → self-equi-join on (band, sig) → distinct pairs.
    The join shuffles on (band, sig) — each bucket is a near-duplicate
    cluster, so fanout is bounded by cluster sizes, not n²."""
    melted = melt_bands(signatures, id_col, n_bands)
    a, b = melted.alias("a"), melted.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"),
        )
        .distinct()
    )


def incremental_lsh_pairs(
    new_signatures: DataFrame,
    index_bands: DataFrame,
    id_col: str = "doc_id",
    n_bands: int = 4,
) -> DataFrame:
    """Near-dup candidate pairs for a NEW ingestion batch against a
    growing corpus — the incremental counterpart of
    :func:`lsh_candidate_pairs`, completing the deployment shape
    :func:`incremental_dedup` provides for exact dedup: the existing
    corpus is represented ONLY by its banded signature index
    (:func:`melt_bands` output, ``(id, band, sig)``), never rescanned or
    re-shingled. Returns the union of batch-vs-index pairs and
    within-batch pairs as ``(a_id, b_id)`` with ``a_id < b_id``.

    Scale design: the new batch's melted bands equi-join the index on
    (band, sig) — when the index table is bucketed/partitioned on that
    key the batch side shuffles alone; the within-batch self-join touches
    batch-sized data only. Appending the batch's bands to the index
    afterwards keeps the next ingestion incremental too.
    """
    nb = melt_bands(new_signatures, id_col, n_bands)
    a, b = nb.alias("a"), index_bands.alias("b")
    cross = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.sig") == F.col("b.sig")),
    ).select(
        F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("a_id"),
        F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("b_id"),
    ).filter(F.col("a_id") != F.col("b_id"))
    within_a, within_b = nb.alias("a"), nb.alias("b")
    within = within_a.join(
        within_b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.sig") == F.col("b.sig"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("a_id"),
        F.col(f"b.{id_col}").alias("b_id"),
    )
    return cross.unionAll(within).distinct()


def minhash_jaccard_estimate(
    pairs: DataFrame,
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_bands: int = 4,
    a_col: str = "a_id",
    b_col: str = "b_id",
    est_col: str = "jaccard_est",
) -> DataFrame:
    """Jaccard similarity ESTIMATE for candidate pairs from the MinHash
    signatures already computed for banding: the fraction of equal
    band-min signatures (E[sig_a == sig_b] = exact Jaccard, so the mean
    over bands is an unbiased estimator with resolution ``1/n_bands``).
    The cheap screen between candidate generation and the exact verify:
    signature equality costs O(n_bands) per pair, no text access at all —
    pairs below a screen threshold never pay the
    :func:`verify_pairs_editdist` / exact-Jaccard join.

    Two id-keyed joins against the (document-sized) signature table; the
    estimate itself is a projection. Appends ``est_col`` to ``pairs``.
    """
    a_sig = signatures.select(
        F.col(id_col).alias(a_col),
        *[F.col(f"sig_{b}").alias(f"__a{b}") for b in range(n_bands)],
    )
    b_sig = signatures.select(
        F.col(id_col).alias(b_col),
        *[F.col(f"sig_{b}").alias(f"__b{b}") for b in range(n_bands)],
    )
    joined = pairs.join(a_sig, a_col).join(b_sig, b_col)
    matches = sum(
        (F.col(f"__a{b}") == F.col(f"__b{b}")).cast("int")
        for b in range(n_bands)
    )
    return joined.select(
        *pairs.columns, (matches / F.lit(float(n_bands))).alias(est_col),
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.05,
    max_doc_freq: int | None = 100,
) -> DataFrame:
    """n-gram Jaccard near-duplicate pairs via an inverted-index join.

    distinct (doc, shingle) → self-join on shingle (only docs sharing a
    shingle pair up) → |A∩B| counts → Jaccard = c/(|A|+|B|-c). All-integer
    arithmetic until the final exact double division.

    ``max_doc_freq`` drops shingles occurring in more than that many
    documents before the join — frequency blocking, ON BY DEFAULT, because
    one stop-phrase shingle shared by k docs fans the self-join out to
    k²/2 rows (the classic inverted-index scale-killer). The recall
    tradeoff: a true near-dup pair is missed only if ALL its shared
    shingles are ubiquitous (> ``max_doc_freq`` docs), which for real
    near-duplicates (many shared low-frequency shingles) is negligible;
    dropped shingles also shrink both |A| and |B|, so the Jaccard of
    surviving pairs is computed on the filtered shingle sets. Pass
    ``None`` to disable (exact semantics, unbounded fanout).
    """
    dg = exploded_shingles(df, id_col, text_col, shingle_n, distinct=True)
    if max_doc_freq is not None:
        keep = dg.groupBy("g").agg(F.count(F.lit(1)).alias("df_"))
        keep = keep.filter(F.col("df_") <= max_doc_freq).select("g")
        dg = dg.join(F.broadcast(keep), "g")
    cnt = dg.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    a, b = dg.alias("a"), dg.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ca = cnt.select(F.col(id_col).alias("a_id"), F.col("n").alias("na"))
    cb = cnt.select(F.col(id_col).alias("b_id"), F.col("n").alias("nb"))
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        common.join(ca, "a_id")
        .join(cb, "b_id")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "n_common", "jaccard")
    )


def _pick_head_df(hist: list[tuple[int, int]], budget: int) -> int | None:
    """Smallest document frequency T such that the tokens with df >= T
    still fit ``budget`` rows — from a (df, n_tokens) histogram. Walks
    frequencies descending, stopping at df = 1 (a df-1 token is
    indistinguishable from the implicit default order) or at the first
    bucket that would overflow; None = no head fits / nothing repeats,
    and the caller falls back to pure token order."""
    cum, head_df = 0, None
    for df_val, n_toks in sorted(hist, reverse=True):
        if df_val < 2 or cum + n_toks > int(budget):
            break
        cum += n_toks
        head_df = df_val
    return head_df


def prefix_similarity_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
    positional: bool = True,
    set_col: str | None = None,
    freq_head: int = 1 << 17,
) -> DataFrame:
    """EXACT Jaccard threshold self-join via prefix filtering — the
    AllPairs/PPJoin family (Bayardo et al., WWW'07; Xiao et al., WWW'08),
    the lossless counterpart to :func:`jaccard_pairs`'s frequency
    blocking: every pair with ``jaccard >= threshold`` over the full
    distinct shingle sets is returned, none invented, none missed.

    The prefix-filter lemma: order all tokens by ascending corpus
    document frequency (rarest first, ties by token value); a set of
    size n need only index its first ``n - ceil(t*n) + 1`` tokens,
    because two sets whose prefixes are disjoint cannot reach Jaccard
    ``t``. The inverted index therefore holds the RAREST slice of every
    document — the ubiquitous stop-phrase shingles that fan a full
    inverted-index join out to k² rows land in almost no prefix at all,
    which is what bounds the candidate join at corpus scale WITHOUT the
    recall loss of ``max_doc_freq`` blocking. Higher thresholds mean
    shorter prefixes: production near-dup sweeps at t ≈ 0.7–0.9 index
    only ~10–30%% of each document's tokens.

    Stages (every join key-partitioned; no cartesian, no windows):

    1. distinct (doc, shingle) + one groupBy for document frequencies.
       The prefix lemma holds for ANY fixed total token order —
       frequency order only minimizes the candidate count, and only the
       FREQUENT HEAD of the distribution matters for that (every rare
       token is an equally good prefix member). So instead of shuffle-
       joining all (doc, token) rows against the full frequency table
       (round 10 this was ~80 of the 76+ s at 1e6 docs — a string-keyed
       sort-merge join of every (doc, token) row), only tokens with
       ``df >= T`` keep their real frequency, where T is the smallest
       df whose tail fits the ``freq_head`` broadcast budget. T comes
       from the df HISTOGRAM — a dimension-sized collect (<= #distinct
       df values, the one eager job this operator runs, same altitude
       as the bloom/HLL sketch collects). Everything below T ties at
       df = 1, ordered by token value; the head is BROADCAST, so order
       assignment is a map-side lookup and no full shuffle (and no
       global top-k sort) ever runs. Identical output by the lemma at
       any T; a Zipf head wider than ``freq_head`` only inflates
       candidates, never the answer, and the broadcast stays bounded by
       construction at any corpus size;
    2. per-doc ``sort_array(collect_list(struct(freq, token)))``, slice
       the prefixes, keep the full sorted token array for verification.
       This table feeds four consumers and Catalyst's per-branch column
       pruning provably defeats exchange reuse between them, so it is
       PERSISTED (MEMORY_AND_DISK) and materialized here — this
       operator is eager (one histogram collect + one cached build),
       the same trade Spark MLlib's MinHashLSH makes;
    3. ASYMMETRIC prefix self-join (PPJoin, Xiao et al. Lemma 2 + the
       size-ordered index reduction): each unordered pair is generated
       exactly once with the size-SMALLER document (ties by id) on the
       probe side. The probe side explodes only the mid-prefix
       ``n - ceil(2tn/(1+t)) + 1`` — valid because its partner is at
       least as large, so the required overlap ``alpha =
       ceil(t(ns+nl)/(1+t))`` is at least ``ceil(2tns/(1+t))`` — while
       the index side explodes the full prefix ``n - ceil(tn) + 1``
       (valid since ``alpha >= ceil(t*nl)`` whenever ``ns >= t*nl``,
       which the Jaccard length filter ``ns >= t * nl`` guarantees for
       every qualifying pair). At t=0.8 the probe side shrinks from
       ~20%% to ~11%% of each document's tokens — the candidate join's
       row product drops with it, losslessly;
    4. per candidate pair, the PPJoin positional filter (``positional``):
       a shared prefix token at sorted positions (is, il) bounds the
       overlap by ``1 + min(ns - is, nl - il)``; pairs whose best bound
       misses ``alpha`` drop before verification — a groupBy max, zero
       extra shuffles;
    5. exact verify: two id-keyed join-backs attach both sides' full
       sorted token arrays to the collapsed candidate pairs, then
       ``array_intersect`` — O(candidates), never O(n²). The docs side
       is already hash-partitioned by id from its aggregate (no extra
       exchange), and the candidate side is output-sized, so AQE
       typically turns these into broadcast joins. Arrays deliberately
       do NOT ride the candidate join itself (see stage 3).

    Float guard: the integer thresholds are computed with a 1e-9 slack
    (``ceil(t*n - eps)``) so double rounding can only widen a prefix /
    loosen a filter, never drop a qualifying pair. Returns
    ``(a_id, b_id, n_common, jaccard)`` with ``a_id < b_id`` — the same
    shape as :func:`jaccard_pairs`.

    Output-size caveat: the ANSWER itself is quadratic in duplicate-group
    size — k byte-identical documents have k·(k-1)/2 qualifying pairs,
    and a lossless join must emit every one. Run :func:`exact_dedup`
    first (as ``examples/training_data_pipeline.py`` does) so groups
    collapse to one representative before the near-dup sweep.

    ``set_col`` generalizes the join beyond text: name an
    ``array<string>`` column (URL sets, feature bags, tag sets) and the
    tokens are its distinct elements — ``text_col``/``shingle_n`` are
    ignored and Jaccard is exact over those sets. NULL/empty sets have
    no tokens and pair with nothing, matching the empty-document
    behavior of the shingle path.
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    eps = 1e-9
    t = float(threshold)
    from pyspark import StorageLevel

    if set_col is not None:
        dg = df.select(
            F.col(id_col),
            F.explode(F.array_distinct(F.col(set_col))).alias("g"),
        )
    else:
        dg = exploded_shingles(df, id_col, text_col, shingle_n,
                               distinct=True)
    # the exploded (doc, token) rows feed three passes below (histogram,
    # head build, docs aggregate) before being released — cache them for
    # the duration of this call
    dg = dg.persist(StorageLevel.MEMORY_AND_DISK)
    # frequent-head table: real df only for tokens with df >= T, where T
    # is the smallest frequency whose tail (#tokens with df >= T) fits
    # the freq_head broadcast budget — found from the df HISTOGRAM
    # (one groupBy over the freq table collapsed to <= #distinct df
    # values, a dimension-sized collect like the bloom/HLL sketches).
    # Every token below T ties at df = 1 and is ordered by its value.
    # No global top-k sort is ever planned (orderBy+limit over millions
    # of tied freq rows measured minutes of single-task merge), and the
    # broadcast stays bounded by construction at any corpus size.
    freq = dg.groupBy("g").agg(F.count(F.lit(1)).alias("__df"))
    hist = [
        (r["__df"], r["n"])
        for r in freq.groupBy("__df")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    head_df = _pick_head_df(hist, freq_head)
    if head_df is None:
        # no head fits (or nothing repeats): pure token order — still a
        # total order, so the prefix lemma (and the exact output) holds
        ordered = dg.select(
            F.col(id_col), F.col("g"), F.lit(1).alias("__df"),
        )
    else:
        head = freq.filter(F.col("__df") >= F.lit(int(head_df)))
        ordered = dg.join(F.broadcast(head), "g", "left").select(
            F.col(id_col),
            F.col("g"),
            F.coalesce(F.col("__df"), F.lit(1)).alias("__df"),
        )
    # (freq asc, token asc) IS the global order — sort structs directly
    docs = (
        ordered
        .groupBy(id_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("__df"), F.col("g"))),
            ).alias("__ord"),
            F.count(F.lit(1)).alias("__n"),
        )
        .select(
            id_col,
            F.col("__n"),
            F.transform(F.col("__ord"), lambda s: s["g"]).alias("__toks"),
        )
    )
    # the docs table feeds FOUR consumers (probe, index, and both verify
    # join-backs). Catalyst cannot share the subtree between them:
    # column pruning rewrites each consumer's aggregate differently
    # (verified: the count-only branch loses the collect_list), so the
    # exchanges never canonicalize equal and exchange reuse NEVER fires
    # — without a cache the whole explode+aggregate pipeline runs four
    # times (measured 2.5x the full operator at 1e6 docs). Persisting
    # the multi-consumer table is the same pattern Spark MLlib's own
    # MinHashLSH uses; MEMORY_AND_DISK spills rather than evicts at
    # corpus scale. The persist is LAZY (round 12, VERDICT item 3 —
    # fold the eager picker jobs): the histogram collect above is now
    # the operator's ONLY eager job. Laziness is safe because all four
    # consumers read the SAME cached plan object, so the aggregate's
    # shuffle-map stage is deduplicated by the scheduler (one explode
    # pass regardless of which consumer materializes first); the racing
    # reduce-side cache population is output-sized. The dg token cache
    # consequently lives until the caller's first action — its release
    # rides the same weakref finalizer as docs below.
    docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
    # index prefix n - ceil(t*n - eps) + 1 and PPJoin mid (probe) prefix
    # n - ceil(2tn/(1+t) - eps) + 1, both clamped to [1, n]
    p_idx = F.greatest(
        F.lit(1),
        F.col("__n") - F.ceil(F.lit(t) * F.col("__n") - F.lit(eps)) + 1,
    ).cast("int")
    p_prb = F.greatest(
        F.lit(1),
        F.col("__n")
        - F.ceil(F.lit(2.0 * t / (1.0 + t)) * F.col("__n") - F.lit(eps))
        + 1,
    ).cast("int")
    # probe side = the size-smaller partner (ties by id); it explodes
    # only the mid-prefix. NO token array rides the candidate join:
    # round 10 carried the probe's full array here to save one verify
    # join-back, which was right while the verify target (the docs
    # aggregate) cost a full shuffle join to rebuild — but with the
    # order-assignment join gone the docs subtree is cheap, and
    # dragging an n-token array per exploded row through the g-keyed
    # shuffle + sort-merge + candidate groupBy measured ~3x the whole
    # rest of the pipeline at 1e6 docs. Both sides' arrays now arrive
    # by id-keyed join-backs AFTER candidates collapse (the docs side
    # is already partitioned by id from its aggregate, and the
    # candidate side is output-sized, so AQE typically broadcasts it).
    probe = docs.select(
        F.col(id_col).alias("s_id"),
        F.col("__n").alias("ns"),
        F.posexplode(F.slice(F.col("__toks"), F.lit(1), p_prb))
        .alias("__pos0", "g"),
    ).select(
        "s_id", "ns", (F.col("__pos0") + 1).alias("is_"), "g",
    )
    index = docs.select(
        F.col(id_col).alias("l_id"),
        F.col("__n").alias("nl"),
        F.posexplode(F.slice(F.col("__toks"), F.lit(1), p_idx))
        .alias("__pos0", "g"),
    ).select(
        "l_id", "nl", (F.col("__pos0") + 1).alias("il"), "g",
    )
    pair_order = (F.col("ns") < F.col("nl")) | (
        (F.col("ns") == F.col("nl")) & (F.col("s_id") < F.col("l_id"))
    )
    # Jaccard length filter: ns >= t * nl (ns <= nl by construction)
    length_ok = (
        F.col("ns").cast("double") + F.lit(eps)
        >= F.lit(t) * F.col("nl")
    )
    witnessed = probe.join(
        index, (probe["g"] == index["g"]) & pair_order,
    ).filter(length_ok)
    ubound = F.lit(1) + F.least(
        F.col("ns") - F.col("is_"), F.col("nl") - F.col("il"),
    )
    cands = witnessed.groupBy("s_id", "l_id").agg(
        F.first("ns").alias("ns"),
        F.first("nl").alias("nl"),
        F.max(ubound).alias("__ub"),
    )
    if positional:
        o_req = F.ceil(
            F.lit(t) * (F.col("ns") + F.col("nl")) / F.lit(1.0 + t)
            - F.lit(eps),
        )
        cands = cands.filter(F.col("__ub") >= o_req)
    ts = docs.select(
        F.col(id_col).alias("s_id"), F.col("__toks").alias("__ts"),
    )
    tl = docs.select(
        F.col(id_col).alias("l_id"), F.col("__toks").alias("__tl"),
    )
    c = F.size(F.array_intersect(F.col("__ts"), F.col("__tl")))
    out = (
        cands.join(ts, "s_id")
        .join(tl, "l_id")
        .select(
            F.least("s_id", "l_id").alias("a_id"),
            F.greatest("s_id", "l_id").alias("b_id"),
            c.cast("long").alias("n_common"),
            (
                c.cast("double")
                / (F.col("ns") + F.col("nl") - c)
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    # tie the docs + token caches' lifetime to the returned DataFrame:
    # repeated calls would otherwise accumulate one persisted copy per
    # call for the life of the session. Dropping the caches after the
    # caller lets go of the result is safe — lineage recomputes them if
    # a derived plan is still executed later (slower, never wrong).
    import weakref

    def _drop(frames=(docs, dg)):
        for d in frames:
            try:
                d.unpersist()
            except Exception:
                pass  # session already stopped

    weakref.finalize(out, _drop)
    return out


def benchmark_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 8,
    grams: DataFrame | None = None,
) -> DataFrame:
    """Test-set decontamination: flag corpus documents sharing any word
    n-gram with a benchmark/eval set (the GPT-3/Llama-style 13-gram
    collision filter; ``shingle_n`` defaults lower for short documents).

    Scale design: the benchmark side is small by definition (an eval set,
    thousands of rows), so its distinct shingles are **broadcast** and
    the corpus side is one explode + broadcast hash semi-join + per-doc
    count — the 100 TB corpus never shuffles on anything but its own
    document key, and there is no corpus-vs-corpus pair generation at
    all. Returns one row per corpus document: distinct-shingle count,
    hit count, hit fraction, and the contamination flag.

    ``grams`` accepts the corpus's precomputed ``(id, g)``-distinct
    shingle table (:func:`exploded_shingles` with ``distinct=True``) so a
    caller that also runs :func:`boilerplate_stats` at the same
    ``shingle_n`` pays the explode once (checkpoint it for that).
    """
    bench_grams = (
        exploded_shingles(benchmark, id_col, text_col, shingle_n, distinct=True)
        .select("g")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    if grams is None:
        grams = exploded_shingles(
            corpus, id_col, text_col, shingle_n, distinct=True,
        )
    # ONE corpus pass: broadcast left join marks hits, a single per-doc
    # aggregate counts both totals and hits
    per_doc = (
        grams.join(F.broadcast(bench_grams), "g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("__hit", F.lit(0))).alias("n_hits"),
        )
    )
    # documents shorter than one shingle have zero grams but still get a
    # row (they cannot be contaminated) — the per-document contract
    return (
        corpus.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.round(
                    F.col("n_hits") / F.col("n_grams").cast("double"), 6,
                ),
            ).otherwise(0.0).alias("hit_frac"),
            (F.coalesce("n_hits", F.lit(0)) > 0).cast("int").alias(
                "is_contaminated",
            ),
        )
    )


def boilerplate_stats(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
    min_docs: int = 5,
    grams: DataFrame | None = None,
) -> DataFrame:
    """Corpus-internal boilerplate detection: word n-grams occurring in
    ≥ ``min_docs`` DISTINCT documents are boilerplate (navigation chrome,
    license headers, templated phrases — the cross-document analog of C4's
    repeated-line removal, Raffel et al. JMLR 2020 §2.2). Returns one row
    per document: distinct-shingle count, boilerplate-shingle count, and
    the boilerplate fraction.

    Scale design: unlike :func:`benchmark_contamination` there is no
    small side to broadcast — the frequent-gram table comes from the
    corpus itself. The plan is still pair-free: one explode, one
    (gram)-keyed count aggregate (map-side partial counts collapse
    ubiquitous grams before the shuffle), and one equi-join back on the
    gram key. The gram table is checkpointed so the explode runs once,
    not once per branch. No step is ever quadratic in documents.

    ``grams`` accepts a precomputed (ideally already-checkpointed)
    ``(id, g)``-distinct shingle table to share with
    :func:`benchmark_contamination` (see there).
    """
    if grams is None:
        grams = exploded_shingles(
            corpus, id_col, text_col, shingle_n, distinct=True,
        ).localCheckpoint(eager=True)
    # grams is (doc, g)-distinct, so count(*) per g = document frequency
    bp = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df_"))
        .filter(F.col("df_") >= min_docs)
        .select("g")
        .withColumn("__bp", F.lit(1))
    )
    per_doc = (
        grams.join(bp, "g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("__bp", F.lit(0))).alias("n_bp"),
        )
    )
    return (
        corpus.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_bp", F.lit(0)).alias("n_bp"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.round(F.col("n_bp") / F.col("n_grams").cast("double"), 6),
            ).otherwise(0.0).alias("bp_frac"),
        )
    )


def strip_boilerplate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_docs: int = 2,
) -> DataFrame:
    """C4-style cross-document line deduplication (Raffel et al., "Exploring
    the Limits of Transfer Learning...", JMLR 2020 §2.2): any line (text
    between ``sep`` occurrences, compared exactly) that appears in
    ≥ ``min_docs`` distinct documents is removed from EVERY document.
    Returns ``(id_col, text_col)`` with each document's surviving lines
    rejoined by ``sep`` in their original order; fully-boilerplate
    documents survive with empty text (filter on ``length`` downstream).

    ``sep`` is a Java regex (escape metacharacters for literal
    separators).

    Scale design: explode to (doc, position, line), count document
    frequency per line key (map-side partial counts — a line shared by a
    million docs ships one partial per task, not a million rows), join
    the boilerplate keys back on the line key, and reassemble with
    ``array_sort(collect_list(struct(pos, line)))`` per document — the
    per-document group is document-sized, never corpus-sized, and no
    stage compares documents pairwise. The line table is checkpointed so
    the explode runs once across the frequency and reassembly branches.
    """
    t = F.col(text_col)
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(t, sep, -1)).alias("__pos", "__line"),
    ).localCheckpoint(eager=True)
    bp = (
        lines.select(id_col, "__line")
        .distinct()
        .groupBy("__line")
        .agg(F.count(F.lit(1)).alias("df_"))
        .filter(F.col("df_") >= min_docs)
        .select("__line")
        .withColumn("__bp", F.lit(1))
    )
    kept = lines.join(bp, "__line", "left").filter(F.col("__bp").isNull())
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("__pos", "__line")),
                ),
                lambda x: x["__line"],
            ),
            # array_join's delimiter is a literal string, not a regex —
            # only correct when sep matches itself literally
            sep,
        ).alias(text_col),
    )
    return (
        docs.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(text_col, F.lit("")).alias(text_col),
        )
    )


def span_islands(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 5,
    min_docs: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Shared core of :func:`duplicate_spans` / :func:`strip_duplicate_spans`:
    returns ``(words, dup_pos)`` where ``words`` is the tokenized corpus
    and ``dup_pos`` has one row per document that contains duplicated
    windows — ``(id, __ps)`` with ``__ps`` the SORTED array of duplicated
    window start positions. Consumers merge the ``[p, p+window)`` spans
    with one ordered array fold each (document-sized arrays) — cheaper
    and spill-safer than the round-5 gaps-and-islands window-function
    stack, which paid a sort-based exchange over every duplicated window
    row (A/B at 1e6 all-duplicated docs: 38.0 s window stack vs 31.2 s
    array fold, same values).

    The window key is the first 60 bits of the md5 (not the hex string):
    an 8-byte shuffle key instead of a 32-char string through the
    distinct + frequency + join-back stages. The DuckDB mirror computes
    the identical value (``('0x' || substr(md5(..), 1, 15))::UBIGINT``),
    so the collision structure is bit-identical cross-engine; at 60 bits
    a false cross-document match needs ~2^30 distinct windows per the
    birthday bound (1e12 windows -> ~4e-5 expected false-dup pairs).
    """
    from sed_spark.ext import scale_out

    words = scale_out(corpus).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__words"),
    )
    n_tok = F.size("__words")
    n_win = n_tok - (window - 1)
    win_hash = F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda i: F.conv(
            F.substring(
                F.md5(F.concat_ws(" ", F.slice(F.col("__words"), i + 1, window))),
                1, 15,
            ),
            16, 10,
        ).cast("long"),
    )
    # checkpointed: the window table feeds both the document-frequency
    # aggregate and the join-back, and the two branches' first exchanges
    # differ ((id,h) vs h) so Spark cannot reuse one — without this the
    # tokenize+hash explode would run twice (same rationale as
    # boilerplate_stats' gram table)
    wins = words.select(
        F.col(id_col),
        F.posexplode(
            F.when(n_win > 0, win_hash).otherwise(
                F.expr("CAST(array() AS array<bigint>)"),
            ),
        ).alias("__pos", "__h"),
    ).localCheckpoint(eager=True)
    # document frequency per window content; (doc, h)-distinct first so a
    # window repeated WITHIN one document does not count as cross-document
    dup = (
        wins.select(id_col, "__h")
        .distinct()
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= min_docs)
        .select("__h")
    )
    dup_pos = (
        wins.join(dup, "__h")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("__pos")).alias("__ps"))
    )
    return words, dup_pos


def duplicate_spans(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 5,
    min_docs: int = 2,
    islands: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Exact-substring duplicate-span statistics (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499): every length-``window`` token window is a candidate
    substring; a window whose content occurs in ≥ ``min_docs`` DISTINCT
    documents is a duplicated span. Returns one row per document —
    ``(id, n_tokens, n_windows, n_dup_windows, covered_tokens,
    dup_span_frac)`` — where ``covered_tokens`` is the size of the UNION
    of all duplicated spans (overlaps merged), i.e. the paper's
    "fraction of the document that is duplicated text".
    :func:`strip_duplicate_spans` REMOVES the spans instead.

    Scale design: the reference algorithm builds a corpus-wide suffix
    array — inherently sequential and memory-bound. Fixing the match
    length at ``window`` (the paper's dedup threshold) turns it into a
    pure dataflow: tokenize → rolling window hash (expr-only) →
    posexplode → document-frequency aggregate on the hash key (map-side
    partial counts collapse ubiquitous windows before the shuffle) →
    join-back → per-document interval union via ONE ordered fold over
    each document's sorted duplicated-position array (document-sized,
    never corpus-sized; replaced the round-5 window-function islands and
    their sort-based exchange). No pair join, no global order, every
    stage keyed or document-local.

    ``islands`` accepts a precomputed :func:`span_islands` result so a
    caller running BOTH the measuring and stripping variants over the
    same corpus pays the tokenize+hash explode once (checkpoint the
    ``dup_pos`` half too to also share the frequency aggregate).
    """
    words, dup_pos = islands if islands is not None else span_islands(
        corpus, id_col, text_col, window, min_docs,
    )
    n_tok = F.size("__words")
    n_win = n_tok - (window - 1)
    # merged-interval cover in one fold: positions ascend, every span is
    # [p, p+window), so each step adds (p + window) - max(prev_end, p)
    covered = F.aggregate(
        F.col("__ps"),
        F.struct(
            F.lit(0).cast("long").alias("cov"),
            F.lit(-1).cast("long").alias("end"),
        ),
        lambda st, p: F.struct(
            (
                st["cov"] + (p + window) - F.greatest(st["end"], p.cast("long"))
            ).alias("cov"),
            (p + window).cast("long").alias("end"),
        ),
        lambda st: st["cov"],
    )
    per_doc = dup_pos.select(
        F.col(id_col),
        covered.alias("covered_tokens"),
        F.size("__ps").cast("long").alias("n_dup_windows"),
    )
    base = words.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.greatest(n_win, F.lit(0)).alias("n_windows"),
    )
    return base.join(per_doc, id_col, "left").select(
        F.col(id_col),
        "n_tokens",
        "n_windows",
        F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
        F.coalesce("covered_tokens", F.lit(0)).cast("long").alias("covered_tokens"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.coalesce("covered_tokens", F.lit(0))
                / F.col("n_tokens").cast("double"),
                6,
            ),
        ).otherwise(0.0).alias("dup_span_frac"),
    )


def strip_duplicate_spans(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 5,
    min_docs: int = 2,
    islands: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """REMOVE exact-substring duplicate spans (the action Lee et al.
    arXiv:2107.06499 actually take — :func:`duplicate_spans` is the
    measuring variant): every token covered by a cross-document duplicated
    window is dropped, the survivors rejoined in their original order.
    Returns ``(id_col, text_col)``; fully-duplicated documents survive
    with empty text.

    ``islands`` shares a precomputed :func:`span_islands` result (see
    :func:`duplicate_spans`).

    Scale design: on top of the :func:`span_islands` dataflow, the merged
    intervals are built PER DOCUMENT by one ordered fold over the sorted
    duplicated-position array (document-sized, never corpus-sized),
    joined back on the id key, and the removal is one expression — an
    index-aware ``filter`` over the token array testing membership
    against the interval list. No second explode, no window functions.
    """
    words, dup_pos = islands if islands is not None else span_islands(
        corpus, id_col, text_col, window, min_docs,
    )
    # fold the sorted positions into merged [s, e) intervals: extend the
    # last interval while spans touch/overlap, else append a new one
    iv_struct = "array<struct<s:bigint,e:bigint>>"
    merged = F.aggregate(
        F.col("__ps"),
        F.expr(f"CAST(array() AS {iv_struct})"),
        lambda acc, p: F.when(
            (F.size(acc) > 0)
            & (p.cast("long") <= F.element_at(acc, -1)["e"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["s"].alias("s"),
                        (p + window).cast("long").alias("e"),
                    ),
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(
                    F.struct(
                        p.cast("long").alias("s"),
                        (p + window).cast("long").alias("e"),
                    ),
                ),
            ),
        ),
    )
    ivs = dup_pos.select(F.col(id_col), merged.alias("__ivs"))
    empty_ivs = F.expr(f"CAST(array() AS {iv_struct})")
    covered = F.coalesce(F.col("__ivs"), empty_ivs)
    kept = F.filter(
        F.col("__words"),
        lambda x, i: ~F.exists(
            covered, lambda iv: (i >= iv["s"]) & (i < iv["e"]),
        ),
    )
    return words.join(ivs, id_col, "left").select(
        F.col(id_col),
        F.array_join(kept, " ").alias(text_col),
    )


def simhash16(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """16-bit SimHash from md5 hex digits of shingles.

    Each of the first 16 hex digits of ``md5(shingle)`` contributes its high
    bit (digit ≥ 8) as +1/−1 to one simhash position; the sign of the column
    sum sets the output bit. One explode + one hash-aggregate with 16
    integer sums — all JVM-side.
    """
    grams = exploded_shingles(df, id_col, text_col, shingle_n).withColumn(
        "h", F.md5(F.col("g")),
    )
    aggs = []
    for i in range(16):
        digit = F.conv(F.substring(F.col("h"), i + 1, 1), 16, 10).cast("int")
        aggs.append(
            F.sum(F.when(digit >= 8, 1).otherwise(-1)).alias(f"s_{i}"),
        )
    sums = grams.groupBy(id_col).agg(*aggs)
    bits = None
    for i in range(16):
        term = F.when(F.col(f"s_{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bits = term if bits is None else bits + term
    return sums.select(F.col(id_col), bits.cast("bigint").alias("simhash"))


def normalize_text_expr(text: Column) -> Column:
    """Canonical text form for dedup: lowercase, punctuation stripped,
    whitespace runs collapsed, ends trimmed. Pure expressions (JVM
    regex); the same four steps are reproducible in any engine with
    regexp_replace, so normalized-hash dedup decisions stay auditable.
    Unicode NFC normalization would slot in front as a pandas-UDF stage
    where corpora need it (ASCII corpora do not)."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9 ]", "")
    t = F.regexp_replace(t, r" +", " ")
    return F.trim(t)


def verify_pairs_editdist(
    pairs: DataFrame,
    docs: DataFrame,
    max_dist: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    a_col: str = "a_id",
    b_col: str = "b_id",
    keep_exceeded: bool = False,
) -> DataFrame:
    """Exact edit-distance verification of CANDIDATE pairs — the verify
    step after LSH/Jaccard candidate generation: join each pair to its
    two texts and compute ``levenshtein``. Returns (a_id, b_id,
    edit_dist); with ``max_dist`` set, pairs beyond the bound are
    dropped, or kept with the ``-1`` sentinel when
    ``keep_exceeded=True`` (every candidate row survives, annotated).

    Scale: the quadratic-cost metric runs ONLY on the blocked candidate
    set (LSH keeps it ~linear in corpus size), never all pairs; the two
    text lookups are joins on the id key. ALWAYS set ``max_dist`` on
    real corpora: the JVM then computes the banded variant
    (``levenshtein(l, r, threshold)``, O(len·max_dist) per pair) —
    measured 18x faster (2.0 s vs 36.1 s) over 42k candidate pairs of
    ~300-char docs at sf0.1, and the bound is the near-dup decision
    anyway. The unbounded form exists for small/ad-hoc use.
    """
    a_txt = docs.select(
        F.col(id_col).alias(a_col), F.col(text_col).alias("__a_text"),
    )
    b_txt = docs.select(
        F.col(id_col).alias(b_col), F.col(text_col).alias("__b_text"),
    )
    joined = pairs.join(a_txt, a_col).join(b_txt, b_col)
    if max_dist is None:
        dist = F.levenshtein(F.col("__a_text"), F.col("__b_text"))
        out = joined.select(a_col, b_col, dist.alias("edit_dist"))
        return out
    dist = F.levenshtein(F.col("__a_text"), F.col("__b_text"), int(max_dist))
    out = joined.select(a_col, b_col, dist.alias("edit_dist"))
    if keep_exceeded:
        return out
    return out.filter(
        (F.col("edit_dist") >= 0) & (F.col("edit_dist") <= max_dist),
    )


def simhash_pairs(
    fingerprints: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
) -> DataFrame:
    """Near-duplicate candidate pairs from 16-bit SimHash fingerprints:
    ``(a_id, b_id, hamming)`` for every pair within ``max_hamming`` bits.

    The pigeonhole banding of Manku et al. (WWW 2007): split the 16 bits
    into ``max_hamming + 1`` blocks — any pair within distance ``d``
    agrees EXACTLY on at least one block — so candidate generation is a
    self-equi-join on ``(block_index, block_value)``, never an all-pairs
    scan, and the exact ``bit_count(a XOR b)`` verify runs on candidates
    only. Pairs sharing several blocks are emitted once (dedup on the
    FIRST agreeing block — a filter over the co-agreeing blocks, not a
    distinct shuffle). Input is the fingerprint table (one row per doc),
    so the text is never touched.
    """
    if not 0 <= max_hamming <= 15:
        raise ValueError("max_hamming must be in [0, 15]")
    n_blocks = max_hamming + 1
    base = 16 // n_blocks
    extra = 16 % n_blocks
    # block b covers [off_b, off_b + len_b) with the remainder spread
    # over the first blocks; every bit lands in exactly one block
    lengths = [base + (1 if b < extra else 0) for b in range(n_blocks)]
    offsets = [sum(lengths[:b]) for b in range(n_blocks)]

    def block_val(col, b):
        return F.shiftright(col, offsets[b]) % F.lit(1 << lengths[b])

    h = F.col(hash_col)
    blocks = fingerprints.select(
        F.col(id_col), h.alias(hash_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("blk"),
                    block_val(h, b).alias("val"),
                )
                for b in range(n_blocks)
            ]),
        ).alias("c"),
    ).select(id_col, hash_col, "c.blk", "c.val")
    a = blocks.select(
        F.col(id_col).alias("a_id"), F.col(hash_col).alias("a_hash"),
        "blk", "val",
    )
    b_side = blocks.select(
        F.col(id_col).alias("b_id"), F.col(hash_col).alias("b_hash"),
        "blk", "val",
    )
    pairs = a.join(b_side, ["blk", "val"]).filter(F.col("a_id") < F.col("b_id"))
    # first agreeing block: no earlier block has equal values
    first_agree = None
    for b in range(n_blocks):
        earlier = (
            block_val(F.col("a_hash"), b) == block_val(F.col("b_hash"), b)
        ) & (F.col("blk") > b)
        first_agree = earlier if first_agree is None else first_agree | earlier
    ham = F.bit_count(
        F.col("a_hash").bitwiseXOR(F.col("b_hash")),
    ).cast("int")
    return (
        pairs.filter(~first_agree)
        .filter(ham <= max_hamming)
        .select("a_id", "b_id", ham.alias("hamming"))
    )
