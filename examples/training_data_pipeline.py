#!/usr/bin/env python
"""End-to-end training-data curation pipeline on the sf0.001 testdata.

Run: PYTHONPATH=/root/repo python examples/training_data_pipeline.py

The standard LLM-corpus shape, each stage a sed_spark ext operator:

1. exact dedup (md5 hash-groupBy)
2. near-dup clustering: MinHash → LSH pairs → connected components,
   keep one canonical doc per cluster
3. test-set decontamination (benchmark n-gram broadcast semi-join)
4. quality + repetition filters (Gopher-style)
5. PII redaction
6. similarity search sanity check over the embeddings table
7. deterministic train/val/test split + per-domain accounting
8. DSIR importance weights + Gumbel-top-k resample
9. BPE tokenizer training + token counting + sequence packing
9b. BM25 retrieval probe, PageRank centrality over the near-dup graph,
    trained quality classifier (distributed logistic regression), and
    mergeable corpus sketches (CMS term counts + HLL distinct terms)
9c. monitoring + curation extras: per-domain quantiles, decayed
    freshness, triangle/LPA graph signals, KMV set algebra, median/MAD
    outlier gates, weighted caps, JL projection shortlist + rerank

Every stage is a DataFrame→DataFrame transform, so the whole pipeline is
one lazy plan until the final counts — at 100 TB the same code runs with
the corpus partitioned across the cluster and only label/benchmark
tables broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sed_spark.ext import (
    corpus,
    dedup,
    graph,
    pii,
    retrieval,
    similarity,
    sketch,
    text,
    vocab,
)
from sed_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(app_name="training-data-pipeline")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n0 = docs.count()

    # 1. exact dedup: keep the smallest doc_id per content hash
    keep_exact = dedup.exact_dedup(docs).select(
        F.col("keep_id").alias("doc_id"),
    )
    docs = docs.join(keep_exact, "doc_id", "left_semi")

    # 2. near-dup clusters over the LSH pair graph, keep canonicals
    sigs = dedup.minhash_signatures(docs, n_bands=4)
    pairs = dedup.lsh_candidate_pairs(sigs, n_bands=4)
    clusters = graph.dedup_clusters(docs, pairs)
    docs = docs.join(
        clusters.filter(F.col("is_canonical") == 1).select("doc_id"),
        "doc_id",
        "left_semi",
    )

    # 3. decontamination against a (here: synthetic) benchmark set
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    contam = dedup.benchmark_contamination(docs, bench, shingle_n=3)
    docs = docs.join(
        contam.filter(F.col("is_contaminated") == 0).select("doc_id"),
        "doc_id",
        "left_semi",
    )

    # 4. quality + repetition gates (thresholds are corpus policy)
    quality = text.metrics(docs).filter(
        (F.col("n_words") >= 10) & (F.col("stopword_ratio") <= 0.9),
    )
    rep = text.repetition_stats(docs).filter(
        (F.col("dup_word_frac") <= 0.95)
        & (F.col("top_ngram_char_frac") <= 0.5),
    )
    docs = (
        docs.join(quality.select("doc_id"), "doc_id", "left_semi")
        .join(rep.select("doc_id"), "doc_id", "left_semi")
    )

    # 5. PII redaction on the surviving corpus
    clean = pii.pii_redact(docs)
    n_final = clean.count()
    pii_hits = clean.agg(
        F.sum("n_emails").alias("emails"),
        F.sum("n_ipv4").alias("ips"),
        F.sum("n_phones").alias("phones"),
    ).collect()[0]

    # 6. similarity search over the embeddings table (serving shape)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.limit(2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    topk = similarity.batch_cosine_topk(emb, q, k=5).count()

    # 6b. embedding-space curation: SemDeDup (keep the less typical
    # member of each near-duplicate pair) and semantic decontamination
    # (max cosine vs a broadcast benchmark set — catches paraphrased
    # eval leakage the n-gram filter in step 3 can't see)
    cents = similarity.kmeans_fit(emb, k=4, max_iter=3)
    sem = similarity.semantic_dedup(
        emb, cents, threshold=0.95, keep="far_from_centroid",
    )
    n_sem_dropped = sem.filter(F.col("is_kept") == 0).count()
    sem_bench = emb.filter(F.col("vec_id") % 50 == 0)
    sem_cont = similarity.semantic_contamination(emb, sem_bench, threshold=0.95)
    n_sem_contam = sem_cont.filter(F.col("is_contaminated") == 1).count()

    # 7. deterministic 90/5/5 split of the curated corpus + per-domain
    # accounting (the corpus has no URLs, so synthesize one per doc the
    # way the suite row does — the rollup/split operators are the point)
    with_urls = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" via https://www.host"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(".example.net/d/"),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    split = corpus.hash_split(
        docs, {"train": 0.9, "val": 0.05, "test": 0.05},
    ).select("doc_id", "split")
    per_split_domain = (
        corpus.extract_urls(with_urls)
        .join(split, "doc_id")
        .groupBy("split", "domain")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split", "domain")
        .collect()
    )
    splits = {r["split"] for r in per_split_domain}

    # 8. DSIR: fit target=benchmark vs raw=corpus, score every doc, then
    # Gumbel-top-k importance resample (deterministic, salt-keyed)
    ratios = text.dsir_fit(bench, docs, dim=64)
    weighted = corpus.gumbel_topk(
        text.dsir_score(docs, ratios), "dsir_logweight", k=50, salt="ex",
    )
    n_resampled = weighted.filter(F.col("is_sampled") == 1).count()

    # 9. train a BPE tokenizer on the curated corpus; count train-split
    # tokens under the learned merges, then pack into context windows
    merges = vocab.bpe_train(docs, n_merges=8)
    bpe_tok = vocab.bpe_token_counts(docs, merges)
    # the actual token-id sequences a trainer consumes (round 6)
    encoded = vocab.bpe_encode(docs, merges)
    n_total_ids = encoded.agg(F.sum(F.size("token_ids"))).collect()[0][0]
    train_tok = bpe_tok.join(
        split.filter(F.col("split") == "train"), "doc_id", "left_semi",
    )
    packed = text.pack_sequences(train_tok, "n_bpe_tokens", budget=2048)
    n_packs = packed.agg(F.max("pack_id")).collect()[0][0] + 1

    # 9c. the other tokenizer family (round 8): unigram-LM pieces via
    # deterministic hard-EM, then the Viterbi expression apply — token
    # counts under the learned pieces for the same packing accounting
    pieces = vocab.unigram_train(docs, vocab_size=40, max_piece_len=4,
                                 n_iter=2, seed_size=120)
    uni_tok = vocab.unigram_token_counts(docs, pieces)
    n_uni_tokens = uni_tok.agg(F.sum("n_unigram_tokens")).collect()[0][0]
    # WordPiece: likelihood-merge training + greedy longest-match encode
    wp_vocab = vocab.wordpiece_train(docs, n_merges=8)
    n_wp_tokens = vocab.wordpiece_token_counts(docs, wp_vocab).agg(
        F.sum("n_wordpiece_tokens"),
    ).collect()[0][0]

    # 9b. round-5 operators: BM25 retrieval against a probe query (the
    # retrieval-style decontamination screen), PageRank centrality over
    # the near-dup pair graph (the canonical-pick signal), a trained
    # quality classifier, and corpus sketches (CMS term frequencies +
    # HLL distinct-term estimate) that summarize the batch for merging
    # into a running corpus profile
    bm = retrieval.bm25_score(docs, ["customer", "table"])
    n_bm25_hits = bm.count()
    pr = graph.pagerank(
        pairs.select("a_id", "b_id").union(
            pairs.select(
                F.col("b_id").alias("a_id"), F.col("a_id").alias("b_id"),
            ),
        ),
        nodes=docs.select("doc_id"),
        n_iter=3,
    )
    top_central = pr.orderBy(F.col("rank_micro").desc()).first()
    labeled = docs.withColumn(
        "is_good", (F.col("doc_id") % 2 == 0).cast("int"),
    )
    cls_w, cls_b = text.classifier_fit(labeled, "is_good", dim=32, n_iter=4)
    scored = text.classifier_score(docs, cls_w, bias=cls_b)
    toks = docs.select(
        F.explode(
            F.filter(F.split("text", " "), lambda x: x != F.lit("")),
        ).alias("term"),
    )
    tcnt = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    cms = sketch.cms_build(tcnt, "term", weight_col="cnt")
    term_est = sketch.cms_query(cms, ["customer"]).first()["est"]
    hll_est = sketch.hll_estimate(
        sketch.hll_registers(toks, "term"),
    ).first()["estimate"]
    # grouped HLL (round 6): distinct-doc reach per split, one aggregate
    grp = sketch.hll_estimate_by(
        sketch.hll_registers_by(split, ["split"], "doc_id"), ["split"],
    ).collect()
    # compressed vector serving: PQ codebooks + m-byte codes + ADC top-k,
    # then the two-stage production shape (round 7): ADC shortlist ->
    # exact rerank of just those candidates
    pq_books = similarity.pq_train(emb, m=4, k=8, max_iter=2)
    pq_codes = similarity.pq_encode(emb, pq_books)
    q0 = emb.limit(1).collect()[0]["embedding"]
    pq_top = similarity.pq_topk(emb, pq_books, q0, k=5).count()
    reranked = similarity.pq_topk_rerank(emb, pq_books, q0, k=5, refine=4)
    n_reranked = reranked.count()

    # round-7 curation ops: a rule-stack quality gate with per-rule drop
    # attribution, and the snapshot diff an incremental ingestion records
    gated = text.quality_gate(
        text.metrics(docs),
        [
            ("too_short", F.col("n_words") >= 10),
            ("bad_lang", F.col("pred_lang") == "en"),
        ],
    )
    gate_counts = {
        r["reject_reason"]: r["n_docs"]
        for r in text.gate_stats(gated).collect()
    }
    prior = docs.filter(F.col("doc_id") % 7 != 0)  # last week's snapshot
    dd = corpus.corpus_diff(prior, docs)
    diff_counts = {
        r["status"]: r["n"]
        for r in dd.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    # round-7 monitoring ops: per-domain length p50/p99 out of ONE hash
    # aggregate (the per-source gate thresholds), recency-weighted domain
    # activity (the crawl freshness signal — order-independent, so daily
    # shards merge), and per-node triangle counts over the dedup pair
    # graph (a node inside many triangles sits in a near-dup clique)
    doms = corpus.extract_urls(with_urls).select("doc_id", "domain")
    dlen = text.metrics(docs).select("doc_id", "n_chars").join(doms, "doc_id")
    dom_p = corpus.quantile_by(dlen, "n_chars", "domain", [0.5, 0.99])
    n_dom_rows = dom_p.count()
    fresh = corpus.decayed_stats_by(
        doms.select("domain", (F.col("doc_id") * 3600).alias("ts")),
        "domain", "ts", half_life=86400.0,
        ref_ts=float(n0 * 3600),
    )
    top_fresh = fresh.orderBy(F.col("decayed_n").desc(), "domain").first()
    tri = graph.triangle_count(pairs, "a_id", "b_id")
    n_cliquey = tri.filter(F.col("n_triangles") > 0).count()

    # round-7 wave 2: LPA communities over the same pair graph (the
    # density-aware signal next to CC — a stray LSH bridge edge fuses
    # components but not communities); KMV set algebra between the two
    # halves' vocabularies (the intersection HLL can't estimate);
    # median/MAD outlier gate on doc lengths; per-domain WEIGHTED cap
    # (survival odds ∝ a quality weight); and a JL 64->16 projection
    # shortlist reranked exact
    lpa = graph.label_propagation(pairs, n_iter=3, nodes=docs.select("doc_id"))
    n_communities = lpa.select("community").distinct().count()
    toks_d = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term"),
    )
    kmv_a = sketch.kmv_sketch(toks_d.filter("doc_id % 2 = 0"), "term", k=64)
    kmv_b = sketch.kmv_sketch(toks_d.filter("doc_id % 2 = 1"), "term", k=64)
    overlap = sketch.kmv_set_estimates(kmv_a, kmv_b, k=64).collect()[0]
    rob = corpus.robust_stats_by(
        text.metrics(docs), "n_chars", "pred_lang", k=3.0,
    )
    n_len_outliers = int(
        rob.agg(F.sum("n_outliers")).collect()[0][0] or 0,
    )
    wcap = corpus.weighted_cap_sample(
        dlen.withColumn("qw", (F.col("n_chars") + 1).cast("double")),
        cap=15, weight_col="qw", salt="ex",
    )
    n_wcap = wcap.count()
    rp = similarity.random_project(emb, 64, 16)
    q_rp = similarity.project_vector(q0, 64, 16)
    shortlist = similarity.cosine_topk(rp, q_rp, k=20, vec_col="rp")
    rp_top = similarity.exact_rerank(
        emb, shortlist.select("vec_id"), q0, k=5,
    ).count()

    # round-9 curation ops: the EXACT near-dup sweep (prefix-filtered
    # similarity join — no LSH false negatives, candidates bounded by
    # rarest-token prefixes), corpus phrase mining (bigram lift), and
    # the per-domain heavy-hitters monitor
    exact_pairs = dedup.prefix_similarity_join(docs, threshold=0.8)
    n_exact_pairs = exact_pairs.count()
    # bloom semi-join reduction: the decontamination-shaped probe where
    # definitely-clean rows skip the shuffle entirely (row-identical to
    # the plain semi join — Bloom filters have no false negatives);
    # m_bits=None auto-sizes the bitmap from the HLL key-count estimate
    flagged = sketch.bloom_reduced_join(
        docs, bench.select("doc_id"), "doc_id", how="left_semi",
    )
    n_bloom_flagged = flagged.count()
    phrases = text.collocations(docs, min_count=5)
    top_phrase = phrases.orderBy(
        F.col("lift").desc(), "w1", "w2",
    ).first()
    hot_doms = corpus.top_items_by(doms, "domain", "doc_id", k=3)
    n_hot_rows = hot_doms.count()

    # 10. materialize the training order: a deterministic epoch shuffle
    # written as one ordered file per shard (a trainer reading shards in
    # index order replays the same global permutation on any machine)
    import tempfile

    shard_dir = tempfile.mkdtemp(prefix="sed_spark_example_shards_")
    corpus.write_training_shards(docs, shard_dir, n_shards=4, salt="epoch0")
    n_shard_rows = spark.read.parquet(shard_dir).count()

    print(f"documents: {n0} -> {n_final} after dedup/decontam/quality")
    print(f"pii redacted: emails={pii_hits['emails']} ips={pii_hits['ips']} "
          f"phones={pii_hits['phones']}")
    print(f"ann rows: {topk}")
    print(f"semdedup dropped {n_sem_dropped}; "
          f"semantic contamination flagged {n_sem_contam}")
    print(f"dsir resample kept {n_resampled} docs")
    print(f"bpe merges: {merges}")
    print(f"bpe-encoded corpus: {n_total_ids} token ids")
    print(f"unigram pieces: {len(pieces)}; corpus = {n_uni_tokens} "
          f"unigram / {n_wp_tokens} wordpiece tokens")
    for r in grp:
        print(f"  split={r['split']:<5} ~distinct docs={r['estimate']}")
    print(f"train split packs into {n_packs} x 2048-token windows")
    print(f"training shards hold {n_shard_rows} ordered rows")
    print(f"bm25 matched {n_bm25_hits} docs; most-central doc "
          f"{top_central['node']} (rank_micro={top_central['rank_micro']})")
    print(f"trained classifier scored {scored.count()} docs "
          f"(bias={cls_b})")
    print(f"cms('customer')={term_est}; hll distinct terms ~{hll_est}")
    print(f"pq adc top-5 rows={pq_top}; exact-reranked top-5 rows={n_reranked}")
    print(f"quality gate: {gate_counts}")
    print(f"corpus diff vs prior snapshot: {diff_counts}")
    print(f"per-domain length quantiles: {n_dom_rows} rows; "
          f"freshest domain {top_fresh['domain']} "
          f"(decayed_n={top_fresh['decayed_n']}); "
          f"{n_cliquey} pair-graph nodes sit in a triangle")
    print(f"lpa communities: {n_communities}; vocab overlap "
          f"jaccard~{overlap['jaccard_est']:.3f} "
          f"intersect~{overlap['intersect_est']:.0f}; "
          f"{n_len_outliers} length outliers past 3 MADs; "
          f"weighted cap kept {n_wcap}; rp16 rerank top-5 rows={rp_top}")
    print(f"pq: {pq_codes.count()} vectors -> 4-byte codes; "
          f"adc top-5 returned {pq_top}")
    tp = (f"{top_phrase['w1']} {top_phrase['w2']} "
          f"(lift={top_phrase['lift']:.1f})") if top_phrase else "none"
    print(f"exact near-dup pairs (t=0.8): {n_exact_pairs}; "
          f"top collocation: {tp}; domain top-3 rows: {n_hot_rows}; "
          f"bloom-reduced probe matched {n_bloom_flagged}")
    for r in per_split_domain:
        print(f"  split={r['split']:<5} domain={r['domain']:<20} "
              f"docs={r['n_docs']}")
    assert n_final > 0 and topk == 10
    assert n_resampled >= 50 and len(merges) == 8
    assert splits == {"train", "val", "test"} or "train" in splits
    assert n_sem_contam >= sem_bench.count()  # bench members self-match
    assert n_shard_rows == docs.count()
    import shutil

    shutil.rmtree(shard_dir, ignore_errors=True)
    print("pipeline OK")


if __name__ == "__main__":
    main()
