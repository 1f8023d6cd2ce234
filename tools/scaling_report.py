"""Operator scaling report: throughput across 100x input growth.

The suite's correctness runs at small scale factors; this tool provides
the SCALE evidence — each representative operator is run (best-of-2,
noop sink) on expression-synthesized inputs at 10x size steps, and the
table reports wall time, throughput, and the time ratio per 10x step
(~10 = linear; the job-overhead floor makes small sizes look sublinear).
Inputs are generated JVM-side (`spark.range` + md5/rand expressions), so
the measurement is the operator, not a driver upload.

    PYTHONPATH=/root/repo python tools/scaling_report.py > SCALING.md

Regenerate whenever operator implementations change materially.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_docs(spark, n: int):
    """Deterministic ~40-word word-soup documents, generated JVM-side.

    Word w of doc d is the md5-prefix of (d*40+w) taken from a 4096-word
    vocabulary (modulo), so shingles collide across documents the way a
    real corpus's do.
    """
    from pyspark.sql import functions as F

    words = F.transform(
        F.sequence(F.lit(1), F.lit(40)),
        lambda i: F.substring(
            F.md5(((F.col("id") * 40 + i) % 4096).cast("string")), 1, 6,
        ),
    )
    par = spark.sparkContext.defaultParallelism * 4
    return spark.range(0, n, 1, par).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text"),
    )


def synth_embeddings(spark, n: int, dim: int = 64):
    from pyspark.sql import functions as F

    par = spark.sparkContext.defaultParallelism * 4
    vec = F.array(*[F.rand(seed=100 + d) * 2 - 1 for d in range(dim)])
    return spark.range(0, n, 1, par).select(
        F.col("id").alias("vec_id"), vec.alias("embedding"),
    )


def main() -> None:
    from pyspark.sql import functions as F

    from sed_spark.binning import sparse_histogram
    from sed_spark.ext import (
        corpus,
        dedup,
        graph,
        retrieval,
        similarity,
        sketch,
        text,
        vocab,
    )
    from sed_spark.session import get_spark

    spark = get_spark(
        app_name="sed-spark-scaling",
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "48g",
            ),
            "spark.driver.maxResultSize": "8g",
            "spark.log.level": "ERROR",
        },
    )

    def run_noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    def timed(fn, reps: int = 2) -> float:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    # inputs are PINNED (persist + count) before the operator is timed, and
    # unpersisted after each size. Round-4's table timed operator + input
    # synthesis fused into one job, and the synthesis (40 md5 calls/row for
    # the word-soup docs) dominated: dedup_exact at 1e7 measured 7.1 s
    # fused vs 0.98 s on a pinned input — the reported "knee" was the
    # generator, not the operator.
    pinned: list = []

    def pin(df):
        df = df.persist()
        df.count()
        pinned.append(df)
        return df

    def unpin_all() -> None:
        while pinned:
            pinned.pop().unpersist()

    # each entry: (operator label, sizes, builder(n) -> thunk)
    def _text_metrics(n):
        d = pin(synth_docs(spark, n))
        return lambda: run_noop(text.metrics(d))

    def _dedup_exact(n):
        d = pin(synth_docs(spark, n))
        return lambda: run_noop(dedup.exact_dedup(d))

    def _minhash(n):
        d = pin(synth_docs(spark, n))
        return lambda: run_noop(dedup.minhash_signatures(d, n_bands=4))

    def _pack(n):
        d = pin(synth_docs(spark, n).withColumn("n_tok", F.length("text")))
        return lambda: run_noop(
            text.pack_sequences(d, "n_tok", budget=4096),
        )

    def _hash_split(n):
        d = pin(synth_docs(spark, n))
        return lambda: run_noop(
            corpus.hash_split(d, {"a": 0.9, "b": 0.1}),
        )

    def _hist2d(n):
        d = spark.range(0, n, 1, spark.sparkContext.defaultParallelism * 4)
        d = pin(d.select(
            (F.rand(1) * 500).alias("x"), (F.rand(2) * 500).alias("y"),
        ))
        agg, _, _ = sparse_histogram(
            d, bins=[100, 100], axes=["x", "y"],
            ranges=[(0.0, 500.0), (0.0, 500.0)], count_alias="cnt",
        )
        return lambda: run_noop(agg)

    def _batch_ann(n):
        emb = pin(synth_embeddings(spark, n))
        q = emb.filter(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        return lambda: run_noop(similarity.batch_cosine_topk(emb, q, k=10))

    def _dup_spans(n):
        d = pin(synth_docs(spark, n))
        return lambda: run_noop(dedup.duplicate_spans(d, window=5))

    def _dsir(n):
        d = pin(synth_docs(spark, n))
        ratios = [((i * 2654435761) % 1000) / 500.0 - 1.0 for i in range(128)]
        return lambda: run_noop(text.dsir_score(d, ratios))

    def _word_doc_freq(n):
        d = pin(synth_docs(spark, n))
        return lambda: run_noop(vocab.word_doc_freq(d))

    def _bpe_counts(n):
        d = pin(synth_docs(spark, n))
        # fixed 8-merge list over hex-digit symbols (application cost;
        # training itself is vocabulary-sized, not corpus-sized)
        merges = [("a", "b"), ("0", "1"), ("c", "d"), ("2", "3"),
                  ("e", "f"), ("4", "5"), ("ab", "cd"), ("6", "7")]
        return lambda: run_noop(vocab.bpe_token_counts(d, merges))

    def _unigram_counts(n):
        # fixed 20-piece table over hex-digit words (application cost;
        # training is vocabulary-sized, not corpus-sized — same contract
        # as the bpe_token_counts row)
        d = pin(synth_docs(spark, n))
        pieces = sorted(
            {c: 2_000_000 for c in "0123456789abcdef"}.items(),
        ) + [("ab", 1_500_000), ("cd", 1_500_000),
             ("abc", 1_200_000), ("f0", 1_500_000)]
        return lambda: run_noop(vocab.unigram_token_counts(d, pieces))

    def _wordpiece_counts(n):
        # greedy longest-match fold over hex-digit words under a 36-piece
        # vocab (16 chars + ## continuations + 2 multi) — application
        # cost, same per-vocabulary-word contract as the other tokenizers
        d = pin(synth_docs(spark, n))
        chars = list("0123456789abcdef")
        wp_vocab = chars + ["##" + c for c in chars] + ["ab", "##cd"]
        return lambda: run_noop(vocab.wordpiece_token_counts(d, wp_vocab))

    def _gumbel(n):
        d = pin(synth_docs(spark, n).withColumn("w", F.rand(5)))
        return lambda: run_noop(
            corpus.gumbel_topk(d, "w", k=100, method="xxhash64"),
        )

    def _semantic_dedup(n):
        # the documented k-sizing rule in action: k grows with n so
        # clusters stay ~500 rows and the within-cluster pair join stays
        # O(n * cluster), not O(n^2 / k_fixed)
        emb = pin(synth_embeddings(spark, n))
        k = max(8, n // 500)
        cents = similarity.deterministic_planes(k, 64, seed=77)
        return lambda: run_noop(
            similarity.semantic_dedup(emb, cents, threshold=0.9),
        )

    def _jaccard_est(n):
        # estimate cost over n candidate PAIRS (the operator's true input
        # scale): pinned signatures + a pinned consecutive-id pair table;
        # the timed stage is the two signature joins + band-equality
        # mean. (NOT lsh_candidate_pairs output: the word-soup corpus is
        # deliberately collision-heavy, so its banding buckets — and the
        # pair count — grow quadratically; the suite row covers real
        # banded pair generation, this row scales the estimator.)
        sigs = pin(dedup.minhash_signatures(synth_docs(spark, n), n_bands=4))
        par = spark.sparkContext.defaultParallelism * 4
        prs = pin(
            spark.range(0, n - 1, 1, par).select(
                F.col("id").alias("a_id"), (F.col("id") + 1).alias("b_id"),
            ),
        )
        return lambda: run_noop(
            dedup.minhash_jaccard_estimate(prs, sigs, n_bands=4),
        )

    def _bm25(n):
        # every 8th doc carries one of three anchor terms so the query
        # matches a bounded slice of the corpus at every size
        d = pin(
            synth_docs(spark, n).withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 8 == 0,
                    F.concat(
                        F.col("text"),
                        F.lit(" anchor"),
                        (F.col("doc_id") % 3).cast("string"),
                    ),
                ).otherwise(F.col("text")),
            ),
        )
        return lambda: run_noop(
            retrieval.bm25_score(d, ["anchor0", "anchor1", "anchor2"]),
        )

    def _pagerank(n):
        # ring + long-jump graph: every node has out-degree 2, diameter
        # O(log n); n rows of edges per iteration through 3 fixed rounds
        e = pin(
            spark.range(
                0, n, 1, spark.sparkContext.defaultParallelism * 4,
            ).select(
                F.col("id").alias("a_id"),
                ((F.col("id") + 1) % n).alias("b_id"),
            ).union(
                spark.range(
                    0, n, 1, spark.sparkContext.defaultParallelism * 4,
                ).select(
                    F.col("id").alias("a_id"),
                    ((F.col("id") * 31 + 7) % n).alias("b_id"),
                ),
            ),
        )
        return lambda: run_noop(graph.pagerank(e, n_iter=3))

    def _pt_interval_join(n):
        # n points, n/10 touching width-10 intervals -> every point lands
        # in exactly one interval; output n rows, 1-2 buckets per interval
        from sed_spark.dfops import point_in_interval_join

        par = spark.sparkContext.defaultParallelism * 4
        pts = pin(
            spark.range(0, n, 1, par).select(
                F.col("id").alias("pid"), (F.rand(11) * n).alias("x"),
            ),
        )
        ivs = pin(
            spark.range(0, n // 10, 1, par).select(
                F.col("id").alias("iid"),
                (F.col("id") * 10.0).alias("lo"),
                (F.col("id") * 10.0 + 10.0).alias("hi"),
            ),
        )
        return lambda: run_noop(
            point_in_interval_join(
                pts, ivs, on="x", lo_col="lo", hi_col="hi",
                bucket_width=10.0,
            ),
        )

    def _overlap_join(n):
        # two sides of n unit-length intervals uniform on [0, n/2]
        # (density 2/unit -> ~4 overlaps per left row, linear output)
        from sed_spark.dfops import interval_overlap_join

        par = spark.sparkContext.defaultParallelism * 4

        def side(prefix, seed):
            lo = F.rand(seed) * (n / 2.0)
            return pin(
                spark.range(0, n, 1, par).select(
                    F.col("id").alias(f"{prefix}_id"),
                    lo.alias(f"{prefix}_lo"),
                    (lo + 1.0).alias(f"{prefix}_hi"),
                ),
            )

        lhs, rhs = side("a", 21), side("b", 22)
        return lambda: run_noop(
            interval_overlap_join(
                lhs, rhs, "a_lo", "a_hi", "b_lo", "b_hi", bucket_width=1.0,
            ),
        )

    def _simhash16(n):
        d = pin(synth_docs(spark, n))
        return lambda: run_noop(dedup.simhash16(d))

    def _simhash_pairs(n):
        # NOTE: a 16-bit fingerprint space saturates once n >> 2^16 — the
        # PAIR OUTPUT itself grows ~n^2/2^16, so the step ratio here reads
        # the output size, not the banding machinery; real corpora use the
        # operator after sharding or with wider fingerprints. max_hamming=1
        # (2 blocks of 8 bits) keeps candidates ~n^2/128.
        par = spark.sparkContext.defaultParallelism * 4
        fps = pin(
            spark.range(0, n, 1, par).select(
                F.col("id").alias("doc_id"),
                ((F.col("id") * 2654435761) % 65536).alias("simhash"),
            ),
        )
        return lambda: run_noop(dedup.simhash_pairs(fps, max_hamming=1))

    # deterministic PQ codebooks (m=4, k=8 over dim 64): Knuth-hash
    # values in [-1, 1), the same rule as text.hashed_weights
    def _pq_books(m=4, k=8, dsub=16):
        def h(i):
            return ((i * 2654435761) % 4294967296) / 4294967296 * 2 - 1
        return [
            [[h(mm * 1000 + j * 100 + i) for i in range(dsub)]
             for j in range(k)]
            for mm in range(m)
        ]

    def _pq_adc(n):
        # encode (argmax over 8 codes x 4 subspaces) + ADC lookup scoring
        emb = pin(synth_embeddings(spark, n))
        books = _pq_books()
        query = [_pq_books(1, 1, 64)[0][0][i] for i in range(64)]
        return lambda: run_noop(
            similarity.pq_topk(emb, books, query, k=10),
        )

    def _pq_adc_expanded(n):
        # the EXPANDED_SCORING variant: flat codegen sums instead of
        # interpreted folds (identical values; needs a multi-GB driver)
        emb = pin(synth_embeddings(spark, n))
        books = _pq_books()
        query = [_pq_books(1, 1, 64)[0][0][i] for i in range(64)]

        def thunk():
            similarity.EXPANDED_SCORING = True
            try:
                run_noop(similarity.pq_topk(emb, books, query, k=10))
            finally:
                similarity.EXPANDED_SCORING = False

        return thunk

    def _equidepth(n):
        from sed_spark.binning import equidepth_edges

        par = spark.sparkContext.defaultParallelism * 4
        d = pin(
            spark.range(0, n, 1, par).select(
                (F.rand(31) ** 4 * 1e6).alias("x"),  # heavy skew
            ),
        )
        return lambda: equidepth_edges(d, "x", 64)

    def _stream_interval_join(n):
        # file-source replay of the watermarked stream-stream interval
        # join: n left x n right events, ~1 match per left row; the
        # parquet staging is NOT timed (pinned-input rule)
        import shutil
        import tempfile

        from sed_spark import streaming as sstream

        par = spark.sparkContext.defaultParallelism * 4
        tmp = tempfile.mkdtemp(prefix="scaling_sij_")
        base = spark.range(0, n, 1, par)
        base.select(
            F.col("id").alias("lk"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + (F.col("id") % 1000),
            ).alias("lt"),
        ).write.mode("overwrite").parquet(f"{tmp}/left")
        base.select(
            F.col("id").alias("rk"),
            F.timestamp_seconds(
                F.lit(1_700_000_000) + (F.col("id") % 1000)
                + (F.col("id") % 30),
            ).alias("rt"),
        ).write.mode("overwrite").parquet(f"{tmp}/right")
        lschema = spark.read.parquet(f"{tmp}/left").schema
        rschema = spark.read.parquet(f"{tmp}/right").schema

        def thunk(tmp=tmp):
            lhs = spark.readStream.schema(lschema).parquet(f"{tmp}/left")
            rhs = spark.readStream.schema(rschema).parquet(f"{tmp}/right")
            joined = sstream.streaming_interval_join(
                lhs, rhs, "lk", "rk", "lt", "rt",
                lag_seconds=60, watermark="10 seconds",
            )
            sstream.run_available_now(
                joined, "scaling_sij", output_mode="append",
            )
            spark.catalog.dropTempView("scaling_sij")

        thunk.cleanup = lambda: shutil.rmtree(tmp, ignore_errors=True)
        return thunk

    def _zorder_value(n):
        # the Morton projection alone (the write adds one range exchange
        # + an in-partition sort on top): 2 dims x 12 bits, expression-only
        from sed_spark import layout

        par = spark.sparkContext.defaultParallelism * 4
        d = pin(
            spark.range(0, n, 1, par).select(
                (F.rand(41) * 1000).alias("x"), (F.rand(42) * 1000).alias("y"),
            ),
        )
        return lambda: run_noop(
            layout.zorder_value(
                d, ["x", "y"], [(0.0, 1000.0), (0.0, 1000.0)],
                bits_per_dim=12,
            ),
        )

    def _hll_by_group(n):
        # grouped HLL: 100 groups x p=12 registers from n rows
        par = spark.sparkContext.defaultParallelism * 4
        d = pin(
            spark.range(0, n, 1, par).select(
                (F.col("id") % 100).cast("string").alias("g"),
                F.col("id").cast("string").alias("key"),
            ),
        )
        return lambda: run_noop(
            sketch.hll_estimate_by(
                sketch.hll_registers_by(d, ["g"], "key", p=12), ["g"], p=12,
            ),
        )

    def _cms(n):
        d = pin(
            spark.range(
                0, n, 1, spark.sparkContext.defaultParallelism * 4,
            ).select((F.col("id") % 100_000).cast("string").alias("key")),
        )
        return lambda: run_noop(sketch.cms_build(d, "key"))

    def _hll(n):
        d = pin(
            spark.range(
                0, n, 1, spark.sparkContext.defaultParallelism * 4,
            ).select(F.col("id").cast("string").alias("key")),
        )
        return lambda: run_noop(sketch.hll_registers(d, "key", p=12))

    def _skew_join(n):
        from sed_spark.dfops import skew_join

        par = spark.sparkContext.defaultParallelism * 4
        nk = max(n // 10, 10)
        left = pin(
            spark.range(0, n, 1, par).select(
                F.when(F.col("id") % 10 < 3, F.lit(7).cast("long"))
                .otherwise(F.col("id") % nk).alias("k"),
                F.col("id").alias("lv"),
            ),
        )
        right = pin(
            spark.range(0, nk, 1, par).select(
                F.col("id").alias("k"),
                F.md5(F.col("id").cast("string")).alias("tag"),
            ),
        )
        # 30% of left rows on one hot key; detection included in the
        # timed path (it is part of the operator's cost contract)
        return lambda: run_noop(
            skew_join(left, right, "k", hot_threshold=max(n // 100, 10)),
        )

    def _salted_join(n):
        from sed_spark.dfops import salted_join

        par = spark.sparkContext.defaultParallelism * 4
        nk = max(n // 10, 10)
        left = pin(
            spark.range(0, n, 1, par).select(
                F.when(F.col("id") % 10 < 3, F.lit(7).cast("long"))
                .otherwise(F.col("id") % nk).alias("k"),
                F.col("id").alias("lv"),
            ),
        )
        right = pin(
            spark.range(0, nk, 1, par).select(
                F.col("id").alias("k"),
                F.md5(F.col("id").cast("string")).alias("tag"),
            ),
        )
        return lambda: run_noop(salted_join(left, right, "k", salt=16))

    def _corpus_diff(n):
        old = pin(synth_docs(spark, n))
        # new version: 10% of ids perturbed, the last 5% of ids fresh,
        # the first 5% removed — all four statuses live at every size
        new = pin(
            synth_docs(spark, n)
            .filter(F.col("doc_id") >= n // 20)
            .select(
                "doc_id",
                F.when(
                    F.col("doc_id") % 10 == 3,
                    F.concat(F.col("text"), F.lit(" v2")),
                ).otherwise(F.col("text")).alias("text"),
            )
            .unionByName(
                spark.range(n, n + n // 20).select(
                    F.col("id").alias("doc_id"), F.lit("fresh doc").alias("text"),
                ),
            ),
        )
        return lambda: run_noop(corpus.corpus_diff(old, new))

    def _bloom_file_index(n):
        import shutil
        import tempfile

        from sed_spark import layout

        par = spark.sparkContext.defaultParallelism * 4
        tmp = tempfile.mkdtemp(prefix="scaling_bloomidx_")
        spark.range(0, n, 1, par).select(
            (F.col("id") % max(n // 10, 10)).alias("k"),
            F.col("id").alias("v"),
        ).repartition(16, "k").write.mode("overwrite").parquet(tmp)

        def thunk():
            run_noop(layout.bloom_file_index(spark, tmp, "k"))

        thunk.cleanup = lambda: shutil.rmtree(tmp, ignore_errors=True)
        return thunk

    def _funnel(n):
        # 3-step ordered funnel over n events / n//100 users
        from sed_spark import dfops

        par = spark.sparkContext.defaultParallelism * 4
        d = pin(
            spark.range(0, n, 1, par).select(
                (F.col("id") % max(n // 100, 10)).alias("user_id"),
                F.element_at(
                    F.array(F.lit("signup"), F.lit("view"), F.lit("purchase"),
                            F.lit("click"), F.lit("error")),
                    (F.pmod(F.hash(F.col("id")), F.lit(5)) + 1).cast("int"),
                ).alias("event_type"),
                F.col("id").alias("ts"),
            ),
        )
        return lambda: run_noop(
            dfops.funnel_steps(d, ["signup", "view", "purchase"]),
        )

    def _rp(n):
        # JL 64->16 sign projection + cosine top-10 in projected space
        d = pin(synth_embeddings(spark, n))
        q_rp = similarity.project_vector([0.1] * 64, 64, 16)
        return lambda: run_noop(
            similarity.cosine_topk(
                similarity.random_project(d, 64, 16), q_rp, k=10,
                vec_col="rp",
            ),
        )

    def _robust(n):
        # 100 groups: median + MAD + outlier count, approx sketch mode
        par = spark.sparkContext.defaultParallelism * 4
        d = pin(
            spark.range(0, n, 1, par).select(
                (F.col("id") % 100).alias("g"),
                (F.rand(13) * 1000).alias("value"),
            ),
        )
        return lambda: run_noop(
            corpus.robust_stats_by(d, "value", "g", k=3.0),
        )

    def _lpa(n):
        # 3 synchronous rounds over the same deg~20 graph as triangles
        par = spark.sparkContext.defaultParallelism * 4
        nodes = max(n // 10, 10)
        d = pin(
            spark.range(0, n, 1, par).select(
                F.pmod(F.hash((F.col("id") * 2).cast("string")), F.lit(nodes))
                .alias("a_id"),
                F.pmod(F.hash((F.col("id") * 2 + 1).cast("string")), F.lit(nodes))
                .alias("b_id"),
            ),
        )
        return lambda: run_noop(graph.label_propagation(d, n_iter=3))

    def _weighted_cap(n):
        # A-ES weighted cap: 100 domains, cap 1000 survivors each — one
        # keyed window rank over the hash-derived key
        par = spark.sparkContext.defaultParallelism * 4
        d = pin(
            spark.range(0, n, 1, par).select(
                F.col("id").alias("doc_id"),
                (F.col("id") % 100).cast("string").alias("domain"),
                (F.rand(17) + 0.01).alias("w"),
            ),
        )
        return lambda: run_noop(
            corpus.weighted_cap_sample(d, cap=1000, weight_col="w"),
        )

    def _quantile_by_exact(n):
        # exact percentile mode (the oracle-audit path): sorts each
        # group's values inside the aggregate — memory-bound per group,
        # so the honest sizes stop a decade below the approx row's
        par = spark.sparkContext.defaultParallelism * 4
        d = pin(
            spark.range(0, n, 1, par).select(
                (F.col("id") % 100).alias("g"),
                (F.rand(7) * 1000).alias("value"),
            ),
        )
        return lambda: run_noop(
            corpus.quantile_by(d, "value", "g", [0.5, 0.9, 0.99],
                               exact=True),
        )

    def _robust_exact(n):
        par = spark.sparkContext.defaultParallelism * 4
        d = pin(
            spark.range(0, n, 1, par).select(
                (F.col("id") % 100).alias("g"),
                (F.rand(13) * 1000).alias("value"),
            ),
        )
        return lambda: run_noop(
            corpus.robust_stats_by(d, "value", "g", k=3.0, exact=True),
        )

    def _kmv(n):
        # bottom-256 distinct-hash sketch: distinct + TakeOrdered(k)
        d = pin(
            spark.range(
                0, n, 1, spark.sparkContext.defaultParallelism * 4,
            ).select(F.col("id").cast("string").alias("key")),
        )
        return lambda: run_noop(sketch.kmv_sketch(d, "key", k=256))

    def _quantile_by(n):
        # 100 groups x 3 probs out of one hash aggregate (approx sketch —
        # the at-scale path; exact mode is the suite's oracle audit)
        par = spark.sparkContext.defaultParallelism * 4
        d = pin(
            spark.range(0, n, 1, par).select(
                (F.col("id") % 100).alias("g"),
                (F.rand(7) * 1000).alias("value"),
            ),
        )
        return lambda: run_noop(
            corpus.quantile_by(d, "value", "g", [0.5, 0.9, 0.99]),
        )

    def _decayed_stats(n):
        # 100 keys, event times spread over ~30 days, pinned ref_ts
        par = spark.sparkContext.defaultParallelism * 4
        d = pin(
            spark.range(0, n, 1, par).select(
                (F.col("id") % 100).alias("g"),
                (F.lit(1_700_000_000) + F.col("id") % 2_592_000).alias("ts"),
                F.rand(9).alias("value"),
            ),
        )
        return lambda: run_noop(
            corpus.decayed_stats_by(
                d, "g", "ts", value_col="value",
                half_life=86400.0, ref_ts=1_702_592_000.0,
            ),
        )

    def _triangles(n):
        # n edges over n/10 nodes, hash-scattered endpoints (bounded
        # degree ~20, so the wedge join stays ~d^2/2 per node and the
        # measured shape is the two shuffle joins, not a hub blowup)
        par = spark.sparkContext.defaultParallelism * 4
        nodes = max(n // 10, 10)
        d = pin(
            spark.range(0, n, 1, par).select(
                F.pmod(F.hash((F.col("id") * 2).cast("string")), F.lit(nodes))
                .alias("a_id"),
                F.pmod(F.hash((F.col("id") * 2 + 1).cast("string")), F.lit(nodes))
                .alias("b_id"),
            ),
        )
        return lambda: run_noop(graph.triangle_count(d, "a_id", "b_id"))

    def _triangles_hub(n):
        # adversarial skew: 10% of edges hit ONE hub node. The naive
        # middle-node wedge join generates d^2/2 ≈ n^2/200 hub wedges
        # (5e11 at 1e7 — a straggler that never finishes); degree-ordered
        # orientation (round 8) pivots wedges at the ≺-smaller endpoint,
        # so the hub only fans out toward its few ≺-larger peers and the
        # row scales like the uniform graph
        par = spark.sparkContext.defaultParallelism * 4
        nodes = max(n // 10, 10)
        d = pin(
            spark.range(0, n, 1, par).select(
                F.when(F.col("id") % 10 == 0, F.lit(0).cast("int"))
                .otherwise(
                    F.pmod(F.hash((F.col("id") * 2).cast("string")),
                           F.lit(nodes)),
                ).alias("a_id"),
                F.pmod(
                    F.hash((F.col("id") * 2 + 1).cast("string")),
                    F.lit(nodes),
                ).alias("b_id"),
            ),
        )
        return lambda: run_noop(graph.triangle_count(d, "a_id", "b_id"))

    def _stream_enrich(n):
        # file-source replay of the stream-static broadcast enrichment:
        # n events probe a 10k-row dimension, no join state
        import shutil
        import tempfile

        from sed_spark import streaming as sstream

        par = spark.sparkContext.defaultParallelism * 4
        tmp = tempfile.mkdtemp(prefix="scaling_enrich_")
        spark.range(0, n, 1, par).select(
            (F.col("id") % 10_000).alias("user_id"),
            F.col("id").alias("event_id"),
        ).write.mode("overwrite").parquet(tmp)
        schema = spark.read.parquet(tmp).schema
        dim = pin(
            spark.range(0, 10_000).select(
                F.col("id").alias("user_id"),
                (F.col("id") % 7).cast("string").alias("segment"),
            ),
        )

        def thunk(tmp=tmp, dim=dim):
            stream = spark.readStream.schema(schema).parquet(tmp)
            enriched = sstream.streaming_enrich(stream, dim, "user_id")
            sstream.run_available_now(
                enriched.groupBy("segment").agg(
                    F.count(F.lit(1)).alias("n"),
                ),
                "scaling_enrich", output_mode="complete",
            )
            spark.catalog.dropTempView("scaling_enrich")

        thunk.cleanup = lambda: shutil.rmtree(tmp, ignore_errors=True)
        return thunk

    def _ppjoin(n):
        # 40 hash-scattered words per doc from a 4096-word vocab (no
        # consecutive-range structure, so chance 3-gram collisions are
        # ~0); every 10th doc copies its predecessor with its one
        # id-bearing word changed -> ~n/10 planted near-dup pairs and
        # OUTPUT LINEAR in n. (synth_docs is unusable here: its mod-4096
        # indexing repeats whole documents every 512 ids, and a
        # duplicate-GROUP corpus makes the ANSWER itself quadratic in
        # group size — the algorithm must emit every qualifying pair.
        # Real pipelines run exact_dedup before the near-dup sweep, as
        # examples/training_data_pipeline.py does.)
        par = spark.sparkContext.defaultParallelism * 4
        src = F.when(
            (F.col("id") % 10 == 0) & (F.col("id") > 0), F.col("id") - 1,
        ).otherwise(F.col("id"))
        words = F.transform(
            F.sequence(F.lit(1), F.lit(40)),
            lambda i: F.when(
                i == 1,
                F.substring(F.md5(F.concat(F.lit("u"), F.col("id"))), 1, 6),
            ).otherwise(
                F.substring(
                    F.md5(
                        F.pmod(
                            F.hash(src.cast("string"), i.cast("string")),
                            F.lit(4096),
                        ).cast("string"),
                    ),
                    1, 6,
                ),
            ),
        )
        d = pin(
            spark.range(0, n, 1, par).select(
                F.col("id").alias("doc_id"),
                F.concat_ws(" ", words).alias("text"),
            ),
        )
        return lambda: run_noop(
            dedup.prefix_similarity_join(d, threshold=0.8),
        )

    def _top_items(n):
        # 100 groups x 1000 hash-scattered items: one (g, item) hash agg
        # collapses n rows to <=100k, the ranking window sorts only those
        par = spark.sparkContext.defaultParallelism * 4
        d = pin(
            spark.range(0, n, 1, par).select(
                (F.col("id") % 100).alias("g"),
                F.pmod(F.hash(F.col("id").cast("string")), F.lit(1000))
                .alias("item"),
            ),
        )
        return lambda: run_noop(corpus.top_items_by(d, "g", "item", k=10))

    def _colloc(n):
        # two corpus-sized aggregates (bigram + unigram counts) + two
        # vocabulary-sized joins; min_count prunes before the joins
        d = pin(synth_docs(spark, n))
        return lambda: run_noop(text.collocations(d, min_count=5))

    def _bloom_join(n):
        # n-row fact, 10k-key dimension, keys scattered over 160k values
        # so ~15/16 of fact rows are definitely-absent and drop at the
        # codegen probe BEFORE the shuffle; the join then runs on the
        # surviving 1/16
        par = spark.sparkContext.defaultParallelism * 4
        fact = pin(
            spark.range(0, n, 1, par).select(
                F.pmod(F.hash(F.col("id").cast("string")), F.lit(160_000))
                .alias("k"),
                F.col("id").alias("v"),
            ),
        )
        dim = pin(
            spark.range(0, 10_000).select(
                F.col("id").alias("k"), (F.col("id") % 7).alias("seg"),
            ),
        )
        return lambda: run_noop(
            sketch.bloom_reduced_join(fact, dim, "k", how="inner"),
        )

    cases = [
        ("text_metrics (fused text scan)", [10**5, 10**6, 10**7], _text_metrics),
        ("dedup_exact (hash-groupBy)", [10**5, 10**6, 10**7], _dedup_exact),
        ("hash_split (projection)", [10**5, 10**6, 10**7], _hash_split),
        ("pack_sequences (2-phase prefix sum)", [10**5, 10**6, 10**7], _pack),
        ("minhash_signatures (explode+agg)", [10**5, 10**6], _minhash),
        ("batch_cosine_topk (arrow scorer)", [10**5, 10**6], _batch_ann),
        ("sparse_histogram 100x100", [10**6, 10**7, 10**8], _hist2d),
        ("duplicate_spans (windows+islands)", [10**5, 10**6], _dup_spans),
        ("dsir_score (literal-fold projection)", [10**5, 10**6, 10**7], _dsir),
        ("word_doc_freq (2-stage agg)", [10**5, 10**6, 10**7], _word_doc_freq),
        ("bpe_token_counts (vocab join-back)", [10**5, 10**6, 10**7], _bpe_counts),
        ("unigram_token_counts (Viterbi apply)", [10**5, 10**6, 10**7], _unigram_counts),
        ("wordpiece_token_counts (greedy fold)", [10**5, 10**6, 10**7], _wordpiece_counts),
        ("gumbel_topk (2-pass sample)", [10**5, 10**6, 10**7], _gumbel),
        ("semantic_dedup (k scaled, ~500/cluster)", [10**4, 10**5], _semantic_dedup),
        ("minhash_jaccard_estimate (pair joins)", [10**5, 10**6], _jaccard_est),
        ("bm25_score (query-filtered postings)", [10**5, 10**6, 10**7], _bm25),
        ("pagerank (3 int rounds, 2n edges)", [10**5, 10**6, 10**7], _pagerank),
        ("cms_build (1024x4 counters)", [10**6, 10**7, 10**8], _cms),
        ("hll_registers (p=12)", [10**6, 10**7, 10**8], _hll),
        ("point_in_interval_join (bucketed)", [10**5, 10**6, 10**7], _pt_interval_join),
        ("interval_overlap_join (bucketed)", [10**5, 10**6], _overlap_join),
        ("simhash16 (explode + 16-sum agg)", [10**5, 10**6, 10**7], _simhash16),
        ("simhash_pairs (16-bit space saturates)", [10**4, 10**5], _simhash_pairs),
        ("pq_topk (encode + ADC scoring)", [10**5, 10**6, 10**7], _pq_adc),
        ("pq_topk EXPANDED_SCORING", [10**6, 10**7], _pq_adc_expanded),
        ("equidepth_edges (approx, 64 bins)", [10**6, 10**7, 10**8], _equidepth),
        ("streaming_interval_join (replay)", [10**5, 10**6], _stream_interval_join),
        ("zorder_value (2x12-bit Morton proj)", [10**6, 10**7, 10**8], _zorder_value),
        ("hll_estimate_by (100 grp, p=12)", [10**6, 10**7, 10**8], _hll_by_group),
        ("skew_join (30% one hot key, detect+split)", [10**5, 10**6, 10**7], _skew_join),
        ("salted_join (salt=16, right x16)", [10**5, 10**6, 10**7], _salted_join),
        ("corpus_diff (id-hash full outer)", [10**5, 10**6, 10**7], _corpus_diff),
        ("bloom_file_index (16-file build)", [10**5, 10**6, 10**7], _bloom_file_index),
        ("quantile_by (100 grp x 3 probs, approx)", [10**6, 10**7, 10**8], _quantile_by),
        ("decayed_stats_by (100 keys)", [10**6, 10**7, 10**8], _decayed_stats),
        ("triangle_count (deg~20 graph)", [10**5, 10**6, 10**7], _triangles),
        ("triangle_count (10% edges on 1 hub)", [10**5, 10**6, 10**7], _triangles_hub),
        ("streaming_enrich (10k-dim replay)", [10**5, 10**6, 10**7], _stream_enrich),
        ("kmv_sketch (k=256 bottom-k)", [10**6, 10**7, 10**8], _kmv),
        ("label_propagation (3 rounds, deg~20)", [10**5, 10**6, 10**7], _lpa),
        ("robust_stats_by (100 grp med/MAD)", [10**6, 10**7, 10**8], _robust),
        ("robust_stats_by EXACT percentiles", [10**5, 10**6, 10**7], _robust_exact),
        ("quantile_by EXACT (oracle-audit mode)", [10**5, 10**6, 10**7], _quantile_by_exact),
        ("weighted_cap_sample (100 dom, cap 1k)", [10**6, 10**7, 10**8], _weighted_cap),
        ("random_project 64->16 + topk", [10**5, 10**6, 10**7], _rp),
        ("funnel_steps (3 steps, n/100 users)", [10**6, 10**7, 10**8], _funnel),
        ("prefix_similarity_join (t=0.8)", [10**5, 10**6, 10**7], _ppjoin),
        ("top_items_by (100 grp, k=10)", [10**6, 10**7, 10**8], _top_items),
        ("collocations (min_count=5)", [10**5, 10**6, 10**7, 10**8], _colloc),
        ("bloom_reduced_join (1/16 match)", [10**6, 10**7, 10**8], _bloom_join),
    ]

    # optional substring filters: `scaling_report.py bm25 pagerank` times
    # only the matching cases (for appending new-operator rows without a
    # multi-hour full regen)
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    if only:
        cases = [
            c for c in cases if any(s.lower() in c[0].lower() for s in only)
        ]

    print("# Operator scaling (local[%s], best-of-2, noop sink, pinned inputs)\n"
          % spark.sparkContext.defaultParallelism)
    print("Time ratio per 10x rows: ~10 = linear scaling; small sizes sit")
    print("on the fixed job-overhead floor, so their ratios read sublinear.")
    print("Inputs are materialized (persist + count) BEFORE timing, so the")
    print("number is the operator, not the synthetic-input generator (the")
    print("round-4 table fused the two; the generator dominated at 1e7).")
    print("Generated by tools/scaling_report.py.\n")
    print("| operator | rows | sec | M rows/s | 10x step ratio |")
    print("|---|---|---|---|---|")
    for label, sizes, builder in cases:
        prev = None
        for n in sizes:
            thunk = builder(n)
            t = timed(thunk)
            if hasattr(thunk, "cleanup"):
                thunk.cleanup()
            unpin_all()
            ratio = "" if prev is None else f"{t / prev:.1f}x"
            print(
                f"| {label} | {n:.0e} | {t:.2f} | {n / t / 1e6:.2f} "
                f"| {ratio} |",
            )
            prev = t
        label = ""  # only print the operator once


if __name__ == "__main__":
    main()
