"""ANN recall@k vs the exact brute-force branch.

The IVF / PQ / IVF-PQ / SQ8 family pins determinism in the suite but a
user dialing ``nprobe`` / ``m`` needs the one number the suite doesn't
record: how much recall each compression/pruning level trades for its
speedup. This tool measures recall@k on real testdata embeddings —
exact cosine top-k per query as ground truth, then each approximate
branch with the SAME codebooks/centroids the suite uses (pinned sf0.01
artifacts, the deployment shape: train once, serve everywhere).

    PYTHONPATH=/root/repo python tools/ann_recall.py [sf_dir] [n_queries]

Appends-ready markdown table on stdout (see SCALING.md "ANN recall@10").
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from sed_spark.ext import similarity
    from sed_spark.session import get_spark
    from sed_spark.suite._ivfpq_codebooks import IVFPQ_CODEBOOKS_SF0_01
    from sed_spark.suite._pq_codebooks import PQ_CODEBOOKS_SF0_01

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    k = 10

    spark = get_spark(
        app_name="ann-recall", extra_conf={"spark.log.level": "ERROR"},
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    n_corpus = emb.count()

    centroids = similarity.deterministic_planes(8, 64, seed=21)
    los, his = similarity.sq8_fit(emb)
    # deployment-quality variants: data-trained coarse centroids + the
    # residual codebooks trained against THEM — random-plane "centroids"
    # are a fine bucketing function but terrible reconstruction anchors
    # (measured coarse-only relative error 7.3 on this corpus: the
    # residuals are bigger than the vectors, so residual-PQ recall
    # collapses). Real IVF-PQ is k-means coarse + residual PQ.
    trained = similarity.kmeans_fit(emb, k=8, max_iter=5)
    books_trained = similarity.ivfpq_train(emb, trained, m=4, k=8, max_iter=3)
    # higher-resolution codes (round 7): recall as a function of code
    # bits — m subspaces x log2(k) bits. On >=1e7-row corpora train on a
    # sampled slice; here the corpus is codebook-training-sized already.
    books_m8k32 = similarity.pq_train(emb, m=8, k=32, max_iter=3)
    books_m16k32 = similarity.pq_train(emb, m=16, k=32, max_iter=3)
    ivfpq_m8k32 = similarity.ivfpq_train(emb, trained, m=8, k=32, max_iter=3)

    # query vectors: every (n_corpus // n_queries)-th embedding — spread
    # across the id range so bucket-locality doesn't flatter IVF
    stride = max(1, n_corpus // n_queries)
    qrows = (
        emb.filter(f"vec_id % {stride} = 0")
        .orderBy("vec_id")
        .limit(n_queries)
        .collect()
    )
    queries = [(r["vec_id"], [float(v) for v in r["embedding"]]) for r in qrows]

    def ids(df) -> set:
        return {r["vec_id"] for r in df.collect()}

    rp16 = similarity.random_project(emb, 64, 16).persist()
    rp32 = similarity.random_project(emb, 64, 32, salt="rp32").persist()

    branches = {
        "ivf nprobe=1": lambda q: similarity.ivf_topk(
            emb, centroids, q, k=k, nprobe=1,
        ),
        "ivf nprobe=2": lambda q: similarity.ivf_topk(
            emb, centroids, q, k=k, nprobe=2,
        ),
        "ivf nprobe=4": lambda q: similarity.ivf_topk(
            emb, centroids, q, k=k, nprobe=4,
        ),
        "pq m=4 k=8": lambda q: similarity.pq_topk(
            emb, PQ_CODEBOOKS_SF0_01, q, k=k,
        ),
        "ivfpq nprobe=1": lambda q: similarity.ivfpq_topk(
            emb, centroids, IVFPQ_CODEBOOKS_SF0_01, q, k=k, nprobe=1,
        ),
        "ivfpq nprobe=2": lambda q: similarity.ivfpq_topk(
            emb, centroids, IVFPQ_CODEBOOKS_SF0_01, q, k=k, nprobe=2,
        ),
        "sq8": lambda q: similarity.sq8_topk(emb, los, his, q, k=k),
        "ivf trained nprobe=1": lambda q: similarity.ivf_topk(
            emb, trained, q, k=k, nprobe=1,
        ),
        "ivf trained nprobe=2": lambda q: similarity.ivf_topk(
            emb, trained, q, k=k, nprobe=2,
        ),
        "ivfpq trained nprobe=1": lambda q: similarity.ivfpq_topk(
            emb, trained, books_trained, q, k=k, nprobe=1,
        ),
        "ivfpq trained nprobe=2": lambda q: similarity.ivfpq_topk(
            emb, trained, books_trained, q, k=k, nprobe=2,
        ),
        "ivfpq trained nprobe=8": lambda q: similarity.ivfpq_topk(
            emb, trained, books_trained, q, k=k, nprobe=8,
        ),
        # round 7: resolution dial + the two-stage rerank recipe
        "pq m=8 k=32 trained": lambda q: similarity.pq_topk(
            emb, books_m8k32, q, k=k,
        ),
        "pq m=16 k=32 trained": lambda q: similarity.pq_topk(
            emb, books_m16k32, q, k=k,
        ),
        "ivfpq trained m=8 k=32 nprobe=2": lambda q: similarity.ivfpq_topk(
            emb, trained, ivfpq_m8k32, q, k=k, nprobe=2,
        ),
        "pq m=4 k=8 + rerank r=5": lambda q: similarity.pq_topk_rerank(
            emb, PQ_CODEBOOKS_SF0_01, q, k=k, refine=5,
        ),
        "pq m=4 k=8 + rerank r=20": lambda q: similarity.pq_topk_rerank(
            emb, PQ_CODEBOOKS_SF0_01, q, k=k, refine=20,
        ),
        "pq m=8 k=32 + rerank r=5": lambda q: similarity.pq_topk_rerank(
            emb, books_m8k32, q, k=k, refine=5,
        ),
        "pq m=16 k=32 + rerank r=5": lambda q: similarity.pq_topk_rerank(
            emb, books_m16k32, q, k=k, refine=5,
        ),
        "pq m=16 k=32 + rerank r=20": lambda q: similarity.pq_topk_rerank(
            emb, books_m16k32, q, k=k, refine=20,
        ),
        # round 7: JL sign projection — shortlist in 16/32-dim space,
        # optional exact rerank of the shortlist with full vectors
        "rp 64->16": lambda q: similarity.cosine_topk(
            rp16, similarity.project_vector(q, 64, 16), k=k, vec_col="rp",
        ),
        "rp 64->32": lambda q: similarity.cosine_topk(
            rp32, similarity.project_vector(q, 64, 32, salt="rp32"),
            k=k, vec_col="rp",
        ),
        "rp 64->16 + rerank shortlist=30": lambda q: similarity.exact_rerank(
            emb,
            similarity.cosine_topk(
                rp16, similarity.project_vector(q, 64, 16),
                k=30, vec_col="rp",
            ).select("vec_id"),
            q, k=k,
        ),
    }

    hits = {name: 0 for name in branches}
    total = 0
    for qid, qvec in queries:
        exact = ids(similarity.cosine_topk(emb, qvec, k=k))
        total += len(exact)
        for name, fn in branches.items():
            hits[name] += len(ids(fn(qvec)) & exact)

    print(
        f"Recall@{k} vs exact cosine on {sf_dir} "
        f"({n_corpus} vectors, {len(queries)} queries, "
        "pinned sf0.01 codebooks, deterministic_planes(8) coarse "
        "centroids, sq8 ranges fit on this corpus):\n",
    )
    print("| branch | recall@10 |")
    print("|---|---|")
    for name in branches:
        print(f"| {name} | {hits[name] / total:.3f} |")
    spark.stop()


if __name__ == "__main__":
    main()
