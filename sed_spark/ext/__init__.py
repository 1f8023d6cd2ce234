"""Large-scale training-data pipeline operators.

Beyond the reference's physics vocabulary, this package provides the
operators a 100 TB training-data pipeline needs: deduplication (exact,
incremental, MinHash-LSH batch + incremental, SimHash, n-gram Jaccard,
prefix-filtered EXACT similarity join, exact-substring spans, C4 line
dedup, boilerplate), similarity search over embeddings (brute-force,
batch Arrow, IVF with distributed k-means, PQ/IVF-PQ/SQ8 and rerank,
hyperplane LSH, SemDeDup, JL projection), text analysis (HTML
extraction, language id, heuristic/classifier/LM/DSIR quality scoring,
token counting, fingerprinting, chunking, packing, collocation mining,
quality gates), corpus management (URL/domain rollups, blocklists,
hash splits, rate/cap/mixture/Gumbel/quantile/weighted sampling,
grouped percentile/robust/decayed stats, heavy hitters, corpus diff),
tokenizer training (vocabulary stats, distributed BPE + unigram-LM +
WordPiece), mergeable sketches (CMS, HLL, KMV, Bloom incl. bitmap
semi-join reduction), graph ops (connected components, PageRank,
triangles, LPA), and multimodal binary-column plumbing.

All hot paths are JVM-side Column expressions (higher-order array
functions); the only Python workers are vectorized Arrow stages with
documented justification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["scale_out"]


def scale_out(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin repartition ONLY when the scan under-parallelizes.

    CPU-heavy per-row operators (shingle md5, hyperplane dot products) are
    compute-bound, not scan-bound: a single unsplittable parquet row group
    would otherwise serialize them onto one core. At cluster scale the input
    split count exceeds ``defaultParallelism`` and this is a no-op — the
    shuffle is only paid when the data is too small for it to matter.

    The ``df.rdd`` partition probe runs one analyzer pass on the driver;
    callers apply this to BASE-TABLE SCANS (shallow plans) before building
    on top, where that pass is microseconds — don't wrap a deep derived
    plan with it (the probe would re-analyze the whole tree).
    """
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
