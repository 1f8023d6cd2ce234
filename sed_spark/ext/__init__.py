"""Large-scale training-data pipeline operators.

Beyond the reference's physics vocabulary, this package provides the
operators a 100 TB training-data pipeline needs: deduplication (exact,
MinHash-LSH, SimHash, n-gram Jaccard), similarity search over embeddings,
text analysis (language id, quality scoring, token counting,
fingerprinting), and multimodal binary-column plumbing.

All hot paths are JVM-side Column expressions (higher-order array
functions); only the multimodal decode stub uses ``mapInPandas``.
"""
