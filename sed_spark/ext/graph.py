"""Distributed graph operators for duplicate-cluster resolution.

Near-duplicate detection (``dedup.lsh_candidate_pairs`` /
``dedup.jaccard_pairs``) emits PAIRS; an actual dedup pipeline needs
CLUSTERS — the transitive closure of the pair relation — so each group of
mutual near-duplicates keeps exactly one canonical document. That closure
is connected components over the pair graph.

Scale design
------------
``connected_components`` runs hash-min label propagation: every node
starts labelled with its own id, and each round takes the min of its label
and its neighbors' labels. One round = one shuffle join (labels ⋈ edges on
the neighbor key) + one hash aggregate (min per node); the edge table is
``localCheckpoint``-ed once and reused, and each round's label table is
checkpointed to keep lineage flat. Convergence = the sum of labels stops
decreasing (a single scalar aggregate per round — strictly monotone until
fixpoint, so no join-based diff is needed).

Rounds needed = graph diameter. Near-duplicate clusters are dense (every
member shares LSH buckets with most others), so diameters are 1-3 and the
loop ends in ≤4 rounds regardless of corpus size. For adversarial
long-chain graphs the O(log n)-round alternating large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014) would replace the per-round propagation; hash-min is the right
default for dedup workloads and is fully expressible as DataFrame ops.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_clusters"]


def connected_components(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    max_iter: int = 50,
    reliable: bool = False,
) -> DataFrame:
    """(node, label) with label = min node id of the connected component.

    Only nodes that appear in ``edges`` are returned; isolated nodes are
    their own component and can be filled in by the caller with a left
    join + coalesce (see :func:`dedup_clusters`).

    ``reliable=False`` (default) uses ``localCheckpoint`` — executor-local
    blocks, fastest, fine on a single machine but an executor loss
    mid-loop on a real cluster loses the blocks and kills the job.
    ``reliable=True`` uses ``checkpoint()`` to the session's checkpoint
    directory (``sparkContext.setCheckpointDir`` — set it to reliable
    storage such as HDFS/S3 before calling) so the loop survives executor
    loss; a temp-dir default is installed if none is configured.

    Raises ``RuntimeError`` if ``max_iter`` rounds pass without the label
    sum reaching a fixpoint — truncated labels would silently merge or
    split clusters, so the caller must be told.
    """
    if reliable:
        sc = edges.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            import tempfile

            sc.setCheckpointDir(
                tempfile.mkdtemp(prefix="sed_spark_ckpt_"),
            )
            warnings.warn(
                "reliable=True with no checkpoint dir configured; using a "
                "local temp dir. Call spark.sparkContext.setCheckpointDir() "
                "with HDFS/S3 storage for real fault tolerance.",
                stacklevel=2,
            )

        def _ckpt(df: DataFrame) -> DataFrame:
            return df.checkpoint(eager=True)
    else:
        def _ckpt(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"),
    ).union(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v")),
    )
    sym = _ckpt(sym)

    labels = _ckpt(
        sym.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label")),
    )
    prev = labels.agg(F.sum("label")).collect()[0][0]

    converged = False
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = _ckpt(
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", "label"),
                ).alias("label"),
            ),
        )
        cur = labels.agg(F.sum("label")).collect()[0][0]
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within max_iter="
            f"{max_iter} rounds; labels would be wrong for long-chain "
            "graphs. Raise max_iter (rounds needed = graph diameter).",
        )
    return labels


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "a_id",
    dst: str = "b_id",
) -> DataFrame:
    """Assign every document a duplicate-cluster id and a canonical flag.

    ``cluster_id`` = min doc id of the document's near-duplicate component
    (its own id when it has no near-duplicates); ``is_canonical`` = 1 for
    the single kept representative per cluster. Downstream dedup is then
    ``filter(is_canonical = 1)`` — a two-long-column label table joined
    onto the corpus by id (AQE broadcasts it when it fits; otherwise a
    plain hash join on the id key), never a self-join on the corpus itself.
    """
    cc = connected_components(pairs, src=src, dst=dst).withColumnRenamed(
        "node", id_col,
    )
    return (
        docs.select(id_col)
        .join(cc, id_col, "left")
        .select(
            id_col,
            F.coalesce("label", F.col(id_col)).alias("cluster_id"),
        )
        .withColumn(
            "is_canonical",
            (F.col(id_col) == F.col("cluster_id")).cast("int"),
        )
    )
