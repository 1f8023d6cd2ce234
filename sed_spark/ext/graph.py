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
long-chain graphs, :func:`connected_components_two_phase` implements the
O(log n)-round alternating large-star/small-star algorithm (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC 2014); hash-min
stays the default for dedup workloads. Both are pure DataFrame ops and
support ``reliable=True`` checkpointing to survive executor loss.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "connected_components_two_phase",
    "dedup_clusters",
    "label_propagation",
    "pagerank",
    "triangle_count",
]


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
    _ckpt = _checkpointer(edges, reliable)

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


#: one temp checkpoint dir per Spark application (not per CC call) —
#: round-3 leaked a fresh ``mkdtemp`` of checkpoint blocks on every
#: ``reliable=True`` call; now the dir is reused for the session's
#: lifetime and removed at interpreter exit. Checkpoint files within it
#: are retained until then because the RETURNED label DataFrame reads
#: them lazily — deleting per-call data would break the caller's plan.
_TEMP_CKPT_DIRS: dict[str, str] = {}


def _session_checkpoint_dir(sc) -> str:
    key = sc.applicationId
    if key not in _TEMP_CKPT_DIRS:
        d = tempfile.mkdtemp(prefix="sed_spark_ckpt_")
        _TEMP_CKPT_DIRS[key] = d
        atexit.register(shutil.rmtree, d, ignore_errors=True)
    return _TEMP_CKPT_DIRS[key]


def _checkpointer(df: DataFrame, reliable: bool):
    """Per-round lineage-flattening checkpoint fn (shared by both CC
    algorithms); see :func:`connected_components` for the reliable mode.

    Checkpoints are LAZY (``eager=False``): each round's convergence
    action (the label-sum aggregate / edge count) both materializes the
    checkpoint blocks and reads the convergence scalar in ONE job —
    round 3's eager checkpoint ran two jobs per round (materialize, then
    re-read for the aggregate), roughly doubling per-round latency.
    """
    if reliable:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            # never silently overrides a caller-configured checkpoint dir
            sc.setCheckpointDir(_session_checkpoint_dir(sc))
            warnings.warn(
                "reliable=True with no checkpoint dir configured; using a "
                "local temp dir (removed at exit). Call "
                "spark.sparkContext.setCheckpointDir() with HDFS/S3 "
                "storage for real fault tolerance.",
                stacklevel=3,
            )
        return lambda d: d.checkpoint(eager=False)
    return lambda d: d.localCheckpoint(eager=False)


def connected_components_two_phase(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    max_iter: int = 40,
    reliable: bool = False,
) -> DataFrame:
    """(node, label) via alternating large-star/small-star — O(log n)
    rounds on ANY graph shape (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC 2014).

    :func:`connected_components` (hash-min) needs rounds = graph
    diameter — ideal for dedup graphs (dense clusters, diameter 1-3) but
    adversarial for long chains (a 10^6-node path needs 10^6 rounds).
    Each round here is two star operations, each ONE hash aggregate
    (min per node) + ONE shuffle join on the node key over the EDGE
    table only — never the corpus — and the edge set provably shrinks
    toward a star per component, so round count is logarithmic in the
    largest component regardless of its shape.

    Edges are kept in (big, small) canonical orientation throughout;
    convergence = the edge set is exactly the fixpoint star (checked by
    exact set equality, one ``exceptAll`` on the edge table per round).
    Same output contract as :func:`connected_components`.
    """
    _ckpt = _checkpointer(edges, reliable)

    canon = edges.select(
        F.greatest(F.col(src), F.col(dst)).alias("u"),
        F.least(F.col(src), F.col(dst)).alias("v"),
    )
    # self-loop nodes still count as appearing in the edge set (same
    # contract as hash-min), they just carry no connectivity
    all_nodes = _ckpt(
        canon.select(F.col("u").alias("node"))
        .union(canon.select(F.col("v").alias("node")))
        .distinct(),
    )
    e = _ckpt(canon.filter(F.col("u") != F.col("v")).distinct())

    def large_star(cur: DataFrame) -> DataFrame:
        sym = cur.select("u", "v").union(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v")),
        )
        # m(u) = min(neighbors(u) ∪ {u})
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m"),
        )
        # connect strictly-larger neighbors to m; v > u >= m so the
        # output stays (big, small)-canonical with no self-loops
        return (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def small_star(cur: DataFrame) -> DataFrame:
        # edges already point big → small: Γ⁻(u) = smaller neighbors
        mins = cur.groupBy("u").agg(F.min("v").alias("m"))
        withm = cur.join(mins, "u")
        # connect u and every smaller neighbor ≠ m to m
        out = withm.select(F.col("u"), F.col("m").alias("v")).union(
            withm.filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v")),
        )
        return out.filter(F.col("u") != F.col("v")).distinct()

    converged = False
    prev_count = e.count()
    for _ in range(max_iter):
        e_new = _ckpt(small_star(large_star(e)))
        new_count = e_new.count()
        if new_count == prev_count and e_new.exceptAll(e).limit(1).count() == 0:
            converged = True
            e = e_new
            break
        e, prev_count = e_new, new_count
    if not converged:
        raise RuntimeError(
            f"two-phase connected components did not reach its fixpoint "
            f"within max_iter={max_iter} rounds (expected O(log n))",
        )
    # fixpoint edge set is the star (node → component min); minima have
    # no outgoing edge and label themselves
    star = e.groupBy(F.col("u").alias("node")).agg(F.min("v").alias("label"))
    return all_nodes.join(star, "node", "left").select(
        "node", F.coalesce("label", F.col("node")).alias("label"),
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "a_id",
    dst: str = "b_id",
    algorithm: str = "hash-min",
    reliable: bool = False,
) -> DataFrame:
    """Assign every document a duplicate-cluster id and a canonical flag.

    ``cluster_id`` = min doc id of the document's near-duplicate component
    (its own id when it has no near-duplicates); ``is_canonical`` = 1 for
    the single kept representative per cluster. Downstream dedup is then
    ``filter(is_canonical = 1)`` — a two-long-column label table joined
    onto the corpus by id (AQE broadcasts it when it fits; otherwise a
    plain hash join on the id key), never a self-join on the corpus itself.
    """
    if algorithm == "hash-min":
        cc_fn = connected_components
    elif algorithm == "two-phase":
        cc_fn = connected_components_two_phase
    else:
        raise ValueError(f"unknown algorithm {algorithm!r}")
    cc = cc_fn(pairs, src=src, dst=dst, reliable=reliable).withColumnRenamed(
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


#: micro-rank scale for integer PageRank: ranks are stored as
#: ``round(rank * 10^12)`` BIGINTs so every cross-row sum is an exact
#: integer aggregate — order-independent, hence bit-identical on any
#: engine / partitioning / core count. A double-based power iteration
#: accumulates last-ulp drift that COMPOUNDS across iterations and
#: varies with Spark's partial-aggregation order.
PAGERANK_SCALE = 10**12


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "a_id",
    dst: str = "b_id",
    weight: str | None = None,
    damping_num: int = 85,
    damping_den: int = 100,
    n_iter: int = 3,
    node_col: str = "node",
    reliable: bool = False,
) -> DataFrame:
    """Fixed-iteration weighted PageRank in exact integer arithmetic.

    Returns ``(node, rank_micro)`` after exactly ``n_iter`` synchronous
    power iterations, where ``rank_micro`` is the rank on the
    :data:`PAGERANK_SCALE` integer grid. On a near-duplicate pair graph
    this is the centrality signal real dedup pipelines use to pick the
    canonical representative (the best-connected member, not just the
    min id); on a domain link graph it is the classic quality prior.

    Semantics (integer throughout, ``div`` = truncating division):

    - ``N`` = number of nodes; ``r0 = S div N`` with ``S = 10^12``
    - ``out_w(u)`` = sum of ``weight`` over u's out-edges (edge count
      when ``weight`` is None); ``out_w = 0`` marks a dangling node
    - ``contrib(v) = sum over edges (u -> v) of (r(u) * w) div out_w(u)``
    - ``dang = sum of r(u) over dangling u`` (redistributed uniformly)
    - ``r'(v) = (S - d*S div den) div N
      + (d * (contrib(v) + dang div N)) div den``
      with ``d/den`` the damping fraction (default 85/100)

    Scale design: the edge table is joined with out-weights ONCE before
    the loop and checkpointed; each iteration is one shuffle join
    (ranks ⋈ edges on ``src``) + one hash aggregate (sum per ``dst``)
    plus a scalar dangling-mass aggregate that rides back in via
    ``crossJoin(broadcast(...))`` — no driver collect inside the loop.
    Rank tables are lazily checkpointed per round to keep lineage flat
    (same machinery as :func:`connected_components`); ``reliable=True``
    swaps in fault-tolerant checkpoints for long production runs.
    Overflow headroom: ``r * w * d`` stays below 2^63 for total weights
    up to ~10^5 per node at the 10^12 scale — raise ``damping_den``
    granularity only with a lower ``PAGERANK_SCALE`` if that is ever
    exceeded.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    if not 0 < damping_num < damping_den:
        raise ValueError("damping must be a proper fraction")
    ckpt = _checkpointer(edges, reliable)
    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    e = edges.select(
        F.col(src).alias("_src"), F.col(dst).alias("_dst"), w.alias("_w"),
    )
    out_w = e.groupBy("_src").agg(F.sum("_w").alias("_out_w"))
    if nodes is None:
        node_set = (
            e.select(F.col("_src").alias(node_col))
            .union(e.select(F.col("_dst").alias(node_col)))
            .distinct()
        )
    else:
        node_set = nodes.select(F.col(nodes.columns[0]).alias(node_col)).distinct()
    base = ckpt(
        node_set.join(
            out_w, node_set[node_col] == out_w["_src"], "left",
        ).select(
            node_col, F.coalesce("_out_w", F.lit(0)).alias("_out_w"),
        ),
    )
    # one scalar job up front: N is a literal inside every iteration's
    # integer expressions (same role as the CC convergence scalar)
    n_nodes = base.count()
    if n_nodes == 0:
        return base.select(node_col, F.lit(0).alias("rank_micro"))
    s = PAGERANK_SCALE
    teleport = (s - damping_num * s // damping_den) // n_nodes
    # edges annotated with the source's out-weight, reused every round
    e_out = ckpt(e.join(out_w, "_src"))
    ranks = base.select(
        node_col, F.lit(s // n_nodes).cast("long").alias("rank_micro"),
    )
    for _ in range(n_iter):
        dang = (
            ranks.join(base.filter(F.col("_out_w") == 0), node_col)
            .agg(F.coalesce(F.sum("rank_micro"), F.lit(0)).alias("_dang"))
        )
        contrib = (
            ranks.join(e_out, ranks[node_col] == e_out["_src"])
            .select(
                F.col("_dst").alias(node_col),
                F.expr("rank_micro * _w div _out_w").alias("_c"),
            )
            .groupBy(node_col)
            .agg(F.sum("_c").alias("_contrib"))
        )
        ranks = ckpt(
            base.join(contrib, node_col, "left")
            .crossJoin(F.broadcast(dang))
            .select(
                node_col,
                (
                    F.lit(teleport)
                    + F.expr(
                        f"{damping_num} * (coalesce(_contrib, 0L)"
                        f" + _dang div {n_nodes}) div {damping_den}",
                    )
                ).cast("long").alias("rank_micro"),
            ),
        )
    return ranks


def triangle_count(
    edges: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    nodes: DataFrame | None = None,
    node_col: str | None = None,
    orient: bool = True,
) -> DataFrame:
    """Per-node triangle counts over an undirected graph — the local
    clustering signal (a dedup pair-graph node inside many triangles
    sits in a tight near-duplicate clique; a high-triangle domain in a
    link graph is a link farm candidate).

    Exact distributed count via DEGREE-ORDERED ORIENTATION (the
    node-iterator++ / forward algorithm — Schank & Wagner 2005, the same
    shape Cohen's MapReduce counter and GraphX use), NO adjacency matrix
    and no per-node neighbor list materialization:

    1. canonicalize to ``u < v`` edges and drop duplicates/self-loops —
       each undirected edge exactly once;
    2. orient every edge from its (degree, id)-SMALLER endpoint to the
       larger (a total order, so each edge gets exactly one direction);
    3. wedge join: oriented edges self-join on their SOURCE — a wedge
       ``x ← pivot → y`` (with ``x ≺ y``) pivots at the triangle's
       ≺-minimum node;
    4. close: the wedge semi-joins the oriented edge set on ``(x, y)``
       (``x ≺ y`` guarantees that is the closing edge's orientation) —
       each triangle found exactly once;
    5. explode the triple and count per node.

    Why orientation and not the naive middle-node wedge join: a hub of
    degree d generates d·(d-1)/2 naive wedges — one celebrity node
    makes the wedge stage a straggler at scale. Under ≺-orientation a
    node only pivots wedges over its OUT-neighbors (all ≺-larger), and
    max out-degree is O(√m) for ANY degree distribution, so per-node
    wedge fan-out is bounded and total wedge volume is O(m^1.5) worst
    case — exact counts, no caps, no sampling. Cost: one degree
    aggregate + two degree-attach joins more than the naive plan —
    measured ~3x wall on a BOUNDED-degree (~20) graph at 1e7 edges
    (SCALING.md), and identical wall on a 10%-of-edges-on-one-hub graph
    where the naive plan's 5e11 hub wedges would never finish. That
    trade picks the default: ``orient=True`` is the only plan that
    survives an unknown degree distribution at 100 TB; pass
    ``orient=False`` for a graph KNOWN to be bounded-degree (a banded
    dedup pair graph with per-bucket caps) to take the cheaper
    middle-node wedge join — both paths are exact and result-identical.

    Returns ``(node, n_triangles)`` for every node of ``nodes`` (or
    every edge endpoint when ``nodes`` is None), 0 for triangle-free
    nodes.
    """
    u, v = F.col(a_col), F.col(b_col)
    canon = (
        edges.filter(u != v)
        .select(
            F.least(u, v).alias("u"), F.greatest(u, v).alias("v"),
        )
        .distinct()
    )
    if orient:
        deg = (
            canon.select(F.col("u").alias("node"))
            .unionAll(canon.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        with_deg = (
            canon.join(deg.select(F.col("node").alias("u"),
                                  F.col("deg").alias("du")), "u")
            .join(deg.select(F.col("node").alias("v"),
                             F.col("deg").alias("dv")), "v")
        )
        # orient small ≺ large under the total (degree, id) order; carry
        # the destination's rank so the wedge filter below can order
        # x ≺ y without re-joining degrees
        u_first = (F.col("du") < F.col("dv")) | (
            (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
        )
        oriented = with_deg.select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ddeg"),
        )
        o2 = oriented.select(
            F.col("src"), F.col("dst").alias("dst2"),
            F.col("ddeg").alias("ddeg2"),
        )
        x_first = (F.col("ddeg") < F.col("ddeg2")) | (
            (F.col("ddeg") == F.col("ddeg2")) & (F.col("dst") < F.col("dst2"))
        )
        wedges = oriented.join(o2, "src").filter(x_first)
        closing = oriented.select(
            F.col("src").alias("dst"), F.col("dst").alias("dst2"),
        )
        tris = wedges.join(closing, ["dst", "dst2"], "left_semi").select(
            F.explode(F.array("src", "dst", "dst2")).alias("node"),
        )
    else:
        # middle-node wedge join: edges (u,v) ⋈ (v,w) on v — both inputs
        # <-ordered, so every wedge comes out u < v < w exactly once;
        # close on the (u,w) edge. Cheaper by the degree machinery, but a
        # degree-d hub emits d(d-1)/2 wedges — bounded-degree inputs only
        e_mid = canon.select(F.col("u").alias("v"), F.col("v").alias("w"))
        naive_wedges = canon.join(e_mid, "v").select("u", "v", "w")
        naive_closing = canon.select(
            F.col("u").alias("cu"), F.col("v").alias("cw"),
        )
        tris = naive_wedges.join(
            naive_closing,
            (F.col("u") == F.col("cu")) & (F.col("w") == F.col("cw")),
            "left_semi",
        ).select(F.explode(F.array("u", "v", "w")).alias("node"))
    per_node = tris.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles"),
    )
    if nodes is not None:
        node_col = node_col or nodes.columns[0]
        base = nodes.select(F.col(node_col).alias("node")).distinct()
    else:
        base = (
            canon.select(F.col("u").alias("node"))
            .unionAll(canon.select(F.col("v").alias("node")))
            .distinct()
        )
    return base.join(per_node, "node", "left").select(
        "node",
        F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
    )


def label_propagation(
    edges: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    n_iter: int = 5,
    nodes: DataFrame | None = None,
    node_col: str | None = None,
    reliable: bool = False,
) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan et al.
    2007) — community detection over an undirected graph: near-duplicate
    cliques in a dedup pair graph, topical clusters in a link graph.
    Where connected components answer "reachable at all", LPA's
    majority vote separates DENSELY linked groups that a stray bridge
    edge would otherwise fuse into one component.

    Exactly ``n_iter`` synchronous rounds from ``label(v) = v``; each
    round every node adopts the most frequent label among its NEIGHBORS
    (ties -> smallest label; isolated nodes keep their label). The
    classic algorithm breaks ties randomly and updates asynchronously —
    both partitioning-dependent; this variant's total tie order and
    synchronous rounds make the result a pure function of the graph
    (the determinism contract every suite operator obeys), at the known
    cost that a perfectly symmetric bipartite neighborhood can
    oscillate rather than converge — pick ``n_iter`` odd/even
    deliberately when that matters.

    Scale shape (mirrors :func:`pagerank`): the symmetrized edge table
    is checkpointed once; each round is ONE shuffle join (labels ⋈
    edges on the neighbor end) + ONE ``(node, label)`` hash aggregate +
    a ``min_by`` argmax aggregate — no window over the vote table, no
    driver collect in the loop; label tables are lazily checkpointed to
    keep lineage flat. Returns ``(node, community)``.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    ckpt = _checkpointer(edges, reliable)
    u, v = F.col(a_col), F.col(b_col)
    adj = ckpt(
        edges.filter(u != v)
        .select(u.alias("src"), v.alias("dst"))
        .unionAll(edges.filter(u != v).select(v.alias("src"), u.alias("dst")))
        .distinct(),
    )
    if nodes is not None:
        node_col = node_col or nodes.columns[0]
        base = nodes.select(F.col(node_col).alias("node")).distinct()
    else:
        base = adj.select(F.col("src").alias("node")).distinct()
    labels = base.select("node", F.col("node").alias("community"))
    for _ in range(n_iter):
        votes = (
            adj.join(
                labels.select(
                    F.col("node").alias("dst"),
                    F.col("community").alias("nbr_label"),
                ),
                "dst",
            )
            .groupBy("src", "nbr_label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        winners = votes.groupBy("src").agg(
            F.min_by(
                "nbr_label",
                F.struct(
                    (-F.col("cnt")).alias("neg_cnt"),
                    F.col("nbr_label").alias("lbl"),
                ),
            ).alias("win_label"),
        )
        labels = ckpt(
            labels.join(
                winners.select(F.col("src").alias("node"), "win_label"),
                "node",
                "left",
            ).select(
                "node",
                F.coalesce("win_label", "community").alias("community"),
            ),
        )
    return labels
