"""Connected components / dedup cluster resolution."""

from __future__ import annotations

from pyspark.sql import functions as F

from sed_spark.ext.graph import (
    connected_components,
    connected_components_two_phase,
    dedup_clusters,
)


def test_connected_components_chain_and_triangle(spark):
    # components: {1,2,3,4} (a chain — worst-case diameter), {10,11,12}
    # (a triangle), {20,21} (one edge)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["a_id", "b_id"],
    )
    got = {
        r["node"]: r["label"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_converges_on_single_long_chain(spark):
    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["a_id", "b_id"],
    )
    labels = connected_components(edges).collect()
    assert {r["label"] for r in labels} == {0}
    assert len(labels) == n + 1


def test_two_phase_matches_hash_min_on_random_graphs(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    for trial in range(3):
        n_nodes, n_edges = 40, 30
        pairs = rng.integers(0, n_nodes, size=(n_edges, 2)).tolist()
        pairs = [(int(a), int(b)) for a, b in pairs if a != b]
        edges = spark.createDataFrame(pairs, ["a_id", "b_id"])
        want = {
            r["node"]: r["label"]
            for r in connected_components(edges).collect()
        }
        got = {
            r["node"]: r["label"]
            for r in connected_components_two_phase(edges).collect()
        }
        assert got == want, f"trial {trial}"


def test_two_phase_long_chain_logarithmic_rounds(spark):
    # a 64-node path: hash-min would need ~64 rounds; two-phase must
    # finish within O(log n) — max_iter=10 forces the logarithmic bound
    n = 63
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["a_id", "b_id"],
    )
    labels = connected_components_two_phase(edges, max_iter=10).collect()
    assert {r["label"] for r in labels} == {0}
    assert len(labels) == n + 1


def test_two_phase_duplicate_and_reversed_edges(spark):
    edges = spark.createDataFrame(
        [(2, 1), (1, 2), (2, 1), (5, 4), (9, 9)], ["a_id", "b_id"],
    )
    got = {
        r["node"]: r["label"]
        for r in connected_components_two_phase(edges).collect()
    }
    # self-loop (9,9) adds the node but no connectivity
    assert got == {1: 1, 2: 1, 4: 4, 5: 4, 9: 9}


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    # reliable=True checkpoints to the configured dir — same labels, and
    # checkpoint files actually land on (reliable-storage-shaped) disk
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["a_id", "b_id"],
    )
    got = {
        r["node"]: r["label"]
        for r in connected_components(edges, reliable=True).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert any((tmp_path / "ckpt").rglob("*"))


def test_connected_components_raises_on_truncation(spark):
    # a 12-chain needs >2 hash-min rounds; max_iter=2 must raise, not
    # silently return half-propagated labels
    import pytest

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["a_id", "b_id"],
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2)


def test_dedup_clusters_isolated_docs_are_canonical(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    pairs = spark.createDataFrame([(1, 3), (3, 5)], ["a_id", "b_id"])
    out = dedup_clusters(docs, pairs).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["cluster_id"], r["is_canonical"]) for r in out] == [
        (0, 0, 1), (1, 1, 1), (2, 2, 1), (3, 1, 0), (4, 4, 1), (5, 1, 0),
    ]
    # dedup = keep canonical only
    kept = dedup_clusters(docs, pairs).filter(F.col("is_canonical") == 1)
    assert kept.count() == 4


def test_dedup_clusters_algorithm_switch(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    pairs = spark.createDataFrame([(1, 3), (3, 5)], ["a_id", "b_id"])
    a = sorted(map(tuple, dedup_clusters(docs, pairs).collect()))
    b = sorted(
        map(tuple, dedup_clusters(docs, pairs, algorithm="two-phase").collect()),
    )
    assert a == b


def test_session_checkpoint_dir_reused(spark):
    # reliable=True must reuse ONE session-scoped temp dir (round 3 leaked
    # a fresh mkdtemp of checkpoint blocks per call) and register cleanup
    import os

    from sed_spark.ext.graph import _TEMP_CKPT_DIRS, _session_checkpoint_dir

    sc = spark.sparkContext
    d1 = _session_checkpoint_dir(sc)
    d2 = _session_checkpoint_dir(sc)
    assert d1 == d2
    assert os.path.isdir(d1)
    assert list(_TEMP_CKPT_DIRS.values()).count(d1) == 1


# ---------------------------------------------------------------------------
# exact-integer PageRank
# ---------------------------------------------------------------------------

from sed_spark.ext.graph import PAGERANK_SCALE, pagerank  # noqa: E402


def ref_pagerank(nodes, edges, n_iter=3, dn=85, dd=100):
    """Pure-Python transcription of the documented integer semantics."""
    s, n = PAGERANK_SCALE, len(nodes)
    out_w: dict = {}
    for u, _, w in edges:
        out_w[u] = out_w.get(u, 0) + w
    r = {v: s // n for v in nodes}
    tele = (s - dn * s // dd) // n
    for _ in range(n_iter):
        dang = sum(r[u] for u in nodes if out_w.get(u, 0) == 0)
        contrib = {v: 0 for v in nodes}
        for u, v, w in edges:
            contrib[v] += (r[u] * w) // out_w[u]
        r = {v: tele + dn * (contrib[v] + dang // n) // dd for v in nodes}
    return r


def _run(spark, nodes, edges, **kw):
    edf = spark.createDataFrame(edges, ["a_id", "b_id", "w"])
    ndf = spark.createDataFrame([(v,) for v in nodes], ["node"])
    got = pagerank(edf, nodes=ndf, weight="w", **kw)
    return {r["node"]: r["rank_micro"] for r in got.collect()}


def test_pagerank_matches_integer_reference_with_dangling(spark):
    # cycle 1->2->3->1, node 4 feeding in with weight 2, node 5 isolated
    # (dangling) — exercises weights, in-degree skew, and dangling mass
    nodes = [1, 2, 3, 4, 5]
    edges = [(1, 2, 1), (2, 3, 1), (3, 1, 1), (4, 1, 2)]
    assert _run(spark, nodes, edges) == ref_pagerank(nodes, edges)


def test_pagerank_uniform_on_symmetric_cycle(spark):
    # a symmetric cycle is regular: every node must get the identical rank
    nodes = list(range(6))
    edges = [(i, (i + 1) % 6, 1) for i in nodes] + [
        ((i + 1) % 6, i, 1) for i in nodes
    ]
    got = _run(spark, nodes, edges)
    assert len(set(got.values())) == 1
    assert got == ref_pagerank(nodes, edges)


def test_pagerank_mass_is_conserved_up_to_truncation(spark):
    nodes = [1, 2, 3, 4, 5]
    edges = [(1, 2, 1), (2, 3, 1), (3, 1, 1), (4, 1, 2)]
    got = _run(spark, nodes, edges)
    total = sum(got.values())
    # integer division only ever LOSES micro-mass; with N=5 nodes and 3
    # rounds the loss is bounded by a few truncations per node per round
    assert total <= PAGERANK_SCALE
    assert total > PAGERANK_SCALE * 0.99


def test_pagerank_all_dangling_degenerates_to_uniform(spark):
    # no edges at all: every round redistributes the full mass uniformly
    nodes = [7, 8, 9]
    edf = spark.createDataFrame([], "a_id long, b_id long, w long")
    ndf = spark.createDataFrame([(v,) for v in nodes], ["node"])
    got = {r["node"]: r["rank_micro"]
           for r in pagerank(edf, nodes=ndf, weight="w").collect()}
    assert got == ref_pagerank(nodes, [])


def test_pagerank_unweighted_defaults_to_edge_count(spark):
    nodes = [1, 2, 3]
    edges = [(1, 2), (1, 3), (2, 3)]
    edf = spark.createDataFrame(edges, ["a_id", "b_id"])
    ndf = spark.createDataFrame([(v,) for v in nodes], ["node"])
    got = {r["node"]: r["rank_micro"]
           for r in pagerank(edf, nodes=ndf).collect()}
    assert got == ref_pagerank(nodes, [(u, v, 1) for u, v in edges])


def test_pagerank_nodes_default_to_edge_endpoints(spark):
    edges = [(1, 2, 1), (2, 1, 1)]
    edf = spark.createDataFrame(edges, ["a_id", "b_id", "w"])
    got = {r["node"]: r["rank_micro"] for r in pagerank(edf, weight="w").collect()}
    assert set(got) == {1, 2}
    assert got == ref_pagerank([1, 2], edges)


def test_pagerank_rejects_bad_params(spark):
    edf = spark.createDataFrame([(1, 2, 1)], ["a_id", "b_id", "w"])
    import pytest

    with pytest.raises(ValueError, match="n_iter"):
        pagerank(edf, n_iter=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(edf, damping_num=100, damping_den=100)


def test_pagerank_is_partition_count_invariant(spark):
    # the integer micro-rank claim, tested directly: identical ranks no
    # matter how the edge/node tables are partitioned (double-based
    # power iteration would drift in the last ulps here)
    import random

    rng = random.Random(31)
    n = 200
    edges = [
        (rng.randrange(n), rng.randrange(n), rng.randrange(1, 4))
        for _ in range(600)
    ]
    nodes = [(v,) for v in range(n)]

    def run(parts):
        edf = spark.createDataFrame(edges, ["a_id", "b_id", "w"]).repartition(parts)
        ndf = spark.createDataFrame(nodes, ["node"]).repartition(parts)
        return {
            r["node"]: r["rank_micro"]
            for r in pagerank(edf, nodes=ndf, weight="w", n_iter=3).collect()
        }

    r1, r7, r32 = run(1), run(7), run(32)
    assert r1 == r7 == r32


def test_triangle_count_known_graph(spark):
    from sed_spark.ext.graph import triangle_count

    # K4 on {0,1,2,3} (every node in 3 triangles) + a pendant 4-5 edge +
    # isolated node 6; edges given in mixed order with dups/self-loops
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
         (3, 2), (4, 5), (4, 4)],
        "a_id long, b_id long",
    )
    nodes = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(edges, nodes=nodes, node_col="doc_id").collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 4: 0, 5: 0, 6: 0}
    # without a node frame: endpoints only
    got2 = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(edges).collect()
    }
    assert got2 == {0: 3, 1: 3, 2: 3, 3: 3, 4: 0, 5: 0}


def test_triangle_count_matches_bruteforce_random(spark):
    import itertools
    import random

    from sed_spark.ext.graph import triangle_count

    rng = random.Random(3)
    n = 30
    es = sorted({
        tuple(sorted((rng.randrange(n), rng.randrange(n))))
        for _ in range(120)
    })
    es = [e for e in es if e[0] != e[1]]
    eset = set(es)
    want = {i: 0 for i in range(n)}
    for a, b, c in itertools.combinations(range(n), 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            want[a] += 1
            want[b] += 1
            want[c] += 1
    edges = spark.createDataFrame(es, "a_id long, b_id long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(edges, nodes=nodes).collect()
    }
    assert got == want
    # the orient=False middle-node plan is result-identical
    naive = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(edges, nodes=nodes, orient=False).collect()
    }
    assert naive == want


def test_triangle_count_skewed_hub_exact_and_bounded_wedges(spark):
    # one celebrity node (0) adjacent to everyone; under degree-ordered
    # orientation the hub only pivots wedges toward its ≺-LARGER
    # neighbors, so its fan-out is bounded — and counts stay exact
    from pyspark.sql import functions as F

    from sed_spark.ext.graph import triangle_count

    n = 60
    hub = [(0, i) for i in range(1, n)]       # star: degree(0) = 59
    ring = [(i, i + 1) for i in range(1, n - 1)]  # path through the leaves
    edges = spark.createDataFrame(hub + ring, "a_id long, b_id long")
    # every path edge (i, i+1) closes a triangle with the hub: n-2 tris;
    # hub is in all of them, leaf i is in the triangles of its incident
    # path edges (1 at the ends, 2 inside)
    got = {
        r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()
    }
    assert got[0] == n - 2
    assert got[1] == 1 and got[n - 1] == 1
    assert all(got[i] == 2 for i in range(2, n - 1))
    # duplicate node ids in a caller-supplied frame must not duplicate
    # output rows (round-8 ADVICE)
    nodes = spark.createDataFrame(
        [(0,), (0,), (1,), (99,)], "doc_id long",
    )
    rows = triangle_count(edges, nodes=nodes, node_col="doc_id").collect()
    assert len(rows) == 3
    assert {r["node"]: r["n_triangles"] for r in rows} == {
        0: n - 2, 1: 1, 99: 0,
    }
    # the wedge stage pivots at the ≺-minimum endpoint: assert the
    # oriented self-join keys on src (plan shape, not a straggler timer)
    plan = triangle_count(edges)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def ref_lpa(edge_list, node_set, n_iter):
    adj: dict = {n: set() for n in node_set}
    for a, b in edge_list:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    labels = {n: n for n in set(node_set) | set(adj)}
    for _ in range(n_iter):
        nxt = {}
        for n, lbl in labels.items():
            nbrs = adj.get(n, set())
            if not nbrs:
                nxt[n] = lbl
                continue
            counts: dict = {}
            for m in nbrs:
                counts[labels[m]] = counts.get(labels[m], 0) + 1
            nxt[n] = min(counts, key=lambda x: (-counts[x], x))
        labels = nxt
    return labels


def test_label_propagation_matches_reference_and_splits_bridged_cliques(spark):
    from sed_spark.ext.graph import label_propagation

    # two 4-cliques joined by ONE bridge edge (3-10): connected
    # components fuse them; LPA's majority vote keeps them apart
    clique_a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    clique_b = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    edge_list = clique_a + clique_b + [(3, 10), (99, 99)]  # + self loop
    node_set = list(range(4)) + list(range(10, 14)) + [50]  # 50 isolated
    edges = spark.createDataFrame(edge_list, ["a_id", "b_id"])
    nodes = spark.createDataFrame([(n,) for n in node_set], ["doc_id"])
    for n_iter in (1, 3, 5):
        got = {
            r["node"]: r["community"]
            for r in label_propagation(
                edges, n_iter=n_iter, nodes=nodes,
            ).collect()
        }
        assert got == ref_lpa(edge_list, node_set, n_iter), n_iter
    final = ref_lpa(edge_list, node_set, 5)
    assert len({final[n] for n in range(4)}) == 1
    assert len({final[n] for n in range(10, 14)}) == 1
    assert final[0] != final[10]  # bridge did NOT fuse the cliques
    assert final[50] == 50  # isolated keeps its own label


def test_label_propagation_defaults_to_edge_endpoints(spark):
    from sed_spark.ext.graph import label_propagation

    edges = spark.createDataFrame([(5, 6), (6, 7)], ["a_id", "b_id"])
    got = {
        r["node"]: r["community"]
        for r in label_propagation(edges, n_iter=4).collect()
    }
    assert set(got) == {5, 6, 7}
    assert got == ref_lpa([(5, 6), (6, 7)], [5, 6, 7], 4)

    import pytest

    with pytest.raises(ValueError, match="n_iter"):
        label_propagation(edges, n_iter=0)
