"""Bucketed staging: the join must run with no Exchange on either side."""

from __future__ import annotations

from pyspark.sql import functions as F

from sed_spark.loader.bucketing import stage_bucketed


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("train_id"), (F.col("id") * 2).alias("tof"),
    )
    right = spark.range(0, 10_000).select(
        F.col("id").alias("train_id"), (F.col("id") % 7).alias("bias"),
    )
    lt = stage_bucketed(
        left, "t_left", ["train_id"], n_buckets=8,
        sort_cols=["train_id"], path=str(tmp_path / "l"),
    )
    rt = stage_bucketed(
        right, "t_right", ["train_id"], n_buckets=8,
        sort_cols=["train_id"], path=str(tmp_path / "r"),
    )
    joined = lt.hint("merge").join(rt, "train_id")
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # and the aggregation on the bucket key is shuffle-free too
    agg = lt.groupBy("train_id").agg(F.sum("tof").alias("s"))
    agg.collect()
    aplan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in aplan, aplan
    assert joined.count() == 10_000


def test_incremental_dedup_over_bucketed_hash_state(spark, tmp_path):
    # the deployment shape incremental_dedup's docstring promises: the
    # corpus hash table and the staged batch hashes both bucketed on the
    # hash -> the anti-join is co-located, NO Exchange anywhere
    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(500)], ["doc_id", "text"],
    )
    batch = spark.createDataFrame(
        [(1000 + i, f"doc {i}" if i < 50 else f"new {i}") for i in range(100)],
        ["doc_id", "text"],
    )
    seen = corpus.select(F.md5("text").alias("text_hash"))
    seen_t = stage_bucketed(
        seen, "t_seen_hashes", ["text_hash"], n_buckets=8,
        sort_cols=["text_hash"], path=str(tmp_path / "seen"),
    )
    staged_batch = stage_bucketed(
        batch.select("doc_id", F.md5("text").alias("text_hash")),
        "t_batch_hashes", ["text_hash"], n_buckets=8,
        sort_cols=["text_hash"], path=str(tmp_path / "batch"),
    )
    fresh = staged_batch.hint("merge").join(seen_t, "text_hash", "left_anti")
    fresh.collect()
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "LeftAnti" in plan
    assert "Exchange" not in plan, plan
    # semantics match the operator run directly on the raw tables
    from sed_spark.ext.dedup import incremental_dedup

    want = {r["keep_id"] for r in incremental_dedup(batch, seen).collect()}
    got = {r["doc_id"] for r in fresh.collect()}
    assert got == want == {1000 + i for i in range(50, 100)}


def test_incremental_lsh_index_bucketed_removes_index_shuffle(spark, tmp_path):
    # the deployment shape incremental_lsh_pairs' docstring promises: the
    # corpus's band index persisted bucketed on (band, sig) -> the
    # batch-vs-index join reads the index pre-shuffled, so only the new
    # batch's (tiny) band table pays an Exchange
    from sed_spark.ext import dedup

    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} common tail words here") for i in range(200)],
        ["doc_id", "text"],
    )
    sigs = dedup.minhash_signatures(docs, n_bands=4)
    even_bands = dedup.melt_bands(sigs.filter(F.col("doc_id") % 2 == 0))
    new_sigs = sigs.filter(F.col("doc_id") % 2 == 1)

    def n_exchanges(df):
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange hashpartitioning")

    plain = n_exchanges(
        dedup.incremental_lsh_pairs(new_sigs, even_bands),
    )
    index_t = stage_bucketed(
        even_bands, "t_lsh_index", ["band", "sig"], n_buckets=8,
        sort_cols=["band", "sig"], path=str(tmp_path / "lsh_index"),
    )
    bucketed = n_exchanges(
        dedup.incremental_lsh_pairs(new_sigs, index_t.hint("merge")),
    )
    assert bucketed < plain, (bucketed, plain)

    # results identical either way
    a = {(r.a_id, r.b_id) for r in
         dedup.incremental_lsh_pairs(new_sigs, even_bands).collect()}
    b = {(r.a_id, r.b_id) for r in
         dedup.incremental_lsh_pairs(new_sigs, index_t).collect()}
    assert a == b


def test_corpus_diff_over_bucketed_snapshots_is_shuffle_free(spark, tmp_path):
    # proves corpus_diff's docstring claim (ext/corpus.py): each side
    # reduces to (id, md5) — a projection that PRESERVES the staged
    # bucket distribution — so over two snapshots bucketed on doc_id the
    # full-outer diff join has NO Exchange on either side
    from sed_spark.ext.corpus import corpus_diff

    old = spark.createDataFrame(
        [(i, f"text {i}") for i in range(100)], ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(i, f"text {i}" if i % 3 else f"edited {i}")
         for i in range(50, 150)],
        ["doc_id", "text"],
    )
    old_t = stage_bucketed(
        old, "t_diff_old", ["doc_id"], n_buckets=8,
        sort_cols=["doc_id"], path=str(tmp_path / "old"),
    )
    new_t = stage_bucketed(
        new, "t_diff_new", ["doc_id"], n_buckets=8,
        sort_cols=["doc_id"], path=str(tmp_path / "new"),
    )
    diff = corpus_diff(old_t, new_t)
    rows = diff.collect()
    plan = diff._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "FullOuter" in plan
    assert "Exchange" not in plan, plan
    # and the diff itself is right
    got = {r["doc_id"]: r["status"] for r in rows}
    assert got[0] == "removed" and got[149] == "added"
    assert got[52] == "unchanged" and got[60] == "changed"


# ---------------------------------------------------------------------------
# Z-order clustered writes
# ---------------------------------------------------------------------------

def _ref_morton(vals, mins, maxs, bits):
    n = len(vals)
    levels = (1 << bits) - 1
    qs = []
    for v, lo, hi in zip(vals, mins, maxs):
        q = int((v - lo) / (hi - lo) * levels)
        qs.append(max(0, min(levels, q)))
    key = 0
    for bit in range(bits):
        for ci, q in enumerate(qs):
            key |= ((q >> bit) & 1) << (bit * n + ci)
    return key


def test_zorder_key_matches_python_reference(spark):
    from sed_spark.loader.bucketing import zorder_key_expr
    from pyspark.sql import functions as F

    rows = [(1.0, 900.0), (512.0, 0.0), (1023.0, 1023.0), (100.5, 300.25)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = [
        r["k"]
        for r in df.select(
            zorder_key_expr(["x", "y"], [0.0, 0.0], [1023.0, 1023.0],
                            bits_per_col=10).alias("k"),
        ).collect()
    ]
    want = [_ref_morton(v, [0.0, 0.0], [1023.0, 1023.0], 10) for v in rows]
    assert got == want


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    import glob

    import pandas as pd
    from pyspark.sql import functions as F

    from sed_spark.loader.bucketing import write_zordered

    # uniform 2-D cloud; after z-order clustering every file must cover
    # a small X range AND a small Y range — a lexicographic sort on x
    # would leave per-file y spreads at the full range
    df = spark.range(40_000).select(
        (F.rand(1) * 1000.0).alias("x"), (F.rand(2) * 1000.0).alias("y"),
    )
    out = str(tmp_path / "z")
    write_zordered(df, out, ["x", "y"], n_files=16)

    spreads_x, spreads_y = [], []
    for f in glob.glob(out + "/part-*.parquet"):
        pdf = pd.read_parquet(f)
        if len(pdf) == 0:
            continue
        spreads_x.append(pdf["x"].max() - pdf["x"].min())
        spreads_y.append(pdf["y"].max() - pdf["y"].min())
    assert len(spreads_x) >= 8
    med_x = sorted(spreads_x)[len(spreads_x) // 2]
    med_y = sorted(spreads_y)[len(spreads_y) // 2]
    # 16 files over a 1000x1000 square: typical z-order cells cover
    # roughly a quarter of each axis; lexicographic would give ~1000 in y
    assert med_x < 550 and med_y < 550, (med_x, med_y)
    # round-trip: no rows lost, no helper column leaked
    back = spark.read.parquet(out)
    assert back.count() == 40_000
    assert set(back.columns) == {"x", "y"}


def test_zorder_validation(spark):
    import pytest

    from sed_spark.loader.bucketing import zorder_key_expr

    with pytest.raises(ValueError, match="1-4"):
        zorder_key_expr([], [], [])
    with pytest.raises(ValueError, match="int64"):
        zorder_key_expr(["a", "b"], [0, 0], [1, 1], bits_per_col=32)
    with pytest.raises(ValueError, match="degenerate"):
        zorder_key_expr(["a"], [1.0], [1.0])
