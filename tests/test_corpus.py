"""URL/domain extraction and deterministic hash splitting."""

from __future__ import annotations

from pyspark.sql import functions as F

from sed_spark.ext.corpus import domain_stats, extract_urls, hash_split


def test_extract_urls_and_domains(spark):
    rows = [
        (0, "see https://www.Example.com/a/b and http://sub.site.org:8080/x?q=1"),
        (1, "no urls here"),
        (2, "dup https://example.com/1 https://example.com/2"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [(r["doc_id"], r["url"], r["domain"])
           for r in extract_urls(df).orderBy("doc_id", "url").collect()]
    assert got == [
        (0, "http://sub.site.org:8080/x?q=1", "sub.site.org"),
        (0, "https://www.Example.com/a/b", "example.com"),
        (2, "https://example.com/1", "example.com"),
        (2, "https://example.com/2", "example.com"),
    ]


def test_domain_stats_rollup(spark):
    rows = [
        (0, "https://a.com/x https://a.com/y"),
        (1, "https://a.com/z and https://b.net/1"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["domain"]: (r["n_urls"], r["n_docs"])
        for r in domain_stats(df).collect()
    }
    assert got == {"a.com": (3, 2), "b.net": (1, 1)}


def test_hash_split_deterministic_and_stable_under_growth(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], ["doc_id"])
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in hash_split(df, w).collect()}
    b = {r["doc_id"]: r["split"]
         for r in hash_split(df.repartition(17), w).collect()}
    assert a == b  # partition layout cannot move documents
    # growing the corpus never reassigns existing documents
    grown = spark.createDataFrame([(i,) for i in range(4000)], ["doc_id"])
    c = {r["doc_id"]: r["split"] for r in hash_split(grown, w).collect()}
    assert all(c[i] == a[i] for i in range(2000))
    # proportions roughly honored
    from collections import Counter

    frac = Counter(a.values())
    assert 0.7 < frac["train"] / 2000 < 0.9
    assert 0.05 < frac["val"] / 2000 < 0.16
    assert 0.05 < frac["test"] / 2000 < 0.16


def test_hash_split_salt_gives_independent_assignment(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], ["doc_id"])
    w = {"a": 0.5, "b": 0.5}
    s1 = {r["doc_id"]: r["split"] for r in hash_split(df, w, salt="x").collect()}
    s2 = {r["doc_id"]: r["split"] for r in hash_split(df, w, salt="y").collect()}
    differs = sum(1 for i in s1 if s1[i] != s2[i])
    assert differs > 100  # ~50% expected under independence


def test_hash_split_validates_weights(spark):
    import pytest

    df = spark.createDataFrame([(1,)], ["doc_id"])
    with pytest.raises(ValueError):
        hash_split(df, {})
    with pytest.raises(ValueError):
        hash_split(df, {"a": 0.0})


def test_extract_urls_sentence_final_punctuation(spark):
    df = spark.createDataFrame(
        [(0, "visit https://example.com. Next see http://a-b.net-")],
        ["doc_id", "text"],
    )
    got = [(r["url"], r["domain"])
           for r in extract_urls(df).orderBy("url").collect()]
    assert got == [
        ("http://a-b.net", "a-b.net"),
        ("https://example.com", "example.com"),
    ]


def test_hash_split_rejects_negative_weight(spark):
    import pytest

    df = spark.createDataFrame([(1,)], ["doc_id"])
    with pytest.raises(ValueError, match="non-negative"):
        hash_split(df, {"a": 2.0, "b": -1.0})


def test_hash_split_md5_matches_python_reference(spark):
    # the engine-portable method: u = first 8 md5 hex digits / 2^32 —
    # reproducible OUTSIDE Spark (hashlib here; DuckDB in the oracle)
    import hashlib

    from sed_spark.ext.corpus import hash_split as hs

    w = {"train": 0.9, "val": 0.05, "test": 0.05}
    df = spark.createDataFrame([(i,) for i in range(1000)], ["doc_id"])
    got = {r["doc_id"]: r["split"]
           for r in hs(df, w, method="md5", salt="s").collect()}

    def expect(i):
        u = int(hashlib.md5(f"{i}s".encode()).hexdigest()[:8], 16) / 2 ** 32
        acc = 0.0
        for name, wgt in list(w.items())[:-1]:
            acc += wgt / 1.0
            if u < acc:
                return name
        return "test"

    assert got == {i: expect(i) for i in range(1000)}


def test_hash_split_rejects_unknown_method(spark):
    import pytest

    df = spark.createDataFrame([(1,)], ["doc_id"])
    with pytest.raises(ValueError, match="unknown method"):
        hash_split(df, {"a": 1.0}, method="sha999")


def test_rate_sample_deterministic_and_skew_free(spark):
    from sed_spark.ext.corpus import cap_rates, rate_sample

    # 3 domains: big (300 docs), medium (60), small (10)
    rows = [(i, "big" if i < 300 else ("med" if i < 360 else "small"))
            for i in range(370)]
    df = spark.createDataFrame(rows, ["doc_id", "domain"])
    stats = df.groupBy("domain").count().withColumnRenamed("count", "n_docs")
    rates = cap_rates(stats, cap=50)

    kept = rate_sample(df, rates, salt="s").collect()
    by_dom = {}
    for r in kept:
        by_dom.setdefault(r["domain"], []).append(r["doc_id"])
    # small domain entirely kept (rate clamps at 1.0)
    assert len(by_dom["small"]) == 10
    # big domain downsampled toward ~50 in expectation
    assert 25 <= len(by_dom["big"]) <= 80
    # decisions stable under repartition
    again = {r["doc_id"] for r in
             rate_sample(df.repartition(13), rates, salt="s").collect()}
    assert again == {r["doc_id"] for r in kept}
    # flag mode marks instead of filtering
    flagged = rate_sample(df, rates, salt="s", keep_col="kept")
    assert flagged.count() == 370
    assert flagged.filter("kept = 1").count() == len(kept)


def test_rate_sample_missing_group_kept(spark):
    from sed_spark.ext.corpus import rate_sample

    df = spark.createDataFrame(
        [(1, "known"), (2, "unknown")], ["doc_id", "domain"],
    )
    rates = spark.createDataFrame([("known", 0.0)], ["domain", "rate"])
    got = {r["doc_id"] for r in rate_sample(df, rates).collect()}
    assert got == {2}  # rate 0 drops; absent domain is uncapped


def test_gumbel_topk_deterministic_and_weighted(spark):
    import hashlib
    import math

    from sed_spark.ext import corpus

    n = 60
    rows = [(i, float(i % 5)) for i in range(n)]  # weights 0..4
    df = spark.createDataFrame(rows, ["doc_id", "w"])

    def key(i, w, salt="s"):
        h = int(hashlib.md5(f"{i}{salt}".encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 2**32
        return round(w + -math.log(-math.log(u)), 6)

    expect_keys = {i: key(i, w) for i, w in rows}
    kth = sorted(expect_keys.values(), reverse=True)[9]

    got = corpus.gumbel_topk(df, "w", k=10, salt="s").collect()
    for r in got:
        assert r.gumbel_key == expect_keys[r.doc_id]
        assert r.is_sampled == int(r.gumbel_key >= kth)
    assert sum(r.is_sampled for r in got) == 10
    # selection is biased toward the heavy weights
    heavy = sum(1 for r in got if r.is_sampled and r.w >= 3.0)
    assert heavy >= 6

    # same salt -> same sample; different salt -> (almost surely) different
    again = corpus.gumbel_topk(df, "w", k=10, salt="s").collect()
    assert {r.doc_id for r in again if r.is_sampled} == {
        r.doc_id for r in got if r.is_sampled
    }
    other = corpus.gumbel_topk(df, "w", k=10, salt="t").collect()
    assert {r.doc_id for r in other if r.is_sampled} != {
        r.doc_id for r in got if r.is_sampled
    }

    import pytest
    with pytest.raises(ValueError, match="k must be positive"):
        corpus.gumbel_topk(df, "w", k=0)


def test_gumbel_topk_xxhash64_keys_never_null(spark):
    # the xxhash64 path clamps log's argument strictly below 1.0 (the
    # int64->double cast can round a hash to exactly 2^63, where the
    # 2^-65 midpoint offset is below the ulp); every key must be a
    # real number and every row flagged 0/1, never NULL
    from sed_spark.ext import corpus

    df = spark.createDataFrame(
        [(i, 1.0) for i in range(500)], ["doc_id", "w"],
    )
    got = corpus.gumbel_topk(df, "w", k=20, method="xxhash64").collect()
    assert len(got) == 500
    for r in got:
        assert r.gumbel_key is not None
        assert r.is_sampled in (0, 1)
    assert sum(r.is_sampled for r in got) == 20

    # a NULL id keeps a NULL key under md5 (the clamp must not replace
    # the NULL hash with its constant — F.least skips nulls)
    with_null = spark.createDataFrame(
        [(None, 5.0), ("a", 1.0), ("b", 2.0)],
        "doc_id string, w double",
    )
    rows = {r.doc_id: r for r in
            corpus.gumbel_topk(with_null, "w", k=2, method="md5").collect()}
    assert rows[None].gumbel_key is None
    assert rows["a"].gumbel_key is not None


def test_gumbel_topk_empty_input(spark):
    from sed_spark.ext import corpus

    empty = spark.createDataFrame([], "doc_id long, w double")
    got = corpus.gumbel_topk(empty, "w", k=3).collect()
    assert got == []


def test_exact_cap_sample_exact_and_stable(spark):
    import hashlib

    from sed_spark.ext import corpus

    rows = [(i, "d%d" % (i % 3)) for i in range(30)]  # 3 domains x 10
    df = spark.createDataFrame(rows, ["doc_id", "domain"])

    def u(i, salt="s"):
        return int(hashlib.md5(f"{i}{salt}".encode()).hexdigest()[:8], 16) / 2**32

    kept = {
        r.doc_id
        for r in corpus.exact_cap_sample(
            df, cap=4, salt="s", method="md5",
        ).collect()
    }
    # exactly 4 per domain, and exactly the 4 smallest hashes per domain
    for d in range(3):
        members = [i for i, dom in rows if dom == f"d{d}"]
        expect = set(sorted(members, key=lambda i: (u(i), i))[:4])
        assert expect == {i for i in kept if i % 3 == d}

    # growth stability: adding new docs never evicts a kept doc unless the
    # newcomer ranks into the top-4 of its domain
    rows2 = rows + [(100 + i, "d%d" % (i % 3)) for i in range(6)]
    df2 = spark.createDataFrame(rows2, ["doc_id", "domain"])
    kept2 = {
        r.doc_id
        for r in corpus.exact_cap_sample(
            df2, cap=4, salt="s", method="md5",
        ).collect()
    }
    def dom_of(i):
        return (i - 100) % 3 if i >= 100 else i % 3

    for d in range(3):
        members = [i for i, dom in rows2 if dom == f"d{d}"]
        expect = set(sorted(members, key=lambda i: (u(i), i))[:4])
        assert expect == {i for i in kept2 if dom_of(i) == d}

    # flag variant keeps every row
    flagged = corpus.exact_cap_sample(
        df, cap=4, salt="s", method="md5", keep_col="kept",
    )
    assert flagged.count() == 30
    assert flagged.agg(F.sum("kept")).collect()[0][0] == 12

    import pytest
    with pytest.raises(ValueError, match="cap must be positive"):
        corpus.exact_cap_sample(df, cap=0)


def test_quantile_gates_trims_tails(spark):
    import numpy as np

    from sed_spark.ext import corpus

    vals = [float(v) for v in range(1, 101)]  # 1..100
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               ["doc_id", "x"])
    kept = corpus.quantile_gates(df, "x", 0.10, 0.90, exact=True).collect()
    lo, hi = np.percentile(vals, 10), np.percentile(vals, 90)
    assert {r.x for r in kept} == {v for v in vals if lo <= v <= hi}

    flagged = corpus.quantile_gates(
        df, "x", 0.10, 0.90, exact=True, keep_col="in_band",
    )
    assert flagged.count() == 100
    assert flagged.agg(F.sum("in_band")).collect()[0][0] == len(kept)

    # the approx sketch stays within its rank-error contract
    approx = corpus.quantile_gates(
        df, "x", 0.10, 0.90, relative_error=1e-4,
    ).collect()
    assert abs(len(approx) - len(kept)) <= 2

    import pytest
    with pytest.raises(ValueError, match="lo_q"):
        corpus.quantile_gates(df, "x", 0.9, 0.1)
    # empty frame / all-NULL column: clear error, not an opaque TypeError
    empty = spark.createDataFrame([], "doc_id long, x double")
    with pytest.raises(ValueError, match="no non-null values"):
        corpus.quantile_gates(empty, "x")
    nulls = spark.createDataFrame([(0, None), (1, None)], "doc_id long, x double")
    with pytest.raises(ValueError, match="no non-null values"):
        corpus.quantile_gates(nulls, "x", exact=True)


def test_mixture_rates_hits_target_proportions(spark):
    from sed_spark.ext import corpus

    stats = spark.createDataFrame(
        [("a", 1000), ("b", 100), ("c", 400), ("d", 50)],
        ["domain", "n_docs"],
    )
    # target 50/25/25 over a,b,c; d not in the mixture -> dropped
    target = {"a": 0.5, "b": 0.25, "c": 0.25}
    rates = {r.domain: r.rate for r in
             corpus.mixture_rates(stats, target).collect()}
    # binding group: b (100/0.25 = 400 = S) -> keeps everything
    assert rates["b"] == 1.0
    assert rates["d"] == 0.0
    # expected sizes: a = 0.5*400 = 200 of 1000, c = 0.25*400 = 100 of 400
    assert abs(rates["a"] * 1000 - 200) < 1e-9
    assert abs(rates["c"] * 400 - 100) < 1e-9
    # surviving mixture matches the target exactly in expectation
    surv = {g: rates[g] * n for g, n in
            [("a", 1000), ("b", 100), ("c", 400)]}
    tot = sum(surv.values())
    assert abs(surv["a"] / tot - 0.5) < 1e-9
    assert abs(surv["b"] / tot - 0.25) < 1e-9

    # unnormalized weights give the same rates
    rates2 = {r.domain: r.rate for r in
              corpus.mixture_rates(stats, {"a": 2, "b": 1, "c": 1}).collect()}
    assert rates2 == rates

    import pytest
    with pytest.raises(ValueError, match="non-negative"):
        corpus.mixture_rates(stats, {"a": -1.0})
    # a positive-share source with no stats row makes the mixture
    # unachievable — must raise, not return a rate table for a
    # different mixture
    with pytest.raises(ValueError, match="unachievable"):
        corpus.mixture_rates(stats, {"zzz": 1.0})
    with pytest.raises(ValueError, match="zzz"):
        corpus.mixture_rates(stats, {"a": 0.5, "zzz": 0.5})
    # zero-share absent groups are fine (an explicit drop, not a demand)
    ok = {r.domain: r.rate for r in
          corpus.mixture_rates(stats, {"a": 1.0, "zzz": 0.0}).collect()}
    assert ok["a"] == 1.0 and ok["d"] == 0.0


def test_training_order_is_a_deterministic_permutation(spark):
    import hashlib

    from sed_spark.ext import corpus

    n = 120
    df = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    got = corpus.training_order(df, n_shards=4, salt="s", method="md5").collect()
    assert len(got) == n
    # every row present, (shard, pos) pairs unique, pos dense per shard
    by_shard: dict[int, list] = {}
    for r in got:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) <= set(range(4))
    for shard, rows in by_shard.items():
        assert sorted(r.pos for r in rows) == list(range(len(rows)))

    # exact md5 mirror: shard = hex8(md5(id||salt)) % 4, order by the
    # independent hash hex8(md5(id||salt||'|ord'))/2^32 with id tie-break
    def h(i, salt):
        return int(hashlib.md5(f"{i}{salt}".encode()).hexdigest()[:8], 16)

    for shard, rows in by_shard.items():
        members = sorted(
            (r.doc_id for r in rows),
            key=lambda i: (h(i, "s|ord") / 2**32, i),
        )
        expect = {i: p for p, i in enumerate(members)}
        for r in rows:
            assert h(r.doc_id, "s") % 4 == r.shard
            assert r.pos == expect[r.doc_id], r

    # rerun -> identical; different salt -> different permutation
    again = corpus.training_order(df, n_shards=4, salt="s", method="md5").collect()
    assert {(r.doc_id, r.shard, r.pos) for r in again} == {
        (r.doc_id, r.shard, r.pos) for r in got
    }
    other = corpus.training_order(df, n_shards=4, salt="t", method="md5").collect()
    assert {(r.doc_id, r.shard, r.pos) for r in other} != {
        (r.doc_id, r.shard, r.pos) for r in got
    }

    # xxhash64 path: still a valid dense permutation
    fast = corpus.training_order(df, n_shards=8, salt="s").collect()
    shards: dict[int, list] = {}
    for r in fast:
        shards.setdefault(r.shard, []).append(r.pos)
    assert sum(len(v) for v in shards.values()) == n
    for v in shards.values():
        assert sorted(v) == list(range(len(v)))

    import pytest
    with pytest.raises(ValueError, match="n_shards"):
        corpus.training_order(df, n_shards=0)
    with pytest.raises(ValueError, match="method"):
        corpus.training_order(df, n_shards=2, method="sha9")


def test_write_training_shards_replays_the_permutation(spark, tmp_path):
    from sed_spark.ext import corpus

    n = 90
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(n)], ["doc_id", "text"],
    )
    out = str(tmp_path / "shards")
    corpus.write_training_shards(df, out, n_shards=3, salt="s", method="md5")

    expect = {
        (r.shard, r.pos): r.doc_id
        for r in corpus.training_order(
            df, n_shards=3, salt="s", method="md5",
        ).collect()
    }
    back = spark.read.parquet(out)
    assert back.count() == n
    # each shard directory holds ONE file whose physical row order IS the
    # pos order (the property a sequential trainer relies on)
    import glob

    for shard in range(3):
        files = glob.glob(f"{out}/shard={shard}/*.parquet")
        if not files:
            continue
        assert len(files) == 1, files
        import pyarrow.parquet as pq

        tbl = pq.read_table(files[0])
        ids = tbl.column("doc_id").to_pylist()
        poss = tbl.column("pos").to_pylist()
        assert poss == sorted(poss) == list(range(len(poss)))
        for p, i in zip(poss, ids):
            assert expect[(shard, p)] == i


def test_blocklist_filter_anti_join_and_flag(spark):
    from sed_spark.ext import corpus

    df = spark.createDataFrame(
        [(0, "good.com"), (1, "bad.com"), (2, "good.com"), (3, None)],
        ["doc_id", "domain"],
    )
    blocked = spark.createDataFrame(
        [("bad.com",), ("bad.com",), ("absent.net",)], ["domain"],
    )
    kept = {r.doc_id for r in corpus.blocklist_filter(df, blocked).collect()}
    assert kept == {0, 2, 3}  # NULL key kept (absent-is-unblocked)

    flagged = {
        r.doc_id: r.kept_domain
        for r in corpus.blocklist_filter(
            df, blocked, keep_col="kept_domain",
        ).collect()
    }
    assert flagged == {0: 1, 1: 0, 2: 1, 3: 1}


def test_temperature_rates_flatten_toward_uniform(spark):
    import math

    import pytest

    from sed_spark.ext.corpus import rate_sample, temperature_rates

    stats = spark.createDataFrame(
        [("big", 1600), ("mid", 400), ("small", 100)],
        ["domain", "n_docs"],
    )
    rates = {r["domain"]: r["rate"]
             for r in temperature_rates(stats, alpha=0.5).collect()}
    # smallest group keeps everything; larger groups trim by sqrt ratio
    assert rates == {"big": math.sqrt(100 / 1600),
                     "mid": math.sqrt(100 / 400), "small": 1.0}
    # surviving shares are proportional to n^alpha: 40 : 20 : 10
    surv = {g: n * rates[g] for g, n in
            [("big", 1600), ("mid", 400), ("small", 100)]}
    assert surv["big"] == pytest.approx(2 * surv["mid"])
    assert surv["mid"] == pytest.approx(2 * surv["small"])

    # alpha=1 keeps natural proportions (every rate 1.0)
    nat = {r["domain"]: r["rate"]
           for r in temperature_rates(stats, alpha=1.0).collect()}
    assert nat == {"big": 1.0, "mid": 1.0, "small": 1.0}

    # the rates drive rate_sample like any other rate table
    docs = spark.createDataFrame(
        [(i, "big" if i % 2 == 0 else "small") for i in range(200)],
        ["doc_id", "domain"],
    )
    kept = rate_sample(docs, temperature_rates(stats, alpha=0.5))
    by_dom = {r["domain"]: r["n"] for r in kept.groupBy("domain")
              .agg(F.count("*").alias("n")).collect()}
    assert by_dom["small"] == 100            # rate 1.0: all kept
    assert 10 <= by_dom.get("big", 0) <= 50  # rate 0.25 of 100, binomial


def test_temperature_rates_validation_and_zero_counts(spark):
    import pytest

    from sed_spark.ext.corpus import temperature_rates

    stats = spark.createDataFrame([("a", 10)], ["domain", "n_docs"])
    with pytest.raises(ValueError, match="alpha"):
        temperature_rates(stats, alpha=0.0)
    with pytest.raises(ValueError, match="alpha"):
        temperature_rates(stats, alpha=1.5)
    empty = spark.createDataFrame([("a", 0)], ["domain", "n_docs"])
    got = {r["domain"]: r["rate"]
           for r in temperature_rates(empty).collect()}
    assert got == {"a": 0.0}


def test_corpus_diff_statuses(spark):
    from sed_spark.ext.corpus import corpus_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "before"), (3, "gone")], ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "after"), (4, "fresh")], ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in corpus_diff(old, new).collect()}
    assert rows[1]["status"] == "unchanged"
    assert rows[2]["status"] == "changed"
    assert rows[3]["status"] == "removed" and rows[3]["new_hash"] is None
    assert rows[4]["status"] == "added" and rows[4]["old_hash"] is None
    # hashes are the md5 of the null-safe encoding (\x01 + value),
    # present on the existing side
    import hashlib
    assert rows[1]["old_hash"] == hashlib.md5(b"\x01same").hexdigest()
    assert rows[1]["old_hash"] == rows[1]["new_hash"]


def test_corpus_diff_multi_content_cols(spark):
    from sed_spark.ext.corpus import corpus_diff

    # separator prevents ("ab","c") == ("a","bc") collisions
    old = spark.createDataFrame([(1, "ab", "c")], ["doc_id", "a", "b"])
    new = spark.createDataFrame([(1, "a", "bc")], ["doc_id", "a", "b"])
    [r] = corpus_diff(old, new, content_cols=("a", "b")).collect()
    assert r["status"] == "changed"


def test_quantile_by_exact_matches_numpy(spark):
    import numpy as np

    from sed_spark.ext.corpus import quantile_by

    rng = np.random.default_rng(5)
    rows = [
        (int(g), float(v))
        for g in range(3)
        for v in rng.uniform(0, 100, 50 + 10 * g)
    ]
    df = spark.createDataFrame(rows, "g int, v double")
    got = {
        (r["g"], r["prob"]): r["q"]
        for r in quantile_by(df, "v", "g", [0.1, 0.5, 0.9], exact=True).collect()
    }
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        for p in (0.1, 0.5, 0.9):
            want = float(np.percentile(vals, p * 100, method="linear"))
            assert abs(got[(g, p)] - round(want, 6)) < 1e-6, (g, p)
    # approx mode: same shape, values within the group's range and
    # monotone in prob
    ap = {
        (r["g"], r["prob"]): r["q"]
        for r in quantile_by(df, "v", "g", [0.1, 0.5, 0.9]).collect()
    }
    for g, vals in by_g.items():
        assert min(vals) <= ap[(g, 0.1)] <= ap[(g, 0.5)] <= ap[(g, 0.9)] <= max(vals)
    import pytest as pt

    with pt.raises(ValueError, match="probs"):
        quantile_by(df, "v", "g", [])
    with pt.raises(ValueError, match="probs"):
        quantile_by(df, "v", "g", [1.5])


def test_decayed_stats_by_matches_numpy(spark):
    import numpy as np

    from sed_spark.ext.corpus import decayed_stats_by

    rng = np.random.default_rng(9)
    rows = [
        (int(g), float(t), float(v))
        for g in range(3)
        for t, v in zip(rng.uniform(0, 1000, 40), rng.uniform(0, 10, 40))
    ]
    df = spark.createDataFrame(rows, "g int, ts double, v double")
    T = max(t for _, t, _ in rows)
    got = {
        r["g"]: r
        for r in decayed_stats_by(
            df, "g", "ts", "v", half_life=250.0,
        ).collect()
    }
    for g in range(3):
        sub = [(t, v) for gg, t, v in rows if gg == g]
        w = np.array([2.0 ** (-(T - t) / 250.0) for t, _ in sub])
        assert got[g]["n_rows"] == len(sub)
        assert abs(got[g]["decayed_n"] - round(float(w.sum()), 6)) < 1e-5
        assert abs(
            got[g]["decayed_sum"]
            - round(float((w * [v for _, v in sub]).sum()), 6)
        ) < 1e-5
    # quantized audit mode: identical regardless of partitioning
    a = decayed_stats_by(
        df.repartition(13), "g", "ts", "v", half_life=250.0,
        ref_ts=T, quantize_decimals=9,
    ).collect()
    b = decayed_stats_by(
        df.coalesce(1), "g", "ts", "v", half_life=250.0,
        ref_ts=T, quantize_decimals=9,
    ).collect()
    key = lambda rs: sorted((r["g"], r["decayed_n"], r["decayed_sum"]) for r in rs)
    assert key(a) == key(b)
    import pytest as pt

    with pt.raises(ValueError, match="half_life"):
        decayed_stats_by(df, "g", "ts", half_life=0)


def test_corpus_diff_null_content_is_not_unchanged(spark):
    from sed_spark.ext.corpus import corpus_diff

    # NULL vs '' and value shifts across columns must all differ
    old = spark.createDataFrame(
        [(1, "x", None), (2, None, "x"), (3, "", None)],
        "doc_id int, a string, b string",
    )
    new = spark.createDataFrame(
        [(1, None, "x"), (2, None, "x"), (3, None, None)],
        "doc_id int, a string, b string",
    )
    rows = {
        r["doc_id"]: r["status"]
        for r in corpus_diff(old, new, content_cols=("a", "b")).collect()
    }
    assert rows == {1: "changed", 2: "unchanged", 3: "changed"}


def test_robust_stats_by_matches_numpy(spark):
    import numpy as np
    import pytest as pt

    from sed_spark.ext.corpus import robust_stats_by

    rng = np.random.RandomState(11)
    rows = []
    for g in range(4):
        vals = list(np.round(rng.uniform(0, 100, 60), 3))
        vals += [1e6] * g  # g planted outliers
        rows += [(g, float(v)) for v in vals]
    df = spark.createDataFrame(rows, "g int, v double")
    got = {
        r["g"]: r
        for r in robust_stats_by(df, "v", "g", k=3.0, exact=True).collect()
    }
    for g in range(4):
        vals = np.array([v for gg, v in rows if gg == g])
        med = np.median(vals)
        mad = np.median(np.abs(vals - med))
        n_out = int((np.abs(vals - med) > 3.0 * mad).sum())
        assert got[g]["median"] == pt.approx(med, abs=1e-6)
        assert got[g]["mad"] == pt.approx(mad, abs=1e-6)
        assert got[g]["n_rows"] == len(vals)
        assert got[g]["n_outliers"] == n_out
        assert got[g]["n_outliers"] >= g  # the planted spikes are caught

    # constant group: mad = 0, strict > keeps it outlier-free
    const = spark.createDataFrame([(0, 5.0)] * 10, "g int, v double")
    r = robust_stats_by(const, "v", "g", exact=True).collect()[0]
    assert r["median"] == 5.0 and r["mad"] == 0.0 and r["n_outliers"] == 0

    with pt.raises(ValueError, match="k must be"):
        robust_stats_by(const, "v", "g", k=-1)


def test_weighted_cap_sample_matches_reference_and_is_proportional(spark):
    import hashlib
    import math

    from sed_spark.ext.corpus import weighted_cap_sample

    # 2 domains x 60 docs, weights 1..5 by doc_id
    rows = [(i, f"d{i % 2}", float(1 + i % 5)) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, domain string, w double")
    got = {
        r["doc_id"]: r["kept_w"]
        for r in weighted_cap_sample(
            df, cap=10, weight_col="w", salt="t", keep_col="kept_w",
        ).collect()
    }

    def u_of(i):
        h = int(hashlib.md5(f"{i}t".encode()).hexdigest()[:8], 16)
        return h / 2 ** 32 + 0.5 / 2 ** 32

    keys: dict = {}
    for i, dom, w in rows:
        keys.setdefault(dom, []).append((round(math.log(u_of(i)) / w, 6), -i))
    want_kept = set()
    for dom, ks in keys.items():
        for key, neg_i in sorted(ks, reverse=True)[:10]:
            want_kept.add(-neg_i)
    assert {i for i, kept in got.items() if kept} == want_kept
    assert sum(got.values()) == 20  # exactly cap per domain

    # zero/NULL weights never survive
    z = spark.createDataFrame(
        [(1, "d", 0.0), (2, "d", None), (3, "d", 2.0)],
        "doc_id long, domain string, w double",
    )
    kept = weighted_cap_sample(z, cap=3, weight_col="w").collect()
    assert [r["doc_id"] for r in kept] == [3]

    # proportionality: weight-5 docs survive far more often than weight-1
    big = spark.createDataFrame(
        [(i, "d", 5.0 if i % 2 == 0 else 1.0) for i in range(2000)],
        "doc_id long, domain string, w double",
    )
    surv = weighted_cap_sample(big, cap=300, weight_col="w", salt="p")
    n_heavy = surv.filter("w = 5.0").count()
    assert n_heavy > 200  # expected ~250 of 300 under w=5:1 odds

    import pytest as pt

    with pt.raises(ValueError, match="cap"):
        weighted_cap_sample(big, cap=0, weight_col="w")


def test_robust_stats_by_keeps_null_key_group(spark):
    from sed_spark.ext.corpus import robust_stats_by

    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), (None, 3.0), ("a", 5.0), ("a", 7.0)],
        "g string, v double",
    )
    got = {r["g"]: r for r in robust_stats_by(df, "v", "g", exact=True).collect()}
    assert set(got) == {None, "a"}
    assert got[None]["median"] == 2.0 and got[None]["mad"] == 1.0
    assert got[None]["n_rows"] == 3
    assert got["a"]["median"] == 6.0


def test_weighted_cap_sample_null_ids_never_survive_xxhash(spark):
    from sed_spark.ext.corpus import weighted_cap_sample

    df = spark.createDataFrame(
        [(None, "d", 5.0), (None, "d", 5.0), (1, "d", 1.0), (2, "d", 1.0)],
        "doc_id long, domain string, w double",
    )
    kept = weighted_cap_sample(
        df, cap=3, weight_col="w", method="xxhash64",
    ).collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 2]


def test_top_items_by_exact_ranks_and_ties(spark):
    from sed_spark.ext.corpus import top_items_by

    rows = (
        [("u1", "a")] * 5 + [("u1", "b")] * 5 + [("u1", "c")] * 2
        + [("u2", "x")] * 3 + [("u2", None)] * 4
        + [("u3", "only")]
    )
    df = spark.createDataFrame(rows, "grp string, item string")
    got = {
        (r["grp"], r["rank"]): (r["item"], r["n"])
        for r in top_items_by(df, "grp", "item", k=2).collect()
    }
    # tie a/b at 5 breaks by item ASC; NULL item counts but ranks after
    # real items on ties (here it wins on weight)
    assert got[("u1", 1)] == ("a", 5)
    assert got[("u1", 2)] == ("b", 5)
    assert got[("u2", 1)] == (None, 4)
    assert got[("u2", 2)] == ("x", 3)
    assert got[("u3", 1)] == ("only", 1)
    assert ("u3", 2) not in got


def test_top_items_by_weighted_and_validation(spark):
    import pytest as pt

    from sed_spark.ext.corpus import top_items_by

    df = spark.createDataFrame(
        [("g", "a", 1.0), ("g", "a", 1.5), ("g", "b", 10.0),
         ("g", "c", None)],
        "grp string, item string, w double",
    )
    got = [
        (r["item"], r["n"], r["rank"])
        for r in top_items_by(df, "grp", "item", k=3, weight_col="w")
        .orderBy("rank").collect()
    ]
    # sum(NULL weights) is NULL -> ranks last
    assert got == [("b", 10.0, 1), ("a", 2.5, 2), ("c", None, 3)]
    with pt.raises(ValueError, match="k must be"):
        top_items_by(df, "grp", "item", k=0)


def test_collocations_match_python_reference(spark):
    from sed_spark.ext.text import collocations

    docs = [
        (0, "new york is big new york is old"),
        (1, "new york and new jersey"),
        (2, "big apple is new"),
    ]
    texts = [t for _, t in docs]
    words = [w for t in texts for w in t.split(" ")]
    N = len(words)
    uni = {}
    for w in words:
        uni[w] = uni.get(w, 0) + 1
    bi = {}
    for t in texts:
        ws = t.split(" ")
        for i in range(len(ws) - 1):
            bi[(ws[i], ws[i + 1])] = bi.get((ws[i], ws[i + 1]), 0) + 1
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["w1"], r["w2"]): (r["n_pair"], r["n_w1"], r["n_w2"], r["lift"])
        for r in collocations(df, min_count=2).collect()
    }
    want = {
        (a, b): c for (a, b), c in bi.items() if c >= 2
    }
    assert set(got) == set(want)
    for (a, b), c in want.items():
        lift = c * float(N) / uni[a] / uni[b]
        assert got[(a, b)][:3] == (c, uni[a], uni[b])
        assert got[(a, b)][3] == lift, (a, b)
    # "new york" (3x, tight) must out-lift any pair of ubiquitous words
    assert got[("new", "york")][3] > 1.0
    import pytest as pt

    with pt.raises(ValueError, match="min_count"):
        collocations(df, min_count=0)
