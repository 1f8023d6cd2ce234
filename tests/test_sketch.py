"""Count-Min / HyperLogLog sketches vs pure-Python references."""

from __future__ import annotations

import hashlib
import math

import pytest

from sed_spark.ext import sketch

W, D, P = 64, 3, 6


def h32(key, salt):
    return int(hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:8], 16)


def ref_cms(weighted, width=W, depth=D):
    cells: dict = {}
    for k, c in weighted:
        for j in range(depth):
            b = h32(k, f"cms:{j}") % width
            cells[(j, b)] = cells.get((j, b), 0) + c
    return cells


def ref_hll_regs(keys, p=P):
    regs: dict = {}
    for k in keys:
        h = h32(k, "hll")
        w = h % (1 << (32 - p))
        reg = h >> (32 - p)
        rho = (32 - p) + 1 - w.bit_length() if w > 0 else (32 - p) + 1
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


WEIGHTED = [("apple", 10), ("banana", 5), ("cherry", 1), ("apple2", 7)]


def test_cms_build_matches_reference(spark):
    df = spark.createDataFrame(WEIGHTED, ["key", "cnt"])
    built = sketch.cms_build(df, "key", weight_col="cnt", width=W, depth=D)
    got = {(r["depth"], r["bucket"]): r["cnt"] for r in built.collect()}
    assert got == ref_cms(WEIGHTED)


def test_cms_query_is_min_over_rows_and_zero_for_absent(spark):
    df = spark.createDataFrame(WEIGHTED, ["key", "cnt"])
    built = sketch.cms_build(df, "key", weight_col="cnt", width=W, depth=D)
    cells = ref_cms(WEIGHTED)

    def expect(k):
        return min(cells.get((j, h32(k, f"cms:{j}") % W), 0) for j in range(D))

    got = {
        r["key"]: r["est"]
        for r in sketch.cms_query(
            built, ["apple", "banana", "never-seen"], width=W, depth=D,
        ).collect()
    }
    assert got == {k: expect(k) for k in ["apple", "banana", "never-seen"]}
    # CMS never underestimates a present key
    assert got["apple"] >= 10 and got["banana"] >= 5


def test_cms_merge_equals_build_on_union(spark):
    a = spark.createDataFrame(WEIGHTED[:2], ["key", "cnt"])
    b = spark.createDataFrame(WEIGHTED[2:] + [("apple", 3)], ["key", "cnt"])
    merged = sketch.cms_merge(
        sketch.cms_build(a, "key", weight_col="cnt", width=W, depth=D),
        sketch.cms_build(b, "key", weight_col="cnt", width=W, depth=D),
    )
    got = {(r["depth"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert got == ref_cms(WEIGHTED + [("apple", 3)])


def test_cms_unweighted_counts_rows(spark):
    df = spark.createDataFrame(
        [("x",), ("x",), ("y",)], ["key"],
    )
    got = {
        (r["depth"], r["bucket"]): r["cnt"]
        for r in sketch.cms_build(df, "key", width=W, depth=D).collect()
    }
    assert got == ref_cms([("x", 2), ("y", 1)])


def test_hll_registers_match_reference_and_collapse_duplicates(spark):
    keys = [f"key{i}" for i in range(2000)]
    df = spark.createDataFrame([(k,) for k in keys] * 2, ["k"])
    got = {
        r["register"]: r["max_rho"]
        for r in sketch.hll_registers(df, "k", p=P).collect()
    }
    assert got == ref_hll_regs(keys)


def test_hll_estimate_matches_reference_formula(spark):
    keys = [f"key{i}" for i in range(2000)]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    regs = sketch.hll_registers(df, "k", p=P)
    est = sketch.hll_estimate(regs, p=P).collect()[0]
    m = 1 << P
    rr = ref_hll_regs(keys)
    s = (m - len(rr)) + sum(2.0 ** -v for v in rr.values())
    raw = sketch.hll_alpha(P) * m * m / s
    assert est["raw_est"] == round(raw, 6)
    v = m - len(rr)
    expect = m * math.log(m / v) if (raw <= 2.5 * m and v > 0) else raw
    assert abs(est["estimate"] - expect) < 1e-5
    # within the ~1.04/sqrt(m) HLL error band (generous 4-sigma)
    assert abs(est["estimate"] - len(keys)) / len(keys) < 4 * 1.04 / math.sqrt(m)


def test_hll_merge_equals_registers_on_union(spark):
    a = [f"a{i}" for i in range(500)]
    b = [f"b{i}" for i in range(500)] + a[:100]
    da = spark.createDataFrame([(k,) for k in a], ["k"])
    db = spark.createDataFrame([(k,) for k in b], ["k"])
    merged = sketch.hll_merge(
        sketch.hll_registers(da, "k", p=P),
        sketch.hll_registers(db, "k", p=P),
    )
    got = {r["register"]: r["max_rho"] for r in merged.collect()}
    assert got == ref_hll_regs(set(a) | set(b))


def test_hll_small_range_uses_linear_counting(spark):
    # 3 keys in 64 registers: raw estimate far below 2.5m, V > 0
    df = spark.createDataFrame([("a",), ("b",), ("c",)], ["k"])
    regs = sketch.hll_registers(df, "k", p=P)
    est = sketch.hll_estimate(regs, p=P).collect()[0]
    m = 1 << P
    v = m - est["n_registers_set"]
    assert est["estimate"] == pytest.approx(m * math.log(m / v), abs=1e-5)


def test_sketch_param_validation(spark):
    df = spark.createDataFrame([("a", 1)], ["key", "cnt"])
    with pytest.raises(ValueError, match="width"):
        sketch.cms_build(df, "key", width=0)
    with pytest.raises(ValueError, match="non-empty"):
        sketch.cms_query(df, [])
    with pytest.raises(ValueError, match="p must"):
        sketch.hll_registers(df, "key", p=2)


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

BLOOM_M, BLOOM_K = 256, 3


def ref_bloom_bits(keys, m=BLOOM_M, k=BLOOM_K):
    return {h32(key, f"bloom:{j}") % m for key in keys for j in range(k)}


def test_bloom_build_matches_reference(spark):
    keys = [f"doc{i}" for i in range(50)]
    df = spark.createDataFrame([(k,) for k in keys], ["key"])
    got = {r["bit"] for r in sketch.bloom_build(
        df, "key", m_bits=BLOOM_M, k_hashes=BLOOM_K).collect()}
    assert got == ref_bloom_bits(keys)


def test_bloom_probe_no_false_negatives_and_bounded_fp(spark):
    inserted = [f"doc{i}" for i in range(50)]
    bloom = sketch.bloom_build(
        spark.createDataFrame([(k,) for k in inserted], ["key"]),
        "key", m_bits=BLOOM_M, k_hashes=BLOOM_K,
    )
    probes = inserted[:10] + [f"new{i}" for i in range(200)]
    got = {
        r["key"]: r["maybe_seen"]
        for r in sketch.bloom_probe(
            spark.createDataFrame([(k,) for k in probes], ["key"]),
            bloom, "key", m_bits=BLOOM_M, k_hashes=BLOOM_K,
        ).collect()
    }
    # every inserted key MUST report maybe_seen (no false negatives)
    assert all(got[k] == 1 for k in inserted[:10])
    # reference-exact: maybe_seen iff all k bits are in the bit set
    bits = ref_bloom_bits(inserted)
    for k in probes:
        want = int(all(h32(k, f"bloom:{j}") % BLOOM_M in bits
                       for j in range(BLOOM_K)))
        assert got[k] == want
    # with 50*3 bits of 256, the fp rate is (bits/m)^k — loose sanity cap
    fp = sum(got[k] for k in probes[10:])
    assert fp / 200 < 0.5


def test_cms_query_df_matches_literal_query(spark):
    # the DataFrame-keyed probe must agree with the literal-key probe
    # exactly, in both join orientations, and rename to the caller's col
    keys = [f"k{i % 9}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], ["key"])
    cms = sketch.cms_build(df, "key", width=64, depth=3)
    probes = ["k0", "k5", "absent"]
    lit = {r["key"]: r["est"] for r in sketch.cms_query(
        cms, probes, width=64, depth=3).collect()}
    pdf = spark.createDataFrame(
        [(p,) for p in probes + probes], ["term"],  # dups collapse
    )
    for bcast in (True, False):
        got = {
            r["term"]: r["est"]
            for r in sketch.cms_query_df(
                cms, pdf, "term", width=64, depth=3, broadcast_keys=bcast,
            ).collect()
        }
        assert got == lit
    import pytest as _pt

    with _pt.raises(ValueError, match="width"):
        sketch.cms_query_df(cms, pdf, "term", width=0)


def test_hll_grouped_matches_global_per_group(spark):
    # per-group registers/estimate must equal running the GLOBAL hll on
    # each group's slice, and merge-by(a, b) == build on union
    rows = [(f"type{i % 3}", f"user{i % 40}") for i in range(400)]
    df = spark.createDataFrame(rows, ["event_type", "user_id"])
    gregs = sketch.hll_registers_by(df, ["event_type"], "user_id", p=6)
    gest = {
        r["event_type"]: (r["n_registers_set"], r["estimate"])
        for r in sketch.hll_estimate_by(gregs, ["event_type"], p=6).collect()
    }
    assert set(gest) == {"type0", "type1", "type2"}
    for et in gest:
        sl = df.filter(f"event_type = '{et}'")
        regs = sketch.hll_registers(sl, "user_id", p=6)
        want = sketch.hll_estimate(regs, p=6).collect()[0]
        assert gest[et] == (want["n_registers_set"], want["estimate"])

    a = df.filter("event_type != 'type2'")
    b = df.filter("event_type = 'type2'")
    merged = sketch.hll_merge_by(
        sketch.hll_registers_by(a, ["event_type"], "user_id", p=6),
        sketch.hll_registers_by(b, ["event_type"], "user_id", p=6),
        ["event_type"],
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, gregs.collect()),
    )
    import pytest as _pt

    with _pt.raises(ValueError, match="group_cols"):
        sketch.hll_registers_by(df, [], "user_id")
    with _pt.raises(ValueError, match="group_cols"):
        sketch.hll_estimate_by(gregs, [])


def test_bloom_probe_preserves_duplicate_rows(spark):
    # regression: grouping on the full column set silently deduplicated
    # identical input rows — the probe must return one row per input row
    bloom = sketch.bloom_build(
        spark.createDataFrame([("doc0",)], ["key"]),
        "key", m_bits=BLOOM_M, k_hashes=BLOOM_K,
    )
    probes = spark.createDataFrame(
        [("doc0",), ("doc0",), ("new1",), ("new1",), ("new1",)], ["key"],
    )
    rows = sketch.bloom_probe(
        probes, bloom, "key", m_bits=BLOOM_M, k_hashes=BLOOM_K,
    ).collect()
    assert len(rows) == 5
    assert sorted(r["key"] for r in rows) == sorted(
        ["doc0", "doc0", "new1", "new1", "new1"],
    )
    assert all(r["maybe_seen"] == 1 for r in rows if r["key"] == "doc0")


def test_bloom_merge_equals_build_on_union(spark):
    a = [f"a{i}" for i in range(30)]
    b = [f"b{i}" for i in range(30)]
    da = spark.createDataFrame([(k,) for k in a], ["key"])
    db = spark.createDataFrame([(k,) for k in b], ["key"])
    merged = sketch.bloom_merge(
        sketch.bloom_build(da, "key", m_bits=BLOOM_M, k_hashes=BLOOM_K),
        sketch.bloom_build(db, "key", m_bits=BLOOM_M, k_hashes=BLOOM_K),
    )
    assert {r["bit"] for r in merged.collect()} == ref_bloom_bits(a + b)


def test_bloom_param_validation(spark):
    df = spark.createDataFrame([("a",)], ["key"])
    import pytest as _pt

    with _pt.raises(ValueError, match="m_bits"):
        sketch.bloom_build(df, "key", m_bits=1)
    with _pt.raises(ValueError, match="m_bits"):
        sketch.bloom_probe(df, df.selectExpr("1 as bit"), "key", k_hashes=0)


# ---------------------------------------------------------------- KMV


def ref_kmv(keys, k, salt="kmv"):
    return sorted({h32(x, salt) for x in keys})[:k]


def ref_kmv_est(kmv, k):
    if len(kmv) < k:
        return float(len(kmv))
    return float((k - 1) * 4294967296) / (kmv[k - 1] + 1.0)


def test_kmv_sketch_matches_reference(spark):
    keys = [f"u{i}" for i in range(500)] + ["u0", "u1"]  # dups collapse
    df = spark.createDataFrame([(x,) for x in keys], "key string")
    got = sketch.kmv_sketch(df, "key", k=64).collect()[0]["kmv"]
    assert got == ref_kmv(keys, 64)


def test_kmv_estimate_exact_when_small_and_close_when_big(spark):
    small = spark.createDataFrame([(f"k{i}",) for i in range(20)], "key string")
    row = sketch.kmv_estimate(sketch.kmv_sketch(small, "key", k=64), k=64)
    r = row.collect()[0]
    assert r["n_hashes"] == 20 and r["estimate"] == 20.0

    n = 5000
    big = spark.createDataFrame([(f"k{i}",) for i in range(n)], "key string")
    est = sketch.kmv_estimate(
        sketch.kmv_sketch(big, "key", k=256), k=256,
    ).collect()[0]["estimate"]
    assert est == pytest.approx(
        ref_kmv_est(ref_kmv([f"k{i}" for i in range(n)], 256), 256),
    )
    assert abs(est - n) / n < 0.2  # ~1/sqrt(256) relative error


def test_kmv_merge_equals_sketch_of_union(spark):
    a_keys = [f"a{i}" for i in range(300)]
    b_keys = [f"b{i}" for i in range(300)] + a_keys[:100]
    a = sketch.kmv_sketch(
        spark.createDataFrame([(x,) for x in a_keys], "key string"), "key", k=64,
    )
    b = sketch.kmv_sketch(
        spark.createDataFrame([(x,) for x in b_keys], "key string"), "key", k=64,
    )
    merged = sketch.kmv_merge(a, b, k=64).collect()[0]["kmv"]
    assert merged == ref_kmv(a_keys + b_keys, 64)


def test_kmv_set_estimates(spark):
    # |A| = 600, |B| = 600, |A ∩ B| = 200 -> jaccard = 0.2
    shared = [f"s{i}" for i in range(200)]
    a_keys = shared + [f"a{i}" for i in range(400)]
    b_keys = shared + [f"b{i}" for i in range(400)]
    k = 128
    a = sketch.kmv_sketch(
        spark.createDataFrame([(x,) for x in a_keys], "key string"), "key", k=k,
    )
    b = sketch.kmv_sketch(
        spark.createDataFrame([(x,) for x in b_keys], "key string"), "key", k=k,
    )
    r = sketch.kmv_set_estimates(a, b, k=k).collect()[0]
    assert r["n_union_hashes"] == k  # union (1000) overflows the sketch
    assert abs(r["union_est"] - 1000) / 1000 < 0.3
    assert abs(r["jaccard_est"] - 0.2) < 0.15
    assert abs(r["intersect_est"] - 200) / 200 < 0.6

    # fully-captured union -> everything exact
    sa = sketch.kmv_sketch(
        spark.createDataFrame([(f"s{i}",) for i in range(30)], "key string"),
        "key", k=k,
    )
    sb = sketch.kmv_sketch(
        spark.createDataFrame([(f"s{i}",) for i in range(10, 40)], "key string"),
        "key", k=k,
    )
    rx = sketch.kmv_set_estimates(sa, sb, k=k).collect()[0]
    assert rx["n_union_hashes"] == 40 and rx["n_common"] == 20
    assert rx["intersect_est"] == 20.0
    assert rx["jaccard_est"] == pytest.approx(0.5)
    assert rx["union_est"] == 40.0


def test_kmv_by_per_group(spark):
    rows = [(g, f"{g}-k{i % (20 * (g + 1))}") for g in range(3) for i in range(200)]
    df = spark.createDataFrame(rows, "g int, key string")
    got = {
        r["g"]: r["kmv"]
        for r in sketch.kmv_by(df, "g", "key", k=16).collect()
    }
    for g in range(3):
        expect = ref_kmv({f"{g}-k{i % (20 * (g + 1))}" for i in range(200)}, 16)
        assert got[g] == expect
    # estimate passes group columns through
    est = sketch.kmv_estimate(sketch.kmv_by(df, "g", "key", k=16), k=16)
    assert set(est.columns) == {"g", "n_hashes", "estimate"}


def test_kmv_param_validation(spark):
    df = spark.createDataFrame([("x",)], "key string")
    with pytest.raises(ValueError, match="k must be"):
        sketch.kmv_sketch(df, "key", k=1)
    with pytest.raises(ValueError, match="k must be"):
        sketch.kmv_by(df, "g", "key", k=0)


def test_kmv_excludes_null_keys(spark):
    rows = [(0, None)] + [(0, f"k{i}") for i in range(30)]
    df = spark.createDataFrame(rows, "g int, key string")
    # global sketch: NULL contributes no hash
    kmv = sketch.kmv_sketch(df, "key", k=16).collect()[0]["kmv"]
    assert kmv == ref_kmv([f"k{i}" for i in range(30)], 16)
    # grouped: NULL must not burn a rank slot and shrink the sketch
    grouped = sketch.kmv_by(df, "g", "key", k=16).collect()[0]["kmv"]
    assert grouped == kmv


def test_kmv_by_all_null_group_gets_empty_sketch(spark):
    df = spark.createDataFrame(
        [("empty", None), ("empty", None), ("live", "k1"), (None, "k2")],
        "g string, key string",
    )
    got = {r["g"]: r["kmv"] for r in sketch.kmv_by(df, "g", "key", k=8).collect()}
    assert set(got) == {"empty", "live", None}
    assert got["empty"] == []  # distinct-reach 0, group still present
    assert got["live"] == ref_kmv(["k1"], 8)
    assert got[None] == ref_kmv(["k2"], 8)  # NULL GROUP keeps its sketch


def test_bloom_reduced_join_identical_to_plain_join(spark):
    # semi-join reduction must be row-identical to the plain join for
    # every supported how — NULL keys, duplicate keys, and high-fp tiny
    # bitmaps included (false positives only route rows into the exact
    # join; false negatives cannot exist)
    from sed_spark.ext.sketch import bloom_reduced_join

    left = spark.createDataFrame(
        [(i % 50, f"l{i}") for i in range(200)]
        + [(None, "lnull"), (None, "lnull2")],
        "k int, lv string",
    )
    right = spark.createDataFrame(
        [(i, f"r{i}") for i in range(0, 30, 3)] + [(None, "rnull")],
        "k int, rv string",
    )

    def srt(df):
        return sorted(tuple(repr(x) for x in r) for r in df.collect())

    for how in ("inner", "left", "left_semi", "left_anti"):
        plain = left.join(right, ["k"], how)
        got = bloom_reduced_join(left, right, "k", how=how, m_bits=256)
        assert got.columns == plain.columns, how
        assert srt(got) == srt(plain), how
        # saturated 32-bit filter: everything routes to the exact join,
        # rows still identical
        got_fp = bloom_reduced_join(
            left, right, "k", how=how, m_bits=32, k_hashes=2,
        )
        assert srt(got_fp) == srt(plain), how


def test_bloom_probe_expr_no_false_negatives_and_null(spark):
    from pyspark.sql import functions as F

    from sed_spark.ext.sketch import bloom_bitmap, bloom_probe_expr

    right = spark.createDataFrame(
        [(i,) for i in range(0, 100, 7)], "k int",
    )
    words = bloom_bitmap(right, "k", m_bits=512)
    assert len(words) == 512 // 32
    probe = spark.createDataFrame(
        [(i,) for i in range(100)] + [(None,)], "k int",
    )
    got = {
        r["k"]: r["p"]
        for r in probe.select(
            "k", bloom_probe_expr(F.col("k"), words).alias("p"),
        ).collect()
    }
    for i in range(0, 100, 7):
        assert got[i] is True, i  # members always test maybe-present
    assert got[None] is None  # NULL key -> NULL, never a match claim


def test_bloom_reduced_join_validation(spark):
    import pytest as pt

    from sed_spark.ext.sketch import bloom_bitmap, bloom_reduced_join

    df = spark.createDataFrame([(1, "a")], "k int, v string")
    with pt.raises(ValueError, match="how must be"):
        bloom_reduced_join(df, df.select("k"), "k", how="right")
    with pt.raises(ValueError, match="multiple of 32"):
        bloom_bitmap(df, "k", m_bits=100)
    # how="left" pads right columns by name onto the pass-through
    # branch, so a shared non-key name must be rejected up front (a
    # plain left join would keep both as ambiguous duplicates)
    with pt.raises(ValueError, match="disjoint.*\\['v'\\]"):
        bloom_reduced_join(df, df, "k", how="left")


def test_bloom_m_bits_sizing_formula():
    import math

    import pytest as pt

    from sed_spark.ext.sketch import bloom_m_bits

    # the docstring formula, rounded up to the packed-word unit
    want = 1e6 * -math.log(0.01) / (math.log(2.0) ** 2)
    got = bloom_m_bits(1e6, fp_target=0.01)
    assert got % 32 == 0 and 0 <= got - want < 32
    # monotone in n; floored and capped at the documented budget
    assert bloom_m_bits(1e6) > bloom_m_bits(1e4) > bloom_m_bits(10)
    assert bloom_m_bits(10) == 1 << 14
    assert bloom_m_bits(1e9) == 1 << 24
    assert bloom_m_bits(1e6, max_m_bits=1 << 20) == 1 << 20
    with pt.raises(ValueError, match="fp_target"):
        bloom_m_bits(100, fp_target=1.5)
    with pt.raises(ValueError, match="max_m_bits"):
        bloom_m_bits(100, max_m_bits=1000)


def test_bloom_reduced_join_auto_sizes_and_warns_on_saturation(spark):
    # a 120k-key right side must auto-size past the old fixed 2^20
    # default (which would sit near fp 0.5 at the old 1e6-key fixture —
    # 120k keys still need >2^20 bits at fp 0.01, proving the same
    # claim at ~1/8 the session cost; the 1e6-key form OOM'd the shared
    # session's broadcast budget when run late in the full suite) with
    # no warning; an explicitly undersized bitmap with
    # check_saturation=True fires the saturation warning; an explicit
    # m_bits WITHOUT the flag skips the HLL pass entirely (stays lazy,
    # so no warning even though saturated) — and every form stays
    # row-identical to the plain join (no false negatives)
    import math
    import warnings

    from pyspark.sql import functions as F

    from sed_spark.ext.sketch import bloom_m_bits, bloom_reduced_join

    n_keys = 120_000
    right = spark.range(0, n_keys).select((F.col("id") * 3).alias("k"))
    left = spark.range(0, 3000).select(F.col("id").alias("k"))
    auto_m = bloom_m_bits(n_keys)
    assert auto_m > 1 << 20  # the r9 fixed default is too small here
    assert (1.0 - math.exp(-4 * n_keys / auto_m)) ** 4 < 0.05
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # auto sizing must NOT warn
        got = bloom_reduced_join(left, right, "k", how="left_semi")
    plain = left.join(right, ["k"], "left_semi")
    expect = sorted(r["k"] for r in plain.collect())
    assert sorted(r["k"] for r in got.collect()) == expect
    # explicit m_bits + opt-in check: saturated 2^14 bitmap warns
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        small = bloom_reduced_join(
            left, right, "k", how="left_semi",
            m_bits=1 << 14, check_saturation=True,
        )
    assert any("prunes almost nothing" in str(w.message) for w in caught)
    assert sorted(r["k"] for r in small.collect()) == expect
    # explicit m_bits, no flag: lazy — the HLL pass is skipped, so the
    # same saturated bitmap raises nothing even under error-filters
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        lazy = bloom_reduced_join(
            left, right, "k", how="left_semi", m_bits=1 << 14,
        )
    assert sorted(r["k"] for r in lazy.collect()) == expect
