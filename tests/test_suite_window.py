"""Suite-size regression guard.

The driver's per-round CORRECTNESS record is a bounded 50-row window:
``CORRECTNESS_r07.json`` held exactly 50 entries while the suite
registered 51, and the 51st query (``correlated_subqueries``) shipped
with no hard cross-engine signal. The standing rule since round 4 is to
fold new operator shapes into existing rows as tag-union branches; this
test makes a 51st registration a loud failure instead of a silent
evidence gap.
"""

from __future__ import annotations

DRIVER_CORRECTNESS_WINDOW = 50


def test_suite_fits_driver_correctness_window():
    from sed_spark import suite

    qs = suite.queries()
    assert len(qs) <= DRIVER_CORRECTNESS_WINDOW, (
        f"suite registers {len(qs)} queries but the driver CORRECTNESS "
        f"window records only {DRIVER_CORRECTNESS_WINDOW}; queries past the "
        "window get NO verified row. Fold the new shapes into an existing "
        "row as a tag-union branch (see semi_anti_join's correlated "
        "branches) instead of registering a new one."
    )


def test_every_suite_row_has_an_oracle_or_is_documented():
    """Every queries() entry should carry a DuckDB oracle; rows without
    one only get the driver's weaker rows-only check."""
    from sed_spark import suite

    qs, oracles = suite.queries(), suite.oracle_sql()
    missing = sorted(set(qs) - set(oracles))
    # stream_dedup_replay is replay-checked (non-SQL-expressible
    # stateful streaming); everything else must pair with an oracle
    allowed_rows_only = {"stream_dedup_replay"}
    assert set(missing) <= allowed_rows_only, (
        f"suite rows without a DuckDB oracle: {missing} — add oracle SQL "
        "or document the exemption here"
    )


def test_warm_fits_populates_every_trainer_cache(spark):
    """warm_fits (round 10) must hit the same caches text_metrics reads,
    so a bench rep after it measures operators, not trainer cold-start."""
    from sed_spark.suite import ext as sx

    secs = sx.warm_fits(spark, "/root/testdata/sf0.01")
    assert set(secs) == {"bpe", "unigram", "wordpiece", "classifier", "dsir"}
    assert all(v >= 0 for v in secs.values())
    sf = "/root/testdata/sf0.01"
    assert sf in sx._BPE_FIT_CACHE
    assert sf in sx._UNIGRAM_FIT_CACHE
    assert sf in sx._WORDPIECE_FIT_CACHE
    assert sf in sx._TRAINED_CLS_CACHE
    assert sf in sx._DSIR_FIT_CACHE
    # a second call is pure cache hits — near-instant
    import time

    t0 = time.perf_counter()
    sx.warm_fits(spark, sf)
    assert time.perf_counter() - t0 < 5.0
