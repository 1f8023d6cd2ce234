"""Property-based check of concat-and-chunk sequence packing.

The two-phase prefix sum's failure modes live at bucket seams (a bucket's
prefix must equal the exact sum of everything before it), in sparse /
non-contiguous id spaces (empty buckets contribute zero), and at
degenerate sizes (single doc, zero-token docs, budget smaller than one
document). Hypothesis drives those against the single-stream Python
prefix sum as the oracle.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    toks=st.lists(st.integers(0, 5000), min_size=1, max_size=120),
    budget=st.integers(1, 4096),
    n_buckets=st.integers(1, 40),
    id_stride=st.integers(1, 1000),
    seed=st.integers(0, 2**31 - 1),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pack_matches_single_stream_prefix_sum(
    spark, toks, budget, n_buckets, id_stride, seed,
):
    import numpy as np

    from sed_spark.ext.text import pack_sequences

    rng = np.random.default_rng(seed)
    # non-contiguous, irregular id space: packing order is id order, not
    # row position — shuffle the input rows to prove it
    ids = np.cumsum(rng.integers(1, id_stride + 1, size=len(toks)))
    rows = list(zip((int(i) for i in ids), map(int, toks)))
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"]).repartition(5)

    got = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"])
        for r in pack_sequences(
            df, "n_tok", budget=budget, n_buckets=n_buckets,
        ).collect()
    }
    assert len(got) == len(rows)
    start = 0
    for i, t in sorted(dict(rows).items()):
        assert got[i] == (start // budget, start % budget), (i, budget)
        start += t
