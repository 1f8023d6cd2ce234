"""Property-based check of the keyless as-of join.

The keyless path range-buckets the ``on`` axis, fills within buckets,
and repairs seams with a boundary-carry table — the places where bugs
hide are bucket seams, duplicate timestamps, null right values, and
tiny/degenerate inputs. Hypothesis drives those against pandas
``merge_asof`` (with null-skipping applied to match ignorenulls
semantics) as the independent oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    n_left=st.integers(1, 80),
    n_right=st.integers(1, 25),
    span=st.floats(1.0, 1e6),
    null_every=st.integers(0, 3),
    direction=st.sampled_from(["backward", "forward"]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_keyless_asof_matches_pandas(
    spark, n_left, n_right, span, null_every, direction, seed,
):
    from sed_spark.dfops import asof_join

    rng = np.random.default_rng(seed)
    # duplicate left timestamps and right timestamps colliding with left
    # ones exercise the tie rule (right sorts before left at equal on)
    left_ts = np.round(rng.uniform(0, span, n_left), 2)
    left_ts[rng.integers(0, n_left)] = left_ts[0]  # forced duplicate
    right_ts = np.round(rng.uniform(0, span, n_right), 2)
    right_ts[0] = left_ts[0]  # forced exact tie with a left row
    left = pd.DataFrame({"ts": left_ts, "lid": np.arange(n_left)})
    vals = rng.normal(size=n_right)
    if null_every:
        vals[::null_every] = np.nan
    right = (
        pd.DataFrame({"ts": right_ts, "v": vals})
        .drop_duplicates(["ts"])
        .sort_values("ts")
    )
    got = (
        asof_join(
            spark.createDataFrame(left).repartition(7),
            spark.createDataFrame(right).repartition(3),
            on="ts",
            direction=direction,
        )
        .orderBy("lid")
        .toPandas()
    )
    # oracle: merge_asof against the null-skipped right table (matching
    # the engine's last(..., ignorenulls) semantics)
    rr = right.dropna(subset=["v"])
    want = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        rr,
        on="ts",
        direction=direction,
    ).sort_values("lid")
    np.testing.assert_array_equal(
        got["v"].isna().to_numpy(),
        want["v"].isna().to_numpy(),
        err_msg=f"null placement ({direction})",
    )
    np.testing.assert_allclose(
        got["v"].dropna().to_numpy(),
        want["v"].dropna().to_numpy(),
        err_msg=f"values ({direction})",
    )
