"""Property test: asof_join ≡ pandas merge_asof (backward,
allow_exact_matches) over randomized inputs."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hyppo_worker_spark.operators.asof import asof_join


@st.composite
def asof_case(draw):
    n_keys = draw(st.integers(1, 3))
    left = []
    right = []
    for k in range(n_keys):
        l_times = draw(st.lists(st.integers(0, 50), min_size=0, max_size=8))
        # unique right timestamps per key: merge_asof tie-break on
        # duplicate right keys is input-order dependent, ours is not
        r_times = draw(
            st.lists(st.integers(0, 50), min_size=0, max_size=8, unique=True)
        )
        left += [(k, t) for t in l_times]
        right += [(k, t, float(k * 1000 + t)) for t in r_times]
    return left, right


def test_asof_null_right_values_propagate(spark):
    """A matched right row with NULL in one value column must yield
    NULL — not resurrect a stale value from an older right row — and
    all carried values must come from the SAME right row."""
    left = spark.createDataFrame([(1, 10), (1, 20), (1, 30)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 5, 100.0, "a"), (1, 15, None, "b"), (1, 25, 300.0, None)],
        "k int, t int, v double, s string",
    )
    got = {
        r.t: (r.v_right, r.s_right)
        for r in asof_join(
            left, right, on="t", by="k", value_cols=["v", "s"]
        ).collect()
    }
    # t=10 matches right@5 → (100.0, 'a'); t=20 matches right@15 whose v
    # is NULL → (None, 'b'), NOT (100.0, 'b'); t=30 matches right@25
    # whose s is NULL → (300.0, None), NOT (300.0, 'b').
    assert got == {10: (100.0, "a"), 20: (None, "b"), 30: (300.0, None)}


def test_asof_no_match_yields_all_null(spark):
    left = spark.createDataFrame([(1, 1)], "k int, t int")
    right = spark.createDataFrame([(1, 5, 9.0)], "k int, t int, v double")
    row = asof_join(left, right, on="t", by="k", value_cols=["v"]).collect()[0]
    assert row.v_right is None


@pytest.mark.slow
@given(asof_case())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_asof_matches_pandas(spark, case):
    left_rows, right_rows = case
    if not left_rows:
        return
    left = spark.createDataFrame(left_rows, "k int, t int")
    if right_rows:
        right = spark.createDataFrame(right_rows, "k int, t int, v double")
    else:
        right = spark.createDataFrame([], "k int, t int, v double")

    got = {
        (r.k, r.t, r.v_right)
        for r in asof_join(left, right, on="t", by="k", value_cols=["v"]).collect()
    }

    lpdf = pd.DataFrame(left_rows, columns=["k", "t"]).sort_values("t", kind="stable")
    rpdf = pd.DataFrame(right_rows, columns=["k", "t", "v"]).sort_values(
        "t", kind="stable"
    )
    if rpdf.empty:
        expected = {(k, t, None) for k, t in left_rows}
    else:
        merged = pd.merge_asof(
            lpdf, rpdf, on="t", by="k", direction="backward", allow_exact_matches=True
        )
        expected = {
            (int(r.k), int(r.t), None if pd.isna(r.v) else float(r.v))
            for r in merged.itertuples()
        }
    assert got == expected


def test_asof_value_columns_needing_quoting(spark):
    """Value column names with spaces/dots must survive the null-struct
    cast (built programmatically, not via a DDL string)."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame([(1, 10)], "k int, t int")
    right = spark.createDataFrame([(1, 5, 2.5)], "k int, t int, v double")
    right = right.select("k", "t", F.col("v").alias("price usd"))
    out = asof_join(left, right, on="t", by="k").collect()
    assert out[0]["price usd_right"] == 2.5
