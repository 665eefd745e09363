"""Operator-level decontamination tests: strategy equivalence is the
contract (broadcast and shuffle are physical choices, not semantics)."""

import pytest
from pyspark.sql import functions as F

from hyppo_worker_spark.operators.decontamination import decontaminate


def _frames(spark, train_rows, eval_rows):
    train = spark.createDataFrame(train_rows, "doc_id int, gram string")
    ev = spark.createDataFrame(eval_rows, "gram string")
    return train, ev


def test_strategies_equivalent_property(spark):
    """Random (doc, gram) tables: broadcast == shuffle row-for-row."""
    from hypothesis import given, settings, strategies as st

    gram = st.integers(min_value=0, max_value=30).map(lambda i: f"g{i}")

    def rows(df):
        # one retry: a transient JVM/python-worker hiccup inside a
        # shared long-lived test session would otherwise surface as a
        # hypothesis Flaky error unrelated to the property under test
        for attempt in (1, 2):
            try:
                return sorted(map(tuple, df.collect()))
            except Exception:  # noqa: BLE001
                if attempt == 2:
                    raise

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(min_value=1, max_value=8), gram),
            min_size=1,
            max_size=60,
            unique=True,
        ),
        st.lists(gram.map(lambda g: (g,)), min_size=0, max_size=15, unique=True),
    )
    def check(train_rows, eval_rows):
        train, ev = _frames(spark, train_rows, eval_rows)
        a = rows(decontaminate(train, ev, strategy="broadcast"))
        b = rows(decontaminate(train, ev, strategy="shuffle"))
        assert a == b

    check()


def test_threshold_exact_integer_boundary(spark):
    """contaminated flips exactly at n_overlap*10 >= n_grams (no float
    ratio): 1 hit in 10 grams -> True; 1 hit in 11 grams -> False."""
    train, ev = _frames(
        spark,
        [(1, f"g{i}") for i in range(10)] + [(2, f"h{i}") for i in range(11)],
        [("g0",), ("h0",)],
    )
    rows = {r.doc_id: r for r in decontaminate(train, ev).collect()}
    assert rows[1].contaminated is True
    assert rows[2].contaminated is False


def test_auto_picks_shuffle_above_threshold(spark):
    """auto with a tiny broadcast_max_rows must produce the shuffle
    plan (SortMergeJoin on the gram key)."""
    from hyppo_worker_spark.plans.explain import join_strategies

    train, ev = _frames(
        spark,
        [(1, f"g{i}") for i in range(20)],
        [(f"g{i}",) for i in range(10)],
    )
    df = decontaminate(train, ev, strategy="auto", broadcast_max_rows=3)
    assert "SortMergeJoin" in join_strategies(df)


def test_zero_overlap_docs_dropped_and_bad_strategy_raises(spark):
    train, ev = _frames(spark, [(1, "a"), (2, "b")], [("b",)])
    got = decontaminate(train, ev).collect()
    assert [(r.doc_id, r.n_overlap) for r in got] == [(2, 1)]
    with pytest.raises(ValueError, match="strategy"):
        decontaminate(train, ev, strategy="bogus")
