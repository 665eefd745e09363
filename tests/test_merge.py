"""MERGE/upsert and SCD2 semantics."""

from pyspark.sql import functions as F

from hyppo_worker_spark.operators.merge import merge_upsert, scd2_apply

OPEN = "9999-12-31 00:00:00"


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, name string, v double"
    )
    source = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], "k int, name string, v double"
    )
    out = {r.k: (r.name, r.v) for r in merge_upsert(target, source, "k").collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_upsert_dedupes_source_with_order_col(spark):
    """Duplicate keys in one source batch: order_col picks the last
    writer; without it duplicates would both survive the anti-join."""
    target = spark.createDataFrame(
        [(1, "a", 10.0, 0)], "k int, name string, v double, updated_at int"
    )
    source = spark.createDataFrame(
        [(1, "old", 11.0, 5), (1, "new", 12.0, 9), (2, "d", 40.0, 7)],
        "k int, name string, v double, updated_at int",
    )
    out = merge_upsert(target, source, "k", order_col="updated_at")
    rows = {r.k: (r.name, r.v) for r in out.collect()}
    assert rows == {1: ("new", 12.0), 2: ("d", 40.0)}
    assert out.count() == 2  # no duplicate keys survive


def test_scd2_closes_and_appends(spark):
    current = spark.createDataFrame(
        [
            (1, "alice", "gold", "2020-01-01 00:00:00", OPEN),
            (2, "bob", "silver", "2020-01-01 00:00:00", OPEN),
            (2, "bob", "bronze", "2019-01-01 00:00:00", "2020-01-01 00:00:00"),
        ],
        "k int, name string, tier string, valid_from string, valid_to string",
    )
    updates = spark.createDataFrame(
        [(1, "alice", "platinum"), (2, "bob", "silver"), (3, "carol", "gold")],
        "k int, name string, tier string",
    )
    out = scd2_apply(
        current, updates, key="k", compare_cols=["tier"], new_ts="2021-06-01 00:00:00"
    )
    rows = {(r.k, r.tier, r.valid_from, r.valid_to) for r in out.collect()}
    # alice: old gold closed at batch ts, new platinum version open
    assert (1, "gold", "2020-01-01 00:00:00", "2021-06-01 00:00:00") in rows
    assert (1, "platinum", "2021-06-01 00:00:00", OPEN) in rows
    # bob unchanged: open silver stays open; bronze history untouched
    assert (2, "silver", "2020-01-01 00:00:00", OPEN) in rows
    assert (2, "bronze", "2019-01-01 00:00:00", "2020-01-01 00:00:00") in rows
    # carol is brand new: one open version
    assert (3, "gold", "2021-06-01 00:00:00", OPEN) in rows
    assert len(rows) == 5
    # exactly one open version per key
    open_counts = (
        out.filter(F.col("valid_to") == OPEN).groupBy("k").count().collect()
    )
    assert all(r['count'] == 1 for r in open_counts)


def test_merge_upsert_tie_on_order_col_is_deterministic(spark):
    """Equal order_col within a key: winner is a stable function of row
    content, identical across repeated runs."""
    from hyppo_worker_spark.operators.merge import merge_upsert

    target = spark.createDataFrame([(1, "old", 0)], "k int, v string, ts int")
    source = spark.createDataFrame(
        [(1, "a", 5), (1, "b", 5)], "k int, v string, ts int"
    )
    winners = {
        merge_upsert(target, source, "k", order_col="ts")
        .filter("k = 1")
        .collect()[0]
        .v
        for _ in range(3)
    }
    assert len(winners) == 1
