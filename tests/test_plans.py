"""Plan-shape assertions: the properties that make queries survive a
100× scale-up — pushdown reaches the scan, column pruning holds,
dimension joins broadcast, top-k avoids full sorts."""

import pytest

from hyppo_worker_spark.plans.explain import (
    count_exchanges,
    formatted_plan,
    has_pushed_filter,
    join_strategies,
    read_schemas,
    scan_reads_only,
)
from hyppo_worker_spark.queries import load_all

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def registry():
    return load_all()


def test_q06_filters_push_to_scan(spark, registry):
    df = registry["q06_forecast_revenue"].spark_fn(spark, SF_DIR)
    assert has_pushed_filter(df, "l_shipdate")
    assert has_pushed_filter(df, "l_quantity")
    assert has_pushed_filter(df, "l_discount")


def test_q01_column_pruning(spark, registry):
    df = registry["q01_pricing_summary"].spark_fn(spark, SF_DIR)
    needed = {
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_shipdate",
    }
    assert scan_reads_only(df, "lineitem", needed)
    schemas = read_schemas(df)
    assert schemas and all("l_orderkey" not in s for s in schemas)


def test_q02_dimension_joins_broadcast(spark, registry):
    df = registry["q02_customer_by_region"].spark_fn(spark, SF_DIR)
    js = join_strategies(df)
    assert js == ["BroadcastHashJoin", "BroadcastHashJoin"]


def test_q03_segment_filter_pushed(spark, registry):
    df = registry["q03_shipping_priority"].spark_fn(spark, SF_DIR)
    assert has_pushed_filter(df, "c_mktsegment")
    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_q12_topk_no_full_sort(spark, registry):
    df = registry["q12_top_orders"].spark_fn(spark, SF_DIR)
    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_q01_single_shuffle(spark, registry):
    df = registry["q01_pricing_summary"].spark_fn(spark, SF_DIR)
    # partial agg → one exchange → final agg (+1 for the orderBy range
    # exchange on the tiny post-agg set)
    assert count_exchanges(df) <= 2


def test_asof_single_shuffle(spark, registry):
    df = registry["q21_asof_join"].spark_fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q27_approx_within_error_bounds(spark, registry):
    """q27 carries its sketch-error contract in-plan as booleans (so the
    DuckDB oracle can hash-compare literal TRUEs); assert they hold and
    that the exact twins match an independent exact computation."""
    rows = {
        r.l_returnflag: r
        for r in registry["q27_approx_aggregates"].spark_fn(spark, SF_DIR).collect()
    }
    from pyspark.sql import functions as F

    exact = {
        r.l_returnflag: r
        for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.countDistinct("l_orderkey").alias("orders"),
        )
        .collect()
    }
    for flag, r in rows.items():
        assert r.exact_parts == exact[flag].parts
        assert r.exact_orders == exact[flag].orders
        assert r.parts_within_bounds and r.orders_within_bounds
        assert r.median_within_bounds and r.p25_within_bounds and r.p75_within_bounds
