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


def test_t06_and_q39_column_pruning(spark, registry):
    """The round-3 sampling/salting queries must stay scan-local with
    pruned reads: t06 reads only (doc_id, lang); q39 only the four
    aggregated lineitem columns."""
    t06 = registry["t06_stratified_sample"].spark_fn(spark, SF_DIR)
    assert scan_reads_only(t06, "documents", {"doc_id", "lang"})
    q39 = registry["q39_salted_hot_keys"].spark_fn(spark, SF_DIR)
    assert scan_reads_only(
        q39, "lineitem",
        {"l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"},
    )


def test_d03_signature_stage_single_shuffle(spark, registry):
    """The MinHash signature path is one groupBy(doc) — the banded
    frame's plan must contain exactly one Exchange (plus the final
    band-key explode, which is narrow)."""
    from hyppo_worker_spark.operators.dedup import minhash_lsh_pairs
    from hyppo_worker_spark.session import load_tables

    docs = load_tables(spark, SF_DIR, ("documents",))["documents"]
    pairs = minhash_lsh_pairs(docs, "doc_id", "text")
    # full d03 plan has joins downstream; assert the signature segment
    # by rebuilding just the banded frame shape: explode+group = 1 exch
    from pyspark.sql import functions as F
    from hyppo_worker_spark.functions import text as TX
    from hyppo_worker_spark.operators.dedup import MINHASH_PRIME, minhash_params

    words = docs.select(F.col("doc_id").alias("did"), TX.tokens("text").alias("w"))
    sh = words.select("did", TX.shingles(F.col("w"), 3).alias("sh"))
    lo = F.conv(F.substring(F.md5(F.col("s")), 1, 7), 16, 10).cast("bigint")
    ex = sh.select("did", F.explode("sh").alias("s")).select("did", lo.alias("hl"))
    params = minhash_params(24)
    per_doc = ex.groupBy("did").agg(
        *[
            F.min((F.lit(a) * F.col("hl") + F.lit(b)) % MINHASH_PRIME).alias(f"m{i}")
            for i, (a, b) in enumerate(params[:12])
        ]
    )
    assert count_exchanges(per_doc) == 1


def test_t11_eval_probe_broadcasts(spark, registry):
    """With a broadcastable eval gram set (the benchmark-suite case,
    and what auto picks at this SF) the membership probe broadcasts —
    the training corpus side never shuffles for the join."""
    df = registry["t11_decontamination"].spark_fn(spark, SF_DIR)
    assert "BroadcastHashJoin" in join_strategies(df)
    assert "SortMergeJoin" not in join_strategies(df)


def test_t11_corpus_proportional_eval_does_not_broadcast(spark, registry):
    """When the eval side is corpus-proportional (too big to ship to
    every executor), the probe must fall back to a shuffled join on the
    gram key — broadcasting it is the 100 TB OOM. The gram-key join is
    the SMJ; the tiny post-agg doc_id join may still broadcast."""
    import re

    df = registry["t11_decontamination"].spark_fn(spark, SF_DIR, strategy="shuffle")
    plan = formatted_plan(df)
    joins = {
        m.group(1): m.group(2)
        for m in re.finditer(
            r"\(\d+\) (SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)[^\n]*\n"
            r"Left keys \[\d+\]: \[(\w+)",
            plan,
        )
    }
    # the gram probe is the shuffled join; only doc_id (post-agg tiny
    # sides) may broadcast
    assert joins.get("SortMergeJoin", "").startswith("gram")
    assert not joins.get("BroadcastHashJoin", "").startswith("gram")


def test_t11_shuffle_strategy_matches_broadcast(spark, registry):
    """Both probe strategies are the same operator contract — identical
    rows out."""
    a = registry["t11_decontamination"].spark_fn(spark, SF_DIR, strategy="broadcast")
    b = registry["t11_decontamination"].spark_fn(spark, SF_DIR, strategy="shuffle")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_t13_shard_manifest_single_exchange(spark, registry):
    """Shard placement is scan-local (md5 of the key); the only
    exchange carries the per-shard partial aggregates."""
    df = registry["t13_shard_manifest"].spark_fn(spark, SF_DIR)
    assert count_exchanges(df) <= 2  # agg exchange + final orderBy


def test_q41_bucketed_join_zero_exchange_on_join(spark, registry):
    """The bucketed fact-to-fact join must be exchange-free: both scans
    are bucketed on the join key, so the ONLY exchange in the whole
    plan is the tiny post-join re-agg on o_orderpriority (+ its
    orderBy). An exchange feeding the SortMergeJoin means bucket
    co-location was lost — the 100 TB amortized-shuffle story breaks."""
    df = registry["q41_bucketed_colocated_join"].spark_fn(spark, SF_DIR)
    assert "SortMergeJoin" in join_strategies(df)
    assert count_exchanges(df) <= 2  # agg exchange + final orderBy only
    plan = formatted_plan(df)
    # the join inputs read the bucketed tables directly (Bucketed: true)
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan


def test_t14_no_corpus_wide_window(spark, registry):
    """The prefix sum must window within hash-partitioned buckets; the
    only unpartitioned window runs over the one-row-per-bucket frame."""
    df = registry["t14_sequence_packing"].spark_fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "hashpartitioning(_psum_bucket" in plan


def test_m08_container_build_is_repartitioned(spark, registry):
    """The AVI container-build expression expands each input row into
    ~10 KB and burns per-pixel CPU; Catalyst sizes the stage by the
    tiny documents scan, so WITHOUT an explicit pre-build exchange it
    runs near-serial (measured 9 tasks / 62s at x10 vs 105 / 4.2s).
    Pin that an Exchange sits in the plan ahead of the Python stage."""
    df = registry["m08_video_frame_sample"].spark_fn(spark, SF_DIR)
    plan = formatted_plan(df)
    assert plan.count("Exchange") >= 2  # pre-build hash + final sort
    assert "hashpartitioning(doc_id" in plan
