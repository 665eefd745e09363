"""Distributed prefix sum + sequence packing.

LLM pretraining packs a corpus by concatenating token streams in a
canonical order and slicing fixed-length training sequences; mapping a
document to its sequence ids requires the GLOBAL exclusive prefix sum
of token counts in that order. The naive expression — a windowed sum
``over (ORDER BY key)`` with no partition — collapses the whole corpus
into ONE window partition: a single task materializes 100 TB of rows.
That is the canonical Spark scale-killer, so this operator implements
the classic two-pass distributed scan instead:

1. bucket rows by a RANGE of the order key (buckets are ordered:
   every key in bucket i sorts before every key in bucket i+1);
2. aggregate per-bucket totals — a tiny frame (one row per bucket) —
   and take its running sum to get each bucket's global starting
   offset (the only full-order window, over ``n_buckets`` rows);
3. broadcast-join the offsets back and window-sum WITHIN each bucket.

Cost at 100 TB: one narrow shuffle keyed by bucket for the in-bucket
window, one broadcast of the offset table. No stage ever sees more
than one bucket of rows in a single task.

The bucket boundaries must be a pure function of the key (not ntile /
repartitionByRange samples, which are nondeterministic): callers pass
``n_buckets`` and a key-ranging expression is derived from min/max —
uniform ranges are fine because the offsets correct any imbalance in
*values*; only row-count balance matters for task sizing, and AQE
splits oversized in-bucket windows' input partitions upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exclusive_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "offset_before",
    n_buckets: int = 32,
) -> DataFrame:
    """Global exclusive prefix sum of ``value_col`` in ``order_col``
    order, without a single-partition window.

    Requires a numeric, non-null ``order_col`` with distinct values
    (ties would make "global order" ill-defined). Returns the input
    plus ``out_col`` = sum of ``value_col`` over all rows strictly
    before this one.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    lo, hi = df.agg(
        F.min(order_col).cast("double"), F.max(order_col).cast("double")
    ).first()
    if lo is None:
        return df.withColumn(out_col, F.lit(0).cast("bigint"))
    span = max(hi - lo, 1.0)
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((F.col(order_col).cast("double") - F.lit(lo)) / F.lit(span) * n_buckets)
        .cast("int"),
    ).alias("_psum_bucket")

    bucketed = df.withColumn("_psum_bucket", bucket)

    # pass 1: per-bucket totals; running sum over the (tiny) bucket
    # frame gives each bucket's global starting offset.
    w_buckets = (
        Window.orderBy("_psum_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        bucketed.groupBy("_psum_bucket")
        .agg(F.sum(value_col).cast("bigint").alias("_psum_total"))
        .withColumn(
            "_psum_offset",
            F.coalesce(F.sum("_psum_total").over(w_buckets), F.lit(0)).cast("bigint"),
        )
        .drop("_psum_total")
    )

    # pass 2: in-bucket exclusive running sum + the bucket's offset.
    w_in = (
        Window.partitionBy("_psum_bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        bucketed.join(F.broadcast(offsets), "_psum_bucket")
        .withColumn(
            out_col,
            (
                F.coalesce(F.sum(value_col).over(w_in), F.lit(0))
                + F.col("_psum_offset")
            ).cast("bigint"),
        )
        .drop("_psum_bucket", "_psum_offset")
    )


def pack_sequences(
    df: DataFrame,
    order_col: str,
    tokens_col: str,
    seq_len: int,
    out_prefix: str = "seq",
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign each document the
    range of fixed-length training sequences its tokens land in when
    the corpus token stream is concatenated in ``order_col`` order and
    sliced every ``seq_len`` tokens.

    Adds ``offset_before`` (global token offset), ``{prefix}_first``
    and ``{prefix}_last`` (inclusive sequence-id range; empty docs
    occupy their boundary sequence).
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    with_off = exclusive_prefix_sum(df, order_col, tokens_col)
    # `div` is exact int64 division — double division would lose
    # exactness past 2^53 total tokens, which a 100 TB corpus exceeds.
    first = F.expr(f"offset_before div {seq_len}")
    last = F.expr(
        f"(offset_before + greatest({tokens_col}, 1) - 1) div {seq_len}"
    )
    return with_off.withColumn(f"{out_prefix}_first", first).withColumn(
        f"{out_prefix}_last", last
    )
