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
repartitionByRange samples, which are nondeterministic): a key-ranging
expression is derived from min/max — uniform ranges are fine because
the offsets correct any imbalance in *values*; only row-count balance
matters for task sizing. A window partition CANNOT be split by AQE
(each bucket's full row set is sorted by one task), so the bucket
count must GROW with the data: by default it is derived from the row
count so a bucket holds ~``TARGET_ROWS_PER_BUCKET`` rows regardless of
corpus size (a fixed default like 32 would put corpus/32 rows in one
task — ~3 TB each at 100 TB). Near-uniform key spacing (sequential or
hashed ids) keeps actual bucket sizes near the target; heavily skewed
keys concentrate rows and would need quantile boundaries instead.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: rows a single in-bucket window task should sort (window partitions
#: are un-splittable, so this bounds per-task input; narrow rows at
#: ~100 B each make this ~400 MB of task input).
TARGET_ROWS_PER_BUCKET = 4_000_000


def derive_n_buckets(
    n_rows: int, target_rows_per_bucket: int, parallelism: int
) -> int:
    """Bucket count for a prefix-sum pass: enough buckets that no
    single (un-splittable) window task sorts more than roughly
    ``target_rows_per_bucket`` rows, and never fewer than the
    session's shuffle parallelism (so small inputs still use every
    core). Grows linearly with the data — the scale invariant."""
    return max(math.ceil(n_rows / target_rows_per_bucket), parallelism, 1)


def exclusive_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "offset_before",
    n_buckets: int | None = None,
    target_rows_per_bucket: int = TARGET_ROWS_PER_BUCKET,
) -> DataFrame:
    """Global exclusive prefix sum of ``value_col`` in ``order_col``
    order, without a single-partition window.

    Requires a numeric, non-null ``order_col`` with distinct values
    (ties would make "global order" ill-defined). Returns the input
    plus ``out_col`` = sum of ``value_col`` over all rows strictly
    before this one.

    ``n_buckets=None`` (default) sizes the bucket count from the row
    count — ``ceil(rows / target_rows_per_bucket)``, at least the
    session's shuffle parallelism — so no single window task sorts
    more than ~``target_rows_per_bucket`` rows at ANY input size.
    Pass an explicit ``n_buckets`` only to pin plans in tests.
    """
    if n_buckets is not None and n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    if target_rows_per_bucket <= 0:
        raise ValueError(
            f"target_rows_per_bucket must be positive, got {target_rows_per_bucket}"
        )
    # One pass gathers everything the plan derivation needs: key range
    # AND row count (the count rides the same scan — no extra job).
    lo, hi, n_rows = df.agg(
        F.min(order_col).cast("double"),
        F.max(order_col).cast("double"),
        F.count(F.lit(1)),
    ).first()
    if lo is None:
        return df.withColumn(out_col, F.lit(0).cast("bigint"))
    if n_buckets is None:
        parallelism = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
        n_buckets = derive_n_buckets(n_rows, target_rows_per_bucket, parallelism)
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
    n_buckets: int | None = None,
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
    with_off = exclusive_prefix_sum(df, order_col, tokens_col, n_buckets=n_buckets)
    # `div` is exact int64 division — double division would lose
    # exactness past 2^53 total tokens, which a 100 TB corpus exceeds.
    first = F.expr(f"offset_before div {seq_len}")
    last = F.expr(
        f"(offset_before + greatest({tokens_col}, 1) - 1) div {seq_len}"
    )
    return with_off.withColumn(f"{out_prefix}_first", first).withColumn(
        f"{out_prefix}_last", last
    )
