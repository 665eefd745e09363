"""As-of (most-recent-match) join — an operator Spark lacks natively.

``asof_join(left, right, on, by)`` attaches to every left row the
latest right row with ``right.on <= left.on`` within the same ``by``
group (pandas ``merge_asof`` semantics, backward direction).

Implementation is the scalable union+window composition, NOT a range
cross join: tag both sides, union them (same narrow schema), and run
one window per ``by`` key ordered by the time column carrying the last
right-side values forward. Cost: a single shuffle on ``by`` + one
sort within partitions — linear at 100 TB, no quadratic candidate
pairs, no per-group pandas materialization. (An `applyInPandas` +
``pd.merge_asof`` variant would shuffle the same amount but pays the
Arrow transfer and Python loop; composition of built-ins keeps it in
whole-stage codegen.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join.

    Ties (equal ``on``): the right row sorts before the left row, so a
    right event at exactly t is visible to a left event at t.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, by)
    ]
    lcols = [c for c in left.columns]

    tagged_left = left.select(
        F.col(by).alias("__by"),
        F.col(on).alias("__on"),
        F.lit(1).alias("__side"),  # left sorts after right on ties
        F.struct(*lcols).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    tagged_right = right.select(
        F.col(by).alias("__by"),
        F.col(on).alias("__on"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(tagged_left.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )

    unioned = tagged_left.unionByName(tagged_right)
    w = (
        W.partitionBy("__by")
        .orderBy("__on", "__side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        "__side",
        "__lrow",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__c_{c}")
            for c in value_cols
        ],
    ).filter(F.col("__side") == 1)
    return carried.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in lcols],
        *[F.col(f"__c_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
