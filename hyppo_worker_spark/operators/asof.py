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
from pyspark.sql import types as T


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

    # Carry ONE struct of all value columns per right row, not each
    # column independently: with independent last(ignorenulls) a NULL
    # in one value column of the matched right row would resurrect a
    # stale value from an older right row (and mix columns from
    # different right rows). A single struct is non-null exactly when
    # the right ROW exists, so NULL fields propagate and every carried
    # value comes from the same (latest) right row — true merge_asof
    # semantics.
    tagged_left = left.select(
        F.col(by).alias("__by"),
        F.col(on).alias("__on"),
        F.lit(1).alias("__side"),  # left sorts after right on ties
        F.struct(*lcols).alias("__lrow"),
        # Build the null-struct type programmatically: a DDL string
        # assembled from simpleString() breaks on column names needing
        # backtick quoting (spaces, dots, colons).
        F.lit(None)
        .cast(
            T.StructType(
                [T.StructField(c, right.schema[c].dataType) for c in value_cols]
            )
        )
        .alias("__vrow"),
    )
    tagged_right = right.select(
        F.col(by).alias("__by"),
        F.col(on).alias("__on"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(tagged_left.schema["__lrow"].dataType).alias("__lrow"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__vrow"),
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
        F.last("__vrow", ignorenulls=True).over(w).alias("__crow"),
    ).filter(F.col("__side") == 1)
    return carried.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in lcols],
        *[F.col(f"__crow.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
