"""Skew mitigation: salted aggregation and salted joins.

AQE's skew-join splitting (enabled in the session factory) handles
moderate skew at runtime; these operators are the explicit
pre-planning path for *known* hot keys — the standard pattern at
100 TB when one key holds a double-digit percentage of the fact
table.

- ``salted_agg``: two-phase aggregate — keys are salted with a random
  shard in [0, salt), partially aggregated per (key, shard), then
  re-aggregated per key. The hot key's rows spread over ``salt``
  reducers instead of one.
- ``salted_join``: fact side gets a random salt column; the dimension
  side is exploded ``salt`` times (one row per shard) so every
  (key, shard) pair still matches exactly once. Join key becomes
  (key, salt) — hot fact keys fan across reducers. Only worth it when
  the dimension side is small enough to replicate ``salt``×.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: Sequence[tuple[str, str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` is a list of (function, column, alias) with function in
    {sum, count, min, max}: those re-combine losslessly across the
    two phases (avg must be expressed as sum+count by the caller).
    """
    supported = {"sum", "count", "min", "max"}
    for fn, _, _ in aggs:
        if fn not in supported:
            raise ValueError(f"{fn!r} does not two-phase combine; use sum/count pairs")

    salted = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    phase1 = salted.groupBy(key, "__salt").agg(
        *[
            getattr(F, fn)(col).alias(f"__p_{alias}")
            for fn, col, alias in aggs
        ]
    )
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    return phase1.groupBy(key).agg(
        *[
            recombine[fn](f"__p_{alias}").alias(alias)
            for fn, _, alias in aggs
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: fact salted randomly, dim replicated per
    shard; result is identical to ``fact.join(dim, key, how)`` for
    inner/left joins."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (dim side must not dangle)")
    f = fact.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = f.join(d, [key, "__salt"], how)
    return out.drop("__salt")


def explain_skew(df: DataFrame, key: str, top: int = 5) -> DataFrame:
    """Key-distribution diagnostic: the rows that justify salting."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("pct", F.round(100.0 * F.col("n") / total, 2))
        .orderBy(F.col("n").desc())
        .limit(top)
    )
