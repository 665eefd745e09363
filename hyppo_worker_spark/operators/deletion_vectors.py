"""Merge-on-read deletion vectors: relational positional bitmaps.

Erasure (`sources/integration_source.py:erase_rows`) is copy-on-write:
correct and final, but it rewrites every touched file — the wrong cost
model for high-churn deletes (GDPR trickle, late-arriving retractions,
dedup verdicts landing after publish). The lakehouse answer
(Delta/Iceberg v2 "position deletes") is MERGE-ON-READ: a delete
appends a tiny positional bitmap sidecar; readers apply it; a
compaction pass rewrites a file group only when its deleted fraction
crosses a threshold.

Spark-first shape, reusing the packed-word discipline of
``operators/bloom.py`` (32-bit words in BIGINT so ``1 << (pos % 32)``
stays positive in both engines):

- the DV is RELATIONAL — ``(fid, word, bits_w)`` rows, one bit per
  deleted in-group ordinal — so sidecars are **mergeable** (bit_or per
  word: delete batches fold without reading each other, and deleting
  a row twice is the same bit — idempotent by algebra);
- **apply is map-side**: readers broadcast the folded DV and LEFT-join
  on ``(fid, pos div 32)`` — the fact side is never shuffled, so the
  read tax is one codegen stage, exactly like a runtime filter;
- **density gates compaction**: ``bit_count`` popcounts per group give
  the deleted fraction in integer basis points; groups past the
  threshold get the copy-on-write rewrite (and their DV rows dropped),
  everything else stays append-only.

At 100 TB: a delete costs O(batch) + its bitmap words (n_deleted/32
longs worst case — KiBs per group at realistic churn); the DV stays
broadcastable because the density gate rewrites any group whose
bitmap grows past a few percent, which bounds sidecar size by
construction. Readers pay one broadcast join; nothing is rewritten on
the delete path. The reference has no relational storage layer at all
(SURVEY §2.4); the positional-bitmap layout follows the public
Delta/Iceberg position-delete design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_BITS = 32


def stable_positions(
    df: DataFrame, fid_col: str, order_col: str, pos_col: str = "pos"
) -> DataFrame:
    """Stamp the stable within-group ordinal a position-delete layout
    needs: ``row_number() - 1`` per ``fid`` ordered by a deterministic
    key. Run ONCE at write time (the ordinal is part of the layout,
    like Iceberg's file position — it must be persisted, not
    recomputed against a moving table)."""
    from pyspark.sql import Window as W

    w = W.partitionBy(fid_col).orderBy(order_col)
    return df.withColumn(pos_col, F.row_number().over(w) - 1)


def dv_build(
    deletes: DataFrame, fid_col: str = "fid", pos_col: str = "pos"
) -> DataFrame:
    """Pack (fid, pos) delete rows into the ``(fid, word, bits_w)``
    bitmap — one narrow shuffle keyed by (fid, word), at most
    ceil(group_rows/32) groups per fid. Duplicate deletes collapse
    into the same bit."""
    return (
        deletes.select(
            F.col(fid_col).alias("fid"),
            F.expr(f"CAST({pos_col} div {WORD_BITS} AS INT)").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST({pos_col} % {WORD_BITS} AS INT))"
            ).alias("bit"),
        )
        .groupBy("fid", "word")
        .agg(F.bit_or("bit").alias("bits_w"))
    )


def dv_merge(*dvs: DataFrame) -> DataFrame:
    """Fold delete batches: bitmaps OR per (fid, word). Associative
    and idempotent — batches never re-read each other (the
    bloom-manifest contract, applied to deletes)."""
    out = dvs[0].select("fid", "word", "bits_w")
    for t in dvs[1:]:
        out = out.unionByName(t.select("fid", "word", "bits_w"))
    return out.groupBy("fid", "word").agg(
        F.bit_or("bits_w").alias("bits_w")
    )


def read_with_dv(
    data: DataFrame, dv: DataFrame,
    fid_col: str = "fid", pos_col: str = "pos",
) -> DataFrame:
    """Merge-on-read: keep rows whose bit is NOT set in the folded DV.

    Plan shape: one broadcast LEFT join on ``(fid, pos div 32)`` + a
    bit test — the fact side is never shuffled or exploded, so the
    read tax composes map-side in front of whatever the query does
    next (the whole point of merge-on-read at 100 TB)."""
    w = dv.select(
        F.col("fid").alias("__dv_fid"),
        F.col("word").alias("__dv_word"),
        F.col("bits_w").alias("__dv_bits"),
    )
    out = data.join(
        F.broadcast(w),
        (F.col(fid_col) == F.col("__dv_fid"))
        & (
            F.expr(f"CAST({pos_col} div {WORD_BITS} AS INT)")
            == F.col("__dv_word")
        ),
        "left",
    )
    live = F.col("__dv_bits").isNull() | (
        F.expr(
            f"(__dv_bits & shiftleft(CAST(1 AS BIGINT), "
            f"CAST({pos_col} % {WORD_BITS} AS INT)))"
        )
        == 0
    )
    return out.filter(live).select(*data.columns)


def dv_density(
    dv: DataFrame, group_counts: DataFrame
) -> DataFrame:
    """(fid, n_rows, n_deleted, density_bp) per group — ``bit_count``
    popcounts over the folded bitmap against the group's row count;
    all-integer so the compaction gate is engine-portable. Groups with
    no deletes report 0 (they must appear: the gate scans the LAYOUT,
    not the sidecar)."""
    pc = dv.groupBy("fid").agg(
        F.sum(F.bit_count("bits_w")).cast("long").alias("n_deleted")
    )
    return (
        group_counts.join(pc, "fid", "left")
        .select(
            "fid",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.coalesce("n_deleted", F.lit(0))
            .cast("long")
            .alias("n_deleted"),
        )
        .withColumn(
            "density_bp",
            F.expr("CAST((10000 * n_deleted) div n_rows AS BIGINT)"),
        )
    )
