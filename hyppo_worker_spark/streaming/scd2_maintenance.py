"""Streaming SCD2 dimension maintenance: a CDC update stream applied
to a type-2 history continuously — the streaming twin of the batch
q51/q52 pair, built on `operators/merge.py:scd2_apply` through the
same foreachBatch + marker discipline as the sketch maintenance
sinks.

Per micro-batch:

1. compact the batch to ONE update per key — last writer by the
   stream's update timestamp, ties broken by a stable row hash (the
   `merge_upsert` contract): within a micro-batch, intermediate
   versions are collapsed, which is standard CDC-compaction semantics
   (the history records STATE AT BATCH BOUNDARIES, not every
   intra-batch flicker — document this to consumers);
2. the batch's effective timestamp is the max update ts in the batch
   (one scalar; monotone across batches when the source's watermark
   is, which the caller should guarantee — out-of-order BATCHES would
   write history out of order);
3. `scd2_apply` against the current table: closed history is never
   rescanned for matching (the operator joins only the open slice),
   so per-batch cost is O(open dimension + batch), independent of
   history depth;
4. rewrite via STAGED SWAP, then mark. The batch's marker is written
   only AFTER the new table generation is durably in place (write to
   ``<table>.staging-<id>``, rename current → ``.old-<id>``, rename
   staging in, mark, drop old) — so a crash anywhere in the batch
   replays it against the PRE-batch table and cannot drop data
   (ADVICE r4: the previous ack-early marker had an at-most-once
   window — a crash between marker and rewrite lost the batch
   forever). Replays of a MARKED batch are still absorbed by the
   marker guard (scd2_apply is NOT idempotent: a replayed changed
   row would close-and-reopen a version per replay), and
   ``_recover`` heals the one non-atomic window (current renamed
   out, staging not yet renamed in) by restoring the newest
   generation on the next call.

At 100 TB the rewrite targets the affected key-bucket partitions of
the dimension, exactly as `operators/merge.py`'s module doc lays out.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OPEN_TS = "9999-12-31 00:00:00"


class Scd2DimensionSink:
    """foreachBatch callable maintaining a type-2 dimension table."""

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        key: str,
        compare_cols: list[str],
        ts_col: str = "update_ts",
    ) -> None:
        self.spark = spark
        self.key = key
        self.compare_cols = list(compare_cols)
        self.ts_col = ts_col
        self.table_dir = os.path.join(base_dir, "scd2_dim")
        self.marker_dir = os.path.join(base_dir, "scd2_markers")
        os.makedirs(self.marker_dir, exist_ok=True)

    def _compact(self, batch_df: DataFrame) -> DataFrame:
        from hyppo_worker_spark.operators.merge import merge_upsert

        empty = batch_df.limit(0)
        return merge_upsert(empty, batch_df, self.key, order_col=self.ts_col)

    def _recover(self) -> None:
        """Heal the one non-atomic window of the staged swap: the
        current table was renamed to ``.old-<id>`` but the staging dir
        was not renamed in before a crash. Restore the newest old
        generation; drop any leftover staging/old dirs otherwise."""
        import glob
        import shutil

        olds = sorted(glob.glob(self.table_dir + ".old-*"))
        if not os.path.isdir(self.table_dir) and olds:
            os.rename(olds.pop(), self.table_dir)
        for stale in olds + glob.glob(self.table_dir + ".staging-*"):
            shutil.rmtree(stale, ignore_errors=True)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        import shutil

        from hyppo_worker_spark.operators.merge import scd2_apply

        marker = os.path.join(self.marker_dir, f"batch-{batch_id}.done")
        if os.path.exists(marker):
            return
        self._recover()
        if batch_df.isEmpty():
            with open(marker, "w") as f:
                f.write("done")
            return
        new_ts = (
            batch_df.agg(F.max(self.ts_col).alias("t")).first().t
        )
        new_ts = str(new_ts)
        updates = self._compact(batch_df).drop(self.ts_col)
        if os.path.isdir(self.table_dir):
            current = self.spark.read.parquet(self.table_dir)
            dim = scd2_apply(
                current,
                updates,
                self.key,
                self.compare_cols,
                version_ts=OPEN_TS,
                new_ts=new_ts,
            )
        else:
            dim = updates.withColumn("valid_from", F.lit(new_ts)).withColumn(
                "valid_to", F.lit(OPEN_TS)
            )
        # Staged swap: materialize the new generation NEXT TO the
        # current one, swap via two renames, and only then mark the
        # batch done — a crash at any point replays against the
        # pre-batch table instead of dropping the batch (ADVICE r4).
        dim = dim.localCheckpoint(eager=True)
        staging = self.table_dir + f".staging-{batch_id}"
        dim.write.mode("overwrite").parquet(staging)
        old = self.table_dir + f".old-{batch_id}"
        if os.path.isdir(self.table_dir):
            os.rename(self.table_dir, old)
        os.rename(staging, self.table_dir)
        with open(marker, "w") as f:
            f.write("done")
        shutil.rmtree(old, ignore_errors=True)

    # -- query side ---------------------------------------------------------

    def history(self) -> DataFrame:
        return self.spark.read.parquet(self.table_dir)

    def open_dim(self) -> DataFrame:
        return self.history().filter(F.col("valid_to") == OPEN_TS)


def maintain_scd2(
    updates: DataFrame, sink: Scd2DimensionSink, checkpoint_dir: str
):
    return (
        updates.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
