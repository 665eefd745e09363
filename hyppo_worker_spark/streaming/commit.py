"""Shared crash-safe commit for foreachBatch maintenance sinks.

Every maintenance sink in this package (HLL/CMS/KMV sketch rollups,
SCD2 dimension) follows the same per-batch shape: read the current
table, merge the batch in, rewrite the table — with a marker file
absorbing Structured Streaming's replay-after-restart of the last
uncommitted batch (none of the merges are idempotent under replay:
counter addition double-counts, SCD2 close-and-reopens a version).

The ORDER of rewrite vs marker is load-bearing (ADVICE r4): an
ack-early marker written before the rewrite leaves an at-most-once
window — a crash between marker and rewrite permanently drops the
batch, because the replay is skipped. This committer acks AFTER the
data is durably in place:

1. ``done(batch_id)`` — replayed MARKED batches are no-ops;
2. ``recover()`` — heal any leftover from a previous crash (below);
3. materialize the new table generation NEXT TO the current one
   (``<table>.staging-<id>``) — the merge plan may read the current
   generation while writing staging, and the swap renames only run
   after the write action completes;
4. swap: rename current → ``.old-<id>``, rename staging in;
5. write the marker; drop the old generation.

A crash anywhere before step 5 replays the batch against the
PRE-batch table: ``recover`` garbage-collects stale staging dirs,
and — because a swap whose marker never landed WILL be replayed —
rolls an unmarked ``.old-<id>`` generation BACK over the table
(covering both the mid-swap window and the swap-complete/marker-
missing window, where keeping the post-batch table would double-apply
the replay). At 100 TB the same protocol holds with
object-store renames replaced by a manifest pointer flip (the
`storage.py` manifest-commit path); the marker-after-data ordering is
the invariant either way.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame


def _shape_tag(marker_dir: str, batch_id: int) -> str:
    return os.path.join(marker_dir, f"gen-{batch_id}.shape")


def record_shape(marker_dir: str, batch_id: int, shape: str) -> None:
    """Record WHICH commit protocol created generation ``batch_id``'s
    ``.old-<id>`` root ("whole" | "bucketed"), BEFORE the root becomes
    observable. Recovery dispatch reads this tag instead of inferring
    the layout from Spark output-file naming conventions (``_SUCCESS``
    / ``part-*`` presence) — an inference that misdispatches when a
    whole-dir generation carries neither (e.g.
    ``mapreduce.fileoutputcommitter.marksuccessfuljobs=false`` plus an
    empty table) and then destroys the pre-batch generation. An orphan
    tag (crash between tag write and root creation) is harmless: the
    tag is only consulted for a root that exists."""
    with open(_shape_tag(marker_dir, batch_id), "w") as fh:
        fh.write(shape)


def read_shape(marker_dir: str, batch_id: int) -> str | None:
    try:
        with open(_shape_tag(marker_dir, batch_id), encoding="utf-8") as fh:
            return fh.read().strip() or None
    except FileNotFoundError:
        return None


def _drop_shape(marker_dir: str, batch_id: int) -> None:
    try:
        os.unlink(_shape_tag(marker_dir, batch_id))
    except FileNotFoundError:
        pass


class MarkedTableCommitter:
    """Marker-guarded staged-swap commits for one maintained table."""

    def __init__(self, table_dir: str, marker_dir: str) -> None:
        self.table_dir = table_dir
        self.marker_dir = marker_dir
        os.makedirs(marker_dir, exist_ok=True)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.marker_dir, f"batch-{batch_id}.done")

    def done(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def recover(self) -> None:
        """Heal crash leftovers. The invariant replay depends on: a
        batch whose MARKER is absent will be re-applied by Structured
        Streaming, so recovery must leave the PRE-batch table in place
        — even when the crash hit AFTER the swap completed but before
        the marker (the double-apply window, ADVICE r5). Generation
        ids are compared numerically (lexicographic glob order puts
        ``old-9`` after ``old-10``)."""
        olds = sorted(
            glob.glob(self.table_dir + ".old-*"),
            key=lambda p: int(p.rsplit("-", 1)[1]),
        )
        while olds:
            newest = olds[-1]
            if self.done(int(newest.rsplit("-", 1)[1])):
                break  # swap fully acked; remaining olds are stale
            # unmarked generation: roll BACK — drop the post-batch
            # table (if the swap got that far) and reinstate the
            # pre-batch one, so the replay applies exactly once
            if os.path.isdir(self.table_dir):
                shutil.rmtree(self.table_dir)
            rolled = olds.pop()
            os.rename(rolled, self.table_dir)
            _drop_shape(self.marker_dir, int(rolled.rsplit("-", 1)[1]))
        for stale in olds + glob.glob(self.table_dir + ".staging-*"):
            shutil.rmtree(stale, ignore_errors=True)
            if ".old-" in stale:
                _drop_shape(self.marker_dir, int(stale.rsplit("-", 1)[1]))

    def mark_only(self, batch_id: int) -> None:
        """Ack a batch that changed nothing (e.g. an empty batch)."""
        with open(self._marker(batch_id), "w") as f:
            f.write("done")

    def commit(
        self, df: DataFrame, batch_id: int, partition_by: str | None = None
    ) -> None:
        """Materialize ``df`` as the table's next generation, swap it
        in, then mark the batch done.

        The write goes DIRECTLY to the staging dir: the plan may read
        the current table generation, but staging is a different
        directory and the swap renames happen only after the write
        action completes, so no localCheckpoint pin is needed — the
        earlier eager-checkpoint-then-write shape materialized every
        generation twice per batch for no safety gain (p08 cost
        itemization, round 8).

        ``partition_by`` writes the generation hash-partitioned (used
        once by the auto-layout MIGRATION commit: the full state swaps
        in already laid out as ``bucket=<i>/`` dirs, after which the
        per-bucket committer takes over). The swap/rollback protocol
        is unchanged — the generation is still one whole-dir rename."""
        staging = self.table_dir + f".staging-{batch_id}"
        writer = df.write.mode("overwrite")
        if partition_by is not None:
            writer = writer.partitionBy(partition_by)
        writer.parquet(staging)
        old = self.table_dir + f".old-{batch_id}"
        if os.path.isdir(self.table_dir):
            # tag the generation's protocol BEFORE its root exists —
            # recovery dispatches on this record, never on the root's
            # file-naming shape
            record_shape(self.marker_dir, batch_id, "whole")
            os.rename(self.table_dir, old)
        os.rename(staging, self.table_dir)
        self.mark_only(batch_id)
        shutil.rmtree(old, ignore_errors=True)
        _drop_shape(self.marker_dir, batch_id)


class BucketedMarkedTableCommitter:
    """Marker-guarded commits for a maintained table partitioned into
    hash BUCKETS (``<table>/bucket=<i>/``), rewriting ONLY the buckets
    a batch touches.

    The whole-table ``MarkedTableCommitter`` rewrites every state row
    per micro-batch — O(state) write amplification that dominates at
    100 TB, where a small batch touches a tiny key range. Bucketing by
    a stable key hash bounds the rewrite to O(touched buckets +
    batch): untouched bucket directories are not read, written, or
    renamed. Spark reads the table back with ordinary partition
    discovery (the ``bucket`` int column materializes from the
    directory names), and scans that filter on ``bucket`` prune to
    the matching directories.

    Crash safety is the same marker-after-data invariant, applied
    per generation root:

    1. ``done(batch_id)`` — replayed MARKED batches are no-ops;
    2. ``recover()`` — roll any UNMARKED generation back bucket-by-
       bucket (the batch will be replayed; every touched bucket must
       show its PRE-batch content), then GC stale roots;
    3. one Spark job writes all touched buckets under
       ``<table>.staging-<id>/bucket=<i>/`` (``partitionBy``);
    4. swap each touched bucket: current → ``<table>.old-<id>/
       bucket=<i>``, staging in;
    5. marker, then drop the old root.

    A crash mid-swap leaves some buckets swapped and some not; the
    unmarked ``.old-<id>`` root records exactly which buckets moved,
    so rollback is exact. Rows never migrate buckets (the bucket is a
    pure function of the key), which is what makes per-bucket swap
    sound: a batch's effect on an untouched bucket is provably empty.
    """

    BUCKET_COL = "bucket"

    def __init__(self, table_dir: str, marker_dir: str) -> None:
        self.table_dir = table_dir
        self.marker_dir = marker_dir
        os.makedirs(marker_dir, exist_ok=True)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.marker_dir, f"batch-{batch_id}.done")

    def done(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def mark_only(self, batch_id: int) -> None:
        with open(self._marker(batch_id), "w") as f:
            f.write("done")

    def _bucket_dirs(self, root: str) -> list[str]:
        if not os.path.isdir(root):
            return []
        return sorted(
            n for n in os.listdir(root) if n.startswith("bucket=")
        )

    def recover(self) -> None:
        olds = sorted(
            glob.glob(self.table_dir + ".old-*"),
            key=lambda p: int(p.rsplit("-", 1)[1]),
        )
        while olds:
            newest = olds[-1]
            if self.done(int(newest.rsplit("-", 1)[1])):
                break  # acked; remaining roots are stale
            # unmarked generation: the batch WILL be replayed, so every
            # touched bucket must show its PRE-batch content — restore
            # each recorded bucket (dropping the post-batch dir if the
            # swap got that far), and DELETE buckets the batch CREATED
            # (tombstoned below: they had no pre-batch content, and a
            # leftover post-batch dir would make the replayed merge
            # read post-batch state = double-apply)
            for bname in self._bucket_dirs(newest):
                cur = os.path.join(self.table_dir, bname)
                if os.path.isdir(cur):
                    shutil.rmtree(cur)
                os.rename(os.path.join(newest, bname), cur)
            for tname in os.listdir(newest) if os.path.isdir(newest) else []:
                if tname.startswith("created-"):
                    created = os.path.join(
                        self.table_dir, tname[len("created-"):]
                    )
                    shutil.rmtree(created, ignore_errors=True)
            rolled = olds.pop()
            shutil.rmtree(rolled, ignore_errors=True)
            _drop_shape(self.marker_dir, int(rolled.rsplit("-", 1)[1]))
        for stale in olds + glob.glob(self.table_dir + ".staging-*"):
            shutil.rmtree(stale, ignore_errors=True)
            if ".old-" in stale:
                _drop_shape(self.marker_dir, int(stale.rsplit("-", 1)[1]))

    def commit(self, df: DataFrame, batch_id: int) -> None:
        """``df`` must hold the COMPLETE new content of every bucket
        it mentions (and nothing for untouched buckets), with the
        bucket id in the ``bucket`` column."""
        staging = self.table_dir + f".staging-{batch_id}"
        df.write.mode("overwrite").partitionBy(self.BUCKET_COL).parquet(
            staging
        )
        old_root = self.table_dir + f".old-{batch_id}"
        record_shape(self.marker_dir, batch_id, "bucketed")
        os.makedirs(old_root, exist_ok=True)
        os.makedirs(self.table_dir, exist_ok=True)
        for bname in self._bucket_dirs(staging):
            cur = os.path.join(self.table_dir, bname)
            if os.path.isdir(cur):
                os.rename(cur, os.path.join(old_root, bname))
            else:
                # tombstone FIRST, then create: if we crashed between
                # the two, recover's rmtree of a not-yet-created dir
                # is a no-op
                with open(
                    os.path.join(old_root, f"created-{bname}"), "w"
                ) as fh:
                    fh.write("created")
            os.rename(os.path.join(staging, bname), cur)
        shutil.rmtree(staging, ignore_errors=True)
        self.mark_only(batch_id)
        shutil.rmtree(old_root, ignore_errors=True)
        _drop_shape(self.marker_dir, batch_id)
