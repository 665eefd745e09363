"""Incremental connected-components maintenance: dedup cluster ids
kept continuously fresh as near-dup EDGE batches stream in — the
cluster-id companion to `streaming/ingest_dedup.py`'s admission path
(admission says "this doc has a near-dup"; this sink says "...and
here is its cluster", without ever re-running CC over the full
accumulated edge set).

Per micro-batch of new (a_id, b_id) pairs (foreachBatch):

1. **scope**: a new edge can only change components it TOUCHES —
   find the component ids of the batch's endpoints in the current
   (node, comp) state (one keyed join against the state table);
2. **subgraph**: pull the members of exactly those components and
   rebuild edges for them from the state itself (``node — comp``
   membership edges reproduce each affected component's
   connectivity: every member links to the canonical node, which is
   itself a member — a star that CC re-collapses); union the new
   edges;
3. **recompute locally**: run the batch large-star/small-star CC
   (`operators/dedup.py:connected_components`, O(log n) rounds) on
   that subgraph only — cost scales with the AFFECTED components +
   batch, not the corpus;
4. **merge + commit**: untouched state rows pass through; the
   recomputed rows replace the affected ones; staged-swap commit via
   `streaming/commit.py` (marker after data — CC merge is not
   idempotent under replay of a half-applied batch).

The test pins the invariant that matters: after every batch, the
maintained state EQUALS a from-scratch CC over all edges seen so far,
across random batch splits (merging two existing clusters through a
new bridge edge, growing one, and brand-new nodes all covered).

At 100 TB the state table is node-count sized and key-partitioned;
step 1/2 joins are comp-keyed and touch only affected partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hyppo_worker_spark.streaming.commit import (
    BucketedMarkedTableCommitter,
    MarkedTableCommitter,
)


class IncrementalCCSink:
    """foreachBatch callable maintaining a (node, comp) state table.

    ``local_solve_max_edges`` bounds a size-adaptive fast path: when
    the touched subgraph (new edges + affected-component membership
    stars) fits under the bound, the CC recompute runs driver-side
    with union-find instead of the distributed star-rounds operator.
    Itemizing p08's cost at sf0.1 (tools/profile_p08.py) showed the
    distributed recompute was 10.6s of the 12.8s sink total — ~8
    star rounds x per-job fixed overhead over a few thousand edges;
    the data volume is irrelevant at that size. The pull is bounded
    (``limit(max+1)`` — 200k edges ≈ 3 MB driver-side) and the
    distributed path remains for anything larger (e.g. the first
    batch of a 100 TB ingest), exactly the broadcast-join shape:
    size-adaptive physical strategy under one logical contract."""

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        local_solve_max_edges: int = 200_000,
        n_buckets: int | None = None,
    ) -> None:
        self.spark = spark
        self.table_dir = os.path.join(base_dir, "cc_state")
        self.marker_dir = os.path.join(base_dir, "cc_markers")
        self.local_solve_max_edges = local_solve_max_edges
        self.n_buckets = n_buckets
        if n_buckets is None:
            self._committer = MarkedTableCommitter(
                self.table_dir, self.marker_dir
            )
        else:
            self._committer = BucketedMarkedTableCommitter(
                self.table_dir, self.marker_dir
            )

    def state(self) -> DataFrame:
        df = self.spark.read.parquet(self.table_dir)
        if self.n_buckets is not None:
            df = df.select("node", "comp", "bucket")
        return df

    def _bucket_of(self, col: str):
        return F.pmod(F.xxhash64(F.col(col)), F.lit(self.n_buckets)).cast(
            "int"
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from hyppo_worker_spark.operators.dedup import connected_components

        if self._committer.done(batch_id):
            return
        self._committer.recover()
        new_edges = (
            batch_df.select(
                F.col("a_id").cast("long"), F.col("b_id").cast("long")
            )
            .filter(F.col("a_id") != F.col("b_id"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        if new_edges.isEmpty():
            self._committer.mark_only(batch_id)
            return

        if os.path.isdir(self.table_dir):
            state = self.state()
            endpoints = (
                new_edges.select(F.col("a_id").alias("node"))
                .unionByName(new_edges.select(F.col("b_id").alias("node")))
                .distinct()
            )
            lookup = state
            if self.n_buckets is not None:
                # endpoint lookup prunes to the endpoints' own buckets
                # (<= n_buckets small ints -- bounded driver pull)
                ep_buckets = [
                    r[0]
                    for r in endpoints.select(
                        self._bucket_of("node").alias("b")
                    )
                    .distinct()
                    .collect()
                ]
                lookup = state.filter(F.col("bucket").isin(ep_buckets))
            touched = (
                lookup.join(endpoints, "node")
                .select("comp")
                .distinct()
            )
            # members of touched comps: full scan by comp (a comp's
            # members span buckets), column-pruned to (node, comp)
            affected = state.select("node", "comp").join(touched, "comp")
            # membership edges reproduce affected connectivity (star
            # on the canonical node, itself a member)
            member_edges = affected.select(
                F.col("node").alias("a_id"), F.col("comp").alias("b_id")
            ).filter(F.col("a_id") != F.col("b_id"))
            sub_edges = new_edges.unionByName(member_edges)
        else:
            state = None
            touched = None
            sub_edges = new_edges

        # Size-adaptive recompute: one bounded job pulls up to max+1
        # edges; getting max+1 back means "too big -- go distributed".
        cap = self.local_solve_max_edges
        pulled = sub_edges.limit(cap + 1).collect()
        if len(pulled) <= cap:
            from hyppo_worker_spark.operators.dedup import (
                local_connected_components,
            )

            labeled = local_connected_components(
                [(r["a_id"], r["b_id"]) for r in pulled]
            )
            recomputed = self.spark.createDataFrame(
                labeled, "node long, comp long"
            )
        else:
            recomputed = connected_components(sub_edges)

        if self.n_buckets is None:
            untouched = (
                None
                if touched is None
                else state.join(touched, "comp", "left_anti")
            )
            merged = (
                recomputed
                if untouched is None
                else untouched.unionByName(recomputed)
            )
            self._committer.commit(merged, batch_id)
            return

        # bucketed: rewrite ONLY the buckets holding a recomputed node
        recomputed = recomputed.withColumn(
            "bucket", self._bucket_of("node")
        ).localCheckpoint(eager=True)
        if touched is None:
            self._committer.commit(recomputed, batch_id)
            return
        touched_buckets = [
            r[0] for r in recomputed.select("bucket").distinct().collect()
        ]
        untouched_in_touched = (
            self.state()
            .filter(F.col("bucket").isin(touched_buckets))
            .join(touched, "comp", "left_anti")
            .select("node", "comp", "bucket")
        )
        merged = untouched_in_touched.unionByName(recomputed)
        self._committer.commit(merged, batch_id)


def maintain_cc(edges: DataFrame, sink: IncrementalCCSink, checkpoint_dir: str):
    return (
        edges.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
