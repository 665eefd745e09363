"""p40 streaming Bloom-manifest admission: mid-lifecycle invariants.

The value-exact cross-engine pin is tools/check.py's job; this suite
asserts the properties that must hold at EVERY batch boundary by
construction: no false negatives (each arrived probe-key order is
found through the pruned read), plan-level pruning, accumulation
monotonicity (arrivals only add), and manifest monotonicity (bits
only get set, so the candidate-group set never shrinks)."""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def test_p40_mid_lifecycle_invariants(spark):
    from hyppo_worker_spark.queries import load_all
    from hyppo_worker_spark.session import release_persists

    rows = (
        load_all()["p40_streaming_bloom_manifest"]
        .spark_fn(spark, SF_DIR)
        .collect()
    )
    release_persists()
    assert len(rows) == 9  # 3 batch boundaries x 3 probes
    assert all(r["no_false_negatives"] for r in rows)
    assert all(r["plan_pruned"] for r in rows)
    assert all(
        0 <= r["n_groups_read"] <= r["n_groups_total"] for r in rows
    )
    # arrivals only add: per probe key, cumulative counts are monotone
    seen = {}
    for r in sorted(rows, key=lambda r: (r["o_custkey"], r["batch_seq"])):
        assert r["n_orders"] >= seen.get(r["o_custkey"], 0)
        seen[r["o_custkey"]] = r["n_orders"]
    # bits only get set: the candidate-group count never shrinks
    per_batch = sorted(
        {(r["batch_seq"], r["n_groups_read"]) for r in rows}
    )
    reads = [n for _, n in per_batch]
    assert reads == sorted(reads)
    # the final boundary must find every probe-key order in the table
    # (nfn is engine-asserted per boundary; this pins non-triviality)
    assert sum(r["n_orders"] for r in rows if r["batch_seq"] == 2) > 0


def test_p41_no_resurrection_and_popcount(spark):
    """p41 streaming deletes: live counts are monotone non-increasing
    per status across batch boundaries (deletes only remove), the
    folded popcount equals the arrived delete count at every boundary
    (no lost / double-counted bits — engine-asserted, re-pinned
    here), and the apply stays a broadcast join."""
    from hyppo_worker_spark.queries import load_all
    from hyppo_worker_spark.session import release_persists

    rows = (
        load_all()["p41_streaming_deletion_vectors"]
        .spark_fn(spark, SF_DIR)
        .collect()
    )
    release_persists()
    assert rows and all(r["popcount_equals_arrivals"] for r in rows)
    assert all(r["dv_join_broadcast"] for r in rows)
    last = {}
    for r in sorted(rows, key=lambda r: (r["o_orderstatus"], r["batch_seq"])):
        st = r["o_orderstatus"]
        if st in last:
            assert r["n_live"] <= last[st]
        last[st] = r["n_live"]
    # the churn is real: something was deleted by the final boundary
    assert max(r["n_deleted_cum"] for r in rows) > 0
