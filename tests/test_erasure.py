"""erase_rows: GDPR erasure across all retained manifest versions —
every snapshot re-stamped, shared files rewritten once, fail-loud
crash window, idempotency, empty-file survivors."""

from __future__ import annotations

import json
import os

import pytest


def _stage(spark, tmp_path):
    from hyppo_worker_spark.sources.integration_source import (
        FORMAT_NAME,
        register_integration_source,
    )

    register_integration_source(spark)
    tasks = [
        {"task_id": k, "day": f"2024-01-0{k}", "n_rows": 6} for k in (1, 2, 3)
    ]
    out = str(tmp_path / "zone")
    for batch in (tasks[:2], tasks[2:]):
        (
            spark.read.format(FORMAT_NAME)
            .schema("task_id int, day string, seq int, name string, score int")
            .option(
                "fetcher",
                "hyppo_worker_spark.sources.integration_source:"
                "synthetic_events_fetcher",
            )
            .option("tasks", json.dumps(batch))
            .load()
            .write.format(FORMAT_NAME)
            .option("path", out)
            .mode("append")
            .save()
        )
    return out


def _read(spark, out, version=None):
    from hyppo_worker_spark.sources.integration_source import read_committed

    return read_committed(
        spark,
        out,
        "task_id long, day string, seq long, name string, score long",
        version=version,
    )


def test_erasure_hits_every_version_and_is_idempotent(spark, tmp_path):
    from hyppo_worker_spark.sources.integration_source import erase_rows

    out = _stage(spark, tmp_path)
    before_v1 = _read(spark, out, 1).count()
    stats = erase_rows(out, lambda r: r["seq"] % 3 == 0)
    assert stats["rows_erased"] == 6  # 3 tasks x 6 rows, seq 0 and 3
    assert stats["files_rewritten"] == 3
    assert stats["manifests_updated"] >= 3  # v1, v2, latest pointer
    for ver in (1, 2, None):
        df = _read(spark, out, ver)  # checksum gate must pass
        assert df.filter("seq % 3 = 0").count() == 0
    assert _read(spark, out, 1).count() == before_v1 - 4  # 2 tasks x 2 rows
    # idempotent: nothing left to erase, nothing rewritten
    again = erase_rows(out, lambda r: r["seq"] % 3 == 0)
    assert again == {
        "files_rewritten": 0,
        "rows_erased": 0,
        "manifests_updated": 0,
    }


def test_erasure_crash_window_fails_loud(spark, tmp_path):
    """Simulate the crash between data rewrite and manifest re-stamp:
    a manifest whose md5 is stale must make read_committed REFUSE,
    and rerunning the erasure converges (manifests re-stamped)."""
    from hyppo_worker_spark.sources.integration_source import erase_rows

    out = _stage(spark, tmp_path)
    # capture a pre-erasure snapshot of manifest v1
    with open(os.path.join(out, "_MANIFEST-v1.json"), encoding="utf-8") as fh:
        v1_before = fh.read()
    erase_rows(out, lambda r: r["seq"] == 5)
    # forge the crash: v1's manifest reverts to the pre-erasure stamp
    with open(os.path.join(out, "_MANIFEST-v1.json"), "w", encoding="utf-8") as fh:
        fh.write(v1_before)
    with pytest.raises(Exception, match="checksum|md5"):
        _read(spark, out, 1).count()
    # rerunning WITHOUT reconcile must fail loud: the stale v1 entry
    # points at a file THIS run did not rewrite — indistinguishable
    # from corruption, so it is surfaced, not absorbed (no manifest
    # is touched by the failed run)
    from hyppo_worker_spark.sources.integration_source import (
        ErasureReconcileError,
    )

    with pytest.raises(ErasureReconcileError, match="reconcile=True"):
        erase_rows(out, lambda r: r["seq"] == 5)
    with pytest.raises(Exception, match="checksum|md5"):
        _read(spark, out, 1).count()  # still refusing — nothing stamped
    # the EXPLICIT crash-recovery path: reconcile=True accepts the
    # rewritten file content and re-stamps exactly the forged v1
    stats = erase_rows(out, lambda r: r["seq"] == 5, reconcile=True)
    assert stats["rows_erased"] == 0
    assert stats["files_rewritten"] == 0
    assert stats["manifests_updated"] == 1  # exactly the forged v1
    assert _read(spark, out, 1).filter("seq = 5").count() == 0


def test_erasure_surfaces_external_tampering(spark, tmp_path):
    """A data file corrupted by ANYTHING other than this erasure run
    must fail the run by default — re-stamping would launder the
    checksum gate into 'whatever is on disk is authoritative'."""
    from hyppo_worker_spark.sources.integration_source import (
        ErasureReconcileError,
        erase_rows,
    )

    out = _stage(spark, tmp_path)
    # tamper with a committed data file behind the manifest's back
    victim = None
    with open(os.path.join(out, "_MANIFEST-v1.json"), encoding="utf-8") as fh:
        victim = json.load(fh)["files"][0]["file"]
    vpath = os.path.join(out, victim)
    with open(vpath, encoding="utf-8") as fh:
        lines = fh.readlines()
    rec = json.loads(lines[0])
    tampered_task = rec["task_id"]
    rec["score"] = 999_999  # silent value tamper, same row count
    lines[0] = json.dumps(rec) + "\n"
    with open(vpath, "w", encoding="utf-8") as fh:
        fh.writelines(lines)
    # an unrelated erasure (rewrites OTHER tasks' files, never the
    # tampered one) must not bless the tampered file
    other_task = 2 if tampered_task != 2 else 1
    with pytest.raises(ErasureReconcileError, match=victim):
        erase_rows(out, lambda r, t=other_task: r["task_id"] == t)
    # and the checksum gate still rejects reads of the tampered zone
    with pytest.raises(Exception, match="checksum|md5"):
        _read(spark, out, 1).count()


def test_erasure_can_empty_a_file(spark, tmp_path):
    from hyppo_worker_spark.sources.integration_source import erase_rows

    out = _stage(spark, tmp_path)
    erase_rows(out, lambda r: r["task_id"] == 3)  # task 3's whole file
    assert _read(spark, out, 2).filter("task_id = 3").count() == 0
    # v2 still readable (empty file md5 matches), totals consistent
    assert _read(spark, out, 2).count() == 12
    assert _read(spark, out, 1).count() == 12  # task 3 was only in v2


def test_erasure_random_predicates_match_filter(spark, tmp_path):
    """Property-style sweep (deterministic seeds, no Spark restage per
    case): for random erasure predicates over random task layouts, the
    post-erasure zone at EVERY version equals filtering the regenerated
    rows — and checksums stay green throughout successive erasures
    applied to the same zone (composition: erase A then B == erase
    A-or-B)."""
    import random

    from hyppo_worker_spark.sources.integration_source import erase_rows

    rng = random.Random(9)
    out = _stage(spark, tmp_path)  # v1: tasks 1,2 / v2: +task 3, 6 rows each

    def rows_at(ver):
        return {
            (r.task_id, r.seq)
            for r in _read(spark, out, ver).select("task_id", "seq").collect()
        }

    # ground truth: regenerate the fetcher's rows per version
    full = {1: {(t, s) for t in (1, 2) for s in range(6)},
            2: {(t, s) for t in (1, 2, 3) for s in range(6)}}
    erased: set[tuple[int, int]] = set()
    for _ in range(4):
        t_pick = rng.choice([1, 2, 3])
        s_pick = rng.randrange(6)
        pred = lambda r, t=t_pick, s=s_pick: (
            r["task_id"] == t and r["seq"] >= s
        )
        erased |= {(t_pick, s) for s in range(s_pick, 6)}
        erase_rows(out, pred)
        for ver in (1, 2):
            assert rows_at(ver) == full[ver] - erased, (t_pick, s_pick)


def test_nonpure_predicate_fails_loud_before_stamping(spark, tmp_path):
    """A should_erase whose answer drifts between the read-only
    pre-pass and the rewrite is detected by comparing the stamped-to-
    be digest with the digest of the bytes actually written — the run
    fails LOUD before any manifest is stamped (the zone keeps failing
    checksums, the documented crash-window semantics) instead of
    stamping an md5 that matches nothing (ADVICE r11)."""
    import glob

    from hyppo_worker_spark.sources.integration_source import (
        ErasureReconcileError,
        erase_rows,
    )

    out = _stage(spark, tmp_path)
    with open(os.path.join(out, "_MANIFEST.json"), encoding="utf-8") as fh:
        stamps_before = json.load(fh)

    def impure(r):
        # flips while stage 2's own tmp file exists -> stage-2 bytes
        # differ from the pre-pass prediction, deterministically
        drift = bool(glob.glob(os.path.join(out, "*.tmp")))
        return (r["seq"] % 3 == 0) != drift

    with pytest.raises(ErasureReconcileError, match="pure"):
        erase_rows(out, impure)
    # no manifest stamped: the head manifest is byte-identical
    with open(os.path.join(out, "_MANIFEST.json"), encoding="utf-8") as fh:
        assert json.load(fh) == stamps_before


def test_distributed_and_sequential_paths_agree(spark, tmp_path):
    """The one-task-per-file Spark path (active session) and the
    sequential fallback produce identical stats and identical
    committed content across every retained version."""
    from hyppo_worker_spark.sources.integration_source import erase_rows

    out_a = _stage(spark, tmp_path / "a")
    out_b = _stage(spark, tmp_path / "b")
    stats_a = erase_rows(out_a, lambda r: r["seq"] % 3 == 0)

    # force the sequential path by hiding the active session from the
    # helper for the duration of the second run
    from unittest import mock

    from pyspark.sql import SparkSession

    with mock.patch.object(
        SparkSession, "getActiveSession", staticmethod(lambda: None)
    ):
        stats_b = erase_rows(out_b, lambda r: r["seq"] % 3 == 0)
    assert stats_a == stats_b
    # file NAMES are per-staging-run uuids, but the committed CONTENT
    # of every retained version must agree (checksums re-verified by
    # read_committed on both zones)
    for version in (1, 2, None):
        rows_a = sorted(map(tuple, _read(spark, out_a, version).collect()))
        rows_b = sorted(map(tuple, _read(spark, out_b, version).collect()))
        assert rows_a == rows_b and rows_a
