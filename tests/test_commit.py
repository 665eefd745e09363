"""MarkedTableCommitter recovery semantics (streaming/commit.py).

The replay invariant: an UNMARKED batch will be re-applied by
Structured Streaming after restart, so recover() must always leave the
PRE-batch table generation in place — including the window where the
staged swap fully completed but the crash hit before the marker write
(ADVICE r5: keeping the post-batch table there double-applies the
replay). Generation ids compare numerically, not lexicographically.
"""

from __future__ import annotations

import os

from hyppo_worker_spark.streaming.commit import MarkedTableCommitter


def _mkgen(path: str, tag: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "gen.txt"), "w") as f:
        f.write(tag)


def _gen(path: str) -> str:
    with open(os.path.join(path, "gen.txt")) as f:
        return f.read()


def test_recover_rolls_back_unmarked_swap(tmp_path):
    # crash AFTER swap, BEFORE marker: table holds the post-batch
    # generation, .old-<id> holds pre-batch, marker absent
    table = str(tmp_path / "t")
    c = MarkedTableCommitter(table, str(tmp_path / "m"))
    _mkgen(table, "post-batch-3")
    _mkgen(table + ".old-3", "pre-batch-3")
    c.recover()
    # the replay of batch 3 must see the PRE-batch table
    assert _gen(table) == "pre-batch-3"
    assert not os.path.exists(table + ".old-3")


def test_recover_keeps_table_when_newest_old_is_marked(tmp_path):
    # crash AFTER marker, BEFORE the old-generation cleanup: the swap
    # was fully acked, so the post-batch table stays and the stale
    # .old dir is garbage
    table = str(tmp_path / "t")
    c = MarkedTableCommitter(table, str(tmp_path / "m"))
    _mkgen(table, "post-batch-4")
    _mkgen(table + ".old-4", "pre-batch-4")
    c.mark_only(4)
    c.recover()
    assert _gen(table) == "post-batch-4"
    assert not os.path.exists(table + ".old-4")


def test_recover_mid_swap_restores_table(tmp_path):
    # crash mid-swap: current renamed out, staging never renamed in
    table = str(tmp_path / "t")
    c = MarkedTableCommitter(table, str(tmp_path / "m"))
    _mkgen(table + ".old-5", "pre-batch-5")
    _mkgen(table + ".staging-5", "half-written")
    c.recover()
    assert _gen(table) == "pre-batch-5"
    assert not os.path.exists(table + ".old-5")
    assert not os.path.exists(table + ".staging-5")


def test_recover_generation_order_is_numeric(tmp_path):
    # lexicographic sort would put old-9 after old-10 and treat the
    # MARKED batch 9 as newest, silently keeping the double-apply
    # window open for batch 10
    table = str(tmp_path / "t")
    c = MarkedTableCommitter(table, str(tmp_path / "m"))
    _mkgen(table, "post-batch-10")
    _mkgen(table + ".old-9", "pre-batch-9")  # stale, marker present
    c.mark_only(9)
    _mkgen(table + ".old-10", "pre-batch-10")  # crashed, no marker
    c.recover()
    assert _gen(table) == "pre-batch-10"  # rolled back, not old-9
    assert not os.path.exists(table + ".old-9")
    assert not os.path.exists(table + ".old-10")
