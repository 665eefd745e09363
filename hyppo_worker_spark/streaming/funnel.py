"""Streaming conversion funnel: the stateful twin of the batch q43
query (chained conditional MINs over signup→view→click→purchase).

Exact funnel semantics are order-sensitive (stage k's time is the
minimum event time strictly after stage k-1's time), and streams
deliver events out of order — a later micro-batch can carry an EARLIER
signup that revises every downstream stage. A naive "advance the
furthest stage" state machine silently computes the wrong funnel on
any out-of-order input.

This operator is exact AND bounded-state, using the watermark as the
finality frontier:

- per (user, stage) the state holds candidate event times; stage k's
  current answer t_k = min candidate > t_{k-1} (t_0 = -inf);
- t_k is FINAL once t_1..t_k are all <= watermark: no admissible late
  event (late events with ts <= watermark are dropped by the
  watermark contract) can revise it;
- compaction per batch: once t_{k-1} is final, stage k keeps only its
  single current answer; while t_{k-1} is still provisional, stage k
  keeps only candidates > watermark — anything older can never beat a
  future threshold, because future thresholds are themselves > the
  watermark.

State is therefore O(#stages + events inside the disorder horizon)
per user — never O(total events). The same recurrence at 100 TB:
state store rows are partitioned by user_id; each micro-batch
shuffles only that batch's events.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_STAGES = ("signup", "view", "click", "purchase")

# one array<long> of candidate epoch-micros per stage
FUNNEL_STATE_SCHEMA = ", ".join(
    f"s{i} array<long>" for i in range(len(FUNNEL_STAGES))
)
FUNNEL_OUTPUT_SCHEMA = (
    "user_id long, stage_reached int, completed_ts timestamp, state_ts long"
)

_NEG_INF = -(1 << 62)


def funnel_step(
    cands: list[list[int]],
    new_by_stage: list[list[int]],
    wm_us: int,
) -> tuple[list[list[int]], int, int | None]:
    """One micro-batch update of the per-user funnel state.

    Pure function (unit-tested JVM-free): merges the batch's event
    times into the per-stage candidate lists, evaluates the chained-min
    recurrence, then compacts using the watermark finality rule.
    Returns (new_state, stage_reached, completed_ts_us).
    """
    merged = [
        sorted(set(cands[i]) | set(new_by_stage[i]))
        for i in range(len(FUNNEL_STAGES))
    ]
    # chained minima: t_k = min candidate > t_{k-1}
    thresholds: list[int | None] = []
    prev: int | None = _NEG_INF
    for lst in merged:
        if prev is None:
            thresholds.append(None)
            continue
        nxt = next((v for v in lst if v > prev), None)
        thresholds.append(nxt)
        prev = nxt
    # finality cascade + compaction
    out: list[list[int]] = []
    prev_final = True  # t_0 = -inf is final
    prev_t: int | None = _NEG_INF
    for k, lst in enumerate(merged):
        t_k = thresholds[k]
        if prev_final and prev_t is not None:
            # threshold below is settled: only the current answer matters
            out.append([t_k] if t_k is not None else [])
        else:
            # provisional: future thresholds are > wm, so only
            # candidates > wm can ever become the answer
            out.append([v for v in lst if v > wm_us])
        prev_final = prev_final and t_k is not None and t_k <= wm_us
        prev_t = t_k
    reached = 0
    completed: int | None = None
    for k, t_k in enumerate(thresholds):
        if t_k is None:
            break
        reached = k + 1
        completed = t_k
    return out, reached, completed


def _ts_to_us(col: pd.Series) -> pd.Series:
    s = pd.to_datetime(col)
    try:
        s = s.dt.tz_localize(None)
    except TypeError:
        pass
    return s.astype("datetime64[us]").astype("int64")


def _funnel_fn(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n_stages = len(FUNNEL_STAGES)
    cands = (
        [list(x) if x is not None else [] for x in state.get]
        if state.exists
        else [[] for _ in range(n_stages)]
    )
    new_by_stage: list[list[int]] = [[] for _ in range(n_stages)]
    stage_idx = {s: i for i, s in enumerate(FUNNEL_STAGES)}
    for pdf in pdfs:
        hit = pdf[pdf["event_type"].isin(FUNNEL_STAGES)]
        if len(hit) == 0:
            continue
        us = _ts_to_us(hit["ts"])
        for et, ts_us in zip(hit["event_type"], us):
            new_by_stage[stage_idx[et]].append(int(ts_us))
    wm_us = state.getCurrentWatermarkMs() * 1000
    new_state, reached, completed_us = funnel_step(cands, new_by_stage, wm_us)
    state.update(tuple(new_state))
    completed = (
        pd.Timestamp(completed_us, unit="us") if completed_us is not None else None
    )
    yield pd.DataFrame(
        [(user_id, reached, completed, sum(len(v) for v in new_state))],
        columns=["user_id", "stage_reached", "completed_ts", "state_ts"],
    )


def streaming_funnel(events: DataFrame, *, delay: str = "1 hour") -> DataFrame:
    """Per-user funnel progress, one row per (user, micro-batch) with
    the post-batch deepest stage and its completion time."""
    return (
        events.select("user_id", "event_type", "ts")
        .withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_fn,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
