"""Streaming retention cohorts: the stateful twin of the batch q42
triangle (cohort_day = a user's first active day; cell (cohort_day,
days_since) counts users active that many days after their cohort).

The hard part under out-of-order delivery is that a LATE earlier event
revises the user's cohort day — which silently shifts the days_since
of every previously known activity day. Emitting provisional cells
and "correcting" them downstream would force a retraction protocol;
instead this operator emits a cell exactly once, only when it can
never change again, using the watermark as the finality frontier:

- the cohort day ``c`` is FINAL once ``c <= wm_day``: every admissible
  future event has ``ts > wm``, hence ``day(ts) >= wm_day >= c``, so
  the minimum cannot decrease;
- an activity-day cell ``d`` is DUPLICATE-SAFE once ``d < wm_day``:
  no future event can land on day ``d`` again, so dropping it from
  state after emission cannot double-emit — the emitted-set needs no
  memory at all;
- a cell is emitted when both hold; everything else stays in the
  per-user pending set, bounded by the disorder horizon (wm catches
  up, pending days drain).

Output rows ``(user_id, cohort_day, days_since)`` are each a distinct
finalized (user, day) activity — the downstream triangle is a plain
``groupBy(cohort_day, days_since).count()`` over the sink, identical
to the batch q42 aggregation (`queries/relational.py:q42`).

Scale shape: state is keyed by user_id (the state store partitions on
it); each micro-batch shuffles only that batch's (user_id, day) rows;
per-user state is one int + the days inside the disorder horizon,
never O(history).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RETENTION_STATE_SCHEMA = "cohort long, pending array<long>"
RETENTION_OUTPUT_SCHEMA = "user_id long, cohort_day date, days_since int"

_US_PER_DAY = 86_400_000_000


def retention_step(
    cohort: int | None,
    pending: list[int],
    new_days: list[int],
    wm_day: int,
) -> tuple[int | None, list[int], list[tuple[int, int]]]:
    """One micro-batch update of a user's retention state.

    Pure function (unit-tested JVM-free). Returns
    ``(cohort', pending', emits)`` where emits are finalized
    ``(cohort_day, days_since)`` cells. Exactly-once emission and
    cohort finality follow the watermark rules in the module doc.
    """
    days = sorted(set(pending) | set(new_days))
    cohort2 = cohort
    if days:
        lo = days[0]
        cohort2 = lo if cohort is None else min(cohort, lo)
    if cohort2 is None or cohort2 > wm_day:
        # cohort still provisional: nothing may emit (a late earlier
        # event could shift every offset)
        return cohort2, days, []
    emits = [(cohort2, d - cohort2) for d in days if d < wm_day]
    keep = [d for d in days if d >= wm_day]
    return cohort2, keep, emits


def _next_timeout_ms(
    cohort: int | None, pending: list[int], wm_day: int
) -> int | None:
    """Event-time wake-up for the next finality transition: groups are
    only invoked when a batch carries their data, so emission on pure
    watermark advance needs a timeout. Provisional cohort → wake when
    the watermark reaches the cohort day (it becomes final); pending
    days → wake when the earliest one becomes duplicate-safe. Both are
    strictly above the current watermark by construction (otherwise
    the transition would already have happened this invocation)."""
    if cohort is None:
        return None
    if cohort > wm_day:
        return cohort * 86_400_000
    if pending:
        return (min(pending) + 1) * 86_400_000
    return None


def _retention_fn(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        cohort, pending = state.get
        pending = list(pending) if pending is not None else []
    else:
        cohort, pending = None, []
    new_days: list[int] = []
    if not state.hasTimedOut:
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            s = pd.to_datetime(pdf["ts"])
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                pass
            us = s.astype("datetime64[us]").astype("int64")
            new_days.extend(int(v) // _US_PER_DAY for v in us)
    wm_day = (state.getCurrentWatermarkMs() * 1000) // _US_PER_DAY
    cohort2, keep, emits = retention_step(cohort, pending, new_days, wm_day)
    # The cohort day is kept FOREVER (one int per user): dropping it
    # after the pending set drains would let a far-future event restart
    # the user with a wrong (later) cohort. That int is the irreducible
    # state of exact retention.
    state.update((cohort2, keep))
    t = _next_timeout_ms(cohort2, keep, wm_day)
    if t is not None:
        state.setTimeoutTimestamp(t)
    if emits:
        yield pd.DataFrame(
            [
                (
                    user_id,
                    pd.Timestamp(c * 86_400, unit="s").date(),
                    off,
                )
                for c, off in emits
            ],
            columns=["user_id", "cohort_day", "days_since"],
        )


def streaming_retention(
    events: DataFrame, *, delay: str = "1 hour"
) -> DataFrame:
    """Finalized retention cells, one append-mode row per distinct
    (user, activity day) once its cohort and day are settled."""
    return (
        events.select("user_id", "ts")
        .withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _retention_fn,
            outputStructType=RETENTION_OUTPUT_SCHEMA,
            stateStructType=RETENTION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def retention_triangle(cells: DataFrame, *, max_offset: int = 7) -> DataFrame:
    """The q42 aggregation over a sink of finalized cells."""
    return (
        cells.filter(F.col("days_since") <= max_offset)
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.col("days_since").cast("bigint").alias("days_since"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort_day", "days_since")
    )
