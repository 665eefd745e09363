"""Custom stateful streaming operators via ``applyInPandasWithState``.

The escape hatch for stream semantics the built-in windowed aggs can't
express: per-key state that evolves across micro-batches with explicit
timeout control. State lives in the state store (checkpointed,
partitioned by key) — the scale contract is one state row per key,
never per event.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_STATE_SCHEMA = "n_events long, total_value double"
RUNNING_OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, batch_events long"
)


def _running_totals_fn(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Accumulate per-user event count + value sum across batches."""
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    batch_events = 0
    for pdf in pdfs:
        batch_events += len(pdf)
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, round(total, 6)))
    yield pd.DataFrame(
        [(user_id, n, round(total, 2), batch_events)],
        columns=["user_id", "n_events", "total_value", "batch_events"],
    )


def stateful_running_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals as explicit keyed state — emits one row
    per (user, micro-batch) with the post-batch cumulative state."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _running_totals_fn,
            outputStructType=RUNNING_OUTPUT_SCHEMA,
            stateStructType=RUNNING_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
