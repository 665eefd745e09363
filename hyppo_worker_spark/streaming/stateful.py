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


# ---------------------------------------------------------------------------
# Spark 4 transformWithState: the successor API to applyInPandasWithState
# with FIRST-CLASS composite state — multiple named state variables per
# key instead of one encoded tuple. The profile below keeps a ValueState
# (running totals) AND a MapState (per-event-type counts) for each user;
# under the old API the map would have to be serialized into the single
# state tuple by hand. State still lives in the checkpointed state store
# partitioned by key: one ValueState row + one MapState entry per
# (user, type) — bounded by key cardinality, never by event count.
# ---------------------------------------------------------------------------
PROFILE_OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, "
    "n_types long, top_type string"
)

try:  # pragma: no cover - import guard exercised via module import
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    class UserProfileProcessor(StatefulProcessor):
        """Per-user profile: running totals (ValueState) + per-type
        event counts (MapState); emits the post-batch profile row with
        the dominant event type (ties break lexicographically)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n_events LONG, total_value DOUBLE"
            )
            self._type_counts = handle.getMapState(
                "type_counts", "event_type STRING", "n LONG"
            )

        def handleInputRows(
            self, key, rows, timerValues: TimerValues
        ):
            (user_id,) = key
            n, total = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                for et, cnt in pdf.groupby("event_type").size().items():
                    prev = (
                        self._type_counts.getValue((et,))[0]
                        if self._type_counts.containsKey((et,))
                        else 0
                    )
                    self._type_counts.updateValue((et,), (prev + int(cnt),))
            self._totals.update((n, round(total, 6)))
            counts = {
                k[0]: v[0] for k, v in self._type_counts.iterator()
            }
            # Dominant type: max count, ties to the lexicographically
            # last name (tuple max) — deterministic across runs.
            top_type = (
                max(counts, key=lambda t: (counts[t], t)) if counts else None
            )
            yield pd.DataFrame(
                [
                    (
                        user_id,
                        n,
                        round(total, 2),
                        len(counts),
                        top_type,
                    )
                ],
                columns=[
                    "user_id",
                    "n_events",
                    "total_value",
                    "n_types",
                    "top_type",
                ],
            )

        def close(self) -> None:
            pass

    HAS_TRANSFORM_WITH_STATE = True
except ImportError:  # pragma: no cover - older Spark
    HAS_TRANSFORM_WITH_STATE = False


def _has_protobuf() -> bool:
    """The transformWithState Python state-server speaks protobuf to
    the JVM; without the ``google.protobuf`` package the runner
    crashes at init (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE).
    Probed here so the operator fails with a clear gate instead."""
    try:  # pragma: no cover - trivially environment-dependent
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def user_event_profiles(events: DataFrame) -> DataFrame:
    """Per-user event profiles via Spark 4 ``transformWithStateInPandas``
    (composite keyed state: ValueState totals + MapState type counts).

    ENVIRONMENT GATE: needs Spark >= 4.0 AND the ``protobuf`` Python
    package (absent from this container). The processor logic itself
    is exercised JVM-free in tests by driving ``UserProfileProcessor``
    with fake state handles; ``stateful_running_totals`` is the
    fully-runnable ``applyInPandasWithState`` equivalent."""
    if not HAS_TRANSFORM_WITH_STATE:
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark >= 4.0"
        )
    if not _has_protobuf():
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf package for "
            "its Python state server — not in this container; use "
            "stateful_running_totals (applyInPandasWithState) instead"
        )
    return events.groupBy("user_id").transformWithStateInPandas(
        UserProfileProcessor(),
        outputStructType=PROFILE_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
