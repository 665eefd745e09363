"""Property test for the `session_window` semantics the q63/p24
oracles encode: sessions are [start, last + gap) ranges that merge
when the next event's range overlaps OR TOUCHES (Spark's rule is
new.start <= prev.end), so a new session starts iff the gap is
STRICTLY greater than the gap duration. This test CAUGHT the
oracles' original `>=` form — equivalent on the real corpus only
because microsecond timestamps never produce an exact-gap pair.
Random small event sets — including planted exact-gap
and equal-timestamp collisions — must match a pure-Python
gaps-and-islands model event-for-event.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

GAP_S = 600
BASE = 1_700_000_000

# timestamps drawn from multiples of GAP_S/2 so exact-gap boundaries
# and equal timestamps occur constantly, plus a few odd offsets
_ts = st.integers(min_value=0, max_value=12).map(lambda k: k * (GAP_S // 2))
_events = st.lists(
    st.tuples(st.integers(min_value=0, max_value=2), _ts),
    min_size=1,
    max_size=25,
)


def _model(events: list[tuple[int, int]]) -> set[tuple[int, int, int, int]]:
    """(user, session_start_s, n_events, ts_sum) via gaps-and-islands:
    a new session iff the gap to the previous event is STRICTLY
    greater than GAP_S (Spark merges ranges that touch exactly)."""
    out = set()
    by_user: dict[int, list[int]] = {}
    for u, t in events:
        by_user.setdefault(u, []).append(t)
    for u, ts in by_user.items():
        ts.sort()
        start, n, s, prev = ts[0], 0, 0, None
        for t in ts:
            if prev is not None and t - prev > GAP_S:
                out.add((u, start, n, s))
                start, n, s = t, 0, 0
            n += 1
            s += t
            prev = t
        out.add((u, start, n, s))
    return out


@settings(max_examples=8, deadline=None)
@given(_events)
def test_session_window_matches_gaps_and_islands(spark, events):
    df = spark.createDataFrame(
        [(u, BASE + t) for u, t in events], "u long, sec long"
    ).select("u", F.timestamp_seconds("sec").alias("ts"), "sec")
    got = {
        (
            r["u"],
            r["start_s"] - BASE,
            r["n"],
            r["ts_sum"] - BASE * r["n"],
        )
        for r in (
            df.groupBy(F.session_window("ts", f"{GAP_S} seconds"), "u")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("sec").alias("ts_sum"))
            .select(
                "u",
                "n",
                "ts_sum",
                F.unix_timestamp("session_window.start").alias("start_s"),
            )
            .collect()
        )
    }
    assert got == _model(events)
