"""Hot-key pre-split for watermarked stream-stream joins (VERDICT r7
item 3).

Spark's symmetric hash join keys its four state stores by the join
key: a hot key (one user producing a large share of both streams)
concentrates state AND match fan-out in the single partition that key
hashes to — and unlike a batch join, the layout cannot be fixed
later, because the state-key shape is frozen into the checkpoint at
first run. Skew handling must therefore be a PRE-split, decided
before the query first starts.

The split is the deterministic analog of ``operators/skew.py``'s
salted batch join, adapted to streaming replay semantics:

- the PROBE side of a hot key gets one salt per row, derived from a
  unique column via ``pmod(xxhash64(uniq), splits)`` — deterministic,
  so a micro-batch replay after failure re-derives identical salts
  (``F.rand()`` would break exactly-once);
- the BUILD side's hot rows are REPLICATED to every salt via a
  literal ``sequence(0, splits-1)`` + ``explode`` (cold rows carry
  the single salt 0);
- the join adds ``__salt`` equality to the user's conditions. Each
  qualifying pair matches exactly once: the probe row holds one
  salt, and the build row is present under all of them.

Cost model: build-side hot rows cost ``splits`` x their state (they
live under every salt until the watermark evicts them); hot probe
rows spread 1/splits per partition. Choose the lower-rate side as
build. The hot set must be KNOWN up front (historical stats or a
first-pass sketch) and broadcast-small — the same contract as
``salted_join``; changing it requires a new checkpoint, so size
``splits`` for the hottest key you expect, not the one you have.

Watermarks propagate through both transforms (projection + generator
only — no aggregation), so eviction semantics are unchanged.

Measured (tools/stress_p18_hotkey.py, 10x events corpus with 10% of
rows remapped to one hot user, splits=8): identical 1,114,881 output
pairs, wall 85.3s -> 30.4s, max single-task run time 41.0s -> 13.5s
(plain put 42% of all task-seconds in one task), build-side state
41,141 -> 55,190 rows (the replication cost). Details in SCALE.md
"Round-8 scale mechanisms".
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _hot_array(hot_keys: Sequence) -> Column:
    if not hot_keys:
        raise ValueError("hot_keys must be non-empty; for no known hot "
                         "keys, skip the pre-split entirely")
    return F.array(*[F.lit(k) for k in hot_keys])


def salt_stream_probe(
    df: DataFrame,
    key_col: str,
    uniq_col: str,
    hot_keys: Sequence,
    splits: int,
) -> DataFrame:
    """Probe side: hot-key rows get a deterministic salt in
    [0, splits), derived from ``uniq_col`` so replays re-derive the
    same salt; cold rows get salt 0."""
    return df.withColumn(
        SALT_COL,
        F.when(
            F.array_contains(_hot_array(hot_keys), F.col(key_col)),
            F.pmod(F.xxhash64(F.col(uniq_col)), F.lit(splits)),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )


def replicate_stream_build(
    df: DataFrame,
    key_col: str,
    hot_keys: Sequence,
    splits: int,
) -> DataFrame:
    """Build side: hot-key rows are replicated under every salt in
    [0, splits); cold rows carry only salt 0."""
    # a generator cannot be nested inside other expressions (e.g. a
    # cast), so both branches are int arrays and explode stands alone
    return df.withColumn(
        SALT_COL,
        F.explode(
            F.when(
                F.array_contains(_hot_array(hot_keys), F.col(key_col)),
                F.sequence(F.lit(0), F.lit(splits - 1)),
            ).otherwise(F.array(F.lit(0)))
        ),
    )


def salted_join_condition(left: DataFrame, right: DataFrame) -> Column:
    """``left.__salt == right.__salt`` with explicit frame anchors —
    plain column-name equality is ambiguous after the join."""
    return left[SALT_COL] == right[SALT_COL]
