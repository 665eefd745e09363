"""MERGE/upsert and SCD2 emulation without a table format.

Delta/Iceberg's MERGE INTO isn't available without their jars; the
engine provides the same semantics as pure DataFrame composition,
applicable to any parquet-backed dimension:

- ``merge_upsert``: last-writer-wins upsert — source rows replace
  matching target rows (by key), unmatched source rows insert. One
  anti-join + union: both sides shuffle once on the key.
- ``scd2_apply``: slowly-changing-dimension type 2 — changed rows
  close the current version (valid_to set) and append a new open
  version; history is preserved.

At 100 TB the rewrite targets only affected partitions in practice
(partition the dimension by a stable bucket of the key and rewrite
touched buckets — the compaction operator handles the file hygiene).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    order_col: str | None = None,
) -> DataFrame:
    """Upsert source into target by key (source wins on match).

    Last-writer-wins requires one writer per key in the batch: if the
    source can carry duplicate keys, pass ``order_col`` (the
    last-writer ordering, e.g. an update timestamp) and only the
    highest-ordered source row per key survives — otherwise every
    duplicate would pass the anti-join union and the merged dimension
    would hold duplicate keys. Without ``order_col`` the source must
    already be key-unique (the caller's contract).

    Ties on ``order_col`` within a key are broken deterministically by
    a stable hash of the full row — without this, ``row_number``'s
    winner would depend on partition-scan order and could differ
    across runs/engines, breaking the deterministic last-writer-wins
    contract.
    """
    if order_col is not None:
        tiebreak = F.xxhash64(*[F.col(c) for c in source.columns])
        w = W.partitionBy(key).orderBy(F.col(order_col).desc(), tiebreak.desc())
        source = (
            source.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    kept = target.join(source.select(key), key, "left_anti")
    return kept.unionByName(source)


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    compare_cols: list[str],
    effective_col: str = "valid_from",
    end_col: str = "valid_to",
    version_ts: str = "9999-12-31 00:00:00",
    new_ts: str | None = None,
) -> DataFrame:
    """Type-2 merge: rows in ``updates`` whose compared columns differ
    from the open version get that version closed (``valid_to`` =
    ``new_ts``) and a new open version appended.

    ``current`` must carry ``valid_from``/``valid_to`` columns with the
    open version marked by ``valid_to == version_ts``.
    """
    assert new_ts is not None, "pass the batch timestamp explicitly (determinism)"
    open_rows = current.filter(F.col(end_col) == version_ts)
    closed_rows = current.filter(F.col(end_col) != version_ts)

    cmp_cond = None
    for c in compare_cols:
        ne = F.col(f"cur.{c}") != F.col(f"upd.{c}")
        cmp_cond = ne if cmp_cond is None else (cmp_cond | ne)

    joined = open_rows.alias("cur").join(
        updates.alias("upd"), F.col(f"cur.{key}") == F.col(f"upd.{key}"), "left"
    )
    unchanged = joined.filter(
        F.col(f"upd.{key}").isNull() | ~cmp_cond
    ).select("cur.*")
    to_close = joined.filter(F.col(f"upd.{key}").isNotNull() & cmp_cond).select("cur.*")
    closed_now = to_close.withColumn(end_col, F.lit(new_ts))

    changed_keys = to_close.select(F.col(key)).distinct()
    new_versions = (
        updates.join(changed_keys, key, "left_semi")
        .withColumn(effective_col, F.lit(new_ts))
        .withColumn(end_col, F.lit(version_ts))
    )
    brand_new = (
        updates.join(open_rows.select(key), key, "left_anti")
        .withColumn(effective_col, F.lit(new_ts))
        .withColumn(end_col, F.lit(version_ts))
    )
    cols = current.columns
    return (
        closed_rows.select(cols)
        .unionByName(unchanged.select(cols))
        .unionByName(closed_now.select(cols))
        .unionByName(new_versions.select(cols))
        .unionByName(brand_new.select(cols))
    )
