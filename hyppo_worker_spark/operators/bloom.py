"""Relational Bloom filter: a mergeable bitmap sketch for semi-join
pre-filtering (runtime filters), kept as a DataFrame instead of an
opaque JVM blob.

Spark's own runtime bloom filters (`InjectRuntimeFilter`) are planner
internals: they cannot be persisted, merged across shards, or probed
from SQL, and their hash is not portable across engines. This operator
keeps the filter RELATIONAL — a ``(word, bits_w)`` table of packed
32-bit words — so it is

- **mergeable**: filters of shards/days/batches combine by
  ``bit_or`` per word (the same incremental contract as the HLL/CMS/
  KMV/quantile sketches — this completes the mergeable-summary family
  with the MEMBERSHIP sketch);
- **probe-able in-plan**: membership = every one of the k hash bits
  set, evaluated as k broadcast joins against the word table — the
  probe side stays NARROW and unshuffled, no explode, no groupBy, so
  the filter composes as a map-side pre-filter in front of a big join
  exactly like the engine-internal runtime filter would;
- **engine-portable**: bit placement is the shared md5_bucket
  primitive, so a DuckDB oracle reproduces every word and every
  membership verdict bit-for-bit (false positives included — the
  classic (1-e^{-kn/m})^k rate, Bloom 1970, a public algorithm).

Scale shape: the build side collapses to ``bits/32`` words (8 KiB of
longs at the default 2^16 bits) regardless of build cardinality — it
broadcasts anywhere. The probe side is never shuffled: each of the k
probes is a broadcast hash join on an int key, all inside one codegen
stage. No false negatives by construction (every inserted key's bits
are set by its own inserts); the false-positive count is
data-dependent but DETERMINISTIC given the hash family, so
cross-engine value hashes still match.

Word size is 32 bits (packed into BIGINT) so ``1 << (pos % 32)`` stays
positive in both engines — a 64-bit word would need ``1 << 63``, whose
signed overflow behavior is not a portability bet worth making.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hyppo_worker_spark.functions import text as TX

WORD_BITS = 32


def _position(key: Column, i: int, bits: int) -> Column:
    """Hash i of ``key`` → bit position in [0, bits)."""
    return TX.md5_bucket(F.concat(F.lit(f"{i}:"), key.cast("string")), bits)


def bloom_position_sql(key_sql: str, i_sql: str, bits: int) -> str:
    """DuckDB expression identical to :func:`_position` (embeds the
    shared md5_bucket NULL-coalesce convention; ``i_sql`` may be a
    column, e.g. from ``range(k) r(i)``)."""
    return TX.md5_bucket_sql(f"({i_sql})::VARCHAR || ':' || ({key_sql})::VARCHAR", bits)


def bloom_build(
    df: DataFrame,
    key_col: str,
    *,
    bits: int = 1 << 16,
    hashes: int = 3,
    shard_col: str | None = None,
) -> DataFrame:
    """Build the packed word table ``(word, bits_w)`` from the build
    side's keys (input keys need not be distinct). One narrow shuffle
    keyed by the word index — at most ``bits/32`` groups.

    With ``shard_col`` the result is ``(shard, word, bits_w)`` — one
    filter per shard, built in the same single pass; feed it to
    :func:`bloom_merge` for the global filter. This is the
    incremental-ingest contract: shards never re-read each other,
    their bitmaps just OR.
    """
    key = F.col(key_col)
    pos = F.explode(
        F.array(*[_position(key, i, bits) for i in range(hashes)])
    ).alias("pos")
    shard = [shard_col] if shard_col else []
    return (
        df.select(*shard, pos)
        .select(
            *shard,
            F.expr(f"CAST(pos div {WORD_BITS} AS INT)").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {WORD_BITS} AS INT))"
            ).alias("bit"),
        )
        .groupBy(*shard, "word")
        .agg(F.bit_or("bit").alias("bits_w"))
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Union filters into one: bitmaps OR per word. Accepts plain
    ``(word, bits_w)`` tables or sharded ones (extra columns are
    dropped)."""
    out = filters[0].select("word", "bits_w")
    for t in filters[1:]:
        out = out.unionByName(t.select("word", "bits_w"))
    return out.groupBy("word").agg(F.bit_or("bits_w").alias("bits_w"))


def bloom_might_contain(
    words: DataFrame,
    probes: DataFrame,
    key_col: str,
    *,
    bits: int = 1 << 16,
    hashes: int = 3,
    out_col: str = "bloom_pass",
) -> DataFrame:
    """Add a boolean ``out_col`` to ``probes``: True iff all k hash
    bits of ``probes[key_col]`` are set in the filter.

    Plan shape: k broadcast LEFT joins of the (tiny) word table onto
    the probe stream — the probe side is never shuffled or exploded,
    so this composes as a map-side pre-filter in front of a shuffle
    join, which is the whole point of a runtime filter at 100 TB.
    """
    key = F.col(key_col)
    out = probes
    checks = []
    for i in range(hashes):
        out = out.withColumn(f"_bf_pos_{i}", _position(key, i, bits))
        w = words.select(
            F.col("word").alias(f"_bf_word_{i}"),
            F.col("bits_w").alias(f"_bf_bits_{i}"),
        )
        out = out.join(
            F.broadcast(w),
            F.expr(f"CAST(_bf_pos_{i} div {WORD_BITS} AS INT) = _bf_word_{i}"),
            "left",
        )
        checks.append(
            F.expr(
                f"_bf_bits_{i} IS NOT NULL AND "
                f"(_bf_bits_{i} & shiftleft(CAST(1 AS BIGINT), "
                f"CAST(_bf_pos_{i} % {WORD_BITS} AS INT))) != 0"
            )
        )
    passed = checks[0]
    for c in checks[1:]:
        passed = passed & c
    keep = [c for c in probes.columns]
    return out.select(*keep, passed.alias(out_col))


def bloom_candidates(
    manifest: DataFrame,
    probes: DataFrame,
    key_col: str,
    *,
    shard_col: str = "fid",
    bits: int = 1 << 16,
    hashes: int = 3,
) -> DataFrame:
    """(key, shard) pairs where the shard's filter MIGHT contain the
    key — the file-skipping probe over a sharded manifest (one filter
    per file group, built by ``bloom_build(shard_col=...)``).

    A probe passes a shard iff ALL k of its hash bits are set in that
    shard's words: explode the k positions (k rows per probe — the
    probe set is tiny by contract: point-lookup keys), join the
    manifest on the word index, keep set bits, and count per (key,
    shard) — k passing rows ⇔ membership (duplicate positions pass
    together, so the count stays exact). No false negatives by
    construction; false positives are deterministic given the md5
    hash family, so a DuckDB oracle reproduces the exact candidate
    set. At 100 TB this is the Iceberg/Delta file-level bloom-index
    pattern: membership pruning on a HIGH-CARDINALITY NON-PARTITION
    column that zonemaps (min/max, q54) and partition pruning cannot
    skip on."""
    key = F.col(key_col)
    pos = probes.select(
        key.alias("__key"),
        F.explode(
            F.array(*[_position(key, i, bits) for i in range(hashes)])
        ).alias("pos"),
    ).select(
        "__key",
        F.expr(f"CAST(pos div {WORD_BITS} AS INT)").alias("word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {WORD_BITS} AS INT))"
        ).alias("bit"),
    )
    hits = (
        pos.join(F.broadcast(manifest), "word")
        .filter((F.col("bits_w").bitwiseAND(F.col("bit"))) != 0)
        .groupBy("__key", shard_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") == hashes)
    )
    return hits.select(F.col("__key").alias(key_col), shard_col)
