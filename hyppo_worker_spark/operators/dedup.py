"""Deduplication operators for large text corpora.

Three tiers, all shuffle-efficient:

- **exact**: hash-groupBy on a content digest — one shuffle keyed by
  the digest; at 100 TB the digest (16 bytes) shuffles, never the text.
- **MinHash + LSH**: signature per doc (one scan, no shuffle), explode
  into band buckets (fan-out = #bands), groupBy band bucket → pairs
  only within buckets. The all-pairs comparison never materializes;
  cost is Σ bucket² which LSH keeps near-linear for real corpora.
- **SimHash**: a single 16/64-bit sketch per doc; near-dup candidates
  share a band of the sketch.

Reference parity note: hyppo-worker has no dedup operators (its data
plane is opaque Avro files — SURVEY.md §2.4); these are the
training-data-pipeline extensions the Spark engine adds as
first-class operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hyppo_worker_spark.functions import text as TX


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical documents: (content_hash, canonical_id,
    n_copies) for every group with more than one copy.

    The only shuffle is on the 32-hex digest; map-side partial
    aggregation collapses per-partition copies before the exchange.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep exactly one row (minimum id) per distinct text.

    Implemented as min-id-per-digest + semi-join rather than a window
    over the full rows: the wide document payload never shuffles, only
    (digest, id) pairs do.
    """
    keep = (
        df.select(F.md5(F.col(text_col)).alias("h"), F.col(id_col).alias("keep_id"))
        .groupBy("h")
        .agg(F.min("keep_id").alias("keep_id"))
        .select("keep_id")
    )
    return df.join(keep, df[id_col] == keep.keep_id, "left_semi")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 12,
    bands: int = 6,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs via MinHash signatures + LSH banding,
    verified with exact Jaccard over the shingle sets.

    Plan shape (scale path — fully row-oriented so every md5 runs once
    inside whole-stage codegen, not inside nested array lambdas that
    Catalyst would inline per signature element):
      1. explode shingles → (doc, shingle) rows; cross a tiny seed
         range → vectorized md5 per (seed, shingle);
      2. partial+final min per (doc, seed) — one shuffle on doc id;
      3. conditional-agg the per-seed minima into band keys →
         (doc, band_id, band_key);
      4. self-join inside band buckets (id < id) → candidate pairs;
      5. join candidates back to the shingle arrays → exact Jaccard ≥
         threshold.
    Hot buckets (identical band shared by many docs) are the classic
    LSH skew; AQE skew-join splitting handles moderate cases.
    """
    rows_per_band = num_hashes // bands
    toks = TX.tokens(text_col)
    # Persist the narrow (id, shingles) projection: it is referenced by
    # three plan branches (banding + both sides of the verify join);
    # without the materialization barrier Catalyst inlines the large
    # tokenize/shingle expression into every stage, which both
    # recomputes it and produces pathologically large codegen units.
    # Two-level persist: materializing the token array first keeps the
    # shingle expression referencing a plain column — the collapsed
    # single-expression form generates pathologically large codegen
    # (measured ~15x slower to compile than executing it).
    words = df.select(F.col(id_col).alias("did"), toks.alias("w")).persist()
    docs = words.select(
        "did", TX.shingles(F.col("w"), shingle_n).alias("sh")
    ).persist()

    seeds = df.sparkSession.range(num_hashes).select(F.col("id").cast("int").alias("seed"))
    # Numeric 60-bit hash (top 15 hex digits of md5): min() over a
    # fixed-width type keeps the aggregation in HashAggregate
    # (min over strings falls back to SortAggregate).
    minima = (
        docs.select("did", F.explode("sh").alias("s"))
        .join(F.broadcast(seeds))
        .select(
            "did",
            "seed",
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("seed").cast("string"), F.lit(":"), F.col("s"))),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("h"),
        )
        .groupBy("did", "seed")
        .agg(F.min("h").alias("minh"))
    )
    band_cols = [
        F.max(F.when(F.col("seed") % rows_per_band == r, F.col("minh")))
        for r in range(rows_per_band)
    ]
    # Persisted: the candidate self-join consumes it twice.
    banded = (
        minima.withColumn("band_id", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("did", "band_id")
        .agg(F.concat_ws("|", *band_cols).alias("band_key"))
    ).persist()

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.did") < F.col("r.did")),
        )
        .select(F.col("l.did").alias("a_id"), F.col("r.did").alias("b_id"))
        .distinct()
    )

    sa = docs.select(F.col("did").alias("a_id"), F.col("sh").alias("sh_a"))
    sb = docs.select(F.col("did").alias("b_id"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("jaccard", F.round(TX.jaccard(F.col("sh_a"), F.col("sh_b")), 3))
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def simhash_sketches(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document 16-bit SimHash sketch (id, simhash).

    Row-oriented: explode distinct tokens, hash each token ONCE, then
    16 conditional sums in a single hash aggregate (one shuffle on
    doc id). Bit j is set iff the majority of token hashes have bit
    (j % 4) of hex digit j set — the same formula as
    ``functions.text.simhash16``, but with per-row expressions small
    enough for fast codegen and linear scaling.
    """
    base = df.select(F.col(id_col).alias("did"))
    hashes = df.select(
        F.col(id_col).alias("did"),
        F.explode(F.array_distinct(TX.tokens(text_col))).alias("w"),
    ).select("did", F.md5("w").alias("h"))
    aggs = [F.count(F.lit(1)).alias("n")]
    for j in range(16):
        hexval = F.conv(F.substring("h", j + 1, 1), 16, 10).cast("int")
        bit = (hexval / F.lit(2 ** (j % 4))).cast("int") % 2
        aggs.append(F.sum(bit).alias(f"ones{j}"))
    per_doc = hashes.groupBy("did").agg(*aggs)
    sim = F.lit(0)
    for j in range(16):
        sim = sim + F.when(
            2 * F.col(f"ones{j}") > F.col("n"), F.lit(1 << j)
        ).otherwise(F.lit(0))
    per_doc = per_doc.select("did", sim.cast("long").alias("simhash"))
    return base.join(per_doc, "did", "left").select(
        F.col("did").alias(id_col),
        F.coalesce("simhash", F.lit(0)).cast("long").alias("simhash"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    shingle_n: int = 3,
    threshold: float = 0.5,
    bucket_hashes: int = 4,
) -> DataFrame:
    """N-gram Jaccard near-dup pairs using a min-k sketch bucket join
    (docs sharing any of their ``bucket_hashes`` smallest shingle
    hashes become candidates — guaranteed to cover any pair with
    Jaccard above ~1/bucket_hashes in expectation, cheaper than LSH
    for midsize corpora)."""
    toks = TX.tokens(text_col)
    # Two-level persist, same rationale as minhash_lsh_pairs.
    words = df.select(F.col(id_col).alias("did"), toks.alias("w")).persist()
    docs = words.select(
        "did", TX.shingles(F.col("w"), shingle_n).alias("sh")
    ).persist()
    docs = docs.withColumn(
        "mins", F.slice(F.array_sort(F.transform(F.col("sh"), F.md5)), 1, bucket_hashes)
    )
    b = docs.select("did", F.explode("mins").alias("mh"))
    cand = (
        b.alias("l")
        .join(b.alias("r"), (F.col("l.mh") == F.col("r.mh")) & (F.col("l.did") < F.col("r.did")))
        .select(F.col("l.did").alias("a_id"), F.col("r.did").alias("b_id"))
        .distinct()
    )
    sa = docs.select(F.col("did").alias("a_id"), F.col("sh").alias("sh_a"))
    sb = docs.select(F.col("did").alias("b_id"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("jaccard", F.round(TX.jaccard(F.col("sh_a"), F.col("sh_b")), 3))
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def connected_components(edges: DataFrame, src: str = "a_id", dst: str = "b_id", max_iter: int = 20) -> DataFrame:
    """Connected components over an undirected edge list:
    (node, component) where component = minimum node id reachable.

    Iterative min-label propagation: each round every node takes the
    minimum label among itself and its neighbors; converges in
    O(component diameter) rounds. Each round is one shuffle on node
    id — the standard large-graph pattern (a real 100 TB deployment
    would use the large-star/small-star optimization; the fixpoint
    loop and convergence check are the same).

    Near-dup pairs from MinHash/LSH feed this to turn pairwise matches
    into dedup clusters with a canonical (minimum) document per
    cluster.
    """
    both = (
        edges.select(F.col(src).alias("eu"), F.col(dst).alias("ev"))
        .unionByName(edges.select(F.col(dst).alias("eu"), F.col(src).alias("ev")))
        .distinct()
        .persist()
    )
    labels = (
        both.select(F.col("eu").alias("node")).distinct().withColumn(
            "comp", F.col("node")
        )
    ).persist()
    for _ in range(max_iter):
        neighbor_min = (
            both.join(labels, F.col("ev") == F.col("node"), "inner")
            .select(F.col("eu").alias("nnode"), F.col("comp"))
            .groupBy("nnode")
            .agg(F.min("comp").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, F.col("node") == F.col("nnode"), "left")
            .select(
                F.col("node"),
                F.least(
                    F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))
                ).alias("comp"),
            )
        ).persist()
        changed = (
            new_labels.select(F.col("node").alias("n_node"), F.col("comp").alias("n_comp"))
            .join(
                labels.select(F.col("node").alias("o_node"), F.col("comp").alias("o_comp")),
                F.col("n_node") == F.col("o_node"),
            )
            .filter(F.col("n_comp") != F.col("o_comp"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", "comp")
