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

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hyppo_worker_spark.session import local_frame, tracked_persist

from hyppo_worker_spark.functions import text as TX
from hyppo_worker_spark.functions import vectors as V


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


# Multiply-mod-prime universal hash family for MinHash signatures.
# The constants are a pure function of the seed index so the DuckDB
# oracles (built as f-strings) interpolate the SAME values — the two
# engines then agree bit-for-bit on every signature element.
MINHASH_PRIME = 2147483647  # 2^31 - 1


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs, a_i != 0 mod p."""
    return [
        (
            (i * 2654435761 + 1) % MINHASH_PRIME,
            (i * 40503 + 9973) % MINHASH_PRIME,
        )
        for i in range(num_hashes)
    ]


def _verify_pairs(docs: DataFrame, cand: DataFrame, threshold: float) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs.

    Row-oriented co-group: intersection sizes come from an equi-join of
    exploded (doc, shingle) rows keyed (a_id, b_id, shingle), so the
    shuffle carries narrow rows for CANDIDATE docs only — never both
    full shingle arrays per pair (the array form ships every candidate
    doc's whole set across the wire per pair and concentrates pair rows
    in few tasks; rows spread evenly and AQE can split hot pairs).

    Thresholding is on the UNROUNDED ratio — the oracles compare the
    raw ratio >= threshold, and a pair with true Jaccard just below the
    threshold would flip between engines if the filter saw the rounded
    value. Round only the display column. Intersection/union sizes are
    integers in both engines, so the final division is bit-identical.

    Set sizes ride along on the exploded rows (one extra int on rows
    the intersection join shuffles anyway) and surface via ``first()``
    inside the existing aggregate — cheaper at scale than two extra
    joins against a per-doc size table after the aggregate.
    """
    ex = docs.select("did", F.size("sh").alias("n"), F.explode("sh").alias("s"))
    ca = ex.join(cand, ex["did"] == cand["a_id"]).select(
        "a_id", "b_id", F.col("n").alias("na"), "s"
    )
    cb = ex.join(cand, ex["did"] == cand["b_id"]).select(
        F.col("a_id").alias("a2"),
        F.col("b_id").alias("b2"),
        F.col("n").alias("nb"),
        F.col("s").alias("s2"),
    )
    inter = (
        ca.join(
            cb,
            (F.col("a_id") == F.col("a2"))
            & (F.col("b_id") == F.col("b2"))
            & (F.col("s") == F.col("s2")),
        )
        .groupBy("a_id", "b_id")
        .agg(
            F.count(F.lit(1)).alias("icnt"),
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
        )
    )
    raw = F.col("icnt") / (F.col("na") + F.col("nb") - F.col("icnt"))
    return inter.filter(raw >= threshold).select(
        "a_id", "b_id", F.round(raw, 3).alias("jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 12,
    bands: int = 6,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_band_docs: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash signatures + LSH banding,
    verified with exact Jaccard over the shingle sets.

    Plan shape (scale path — fully row-oriented so every md5 runs once
    inside whole-stage codegen, not inside nested array lambdas that
    Catalyst would inline per signature element):
      1. explode shingles → (doc, shingle) rows;
      2. ONE groupBy(doc) computing all ``num_hashes`` minima as
         flat conditional aggregates (``min(md5(seed:shingle))`` per
         seed — no seed cross-join multiplying rows, and map-side
         partial aggregation collapses each doc to one 12-column row
         per partition before the single shuffle);
      3. assemble band keys from the minima columns and explode into
         (doc, band_id, band_key) rows — narrow, no extra shuffle;
      4. self-join inside band buckets (id < id) → candidate pairs;
      5. join candidates back to the shingle arrays → exact Jaccard ≥
         threshold.
    Hot buckets (identical band shared by many docs) are the classic
    LSH skew; AQE skew-join splitting handles moderate cases.
    """
    docs, banded = _minhash_banded(
        df, id_col, text_col, num_hashes=num_hashes, bands=bands, shingle_n=shingle_n
    )

    if max_band_docs is not None:
        # HOT-BAND CAP — the guard AQE skew-split cannot provide: a
        # band bucket shared by B docs emits B^2/2 candidate PAIRS, so
        # a single boilerplate/templated band key at corpus scale
        # turns the candidate join quadratic no matter how the rows
        # are partitioned. Buckets above the cap are DROPPED (one
        # extra narrow groupBy on the band keys): standard web-scale
        # LSH practice — a key shared by thousands of docs carries no
        # near-dup signal a pairwise verify could use. Deliberate
        # recall trade, OFF by default (the oracle-pinned queries pass
        # None): run exact dedup (d01/d02) BEFORE LSH so identical
        # docs collapse first, and boilerplate spans are d13's job.
        sizes = banded.groupBy("band_id", "band_key").agg(
            F.count(F.lit(1)).alias("__n")
        )
        ok = sizes.filter(F.col("__n") <= max_band_docs).select(
            "band_id", "band_key"
        )
        banded = banded.join(ok, ["band_id", "band_key"], "left_semi")

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

    return _verify_pairs(docs, cand, threshold)


def _minhash_banded(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int,
    bands: int,
    shingle_n: int,
) -> tuple[DataFrame, DataFrame]:
    """Shared MinHash stage: returns (persisted (did, sh) shingle
    frame, persisted (did, band_id, band_key) banding frame)."""
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
    words = df.select(F.col(id_col).alias("did"), toks.alias("w")).transform(tracked_persist)
    docs = words.select(
        "did", TX.shingles(F.col("w"), shingle_n).alias("sh")
    ).transform(tracked_persist)

    # ONE md5 per shingle, parsed into TWO 28-bit base fields (hex
    # digits 1-7 and 8-14), then the ``num_hashes`` signature elements
    # via independent multiply-mod-prime universal hashes of each field
    # combined into a ~62-bit key: element_i = g_i(lo)*2^31 + g'_i(hi).
    # Integer mul/add instead of 12 md5+hex-parse per shingle (the md5
    # and conv() were ~90% of the signature stage's CPU), and the
    # 62-bit space keeps spurious cross-doc minima collisions
    # negligible at corpus scale (a single 28-bit field would collide
    # at ~1e-3/pair for thousand-shingle docs and inflate LSH buckets).
    # Both engines evaluate the same int64 arithmetic (max value < 2^62
    # — no overflow), so oracles stay bit-identical. min() over a
    # fixed-width type keeps the aggregation in HashAggregate.
    lo = F.conv(F.substring(F.md5(F.col("s")), 1, 7), 16, 10).cast("bigint")
    hi = F.conv(F.substring(F.md5(F.col("s")), 8, 7), 16, 10).cast("bigint")
    ex = docs.select("did", F.explode("sh").alias("s")).select(
        "did", lo.alias("hl"), hi.alias("hh")
    )
    params = minhash_params(2 * num_hashes)

    def elem(i: int):
        a, b = params[i]
        c, d = params[num_hashes + i]
        g_lo = (F.lit(a) * F.col("hl") + F.lit(b)) % MINHASH_PRIME
        g_hi = (F.lit(c) * F.col("hh") + F.lit(d)) % MINHASH_PRIME
        return g_lo * F.lit(2147483648) + g_hi

    per_doc = ex.groupBy("did").agg(
        *[F.min(elem(i)).alias(f"m{i}") for i in range(num_hashes)]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"m{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    # Persisted: the candidate self-join consumes it twice.
    banded = (
        per_doc.select("did", F.explode(band_structs).alias("bb"))
        .select("did", "bb.band_id", "bb.band_key")
    ).transform(tracked_persist)
    return docs, banded


def minhash_lsh_pairs_against(
    corpus: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 12,
    bands: int = 6,
    shingle_n: int = 3,
    threshold: float = 0.8,
    broadcast_new: bool = True,
) -> DataFrame:
    """Incremental near-dup check: (corpus_id, new_id, jaccard) pairs
    where an incoming document near-duplicates one already in the
    corpus — the ingestion-time shape (dedup a batch BEFORE appending
    it, without re-pairing the corpus against itself).

    Ids SHOULD be disjoint across the two frames (an id can't
    meaningfully be both "already in the corpus" and "incoming").
    Overlap is tolerated defensively rather than silently corrupting
    counts: an id present on both sides contributes its INCOMING
    shingles once (corpus copy anti-joined away on the narrow id set —
    deterministic, and the corpus side still never shuffles; doubled
    rows would double every Jaccard numerator they touch), and
    self-pairs (a_id == b_id) are dropped from the candidates.

    The corpus side runs the same signature/banding stage as
    ``minhash_lsh_pairs``; the new batch — small relative to a 100 TB
    corpus — has its banding frame BROADCAST, so the corpus never
    shuffles for the candidate join (set ``broadcast_new=False`` for a
    shuffle join when the batch is genuinely large). Verification
    reuses the exploded co-group, whose shuffle carries candidate docs
    only.
    """
    docs_c, band_c = _minhash_banded(
        corpus, id_col, text_col, num_hashes=num_hashes, bands=bands, shingle_n=shingle_n
    )
    docs_n, band_n = _minhash_banded(
        new, id_col, text_col, num_hashes=num_hashes, bands=bands, shingle_n=shingle_n
    )
    return minhash_pairs_against_banded(
        docs_c, band_c, docs_n, band_n,
        threshold=threshold, broadcast_new=broadcast_new,
    )


def minhash_pairs_against_banded(
    docs_c: DataFrame,
    band_c: DataFrame,
    docs_n: DataFrame,
    band_n: DataFrame,
    *,
    threshold: float = 0.8,
    broadcast_new: bool = True,
) -> DataFrame:
    """The candidate+verify half of :func:`minhash_lsh_pairs_against`,
    taking PRECOMPUTED (did, sh) shingle frames and (did, band_id,
    band_key) banding frames for both sides.

    This is the incremental-ingest interface: a persisted LSH index
    (see ``operators/lsh_index.py``) stores exactly these two frames,
    so checking a new batch against a 100 TB corpus touches the INDEX
    — narrow banding rows + candidate shingle rows — and never
    re-reads or re-hashes the corpus text."""
    bn = F.broadcast(band_n) if broadcast_new else band_n
    cand = (
        band_c.alias("l")
        .join(
            bn.alias("r"),
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.did") != F.col("r.did")),
        )
        .select(F.col("l.did").alias("a_id"), F.col("r.did").alias("b_id"))
        .distinct()
    )
    ids_n = docs_n.select("did")
    keep_c = docs_c.join(
        F.broadcast(ids_n) if broadcast_new else ids_n, "did", "left_anti"
    )
    docs_all = keep_c.unionByName(docs_n)
    return _verify_pairs(docs_all, cand, threshold)


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
    words = df.select(F.col(id_col).alias("did"), toks.alias("w")).transform(tracked_persist)
    docs = words.select(
        "did", TX.shingles(F.col("w"), shingle_n).alias("sh")
    ).transform(tracked_persist)
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
    return _verify_pairs(docs, cand, threshold)


def banded_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    bands: int = 4,
    bits: int = 8,
    projections: bool = False,
    dim: int | None = None,
    seed: str = "proj",
) -> DataFrame:
    """(did, band_id, bucket) — one row per (vector, band), from raw
    component signs or (``projections=True``, requires ``dim``)
    Rademacher random-projection signs: 2^bits buckets per band for
    ANY bits — the path past the raw-sign ceiling at bands·bits = dim
    (SCALE.md round 11); bit-identical folds keep the construction
    oracle-mirrorable. Exposed so a caller needing both the pairs and
    the bucket frame (spread stats, persistence) evaluates the
    projection folds ONCE."""
    if projections:
        if dim is None:
            raise ValueError("projections=True requires dim")
        bb = V.banded_projection_buckets(
            V.as_double(F.col(vec_col)), dim, bands, bits, seed=seed
        )
    else:
        bb = V.banded_sign_buckets(V.as_double(F.col(vec_col)), bands, bits)
    return df.select(
        F.col(id_col).alias("did"), F.explode(bb).alias("bb")
    ).select("did", "bb.band_id", "bb.bucket")


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    threshold: float = 0.9,
    bands: int = 4,
    bits: int = 8,
    round_to: int = 6,
    projections: bool = False,
    dim: int | None = None,
    seed: str = "proj",
    banded: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the scale path for
    vector dedup (``similarity.cosine_neardup_pairs`` is the all-pairs
    oracle; this is what runs at 100 TB).

    Plan shape mirrors ``minhash_lsh_pairs``:
      1. one corpus scan computes per-vector norm + ``bands`` sign-LSH
         bucket ids (pure Catalyst expressions);
      2. explode into (vec, band, bucket) rows → self-join inside
         (band, bucket) → candidate pairs. The all-pairs product never
         materializes; cost is Σ bucket² per band (~n²/2^bits for
         spread data);
      3. candidates join back to the vectors (two shuffles keyed by
         id — narrow: id + one embedding per row) → exact cosine ≥
         threshold.
    Near-identical vectors can only disagree on sign bits whose
    components sit near zero, so any unperturbed band yields the
    candidate; raising ``bands`` (with proportionally fewer bits) is
    the recall knob, exactly like MinHash banding.
    """
    v = (
        df.select(F.col(id_col).alias("did"), V.as_double(F.col(vec_col)).alias("vv"))
        .withColumn("nrm", V.norm(F.col("vv")))
        .transform(tracked_persist)
    )
    # A caller that also needs the (did, band_id, bucket) frame (e.g.
    # d17's occupied-bucket spread) passes it in precomputed —
    # otherwise the projection folds would be evaluated twice, once
    # per consumer (VERDICT r11 item 7).
    if banded is None:
        banded = banded_buckets(
            v, "did", "vv",
            bands=bands, bits=bits, projections=projections,
            dim=dim, seed=seed,
        )
    cand = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.did") < F.col("r.did")),
        )
        .select(F.col("l.did").alias("a_id"), F.col("r.did").alias("b_id"))
        .distinct()
    )
    a = v.select(
        F.col("did").alias("a_id"), F.col("vv").alias("av"), F.col("nrm").alias("anrm")
    )
    b = v.select(
        F.col("did").alias("b_id"), F.col("vv").alias("bv"), F.col("nrm").alias("bnrm")
    )
    denom = F.col("anrm") * F.col("bnrm")
    cos = F.round(
        F.when(denom > 0, V.dot(F.col("av"), F.col("bv")) / denom).otherwise(F.lit(0.0)),
        round_to,
    )
    return (
        cand.join(a, "a_id")
        .join(b, "b_id")
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= threshold)
        .select("a_id", "b_id", "cos_sim")
    )


def semantic_dedup_components(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    n_centroids: int | None = None,
    n_iter: int = 2,
    threshold: float = 0.9,
    round_to: int = 6,
    assignment: str = "flat",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication" — public paper): k-means-cluster the embedding
    space, compare pairs EXACTLY but only within a cluster, then
    connected-components → (node, comp) with comp = the canonical
    (minimum) id.

    Complementary to :func:`embedding_neardup_pairs` (sign-LSH bands):
    LSH recall depends on the band/bit geometry, while cluster-scoped
    pairwise has recall 1 INSIDE a cell and misses only cross-cell
    pairs — the SemDeDup trade, tuned by ``n_centroids`` (cells ~
    n/n_centroids vectors ⇒ pairwise cost n²/n_centroids, the scale
    knob; real deployments use enough cells that a cell fits a task).

    ``n_centroids=None`` (the default) DERIVES the count from the
    corpus: ``max(ceil(n / TARGET_CELL_ROWS), CENTROID_FLOOR)`` via
    :func:`similarity.derive_n_centroids` — centroids grow linearly
    with the data so average cell size (and therefore per-cell
    pairwise work) stays bounded at any corpus size, the same
    invariant as ``packing.derive_n_buckets`` (VERDICT r4: a pinned
    count makes the intra-cell join quadratic at scale). The one
    up-front ``count()`` rides a column-pruned scan of the id column.

    Determinism: centroids come from ``kmeans_centroids``'s
    fixed-point integer grid, assignment ties break on lowest cell id,
    and the pair filter uses the ROUNDED cosine — all mirrored by the
    DuckDB oracle (d11) bit-for-bit (the oracle derives the same
    count with a ``LIMIT greatest(ceil(count(*)/target), floor)``).

    Scale ceiling (measured, NOTES_r5 stress): with derived k the
    intra-cell pairwise is flat, and the binding cost becomes Lloyd
    ASSIGNMENT — n * k cosines with k ∝ n, i.e. n²/target — plus the
    broadcast of the centroid table (~100k centroids ≈ 50 MB max).
    Fine to ~10⁷ vectors; beyond that the standard fix is a two-level
    coarse-then-fine quantizer (assign to sqrt(k) coarse cells, then
    refine within — n * sqrt(k) work, centroids joined by coarse key
    instead of broadcast), which keeps every other piece of this
    operator unchanged.
    """
    from hyppo_worker_spark.operators.similarity import (
        derive_n_centroids,
        kmeans_centroids,
        two_level_assign,
    )
    from hyppo_worker_spark.functions import vectors as V
    from pyspark.sql import Window as W

    if assignment not in ("flat", "two_level"):
        raise ValueError(f"assignment must be flat|two_level, got {assignment}")
    if centroids is not None:
        # reuse a trained quantizer (cent_id, cent): comparing flat vs
        # two-level assignment over the SAME cells, or amortizing one
        # k-means across many dedup passes — skips Lloyd AND the
        # derive-count scan entirely
        cents = centroids.withColumn(
            "cent_norm", V.norm(F.col("cent"))
        ).localCheckpoint(eager=True)
    else:
        if n_centroids is None:
            n_centroids = derive_n_centroids(df.select(id_col).count())
        cents = (
            kmeans_centroids(
                df, id_col=id_col, vec_col=vec_col,
                n_centroids=n_centroids, n_iter=n_iter,
            )
            .withColumn("cent_norm", V.norm(F.col("cent")))
            .localCheckpoint(eager=True)
        )
    v = df.select(
        F.col(id_col).alias("did"), V.as_double(F.col(vec_col)).alias("vv")
    ).withColumn("nrm", V.norm(F.col("vv")))
    if assignment == "two_level":
        # IVF-style coarse-then-fine (similarity.two_level_assign):
        # ~2n*sqrt(k) cosines and only sqrt(k) rows broadcast — the
        # 100 TB path once k outgrows flat assignment's n*k work /
        # broadcast ceiling. Slightly approximate (nprobe=1 trade),
        # so the ORACLE-pinned d11 keeps assignment="flat".
        cells = two_level_assign(
            v.select(F.col("did").alias("__id"), F.col("vv").alias("__v")),
            cents.select("cent_id", "cent"),
            round_to=round_to,
        )
        assigned = (
            v.join(cells.withColumnRenamed("__id", "did"), "did")
            .select("did", "vv", "nrm", "cell")
            .transform(tracked_persist)
        )
    else:
        scored = v.join(F.broadcast(cents)).withColumn(
            "__sim",
            V.dot(F.col("vv"), F.col("cent"))
            / (F.col("nrm") * F.col("cent_norm")),
        )
        w = W.partitionBy("did").orderBy(F.col("__sim").desc(), "cent_id")
        assigned = (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("did", "vv", "nrm", F.col("cent_id").alias("cell"))
            .transform(tracked_persist)
        )
    a = assigned.select(
        F.col("did").alias("a_id"), F.col("vv").alias("av"),
        F.col("nrm").alias("anrm"), "cell",
    )
    b = assigned.select(
        F.col("did").alias("b_id"), F.col("vv").alias("bv"),
        F.col("nrm").alias("bnrm"), "cell",
    )
    cos = F.round(
        V.dot(F.col("av"), F.col("bv")) / (F.col("anrm") * F.col("bnrm")),
        round_to,
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= threshold)
        .select("a_id", "b_id")
    )
    # size-adaptive: near-dup pair sets are typically tiny next to the
    # corpus, and the star-contraction loop's launch floor dominated
    # the d16 itemization (NOTES_r11); distributed fallback above cap
    comp = connected_components_adaptive(pairs)
    nodes = assigned.select(F.col("did").alias("node"))
    return nodes.join(comp, "node", "left").select(
        "node", F.coalesce("comp", F.col("node")).alias("comp")
    )


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round: every node's LARGER neighbors re-attach to
    the minimum of its neighborhood (Kiveris et al., "Connected
    Components in MapReduce and Beyond", 2014 — public algorithm)."""
    und = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = und.groupBy("u").agg(F.min("v").alias("mn"))
    m = F.least(F.col("u"), F.col("mn"))
    return (
        und.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: orient edges large→small, then each node's
    SMALLER neighbors (and itself) attach to the minimum."""
    directed = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = directed.groupBy("u").agg(F.min("v").alias("mn"))
    attached = (
        directed.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("mn").alias("v"))
    )
    self_edges = mins.select("u", F.col("mn").alias("v"))
    return (
        attached.unionByName(self_edges)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(edges: DataFrame, src: str = "a_id", dst: str = "b_id", max_iter: int = 20) -> DataFrame:
    """Connected components over an undirected edge list:
    (node, component) where component = minimum node id reachable.

    Alternating large-star/small-star rounds (Kiveris et al., 2014):
    converges in O(log n) rounds even on long chains — unlike plain
    min-label propagation, whose O(diameter) rounds make chain graphs
    pathological at scale. Each round is two shuffles (groupBy min +
    re-attach join) over the EDGE set only; no node-labels frame is
    carried between rounds. Lineage is truncated per round with a lazy
    ``localCheckpoint`` that the round's convergence-fingerprint action
    materializes — one Spark job per round total. Without truncation
    the iterative plan nests exponentially (a 13-round chain graph
    overflowed Spark's 2 GB plan string before this). On a real cluster
    use ``checkpoint()`` to reliable storage instead for fault
    tolerance.

    Near-dup pairs from MinHash/LSH feed this to turn pairwise matches
    into dedup clusters with a canonical (minimum) document per
    cluster.
    """
    # Checkpoint the raw edge list once: both `e` and `nodes` derive
    # from it, and without truncation each would recompute the caller's
    # full upstream pipeline (e.g. the LSH candidate+verify joins).
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(
        eager=False
    )
    e = (
        raw.filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # Nodes come from the RAW edge list (before the self-loop filter):
    # a node appearing only in self-loop edges is still a (singleton)
    # component and must appear in the output.
    nodes = (
        raw.select("u")
        .unionByName(raw.select(F.col("v").alias("u")))
        .distinct()
        .withColumnRenamed("u", "node")
        .localCheckpoint(eager=True)
    )

    # Convergence = consecutive rounds produce the same (distinct) edge
    # set. Comparing sets directly (exceptAll both ways) costs two full
    # shuffles of the edge set per round ON TOP of the round's own work;
    # instead each round's single action aggregates an order-insensitive
    # fingerprint (count + sum of xxhash64) — an O(edges) map + tiny agg
    # with no extra shuffle — and the same action materializes the lazy
    # localCheckpoint, so one Spark job per round does everything. Two
    # distinct sets collide on the fingerprint with probability ~2^-64
    # per round; a collision would stop iteration one round early on a
    # set that differs, which the post-loop star-forest extraction would
    # surface as wrong labels — acceptable at those odds.
    def _fingerprint(frame: DataFrame):
        row = frame.agg(
            F.count(F.lit(1)).alias("cnt"),
            # decimal(38,0) accumulator: summing raw int64 hashes would
            # overflow under ANSI mode.
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
            ).alias("hsum"),
        ).first()
        return (row["cnt"], row["hsum"])

    prev = _fingerprint(e)
    converged = False
    for _ in range(max_iter):
        new_e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        cur = _fingerprint(new_e)
        e = new_e
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # The star-forest extraction below assumes convergence; on a
        # max_iter exit that invariant may not hold and components can
        # be silently wrong. O(log n) rounds suffice in theory, so this
        # indicates max_iter is set far too low for the graph.
        warnings.warn(
            f"connected_components: not converged after {max_iter} rounds; "
            "component labels may be incorrect — raise max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    # At convergence the edges form star forests: every node's minimum
    # neighbor IS the component minimum (roots see only larger members,
    # least() keeps them labeled by themselves).
    und = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    comp = und.groupBy("u").agg(F.min("v").alias("mn")).select(
        F.col("u").alias("node"), F.least("u", "mn").alias("comp")
    )
    return nodes.join(comp, "node", "left").select(
        "node", F.coalesce("comp", F.col("node")).alias("comp")
    )


def connected_components_adaptive(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    *,
    local_max_edges: int = 200_000,
) -> DataFrame:
    """Size-adaptive connected components — the incremental-CC fast
    path (`streaming/incremental_cc.py`, measured crossover) opened to
    batch callers: ONE bounded job pulls up to ``local_max_edges + 1``
    edges; getting the cap + 1 back means "too big — go distributed"
    (`connected_components`), otherwise a driver-side union-find
    solves the graph in microseconds instead of paying the star-
    contraction loop's ROUNDS × per-job fixed overhead (measured
    here: 1.7s of launch floor for a 386-edge graph at sf0.1 — the
    d16 itemization, NOTES_r11).

    Value-identical to ``connected_components`` including self-loop-
    only singleton handling; the bounded pull is capped at
    ``local_max_edges`` rows of two longs (≤ ~3 MB at the default)
    with the distributed operator as the fallback above it.
    """
    # Persist the (u, v) projection BEFORE the bounded probe: when the
    # cap is exceeded, the distributed fallback would otherwise
    # recompute the whole upstream pair pipeline (banding join +
    # exact-cosine verify) from scratch — doubling cost exactly in the
    # large-graph case the fallback exists for. The persisted frame is
    # two id columns, and release is the caller's persist_scope /
    # release_persists contract (session.tracked_persist).
    from hyppo_worker_spark.session import tracked_persist

    uv = tracked_persist(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    )
    pulled = uv.limit(local_max_edges + 1).collect()  # bounded pull
    if len(pulled) > local_max_edges:
        return connected_components(uv, "u", "v")
    spark = edges.sparkSession
    real = [(r["u"], r["v"]) for r in pulled if r["u"] != r["v"]]
    labeled = dict(local_connected_components(real))
    # self-loop-only nodes are singleton components (the contract
    # `connected_components` keeps via its raw-edge node frame)
    for r in pulled:
        for n in (r["u"], r["v"]):
            if n not in labeled:
                labeled[n] = n
    # node/comp inherit the edge id type (string doc ids and long vec
    # ids both flow through here)
    id_type = edges.schema[src].dataType
    schema = T.StructType(
        [
            T.StructField("node", id_type, False),
            T.StructField("comp", id_type, False),
        ]
    )
    return local_frame(spark, sorted(labeled.items()), schema)


def local_connected_components(
    edges: list[tuple[int, int]]
) -> list[tuple[int, int]]:
    """Driver-side union-find over an ALREADY-BOUNDED edge list:
    (node, comp) pairs with comp = minimum member id — the same
    contract as ``connected_components``, minus the self-loop-only
    singleton handling (callers feed self-loop-free edge lists).

    This exists for the incremental-maintenance path
    (`streaming/incremental_cc.py`): the subgraph a micro-batch
    touches is typically tiny relative to the corpus, and the
    distributed recompute's cost there is ROUNDS x per-job fixed
    overhead, not data volume — measured at sf0.1: 10.6s of p08's
    12.8s sink time went to ~8 star rounds over a few thousand
    edges. A bounded local solve is O(E α(E)) single-threaded and
    microseconds at that size; callers must enforce the bound and
    fall back to the distributed operator above it.
    """
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    # label every component by its minimum member id
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    return [(n, comp_min[find(n)]) for n in parent]
