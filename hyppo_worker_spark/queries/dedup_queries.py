"""Deduplication queries over the ``documents`` table, oracle-checked.

The corpus for the exact-dedup queries is augmented deterministically
(every doc_id % 7 == 0 document re-appears with id+1,000,000) so the
operator provably removes real copies; both engines perform the same
augmentation. The near-dup queries run on the raw table, which
contains planted near-duplicate pairs (Jaccard ≈ 0.99).

Every hash formula in the oracles mirrors
``hyppo_worker_spark/functions/text.py`` exactly (md5-hex based, so
engine-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hyppo_worker_spark.functions import text as TX
from hyppo_worker_spark.operators import dedup as D
from hyppo_worker_spark.queries import register
from hyppo_worker_spark.session import load_tables, tracked_persist

# Shared DuckDB CTE: tokenization + 3-gram shingles, mirroring
# functions/text.py::tokens + shingles.
_SQL_SHINGLES = """
    tok AS (
        SELECT doc_id, lang, source,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    sh AS (
        SELECT doc_id, lang, source,
               CASE WHEN len(w) >= 3 THEN
                   list_distinct(list_transform(range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
               ELSE [] END AS sh
        FROM tok
    )
"""


def _augmented_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    dups = docs.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    return docs.unionByName(dups)


_SQL_CORPUS = """
    corpus AS (
        SELECT doc_id, text, lang, source FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text, lang, source
        FROM documents WHERE doc_id % 7 = 0
    )
"""


@register(
    "d01_exact_dedup_groups",
    oracle=f"""
    WITH {_SQL_CORPUS}
    SELECT md5(text) AS content_hash,
           min(doc_id) AS canonical_id,
           count(*) AS n_copies
    FROM corpus
    GROUP BY md5(text)
    HAVING count(*) > 1
    ORDER BY canonical_id
    """,
    tags=("dedup", "exact"),
)
def d01_exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate groups (hash-groupBy on content digest)."""
    corpus = _augmented_corpus(spark, sf_dir)
    return D.exact_dedup_groups(corpus, "doc_id", "text").orderBy("canonical_id")


@register(
    "d02_exact_dedup_kept",
    oracle=f"""
    WITH {_SQL_CORPUS},
    keep AS (
        SELECT min(doc_id) AS doc_id FROM corpus GROUP BY md5(text)
    )
    SELECT c.lang AS lang, c.source AS source, count(*) AS n_docs
    FROM corpus c JOIN keep k ON c.doc_id = k.doc_id
    GROUP BY c.lang, c.source
    ORDER BY c.lang, c.source
    """,
    tags=("dedup", "exact"),
)
def d02_exact_dedup_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition after exact dedup (keep min-id copy)."""
    corpus = _augmented_corpus(spark, sf_dir)
    return (
        D.exact_dedup(corpus, "doc_id", "text")
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "source")
    )


# MinHash signature SQL mirroring operators/dedup.py exactly: one md5
# per shingle parsed into two 28-bit fields, signature element i =
# min over shingles of ((a_i*lo + b_i) mod p)*2^31 + ((c_i*hi + d_i)
# mod p) with the SAME constants interpolated from minhash_params —
# bit-identical int64 arithmetic in both engines. 6 bands × 2 rows.
_MH_PARAMS = D.minhash_params(24)
_MINHASH_ELEMS = ",\n                ".join(
    "list_aggregate(list_transform(range(1, len(hl) + 1), "
    f"j -> (({a} * hl[j] + {b}) % {D.MINHASH_PRIME}) * 2147483648"
    f" + (({c} * hh[j] + {d}) % {D.MINHASH_PRIME})), 'min')"
    for (a, b), (c, d) in zip(_MH_PARAMS[:12], _MH_PARAMS[12:])
)

_SQL_SIG = f"""
    hashed AS (
        SELECT doc_id, sh,
               list_transform(sh, s -> ('0x' || substr(md5(s), 1, 7))::BIGINT) AS hl,
               list_transform(sh, s -> ('0x' || substr(md5(s), 8, 7))::BIGINT) AS hh
        FROM sh
        WHERE len(sh) > 0
    ),
    sigs AS (
        SELECT doc_id, sh,
               [{_MINHASH_ELEMS}] AS sig
        FROM hashed
    ),
    banded AS (
        SELECT doc_id, b AS band_id,
               sig[2*b + 1] || '|' || sig[2*b + 2] AS band_key
        FROM sigs, range(0, 6) t(b)
    ),
    cand AS (
        SELECT DISTINCT l.doc_id AS a_id, r.doc_id AS b_id
        FROM banded l JOIN banded r
          ON l.band_id = r.band_id AND l.band_key = r.band_key
         AND l.doc_id < r.doc_id
    )
"""


@register(
    "d03_minhash_lsh_pairs",
    oracle=f"""
    WITH {_SQL_SHINGLES},
    {_SQL_SIG}
    SELECT c.a_id AS a_id, c.b_id AS b_id,
           round(len(list_filter(a.sh, x -> list_contains(b.sh, x))) * 1.0
                 / (len(a.sh) + len(b.sh)
                    - len(list_filter(a.sh, x -> list_contains(b.sh, x)))),
                 3) AS jaccard
    FROM cand c
    JOIN sh a ON a.doc_id = c.a_id
    JOIN sh b ON b.doc_id = c.b_id
    WHERE len(list_filter(a.sh, x -> list_contains(b.sh, x))) * 1.0
          / (len(a.sh) + len(b.sh)
             - len(list_filter(a.sh, x -> list_contains(b.sh, x)))) >= 0.8
    ORDER BY a_id, b_id
    """,
    tags=("dedup", "minhash", "lsh"),
)
def d03_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs: MinHash/LSH candidates verified ≥0.8 Jaccard."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return D.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=12, bands=6, threshold=0.8
    ).orderBy("a_id", "b_id")


@register(
    "d04_simhash_sketches",
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               list_distinct(list_filter(
                   string_split_regex(lower(text), '[^a-z0-9]+'),
                   x -> x <> '')) AS dt
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN len(dt) > 0 THEN
               CAST(list_sum(list_transform(range(0, 16), j ->
                   CASE WHEN 2 * len(list_filter(dt, w ->
                            ((strpos('0123456789abcdef',
                                     substr(md5(w), j + 1, 1)) - 1)
                             // CAST(pow(2, j % 4) AS INT)) % 2 = 1))
                          > len(dt)
                        THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END)) AS BIGINT)
           ELSE 0 END AS simhash
    FROM tok
    ORDER BY doc_id
    """,
    tags=("dedup", "simhash"),
)
def d04_simhash_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 16-bit SimHash sketch."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return D.simhash_sketches(docs, "doc_id", "text").orderBy("doc_id")


@register(
    "d05_ngram_jaccard_pairs",
    oracle=f"""
    WITH {_SQL_SHINGLES},
    mins AS (
        SELECT doc_id, sh,
               list_slice(list_sort(list_transform(sh, s -> md5(s))), 1, 4) AS mk
        FROM sh
    ),
    b AS (SELECT doc_id, unnest(mk) AS mh FROM mins),
    cand AS (
        SELECT DISTINCT l.doc_id AS a_id, r.doc_id AS b_id
        FROM b l JOIN b r ON l.mh = r.mh AND l.doc_id < r.doc_id
    )
    SELECT c.a_id AS a_id, c.b_id AS b_id,
           round(len(list_filter(a.sh, x -> list_contains(b.sh, x))) * 1.0
                 / (len(a.sh) + len(b.sh)
                    - len(list_filter(a.sh, x -> list_contains(b.sh, x)))),
                 3) AS jaccard
    FROM cand c
    JOIN sh a ON a.doc_id = c.a_id
    JOIN sh b ON b.doc_id = c.b_id
    WHERE len(list_filter(a.sh, x -> list_contains(b.sh, x))) * 1.0
          / (len(a.sh) + len(b.sh)
             - len(list_filter(a.sh, x -> list_contains(b.sh, x)))) >= 0.5
    ORDER BY a_id, b_id
    """,
    tags=("dedup", "ngram-jaccard"),
)
def d05_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram Jaccard near-dup pairs via min-k sketch bucketing."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return D.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).orderBy(
        "a_id", "b_id"
    )


@register(
    "d06_training_corpus_pipeline",
    oracle=f"""
    WITH {_SQL_SHINGLES},
    {_SQL_SIG},
    pairs AS (
        SELECT c.a_id, c.b_id
        FROM cand c
        JOIN sh a ON a.doc_id = c.a_id
        JOIN sh b ON b.doc_id = c.b_id
        WHERE len(list_filter(a.sh, x -> list_contains(b.sh, x))) * 1.0
              / (len(a.sh) + len(b.sh)
                 - len(list_filter(a.sh, x -> list_contains(b.sh, x)))) >= 0.8
    ),
    quality AS (
        SELECT t.doc_id, t.lang, t.source, d.n_chars, len(t.w) AS n_tokens
        FROM tok t JOIN documents d ON d.doc_id = t.doc_id
        WHERE d.n_chars >= 120 AND len(t.w) >= 20
          AND t.lang IN ('en', 'de', 'fr')
    ),
    kept AS (
        SELECT q.* FROM quality q
        WHERE NOT EXISTS (SELECT 1 FROM pairs p WHERE p.b_id = q.doc_id)
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM kept GROUP BY lang ORDER BY lang
    """,
    tags=("dedup", "pipeline", "training-data", "flagship"),
)
def d06_training_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed training-data curation pipeline over documents:
    quality filter (length + token count) → language allowlist →
    near-duplicate removal (drop the higher doc_id of every verified
    MinHash/LSH pair) → per-language corpus statistics.

    The composition is the point: every stage is the same declarative
    operator the suite tests individually, so Catalyst optimizes
    across stage boundaries (the quality filter prunes the anti-join
    probe side; the pair computation is shared CTE work at 100 TB).
    """
    from hyppo_worker_spark.functions import text as TX

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = TX.tokens("text")
    quality = docs.withColumn("n_tokens", F.size(toks)).filter(
        (F.col("n_chars") >= 120)
        & (F.col("n_tokens") >= 20)
        & (F.col("lang").isin("en", "de", "fr"))
    )
    dup_ids = (
        D.minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=12, bands=6, threshold=0.8)
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
    )
    kept = quality.join(dup_ids, "doc_id", "left_anti")
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("lang")
    )


# Sequential-fold cosine (DuckDB side), identical to the one in
# similarity_queries.py: Spark's F.aggregate left fold ≡ list_reduce,
# bit-identical doubles.
_DOT = (
    "list_reduce(list_transform(range(1, len({a}) + 1), "
    "i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
)


def _cos(a: str, b: str) -> str:
    return (
        f"({_DOT.format(a=a, b=b)} / "
        f"(sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)})))"
    )


@register(
    "d08_embedding_neardup_dedup",
    oracle=f"""
    WITH RECURSIVE corpus AS (
        SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id,
               list_transform(range(1, len(embedding) + 1),
                   i -> CASE WHEN i = 1 THEN embedding[1]::DOUBLE + 0.0625
                             ELSE embedding[i]::DOUBLE END) AS v,
               label
        FROM embeddings WHERE vec_id % 5 = 0
    ),
    banded AS (
        SELECT vec_id, t AS band_id,
               CAST(list_sum(list_transform(range(0, 8),
                   j -> CASE WHEN v[t * 8 + j + 1] >= 0
                             THEN (1 << j) ELSE 0 END)) AS INT) AS bucket
        FROM corpus, range(0, 4) r(t)
    ),
    cand AS (
        SELECT DISTINCT l.vec_id AS a_id, r.vec_id AS b_id
        FROM banded l JOIN banded r
          ON l.band_id = r.band_id AND l.bucket = r.bucket
         AND l.vec_id < r.vec_id
    ),
    pairs AS (
        SELECT c.a_id, c.b_id
        FROM cand c
        JOIN corpus a ON a.vec_id = c.a_id
        JOIN corpus b ON b.vec_id = c.b_id
        WHERE round({_cos('a.v', 'b.v')}, 6) >= 0.9
    ),
    edges AS (
        SELECT a_id AS u, b_id AS v FROM pairs
        UNION
        SELECT b_id AS u, a_id AS v FROM pairs
    ),
    paths AS (
        SELECT u, v FROM edges
        UNION
        SELECT p.u, e.v FROM paths p JOIN edges e ON p.v = e.u
    ),
    comp AS (
        SELECT u AS node, least(u, min(v)) AS comp
        FROM paths GROUP BY u
    ),
    dropped AS (SELECT node FROM comp WHERE node <> comp)
    SELECT corpus.label AS label,
           count(*) AS n_vecs,
           CAST(sum(CASE WHEN d.node IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(sum(CASE WHEN d.node IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped
    FROM corpus LEFT JOIN dropped d ON d.node = corpus.vec_id
    GROUP BY corpus.label ORDER BY label
    """,
    tags=("dedup", "embedding", "cosine", "lsh", "connected-components"),
)
def d08_embedding_neardup_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate removal, end to end: the corpus
    is augmented deterministically (every vec_id % 5 == 0 vector
    re-appears with id+1,000,000 and +0.0625 on component 1 — a
    near-identical copy, cosine ≈ 0.998), then banded sign-LSH
    candidates → exact cosine ≥ 0.9 verification → connected
    components → keep the minimum id per cluster → per-label corpus
    composition.

    The perturbation touches only band 1's components, so bands 2-4
    match exactly and LSH provably surfaces every planted pair — the
    pipeline's removal counts are deterministic, not recall-dependent.
    ``s03_cosine_neardup_pairs`` is the all-pairs oracle for the same
    semantics; this is the form that scales (no cross product).
    """
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    from hyppo_worker_spark.functions import vectors as V

    base = emb.select(
        "vec_id", V.as_double(F.col("embedding")).alias("v"), "label"
    )
    planted = base.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "v", lambda x, i: F.when(i == 0, x + F.lit(0.0625)).otherwise(x)
        ).alias("v"),
        "label",
    )
    corpus = base.unionByName(planted)
    pairs = D.embedding_neardup_pairs(
        corpus, "vec_id", "v", threshold=0.9, bands=4, bits=8
    )
    comp = D.connected_components_adaptive(pairs)
    dropped = comp.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias("vec_id")
    )
    flag = corpus.join(
        dropped.withColumn("is_dropped", F.lit(1)), "vec_id", "left"
    )
    return (
        flag.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.when(F.col("is_dropped").isNull(), 1).otherwise(0)).alias(
                "n_kept"
            ),
            F.sum(F.when(F.col("is_dropped").isNotNull(), 1).otherwise(0)).alias(
                "n_dropped"
            ),
        )
        .orderBy("label")
    )


@register(
    "d07_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_SQL_SHINGLES},
    {_SQL_SIG},
    pairs AS (
        SELECT c.a_id, c.b_id
        FROM cand c
        JOIN sh a ON a.doc_id = c.a_id
        JOIN sh b ON b.doc_id = c.b_id
        WHERE len(list_filter(a.sh, x -> list_contains(b.sh, x))) * 1.0
              / (len(a.sh) + len(b.sh)
                 - len(list_filter(a.sh, x -> list_contains(b.sh, x)))) >= 0.8
    ),
    edges AS (
        SELECT a_id AS u, b_id AS v FROM pairs
        UNION
        SELECT b_id AS u, a_id AS v FROM pairs
    ),
    paths AS (
        SELECT u, v FROM edges
        UNION
        SELECT p.u, e.v FROM paths p JOIN edges e ON p.v = e.u
    ),
    comp AS (
        SELECT u AS node, least(u, min(v)) AS comp
        FROM paths GROUP BY u
    )
    SELECT comp AS cluster_id,
           count(*) AS n_docs,
           min(node) AS min_doc,
           max(node) AS max_doc
    FROM comp GROUP BY comp ORDER BY cluster_id
    """,
    tags=("dedup", "graph", "connected-components"),
)
def d07_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters: MinHash pairs → connected components
    (min-label propagation) → per-cluster membership stats."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    pairs = D.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=12, bands=6, threshold=0.8
    )
    comp = D.connected_components_adaptive(pairs)
    return (
        comp.groupBy(F.col("comp").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("node").alias("min_doc"),
            F.max("node").alias("max_doc"),
        )
        .orderBy("cluster_id")
    )


@register(
    "d09_corpus_export_manifest",
    oracle=f"""
    WITH {_SQL_SHINGLES},
    {_SQL_SIG},
    pairs AS (
        SELECT c.a_id, c.b_id
        FROM cand c
        JOIN sh a ON a.doc_id = c.a_id
        JOIN sh b ON b.doc_id = c.b_id
        WHERE len(list_filter(a.sh, x -> list_contains(b.sh, x))) * 1.0
              / (len(a.sh) + len(b.sh)
                 - len(list_filter(a.sh, x -> list_contains(b.sh, x)))) >= 0.8
    ),
    quality AS (
        SELECT t.doc_id, t.lang, d.n_chars, len(t.w) AS n_tokens
        FROM tok t JOIN documents d ON d.doc_id = t.doc_id
        WHERE d.n_chars >= 120 AND len(t.w) >= 20
          AND t.lang IN ('en', 'de', 'fr')
    ),
    kept AS (
        SELECT q.* FROM quality q
        WHERE NOT EXISTS (SELECT 1 FROM pairs p WHERE p.b_id = q.doc_id)
    ),
    sharded AS (
        SELECT CAST({TX.md5_bucket_sql('doc_id', 8, chars=15)}
                    AS INTEGER) AS shard,
               doc_id, n_tokens
        FROM kept
    )
    SELECT shard,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           (CAST(sum(n_tokens) AS BIGINT) + 511) // 512 AS n_sequences,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id
    FROM sharded GROUP BY shard ORDER BY shard
    """,
    tags=("dedup", "sharding", "packing", "pipeline", "training-data"),
)
def d09_corpus_export_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data export manifest: curate (quality +
    language + near-dup removal, exactly d06's corpus) → deterministic
    8-way shard assignment (operators/sharding.py) → per-shard doc,
    token, and packed-512-token-sequence counts.

    One call answers "what would the export write": the same manifest
    write_shards produces, plus the packing arithmetic of
    operators/packing.py applied shard-locally (each shard's token
    stream packs independently, so sequence counts are sums of
    per-shard ceil-divisions — no global prefix sum needed for the
    manifest).
    """
    from hyppo_worker_spark.functions import text as TX
    from hyppo_worker_spark.operators.sharding import assign_shards

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = TX.tokens("text")
    quality = docs.withColumn("n_tokens", F.size(toks).cast("bigint")).filter(
        (F.col("n_chars") >= 120)
        & (F.col("n_tokens") >= 20)
        & (F.col("lang").isin("en", "de", "fr"))
    )
    dup_ids = (
        D.minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=12, bands=6, threshold=0.8)
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
    )
    kept = quality.join(dup_ids, "doc_id", "left_anti")
    return (
        assign_shards(kept, "doc_id", 8)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.expr("(sum(n_tokens) + 511) div 512").alias("n_sequences"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("shard")
    )


# --------------------------------------------------------------------------
# d10 — incremental (ingestion-time) near-dup check: dedup an incoming
# batch AGAINST the standing corpus without re-pairing the corpus with
# itself (operators/dedup.py::minhash_lsh_pairs_against). The batch —
# tiny next to a 100 TB corpus — has its banding frame broadcast, so
# the corpus never shuffles for the candidate join; verification
# shuffles candidate docs only. The deterministic md5 gate splits the
# documents table 70/30 into corpus/batch so both engines see the same
# split; the oracle computes the same signatures over all docs and
# keeps only cross pairs.
# --------------------------------------------------------------------------
_D10_BATCH_PCT = 30


@register(
    "d10_incremental_neardup",
    oracle=f"""
    WITH {_SQL_SHINGLES},
    split AS (
        SELECT doc_id, sh,
               {TX.md5_bucket_sql('doc_id', 100)} < {_D10_BATCH_PCT} AS is_new
        FROM sh
    ),
    hashed AS (
        SELECT doc_id, is_new, sh,
               list_transform(sh, s -> ('0x' || substr(md5(s), 1, 7))::BIGINT) AS hl,
               list_transform(sh, s -> ('0x' || substr(md5(s), 8, 7))::BIGINT) AS hh
        FROM split
        WHERE len(sh) > 0
    ),
    sigs AS (
        SELECT doc_id, is_new, sh,
               [{_MINHASH_ELEMS}] AS sig
        FROM hashed
    ),
    banded AS (
        SELECT doc_id, is_new, b AS band_id,
               sig[2*b + 1] || '|' || sig[2*b + 2] AS band_key
        FROM sigs, range(0, 6) t(b)
    ),
    cand AS (
        SELECT DISTINCT l.doc_id AS a_id, r.doc_id AS b_id
        FROM banded l JOIN banded r
          ON l.band_id = r.band_id AND l.band_key = r.band_key
         AND NOT l.is_new AND r.is_new
    )
    SELECT c.a_id AS a_id, c.b_id AS b_id,
           round(len(list_filter(a.sh, x -> list_contains(b.sh, x))) * 1.0
                 / (len(a.sh) + len(b.sh)
                    - len(list_filter(a.sh, x -> list_contains(b.sh, x)))),
                 3) AS jaccard
    FROM cand c
    JOIN sh a ON a.doc_id = c.a_id
    JOIN sh b ON b.doc_id = c.b_id
    WHERE len(list_filter(a.sh, x -> list_contains(b.sh, x))) * 1.0
          / (len(a.sh) + len(b.sh)
             - len(list_filter(a.sh, x -> list_contains(b.sh, x)))) >= 0.8
    ORDER BY a_id, b_id
    """,
    tags=("dedup", "minhash", "lsh", "incremental", "ingestion"),
)
def d10_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incoming-batch near-dups against the standing corpus (30% md5
    gate = the batch): (corpus_id, batch_id, jaccard) pairs ≥ 0.8."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    is_new = TX.md5_bucket("doc_id", 100) < _D10_BATCH_PCT
    corpus = docs.filter(~is_new)
    batch = docs.filter(is_new)
    return D.minhash_lsh_pairs_against(
        corpus, batch, "doc_id", "text", threshold=0.8
    ).orderBy("a_id", "b_id")


# --------------------------------------------------------------------------
# d11 — SemDeDup (Abbas et al. 2023): semantic dedup by k-means
# clustering + EXACT within-cluster pairwise cosine, vs d08's
# sign-LSH banding. Same planted near-identical copies as d08, same
# connected-components + keep-min contract — the difference under
# audit is the candidate generator: cluster-scoped pairwise has
# recall 1 inside a cell (no band geometry to tune) and cost
# ~n²/n_centroids, the SemDeDup scale knob. The Lloyd rounds, the
# assignment tie-break, and the rounded-cosine pair filter are all
# deterministic and mirrored bit-for-bit by the oracle (the Lloyd SQL
# is shared with s04's oracle).
# --------------------------------------------------------------------------
def _d11_oracle(tail: str | None = None) -> str:
    """The shared flat-SemDeDup recursive SQL; ``tail`` overrides the
    final SELECT (d16 reuses the identical clustering with a
    different report shape)."""
    from hyppo_worker_spark.operators.similarity import (
        CENTROID_FLOOR as _D11_FLOOR,
        TARGET_CELL_ROWS as _D11_TARGET_CELL,
    )
    from hyppo_worker_spark.queries.similarity_queries import _lloyd_round

    return f"""
    WITH RECURSIVE corpus AS (
        SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id,
               list_transform(range(1, len(embedding) + 1),
                   i -> CASE WHEN i = 1 THEN embedding[1]::DOUBLE + 0.0625
                             ELSE embedding[i]::DOUBLE END) AS v,
               label
        FROM embeddings WHERE vec_id % 5 = 0
    ),
    vecs AS (SELECT vec_id, v FROM corpus),
    -- centroid count DERIVED from corpus size exactly like the Spark
    -- side (similarity.derive_n_centroids): linear growth keeps the
    -- average cell ~TARGET_CELL_ROWS at any corpus size. cent_id =
    -- vec_id matches seed_centroid_ids' dense renumbering because the
    -- testdata id space is 0-based contiguous.
    cents0 AS (
        SELECT vec_id AS cent_id, v AS cent FROM vecs
        ORDER BY vec_id
        LIMIT greatest(CAST(ceil((SELECT count(*) FROM vecs)
                                 / {_D11_TARGET_CELL}.0) AS BIGINT),
                       {_D11_FLOOR})
    ),
    {_lloyd_round(0)},
    {_lloyd_round(1)},
    assigned AS (
        SELECT vecs.vec_id, vecs.v, c.cent_id AS cell,
               row_number() OVER (PARTITION BY vecs.vec_id
                                  ORDER BY {_cos('vecs.v', 'c.cent')} DESC,
                                           c.cent_id) AS rn
        FROM vecs, cents2 c
    ),
    m AS (SELECT vec_id, v, cell FROM assigned WHERE rn = 1),
    pairs AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id
        FROM m a JOIN m b ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE round({_cos('a.v', 'b.v')}, 6) >= 0.9
    ),
    edges AS (
        SELECT a_id AS u, b_id AS v FROM pairs
        UNION
        SELECT b_id AS u, a_id AS v FROM pairs
    ),
    paths AS (
        SELECT u, v FROM edges
        UNION
        SELECT p.u, e.v FROM paths p JOIN edges e ON p.v = e.u
    ),
    comp AS (
        SELECT u AS node, least(u, min(v)) AS comp
        FROM paths GROUP BY u
    ),
    dropped AS (SELECT node FROM comp WHERE node <> comp)
    {{tail}}
    """.replace(
        "{tail}",
        tail
        or """SELECT corpus.label AS label,
           count(*) AS n_vecs,
           CAST(sum(CASE WHEN d.node IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(sum(CASE WHEN d.node IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped
    FROM corpus LEFT JOIN dropped d ON d.node = corpus.vec_id
    GROUP BY corpus.label ORDER BY label""",
    )


@register(
    "d11_semantic_dedup",
    oracle=_d11_oracle(),
    tags=("dedup", "embedding", "semdedup", "kmeans", "connected-components"),
)
def d11_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the augmented embedding corpus: cluster with the
    deterministic fixed-point Lloyd, exact pairwise cosine >= 0.9
    within each cluster, keep the minimum id per component; per-label
    corpus composition (same output contract as d08 so the two
    candidate generators are directly comparable)."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    from hyppo_worker_spark.functions import vectors as V

    base = emb.select(
        "vec_id", V.as_double(F.col("embedding")).alias("v"), "label"
    )
    planted = base.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "v", lambda x, i: F.when(i == 0, x + F.lit(0.0625)).otherwise(x)
        ).alias("v"),
        "label",
    )
    corpus = base.unionByName(planted)
    # n_centroids=None derives the count from the corpus (average cell
    # ~TARGET_CELL_ROWS at any SF; floors to 8 at sf0.01's 600 rows —
    # the oracle derives the identical value in SQL).
    comp = D.semantic_dedup_components(
        corpus, "vec_id", "v", n_centroids=None, n_iter=2, threshold=0.9
    )
    dropped = comp.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias("vec_id")
    )
    flag = corpus.join(
        dropped.withColumn("is_dropped", F.lit(1)), "vec_id", "left"
    )
    return (
        flag.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.when(F.col("is_dropped").isNull(), 1).otherwise(0)).alias(
                "n_kept"
            ),
            F.sum(F.when(F.col("is_dropped").isNotNull(), 1).otherwise(0)).alias(
                "n_dropped"
            ),
        )
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# d12 — corpus snapshot diff: the versioning operation between two
# corpus snapshots (what changed between last week's crawl and this
# week's?). v2 is a deterministic evolution of the documents table
# (every 13th doc removed, every 7th surviving doc's text revised,
# 20 new docs appended); the diff FULL-OUTER-joins the snapshots on
# doc_id and classifies by md5 DIGEST compare — text bytes are hashed
# scan-side and never shipped to the join, so at 100 TB the shuffle
# carries (id, 32-hex digest) rows only. Output: per (source, status)
# counts — the report a corpus release pipeline publishes with each
# version bump.
# --------------------------------------------------------------------------
@register(
    "d12_snapshot_diff",
    oracle="""
    WITH v1 AS (SELECT doc_id, source, md5(text) AS dg FROM documents),
    v2 AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 7 = 0 THEN md5(text || ' [rev2]')
                    ELSE md5(text) END AS dg
        FROM documents WHERE doc_id % 13 <> 0
        UNION ALL
        SELECT doc_id + 1000000, source, md5('new in v2 ' || doc_id)
        FROM documents WHERE doc_id < 20
    ),
    joined AS (
        SELECT coalesce(v1.source, v2.source) AS source,
               CASE
                   WHEN v1.doc_id IS NULL THEN 'added'
                   WHEN v2.doc_id IS NULL THEN 'removed'
                   WHEN v1.dg <> v2.dg THEN 'changed'
                   ELSE 'unchanged'
               END AS status
        FROM v1 FULL OUTER JOIN v2 USING (doc_id)
    )
    SELECT source, status, count(*) AS n
    FROM joined GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("dedup", "versioning", "diff", "full-outer"),
)
def d12_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, status) diff counts between two corpus snapshots,
    classified by digest compare over a full-outer id join."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    v1 = docs.select("doc_id", "source", F.md5("text").alias("dg"))
    v2 = (
        docs.filter(F.col("doc_id") % 13 != 0)
        .select(
            "doc_id",
            "source",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.md5(F.concat(F.col("text"), F.lit(" [rev2]"))),
            )
            .otherwise(F.md5("text"))
            .alias("dg"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") < 20).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                "source",
                F.md5(F.concat(F.lit("new in v2 "), F.col("doc_id"))).alias("dg"),
            )
        )
    )
    joined = v1.alias("a").join(
        v2.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"), "full_outer"
    )
    status = (
        F.when(F.col("a.doc_id").isNull(), F.lit("added"))
        .when(F.col("b.doc_id").isNull(), F.lit("removed"))
        .when(F.col("a.dg") != F.col("b.dg"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(
            F.coalesce(F.col("a.source"), F.col("b.source")).alias("source"),
            status.alias("status"),
        )
        .groupBy("source", "status")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("source", "status")
    )


# --------------------------------------------------------------------------
# d13 — exact-substring repeat detection (the Lee et al. 2022
# "Deduplicating Training Data Makes Language Models Better" signal, a
# public technique): find every k-token span that occurs MORE THAN
# ONCE across the corpus and measure, per source, how much of the
# text is covered by repeated spans. Whole-doc dedup (d01..d11)
# misses shared BOILERPLATE inside otherwise-distinct documents; this
# operator catches it. Distributed shape (no suffix array needed for
# the fixed-k form): positions explode to (doc, pos, 52-bit gram
# hash) rows — ONE hash-keyed shuffle finds multiply-occurring spans,
# flagged positions join back doc-keyed, runs/coverage come from
# per-doc windows only. Planted boilerplate (every 5th doc gets the
# same 12-token tail — the d08 provable-recall technique) pins
# detection: coverage lands exactly on the planted docs, zero false
# positives on the random remainder. Tokens travel as hashes from the
# scan on; the token ARRAY is materialized before windowing (the
# codegen lesson).
# --------------------------------------------------------------------------
_D13_K = 8  # span length in tokens
_D13_BP = "terms of service apply contact support for help before use now ok"


@register(
    "d13_exact_substring_repeats",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 5 = 0 THEN text || ' {_D13_BP}'
                    ELSE text END AS text
        FROM documents
    ),
    tok AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS w
        FROM base
    ),
    grams AS (
        SELECT doc_id, source, i AS pos,
               ('0x' || substr(md5(array_to_string(
                   list_slice(w, i, i + {_D13_K - 1}), ' ')), 1, 13))::BIGINT AS h
        FROM tok, LATERAL unnest(range(1, len(w) - {_D13_K - 2})) AS t(i)
    ),
    dup AS (SELECT h FROM grams GROUP BY h HAVING count(*) >= 2),
    flagged AS (
        SELECT g.doc_id, g.source, g.pos
        FROM grams g JOIN dup USING (h)
    ),
    covered AS (
        SELECT doc_id, source,
               count(DISTINCT idx) AS cov
        FROM flagged, LATERAL unnest(range(pos, pos + {_D13_K})) AS u(idx)
        GROUP BY 1, 2
    ),
    runs AS (
        SELECT doc_id, source,
               CAST(sum(CASE WHEN prev IS NULL OR pos <> prev + 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS spans
        FROM (
            SELECT doc_id, source, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM flagged
        ) GROUP BY 1, 2
    ),
    per_doc AS (
        SELECT t.doc_id, t.source, len(t.w) AS n_tokens,
               coalesce(c.cov, 0) AS cov, coalesce(r.spans, 0) AS spans
        FROM tok t
        LEFT JOIN covered c USING (doc_id)
        LEFT JOIN runs r ON r.doc_id = t.doc_id
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(count(*) FILTER (WHERE cov > 0) AS BIGINT) AS docs_with_repeats,
           CAST(sum(spans) AS BIGINT) AS repeated_spans,
           CAST(sum(cov) AS BIGINT) AS covered_tokens,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(cov) * 10000 // sum(n_tokens) AS BIGINT) AS repeat_bp
    FROM per_doc GROUP BY 1 ORDER BY 1
    """,
    tags=("dedup", "substring", "boilerplate", "lee2022"),
)
def d13_exact_substring_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source repeated-substring coverage: spans of {k} tokens
    occurring >= 2 times corpus-wide, coalesced into runs and measured
    as covered-token basis points (planted boilerplate on every 5th
    doc)."""
    from pyspark.sql import Window as W

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    base = docs.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit(" " + _D13_BP)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    tok = base.select(
        "doc_id", "source", TX.tokens("text").alias("w")
    ).transform(tracked_persist)
    # TX.pos_ngram_hashes carries the size<k guard (ADVICE r4): an
    # unguarded sequence(1, size-7) is DESCENDING for <8-token docs.
    gram = TX.pos_ngram_hashes(F.col("w"), _D13_K)
    grams = (
        tok.select("doc_id", "source", F.explode(gram).alias("g"))
        .select("doc_id", "source", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))
        .transform(tracked_persist)
    )
    dup = grams.groupBy("h").agg(F.count(F.lit(1)).alias("c")).filter(
        F.col("c") >= 2
    )
    flagged = grams.join(dup.select("h"), "h").select(
        "doc_id", "source", "pos"
    ).transform(tracked_persist)
    covered = (
        flagged.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (_D13_K - 1))
            ).alias("idx"),
        )
        .groupBy("doc_id")
        .agg(F.countDistinct("idx").alias("cov"))
    )
    wl = W.partitionBy("doc_id").orderBy("pos")
    runs = (
        flagged.withColumn("prev", F.lag("pos").over(wl))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("prev").isNull() | (F.col("pos") != F.col("prev") + 1),
                    1,
                ).otherwise(0)
            ).cast("long").alias("spans")
        )
    )
    per_doc = (
        tok.select("doc_id", "source", F.size("w").alias("n_tokens"))
        .join(covered, "doc_id", "left")
        .join(runs, "doc_id", "left")
        .select(
            "source",
            "n_tokens",
            F.coalesce("cov", F.lit(0)).alias("cov"),
            F.coalesce("spans", F.lit(0)).alias("spans"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("cov") > 0, 1).otherwise(0))
            .cast("long")
            .alias("docs_with_repeats"),
            F.sum("spans").cast("long").alias("repeated_spans"),
            F.sum("cov").cast("long").alias("covered_tokens"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.expr(
                "CAST(sum(cov) * 10000 div sum(n_tokens) AS BIGINT)"
            ).alias("repeat_bp"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# d14 — leakage-safe train/val/test split assignment: near-duplicate
# CLUSTERS are assigned to splits atomically (the split is a pure
# md5 function of the cluster's canonical id), so a document can
# never see its near-duplicate across the train/eval boundary — the
# split-contamination guard train-data pipelines need on top of t11's
# n-gram decontamination. The query also QUANTIFIES the hazard it
# prevents: naive_leaked_clusters counts the multi-doc clusters a
# doc-id-gated split would have straddled. Scale shape: MinHash-LSH
# pairs + O(log n) connected components (d03/d07 machinery), one
# left join to attach canonical ids, pure-function gates, one
# cluster-keyed groupBy for the leak count, 1-row broadcast of it.
# --------------------------------------------------------------------------
@register(
    "d14_split_assignment",
    oracle=f"""
    WITH RECURSIVE {_SQL_SHINGLES},
    {_SQL_SIG},
    pairs AS (
        SELECT c.a_id, c.b_id
        FROM cand c
        JOIN sh a ON a.doc_id = c.a_id
        JOIN sh b ON b.doc_id = c.b_id
        WHERE len(list_filter(a.sh, x -> list_contains(b.sh, x))) * 1.0
              / (len(a.sh) + len(b.sh)
                 - len(list_filter(a.sh, x -> list_contains(b.sh, x)))) >= 0.8
    ),
    edges AS (
        SELECT a_id AS u, b_id AS v FROM pairs
        UNION
        SELECT b_id AS u, a_id AS v FROM pairs
    ),
    paths AS (
        SELECT u, v FROM edges
        UNION
        SELECT p.u, e.v FROM paths p JOIN edges e ON p.v = e.u
    ),
    comp AS (
        SELECT u AS node, least(u, min(v)) AS comp
        FROM paths GROUP BY u
    ),
    canon AS (
        SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS canon
        FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
    ),
    assigned AS (
        SELECT doc_id, canon,
               CASE WHEN {TX.md5_bucket_sql('canon', 100)} < 80 THEN 'train'
                    WHEN {TX.md5_bucket_sql('canon', 100)} < 90 THEN 'val'
                    ELSE 'test' END AS split,
               CASE WHEN {TX.md5_bucket_sql('doc_id', 100)} < 80 THEN 'train'
                    WHEN {TX.md5_bucket_sql('doc_id', 100)} < 90 THEN 'val'
                    ELSE 'test' END AS naive_split
        FROM canon
    ),
    leak AS (
        SELECT CAST(count(*) AS BIGINT) AS naive_leaked_clusters
        FROM (SELECT canon FROM assigned GROUP BY canon
              HAVING count(DISTINCT naive_split) > 1)
    )
    SELECT split,
           count(*) AS n_docs,
           CAST(count(DISTINCT canon) AS BIGINT) AS n_clusters,
           (SELECT naive_leaked_clusters FROM leak) AS naive_leaked_clusters
    FROM assigned GROUP BY split ORDER BY split
    """,
    tags=("dedup", "split", "leakage", "connected-components", "training-data"),
)
def d14_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-atomic 80/10/10 split: near-dup components share a
    canonical id whose md5 gate decides the split for every member;
    per-split doc/cluster counts plus the count of clusters a naive
    per-doc gate would have leaked across splits."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    pairs = D.minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=12, bands=6, threshold=0.8
    )
    comp = D.connected_components_adaptive(pairs)
    canon = (
        docs.select("doc_id")
        .join(
            comp.select(F.col("node").alias("doc_id"), "comp"),
            "doc_id",
            "left",
        )
        .withColumn("canon", F.coalesce("comp", "doc_id"))
    )

    def gate(c):
        b = TX.md5_bucket(c, 100)
        return (
            F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
        )

    assigned = canon.select(
        "doc_id",
        "canon",
        gate(F.col("canon")).alias("split"),
        gate(F.col("doc_id")).alias("naive_split"),
    ).transform(tracked_persist)
    leak = (
        assigned.groupBy("canon")
        .agg(F.countDistinct("naive_split").alias("k"))
        .filter(F.col("k") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("naive_leaked_clusters"))
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("canon").cast("long").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(leak))
        .orderBy("split")
    )


# --------------------------------------------------------------------------
# d15 — canonical selection policy: dedup groups keep their BEST
# member, not their first. d01/d02's keep-min-id is the right
# default for byte-identical copies; real corpora hold VARIANT copies
# (case-mangled mirrors, whitespace-normalized rehosts) where the
# kept copy should be the cleanest one. Groups form on the
# normalized-token digest (case/punctuation-insensitive), and the
# canonical member maximizes an integer quality key (here: count of
# lowercase characters — the un-mangled copy; ties -> min id). The
# planted corpus upper-cases every 7th doc into a variant copy, so
# the policy provably picks the ORIGINAL over the shouting mirror —
# a keep-min-id policy would keep the original only by id accident;
# the query also reports how often the two policies disagree.
# The mangled copy sits at the ORIGINAL (lower) id and the clean
# text at id+1e6, so keep-min-id provably keeps the WRONG copy for
# every planted group — policy_disagreements counts exactly those.
# Scale shape = d02: only (digest, quality, id) triples shuffle,
# argmax rides one max_by aggregation, payloads never move.
# --------------------------------------------------------------------------
@register(
    "d15_canonical_selection",
    oracle="""
    WITH corpus AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END
                   AS text,
               source
        FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text, source
        FROM documents WHERE doc_id % 7 = 0
    ),
    keyed AS (
        SELECT doc_id, source,
               md5(array_to_string(list_filter(
                   string_split_regex(lower(text), '[^a-z0-9]+'),
                   x -> x <> ''), ' ')) AS gk,
               length(regexp_replace(text, '[^a-z]', '', 'g')) AS q
        FROM corpus
    ),
    best AS (
        SELECT gk,
               count(*) AS n_copies,
               min(doc_id) AS min_id,
               first(doc_id ORDER BY q DESC, doc_id) AS keep_id
        FROM keyed GROUP BY gk
    )
    SELECT k.source,
           count(*) AS n_groups,
           CAST(sum(b.n_copies) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN b.keep_id <> b.min_id THEN 1 ELSE 0 END)
                AS BIGINT) AS policy_disagreements
    FROM best b JOIN keyed k ON k.doc_id = b.keep_id
    GROUP BY 1 ORDER BY 1
    """,
    tags=("dedup", "canonical-selection", "quality", "training-data"),
)
def d15_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup: per normalized-text group keep the member
    with the most lowercase characters (ties -> min id); per-source
    group/doc counts plus how often keep-best differs from
    keep-min-id."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    corpus = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.upper("text"))
        .otherwise(F.col("text"))
        .alias("text"),
        "source",
    ).unionByName(
        docs.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            "text",
            "source",
        )
    )
    keyed = corpus.select(
        "doc_id",
        "source",
        F.md5(F.array_join(TX.tokens("text"), " ")).alias("gk"),
        F.length(F.regexp_replace("text", "[^a-z]", "")).alias("q"),
    )
    # max_by with an explicit (q desc, id asc) tiebreak: encode as a
    # single orderable struct so the argmax is deterministic
    best = keyed.groupBy("gk").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("min_id"),
        F.expr("min_by(doc_id, struct(-q, doc_id))").alias("keep_id"),
    )
    return (
        best.join(
            keyed.select(F.col("doc_id").alias("keep_id"), "source"),
            "keep_id",
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("n_copies").cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("keep_id") != F.col("min_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("policy_disagreements"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# d16 — the two-level (IVF-style) SemDeDup SCALE PATH made
# driver-checkable via the q44/q27 contract: the oracle reproduces
# the EXACT flat clustering (same recursive SQL as d11) and states
# the approximation bound as a literal TRUE; the Spark side runs BOTH
# assignments — flat for the exact columns, two_level for the bound —
# so a broken coarse router, a coverage hole, or recall drifting past
# 10% of flat's drops all break the hash. This is the evidence d11's
# exact-pinned row cannot provide for the n*sqrt(k) path that takes
# over at 100 TB (NOTES_r5 stress analysis).
# --------------------------------------------------------------------------
@register(
    "d16_semantic_dedup_two_level",
    oracle=_d11_oracle(
        tail="""SELECT corpus.label AS label,
           count(*) AS n_vecs,
           CAST(sum(CASE WHEN d.node IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS flat_dropped,
           TRUE AS two_level_within_10pct
    FROM corpus LEFT JOIN dropped d ON d.node = corpus.vec_id
    GROUP BY corpus.label ORDER BY label"""
    ),
    tags=("dedup", "embedding", "semdedup", "ivf", "two-level", "scale-path"),
)
def d16_semantic_dedup_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat-vs-two-level SemDeDup on the d11 corpus: exact per-label
    flat drop counts plus an in-plan bound that the two-level scale
    path drops within 10% of flat."""
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    from hyppo_worker_spark.functions import vectors as V

    base = emb.select(
        "vec_id", V.as_double(F.col("embedding")).alias("v"), "label"
    )
    planted = base.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "v", lambda x, i: F.when(i == 0, x + F.lit(0.0625)).otherwise(x)
        ).alias("v"),
        "label",
    )
    corpus = base.unionByName(planted).transform(tracked_persist)

    # one trained quantizer, BOTH assignment paths (r10 cut): flat and
    # two-level previously each re-ran Lloyd over the same corpus with
    # the same params — the comparison the row exists for is the
    # assignment strategy over the SAME cells, so sharing the
    # centroids is semantically cleaner AND halves the k-means cost
    from hyppo_worker_spark.operators.similarity import (
        derive_n_centroids,
        kmeans_centroids,
    )

    cents = kmeans_centroids(
        corpus,
        id_col="vec_id",
        vec_col="v",
        n_centroids=derive_n_centroids(corpus.select("vec_id").count()),
        n_iter=2,
    ).localCheckpoint(eager=True)

    def dropped(assignment):
        comp = D.semantic_dedup_components(
            corpus, "vec_id", "v", n_iter=2, threshold=0.9,
            assignment=assignment, centroids=cents,
        )
        return comp.filter(F.col("node") != F.col("comp")).select(
            F.col("node").alias("vec_id")
        )

    flat_d = dropped("flat").transform(tracked_persist)
    two_total = dropped("two_level").agg(
        F.count(F.lit(1)).cast("long").alias("tt")
    )
    flat_total = flat_d.agg(F.count(F.lit(1)).cast("long").alias("ft"))
    bound = flat_total.crossJoin(F.broadcast(two_total)).select(
        (
            F.abs(F.col("ft") - F.col("tt")) * 10 <= F.col("ft")
        ).alias("two_level_within_10pct")
    )
    per_label = (
        corpus.join(
            flat_d.withColumn("is_d", F.lit(1)), "vec_id", "left"
        )
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.when(F.col("is_d").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("flat_dropped"),
        )
    )
    return (
        per_label.crossJoin(F.broadcast(bound)).orderBy("label")
    )


# --------------------------------------------------------------------------
# d17 — RANDOM-PROJECTION sign-LSH near-dup: the scale path past
# d08's raw-component banding. Raw signs cap the bucket space at
# bands*bits = dim (64-dim → 2^16/band, saturating near 10^7 vectors
# — the measured x100 rule, SCALE.md r11); Rademacher projections
# (Charikar 2002 SimHash) give 2^bits buckets per band for ANY bits,
# decoupled from the embedding width. The ±1 weights derive from md5
# parity (functions/vectors.py:projection_weights — no RNG state), and
# every projection is the same sequential left fold both engines use
# for dot products, so bucket ids are BIT-IDENTICAL across engines:
# the oracle below replays the full machinery — literal weight
# matrices, sign buckets, banding join, exact-cosine verify, CC — in
# SQL, which is what makes an S-curve-recall construction (projection
# signs CAN flip near zero, unlike d08's provably-unperturbed bands)
# hash-pinnable. bits=12 here (4096 buckets/band — impossible for
# raw signs at 4 bands over 64 dims without eating the dedup margin)
# and the occupied-bucket count is pinned as a mirrored aggregate —
# the spread evidence. At 100 TB: same two-shuffle plan as d08; bits
# scales with log(corpus) by widening the weight matrix only.
# --------------------------------------------------------------------------
def _d17_oracle() -> str:
    from hyppo_worker_spark.functions.vectors import projection_weights

    ws = projection_weights(64, 4, 12)
    # weights as a 48-row VALUES table (band, bit, 64-list) — inlining
    # the literal list inside each projection lambda made DuckDB
    # rebuild it per element (first cut of this oracle ran 30s; this
    # form runs ~1s). The fold stays the same sequential left fold as
    # Spark's F.aggregate, so projections stay bit-identical.
    wt_rows = ", ".join(
        f"({t}, {b}, [" + ", ".join(
            f"{float(x):.1f}" for x in ws[t][b]
        ) + "])"
        for t in range(4)
        for b in range(12)
    )
    return f"""
    WITH RECURSIVE corpus AS (
        SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id,
               list_transform(range(1, len(embedding) + 1),
                   i -> CASE WHEN i = 1 THEN embedding[1]::DOUBLE + 0.0625
                             ELSE embedding[i]::DOUBLE END) AS v,
               label
        FROM embeddings WHERE vec_id % 5 = 0
    ),
    wt(band_id, bit, wv) AS (VALUES {wt_rows}),
    proj AS (
        SELECT c.vec_id, w.band_id, w.bit,
               list_reduce(list_transform(range(1, 65),
                   j -> c.v[j] * w.wv[j]), (x, y) -> x + y) AS p
        FROM corpus c, wt w
    ),
    banded AS (
        SELECT vec_id, band_id,
               CAST(sum(CASE WHEN p >= 0 THEN 1 << bit ELSE 0 END)
                    AS INT) AS bucket
        FROM proj GROUP BY 1, 2
    ),
    occ AS (
        SELECT CAST(count(*) AS BIGINT) AS n_occupied_buckets
        FROM (SELECT DISTINCT band_id, bucket FROM banded)
    ),
    cand AS (
        SELECT DISTINCT l.vec_id AS a_id, r.vec_id AS b_id
        FROM banded l JOIN banded r
          ON l.band_id = r.band_id AND l.bucket = r.bucket
         AND l.vec_id < r.vec_id
    ),
    pairs AS (
        SELECT c.a_id, c.b_id
        FROM cand c
        JOIN corpus a ON a.vec_id = c.a_id
        JOIN corpus b ON b.vec_id = c.b_id
        WHERE round({_cos('a.v', 'b.v')}, 6) >= 0.9
    ),
    edges AS (
        SELECT a_id AS u, b_id AS v FROM pairs
        UNION
        SELECT b_id AS u, a_id AS v FROM pairs
    ),
    paths AS (
        SELECT u, v FROM edges
        UNION
        SELECT p.u, e.v FROM paths p JOIN edges e ON p.v = e.u
    ),
    comp AS (
        SELECT u AS node, least(u, min(v)) AS comp
        FROM paths GROUP BY u
    ),
    dropped AS (SELECT node FROM comp WHERE node <> comp)
    SELECT corpus.label AS label,
           count(*) AS n_vecs,
           CAST(sum(CASE WHEN d.node IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(sum(CASE WHEN d.node IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped,
           (SELECT n_occupied_buckets FROM occ) AS n_occupied_buckets
    FROM corpus LEFT JOIN dropped d ON d.node = corpus.vec_id
    GROUP BY corpus.label ORDER BY label
    """


@register(
    "d17_projection_lsh_neardup",
    oracle=_d17_oracle(),
    tags=("dedup", "embedding", "lsh", "random-projection", "simhash",
          "scale-path"),
)
def d17_projection_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d08's near-dup removal under Rademacher random-projection
    banding (4 bands x 12 bits = 4096 buckets/band, decoupled from
    the 64-dim width); occupied-bucket count pinned as spread
    evidence; full machinery mirrored in SQL."""
    from hyppo_worker_spark.functions import vectors as V

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    base = emb.select(
        "vec_id", V.as_double(F.col("embedding")).alias("v"), "label"
    )
    planted = base.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "v", lambda x, i: F.when(i == 0, x + F.lit(0.0625)).otherwise(x)
        ).alias("v"),
        "label",
    )
    corpus = base.unionByName(planted).transform(tracked_persist)
    # the 48 interpreted projection folds are the expensive expression
    # here: materialize the exploded (did, band, bucket) frame ONCE and
    # feed BOTH the pair path and the occupied-bucket spread (VERDICT
    # r11 item 7 — previously evaluated twice, once per consumer)
    banded = D.banded_buckets(
        corpus, "vec_id", "v", bands=4, bits=12, projections=True, dim=64
    ).transform(tracked_persist)
    pairs = D.embedding_neardup_pairs(
        corpus, "vec_id", "v", threshold=0.9,
        bands=4, bits=12, projections=True, dim=64, banded=banded,
    )
    comp = D.connected_components_adaptive(pairs)
    dropped = comp.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias("vec_id")
    )
    occ = (
        banded.select("band_id", "bucket")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_occupied_buckets"))
    )
    flag = corpus.join(
        dropped.withColumn("is_dropped", F.lit(1)), "vec_id", "left"
    )
    return (
        flag.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(
                F.when(F.col("is_dropped").isNull(), 1).otherwise(0)
            ).alias("n_kept"),
            F.sum(
                F.when(F.col("is_dropped").isNotNull(), 1).otherwise(0)
            ).alias("n_dropped"),
        )
        .crossJoin(F.broadcast(occ))
        .orderBy("label")
    )


# --------------------------------------------------------------------------
# d18 — CROSS-DOCUMENT BOILERPLATE REMOVAL (the actionable tier of
# Lee et al. 2022): d13 DETECTS repeated spans within the corpus and
# reports coverage; a curation pipeline must then REWRITE — strip the
# shared boilerplate (headers, ToS lines, scraper chrome that appears
# across many documents) while leaving each document's unique prose
# intact. Semantics: a k-token gram is boilerplate when its DOCUMENT
# FREQUENCY crosses a threshold (df >= 5 at k=3 here — frequency
# across documents, not within: t33 handles within-doc repetition);
# every occurrence's token positions are covered (interval UNION, the
# t33 discipline — overlapping occurrences must not double-strip);
# the cleaned text is the uncovered tokens rejoined IN ORDER. The
# whole rewrite is pinned by an md5 checksum of every cleaned text
# (summed per source) — one wrong strip, kept token, or reordering
# shifts the checksum. Plan shape: one gram-keyed shuffle for df (the
# boilerplate set is bounded by the threshold → broadcast back), then
# per-document position work and one doc-keyed ordered reassembly —
# linear in corpus bytes, no cross-document state beyond the gram
# counts. At 100 TB this is the same ladder as d13/t30: grams never
# carry text bodies, and the df table is the only corpus-wide
# aggregate. Reference: Lee et al. 2022 (arXiv:2107.06499) deduplicate
# repeated substrings across a corpus; the df-threshold k-gram form is
# the streaming-friendly relaxation used in public curation stacks.
# --------------------------------------------------------------------------
_D18_K, _D18_DF_MIN = 3, 5


@register(
    "d18_boilerplate_removal",
    oracle=f"""
    WITH tok AS MATERIALIZED (
        SELECT doc_id, source,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    base AS MATERIALIZED (
        SELECT doc_id, source, w, len(w) AS n_tokens,
               CAST(list_sum(list_transform(w, x -> length(x)))
                    AS BIGINT) AS total_chars
        FROM tok WHERE len(w) > 0
    ),
    g AS MATERIALIZED (
        SELECT doc_id, CAST(r.i AS BIGINT) AS p,
               array_to_string(list_slice(w, r.i + 1, r.i + {_D18_K}), ' ')
                   AS g
        FROM base, LATERAL unnest(range(0, n_tokens - {_D18_K - 1})) r(i)
        WHERE n_tokens >= {_D18_K}
    ),
    bp AS MATERIALIZED (
        SELECT g FROM g GROUP BY g
        HAVING count(DISTINCT doc_id) >= {_D18_DF_MIN}
    ),
    cov AS (
        SELECT DISTINCT g.doc_id, u.p2 AS p
        FROM g JOIN bp USING (g),
             LATERAL unnest(range(g.p, g.p + {_D18_K})) u(p2)
    ),
    tokpos AS (
        SELECT doc_id, CAST(r.i AS BIGINT) AS p, w[r.i + 1] AS t,
               length(w[r.i + 1]) AS lc
        FROM base, LATERAL unnest(range(0, n_tokens)) r(i)
    ),
    kept AS (
        SELECT tp.doc_id,
               coalesce(string_agg(tp.t, ' ' ORDER BY tp.p), '')
                   AS cleaned,
               CAST(coalesce(sum(tp.lc), 0) AS BIGINT) AS kept_chars
        FROM tokpos tp
        LEFT JOIN cov c ON c.doc_id = tp.doc_id AND c.p = tp.p
        WHERE c.p IS NULL
        GROUP BY 1
    ),
    per_doc AS MATERIALIZED (
        SELECT b.doc_id, b.source, b.total_chars,
               coalesce(k.cleaned, '') AS cleaned,
               b.total_chars - coalesce(k.kept_chars, 0)
                   AS removed_chars
        FROM base b LEFT JOIN kept k USING (doc_id)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE removed_chars > 0) AS BIGINT)
               AS docs_touched,
           CAST((10000 * sum(removed_chars)) // sum(total_chars)
                AS BIGINT) AS removed_bp,
           CAST(sum({TX.md5_bucket_sql('cleaned', 1000000)}) AS BIGINT)
               AS cleaned_checksum
    FROM per_doc GROUP BY source ORDER BY source
    """,
    tags=("dedup", "boilerplate", "rewrite", "lee2022", "substring"),
)
def d18_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strip k-grams whose document frequency crosses the threshold
    (cross-doc boilerplate), interval-UNION covered positions, and
    rejoin the uncovered tokens in order; per-source doc counts,
    removed-char basis points, and an md5 checksum over every cleaned
    text pin the rewrite byte-for-byte."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    base = tracked_persist(
        docs.select(
            "doc_id",
            "source",
            F.expr(
                "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
            ).alias("w"),
        )
        .withColumn("n_tokens", F.size("w"))
        .withColumn(
            "total_chars",
            F.expr(
                "aggregate(w, CAST(0 AS BIGINT), (a, x) -> a + length(x))"
            ),
        )
        .filter(F.col("n_tokens") > 0)
    )
    g = tracked_persist(
        base.filter(F.col("n_tokens") >= _D18_K).select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, n_tokens - {_D18_K}),"
                    f" i -> struct(CAST(i AS BIGINT) AS p,"
                    f" concat_ws(' ', slice(w, i + 1, {_D18_K})) AS g))"
                )
            ).alias("s"),
        ).select("doc_id", F.col("s.p").alias("p"), F.col("s.g").alias("g"))
    )
    # the df table is the only corpus-wide aggregate; the qualifying
    # set is bounded by the threshold and broadcasts back
    bp = (
        g.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= _D18_DF_MIN)
        .select("g")
    )
    cov = (
        g.join(F.broadcast(bp), "g")
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(p, p + {_D18_K - 1})")).alias("p"),
        )
        .distinct()
    )
    tokpos = base.select(
        "doc_id", F.posexplode("w").alias("p", "t")
    ).select(
        "doc_id",
        F.col("p").cast("long").alias("p"),
        "t",
        F.length("t").alias("lc"),
    )
    kept = (
        tokpos.join(cov, ["doc_id", "p"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort("
                "collect_list(struct(p, t))), s -> s.t), ' ')"
            ).alias("cleaned"),
            F.sum("lc").cast("long").alias("kept_chars"),
        )
    )
    per_doc = (
        base.select("doc_id", "source", "total_chars")
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "total_chars",
            F.coalesce("cleaned", F.lit("")).alias("cleaned"),
            (
                F.col("total_chars")
                - F.coalesce("kept_chars", F.lit(0))
            ).alias("removed_chars"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("removed_chars") > 0, 1).otherwise(0))
            .cast("long")
            .alias("docs_touched"),
            F.expr(
                "CAST((10000 * sum(removed_chars)) div sum(total_chars)"
                " AS BIGINT)"
            ).alias("removed_bp"),
            F.sum(TX.md5_bucket("cleaned", 1000000))
            .cast("long")
            .alias("cleaned_checksum"),
        )
        .orderBy("source")
    )
