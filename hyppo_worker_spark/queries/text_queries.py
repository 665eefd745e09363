"""Text-analysis queries over the ``documents`` table: language-ID,
quality scoring, token statistics, fingerprinting. All Catalyst
expressions (see functions/text.py); oracles mirror each formula."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hyppo_worker_spark.functions import text as TX
from hyppo_worker_spark.queries import register
from hyppo_worker_spark.session import load_tables, local_frame, tracked_persist

_SQL_TOK = """
    tok AS (
        SELECT doc_id, lang, source, text,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS w
        FROM documents
    )
"""


def _sql_stop_count(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in TX.STOPWORDS[lang])
    return f"len(list_filter(w, x -> list_contains([{words}], x)))"


@register(
    "t01_language_id",
    oracle=f"""
    WITH {_SQL_TOK},
    scored AS (
        SELECT doc_id, lang AS actual_lang,
               {_sql_stop_count('de')} AS c_de,
               {_sql_stop_count('en')} AS c_en,
               {_sql_stop_count('es')} AS c_es,
               {_sql_stop_count('fr')} AS c_fr
        FROM tok
    ),
    pred AS (
        SELECT doc_id, actual_lang,
               CASE
                 WHEN c_de > 0 AND c_de >= c_en AND c_de >= c_es AND c_de >= c_fr THEN 'de'
                 WHEN c_en > 0 AND c_en >= c_es AND c_en >= c_fr THEN 'en'
                 WHEN c_es > 0 AND c_es >= c_fr THEN 'es'
                 WHEN c_fr > 0 THEN 'fr'
                 ELSE 'und'
               END AS predicted_lang
        FROM scored
    )
    SELECT predicted_lang, actual_lang, count(*) AS n_docs
    FROM pred GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("text", "language-id"),
)
def t01_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-heuristic language ID vs the labeled lang column.

    Row-oriented scoring: explode tokens once, broadcast-join the
    (lang, stopword) dim, count hits per (doc, lang) in one hash
    aggregate — instead of 4 inlined filter-lambdas per doc (the
    expression form compiles pathologically large codegen; same
    lesson as the MinHash operator). Argmax + alphabetical tie-break
    mirror functions.text.predict_lang and the oracle exactly.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    stop_dim = local_frame(spark, 
        [(lang, w) for lang, ws in sorted(TX.STOPWORDS.items()) for w in ws],
        "slang string, w string",
    )
    toks = docs.select("doc_id", F.explode(TX.tokens("text")).alias("w"))
    counts = (
        toks.join(F.broadcast(stop_dim), "w")
        .groupBy("doc_id")
        .pivot("slang", sorted(TX.STOPWORDS))
        .count()
    )
    scored = docs.join(counts, "doc_id", "left")
    cs = {lang: F.coalesce(F.col(lang), F.lit(0)) for lang in sorted(TX.STOPWORDS)}
    pred = (
        F.when(
            (cs["de"] > 0)
            & (cs["de"] >= cs["en"]) & (cs["de"] >= cs["es"]) & (cs["de"] >= cs["fr"]),
            "de",
        )
        .when((cs["en"] > 0) & (cs["en"] >= cs["es"]) & (cs["en"] >= cs["fr"]), "en")
        .when((cs["es"] > 0) & (cs["es"] >= cs["fr"]), "es")
        .when(cs["fr"] > 0, "fr")
        .otherwise("und")
    )
    return (
        scored.select(pred.alias("predicted_lang"), F.col("lang").alias("actual_lang"))
        .groupBy("predicted_lang", "actual_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("predicted_lang", "actual_lang")
    )


@register(
    "t02_quality_scores",
    oracle=f"""
    WITH {_SQL_TOK}
    SELECT doc_id,
           length(text) AS n_chars,
           len(w) AS n_tokens,
           round((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')))
                 * 1.0 / length(text), 4) AS punct_ratio,
           round(len(list_filter(w, x -> list_contains(
                 ['the','a','of','and','to','in','is','it','that','for'], x)))
                 * 1.0 / len(w), 4) AS stopword_ratio,
           round(list_reduce(list_prepend(0, list_transform(w, x -> length(x))),
                             (x, y) -> x + y) * 1.0 / len(w), 4) AS mean_token_len
    FROM tok
    WHERE length(text) > 0 AND len(w) > 0
    ORDER BY doc_id
    """,
    tags=("text", "quality"),
)
def t02_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: length, punct/stopword ratios."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = TX.tokens("text")
    m = TX.quality_metrics(F.col("text"), toks)
    return (
        docs.filter((F.length("text") > 0) & (F.size(toks) > 0))
        .select(
            "doc_id",
            m["n_chars"].alias("n_chars"),
            m["n_tokens"].alias("n_tokens"),
            F.round(m["punct_ratio"], 4).alias("punct_ratio"),
            F.round(m["stopword_ratio"], 4).alias("stopword_ratio"),
            F.round(m["mean_token_len"], 4).alias("mean_token_len"),
        )
        .orderBy("doc_id")
    )


@register(
    "t03_token_stats",
    oracle=f"""
    WITH {_SQL_TOK}
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(len(w)) AS BIGINT) AS total_tokens,
           CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT)
               AS total_regex_tokens,
           CAST(sum(len(regexp_extract_all(text,
               '''(?:s|t|ll|ve|re|d|m)| ?\\p{{L}}+| ?\\p{{N}}+| ?[^\\s\\p{{L}}\\p{{N}}]+')))
               AS BIGINT) AS total_bpe_tokens,
           round(avg(len(w)), 4) AS avg_tokens_per_doc,
           max(len(w)) AS max_tokens
    FROM tok
    GROUP BY source ORDER BY source
    """,
    tags=("text", "token-count", "bpe"),
)
def t03_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count statistics per source: whitespace tokens, a simple
    regex tokenizer, and a GPT-2-style BPE pre-tokenizer (contraction
    suffixes | space-prefixed letter runs | digit runs | punctuation
    runs — the standard pre-split whose piece count upper-bounds BPE
    token count; no lookahead so Java regex and RE2 agree)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = TX.tokens("text")
    regex_toks = F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)
    bpe_pattern = r"'(?:s|t|ll|ve|re|d|m)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
    bpe_toks = F.regexp_extract_all("text", F.lit(bpe_pattern), 0)
    return (
        docs.select(
            "source",
            F.size(toks).alias("nt"),
            F.size(regex_toks).alias("nr"),
            F.size(bpe_toks).alias("nb"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("total_tokens"),
            F.sum("nr").alias("total_regex_tokens"),
            F.sum("nb").alias("total_bpe_tokens"),
            F.round(F.avg("nt"), 4).alias("avg_tokens_per_doc"),
            F.max("nt").alias("max_tokens"),
        )
        .orderBy("source")
    )


@register(
    "t04_fingerprints",
    oracle=f"""
    WITH {_SQL_TOK},
    sh AS (
        SELECT doc_id, lang, w,
               CASE WHEN len(w) >= 3 THEN
                   list_distinct(list_transform(range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
               ELSE [] END AS sh
        FROM tok
    ),
    fp AS (
        SELECT doc_id, lang,
               md5(array_to_string(list_sort(list_distinct(w)), ' ')) AS bag_fp,
               array_to_string(
                   list_slice(list_sort(list_transform(sh, s -> md5(s))), 1, 4),
                   '|') AS winnow_fp
        FROM sh
    )
    SELECT lang,
           count(*) AS n_docs,
           count(DISTINCT bag_fp) AS n_bag_fp,
           count(DISTINCT winnow_fp) AS n_winnow_fp
    FROM fp GROUP BY lang ORDER BY lang
    """,
    tags=("text", "fingerprint"),
)
def t04_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct bag/winnowing fingerprints per language."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = TX.tokens("text")
    sh = TX.shingles(toks, 3)
    return (
        docs.select(
            "lang",
            TX.bag_fingerprint(toks).alias("bag_fp"),
            TX.winnow_fingerprint(sh, 4).alias("winnow_fp"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("bag_fp").alias("n_bag_fp"),
            F.countDistinct("winnow_fp").alias("n_winnow_fp"),
        )
        .orderBy("lang")
    )


@register(
    "t05_token_frequencies",
    oracle=f"""
    WITH {_SQL_TOK},
    ex AS (SELECT unnest(w) AS token FROM tok)
    SELECT token, count(*) AS freq
    FROM ex
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT 20
    """,
    tags=("text", "explode", "topk"),
)
def t05_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 token frequencies (explode → agg → top-k).

    The canonical vocabulary-building pass: explode fans each doc into
    token rows, the aggregation combines map-side, and the top-k is a
    TakeOrderedAndProject — at 100 TB the exchange carries only
    (token, partial count) pairs.
    """
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        docs.select(F.explode(TX.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "token")
        .limit(20)
    )


# --------------------------------------------------------------------------
# t06 — deterministic stratified sampling: the corpus-downsampling
# stage of a training pipeline. The gate is a pure function of the
# row key (md5(doc_id) mod 100 < per-language rate), so the sample is
# reproducible across engines, runs, AND partitionings — unlike
# rand()-based sampling — and at 100 TB it is a scan-local filter
# (no shuffle, prunes before any downstream stage). Rates stratify by
# language: downsample the dominant language hard, keep the tail.
# --------------------------------------------------------------------------
_SAMPLE_RATES = {"en": 40, "de": 70, "fr": 70}  # percent kept, default 100


def _sample_gate_spark():
    bucket = TX.md5_bucket("doc_id", 100)
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == lg, F.lit(pct))
            for lg, pct in _SAMPLE_RATES.items()
        ],
        F.lit(100),
    )
    return bucket < rate


_SAMPLE_RATE_SQL = (
    "CASE lang "
    + " ".join(f"WHEN '{lg}' THEN {pct}" for lg, pct in _SAMPLE_RATES.items())
    + " ELSE 100 END"
)


@register(
    "t06_stratified_sample",
    oracle=f"""
    WITH gated AS (
        SELECT lang,
               {TX.md5_bucket_sql('doc_id', 100)}
                   < ({_SAMPLE_RATE_SQL}) AS keep
        FROM documents
    )
    SELECT lang,
           count(*) AS n_docs,
           count(*) FILTER (WHERE keep) AS n_sampled
    FROM gated
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("text", "sampling", "training-data"),
)
def t06_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language doc counts before/after the deterministic
    hash-gated stratified sample."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        docs.withColumn("keep", _sample_gate_spark())
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("keep")).alias("n_sampled"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# t07 — weighted document sampling via a deterministic priority race:
# each doc draws u = 52-bit md5 uniform and races with key = u / w
# (w = n_chars); the k smallest keys per language win, so selection
# probability increases with weight. This is the Efraimidis–Spirakis
# reservoir shape with the exponential race (-ln(u)/w) replaced by a
# uniform race: ln/pow are NOT bit-reproducible across engines (IEEE
# guarantees only +,-,*,/,sqrt), while division is exact — so the
# sample is identical in Spark and DuckDB, across runs, and across
# partitionings. At 100 TB: scan-local key computation + per-group
# top-k (partial top-k map-side), no global sort.
# --------------------------------------------------------------------------
@register(
    "t07_weighted_sample",
    oracle="""
    WITH keyed AS (
        SELECT lang, doc_id, n_chars,
               CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::BIGINT AS DOUBLE)
                   / n_chars AS race_key
        FROM documents
        WHERE n_chars > 0
    ),
    ranked AS (
        SELECT lang, doc_id, n_chars,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY race_key, doc_id) AS rank
        FROM keyed
    )
    SELECT lang, doc_id, n_chars, rank
    FROM ranked WHERE rank <= 5
    ORDER BY lang, rank
    """,
    tags=("text", "sampling", "weighted", "training-data"),
)
def t07_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 weight-biased sample per language (deterministic race)."""
    from pyspark.sql import Window as W

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast("bigint")
        .cast("double")
    )
    keyed = docs.filter(F.col("n_chars") > 0).select(
        "lang", "doc_id", "n_chars", (u / F.col("n_chars")).alias("race_key")
    )
    w = W.partitionBy("lang").orderBy("race_key", "doc_id")
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("lang", "doc_id", "n_chars", "rank")
        .orderBy("lang", "rank")
    )


# --------------------------------------------------------------------------
# t08 — fixed-size token-window chunking with overlap: the stage that
# turns documents into training sequences. Chunk k covers tokens
# [k*stride+1, k*stride+chunk]; stride = chunk - overlap, and the
# chunk count ceil((n-overlap)/stride) guarantees every chunk past the
# first contributes at least one new token (no fully-contained tail).
# Row-oriented on purpose: explode the chunk INDEX first, then slice
# once per row — a per-doc transform() building all slices inside one
# nested lambda is the codegen trap (janino compile dominates). At
# 100 TB this is scan-local (explode + slice, no shuffle); the output
# exchange carries chunk fingerprints, not chunk text.
# --------------------------------------------------------------------------
_CHUNK, _OVERLAP = 16, 4
_STRIDE = _CHUNK - _OVERLAP


@register(
    "t08_token_chunks",
    oracle=f"""
    WITH {_SQL_TOK},
    sized AS (
        SELECT doc_id, w,
               greatest(CAST(ceil((len(w) - {_OVERLAP}) / {_STRIDE}.0) AS BIGINT),
                        1) AS n_chunks
        FROM tok WHERE len(w) > 0
    ),
    ks AS (
        SELECT doc_id, w, unnest(range(0, n_chunks)) AS k
        FROM sized
    ),
    ch AS (
        SELECT doc_id, k AS chunk_id,
               list_slice(w, k * {_STRIDE} + 1,
                          k * {_STRIDE} + {_CHUNK}) AS piece
        FROM ks
    )
    SELECT doc_id, chunk_id,
           CAST(len(piece) AS BIGINT) AS n_tokens,
           md5(array_to_string(piece, ' ')) AS chunk_fp
    FROM ch
    ORDER BY doc_id, chunk_id
    """,
    tags=("text", "chunking", "training-data"),
)
def t08_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token chunks per document (16-token windows,
    4-token overlap): chunk id, token count, md5 fingerprint."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    base = docs.select("doc_id", TX.tokens("text").alias("w")).filter(
        F.size("w") > 0
    )
    n_chunks = F.greatest(
        F.ceil((F.size("w") - F.lit(_OVERLAP)) / F.lit(float(_STRIDE))).cast(
            "bigint"
        ),
        F.lit(1).cast("bigint"),
    )
    rows = base.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias("k"),
    )
    piece = F.slice("w", (F.col("k") * _STRIDE + 1).cast("int"), _CHUNK)
    return rows.select(
        "doc_id",
        F.col("k").alias("chunk_id"),
        F.size(piece).cast("bigint").alias("n_tokens"),
        F.md5(F.concat_ws(" ", piece)).alias("chunk_fp"),
    ).orderBy("doc_id", "chunk_id")


# --------------------------------------------------------------------------
# t09 — bigram collocations by lift (the PMI exponent): observed bigram
# frequency vs the unigram-independence expectation. The score is kept
# as an exact integer ratio (lift_num = c_ab * N, lift_den = c_a * c_b)
# — logs/floats never enter the comparison, so ordering is bit-exact
# across engines; the ORDER BY ratio is one int64/int64 division, which
# IEEE 754 rounds identically everywhere. At 100 TB: tokens explode
# scan-local, both count aggregations combine map-side, and the unigram
# count table (vocabulary-sized) broadcast-joins onto the bigram table.
# --------------------------------------------------------------------------
@register(
    "t09_bigram_collocations",
    oracle=f"""
    WITH {_SQL_TOK},
    bg AS (
        SELECT w[i] AS a, w[i + 1] AS b
        FROM (
            SELECT w, unnest(range(1, len(w))) AS i
            FROM tok WHERE len(w) >= 2
        )
    ),
    bc AS (SELECT a, b, count(*) AS c_ab FROM bg GROUP BY a, b),
    uc AS (
        SELECT t, count(*) AS c FROM (SELECT unnest(w) AS t FROM tok)
        GROUP BY t
    ),
    tot AS (SELECT count(*) AS n FROM bg)
    SELECT a || ' ' || b AS bigram,
           c_ab,
           uc1.c AS c_a,
           uc2.c AS c_b,
           c_ab * n AS lift_num,
           uc1.c * uc2.c AS lift_den
    FROM bc, tot
    JOIN uc uc1 ON bc.a = uc1.t
    JOIN uc uc2 ON bc.b = uc2.t
    WHERE c_ab >= 5
    ORDER BY CAST(c_ab * n AS DOUBLE) / CAST(uc1.c * uc2.c AS DOUBLE) DESC,
             bigram
    LIMIT 20
    """,
    tags=("text", "collocation", "pmi", "topk"),
)
def t09_bigram_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigrams by lift = P(ab) / (P(a)P(b)), exact-integer
    scored (c_ab*N vs c_a*c_b)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    toks = docs.select(TX.tokens("text").alias("w")).filter(F.size("w") >= 2)
    bg = toks.select(
        F.explode(F.sequence(F.lit(1), F.size("w") - 1)).alias("i"), "w"
    ).select(
        F.element_at("w", F.col("i")).alias("a"),
        F.element_at("w", (F.col("i") + 1).cast("int")).alias("b"),
    )
    bc = bg.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    uc = (
        docs.select(F.explode(TX.tokens("text")).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = bg.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        bc.filter(F.col("c_ab") >= 5)
        .join(F.broadcast(n))
        .join(F.broadcast(uc.withColumnRenamed("t", "a").withColumnRenamed("c", "c_a")), "a")
        .join(F.broadcast(uc.withColumnRenamed("t", "b").withColumnRenamed("c", "c_b")), "b")
    )
    return (
        scored.select(
            F.concat_ws(" ", "a", "b").alias("bigram"),
            "c_ab",
            "c_a",
            "c_b",
            (F.col("c_ab") * F.col("n")).alias("lift_num"),
            (F.col("c_a") * F.col("c_b")).alias("lift_den"),
        )
        .orderBy(
            (
                F.col("lift_num").cast("double") / F.col("lift_den").cast("double")
            ).desc(),
            "bigram",
        )
        .limit(20)
    )


# --------------------------------------------------------------------------
# t10 — normalization + PII redaction: lowercase, URL/email masking,
# whitespace collapse — the standard cleaning pass before training.
# The raw corpus contains no PII, so the query PLANTS it
# deterministically (doc_id % 7 gets an email, % 11 a URL — same
# augmentation in both engines), making the redaction counts exact and
# nonzero rather than a vacuously-passing zero. Scan-local at 100 TB:
# regexp_replace/regexp_count are per-row codegen expressions; the only
# exchange carries per-source counters.
# --------------------------------------------------------------------------
_URL_RE = r"https?://[^ ]+"
_EMAIL_RE = r"[a-z0-9.]+@[a-z0-9.]+"


@register(
    "t10_normalize_redact",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id, source,
               lower(text)
               || CASE WHEN doc_id % 7 = 0
                       THEN ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com now'
                       ELSE '' END
               || CASE WHEN doc_id % 11 = 0
                       THEN ' see https://example.com/d/'
                            || CAST(doc_id AS VARCHAR) || ' ok'
                       ELSE '' END AS t
        FROM documents
    ),
    red AS (
        SELECT doc_id, source, t,
               len(regexp_extract_all(t, '{_URL_RE}')) AS n_url,
               len(regexp_extract_all(
                   regexp_replace(t, '{_URL_RE}', '<url>', 'g'),
                   '{_EMAIL_RE}')) AS n_email,
               trim(regexp_replace(
                   regexp_replace(
                       regexp_replace(t, '{_URL_RE}', '<url>', 'g'),
                       '{_EMAIL_RE}', '<email>', 'g'),
                   '\\s+', ' ', 'g')) AS rt
        FROM aug
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_url) AS BIGINT) AS urls_redacted,
           CAST(sum(n_email) AS BIGINT) AS emails_redacted,
           CAST(sum(len(t)) AS BIGINT) AS chars_before,
           CAST(sum(len(rt)) AS BIGINT) AS chars_after,
           count(DISTINCT md5(rt)) AS n_distinct_docs
    FROM red
    GROUP BY source ORDER BY source
    """,
    tags=("text", "cleaning", "redaction", "training-data"),
)
def t10_normalize_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source redaction counters + normalized-corpus checksums for
    the lowercase → mask URLs/emails → collapse-whitespace pass."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    t = F.concat(
        F.lower("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" see https://example.com/d/"),
                F.col("doc_id").cast("string"),
                F.lit(" ok"),
            ),
        ).otherwise(F.lit("")),
    )
    no_url = F.regexp_replace(t, _URL_RE, "<url>")
    rt = F.trim(
        F.regexp_replace(
            F.regexp_replace(no_url, _EMAIL_RE, "<email>"), r"\s+", " "
        )
    )
    aug = docs.select(
        "source",
        t.alias("t"),
        F.regexp_count(t, F.lit(_URL_RE)).alias("n_url"),
        F.regexp_count(no_url, F.lit(_EMAIL_RE)).alias("n_email"),
        rt.alias("rt"),
    )
    return (
        aug.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_url").alias("urls_redacted"),
            F.sum("n_email").alias("emails_redacted"),
            F.sum(F.length("t")).alias("chars_before"),
            F.sum(F.length("rt")).alias("chars_after"),
            F.countDistinct(F.md5("rt")).alias("n_distinct_docs"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# t11 — train/eval decontamination: flag training documents whose word
# 5-grams overlap a deterministically held-out eval split (md5 bucket
# < 10%). The standard benchmark-contamination check run before
# training-data release. Exact integer threshold (overlap*10 >= total)
# keeps the verdict bit-identical across engines. Probe strategy comes
# from operators/decontamination.py: the real contract takes the eval
# side as a parameter (a fixed benchmark suite → broadcast probe, the
# corpus never shuffles); when the eval gram set is corpus-proportional
# — as this query's 10% held-out split genuinely is — ``auto`` falls
# back to a shuffled inner join above the broadcast row threshold
# (tests/test_plans.py asserts both behaviors).
# --------------------------------------------------------------------------
_DECON_N = 5  # word n-gram order
_DECON_EVAL_PCT = 10  # held-out split size (md5 bucket %)


@register(
    "t11_decontamination",
    oracle=f"""
    WITH {_SQL_TOK},
    g AS (
        SELECT doc_id,
               {TX.md5_bucket_sql('doc_id', 100)}
                   < {_DECON_EVAL_PCT} AS is_eval,
               list_distinct(list_transform(range(1, len(w) - {_DECON_N - 2}),
                             i -> array_to_string(
                                      list_slice(w, i, i + {_DECON_N - 1}),
                                      ' '))) AS grams
        FROM tok
    ),
    ev AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE is_eval),
    tr AS (
        SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram
        FROM g WHERE NOT is_eval
    )
    SELECT doc_id,
           CAST(n_grams AS BIGINT) AS n_grams,
           count(*) AS n_overlap,
           count(*) * 10 >= n_grams AS contaminated
    FROM tr JOIN ev USING (gram)
    GROUP BY doc_id, n_grams
    ORDER BY doc_id
    """,
    tags=("text", "decontamination", "training-data"),
)
def t11_decontamination(
    spark: SparkSession, sf_dir: str, strategy: str = "auto"
) -> DataFrame:
    """Training docs sharing word 5-grams with the held-out eval split:
    per-doc distinct-gram total, overlap count, and a ≥10% contamination
    flag (exact integer compare)."""
    from hyppo_worker_spark.operators.decontamination import decontaminate

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    bucket = TX.md5_bucket("doc_id", 100)
    # Two-level persist (same rationale as operators/dedup.py
    # minhash_lsh_pairs): the gram array is referenced by two plan
    # branches; without the barrier Catalyst inlines the whole
    # tokenize/shingle expression into each, recomputing it per
    # exploded row (measured 18x slower). The repartition spreads the
    # single-file documents scan across cores before the CPU-heavy
    # shingle stage.
    par = spark.sparkContext.defaultParallelism
    words = (
        docs.repartition(par)
        .select(
            "doc_id",
            (bucket < _DECON_EVAL_PCT).alias("is_eval"),
            TX.tokens("text").alias("w"),
        )
        .transform(tracked_persist)
    )
    grams = words.select(
        "doc_id",
        "is_eval",
        TX.shingles(F.col("w"), _DECON_N).alias("grams"),
    ).transform(tracked_persist)
    eval_grams = grams.filter(F.col("is_eval")).select(
        F.explode("grams").alias("gram")
    )
    # grams arrays are distinct per doc, so n_grams == exploded row
    # count — the operator counts totals and overlaps accordingly.
    train = grams.filter(~F.col("is_eval")).select(
        "doc_id", F.explode("grams").alias("gram")
    )
    return decontaminate(train, eval_grams, strategy=strategy).orderBy("doc_id")


# --------------------------------------------------------------------------
# t12 — repetition quality signals (the Gopher-rules shape): per-doc
# fraction of tokens taken by the single most frequent word, and the
# fraction of trigram occurrences that are duplicates. Both thresholds
# are exact integer compares (top*5 > n ⇔ top/n > 20%; dup*10 > 3*tri
# ⇔ dup/tri > 30%) so the verdict is bit-identical across engines.
# Row-oriented on purpose (explode → two keyed hash aggregates with
# map-side partials) — per-doc nested list lambdas are the codegen
# trap. At 100 TB: explodes are scan-local; the shuffles carry narrow
# (doc_id, token/gram, count) rows, never document text.
# --------------------------------------------------------------------------
@register(
    "t12_repetition_signals",
    oracle=f"""
    WITH {_SQL_TOK},
    uni AS (SELECT doc_id, unnest(w) AS t FROM tok),
    ucnt AS (SELECT doc_id, t, count(*) AS c FROM uni GROUP BY 1, 2),
    ustat AS (
        SELECT doc_id, max(c) AS top_word_cnt,
               CAST(sum(c) AS BIGINT) AS n_tokens
        FROM ucnt GROUP BY 1
    ),
    tri AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w) - 1),
                      i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS g
        FROM tok WHERE len(w) >= 3
    ),
    tcnt AS (SELECT doc_id, g, count(*) AS c FROM tri GROUP BY 1, 2),
    tstat AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_trigrams,
               CAST(coalesce(sum(c) FILTER (WHERE c > 1), 0) AS BIGINT)
                   AS dup_tri_occ
        FROM tcnt GROUP BY 1
    )
    SELECT u.doc_id,
           n_tokens,
           top_word_cnt,
           coalesce(n_trigrams, 0) AS n_trigrams,
           coalesce(dup_tri_occ, 0) AS dup_tri_occ,
           (top_word_cnt * 5 > n_tokens)
               OR (coalesce(dup_tri_occ, 0) * 10 > coalesce(n_trigrams, 0) * 3)
               AS low_quality
    FROM ustat u LEFT JOIN tstat t ON u.doc_id = t.doc_id
    ORDER BY u.doc_id
    """,
    tags=("text", "quality", "repetition", "training-data"),
)
def t12_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition signals: most-frequent-word share, duplicate
    trigram share, and a low-quality flag (>20% top-word or >30%
    duplicated trigram occurrences; exact integer thresholds)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    base = docs.select("doc_id", TX.tokens("text").alias("w"))

    ustat = (
        base.select("doc_id", F.explode("w").alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.max("c").alias("top_word_cnt"),
            F.sum("c").alias("n_tokens"),
        )
    )
    idx = F.explode(F.sequence(F.lit(1), F.size("w") - 2)).alias("i")
    gram = F.concat_ws(
        " ",
        F.element_at("w", F.col("i")),
        F.element_at("w", F.col("i") + 1),
        F.element_at("w", F.col("i") + 2),
    )
    tstat = (
        base.filter(F.size("w") >= 3)
        .select("doc_id", "w")
        .select("doc_id", idx, "w")
        .select("doc_id", gram.alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_trigrams"),
            F.coalesce(
                F.sum(F.when(F.col("c") > 1, F.col("c"))), F.lit(0)
            ).alias("dup_tri_occ"),
        )
    )
    z = F.lit(0).cast("bigint")
    joined = ustat.join(tstat, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "top_word_cnt",
        F.coalesce("n_trigrams", z).alias("n_trigrams"),
        F.coalesce("dup_tri_occ", z).alias("dup_tri_occ"),
    )
    return joined.select(
        "*",
        (
            (F.col("top_word_cnt") * 5 > F.col("n_tokens"))
            | (F.col("dup_tri_occ") * 10 > F.col("n_trigrams") * 3)
        ).alias("low_quality"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# t13 — shard manifest for the training-data writer
# (operators/sharding.py): the deterministic md5-bucket placement
# function evaluated as a query, aggregated to a per-shard manifest
# (doc count, char volume, key range). The manifest IS the writer's
# contract — the same expression DuckDB evaluates here decides which
# ``shard=K`` directory every row of a 100 TB export lands in; a
# cross-engine hash match proves placement is a pure function of the
# key, independent of partitioning and engine. One narrow exchange
# (shard, partial aggregates); document text never shuffles.
# --------------------------------------------------------------------------
_N_SHARDS = 16


@register(
    "t13_shard_manifest",
    oracle=f"""
    WITH s AS (
        SELECT CAST({TX.md5_bucket_sql('doc_id', _N_SHARDS, chars=15)}
                    AS INTEGER) AS shard,
               doc_id, n_chars
        FROM documents
    )
    SELECT shard,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id
    FROM s GROUP BY shard ORDER BY shard
    """,
    tags=("sharding", "training-data", "sink-plan"),
)
def t13_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard manifest (docs, chars, key range) of the deterministic
    16-way training-data shard plan."""
    from hyppo_worker_spark.operators.sharding import assign_shards

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return (
        assign_shards(docs, "doc_id", _N_SHARDS)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("shard")
    )


# --------------------------------------------------------------------------
# t14 — concat-and-chunk sequence packing (operators/packing.py): map
# every document to the range of fixed-length training sequences its
# tokens occupy when the corpus token stream is concatenated in doc_id
# order and sliced every 512 tokens. The Spark side computes the
# global exclusive prefix sum with the two-pass distributed scan
# (per-range partials + broadcast offsets — no single-partition
# window); the oracle is the naive global window, so the hash match
# proves the distributed scan equals the sequential semantics.
# Integer division on both sides (DuckDB CAST(double) ROUNDS — the
# // operator is the truncating one).
# --------------------------------------------------------------------------
_SEQ_LEN = 512


@register(
    "t14_sequence_packing",
    oracle=f"""
    WITH {_SQL_TOK},
    counted AS (SELECT doc_id, len(w) AS n_tokens FROM tok),
    run AS (
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS offset_before
        FROM counted
    )
    SELECT doc_id, n_tokens, offset_before,
           offset_before // {_SEQ_LEN} AS seq_first,
           (offset_before + greatest(n_tokens, 1) - 1) // {_SEQ_LEN} AS seq_last
    FROM run ORDER BY doc_id
    """,
    tags=("text", "packing", "prefix-sum", "training-data"),
)
def t14_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token offsets and packed 512-token sequence ranges per
    document (distributed two-pass prefix sum)."""
    from hyppo_worker_spark.operators.packing import pack_sequences

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    counted = docs.select(
        "doc_id", F.size(TX.tokens("text")).cast("bigint").alias("n_tokens")
    )
    return (
        pack_sequences(counted, "doc_id", "n_tokens", _SEQ_LEN)
        .select("doc_id", "n_tokens", "offset_before", "seq_first", "seq_last")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# t15 — data-mixture rebalancing: downsample each language to hit a
# target mix (en 40 / de,es,fr,zh 15 each). The achievable corpus size
# is bounded by the scarcest stratum (min over n*100 div pct); each
# stratum keeps its quota via the deterministic md5 race (same device
# as t07), so the selected subset is a pure function of doc ids —
# identical across engines, runs, and partitionings. At 100 TB: the
# quota table is rows-per-language (broadcast); the race rank is a
# per-language window over narrow (lang, doc_id, race) rows; document
# text never shuffles. Integer `div` arithmetic end-to-end.
# --------------------------------------------------------------------------
_MIX_TARGET = (("en", 40), ("de", 15), ("es", 15), ("fr", 15), ("zh", 15))


@register(
    "t15_source_mix",
    oracle=f"""
    WITH target(lang, pct) AS (VALUES {", ".join(f"('{lg}', {p})" for lg, p in _MIX_TARGET)}),
    counts AS (SELECT lang, count(*) AS n_available FROM documents GROUP BY 1),
    j AS (SELECT lang, n_available, pct FROM counts JOIN target USING (lang)),
    tot AS (SELECT min(n_available * 100 // pct) AS total_max FROM j),
    ranked AS (
        SELECT lang, doc_id,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY md5(doc_id::VARCHAR), doc_id) AS rnk
        FROM documents
    ),
    kept AS (
        SELECT r.lang, count(*) AS n_kept
        FROM ranked r JOIN j USING (lang) CROSS JOIN tot
        WHERE rnk <= pct * total_max // 100
        GROUP BY r.lang
    )
    SELECT j.lang, j.n_available, j.pct AS target_pct, kept.n_kept
    FROM j JOIN kept USING (lang)
    ORDER BY j.lang
    """,
    tags=("text", "mixing", "sampling", "training-data"),
)
def t15_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quota sampling to a target mix: available docs,
    target percent, and the deterministically kept count."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    target = local_frame(spark, list(_MIX_TARGET), "lang string, pct int")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_available"))
    j = counts.join(F.broadcast(target), "lang")
    # The binding stratum (min over langs of n_available*100/pct) is a
    # 1-row aggregate joined back as a broadcast scalar — NOT a
    # driver-side .first(): the whole query stays one lazy plan (no
    # build-time Spark job), and coalesce(0) covers the no-strata case
    # with a stable schema.
    tm = j.agg(F.min(F.expr("n_available * 100 div pct")).alias("_total_max"))
    quota = j.crossJoin(F.broadcast(tm)).select(
        "lang",
        "n_available",
        "pct",
        F.expr("pct * coalesce(_total_max, 0) div 100").alias("quota"),
    )
    from pyspark.sql import Window as W

    race = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    kept = (
        docs.select("lang", "doc_id")
        .withColumn("rnk", F.row_number().over(race))
        .join(F.broadcast(quota), "lang")
        .filter(F.col("rnk") <= F.col("quota"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        quota.join(kept, "lang")
        .select("lang", "n_available", F.col("pct").alias("target_pct"), "n_kept")
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# t16 — distributed BPE vocabulary induction (the GPT-2 tokenizer
# training step): 3 merge rounds learned over the corpus. The corpus
# contributes ONE shuffle (word-frequency aggregation); every round
# after that runs on the vocabulary table (tiny at any corpus size —
# BPE state is vocab-sized, not corpus-sized). The merge rewrite is a
# plain string replace over '~'-wrapped symbol strings ('~o~~w~'):
# both engines define replace as leftmost non-overlapping, which IS
# BPE's merge order, and the wrapper guarantees symbol-boundary
# alignment (no false submatches, no boundary consumption between
# adjacent occurrences). The per-round argmax (count desc, pair asc)
# is a 1-row broadcast; the whole 3-round chain is one lazy DAG — no
# driver loops over data.
# --------------------------------------------------------------------------
def _bpe_round_sql(i: int) -> str:
    return f"""
    pairs{i} AS (
        SELECT s[k] || '~~' || s[k+1] AS pair, CAST(sum(freq) AS BIGINT) AS cnt
        FROM (SELECT string_split(substr(w, 2, len(w) - 2), '~~') AS s, freq
              FROM vocab{i}) t,
             unnest(range(1, len(s))) AS u(k)
        GROUP BY 1
    ),
    best{i} AS (
        SELECT pair, cnt, {i + 1} AS rank FROM pairs{i}
        ORDER BY cnt DESC, pair LIMIT 1
    ),
    vocab{i + 1} AS (
        SELECT replace(w, '~' || pair || '~',
                       '~' || replace(pair, '~~', '') || '~') AS w, freq
        FROM vocab{i} CROSS JOIN best{i}
    )"""


_BPE_ROUNDS = 3


@register(
    "t16_bpe_merges",
    oracle="""
    WITH tok AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                      x -> x <> '')) AS word
        FROM documents
    ),
    wf AS (SELECT word, count(*) AS freq FROM tok GROUP BY 1),
    vocab0 AS (
        SELECT '~' || array_to_string(list_transform(range(1, len(word) + 1),
                     i -> substr(word, i, 1)), '~~') || '~' AS w, freq
        FROM wf
    ),"""
    + ",".join(_bpe_round_sql(i) for i in range(_BPE_ROUNDS))
    + """
    SELECT rank, replace(pair, '~~', '+') AS merge_pair, cnt
    FROM ("""
    + " UNION ALL ".join(f"SELECT * FROM best{i}" for i in range(_BPE_ROUNDS))
    + """)
    ORDER BY rank
    """,
    tags=("text", "bpe", "tokenizer", "training-data", "iterative"),
)
def t16_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 3 BPE merges learned from the corpus (pair, corpus
    count): one corpus-scale word-count shuffle, then vocab-table-only
    iterations with 1-row broadcast argmax per round."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    _, bests = _bpe_learn(docs, _BPE_ROUNDS)
    out = bests[0]
    for b in bests[1:]:
        out = out.unionByName(b)
    return out.select(
        "rank",
        F.expr("replace(pair, '~~', '+')").alias("merge_pair"),
        "cnt",
    ).orderBy("rank")


def _bpe_learn(docs: DataFrame, rounds: int) -> tuple[DataFrame, list[DataFrame]]:
    """Shared BPE induction loop: returns (final symbol vocab after
    ``rounds`` merges, the per-round 1-row best-pair frames). One
    corpus-scale word-count shuffle; every iteration then works on the
    distinct-word vocab table only (the classic scale trick: encode
    distinct words weighted by frequency, never re-scan the corpus)."""
    wf = (
        docs.select(F.explode(TX.tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    vocab = wf.select(
        F.expr(
            "concat('~', array_join(transform(sequence(1, length(word)), "
            "i -> substring(word, i, 1)), '~~'), '~')"
        ).alias("w"),
        "freq",
    )
    bests = []
    for i in range(rounds):
        syms = vocab.select(
            F.split(F.expr("substr(w, 2, length(w) - 2)"), "~~").alias("s"),
            "freq",
        )
        # guard: Spark's sequence(1, 0) is DESCENDING, not empty
        pair_arr = F.when(
            F.size("s") >= 2,
            F.expr(
                "transform(sequence(1, size(s) - 1), "
                "k -> concat(element_at(s, k), '~~', element_at(s, k + 1)))"
            ),
        ).otherwise(F.array().cast("array<string>"))
        pairs = (
            syms.select(F.explode(pair_arr).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = (
            pairs.orderBy(F.col("cnt").desc(), "pair")
            .limit(1)
            .withColumn("rank", F.lit(i + 1))
        )
        bests.append(best)
        vocab = vocab.crossJoin(F.broadcast(best.select("pair"))).select(
            F.expr(
                "replace(w, concat('~', pair, '~'), "
                "concat('~', replace(pair, '~~', ''), '~'))"
            ).alias("w"),
            "freq",
        )
    return vocab, bests


# --------------------------------------------------------------------------
# t17 — BPE ENCODING with the learned merges: the tokenizer-family
# round trip (t16 trains; t17 applies). The corpus is never re-scanned
# for encoding: distinct words are encoded once on the vocab table and
# weighted by corpus frequency — the output is the post-merge subword
# distribution (top-20 by corpus count, ties broken by token), i.e.
# what the token stream feeding t14's packer would be made of. At
# 100 TB the vocab table is |distinct words| (millions), so every
# round after the one word-count shuffle is metadata-scale.
# --------------------------------------------------------------------------
@register(
    "t17_bpe_encoding",
    oracle="""
    WITH tok AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                      x -> x <> '')) AS word
        FROM documents
    ),
    wf AS (SELECT word, count(*) AS freq FROM tok GROUP BY 1),
    vocab0 AS (
        SELECT '~' || array_to_string(list_transform(range(1, len(word) + 1),
                     i -> substr(word, i, 1)), '~~') || '~' AS w, freq
        FROM wf
    ),"""
    + ",".join(_bpe_round_sql(i) for i in range(_BPE_ROUNDS))
    + f"""
    SELECT token, CAST(sum(freq) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split(substr(w, 2, len(w) - 2), '~~')) AS token,
                 freq
          FROM vocab{_BPE_ROUNDS}) t
    GROUP BY token
    ORDER BY cnt DESC, token
    LIMIT 20
    """,
    tags=("text", "bpe", "tokenizer", "training-data", "iterative"),
)
def t17_bpe_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 subword tokens (by corpus occurrence) after encoding the
    corpus with the 3 learned BPE merges."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    vocab, _ = _bpe_learn(docs, _BPE_ROUNDS)
    return (
        vocab.select(
            F.explode(
                F.split(F.expr("substr(w, 2, length(w) - 2)"), "~~")
            ).alias("token"),
            "freq",
        )
        .groupBy("token")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(20)
    )


# --------------------------------------------------------------------------
# t18 — hashing-trick linear quality classifier (fastText-shaped
# scoring: Joulin et al. 2016, "Bag of Tricks for Efficient Text
# Classification" — public paper). The heuristic signals (t02) rank
# documents by surface ratios; real pipelines (CCNet, RefinedWeb,
# FineWeb) score with a LEARNED linear model over hashed word n-gram
# features. This query is that scoring pass with a deterministic
# frozen weight table so both engines agree bit-for-bit:
#   feature = 'u:'+token and 'b:'+bigram (all occurrences, not
#   distinct — bag of features), hashed into _CLF_BUCKETS buckets via
#   the shared md5_bucket primitive; weight(bucket) is a fixed integer
#   in [-100, 100] derived from the bucket id (stand-in for trained
#   weights, which would load as a table the same way).
# Scale shape: the model is a BROADCAST dim (bucket, wt) — model size
# is independent of corpus size; the only corpus-scale shuffle is the
# per-doc score aggregation (map-side partials collapse each
# partition's feature rows first). The hashing trick bounds executor
# memory regardless of vocabulary size — no vocab build pass at all.
# All-integer score arithmetic (sum / count), so keep-decisions can't
# drift across engines; score_milli is floor(raw*1000/n) on an
# IEEE-exact double both engines compute identically.
# --------------------------------------------------------------------------
_CLF_BUCKETS = 4096
_CLF_WT_SQL = "((i * 2654435761 + 40503) % 1000003) % 201 - 100"
_CLF_KEEP_NUM = 5  # keep iff raw * 5 > n_feats  (mean weight > 0.2)


@register(
    "t18_quality_classifier",
    oracle=f"""
    WITH {_SQL_TOK},
    feats AS (
        SELECT doc_id, 'u:' || unnest(w) AS f FROM tok
        UNION ALL
        SELECT doc_id, 'b:' || w[i] || ' ' || w[i + 1] AS f
        FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM tok)
    ),
    wts AS (
        SELECT i AS bucket, {_CLF_WT_SQL} AS wt
        FROM range({_CLF_BUCKETS}) t(i)
    ),
    scored AS (
        SELECT doc_id, count(*) AS n, CAST(sum(wt) AS BIGINT) AS raw
        FROM (SELECT doc_id,
                     {TX.md5_bucket_sql('f', _CLF_BUCKETS)} AS bucket
              FROM feats)
        JOIN wts USING (bucket)
        GROUP BY 1
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_feats,
           CAST(floor(raw * 1000.0 / n) AS BIGINT) AS score_milli,
           (raw * {_CLF_KEEP_NUM} > n) AS keep
    FROM scored ORDER BY doc_id
    """,
    tags=("text", "quality", "classifier", "hashing-trick", "training-data"),
)
def t18_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document linear-classifier quality score over hashed
    unigram+bigram features with a broadcast frozen weight table;
    keep iff mean feature weight exceeds 0.2 (exact integer compare)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    words = docs.select("doc_id", TX.tokens("text").alias("w"))
    uni = words.select(
        "doc_id", F.explode("w").alias("t")
    ).select("doc_id", F.concat(F.lit("u:"), F.col("t")).alias("f"))
    bi = words.select(
        "doc_id", F.explode(TX.word_ngrams(F.col("w"), 2)).alias("t")
    ).select("doc_id", F.concat(F.lit("b:"), F.col("t")).alias("f"))
    wts = spark.range(_CLF_BUCKETS).select(
        F.col("id").alias("bucket"),
        (((F.col("id") * F.lit(2654435761) + F.lit(40503)) % F.lit(1000003))
         % F.lit(201) - F.lit(100)).alias("wt"),
    )
    scored = (
        uni.unionByName(bi)
        .select("doc_id", TX.md5_bucket(F.col("f"), _CLF_BUCKETS).alias("bucket"))
        .join(F.broadcast(wts), "bucket")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("wt").alias("raw"))
    )
    return scored.select(
        "doc_id",
        F.col("n").alias("n_feats"),
        F.floor(F.col("raw") * 1000.0 / F.col("n")).cast("long").alias("score_milli"),
        (F.col("raw") * _CLF_KEEP_NUM > F.col("n")).alias("keep"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# t19 — unigram surprisal quality signal (the integer-exact core of
# LM-perplexity filtering à la CCNet, Wenzek et al. 2020 — public
# paper). True log-prob scoring needs log(), which is transcendental
# and not bit-portable across engines; the WHOLE-BIT surprisal
# floor(log2(N / count(w))) is: it is the bit-length of the integer
# ratio, computed with conv/bin — so a document's mean surprisal (how
# rare its words are against the corpus unigram distribution) is
# cross-engine exact. High mean = rare/garbled vocabulary; low mean =
# boilerplate. Scale shape: one corpus shuffle for the unigram table;
# scoring joins exploded tokens to that table keyed by token (the
# vocabulary is tiny next to the corpus, and the 1-row N total rides a
# broadcast); one per-doc aggregation shuffle.
# --------------------------------------------------------------------------
@register(
    "t19_unigram_surprisal",
    oracle=f"""
    WITH {_SQL_TOK},
    ex AS (SELECT doc_id, unnest(w) AS token FROM tok),
    uni AS (SELECT token, count(*) AS cnt FROM ex GROUP BY 1),
    n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM uni),
    scored AS (
        SELECT token, length(bin(n_total // cnt)) - 1 AS bits
        FROM uni, n
    ),
    per_doc AS (
        SELECT ex.doc_id,
               count(*) AS n_tokens,
               CAST(sum(bits) AS BIGINT) AS bits_sum
        FROM ex JOIN scored USING (token)
        GROUP BY 1
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(floor(bits_sum * 1000.0 / n_tokens) AS BIGINT)
               AS mean_surprisal_milli,
           CASE WHEN bits_sum * 1000 < 4000 * n_tokens THEN 'common'
                WHEN bits_sum * 1000 < 9000 * n_tokens THEN 'mixed'
                ELSE 'rare' END AS band
    FROM per_doc ORDER BY doc_id
    """,
    tags=("text", "quality", "language-model", "surprisal", "training-data"),
)
def t19_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean whole-bit unigram surprisal vs the corpus
    distribution, banded into common/mixed/rare vocabularies — all
    integer arithmetic (bit-length of N div count), no log()."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    ex = docs.select("doc_id", F.explode(TX.tokens("text")).alias("token"))
    uni = ex.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    n = uni.agg(F.sum("cnt").cast("long").alias("n_total"))
    scored = uni.crossJoin(F.broadcast(n)).select(
        "token",
        (
            F.length(F.conv(F.expr("n_total div cnt"), 10, 2)) - 1
        ).alias("bits"),
    )
    per_doc = (
        ex.join(scored, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("bits").cast("long").alias("bits_sum"),
        )
    )
    band = (
        F.when(F.col("bits_sum") * 1000 < 4000 * F.col("n_tokens"), "common")
        .when(F.col("bits_sum") * 1000 < 9000 * F.col("n_tokens"), "mixed")
        .otherwise("rare")
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        F.floor(F.col("bits_sum") * 1000.0 / F.col("n_tokens"))
        .cast("long")
        .alias("mean_surprisal_milli"),
        band.alias("band"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# t20 — TextRank keyword extraction (Mihalcea & Tarau 2004 — public
# paper): weighted PageRank over the token co-occurrence graph.
# Extends the iterative-algorithm family (CC d07, Lloyd s04, BPE t16)
# with the classic graph-centrality recurrence, in the same
# deterministic discipline: ranks live on a fixed-point integer grid
# (SCALE=1e6) and each round is pure integer arithmetic —
#   r'(v) = 0.15*SCALE + (85 * Σ_u (r(u)*w_uv div ws_u)) div 100
# — so five rounds are bit-identical across engines (float PageRank is
# neither order- nor engine-stable). Graph: adjacent-token pairs
# (window 2), symmetrized, weight = adjacency count. Scale shape: the
# corpus is scanned ONCE to build the edge list (one shuffle keyed by
# the token pair); every round after runs on the vocabulary-sized edge
# table — one join + one groupBy per round, lineage truncated per
# round exactly like connected_components.
# --------------------------------------------------------------------------
_TR_SCALE = 1_000_000
_TR_ROUNDS = 5


def _tr_round_sql(i: int) -> str:
    return f"""
    r{i + 1} AS (
        SELECT e.v AS token,
               150000 + (85 * CAST(sum((r.r * e.w) // e.ws) AS BIGINT)) // 100
                   AS r
        FROM e JOIN r{i} r ON r.token = e.u
        GROUP BY e.v
    )"""


@register(
    "t20_textrank_keywords",
    oracle=f"""
    WITH {_SQL_TOK},
    adj AS (
        SELECT w[i] AS u, w[i + 1] AS v
        FROM (SELECT w, unnest(range(1, len(w))) AS i FROM tok)
        WHERE w[i] <> w[i + 1]
    ),
    und AS (SELECT u, v FROM adj UNION ALL SELECT v AS u, u AS v FROM adj),
    edges AS (SELECT u, v, count(*) AS w FROM und GROUP BY 1, 2),
    ws AS (SELECT u, CAST(sum(w) AS BIGINT) AS ws FROM edges GROUP BY 1),
    e AS (SELECT edges.u, edges.v, edges.w, ws.ws FROM edges JOIN ws USING (u)),
    r0 AS (SELECT DISTINCT u AS token, {_TR_SCALE}::BIGINT AS r FROM edges),
    {",".join(_tr_round_sql(i) for i in range(_TR_ROUNDS))}
    SELECT token, CAST(r AS BIGINT) AS rank_scaled
    FROM r{_TR_ROUNDS}
    ORDER BY rank_scaled DESC, token LIMIT 20
    """,
    tags=("text", "keywords", "textrank", "pagerank", "iterative", "graph"),
)
def t20_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus keywords by 5 rounds of fixed-point weighted
    PageRank over the symmetrized adjacent-token graph."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    words = docs.select(TX.tokens("text").alias("w"))
    pair = words.select(
        F.explode(TX.word_ngrams(F.col("w"), 2)).alias("g")
    ).select(
        F.split(F.col("g"), " ").getItem(0).alias("u"),
        F.split(F.col("g"), " ").getItem(1).alias("v"),
    ).filter(F.col("u") != F.col("v"))
    und = pair.unionByName(
        pair.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    edges = und.groupBy("u", "v").agg(F.count(F.lit(1)).alias("w"))
    ws = edges.groupBy("u").agg(F.sum("w").cast("long").alias("ws"))
    e = edges.join(ws, "u").transform(tracked_persist)
    ranks = e.select("u").distinct().select(
        F.col("u").alias("token"), F.lit(_TR_SCALE).cast("long").alias("r")
    )
    for _ in range(_TR_ROUNDS):
        contrib = (
            e.join(ranks, e["u"] == ranks["token"])
            .select("v", F.expr("(r * w) div ws").alias("c"))
            .groupBy("v")
            .agg(F.sum("c").cast("long").alias("cs"))
        )
        ranks = contrib.select(
            F.col("v").alias("token"),
            (F.lit(150000) + F.expr("(85 * cs) div 100")).cast("long").alias("r"),
        ).localCheckpoint(eager=False)
    return (
        ranks.select("token", F.col("r").alias("rank_scaled"))
        .orderBy(F.col("rank_scaled").desc(), "token")
        .limit(20)
    )


# --------------------------------------------------------------------------
# t21 — padding waste under length-bucketed batching: the inference/
# training batcher's question (fixed batch of B sequences padded to
# the in-batch max) answered for two policies — arrival order vs
# sorted-by-length — with the waste measured in integer basis points.
# The scale story is the RANK: a global sort order is assigned with
# the distributed two-pass prefix sum (`operators/packing.py` summing
# ones — rank = count of rows strictly before), so there is no
# single-partition window anywhere; the oracle uses a plain
# row_number() (fine at oracle scale). Length-sorting cuts padding
# waste ~10x on this corpus — the point of bucketed batching.
# --------------------------------------------------------------------------
_T21_B = 32


@register(
    "t21_padding_waste",
    oracle=f"""
    WITH lens AS (
        SELECT doc_id,
               len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                   x -> x <> ''))::BIGINT AS n
        FROM documents
    ),
    pol AS (
        SELECT 'arrival' AS policy,
               (row_number() OVER (ORDER BY doc_id) - 1) // {_T21_B} AS batch,
               n
        FROM lens
        UNION ALL
        SELECT 'length_sorted',
               (row_number() OVER (ORDER BY n, doc_id) - 1) // {_T21_B},
               n
        FROM lens
    ),
    per_batch AS (
        SELECT policy, batch, count(*) AS m, max(n) AS mx,
               sum(n) AS real_t
        FROM pol GROUP BY 1, 2
    )
    SELECT policy,
           count(*) AS n_batches,
           CAST(sum(real_t) AS BIGINT) AS real_tokens,
           CAST(sum(m * mx) AS BIGINT) AS padded_tokens,
           CAST((sum(m * mx) - sum(real_t)) * 10000 // sum(m * mx) AS BIGINT)
               AS waste_bp
    FROM per_batch GROUP BY 1 ORDER BY 1
    """,
    tags=("text", "batching", "packing", "padding"),
)
def t21_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding waste (basis points) of B=32 batches padded to the
    in-batch max, under arrival-order vs sorted-by-length batching —
    global ranks via the distributed prefix-sum operator."""
    from hyppo_worker_spark.operators.packing import exclusive_prefix_sum

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    lens = docs.select(
        "doc_id", F.size(TX.tokens("text")).cast("long").alias("n")
    ).withColumn("one", F.lit(1).cast("long"))

    def policy(name: str, okey):
        ranked = exclusive_prefix_sum(
            lens.withColumn("okey", okey), "okey", "one", out_col="rank"
        )
        return ranked.select(
            F.lit(name).alias("policy"),
            F.expr(f"rank div {_T21_B}").alias("batch"),
            "n",
        )

    pol = policy("arrival", F.col("doc_id")).unionByName(
        policy(
            "length_sorted",
            F.col("n") * F.lit(1 << 32).cast("long") + F.col("doc_id"),
        )
    )
    per_batch = pol.groupBy("policy", "batch").agg(
        F.count(F.lit(1)).alias("m"),
        F.max("n").alias("mx"),
        F.sum("n").alias("real_t"),
    )
    return (
        per_batch.groupBy("policy")
        .agg(
            F.count(F.lit(1)).alias("n_batches"),
            F.sum("real_t").cast("long").alias("real_tokens"),
            F.sum(F.col("m") * F.col("mx")).cast("long").alias("padded_tokens"),
            F.expr(
                "CAST((sum(m * mx) - sum(real_t)) * 10000 div sum(m * mx) AS BIGINT)"
            ).alias("waste_bp"),
        )
        .orderBy("policy")
    )


# --------------------------------------------------------------------------
# t22 — cross-source overlap matrix: pairwise shared distinct 5-grams
# between sources (the contamination/diversity report a corpus mix is
# curated from — t11 answers "is train contaminated by eval", this
# answers "which SOURCES overlap each other"). Scale discipline: the
# pair fan-out of a gram present in s sources is s², so grams above a
# presence cap (> _T22_CAP sources) are DROPPED before the self-join —
# boilerplate that universal is its own dedup class, and the cap turns
# the worst case from n_sources² per gram into CAP² (the same
# hot-bucket rule the LSH dedup uses). Jaccard in integer basis
# points over the capped gram sets; top-30 pairs. Grams travel as
# 52-bit md5 hashes from the scan on (never as strings) — see the
# in-function note.
# --------------------------------------------------------------------------
_T22_N = 5  # gram order
_T22_CAP = 10  # drop grams present in more than this many sources


@register(
    "t22_source_overlap",
    oracle=f"""
    WITH {_SQL_TOK},
    dg AS (
        SELECT DISTINCT source,
            ('0x' || substr(md5(unnest(
                list_distinct(list_transform(range(1, len(w) - {_T22_N - 2}),
                    i -> array_to_string(list_slice(w, i, i + {_T22_N - 1}), ' '))))),
                1, 13))::BIGINT AS gram
        FROM tok
    ),
    presence AS (SELECT gram, count(*) AS c FROM dg GROUP BY 1),
    kept AS (
        SELECT dg.source, dg.gram FROM dg
        JOIN presence USING (gram) WHERE presence.c <= {_T22_CAP}
    ),
    sizes AS (SELECT source, count(*) AS n FROM kept GROUP BY 1),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               count(*) AS shared_grams
        FROM kept a JOIN kept b ON a.gram = b.gram AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT p.source_a, p.source_b,
           CAST(p.shared_grams AS BIGINT) AS shared_grams,
           CAST(p.shared_grams * 10000 //
                (sa.n + sb.n - p.shared_grams) AS BIGINT) AS jaccard_bp
    FROM pairs p
    JOIN sizes sa ON sa.source = p.source_a
    JOIN sizes sb ON sb.source = p.source_b
    ORDER BY shared_grams DESC, source_a, source_b LIMIT 30
    """,
    tags=("text", "contamination", "overlap", "ngram"),
)
def t22_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 source pairs by shared distinct 5-grams (presence-capped
    against universal boilerplate), with integer Jaccard."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # Grams are reduced to 52-bit md5 hashes SCAN-SIDE, before any
    # shuffle: the distinct / presence / self-join stages then move
    # 8-byte ints instead of ~30-byte strings (measured 4x on the
    # sf0.1 wall). The hash is the shared KMV convention, so the
    # oracle reproduces it exactly; a collision (~1e-2 odds across
    # 1e7 grams at 52 bits) would merge two grams IDENTICALLY in both
    # engines — deterministic, and a ±1 on a shared-gram count.
    # Materialize the token ARRAY before shingling (the _minhash_banded
    # lesson, operators/dedup.py): inlined, the tokenize expression is
    # collapsed into every one of the 5 element_at() calls per gram
    # position and codegen slows ~15x.
    words = docs.select("source", TX.tokens("text").alias("w")).transform(tracked_persist)
    dg = (
        words.select(
            "source",
            F.explode(TX.shingles(F.col("w"), _T22_N)).alias("g"),
        )
        .select(
            "source",
            F.conv(F.substring(F.md5("g"), 1, 13), 16, 10)
            .cast("bigint")
            .alias("gram"),
        )
        .distinct()
        # persisted: dg feeds BOTH the presence count and the kept
        # join — without the barrier the tokenize+shingle explode (the
        # expensive stage) runs twice
        .transform(tracked_persist)
    )
    presence = dg.groupBy("gram").agg(F.count(F.lit(1)).alias("c"))
    kept = (
        dg.join(presence, "gram")
        .filter(F.col("c") <= _T22_CAP)
        .select("source", "gram")
        .transform(tracked_persist)
    )
    sizes = kept.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        kept.alias("a")
        .join(
            kept.alias("b"),
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )
    out = (
        pairs.join(
            F.broadcast(sizes.select(F.col("source").alias("source_a"), F.col("n").alias("na"))),
            "source_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "shared_grams",
            F.expr(
                "CAST(shared_grams * 10000 div (na + nb - shared_grams) AS BIGINT)"
            ).alias("jaccard_bp"),
        )
    )
    return out.orderBy(
        F.col("shared_grams").desc(), "source_a", "source_b"
    ).limit(30)


# --------------------------------------------------------------------------
# t23 — inverted-index term retrieval: the postings-list shape every
# corpus search tool needs (find training docs matching an audit
# query). Postings = (term, doc_id, tf) built in ONE corpus-scale
# shuffle; the (tiny) query-term table broadcast-joins against it, so
# the corpus side never reshuffles per query — at 100 TB the postings
# table is built once and every audit query is a broadcast probe +
# one narrow (query, doc) aggregation. Scoring is ALL-INTEGER
# coordinate ranking (matched distinct terms, then total tf, then
# doc_id) — no idf/log, so ranks are bit-identical cross-engine.
# --------------------------------------------------------------------------
_T23_QUERIES = (
    ("q1", ("spark", "window", "merge")),
    ("q2", ("hash", "join", "filter")),
    ("q3", ("vector", "stream", "batch")),
)
_T23_K = 5


@register(
    "t23_term_retrieval",
    oracle=f"""
    WITH {_SQL_TOK},
    postings AS (
        SELECT doc_id, unnest(w) AS term FROM tok
    ),
    tf AS (
        SELECT term, doc_id, count(*) AS tf FROM postings GROUP BY 1, 2
    ),
    qterms AS (
        SELECT * FROM (VALUES
            {", ".join(f"('{qid}', '{t}')" for qid, ts in _T23_QUERIES for t in ts)}
        ) AS v(query_id, term)
    ),
    scored AS (
        SELECT q.query_id, t.doc_id,
               count(*) AS matched,
               CAST(sum(t.tf) AS BIGINT) AS tf_sum
        FROM qterms q JOIN tf t USING (term)
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id
            ORDER BY matched DESC, tf_sum DESC, doc_id) AS rank
        FROM scored
    )
    SELECT query_id, rank, doc_id, CAST(matched AS BIGINT) AS matched, tf_sum
    FROM ranked WHERE rank <= {_T23_K}
    ORDER BY query_id, rank
    """,
    tags=("text", "retrieval", "inverted-index", "topk"),
)
def t23_term_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 documents per audit query by integer coordinate ranking
    (matched terms, then term frequency) over a postings table."""
    from pyspark.sql import Window as W

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tf = (
        docs.select("doc_id", F.explode(TX.tokens("text")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    qrows = [(qid, t) for qid, ts in _T23_QUERIES for t in ts]
    qterms = local_frame(spark, qrows, "query_id string, term string")
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("matched"),
            F.sum("tf").cast("long").alias("tf_sum"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("matched").desc(), F.col("tf_sum").desc(), "doc_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _T23_K)
        .select("query_id", "rank", "doc_id", "matched", "tf_sum")
        .orderBy("query_id", "rank")
    )


# --------------------------------------------------------------------------
# t24 — vocabulary coverage curve: the tokenizer-sizing question
# ("how much of the corpus does a top-N vocabulary cover?") as a
# query. One corpus-scale token-count shuffle; the curve itself needs
# only the top-N prefix (TakeOrderedAndProject — never a global sort)
# plus the corpus total (a 1-row aggregate), so the single-partition
# cumulative window runs over at most max(N) rows — the q47 "window
# over dozens of rows" exemption, not a scale hazard. Output: integer
# coverage basis points per candidate vocab size, the curve a BPE
# budget (t16's vocab table) is chosen against.
# --------------------------------------------------------------------------
_T24_SIZES = (5, 10, 20, 40)


@register(
    "t24_vocab_coverage",
    oracle=f"""
    WITH {_SQL_TOK},
    toks AS (SELECT unnest(w) AS token FROM tok),
    tc AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS vocab FROM tc),
    top AS (
        SELECT token, cnt,
               row_number() OVER (ORDER BY cnt DESC, token) AS r
        FROM tc ORDER BY cnt DESC, token LIMIT {max(_T24_SIZES)}
    ),
    sizes(n) AS (VALUES {", ".join(f"({n})" for n in _T24_SIZES)})
    SELECT CAST(n AS BIGINT) AS vocab_size,
           CAST(sum(cnt) FILTER (WHERE r <= n) AS BIGINT) AS covered_tokens,
           tot.total AS total_tokens,
           CAST(sum(cnt) FILTER (WHERE r <= n) * 10000 // tot.total AS BIGINT)
               AS coverage_bp,
           tot.vocab AS distinct_tokens
    FROM sizes, top, tot
    GROUP BY n, tot.total, tot.vocab
    ORDER BY vocab_size
    """,
    tags=("text", "tokenizer", "vocabulary", "coverage"),
)
def t24_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token coverage (basis points) at candidate vocabulary
    sizes, from the frequency-ranked top-N prefix."""
    from pyspark.sql import Window as W

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tc = (
        docs.select(F.explode(TX.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .transform(tracked_persist)
    )
    tot = tc.agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    top = (
        tc.orderBy(F.col("cnt").desc(), "token")
        .limit(max(_T24_SIZES))
        .withColumn(
            "r",
            F.row_number().over(
                W.partitionBy(F.lit(1)).orderBy(F.col("cnt").desc(), "token")
            ),
        )
    )
    sizes = local_frame(spark, [(n,) for n in _T24_SIZES], "n long")
    return (
        sizes.crossJoin(top)
        .crossJoin(F.broadcast(tot))
        .groupBy("n", "total", "vocab")
        .agg(
            F.sum(F.when(F.col("r") <= F.col("n"), F.col("cnt"))).cast("long").alias("covered")
        )
        .select(
            F.col("n").alias("vocab_size"),
            F.col("covered").alias("covered_tokens"),
            F.col("total").alias("total_tokens"),
            F.expr("CAST(covered * 10000 div total AS BIGINT)").alias("coverage_bp"),
            F.col("vocab").alias("distinct_tokens"),
        )
        .orderBy("vocab_size")
    )


# --------------------------------------------------------------------------
# t25 — source distribution drift: per-source token-share divergence
# from the corpus profile (the mix-health guard — a source whose
# token distribution walks away from the corpus is changing under
# you). Profile = the corpus-wide top-K tokens (TakeOrdered prefix,
# never a global sort); shares are integer basis points (cnt * 10000
# div total), and the drift score is the L1 distance over the profile
# — pure integers end to end, so scores hash identically across
# engines. Tokens outside the top-K are excluded from BOTH sides by
# construction (documented: this is profile drift, not total
# variation). Shape: one corpus token-count shuffle, a broadcast
# profile join, one per-source rollup.
# --------------------------------------------------------------------------
_T25_K = 40


@register(
    "t25_source_drift",
    oracle=f"""
    WITH {_SQL_TOK},
    toks AS (SELECT source, unnest(w) AS token FROM tok),
    tc AS (SELECT source, token, count(*) AS cnt FROM toks GROUP BY 1, 2),
    g AS (SELECT token, CAST(sum(cnt) AS BIGINT) AS gcnt FROM tc GROUP BY 1),
    gt AS (SELECT CAST(sum(gcnt) AS BIGINT) AS total FROM g),
    prof AS (
        SELECT token, gcnt FROM g ORDER BY gcnt DESC, token LIMIT {_T25_K}
    ),
    st AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS s_total
           FROM tc GROUP BY 1),
    joined AS (
        SELECT s.source, p.token,
               coalesce(t.cnt, 0) * 10000 // s.s_total AS s_bp,
               p.gcnt * 10000 // gt.total AS g_bp
        FROM st s
        CROSS JOIN prof p
        CROSS JOIN gt
        LEFT JOIN tc t ON t.source = s.source AND t.token = p.token
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS profile_tokens,
           CAST(sum(abs(s_bp - g_bp)) AS BIGINT) AS l1_drift_bp
    FROM joined GROUP BY 1 ORDER BY 1
    """,
    tags=("text", "drift", "distribution", "data-quality"),
)
def t25_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source L1 divergence (basis points) of top-{K}-token shares
    from the corpus-wide profile."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tc = (
        docs.select("source", F.explode(TX.tokens("text")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .transform(tracked_persist)
    )
    g = tc.groupBy("token").agg(F.sum("cnt").cast("long").alias("gcnt"))
    gt = g.agg(F.sum("gcnt").cast("long").alias("total"))
    prof = g.orderBy(F.col("gcnt").desc(), "token").limit(_T25_K)
    st = tc.groupBy("source").agg(F.sum("cnt").cast("long").alias("s_total"))
    joined = (
        st.crossJoin(F.broadcast(prof))
        .crossJoin(F.broadcast(gt))
        .join(tc, ["source", "token"], "left")
        .select(
            "source",
            F.expr("coalesce(cnt, 0) * 10000 div s_total").alias("s_bp"),
            F.expr("gcnt * 10000 div total").alias("g_bp"),
        )
    )
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("profile_tokens"),
            F.sum(F.abs(F.col("s_bp") - F.col("g_bp")))
            .cast("long")
            .alias("l1_drift_bp"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# t26 — temperature-scaled source mixing (the exponential-smoothing
# sampling of multilingual/multi-source pretraining — XLM-R / mT5
# style p_s ∝ size_s^alpha, public technique). alpha = 0.5 realized
# INTEGER-EXACTLY: the source weight is floor(sqrt(sum_chars))
# (IEEE-754 sqrt is correctly rounded, so floor(sqrt) is bit-portable
# across engines), per-source document targets are integer
# floor-division shares of the budget, and the admission gate is the
# engine's standard md5 threshold — keep iff
# bucket(doc_id) * n_s < target_s * 1e6 — so membership is a pure
# function of the doc id. Scale shape: one scan → per-source agg
# (|sources| rows) → 1-row totals broadcast → gate on a second scan;
# no corpus-wide sort or window anywhere (a rank-based exact-quota
# variant would need one — this is the scalable trade).
# --------------------------------------------------------------------------
_T26_BUDGET_PCT = 40  # sample ~40% of the corpus, re-balanced by alpha


@register(
    "t26_temperature_mix",
    oracle=f"""
    WITH srcs AS (
        SELECT source,
               count(*) AS n_docs,
               CAST(floor(sqrt(sum(n_chars))) AS BIGINT) AS weight
        FROM documents GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
               CAST(sum(weight) AS BIGINT) AS w_total
        FROM srcs
    ),
    targets AS (
        SELECT s.source, s.n_docs, s.weight,
               (t.n_total * {_T26_BUDGET_PCT} // 100) * s.weight
                   // t.w_total AS target_docs
        FROM srcs s CROSS JOIN tot t
    ),
    kept AS (
        SELECT d.source, count(*) AS n_kept
        FROM documents d JOIN targets tg ON tg.source = d.source
        WHERE {{gate}} * tg.n_docs < tg.target_docs * 1000000
        GROUP BY 1
    )
    SELECT tg.source, tg.n_docs, tg.weight,
           CAST(tg.target_docs AS BIGINT) AS target_docs,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
    FROM targets tg LEFT JOIN kept k ON k.source = tg.source
    ORDER BY tg.source
    """.replace("{gate}", TX.md5_bucket_sql("d.doc_id", 1_000_000)),
    tags=("text", "sampling", "mixing", "temperature", "training-data"),
)
def t26_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alpha=0.5 temperature mix: per-source doc targets proportional
    to floor(sqrt(char mass)), admission via the integer md5 gate;
    per-source (n_docs, weight, target_docs, n_kept)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    srcs = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.floor(F.sqrt(F.sum("n_chars"))).cast("long").alias("weight"),
    )
    tot = srcs.agg(
        F.sum("n_docs").cast("long").alias("n_total"),
        F.sum("weight").cast("long").alias("w_total"),
    )
    targets = srcs.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "weight",
        F.expr(
            f"(n_total * {_T26_BUDGET_PCT} div 100) * weight div w_total"
        ).alias("target_docs"),
    )
    kept = (
        docs.select("doc_id", "source")
        .join(F.broadcast(targets), "source")
        .filter(
            TX.md5_bucket(F.col("doc_id"), 1_000_000) * F.col("n_docs")
            < F.col("target_docs") * 1_000_000
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        targets.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            "weight",
            F.col("target_docs").cast("long").alias("target_docs"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# t28 — bigram conditional surprisal (the LM-perplexity data filter of
# CCNet, Wenzek et al. 2020 — public technique — upgraded from t19's
# unigram to a CONDITIONAL model). A bigram LM is induced on an
# md5-gated 70% held-in slice; held-out documents score each adjacent
# token pair with t19's whole-bit trick — floor(log2) of an integer
# ratio via bit length, cross-engine exact where true log-probs are
# not: seen bigram = bitlen(count(w1) // count(w1 w2)); unseen bigram
# backs off to the held-in unigram at a 1-bit penalty; OOV pays
# 1 + bitlen(N). Scale shape: the LM is one corpus shuffle (bigram
# groupBy); scoring joins exploded doc pairs to the LM keyed by
# bigram and to the unigram table keyed by token (vocabulary-sized
# sides, key-partitioned — never broadcast, never a window); the
# 1-row N total rides a broadcast; one per-doc aggregation.
# --------------------------------------------------------------------------
_T28_HELD_IN_PCT = 70


@register(
    "t28_bigram_surprisal",
    oracle=f"""
    WITH {_SQL_TOK},
    gated AS (
        SELECT doc_id, w,
               {TX.md5_bucket_sql("doc_id", 100)} < {_T28_HELD_IN_PCT}
                   AS held_in
        FROM tok
    ),
    pairs AS (
        SELECT doc_id, held_in, w[i] AS w1, w[i+1] AS w2
        FROM gated, LATERAL unnest(
            CASE WHEN len(w) >= 2 THEN range(1, len(w)) ELSE [] END
        ) AS t(i)
    ),
    bi AS (
        SELECT w1, w2, count(*) AS bc FROM pairs WHERE held_in GROUP BY 1, 2
    ),
    uniprev AS (
        SELECT w1 AS tokn, CAST(sum(bc) AS BIGINT) AS uc FROM bi GROUP BY 1
    ),
    uni AS (
        SELECT w2 AS tokn, count(*) AS cnt FROM pairs WHERE held_in GROUP BY 1
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM pairs WHERE held_in),
    scored AS (
        SELECT p.doc_id,
               CASE
                   WHEN b.bc IS NOT NULL
                       THEN length(bin(up.uc // b.bc)) - 1
                   WHEN u.cnt IS NOT NULL
                       THEN length(bin(n.n_total // u.cnt))
                   ELSE length(bin(n.n_total))
               END AS bits
        FROM pairs p
        LEFT JOIN bi b ON b.w1 = p.w1 AND b.w2 = p.w2
        LEFT JOIN uniprev up ON up.tokn = p.w1
        LEFT JOIN uni u ON u.tokn = p.w2
        CROSS JOIN n
        WHERE NOT p.held_in
    )
    SELECT doc_id,
           count(*) AS n_pairs,
           CAST(sum(bits) AS BIGINT) AS bits_sum,
           CAST(sum(bits) * 1000 // count(*) AS BIGINT) AS mean_bits_milli
    FROM scored GROUP BY 1 ORDER BY doc_id
    """,
    tags=("text", "quality", "lm", "perplexity", "bigram"),
)
def t28_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out per-doc bigram conditional surprisal (whole-bit,
    integer-exact) under a bigram LM induced on the held-in 70%."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    base = docs.select(
        "doc_id",
        TX.tokens("text").alias("w"),
        (TX.md5_bucket(F.col("doc_id"), 100) < _T28_HELD_IN_PCT).alias(
            "held_in"
        ),
    )
    pairs = (
        base.select(
            "doc_id",
            "held_in",
            F.explode(TX.word_ngrams(F.col("w"), 2)).alias("g"),
        )
        .select(
            "doc_id",
            "held_in",
            F.split_part(F.col("g"), F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part(F.col("g"), F.lit(" "), F.lit(2)).alias("w2"),
        )
        .transform(tracked_persist)
    )
    train = pairs.filter(F.col("held_in"))
    bi = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("bc"))
    uniprev = bi.groupBy(F.col("w1").alias("tokn")).agg(
        F.sum("bc").cast("long").alias("uc")
    )
    uni = train.groupBy(F.col("w2").alias("tokn")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    n = train.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    bits = (
        F.when(
            F.col("bc").isNotNull(),
            F.length(F.bin(F.expr("uc div bc"))) - 1,
        )
        .when(
            F.col("cnt").isNotNull(),
            F.length(F.bin(F.expr("n_total div cnt"))),
        )
        .otherwise(F.length(F.bin(F.col("n_total"))))
    )
    scored = (
        pairs.filter(~F.col("held_in"))
        .join(bi, ["w1", "w2"], "left")
        .join(uniprev, F.col("tokn") == F.col("w1"), "left")
        .drop("tokn")
        .join(uni, F.col("tokn") == F.col("w2"), "left")
        .drop("tokn")
        .crossJoin(F.broadcast(n))
        .select("doc_id", bits.alias("bits"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("bits").cast("long").alias("bits_sum"),
        )
        .select(
            "doc_id",
            "n_pairs",
            "bits_sum",
            F.expr("bits_sum * 1000 div n_pairs").cast("long").alias(
                "mean_bits_milli"
            ),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# t29 — BM25 retrieval, integer-exact: the idf/length-normalized
# ranking t23's coordinate scoring deliberately leaves out. Both BM25
# components are made cross-engine exact WITHOUT transcendentals:
#
# - idf_milli = piecewise-linear integer log2 of the 1024-scaled
#   rarity ratio r = (N*1024) div df: with m = bitlen(r)-1 and
#   p = 2^m, log2(r) ~ m + (r-p)/p (the classic PWL log2 — public
#   technique), so idf_milli = m*1000 + ((r-p)*1000) div p - 10000
#   (the 1024 scale shifts log2 by EXACTLY 10, so the offset cancels
#   exactly; df = N gives 0, like true BM25 idf). Every step is int64
#   floor-division — bit-identical in any engine, unlike ln();
# - the Robertson tf saturation tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))
#   with k1=1.2, b=0.75 evaluated in scaled int64 (milli in, micro
#   out).
#
# Scale shape is t23's: postings explode → (term, doc) tf table,
# doc-length table, tiny broadcast query-term set, per-(query, doc)
# integer sum, top-k window per query.
# --------------------------------------------------------------------------
_T29_K1M = 1200  # k1 = 1.2 in milli
_T29_BM = 750  # b = 0.75 in milli


@register(
    "t29_bm25_retrieval",
    oracle=f"""
    WITH {_SQL_TOK},
    postings AS (SELECT doc_id, unnest(w) AS term FROM tok),
    dl AS (SELECT doc_id, len(w) AS dl FROM tok),
    stats AS (
        SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS tok_total
        FROM dl
    ),
    tf AS (SELECT term, doc_id, count(*) AS tf FROM postings GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    qterms AS (
        SELECT * FROM (VALUES
            {", ".join(f"('{qid}', '{t}')" for qid, ts in _T23_QUERIES for t in ts)}
        ) AS v(query_id, term)
    ),
    scored AS (
        SELECT query_id, doc_id,
               CAST(sum(idf_milli * sat_micro) AS BIGINT) AS score_nano
        FROM (
            SELECT q.query_id, t.doc_id,
                   (length(bin((s.n_docs * 1024) // d.df)) - 1) * 1000
                   + ((((s.n_docs * 1024) // d.df)
                       - CAST(pow(2, length(bin((s.n_docs * 1024) // d.df)) - 1)
                              AS BIGINT)) * 1000)
                     // CAST(pow(2, length(bin((s.n_docs * 1024) // d.df)) - 1)
                             AS BIGINT)
                   - 10000 AS idf_milli,
                   (t.tf * (1000 + {_T29_K1M}) * 1000000) //
                   (t.tf * 1000 +
                    ({_T29_K1M} * (1000 - {_T29_BM} +
                       ({_T29_BM} * l.dl * 1000) //
                       ((s.tok_total * 1000) // s.n_docs))) // 1000)
                       AS sat_micro
            FROM qterms q
            JOIN tf t USING (term)
            JOIN dfreq d USING (term)
            JOIN dl l USING (doc_id)
            CROSS JOIN stats s
        )
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY query_id
            ORDER BY score_nano DESC, doc_id) AS rank
        FROM scored
    )
    SELECT query_id, rank, doc_id, score_nano
    FROM ranked WHERE rank <= {_T23_K} AND score_nano > 0
    ORDER BY query_id, rank
    """,
    tags=("text", "retrieval", "bm25", "inverted-index", "topk"),
)
def t29_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} BM25 docs per query with whole-bit idf and fixed-point
    saturation — every score an exact int64."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    tok = docs.select("doc_id", TX.tokens("text").alias("w")).transform(tracked_persist)
    postings = tok.select("doc_id", F.explode("w").alias("term"))
    dl = tok.select("doc_id", F.size("w").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("long").alias("tok_total"),
    )
    tf = postings.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = local_frame(spark, 
        [(qid, t) for qid, ts in _T23_QUERIES for t in ts],
        "query_id string, term string",
    )
    # r = 1024-scaled rarity; p = 2^(bitlen(r)-1); PWL log2 idf
    score_term = F.expr(
        f"(((length(bin((n_docs * 1024) div df)) - 1) * 1000"
        f" + (((n_docs * 1024) div df"
        f"     - CAST(pow(2, length(bin((n_docs * 1024) div df)) - 1)"
        f"            AS BIGINT)) * 1000)"
        f"   div CAST(pow(2, length(bin((n_docs * 1024) div df)) - 1)"
        f"            AS BIGINT)"
        f" - 10000)) * "
        f"((tf * (1000 + {_T29_K1M}) * 1000000) div "
        f"(tf * 1000 + ({_T29_K1M} * (1000 - {_T29_BM} + "
        f"({_T29_BM} * dl * 1000) div "
        f"((tok_total * 1000) div n_docs))) div 1000))"
    )
    # the QUERY-TERM set is the broadcast side; the corpus-sized tf
    # and df tables stay key-partitioned (df is vocab-sized and could
    # broadcast, but term-keyed SMJ/BHJ is what survives any vocab)
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(qterms), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(score_term).cast("long").alias("score_nano"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(
        F.col("score_nano").desc(), "doc_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") <= _T23_K) & (F.col("score_nano") > 0))
        .select("query_id", "rank", "doc_id", "score_nano")
        .orderBy("query_id", "rank")
    )


# --------------------------------------------------------------------------
# t30 — n-gram novelty profile: the corpus-relative signal between
# d13's repeated-span coverage and t19/t28's LM surprisal. Per
# document: what fraction of its DISTINCT 3-gram shingles appears in
# no other document (novel — high values flag garbled/unique-noise
# text) and what fraction appears in >= 10 documents (common — high
# values flag boilerplate). Both as integer basis points aggregated
# per source, so the report is a 20-row per-source quality profile a
# curation pipeline thresholds on.
#
# Scale shape (r6 rewrite, VERDICT r5 "what's wrong" #2 — the naive
# ex-join-gdf on the raw gram key concentrates Zipf-hot trigrams
# ("of the and"-class) into single tasks): one shingle explode → gram
# document-frequency table, then THREE bounded paths instead of one
# skew-exposed join:
#   1. NOVEL (df = 1) needs no join at all — a df-1 gram's only
#      holder rides the same aggregation as min(doc_id);
#   2. COLD flags (2 <= df < _T30_HOT_DF) equi-join normally: no key
#      exceeds _T30_HOT_DF rows, so hash partitioning spreads them;
#   3. HOT flags (df >= _T30_HOT_DF) are salt-replicated
#      (operators/skew.py:salted_join, _T30_SALT shards): at most
#      total_grams/_T30_HOT_DF grams can be hot, so the replicated
#      dimension is <= total/(HOT/SALT) rows — bounded by
#      construction at ANY corpus size, and each hot gram's fact rows
#      fan over _T30_SALT reducers.
# Identical results to the single-join form (the oracle is unchanged);
# only the physical plan is skew-proof.
# --------------------------------------------------------------------------
_T30_COMMON_DF = 10
_T30_HOT_DF = 1024  # grams at or above this df take the salted path
_T30_SALT = 32


@register(
    "t30_ngram_novelty",
    oracle=f"""
    WITH {{SH}},
    ex AS (
        SELECT doc_id, source, unnest(sh) AS g FROM sh WHERE len(sh) > 0
    ),
    gdf AS (SELECT g, count(DISTINCT doc_id) AS df FROM ex GROUP BY 1),
    per_doc AS (
        SELECT ex.doc_id, ex.source,
               count(*) AS n_grams,
               sum(CASE WHEN gdf.df = 1 THEN 1 ELSE 0 END) AS novel,
               sum(CASE WHEN gdf.df >= {_T30_COMMON_DF} THEN 1 ELSE 0 END)
                   AS common
        FROM ex JOIN gdf USING (g)
        GROUP BY 1, 2
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_grams) AS BIGINT) AS total_grams,
           CAST(sum(novel) * 10000 // sum(n_grams) AS BIGINT)
               AS novel_bp,
           CAST(sum(common) * 10000 // sum(n_grams) AS BIGINT)
               AS common_bp
    FROM per_doc GROUP BY 1 ORDER BY 1
    """.replace("{SH}", _SQL_TOK + """,
    sh AS (
        SELECT doc_id, source,
               CASE WHEN len(w) >= 3 THEN
                   list_distinct(list_transform(range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
               ELSE [] END AS sh
        FROM tok
    )"""),
    tags=("text", "quality", "novelty", "ngram", "data-quality"),
)
def t30_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source novelty profile: basis points of distinct 3-gram
    shingles unique to one doc (novel) vs shared by >= 10 docs
    (common). Skew-proof three-path plan — see the block comment."""
    from hyppo_worker_spark.operators.skew import salted_join

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # Gram construction (measured at sf0.1, r6): TX.shingles(
    # TX.tokens("text")) INLINE costs 8.9s for 260k grams — Catalyst
    # collapses the projections and re-inlines the whole tokenize
    # expression (lower+split+filter) into EVERY element_at of the
    # shingle lambda, re-tokenizing each document once per gram
    # position (the _minhash_banded lesson, which t30 had not
    # applied). Materializing the token ARRAY as its own projection
    # first drops the same explode to 0.4s — a 20x on this stage and
    # 6x on the whole query. (Also measured and rejected: struct-
    # tuple gram keys, 1.8s end-to-end vs 1.2s for strings; t22's
    # md5-int gram trick, whose per-occurrence hash costs more than
    # the width saving at <=2 shuffles per gram.)
    words = docs.select(
        "doc_id", "source", TX.tokens("text").alias("w")
    )
    ex = (
        words.select(
            "doc_id",
            "source",
            F.explode(TX.shingles(F.col("w"), 3)).alias("g"),
        )
        .transform(tracked_persist)
    )
    # shingles are per-doc distinct, so count(*) IS the document
    # frequency and min(doc_id) identifies a df-1 gram's only holder.
    # Persisted: three consumers (novel path, cold flags, hot flags)
    # would otherwise re-aggregate the explode each time.
    gdf = ex.groupBy("g").agg(
        F.count(F.lit(1)).alias("df"), F.min("doc_id").alias("only_doc")
    ).transform(tracked_persist)
    # path 1 — novel counts, holder-side (no join back at all)
    novel_pd = (
        gdf.filter(F.col("df") == 1)
        .groupBy(F.col("only_doc").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("novel"))
    )
    flags = gdf.filter(F.col("df") >= 2).select(
        "g", "df", (F.col("df") >= _T30_COMMON_DF).alias("is_common")
    )
    # path 2 — cold grams: plain equi-join, per-key fanout < HOT_DF
    cold = ex.join(
        flags.filter(F.col("df") < _T30_HOT_DF).select("g", "is_common"),
        "g",
    ).select("doc_id", "is_common")
    # path 3 — hot grams: salt-replicated flag rows (bounded:
    # <= total_grams/HOT_DF grams qualify)
    hot = salted_join(
        ex,
        flags.filter(F.col("df") >= _T30_HOT_DF).select("g", "is_common"),
        "g",
        salt=_T30_SALT,
    ).select("doc_id", "is_common")
    nonnovel_pd = (
        cold.unionByName(hot)
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("is_common"), 1).otherwise(0)).alias("common")
        )
    )
    totals = ex.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    per_doc = (
        totals.join(novel_pd, "doc_id", "left")
        .join(nonnovel_pd, "doc_id", "left")
        .select(
            "source",
            "n_grams",
            F.coalesce("novel", F.lit(0)).alias("novel"),
            F.coalesce("common", F.lit(0)).alias("common"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_grams").cast("long").alias("total_grams"),
            F.expr("sum(novel) * 10000 div sum(n_grams)")
            .cast("long")
            .alias("novel_bp"),
            F.expr("sum(common) * 10000 div sum(n_grams)")
            .cast("long")
            .alias("common_bp"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# t31 — Unicode normalization (NFC): the one text-pipeline primitive
# Spark has NO built-in for (exact-dedup digests, decontamination
# joins, and tokenizers all silently fracture when "é" arrives both
# precomposed U+00E9 and decomposed e+U+0301 — byte-different,
# visually identical). The operator is the sanctioned slow-path
# shape: an Arrow-batched mapInPandas stage running
# unicodedata.normalize("NFC") — a per-row pure function with no
# shuffle (the aggregation after it is the usual partial-agg +
# one exchange). The corpus column is salted with a decomposed
# suffix covering the three NFC behavior classes: combining marks
# that COMPOSE (e+U+0301 → é, A+U+030A → Å), a singleton that
# REMAPS (U+212B ANGSTROM SIGN → U+00C5), and a compatibility
# ligature that NFC must PRESERVE (U+FB01 ﬁ — only NFKC folds it).
# DuckDB's native nfc_normalize() reproduces the transform, so the
# oracle checks real normalization semantics end-to-end: per-lang
# codepoint counts before/after plus a 52-bit md5 digest sum over
# the normalized strings — one wrongly composed (or wrongly folded)
# character anywhere breaks the hash.
# --------------------------------------------------------------------------
_T31_DECOMP = " é Å ﬁ Å"


@register(
    "t31_unicode_nfc_normalize",
    oracle=f"""
    WITH src AS (
        SELECT doc_id, lang,
               text || ' {_T31_DECOMP}' AS s
        FROM documents
    ),
    n AS (SELECT lang, s, nfc_normalize(s) AS nfc FROM src)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(s)) AS BIGINT) AS raw_cp,
           CAST(sum(length(nfc)) AS BIGINT) AS nfc_cp,
           CAST(sum(('0x' || substr(md5(nfc), 1, 13))::BIGINT)
               AS BIGINT) AS digest_sum
    FROM n GROUP BY lang ORDER BY lang
    """,
    tags=("text", "normalization", "unicode", "nfc", "mapInPandas"),
)
def t31_unicode_nfc_normalize(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-lang census of NFC normalization over a decomposed-salted
    corpus column: codepoint counts before/after + digest sum of the
    normalized strings (Arrow-batched unicodedata stage; DuckDB's
    nfc_normalize is the oracle)."""
    import unicodedata
    from collections.abc import Iterator

    import pandas as pd

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    src = docs.select(
        "doc_id",
        "lang",
        F.concat(
            F.col("text"), F.lit(" " + _T31_DECOMP)
        ).alias("s"),
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            nfc = pdf["s"].map(
                lambda x: unicodedata.normalize("NFC", x)
            )
            yield pd.DataFrame(
                {
                    "lang": pdf["lang"],
                    "nfc": nfc,
                    # python len == codepoints (Spark's length() would
                    # count UTF-16 units — equal only for BMP input)
                    "n_raw": pdf["s"].map(len),
                    "n_nfc": nfc.map(len),
                }
            )

    out = src.mapInPandas(
        batches, "lang string, nfc string, n_raw long, n_nfc long"
    )
    return (
        out.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_raw").cast("long").alias("raw_cp"),
            F.sum("n_nfc").cast("long").alias("nfc_cp"),
            F.sum(
                F.conv(F.substring(F.md5("nfc"), 1, 13), 16, 10).cast(
                    "bigint"
                )
            )
            .cast("long")
            .alias("digest_sum"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# t32 — Python UDTF surface: a user-defined TABLE function (Spark
# 3.5+/4 `@udtf`, Arrow-optimized) exploding each document into
# fixed-size 64-word chunks via a SQL LATERAL correlation — the
# chunking operator (operators/packing.py does it with sequence/
# explode JVM-side) re-expressed as the one UDF shape the registry
# did not yet cover (scalar pandas UDFs: m03-m08/t31; UDAF via
# applyInPandas: p15; UDTF: here). The UDTF is the right tool when
# per-row fan-out needs imperative Python (a real tokenizer, a
# sentence splitter); the oracle regenerates the same chunks with
# pure SQL (list_filter + unnest(range)) so the UDTF's row fan-out,
# per-chunk word counts, and chunk-initial words are all value-
# checked. Scale: Arrow batches stream through the Python worker
# once (no collect), and the fan-out happens BEFORE the aggregate's
# exchange, so the shuffle carries only (chunk_id, doc) partials.
# --------------------------------------------------------------------------
@register(
    "t32_udtf_chunk_explode",
    oracle="""
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ),
    chunks AS (
        SELECT doc_id,
               CAST(u.c AS INT) AS chunk_id,
               least(64, len(ws) - CAST(u.c AS INT) * 64) AS n_words,
               ws[CAST(u.c AS INT) * 64 + 1] AS first_word
        FROM w, LATERAL unnest(range(0, (len(ws) + 63) // 64)) AS u(c)
        WHERE len(ws) > 0
    )
    SELECT chunk_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(n_words) AS BIGINT) AS words,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           min(first_word) AS min_first,
           max(first_word) AS max_first
    FROM chunks GROUP BY chunk_id ORDER BY chunk_id
    """,
    tags=("text", "udtf", "chunking", "lateral"),
)
def t32_udtf_chunk_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode documents into 64-word chunks with a Python UDTF joined
    LATERALly in SQL; per-chunk-ordinal counts, word totals, and
    chunk-initial words must equal the SQL-regenerated chunks."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="chunk_id int, n_words int, first_word string",
        useArrow=True,
    )
    class ChunkWords:
        def eval(self, text: str):
            words = [w for w in text.split(" ") if w]
            for ci, i in enumerate(range(0, len(words), 64)):
                piece = words[i : i + 64]
                yield ci, len(piece), piece[0]

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    spark.udtf.register("hyppo_chunk_words", ChunkWords)
    # The planner sizes this stage by the SCAN's bytes, but the cost
    # is the Python fan-out per row (the m08 lesson): spread the rows
    # before the UDTF or it runs near-serial on a small-file scan
    # (measured 10x stress: max task 6.6s -> 0.9s with 32-way spread).
    docs.select("doc_id", "text").repartition(32, "doc_id") \
        .createOrReplaceTempView("t32_docs")
    return spark.sql(
        """
        SELECT c.chunk_id,
               count(*) AS n_chunks,
               sum(c.n_words) AS words,
               count(DISTINCT d.doc_id) AS n_docs,
               min(c.first_word) AS min_first,
               max(c.first_word) AS max_first
        FROM t32_docs d, LATERAL hyppo_chunk_words(d.text) c
        GROUP BY c.chunk_id ORDER BY c.chunk_id
        """
    )


# --------------------------------------------------------------------------
# t33 — GOPHER REPETITION FILTERS (Rae et al. 2021, arXiv:2112.11446
# Table A1): the intra-document repetition tier of the quality family.
# t02/t18 score documents on surface heuristics and a frozen
# classifier; what they cannot see is a document that repeats ITSELF —
# boilerplate loops, scraper stutter, navigation spam — the class the
# Gopher rules were designed to drop. t12 reports repetition SIGNALS
# (top-word share, duplicate-trigram OCCURRENCE share); this row
# implements the paper's actual CHARACTER-fraction semantics — which
# require the occurrence-interval union below, not a count ratio —
# at the paper's thresholds, with corpus-level keep/drop verdicts. Two rules, in the word-n-gram
# form this corpus supports (documents carry no newlines, so the
# line/paragraph variants have no medium here):
#   - top-2-gram char fraction: chars covered by the single most
#     frequent word 2-gram (count x gram chars / total token chars),
#     drop above 0.20;
#   - duplicate-5-gram char fraction: chars of token POSITIONS covered
#     by any 5-gram occurring 2+ times (occurrence intervals UNIONed —
#     the paper's "fraction of characters contained within duplicate
#     n-grams", not a double-counting sum), drop above 0.15.
# Both land as integer basis points ((10000·chars) div total_chars) so
# the verdicts hash bit-exact cross-engine. Plan shape: one token
# explode + three doc_id-keyed aggregations — per-document narrow
# state, no cross-document shuffle beyond the doc key, so the filter
# scales linearly with corpus bytes at 100 TB (the reference has no
# text operators at all — SURVEY §2.4; filter semantics are from the
# public Gopher appendix). Output: every 5th doc's metrics (the
# machinery, per-doc exact) plus corpus-wide keep/drop counts (the
# filter verdict over ALL docs) as pinned constants.
# --------------------------------------------------------------------------
_T33_TOP2_BP, _T33_DUP5_BP = 2000, 1500


@register(
    "t33_gopher_repetition",
    oracle=f"""
    WITH {_SQL_TOK},
    base AS MATERIALIZED (
        SELECT doc_id, w, len(w) AS n_tokens,
               CAST(list_sum(list_transform(w, x -> length(x)))
                    AS BIGINT) AS total_chars
        FROM tok WHERE len(w) > 0
    ),
    g2 AS (
        SELECT doc_id, w[r.i + 1] || ' ' || w[r.i + 2] AS g
        FROM base, LATERAL unnest(range(0, n_tokens - 1)) AS r(i)
        WHERE n_tokens >= 2
    ),
    c2 AS (SELECT doc_id, g, count(*) AS cnt FROM g2 GROUP BY 1, 2),
    top2 AS MATERIALIZED (
        SELECT doc_id, g, cnt FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY cnt DESC, g) AS rn
            FROM c2
        ) WHERE rn = 1
    ),
    g5 AS MATERIALIZED (
        SELECT doc_id, CAST(r.i AS BIGINT) AS p,
               array_to_string(list_slice(w, r.i + 1, r.i + 5), ' ') AS g
        FROM base, LATERAL unnest(range(0, n_tokens - 4)) AS r(i)
        WHERE n_tokens >= 5
    ),
    c5 AS (SELECT doc_id, g FROM g5 GROUP BY 1, 2 HAVING count(*) >= 2),
    cov AS (
        SELECT DISTINCT g5.doc_id, u.p2 AS p
        FROM g5 JOIN c5 USING (doc_id, g),
             LATERAL unnest(range(g5.p, g5.p + 5)) AS u(p2)
    ),
    tokpos AS (
        SELECT doc_id, CAST(r.i AS BIGINT) AS p,
               length(w[r.i + 1]) AS lc
        FROM base, LATERAL unnest(range(0, n_tokens)) AS r(i)
    ),
    covc AS (
        SELECT doc_id, CAST(sum(lc) AS BIGINT) AS cov_chars
        FROM cov JOIN tokpos USING (doc_id, p) GROUP BY 1
    ),
    flags AS MATERIALIZED (
        SELECT b.doc_id, b.n_tokens, b.total_chars,
               CAST(coalesce((10000 * t.cnt * (length(t.g) - 1))
                             // b.total_chars, 0) AS BIGINT) AS top2_bp,
               CAST(coalesce((10000 * c.cov_chars)
                             // b.total_chars, 0) AS BIGINT) AS dup5_bp
        FROM base b
        LEFT JOIN top2 t USING (doc_id)
        LEFT JOIN covc c USING (doc_id)
    ),
    verdicts AS MATERIALIZED (
        SELECT *,
               top2_bp <= {_T33_TOP2_BP} AS keep_top2,
               dup5_bp <= {_T33_DUP5_BP} AS keep_dup5,
               (top2_bp <= {_T33_TOP2_BP}
                AND dup5_bp <= {_T33_DUP5_BP}) AS keep
        FROM flags
    ),
    corpus AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN NOT keep THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dropped
        FROM verdicts
    )
    SELECT v.doc_id, CAST(v.n_tokens AS BIGINT) AS n_tokens,
           v.total_chars, v.top2_bp, v.dup5_bp,
           v.keep_top2, v.keep_dup5, v.keep,
           c.n_docs, c.n_dropped
    FROM verdicts v, corpus c
    WHERE v.doc_id % 5 = 0
    ORDER BY v.doc_id
    """,
    tags=("text", "quality", "repetition", "gopher", "dedup"),
)
def t33_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher intra-document repetition filters (word-n-gram form):
    top-2-gram char fraction and duplicate-5-gram covered-char
    fraction as integer basis points, with the occurrence-interval
    UNION (not a sum) for the 5-gram rule; per-doc metrics for every
    5th doc plus corpus-wide keep/drop counts."""
    from pyspark.sql import Window as W

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    base = tracked_persist(
        docs.select(
            "doc_id",
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

    # top 2-gram: count desc, gram asc — one doc_id-keyed shuffle
    g2 = base.filter(F.col("n_tokens") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, n_tokens - 2),"
                " i -> concat_ws(' ', slice(w, i + 1, 2)))"
            )
        ).alias("g"),
    )
    c2 = g2.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("cnt"))
    w2 = W.partitionBy("doc_id").orderBy(F.col("cnt").desc(), F.col("g").asc())
    top2 = (
        c2.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            (F.col("cnt") * (F.length("g") - 1)).alias("top2_chars"),
        )
    )

    # duplicate 5-grams: positions covered by any >=2-count gram's
    # occurrences, UNIONed via distinct (doc_id, p) — the paper's
    # covered-character semantics
    g5 = tracked_persist(
        base.filter(F.col("n_tokens") >= 5).select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, n_tokens - 5),"
                    " i -> struct(CAST(i AS BIGINT) AS p,"
                    "             concat_ws(' ', slice(w, i + 1, 5)) AS g))"
                )
            ).alias("s"),
        ).select("doc_id", F.col("s.p").alias("p"), F.col("s.g").alias("g"))
    )
    c5 = (
        g5.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("doc_id", "g")
    )
    cov = (
        g5.join(c5, ["doc_id", "g"])
        .select(
            "doc_id", F.explode(F.expr("sequence(p, p + 4)")).alias("p")
        )
        .distinct()
    )
    tokpos = base.select(
        "doc_id", F.posexplode("w").alias("p", "t")
    ).select("doc_id", F.col("p").cast("long").alias("p"), F.length("t").alias("lc"))
    covc = (
        cov.join(tokpos, ["doc_id", "p"])
        .groupBy("doc_id")
        .agg(F.sum("lc").cast("long").alias("cov_chars"))
    )

    verdicts = tracked_persist(
        base.select("doc_id", "n_tokens", "total_chars")
        .join(top2, "doc_id", "left")
        .join(covc, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "total_chars",
            F.expr(
                "CAST(coalesce((10000 * top2_chars) div total_chars, 0)"
                " AS BIGINT)"
            ).alias("top2_bp"),
            F.expr(
                "CAST(coalesce((10000 * cov_chars) div total_chars, 0)"
                " AS BIGINT)"
            ).alias("dup5_bp"),
        )
        .withColumn("keep_top2", F.col("top2_bp") <= _T33_TOP2_BP)
        .withColumn("keep_dup5", F.col("dup5_bp") <= _T33_DUP5_BP)
        .withColumn("keep", F.col("keep_top2") & F.col("keep_dup5"))
    )
    corpus = verdicts.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(~F.col("keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_dropped"),
    )
    return (
        verdicts.filter(F.col("doc_id") % 5 == 0)
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id", "n_tokens", "total_chars", "top2_bp", "dup5_bp",
            "keep_top2", "keep_dup5", "keep", "n_docs", "n_dropped",
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# t34 — unigram-LM tokenizer segmentation cost (the SentencePiece /
# Kudo 2018 inference half, completing the tokenizer-training family
# next to t16/t17's BPE): a corpus-derived piece vocabulary (every
# single character of the eligible word set for guaranteed coverage +
# the top-50 multi-char substrings up to length 4 by token-weighted
# occurrence count) is priced in WHOLE BITS — cost(p) =
# length(bin(T div f_p)), the t19 integer-surprisal idiom — and every
# word is segmented by Viterbi: dp[i] = min over vocab pieces ending
# at i of dp[i - len(p)] + cost(p). The Spark side runs the whole DP
# as ONE Catalyst expression — an `aggregate` fold over positions
# carrying the dp array, with `filter`/`transform`/`array_min` over
# the word's piece-occurrence structs inside the lambda — so
# segmentation is embarrassingly parallel over DISTINCT words (one
# shuffle to build occurrences, one to group them; corpus size only
# enters through the word-count join). The oracle replays the same
# DP as 16 unrolled chained CTEs (the s10 precedent). Per-source
# report: token-weighted total cost and integer cost-per-char basis
# points — the compression-rate OOD signal (a source that compresses
# badly under the corpus tokenizer is distributionally far from the
# corpus) — plus the long-word exclusion count as an honesty column.
# --------------------------------------------------------------------------
_T34_MAXW = 16   # words longer than this are excluded (reported)
_T34_MAXP = 4    # max piece length
_T34_V = 50      # multi-char vocabulary size


def _t34_oracle() -> str:
    # unrolled Viterbi: u{i} accumulates dp rows (word, pos, cost)
    steps = []
    for i in range(1, _T34_MAXW + 1):
        # MATERIALIZED is load-bearing: u{{i}} is referenced TWICE per
        # step (dp{{i+1}} + the union), so plain CTEs inline 2^16-fold
        # (the d17/s17 DuckDB lesson, worst case yet)
        steps.append(f""",
    dp{i} AS MATERIALIZED (
        SELECT o.word, {i} AS pos, min(p.cost + o.c) AS cost
        FROM occ o JOIN u{i - 1} p
          ON p.word = o.word AND p.pos = {i} - o.l
        WHERE o.e = {i}
        GROUP BY o.word
    ),
    u{i} AS MATERIALIZED (
        SELECT * FROM u{i - 1} UNION ALL SELECT * FROM dp{i}
    )""")
    dp_chain = "".join(steps)
    return f"""
    WITH tok AS (
        SELECT source,
               unnest(list_filter(string_split_regex(lower(text),
                      '[^a-z0-9]+'), x -> x <> '')) AS word
        FROM documents
    ),
    swc AS MATERIALIZED (
        SELECT source, word, count(*) AS cnt FROM tok GROUP BY 1, 2
    ),
    wc AS MATERIALIZED (
        SELECT word, CAST(sum(cnt) AS BIGINT) AS wcnt,
               length(word) AS n
        FROM swc WHERE length(word) <= {_T34_MAXW} GROUP BY 1
    ),
    cand AS MATERIALIZED (
        SELECT substr(w.word, e.e - l.l + 1, l.l) AS piece,
               w.word, CAST(e.e AS BIGINT) AS e, CAST(l.l AS BIGINT) AS l,
               w.wcnt
        FROM wc w,
             LATERAL unnest(range(1, w.n + 1)) e(e),
             LATERAL unnest(range(1, {_T34_MAXP} + 1)) l(l)
        WHERE l.l <= e.e
    ),
    pf AS MATERIALIZED (
        SELECT piece, CAST(sum(wcnt) AS BIGINT) AS f,
               length(piece) AS pl
        FROM cand GROUP BY 1
    ),
    vocab AS MATERIALIZED (
        SELECT piece, f FROM pf WHERE pl = 1
        UNION ALL
        SELECT piece, f FROM (
            SELECT piece, f FROM pf WHERE pl >= 2
            ORDER BY f DESC, piece LIMIT {_T34_V})
    ),
    tsum AS (SELECT CAST(sum(f) AS BIGINT) AS t FROM vocab),
    vcost AS MATERIALIZED (
        SELECT v.piece, CAST(length(bin(ts.t // v.f)) AS BIGINT) AS c
        FROM vocab v, tsum ts
    ),
    occ AS MATERIALIZED (
        SELECT c.word, c.e, c.l, vc.c
        FROM cand c JOIN vcost vc ON vc.piece = c.piece
    ),
    u0 AS (
        SELECT word, 0 AS pos, CAST(0 AS BIGINT) AS cost FROM wc
    ){dp_chain},
    wcost AS MATERIALIZED (
        SELECT w.word, w.wcnt, w.n, u.cost
        FROM wc w JOIN u{_T34_MAXW} u
          ON u.word = w.word AND u.pos = w.n
    ),
    per_source AS (
        SELECT s.source,
               CAST(sum(s.cnt) AS BIGINT) AS n_tokens,
               CAST(sum(s.cnt * wc.cost) AS BIGINT) AS total_cost,
               CAST((sum(s.cnt * wc.cost) * 10000)
                    // sum(s.cnt * wc.n) AS BIGINT) AS cost_per_char_bp
        FROM swc s JOIN wcost wc USING (word)
        GROUP BY 1
    ),
    excl AS (
        SELECT source, CAST(sum(cnt) AS BIGINT) AS long_excluded
        FROM swc WHERE length(word) > {_T34_MAXW} GROUP BY 1
    )
    SELECT p.source, p.n_tokens,
           CAST(coalesce(e.long_excluded, 0) AS BIGINT) AS long_excluded,
           p.total_cost, p.cost_per_char_bp
    FROM per_source p LEFT JOIN excl e USING (source)
    ORDER BY p.source
    """


@register(
    "t34_unigram_viterbi_cost",
    oracle=_t34_oracle(),
    tags=("text", "tokenizer", "unigram", "viterbi", "training-data"),
)
def t34_unigram_viterbi_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-weighted Viterbi segmentation cost under a
    corpus-derived unigram piece vocabulary (whole-bit costs); the DP
    runs as one Catalyst aggregate-fold per distinct word."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    swc = tracked_persist(
        docs.select(
            "source",
            F.explode(
                F.expr(
                    "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
                )
            ).alias("word"),
        )
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wc = tracked_persist(
        swc.filter(F.length("word") <= _T34_MAXW)
        .groupBy("word")
        .agg(F.sum("cnt").cast("long").alias("wcnt"))
        .withColumn("n", F.length("word").cast("long"))
    )
    cand = tracked_persist(
        wc.select(
            "word",
            "wcnt",
            F.explode(
                F.expr(
                    f"flatten(transform(sequence(1, n), e ->"
                    f" transform(sequence(1, least({_T34_MAXP}, e)), l ->"
                    f" struct(CAST(e AS BIGINT) AS e, CAST(l AS BIGINT) AS l,"
                    f" substring(word, CAST(e - l + 1 AS INT),"
                    f" CAST(l AS INT)) AS piece))))"
                )
            ).alias("s"),
        ).select(
            "word", "wcnt",
            F.col("s.e").alias("e"),
            F.col("s.l").alias("l"),
            F.col("s.piece").alias("piece"),
        )
    )
    pf = cand.groupBy("piece").agg(
        F.sum("wcnt").cast("long").alias("f"),
        F.length(F.first("piece")).alias("pl"),
    )
    top_multi = (
        pf.filter(F.col("pl") >= 2)
        .orderBy(F.col("f").desc(), "piece")
        .limit(_T34_V)
        .select("piece", "f")
    )
    vocab = pf.filter(F.col("pl") == 1).select("piece", "f").unionByName(
        top_multi
    )
    tsum = vocab.agg(F.sum("f").cast("long").alias("t"))
    # 1-row scalar crossJoin (the q44/t16 pattern): cost in whole bits
    vcost = (
        vocab.crossJoin(F.broadcast(tsum))
        .select(
            "piece",
            F.length(F.bin(F.expr("t div f"))).cast("long").alias("c"),
        )
    )
    occ = (
        cand.join(vcost, "piece")
        .groupBy("word")
        .agg(F.collect_list(F.struct("e", "l", "c")).alias("occs"))
    )
    # Viterbi as ONE expression: fold positions 1..n carrying the dp
    # array; order inside `occs` is irrelevant (array_min over the
    # filtered candidates).
    wcost = (
        wc.join(occ, "word")
        .withColumn(
            "cost",
            F.expr(
                "aggregate(sequence(1, n), array(CAST(0 AS BIGINT)),"
                " (acc, i) -> array_append(acc, array_min(transform("
                "   filter(occs, o -> o.e = i),"
                "   o -> element_at(acc, CAST(i - o.l + 1 AS INT)) + o.c))),"
                " acc -> element_at(acc, CAST(n + 1 AS INT)))"
            ),
        )
        .select("word", "n", "cost")
    )
    per_source = (
        swc.join(wcost, "word")
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.sum(F.col("cnt") * F.col("cost")).cast("long").alias("total_cost"),
            F.expr(
                "CAST((sum(cnt * cost) * 10000) div sum(cnt * n) AS BIGINT)"
            ).alias("cost_per_char_bp"),
        )
    )
    excl = (
        swc.filter(F.length("word") > _T34_MAXW)
        .groupBy("source")
        .agg(F.sum("cnt").cast("long").alias("long_excluded"))
    )
    return (
        per_source.join(excl, "source", "left")
        .select(
            "source",
            "n_tokens",
            F.coalesce("long_excluded", F.lit(0)).cast("long").alias(
                "long_excluded"
            ),
            "total_cost",
            "cost_per_char_bp",
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# t35 — TRAINING the curation classifier (the gap next to t18, which
# scores with a FROZEN weight table): a multinomial Naive Bayes
# quality classifier learned from the corpus itself, fastText-shaped
# but SQL-honest, in the standard weak-supervision setup — the
# positive set is heuristic-labeled (stopword density >= 60 per
# mille, the "wiki-like" proxy real curation stacks bootstrap from)
# and the trainer must recover that structure from token evidence
# alone. Deterministic md5 80/20 split (md5_bucket(doc_id, 5) = 0 is
# held out — hash-based so the split is independent of how doc_ids
# were dealt to sources; a doc_id % 5 split would test only 4 of the
# 20 sources here). Training is ONE (word, class) count shuffle —
# the sufficient statistics of NB, the textbook distributed trainer —
# and the priced model (Laplace-smoothed per-class token costs in
# MILLIBITS via t29's piecewise-linear integer log2 — whole-bit
# quantization was measured to collapse the decision to the majority
# class at 50% accuracy; millibit costs lift it to the 8000s) is a
# vocab-sized table joined back to the held-out 20%. Prediction =
# argmin of integer cost sums (prior + sum over occurrences); strict
# inequality breaks ties toward class 0. OOV test tokens are skipped
# (documented: no class signal under this smoothing); a held-out doc
# with NO in-vocab tokens still scores on the priors via the left
# join. Per-source report: held-out count, predicted-positive,
# agreement with the weak label, integer accuracy basis points.
# --------------------------------------------------------------------------
_T35_STOP_PM = 60  # per-mille stopword-density threshold for the weak label


def _ml2_sql(r: str) -> str:
    """DuckDB: millibit PWL log2 of a 1024-scaled int ratio (t29's
    idiom): m*1000 + (r-2^m)*1000 // 2^m - 10000, m = bitlen(r)-1."""
    m = f"(length(bin({r})) - 1)"
    p = f"CAST(pow(2, {m}) AS BIGINT)"
    return f"({m} * 1000 + (({r}) - {p}) * 1000 // {p} - 10000)"


def _ml2_expr(r: str) -> str:
    """Spark SQL twin of :func:`_ml2_sql` (div for floor on the
    positive operands)."""
    m = f"(length(bin({r})) - 1)"
    p = f"CAST(pow(2, {m}) AS BIGINT)"
    return f"({m} * 1000 + ((({r}) - {p}) * 1000) div {p} - 10000)"


def _t35_oracle() -> str:
    stop = _sql_stop_count("en")
    c0 = _ml2_sql("tot.t0 * 1024 // (tc.f0 + 1)")
    c1 = _ml2_sql("tot.t1 * 1024 // (tc.f1 + 1)")
    p0 = _ml2_sql(
        "count(*) * 1024 // sum(CASE WHEN y = 0 THEN 1 ELSE 0 END)"
    )
    p1 = _ml2_sql(
        "count(*) * 1024 // sum(CASE WHEN y = 1 THEN 1 ELSE 0 END)"
    )
    return f"""
    WITH lab AS MATERIALIZED (
        SELECT doc_id, source,
               CASE WHEN {stop} * 1000 >= {_T35_STOP_PM} * len(w)
                    THEN 1 ELSE 0 END AS y,
               CASE WHEN {TX.md5_bucket_sql('CAST(doc_id AS VARCHAR)', 5)} = 0
                    THEN 1 ELSE 0 END AS is_test,
               w
        FROM (
            SELECT doc_id, source,
                   list_filter(string_split_regex(lower(text),
                       '[^a-z0-9]+'), x -> x <> '') AS w
            FROM documents) WHERE len(w) > 0
    ),
    traintok AS MATERIALIZED (
        SELECT unnest(w) AS word, y FROM lab WHERE is_test = 0
    ),
    tc AS MATERIALIZED (
        SELECT word,
               CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
               CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS f0
        FROM traintok GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(f1) + count(*) AS BIGINT) AS t1,
               CAST(sum(f0) + count(*) AS BIGINT) AS t0
        FROM tc
    ),
    model AS MATERIALIZED (
        SELECT tc.word,
               CAST({c0} AS BIGINT) AS c0,
               CAST({c1} AS BIGINT) AS c1
        FROM tc, tot
    ),
    prior AS (
        SELECT CAST({p0} AS BIGINT) AS p0,
               CAST({p1} AS BIGINT) AS p1
        FROM lab WHERE is_test = 0
    ),
    ttc AS (
        SELECT doc_id, word, CAST(count(*) AS BIGINT) AS cnt FROM (
            SELECT doc_id, unnest(w) AS word FROM lab WHERE is_test = 1)
        GROUP BY 1, 2
    ),
    docscore AS MATERIALIZED (
        SELECT t.doc_id,
               CAST(sum(t.cnt * m.c0) AS BIGINT) AS s0,
               CAST(sum(t.cnt * m.c1) AS BIGINT) AS s1
        FROM ttc t JOIN model m USING (word) GROUP BY 1
    ),
    pred AS (
        SELECT l.doc_id, l.source, l.y,
               CASE WHEN coalesce(d.s1, 0) + pr.p1
                         < coalesce(d.s0, 0) + pr.p0
                    THEN 1 ELSE 0 END AS yhat
        FROM lab l LEFT JOIN docscore d USING (doc_id)
        CROSS JOIN prior pr
        WHERE l.is_test = 1
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(yhat) AS BIGINT) AS pred_pos,
           CAST(sum(CASE WHEN yhat = y THEN 1 ELSE 0 END) AS BIGINT)
               AS agree,
           CAST(sum(CASE WHEN yhat = y THEN 1 ELSE 0 END) * 10000
                // count(*) AS BIGINT) AS accuracy_bp
    FROM pred GROUP BY 1 ORDER BY source
    """


@register(
    "t35_nb_quality_training",
    oracle=_t35_oracle(),
    tags=("text", "classifier", "training", "naive-bayes", "quality"),
)
def t35_nb_quality_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a multinomial NB quality classifier on the md5-hash 80%
    split against the stopword-density weak label (one
    sufficient-statistics shuffle, whole-bit Laplace costs), score
    the held-out 20%, report per-source accuracy — all integer."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    stopc = F.size(
        F.expr(
            "filter(w, x -> x IN ({}))".format(
                ", ".join(f"'{x}'" for x in TX.STOPWORDS["en"])
            )
        )
    )
    lab = tracked_persist(
        docs.select(
            "doc_id",
            "source",
            F.expr(
                "filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')"
            ).alias("w"),
        )
        .filter(F.size("w") > 0)
        .select(
            "doc_id",
            "source",
            F.when(
                stopc * 1000 >= F.lit(_T35_STOP_PM) * F.size("w"), 1
            )
            .otherwise(0)
            .alias("y"),
            F.when(
                TX.md5_bucket(F.col("doc_id").cast("string"), 5) == 0, 1
            )
            .otherwise(0)
            .alias("is_test"),
            "w",
        )
    )
    traintok = (
        lab.filter(F.col("is_test") == 0)
        .select("y", F.explode("w").alias("word"))
    )
    tc = tracked_persist(
        traintok.groupBy("word").agg(
            F.sum(F.when(F.col("y") == 1, 1).otherwise(0))
            .cast("long")
            .alias("f1"),
            F.sum(F.when(F.col("y") == 0, 1).otherwise(0))
            .cast("long")
            .alias("f0"),
        )
    )
    tot = tc.agg(
        (F.sum("f1") + F.count(F.lit(1))).cast("long").alias("t1"),
        (F.sum("f0") + F.count(F.lit(1))).cast("long").alias("t0"),
    )
    model = tc.crossJoin(F.broadcast(tot)).select(
        "word",
        F.expr(_ml2_expr("t0 * 1024 div (f0 + 1)")).cast("long").alias("c0"),
        F.expr(_ml2_expr("t1 * 1024 div (f1 + 1)")).cast("long").alias("c1"),
    )
    prior = (
        lab.filter(F.col("is_test") == 0)
        .agg(
            F.expr(
                _ml2_expr(
                    "count(1) * 1024 div sum(CASE WHEN y = 0 THEN 1 ELSE 0"
                    " END)"
                )
            )
            .cast("long")
            .alias("p0"),
            F.expr(
                _ml2_expr(
                    "count(1) * 1024 div sum(CASE WHEN y = 1 THEN 1 ELSE 0"
                    " END)"
                )
            )
            .cast("long")
            .alias("p1"),
        )
    )
    ttc = (
        lab.filter(F.col("is_test") == 1)
        .select("doc_id", F.explode("w").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    docscore = (
        ttc.join(model, "word")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cnt") * F.col("c0")).cast("long").alias("s0"),
            F.sum(F.col("cnt") * F.col("c1")).cast("long").alias("s1"),
        )
    )
    pred = (
        lab.filter(F.col("is_test") == 1)
        .select("doc_id", "source", "y")
        .join(docscore, "doc_id", "left")
        .crossJoin(F.broadcast(prior))
        .select(
            "source",
            "y",
            F.when(
                F.coalesce("s1", F.lit(0)) + F.col("p1")
                < F.coalesce("s0", F.lit(0)) + F.col("p0"),
                1,
            )
            .otherwise(0)
            .alias("yhat"),
        )
    )
    return (
        pred.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum("yhat").cast("long").alias("pred_pos"),
            F.sum(F.when(F.col("yhat") == F.col("y"), 1).otherwise(0))
            .cast("long")
            .alias("agree"),
            F.expr(
                "CAST(sum(CASE WHEN yhat = y THEN 1 ELSE 0 END) * 10000"
                " div count(1) AS BIGINT)"
            ).alias("accuracy_bp"),
        )
        .orderBy("source")
    )
