"""Unit tests for the bag-of-features text primitives behind the
hashing-trick classifier (t18): word_ngrams keeps duplicates and
guards short docs, and the Spark-side scoring matches a pure-Python
reimplementation of the md5-bucket + frozen-weight formula."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from hyppo_worker_spark.functions import text as TX
from hyppo_worker_spark.queries.text_queries import (
    _CLF_BUCKETS,
    _CLF_KEEP_NUM,
)


def test_word_ngrams_keeps_duplicates_in_order(spark):
    df = spark.createDataFrame([("a b a b",)], "text string")
    row = df.select(
        TX.word_ngrams(TX.tokens("text"), 2).alias("g")
    ).first()
    assert row.g == ["a b", "b a", "a b"]  # NOT deduplicated


def test_word_ngrams_short_doc_is_empty_not_descending(spark):
    # sequence(1, 0) is descending in Spark; the guard must yield []
    df = spark.createDataFrame([("solo",), ("",)], "text string")
    rows = df.select(TX.word_ngrams(TX.tokens("text"), 2).alias("g")).collect()
    assert [r.g for r in rows] == [[], []]


def test_pos_ngram_hashes_short_doc_is_empty_not_descending(spark):
    # ADVICE r4 (d13): an unguarded sequence(1, size-7) is DESCENDING
    # for docs under k tokens, producing slice() starts <= 0.
    df = spark.createDataFrame(
        [("a b c",), ("",), ("a b c d e f g h i",)], "text string"
    )
    rows = df.select(
        TX.pos_ngram_hashes(TX.tokens("text"), 8).alias("g")
    ).collect()
    assert [len(r.g) for r in rows] == [0, 0, 2]
    # positions are 1-based consecutive starts; hash matches python md5
    long = rows[2].g
    assert [g.pos for g in long] == [1, 2]
    gram1 = " ".join("abcdefgh")
    assert long[0].h == int(
        hashlib.md5(gram1.encode()).hexdigest()[:13], 16
    )


def _py_bucket(feat: str, mod: int) -> int:
    return int(hashlib.md5(feat.encode()).hexdigest()[:7], 16) % mod


def _py_weight(bucket: int) -> int:
    return ((bucket * 2654435761 + 40503) % 1000003) % 201 - 100


def test_classifier_score_matches_python_reimplementation(spark):
    """End-to-end t18 arithmetic on a controlled doc: features are
    unigrams u:w plus ALL bigrams b:"w1 w2"; score = sum of frozen
    integer weights; keep iff raw * KEEP_NUM > n_feats."""
    text = "the quick quick fox"
    toks = ["the", "quick", "quick", "fox"]
    feats = [f"u:{w}" for w in toks] + [
        f"b:{a} {b}" for a, b in zip(toks, toks[1:])
    ]
    raw = sum(_py_weight(_py_bucket(f, _CLF_BUCKETS)) for f in feats)
    n = len(feats)

    docs = spark.createDataFrame([("d1", text)], "doc_id string, text string")
    words = docs.select("doc_id", TX.tokens("text").alias("w"))
    uni = words.select("doc_id", F.explode("w").alias("t")).select(
        "doc_id", F.concat(F.lit("u:"), F.col("t")).alias("f")
    )
    bi = words.select(
        "doc_id", F.explode(TX.word_ngrams(F.col("w"), 2)).alias("t")
    ).select("doc_id", F.concat(F.lit("b:"), F.col("t")).alias("f"))
    got = (
        uni.unionByName(bi)
        .select(TX.md5_bucket(F.col("f"), _CLF_BUCKETS).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (
                    (F.col("bucket") * F.lit(2654435761) + F.lit(40503))
                    % F.lit(1000003)
                )
                % F.lit(201)
                - F.lit(100)
            ).alias("raw"),
        )
        .first()
    )
    assert got.n == n
    assert got.raw == raw
    # the keep rule is a pure integer compare on those two numbers
    assert (raw * _CLF_KEEP_NUM > n) == (got.raw * _CLF_KEEP_NUM > got.n)
