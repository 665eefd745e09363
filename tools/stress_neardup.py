"""Honest x100 near-dup stress for d03/d06 (VERDICT r8 item 8).

stress.py's replicated corpus is WRONG for LSH rows: replicating every
doc N times makes every document an N-member near-dup cluster, so the
candidate verify stage is quadratic BY CONSTRUCTION — those rows were
excluded from x100 rather than measured dishonestly. This harness
builds what a real corpus looks like at scale: UNIQUE documents with a
CONTROLLED planted dup rate.

Corpus (deterministic, id-derived — no RNG):
- ``factor x 5000`` base docs; each doc's text is 24-144 pseudo-random
  4-hex-char words (``substring(md5(doc_id:i), 1, 4)``) — shingle sets
  are effectively unique across docs, like real prose after exact
  dedup;
- 1% of docs (``pmod(xxhash64(doc_id), 100) == 0``) get ONE planted
  twin: the same text plus two extra words → word-trigram Jaccard
  (W-2)/W ≈ 0.85-0.98 ≥ the 0.8 verify threshold, and nothing else
  crosses it;
- lang/source/n_chars shaped like the real table so d06's quality and
  language gates stay loaded.

Because the planted set is closed-form, the run CHECKS ITSELF: d03
must return exactly the planted pairs (count and membership) — a
recall/precision assertion at every scale, not just a wall clock.
Per-task input/shuffle/run maxima come from the event log (stress.py
parser) to answer "does any task's working set grow superlinearly".

Usage: python tools/stress_neardup.py [--factor 100]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import stress  # noqa: E402  (tools/ sibling: event-log parser + session)

BASE_DOCS = 5_000
DUP_GATE = 100  # 1 in 100 docs gets a twin
TWIN_OFFSET = 1_000_000_000


def build_corpus(spark, out_dir: str, n_docs: int) -> int:
    """Write documents.parquet with unique docs + 1% planted twins;
    returns the planted-pair count."""
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(out_dir, "documents.parquet", "_SUCCESS")):
        return spark.range(n_docs).filter(
            F.pmod(F.xxhash64("id"), DUP_GATE) == 0
        ).count()
    base = (
        spark.range(n_docs)
        .repartition(32)
        .select(F.col("id").alias("doc_id"))
        .withColumn(
            "n_words", (24 + F.pmod(F.xxhash64("doc_id"), F.lit(121))).cast("int")
        )
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                F.expr(
                    "transform(sequence(0, n_words - 1), i -> "
                    "substring(md5(concat(cast(doc_id as string), ':', "
                    "cast(i as string))), 1, 4))"
                ),
            ),
        )
        .drop("n_words")
    )
    twins = (
        base.filter(F.pmod(F.xxhash64("doc_id"), DUP_GATE) == 0)
        .select(
            (F.col("doc_id") + TWIN_OFFSET).alias("doc_id"),
            F.concat(
                F.col("text"),
                F.lit(" "),
                F.substring(F.md5(F.concat(F.lit("tw:"), F.col("doc_id"))), 1, 4),
                F.lit(" "),
                F.substring(F.md5(F.concat(F.lit("tx:"), F.col("doc_id"))), 1, 4),
            ).alias("text"),
        )
    )
    langs = "array('en','de','fr','zh','es')"
    docs = (
        base.unionByName(twins)
        .withColumn(
            "lang",
            F.expr(f"element_at({langs}, cast(pmod(xxhash64(doc_id), 5) + 1 as int))"),
        )
        .withColumn("source", F.concat(F.lit("src"), F.pmod("doc_id", F.lit(20))))
        .withColumn("n_chars", F.length("text"))
    )
    docs.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))
    return base.filter(F.pmod(F.xxhash64("doc_id"), DUP_GATE) == 0).count()


def verify_d03(spark, sf_dir: str, planted: int) -> dict:
    """Run d03 and check it against the planted ground truth.

    Precision must be EXACT (every returned pair is a planted twin —
    a single false positive means random docs crossed the 0.8 verify,
    which the construction forbids). Recall is checked against the
    LSH S-curve, not against 1.0: with 6 bands of 2 rows, a J≈0.85
    pair is banded with p = 1 - (1 - J^2)^6 ≈ 0.9995, so ~0.05% of
    planted pairs are EXPECTED to miss banding (the verify stage
    never sees them). The first x100 run measured exactly that:
    5029/5031 found (2 missed, ~2.5 expected). The check passes when
    misses stay within 4x the S-curve expectation (+1 for small
    counts) — a real recall regression (wrong banding, dropped
    buckets) would blow far past it."""
    from pyspark.sql import functions as F

    from hyppo_worker_spark.queries import load_all

    out = load_all()["d03_minhash_lsh_pairs"].spark_fn(spark, sf_dir)
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            ((F.col("b_id") - F.col("a_id")) == TWIN_OFFSET).cast("long")
        ).alias("n_planted_shape"),
        F.min("jaccard").alias("min_j"),
    ).collect()[0]
    # S-curve expected misses at the construction's WEAKEST pair
    # (W=24 words -> J = 22/26 ~ 0.846): conservative upper bound
    j_min = 22 / 26
    p_miss = (1 - j_min**2) ** 6
    expected_misses = planted * p_miss
    misses = planted - stats["n"]
    return {
        "pairs_found": stats["n"],
        "pairs_planted": planted,
        "all_pairs_are_planted_twins": bool(stats["n_planted_shape"] == stats["n"]),
        "min_jaccard": round(float(stats["min_j"]), 4) if stats["min_j"] else None,
        "scurve_expected_misses": round(expected_misses, 1),
        "misses": misses,
        "precision_exact": bool(stats["n_planted_shape"] == stats["n"]),
        "recall_within_scurve": bool(0 <= misses <= 4 * expected_misses + 1),
    }


def main() -> None:
    factor = 100
    if "--factor" in sys.argv:
        factor = int(sys.argv[sys.argv.index("--factor") + 1])
    os.makedirs(stress.EVENT_DIR, exist_ok=True)

    from hyppo_worker_spark.queries import load_all
    from hyppo_worker_spark.session import clear_cache

    results: dict[str, dict] = {}
    for label, n_docs in (("x1", BASE_DOCS), (f"x{factor}", BASE_DOCS * factor)):
        corpus = f"/tmp/hyppo-neardup-{label}"
        spark = stress._fresh_session()
        planted = build_corpus(spark, corpus, n_docs)
        spark.stop()
        time.sleep(0.5)
        row: dict[str, dict] = {"planted_pairs": planted}
        # one app per query so the event-log task maxima attribute to
        # THAT query alone (corpus build and the recall check excluded)
        for name in ("d03_minhash_lsh_pairs", "d06_training_corpus_pipeline"):
            spark = stress._fresh_session()
            q = load_all()[name]
            q.spark_fn(spark, corpus).write.format("noop").mode("append").save()
            clear_cache(spark, include_rdd_blocks=True)
            wall = 9e9
            for _ in range(2):
                t0 = time.time()
                q.spark_fn(spark, corpus).write.format("noop").mode("append").save()
                wall = min(wall, round(time.time() - t0, 2))
                clear_cache(spark, include_rdd_blocks=True)
            app_id = spark.sparkContext.applicationId
            spark.stop()
            time.sleep(0.5)
            m = stress.parse_event_log(
                os.path.join(stress.EVENT_DIR, "*" + app_id + "*")
            )
            row[name] = {"wall_s": wall, **m}
        spark = stress._fresh_session()
        row["d03_check"] = verify_d03(spark, corpus, planted)
        spark.stop()
        time.sleep(0.5)
        results[label] = row
        print(f"{label}: {json.dumps(row)}", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
