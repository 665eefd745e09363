"""Honest x100 stress for the EMBEDDING near-dup family (VERDICT r10
item 5): d08/d11/d16/s03 had no x100 row for the same by-construction
reason the text-LSH rows didn't — stress.py's replicated corpus makes
every vector an N-member near-dup cluster, quadratic by construction.

Corpus (deterministic, id-derived — no RNG):
- ``factor x 5000`` base vectors, dim 64, components
  ``(pmod(xxhash64(id:j), 2001) - 1000) / 1000`` ∈ [-1, 1] — unique,
  sign-balanced, like a real embedding table after exact dedup;
- 1% of ids (``pmod(xxhash64(id), 100) == 0``) get ONE planted twin:
  id + 1e9, component 0 shifted by +0.0625 → cosine ≈ 0.9999 vs its
  base, while random pairs sit at |cos| ~ 1/sqrt(64) = 0.125 — the
  0.9 verify threshold is ~7σ out, so the planted set is closed-form
  and the run CHECKS ITSELF at every scale.

Two measured paths, both with per-task maxima from the event log:

1. **Sign-LSH banding** (`embedding_neardup_pairs`): bands=4,
   bits=16 — the bucket-count scale rule made explicit. d08's
   registered bits=8 gives 256 buckets/band, so candidate volume is
   Σ bucket² ≈ 4·n²/256: fine at query scale, quadratic at 500k.
   Doubling bits to the full 64 dims gives 65536 buckets/band
   (n/65536 ≈ 8 rows per bucket at x100). The perturbation touches
   only component 0 = band 0, so bands 1-3 match exactly → recall
   of planted pairs must be EXACT (not S-curve-bounded like
   MinHash), and precision must be exact too. Past ~10^7 vectors
   the 64 raw-component signs run out of bucket space — the
   documented next step is random-projection bits (widen 2^bits
   without widening the embedding), which changes only
   `banded_sign_buckets`.
2. **Two-level SemDeDup** (`semantic_dedup_components`,
   assignment="two_level"): the quantizer is trained on a
   deterministic 10% md5 sample (k still derived from the FULL
   corpus size, so the cell-size invariant holds) — the standard
   production discipline (FAISS trains coarse quantizers on
   samples); Lloyd cost drops from n·k to n/10·k while assignment
   stays 2n·sqrt(k). Planted-twin recall is checked ≥ 95% (twins
   can straddle a cell boundary — the documented SemDeDup nprobe=1
   trade) and precision exact (every dropped id is a planted twin).

Usage: python tools/stress_neardup_embed.py [--factor 100]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import stress  # noqa: E402

BASE_VECS = 5_000
DIM = 64
DUP_GATE = 100  # 1 in 100 vectors gets a twin
TWIN_OFFSET = 1_000_000_000
THRESHOLD = 0.9


def build_corpus(spark, out_dir: str, n_vecs: int) -> int:
    """embeddings.parquet with unique vectors + 1% planted twins;
    returns the planted-pair count."""
    from pyspark.sql import functions as F

    path = os.path.join(out_dir, "embeddings.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        base = (
            spark.range(n_vecs)
            .repartition(32)
            .select(F.col("id").alias("vec_id"))
            .withColumn(
                "embedding",
                F.expr(
                    f"transform(sequence(0, {DIM - 1}), j -> "
                    "(pmod(xxhash64(concat(cast(vec_id as string), ':', "
                    "cast(j as string))), 2001) - 1000) / 1000.0)"
                ),
            )
            .withColumn(
                "label",
                F.concat(F.lit("lab"), F.pmod("vec_id", F.lit(5))),
            )
        )
        twins = base.filter(
            F.pmod(F.xxhash64("vec_id"), DUP_GATE) == 0
        ).select(
            (F.col("vec_id") + TWIN_OFFSET).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, j) -> "
                "CASE WHEN j = 0 THEN x + 0.0625 ELSE x END)"
            ).alias("embedding"),
            "label",
        )
        base.unionByName(twins).write.mode("overwrite").parquet(path)
    from pyspark.sql import functions as F2

    return (
        spark.read.parquet(path)
        .filter(F2.col("vec_id") >= TWIN_OFFSET)
        .count()
    )


def run_lsh(spark, corpus_dir: str, planted: int) -> dict:
    """Sign-LSH banding at scale-appropriate bits + CC + keep-min,
    self-checked against the planted set."""
    from pyspark.sql import functions as F

    from hyppo_worker_spark.operators import dedup as D

    emb = spark.read.parquet(os.path.join(corpus_dir, "embeddings.parquet"))
    t0 = time.time()
    pairs = D.embedding_neardup_pairs(
        emb, "vec_id", "embedding",
        threshold=THRESHOLD, bands=4, bits=16,
    )
    comp = D.connected_components(pairs)
    dropped = comp.filter(F.col("node") != F.col("comp"))
    stats = dropped.agg(
        F.count(F.lit(1)).alias("n_dropped"),
        F.sum((F.col("node") >= TWIN_OFFSET).cast("long")).alias(
            "n_dropped_twins"
        ),
    ).collect()[0]
    wall = round(time.time() - t0, 2)
    from hyppo_worker_spark.session import clear_cache

    clear_cache(spark, include_rdd_blocks=True)
    return {
        "wall_s": wall,
        "planted": planted,
        "dropped": stats["n_dropped"],
        "dropped_are_twins": stats["n_dropped_twins"],
        # band 1-3 components are untouched by the perturbation, so
        # every planted pair MUST band and verify: recall exact
        "recall_exact": bool(stats["n_dropped"] == planted),
        "precision_exact": bool(
            stats["n_dropped_twins"] == stats["n_dropped"]
        ),
    }


def run_lsh_proj(spark, corpus_dir: str, planted: int) -> dict:
    """Random-projection banding at bits=20 — 2^20 buckets/band, a
    bucket space IMPOSSIBLE for raw-component signs on a 64-dim
    embedding (bands*bits=80 > dim): the d17 scale path measured at
    x100. Recall is S-curve-governed (projections CAN flip near
    zero): with ~0.5% flip probability per projection, a 20-bit band
    survives with ~0.9 and four bands miss together with ~1e-4 — the
    check allows 1% misses and demands exact precision."""
    from pyspark.sql import functions as F

    from hyppo_worker_spark.operators import dedup as D

    emb = spark.read.parquet(os.path.join(corpus_dir, "embeddings.parquet"))
    t0 = time.time()
    pairs = D.embedding_neardup_pairs(
        emb, "vec_id", "embedding",
        threshold=THRESHOLD, bands=4, bits=20, projections=True, dim=DIM,
    )
    comp = D.connected_components_adaptive(pairs)
    dropped = comp.filter(F.col("node") != F.col("comp"))
    stats = dropped.agg(
        F.count(F.lit(1)).alias("n_dropped"),
        F.sum((F.col("node") >= TWIN_OFFSET).cast("long")).alias(
            "n_dropped_twins"
        ),
    ).collect()[0]
    wall = round(time.time() - t0, 2)
    from hyppo_worker_spark.session import clear_cache

    clear_cache(spark, include_rdd_blocks=True)
    return {
        "wall_s": wall,
        "planted": planted,
        "dropped": stats["n_dropped"],
        "dropped_are_twins": stats["n_dropped_twins"],
        "recall": round(stats["n_dropped"] / max(planted, 1), 4),
        "recall_ge_99pct": bool(
            stats["n_dropped"] * 100 >= planted * 99
        ),
        "precision_exact": bool(
            stats["n_dropped_twins"] == stats["n_dropped"]
        ),
    }


def run_two_level(spark, corpus_dir: str, planted: int) -> dict:
    """Sample-trained quantizer + two-level assignment SemDeDup,
    planted recall >= 95%, precision exact."""
    from pyspark.sql import functions as F

    from hyppo_worker_spark.functions import text as TX
    from hyppo_worker_spark.operators import dedup as D
    from hyppo_worker_spark.operators.similarity import (
        derive_n_centroids,
        kmeans_centroids,
    )

    emb = spark.read.parquet(os.path.join(corpus_dir, "embeddings.parquet"))
    t0 = time.time()
    n_full = emb.count()
    # quantizer trained on a 10% md5 sample; k derived from the FULL
    # corpus so the avg-cell-size invariant holds for the assignment
    sample = emb.filter(TX.md5_bucket("vec_id", 10) == 0)
    cents = kmeans_centroids(
        sample, id_col="vec_id", vec_col="embedding",
        n_centroids=derive_n_centroids(n_full), n_iter=2,
    ).localCheckpoint(eager=True)
    comp = D.semantic_dedup_components(
        emb, "vec_id", "embedding",
        threshold=THRESHOLD, assignment="two_level", centroids=cents,
    )
    dropped = comp.filter(F.col("node") != F.col("comp"))
    stats = dropped.agg(
        F.count(F.lit(1)).alias("n_dropped"),
        F.sum((F.col("node") >= TWIN_OFFSET).cast("long")).alias(
            "n_dropped_twins"
        ),
    ).collect()[0]
    wall = round(time.time() - t0, 2)
    from hyppo_worker_spark.session import clear_cache

    clear_cache(spark, include_rdd_blocks=True)
    return {
        "wall_s": wall,
        "planted": planted,
        "n_centroids": derive_n_centroids(n_full),
        "dropped": stats["n_dropped"],
        "dropped_are_twins": stats["n_dropped_twins"],
        "recall": round(stats["n_dropped"] / max(planted, 1), 4),
        "recall_ge_95pct": bool(
            stats["n_dropped"] * 100 >= planted * 95
        ),
        "precision_exact": bool(
            stats["n_dropped_twins"] == stats["n_dropped"]
        ),
    }


def main() -> None:
    factor = 100
    if "--factor" in sys.argv:
        factor = int(sys.argv[sys.argv.index("--factor") + 1])
    os.makedirs(stress.EVENT_DIR, exist_ok=True)

    results: dict[str, dict] = {}
    for label, n in (("x1", BASE_VECS), (f"x{factor}", BASE_VECS * factor)):
        corpus = f"/tmp/hyppo-neardup-embed-{label}"
        spark = stress._fresh_session()
        planted = build_corpus(spark, corpus, n)
        spark.stop()
        time.sleep(0.5)
        row: dict = {"n_base": n, "planted_pairs": planted}
        for name, fn in (
            ("lsh_bits16", run_lsh),
            ("lsh_proj_bits20", run_lsh_proj),
            ("two_level", run_two_level),
        ):
            spark = stress._fresh_session()
            row[name] = fn(spark, corpus, planted)
            app_id = spark.sparkContext.applicationId
            spark.stop()
            time.sleep(0.5)
            m = stress.parse_event_log(
                os.path.join(stress.EVENT_DIR, "*" + app_id + "*")
            )
            row[name].update(m)
        results[label] = row
        print(f"{label}: {json.dumps(row)}", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
