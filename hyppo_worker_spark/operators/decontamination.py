"""Train/eval decontamination: flag training documents whose word
n-grams overlap a held-out evaluation set.

The real-world contract: the eval side is a FIXED benchmark suite
(MMLU/GSM8K/…-sized — thousands to low millions of distinct n-grams),
handed to the pipeline as its own table; the training corpus is the
100 TB side. The membership probe must therefore adapt to the eval
side's size:

- ``broadcast`` — eval gram set fits in an executor broadcast: the
  training corpus NEVER shuffles; the only exchange is the per-doc
  overlap aggregate (narrow rows, map-side partials). The right plan
  for the benchmark-decontamination case.
- ``shuffle`` — eval gram set is corpus-proportional (e.g. a held-out
  split of the corpus itself): broadcasting would OOM the executors,
  so the overlap probe becomes a shuffled inner join on the gram key.
  Only matched grams reach the post-join aggregate; the per-doc totals
  are computed on a separate doc_id-keyed (narrow) aggregate and
  joined back — the full gram set crosses the wire once, which is the
  lower bound when neither side broadcasts.
- ``auto`` — count the eval gram set and pick: below
  ``broadcast_max_rows`` distinct grams (default 1M ≈ tens of MB at
  typical gram widths, in line with a 64 MB
  ``spark.sql.autoBroadcastJoinThreshold``) broadcast, else shuffle.
  The count is one narrow agg over the (small or already-distinct)
  eval side — noise next to the probe itself.

Output schema (both strategies, bit-identical):
``(doc_id, n_grams, n_overlap, contaminated)`` — one row per training
doc with ≥1 overlapping gram; ``contaminated`` is the exact integer
threshold test ``n_overlap * pct_den >= n_grams`` (no float ratio, so
the verdict is stable across engines and partitionings).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: eval-side distinct-gram count above which ``auto`` stops
#: broadcasting. ~1M grams × ~40-60 B/gram ≈ the 64 MB broadcast conf.
BROADCAST_MAX_ROWS = 1_000_000


def decontaminate(
    train_grams: DataFrame,
    eval_grams: DataFrame,
    *,
    doc_col: str = "doc_id",
    gram_col: str = "gram",
    threshold_num: int = 1,
    threshold_den: int = 10,
    strategy: str = "auto",
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> DataFrame:
    """Per-doc overlap of ``train_grams`` (exploded ``(doc, gram)``
    rows, grams distinct within each doc) against the distinct grams
    of ``eval_grams``; docs with zero overlap are dropped.

    ``contaminated`` = ``n_overlap * threshold_den >= n_grams *
    threshold_num`` (default: ≥10% of the doc's grams hit the eval
    set).
    """
    if strategy not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"unknown decontamination strategy: {strategy!r}")
    ev = eval_grams.select(F.col(gram_col).alias(gram_col)).distinct()
    if strategy == "auto":
        n_eval = ev.count()
        strategy = "broadcast" if n_eval <= broadcast_max_rows else "shuffle"

    contaminated: Column = (
        F.col("n_overlap") * threshold_den >= F.col("n_grams") * threshold_num
    ).alias("contaminated")

    if strategy == "broadcast":
        # Single pass: left-join against the broadcast gram set, count
        # rows (= n_grams, grams are distinct per doc) and hits in one
        # doc_id-keyed aggregate. The corpus side never shuffles the
        # gram strings — only (doc_id, counts) partials move.
        hit = ev.withColumn("hit", F.lit(1))
        return (
            train_grams.join(F.broadcast(hit), gram_col, "left")
            .groupBy(doc_col)
            .agg(
                F.count(F.lit(1)).alias("n_grams"),
                F.count("hit").alias("n_overlap"),
            )
            .filter(F.col("n_overlap") > 0)
            .select(doc_col, "n_grams", "n_overlap", contaminated)
        )

    # Shuffle strategy: totals and overlaps split into two narrow
    # aggregates so the outer join carries only matched grams.
    totals = train_grams.groupBy(doc_col).agg(F.count(F.lit(1)).alias("n_grams"))
    # The merge hint pins the gram probe to a shuffled SMJ: the caller
    # chose (or auto measured) this path BECAUSE the eval side must not
    # be broadcast — don't let static size estimates re-broadcast it.
    overlap = (
        train_grams.join(ev.hint("merge"), gram_col, "inner")
        .groupBy(doc_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    # overlap ⊆ totals (inner join keeps only docs with ≥1 hit), and
    # both sides are post-agg (small): join on doc_id, inner.
    return overlap.join(totals, doc_col, "inner").select(
        doc_col, "n_grams", "n_overlap", contaminated
    )
