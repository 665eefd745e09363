"""Whole-registry physical-plan audit → PLANS.md.

For every registered query, records the plan facts that decide whether
it survives a 100× scale-up: exchange (shuffle) count, join
strategies, scan read-schemas (column pruning), pushed filters, and
red flags (CartesianProduct / BroadcastNestedLoopJoin outside the
documented exceptions). This is the machine-checked companion to
SCALE.md — claims there should be visible here.

Usage: python tools/plan_audit.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Queries where a nested-loop/cartesian strategy is the documented,
# intentional plan (bounded band table or oracle-by-design quadratic).
EXPECTED_NLJ = {
    "q17_price_band_range_join",  # broadcast band table, |bands| ~ 10
    "s03_cosine_neardup_pairs",  # documented all-pairs oracle
    "s01_knn_cosine_bruteforce",  # broadcast tiny query batch vs corpus
    "s04_knn_ivf",  # broadcast n_centroids-row table scattered per vector
    "s05_knn_ivf_multiprobe",  # same broadcast centroid table, nprobe=2
    "s11_truncated_retrieval",  # broadcast 10-row query batch vs corpus
    # (s01's shape; the row measures prefix-truncation agreement)
    "t16_bpe_merges",  # per-round 1-row broadcast argmax (scalar join)
    "t17_bpe_encoding",  # same per-round 1-row broadcast argmax as t16
    "t15_source_mix",  # 1-row broadcast scalar (binding-stratum total)
    "q44_hll_shard_rollup",  # 1-row exact total × 1-row union estimate
    "t09_bigram_collocations",  # 1-row broadcast corpus-total (scalar join)
    "q47_quantile_sketch",  # 3-row stats dim × <=512-row merged sketch ×
    # 1-row total — every NLJ side is a tiny broadcast by construction
    "d11_semantic_dedup",  # broadcast n_centroids-row table scattered
    # per vector — same pattern as s04/s05 (the assignment argmax)
    "d16_semantic_dedup_two_level",  # d11's pattern twice (flat +
    # two-level) plus 1-row bound scalars
    "t19_unigram_surprisal",  # 1-row broadcast corpus-total (scalar
    # join), same as t09
    "q48_kmv_set_sketch",  # 1-row scalar frames crossJoined (exact
    # twins + sketch stats), same as q44
    "q65_native_sketch_rollup",  # 1-row sketch/estimate frames
    # crossJoined with 1-row exact aggregates (the accuracy-bound
    # columns), same scalar-join pattern as q44/q48
    "q50_zorder_skipping",  # 1-row broadcast min/max scalars (the
    # range-scaling bounds), same scalar-join pattern as t15/t09
    "s07_pq_adc_topk",  # broadcast tiny query batch vs corpus in the
    # exact-recall twin (same pattern as s01)
    "q54_zonemap_pruning",  # 1-row broadcast min/max + predicate
    # bounds scalars (same scalar-join pattern as q50)
    "t24_vocab_coverage",  # 4-row sizes frame x top-N prefix x 1-row
    # total — every NLJ side tiny by construction (q47's pattern)
    "t25_source_drift",  # broadcast top-K profile x 1-row corpus
    # total scattered per source — the same tiny-scalar pattern
    "t26_temperature_mix",  # 1-row broadcast (n_total, w_total)
    # scalars scattered per source — the standard scalar-join pattern
    "t28_bigram_surprisal",  # 1-row broadcast held-in N total
    "d14_split_assignment",  # 1-row broadcast naive-leak count
    "s08_range_search",  # broadcast tiny query batch vs corpus
    # (same pattern as s01; windowless by design)
    "s09_hard_negatives",  # broadcast tiny query batch vs corpus
    # (s01's pattern with the dup-band filter before the top-k)
    "t29_bm25_retrieval",  # 1-row broadcast (n_docs, tok_total)
    # corpus-stats scalars — the standard scalar-join pattern
    "d17_projection_lsh_neardup",  # 1-row broadcast occupied-bucket
    # count crossJoined onto the 5-label report — the standard
    # scalar-join pattern (q44/q50/t29)
    "t33_gopher_repetition",  # 1-row broadcast corpus keep/drop
    # verdicts crossJoined onto the per-doc metric rows — the
    # standard scalar-join pattern (q44/q50/t29)
    "s20_margin_bitext_mining",  # all-pairs cross-side scoring is a
    # broadcast crossJoin by design (s01's brute-force shape; the
    # scale path swaps to the persisted IVF candidate generator)
    "s21_indexed_bitext_mining",  # Lloyd assignment broadcasts the
    # tiny centroid set unconditioned (s04's shape) + the 1-row
    # stats crossJoin (q44/q50/t29 scalar pattern); the candidate
    # join itself is a hash join on cell
    "t34_unigram_viterbi_cost",  # 1-row vocabulary-total crossJoin
    # pricing the pieces (q44/q50/t29 scalar pattern); the DP itself
    # is per-word expression work after hash joins
    "t35_nb_quality_training",  # two 1-row scalar crossJoins (class
    # totals pricing the model; priors onto the held-out docs) — the
    # q44/q50/t29 pattern; scoring is a hash join on word
}

# Queries where an UNPARTITIONED window (single-task WindowExec) is
# documented and bounded — every whitelisted frame is provably tiny by
# construction, so one task sorting it is fine at any corpus size.
# Anything else that plans a global window FLAGS (VERDICT r4 item 4:
# an unbounded one must never land silently).
EXPECTED_GLOBAL_WINDOW = {
    "q47_quantile_sketch",  # exact twin: cumulative sum over the
    # octave x subdivision histogram — <= 512 rows by construction
    "q48_kmv_set_sketch",  # exact twin: rank over the distinct value
    # domain of the k-min-values probe — bounded by k
    "t24_vocab_coverage",  # rank over the candidate vocab — bounded
    # by max vocab size (a tokenizer-sizing constant)
    # seed_centroid_ids (operators/similarity.py): row_number over an
    # ORDER BY id LIMIT k frame — <= n_centroids rows by construction:
    "s04_knn_ivf",
    "s05_knn_ivf_multiprobe",
    "s07_pq_adc_topk",
    "d11_semantic_dedup",
    "d16_semantic_dedup_two_level",
    # exclusive_prefix_sum's SECOND pass (operators/packing.py): the
    # bucket-offset running sum over the per-bucket totals frame —
    # n_buckets = ceil(rows / 4M) rows by derive_n_buckets (25k at
    # 1e11 input rows); the first (per-bucket) pass is partitioned.
    "t14_sequence_packing",
    "t21_padding_waste",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    ap.add_argument("--out", default="PLANS.md")
    args = ap.parse_args()

    from hyppo_worker_spark.plans.explain import (
        count_exchanges,
        formatted_plan,
        join_strategies,
        pushed_filters,
        read_schemas,
        unpartitioned_windows,
    )
    from hyppo_worker_spark.queries import DRIVER_RETIRED, load_all
    from hyppo_worker_spark.session import clear_cache, get_spark

    registry = load_all()
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    flags_total = 0
    for name, q in sorted(registry.items()):
        try:
            df = q.spark_fn(spark, args.sf_dir)
            plan = formatted_plan(df)
            exch = count_exchanges(df)
            joins = join_strategies(df)
            schemas = read_schemas(df)
            pushed = pushed_filters(df)
            gwin = unpartitioned_windows(df)
            flags = []
            for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
                if bad in joins and name not in EXPECTED_NLJ:
                    flags.append(bad)
            if gwin and name not in EXPECTED_GLOBAL_WINDOW:
                flags.append(f"GlobalWindow[{len(gwin)}]")
            flags_total += len(flags)
            widest = max((s.count(",") + 1 for s in schemas), default=0)
            rows.append(
                {
                    "name": name,
                    "exchanges": exch,
                    "joins": ",".join(sorted(set(joins))) or "-",
                    "scans": len(schemas),
                    "widest_scan_cols": widest,
                    "pushed": sum(1 for p in pushed if p.strip()),
                    "gwin": (
                        f"{len(gwin)} (ok)" if gwin and name in EXPECTED_GLOBAL_WINDOW
                        else (str(len(gwin)) if gwin else "-")
                    ),
                    "flags": ",".join(flags) or "-",
                    "driver": "retired" if name in DRIVER_RETIRED else "driver",
                }
            )
            status = "FLAG " + rows[-1]["flags"] if flags else "ok"
            print(f"  {name}: exch={exch} joins=[{rows[-1]['joins']}] {status}")
        except Exception as e:  # noqa: BLE001
            rows.append({"name": name, "error": str(e)[:120]})
            print(f"  {name}: ERROR {e}")
        clear_cache(spark, include_rdd_blocks=True)

    with open(args.out, "w", encoding="utf-8") as fh:
        fh.write(
            "# PLANS — whole-registry physical-plan audit\n\n"
            f"Generated by `tools/plan_audit.py` at `{args.sf_dir}`. "
            "Columns: shuffle (Exchange) count, physical join strategies, "
            "scan count / widest scan width (column pruning), scans with "
            "pushed filters, red flags "
            "(CartesianProduct / BNLJ outside the documented exceptions: "
            f"{', '.join(sorted(EXPECTED_NLJ))}; unpartitioned windows "
            "outside the documented bounded frames: "
            f"{', '.join(sorted(EXPECTED_GLOBAL_WINDOW))}). gwin = "
            "unpartitioned (single-task) Window operators in the plan; "
            "'(ok)' = on the bounded whitelist.\n\n"
            "| query | window | exch | joins | scans | widest | pushed | gwin | flags |\n"
            "|---|---|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            if "error" in r:
                fh.write(f"| {r['name']} | — | — | — | — | — | — | — | ERROR {r['error']} |\n")
            else:
                fh.write(
                    f"| {r['name']} | {r['driver']} | {r['exchanges']} | {r['joins']} "
                    f"| {r['scans']} | {r['widest_scan_cols']} | {r['pushed']} "
                    f"| {r['gwin']} | {r['flags']} |\n"
                )
    print(f"\nwrote {args.out}; unexpected flags (NLJ + global-window): {flags_total}")
    return 1 if flags_total else 0


if __name__ == "__main__":
    sys.exit(main())
