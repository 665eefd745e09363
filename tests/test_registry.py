"""Guards on the query registry and the curated driver-facing slice.

The driver correctness harness checks only the alphabetically-first 50
entries of ``__spark_entry__.queries()``; round 2 proved that adding
queries silently evicts others from the checked window. These tests pin
the contract: the driver-facing dict is exactly <= 50, every operator
family keeps a representative, and retired names still exist in the
full registry (so ``tools/check.py`` keeps checking them locally).
"""

from __future__ import annotations

from hyppo_worker_spark.queries import (
    DRIVER_MAX,
    DRIVER_RETIRED,
    driver_registry,
    load_all,
)

# One prefix per family that must never lose driver coverage.
# "p1", "t0" and "t1" left the list in round 12: those id cohorts
# (control-plane ledgers + early streaming rows; the first 19 text
# rows) are fully archived by deliberate, documented rotation
# (NOTES_r12 — every member has 4-6 driver greens and its SEMANTIC
# family keeps in-window or deeply-archived reps; the name-by-name
# family taxonomy is enforced by tools/gen_survey_25.py's drift
# check, not by these coarse id prefixes). "p4" (streaming Bloom
# manifests / deletion vectors / model refresh), "s2" (bitext
# mining) and "t3" (the round-12 text cohort) carry the coverage;
# "t2" followed in the same sweep (t20-t32 all archived with 2-6
# greens each).
FAMILY_PREFIXES = ("d0", "d1", "m0", "p0", "p2", "p3", "p4", "q6", "q7", "q8", "s1", "s2", "t3")


def test_driver_registry_fits_check_window():
    dr = driver_registry()
    assert len(dr) <= DRIVER_MAX
    # every entry is within the alphabetically-first-50 window by construction
    assert list(dr) == sorted(dr)


def test_driver_registry_covers_every_family():
    names = set(driver_registry())
    for prefix in FAMILY_PREFIXES:
        assert any(n.startswith(prefix) for n in names), f"family {prefix} evicted"
    # the load-bearing representatives must stay in the window
    for must in (
        # long-lived anchors (flagship pipeline + each family's rep)
        "p02_raw_pipeline",
        "m08_video_frame_sample",
        "t31_unicode_nfc_normalize",
        "d09_corpus_export_manifest",
        # round-10 rows that stay after the round-12 rotation (q76 and
        # q79 retired with 2 greens each; reps stay per family)
        "q77_grouped_arrow_regression",
        "q78_cbo_join_reorder",
        "q80_nested_schema_pruning",
        "p33_multi_watermark_union",
        "p34_malformed_record_policy",
        "p35_late_data_accounting",
        "p36_rocksdb_changelog_checkpoint",
        "p37_state_schema_guard",
        # NEW round-11 rows land with immediate driver slots
        # (q57/q42/p16/q45/s05/s11 retired — >= 2 archived greens
        # each, family reps stay)
        "p38_checkpoint_evolution_backfill",
        "p39_streaming_scd2_pit_enrichment",
        "s12_incremental_ivf_maintenance",
        "s13_streaming_ivf_admission",
        "s14_incremental_pq_maintenance",
        "d17_projection_lsh_neardup",
        "q81_max_records_per_file",
        "q82_observe_inflight_metrics",
        # NEW round-12 rows land with immediate driver slots (q76/q79/
        # p27 retired — 2-4 archived greens each, family reps stay)
        "s15_persisted_ivf_query",
        "s16_ivfpq_residual_search",
        "s17_streaming_ivfpq_admission",
        "q83_bloom_file_manifest",
        # round-12 third wave (t19/p15/d10 retired — 4-6 archived
        # greens each, family reps stay)
        "t33_gopher_repetition",
        "p40_streaming_bloom_manifest",
        "s18_search_under_admission",
        # round-12 fourth wave (q65/p08 retired — 5-6 archived greens
        # each, family reps stay)
        "q85_deletion_vector_reads",
        "s19_filtered_ann_search",
        # round-12 fifth wave (p20 retired — 4 archived greens,
        # p26/p18/p19/p21 keep the stream-stream family)
        "p41_streaming_deletion_vectors",
        # round-12 sixth wave (t15 retired — 4 archived greens,
        # t06/t07/t26/q55 keep the sampling/mixing family archived)
        "d18_boilerplate_removal",
        # round-12 eighth wave (t08 retired — 4 archived greens;
        # chunking/packing archived-deep via t14/t21/t32)
        "s20_margin_bitext_mining",
        # round-12 ninth wave (t23 retired — 4 archived greens;
        # retrieval archived-deep via t29 BM25)
        "s21_indexed_bitext_mining",
        # round-12 tenth wave (t17 retired — 4 archived greens; t34
        # keeps the tokenizer family in-window, t16/t17 archived)
        "t34_unigram_viterbi_cost",
        # round-12 eleventh wave (p17 retired — 5 archived greens;
        # control-plane ledgers keep p09/p10/p11/p14 archived)
        "t35_nb_quality_training",
        # round-12 twelfth wave (p23 retired — 4 archived greens and
        # the documented host-floor A/B subject; p13/p16 archived)
        "p42_streaming_nb_refresh",
    ):
        assert must in names


def test_registered_fn_names_match_keys():
    """A @register decorator must sit directly above its query fn — a
    helper def slipped between them silently registers the WRONG
    callable (caught live: t16 briefly registered its _bpe_learn
    helper). Name equality pins decorator placement."""
    for name, q in load_all().items():
        assert q.spark_fn.__name__ == name, (
            f"{name} registered callable {q.spark_fn.__name__}"
        )


def test_retired_queries_stay_registered():
    full = load_all()
    for name in DRIVER_RETIRED:
        assert name in full, f"retired query {name} vanished from registry"
        assert full[name].oracle is not None, (
            f"retired query {name} lost its oracle — local checks need it"
        )


def test_every_driver_query_is_oracle_checked_or_documented():
    """Each driver-facing query either has an oracle, or is a documented
    rows-only case (none expected after q27 gained an exact+bounds oracle)."""
    dr = driver_registry()
    missing = [n for n, q in dr.items() if q.oracle is None]
    assert missing == [], f"driver-facing queries without oracle: {missing}"
