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
FAMILY_PREFIXES = ("d0", "d1", "m0", "p0", "q4", "q5", "q6", "s0", "t0", "t1", "t2", "t3")


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
        # 1-green round-7 rows keep accumulating driver evidence
        "p08_streaming_incremental_cc",
        "p15_streaming_funnel",
        "p16_dropdup_within_watermark",
        "p17_queue_rollup_ledger",
        "q42_retention_cohorts",
        "q45_variant_ingestion",
        "q57_interval_bin_join",
        "q65_native_sketch_rollup",
        "m08_video_frame_sample",
        "t31_unicode_nfc_normalize",
        # round-8 ENDGAME rotation (VERDICT r7 item 1): the final 14
        # never-driver-checked entries get their FIRST driver rows —
        # after this round every registry entry has archived evidence
        "d09_corpus_export_manifest",
        "d10_incremental_neardup",
        "s05_knn_ivf_multiprobe",
        "t08_token_chunks",
        "t15_source_mix",
        "t17_bpe_encoding",
        "t19_unigram_surprisal",
        "t23_term_retrieval",
        # NEW round-8 rows land with immediate driver slots
        "p20_stream_stream_outer_join",
        "q67_recursive_chain_fold",
        "p22_data_quality_gate",
        "p23_stream_checkpoint_resume",
        "p24_streaming_session_windows",
        "p25_connector_streaming_loop",
        "p26_chained_stateful_rollup",
        "p27_state_store_introspection",
        # round-9 rotation (VERDICT r8 item 1): the four reserved r8
        # slots get their FIRST driver rows
        "q69_aqe_skew_join",
        "q70_window_group_limit",
        "p28_rebalance_write",
        "q71_sql_pipe_syntax",
        # NEW round-9 rows land with immediate driver slots (q64,
        # m03, s06 retired — 2 greens each, family reps stay)
        "q72_chain_fold_scale_twin",
        "p29_parquet_schema_drift",
        "s11_truncated_retrieval",
        "q73_dynamic_partition_pruning",
        "p30_rocksdb_state_backend",
        "q74_runtime_bloom_filter",
        "p31_erasure_vs_time_travel",
        "q75_sorted_export",
        "p32_native_file_sink",
        # NEW round-10 rows land with immediate driver slots (t25,
        # t32, p21, q68, t24, p19 retired — >= 2 archived greens
        # each, family reps stay)
        "q76_join_hint_matrix",
        "q77_grouped_arrow_regression",
        "q78_cbo_join_reorder",
        "p33_multi_watermark_union",
        "p34_malformed_record_policy",
        "p35_late_data_accounting",
        "q79_aqe_coalesce_partitions",
        "p36_rocksdb_changelog_checkpoint",
        "q80_nested_schema_pruning",
        "p37_state_schema_guard",
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
