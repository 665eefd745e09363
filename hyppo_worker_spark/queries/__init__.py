"""Query registry: every operator the engine claims is backed by a
named query (Spark implementation) and, where SQL-expressible, a
DuckDB oracle SQL string over the same parquet tables.

The driver (and ``tests/``) runs both sides at sf=0.01 and compares
row-count + schema + order-insensitive value hash. Column names are
aliased identically on both sides; float aggregates are rounded on
both sides so summation-order epsilon can't flip the hash; timestamps
are formatted to strings on both sides (Spark session TZ is UTC,
DuckDB is UTC-naive).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}

# The driver's correctness harness checks only the alphabetically-first
# 50 entries of ``__spark_entry__.queries()``. The registry is larger
# than that, so the driver-facing dict is curated: redundant relational
# variants (each family keeps at least one representative) are retired
# from the DRIVER surface but stay registered, tested, and checked by
# the local harness (``tools/check.py`` runs the FULL registry).
DRIVER_RETIRED: frozenset[str] = frozenset(
    {
        "q02_customer_by_region",  # join-agg — q03/q07/q28 cover join+agg shapes
        "q05_customers_without_orders",  # anti-join — q25 covers anti-join richer
        "q10_set_ops",  # set ops — q31 covers union/intersect/except + multiset
        "q11_distinct_parts",  # distinct agg — q27 now carries exact+approx distincts
        "q12_top_orders",  # top-k — q03 covers TakeOrderedAndProject
        "q08_user_running_state",  # running windows — q29/q36 cover frames/running
        "q13_scalar_functions",  # scalar funcs — q24/q33/q34/q37 each keep a scalar family
        "q14_promo_revenue",  # conditional agg — q35 covers count_if/sum-when richer
        "q15_small_quantity_orders",  # scalar-subquery filter-agg — q14 covers filter-agg
        "q26_price_histogram",  # binned percentile family — q23 covers percentiles
        "s03_cosine_neardup_pairs",  # all-pairs cosine (documented quadratic
        # oracle) — d08 carries the same near-dup semantics via the scale path
        # (banded sign-LSH + CC); s01/s02/s04 keep the similarity family
        # Window-full additions: the text family keeps seven in-window
        # representatives (t01-t07); these newer members are registered,
        # tested, and locally oracle-checked only.
        "q06_forecast_revenue",  # single filter-agg — q01 (richer agg) and
        # q35 (conditional agg) keep the shape; retired to give the
        # recursive-CTE surface (q40) a driver row
        "q09_rollup_qty",  # rollup — q20 grouping-sets keeps the category
        "q16_pivot_status",  # pivot — q32 unpivot keeps the category
        # Round-4 re-curation (VERDICT r3 item 1): retire three redundant
        # relational variants so the sharding/export (t13), tokenizer-
        # training (t16) and normalization/PII (t10) families each get a
        # driver CORRECTNESS row, plus one more (q28) for the bucketed
        # zero-exchange join (q41). Each retiree's family keeps an
        # in-window representative:
        "q19_event_time_windows",  # time-window family — q18 sessionize keeps it
        "q38_distribution_windows",  # percentile/window — q29 keeps it
        "q34_ship_latency",  # scalar/date family — q24 keeps it
        "q28_cheapest_supplier_per_nation",  # per-group extreme — q07 keeps it
        "q36_rolling_window_range_frame",  # window frames — q29's window
        # suite keeps the family; retired so the Python DataSource
        # connector (p03) gets a driver row
        "q33_array_agg",  # array functions — exercised throughout the
        # s-/t-suites (arrays are the embedding/token medium); q24/q31
        # keep the semi-structured/set-op driver rows
        "q35_conditional_aggregates",  # conditional aggs — in-window
        # q29/t18/q49-style sums cover the shape; q01 keeps rich aggs
        "q37_edit_distance_drift",  # string-distance scalar — d03
        # minhash keeps the string-similarity driver row
        "d02_exact_dedup_kept",  # exact-dedup family — d01 keeps the
        # digest-groupBy driver row (2 green driver rounds archived)
        "d04_simhash_sketches",  # banded-sketch family — d03 minhash
        # keeps the driver row (2 green driver rounds archived)
        "d05_ngram_jaccard_pairs",  # n-gram set-similarity — d03/d06
        # keep the driver rows (2 green driver rounds archived)
        "q20_grouping_sets",  # multi-granularity aggs — q01 keeps the
        # rich-agg driver row (2 green driver rounds archived)
        "q22_nation_coverage_full_outer",  # outer joins — q03/q04/q21
        # keep the join driver rows (2 green driver rounds archived)
        "q23_price_percentiles",  # percentiles — q53 (exact medians)
        # and q47 (quantile sketch) take the driver rows
        "q25_global_sales_opportunity",  # anti-join — q04 keeps the
        # existence-join driver row (2 green driver rounds archived)
        "q27_approx_aggregates",  # approx-distinct — q44 HLL + q48 KMV
        # + q49 Bloom now carry the sketch driver rows
        "q30_merge_upsert",  # MERGE — q51 SCD2 exercises the same
        # merge machinery with a richer contract (2 green rounds)
        "q32_unpivot_measures",  # reshape — q31 keeps the set-op/
        # reshape driver row (2 green driver rounds archived)
        "q39_salted_hot_keys",  # skew salting demo — q41's bucketed
        # join keeps the join-strategy driver row (2 green rounds)
        "s02_knn_sign_bucket",  # LSH ANN tier — s01 brute-force and
        # s04 IVF keep the similarity driver rows; s07 PQ rotates in
        "t02_quality_scores",  # heuristic quality — t18's learned
        # classifier takes the quality driver row; t01 keeps lang-id
        "t03_token_stats",  # token aggs — t05 keeps the token-stats
        # driver row (2 green driver rounds archived)
        "t04_fingerprints",  # fingerprint scalars — d03/t05 keep the
        # hashing driver rows (2 green driver rounds archived)
        "t07_weighted_sample",  # weighted sampling — t06 keeps the
        # md5-gate sampling driver row; q55 (experiment gates) joins
        # Round-6 WINDOW ROTATION (VERDICT r5 item 1): all 16 round-5
        # additions promoted for their FIRST driver rows (d14-d16,
        # s08/s09, t26/t28-t30, q60/q61, p06-p08, m06) plus q52; the 16
        # slots come from these retirees, each with >= 2 archived green
        # driver rounds and an in-window family representative:
        "d06_training_corpus_pipeline",  # composes d01+d03+t06 — d01
        # (exact) and d03 (minhash) keep the dedup driver rows; 5
        # green driver rounds archived (r1-r5)
        "d08_embedding_neardup_dedup",  # sign-LSH+CC near-dup — d07
        # keeps the CC driver row, d16 the embedding-dedup scale path;
        # 3 green rounds archived (r3-r5)
        "m01_media_manifest",  # media manifest scan — m02 (header
        # decode) and m06 (perceptual dedup) carry the multimodal
        # driver rows; 3 green rounds archived (r3-r5)
        "p03_integration_connector",  # Python DataSource read — p01/
        # p02 keep the §2.A pipeline driver rows and p06 drives the
        # same integration-source manifest machinery; 2 green rounds
        "q04_order_priority_semi",  # semi-join — q03 keeps the
        # join+agg+topk driver row; 5 green rounds archived
        "q07_top_suppliers_per_nation",  # per-group extreme window —
        # q58's per-series windows keep the family; 5 green rounds
        "q17_price_band_range_join",  # range join — q21 keeps the
        # as-of/range driver row, q52 adds point-in-time; 5 greens
        "q24_json_props",  # JSON scalar suite — q61's SQL-text row
        # exercises scalar expressions; locally checked; 5 greens
        "q29_order_window_suite",  # window-function suite — q58/q60
        # keep windowed driver rows; 5 green rounds archived
        "q31_multiset_ops",  # set ops + multiset — locally checked;
        # q61 keeps subquery set semantics in-window; 5 greens
        "s01_knn_cosine_bruteforce",  # flat exact top-k — s04 (IVF),
        # s07 (PQ), s08 (range), s09 (hard-neg) carry similarity; 5
        "t05_token_frequencies",  # token aggs — t29's BM25 carries
        # the token-stats/retrieval driver row; 3 green rounds
        "t06_stratified_sample",  # md5-gate sampling — t26's
        # temperature mix takes the sampling driver row; 3 greens
        "t10_normalize_redact",  # regex normalize/PII — locally
        # checked; t01 keeps the no-UDF text driver row; 2 greens
        "t13_shard_manifest",  # md5-bucket sharding — locally
        # checked (d09 composes it too); 2 green rounds archived
        "t14_sequence_packing",  # prefix-sum packing — t21 (padding
        # waste) keeps the packing-family driver row; 3 greens
        # Slots for the two NEW round-6 rows (p09 scheduler ledger,
        # q62 SQL-text dedup) so new surface lands WITH driver
        # evidence instead of growing the never-checked backlog:
        "q18_sessionize",  # gaps-and-islands sessionize — q58 (per-
        # series windows) and q60 (sliding rollup) keep the time-
        # series driver rows; 5 green rounds archived (r1-r5)
        "q21_asof_join",  # as-of join — q52's point-in-time SCD2
        # lookup keeps as-of semantics in-window; 5 greens archived
        "q03_shipping_priority",  # join+agg+topk — q41 keeps the
        # join driver row, q01 rich aggs, t29 top-k; slot goes to the
        # NEW m07 (real PCM sample decode); 5 greens archived
        "t11_decontamination",  # train/eval decontamination — d14's
        # leakage-safe splits keep the family in-window (t22 local);
        # slot goes to the NEW p10 (TTL/redelivery ledger); 3 greens
        "d01_exact_dedup_groups",  # digest-groupBy exact dedup —
        # q62 (SQL-text dedup) and d15 (canonical keeper) keep the
        # exact-dedup family in-window; slot goes to the NEW s10
        # (integer-exact PCA power iteration); 5 greens archived
        "d07_dedup_clusters",  # batch CC clusters — p08 (incremental
        # CC, driver row this round) and d14 (CC-atomic splits) keep
        # the connected-components family in-window; slot goes to the
        # NEW q63 (native session_window); 5 greens archived
        "q40_recursive_month_spine",  # WITH RECURSIVE spine — t16
        # (BPE iterations) and s10 (power iteration) keep iterative
        # driver rows; slot goes to the NEW p11 (backoff/throttle
        # curves); 3 greens archived
        "s04_knn_ivf",  # IVF ANN — s07 (PQ), s08 (range), s09 (hard
        # negatives), s10 (PCA) keep similarity in-window and s05
        # keeps the IVF shape locally checked; slot goes to the NEW
        # p12 (format round-trip matrix); 4 greens archived
        # NEW round-6 query without a window slot (50 full after the
        # eight r6 promotions): locally oracle-checked; FIRST in line
        # for the r7 rotation.
        "q44_hll_shard_rollup",  # HLL union-at-query — q60 (sliding
        # HLL rollup), p05 (streaming HLL maintenance) and the
        # q46-q49 sketch suite keep the family in-window; 2 greens
        "q51_scd2_history",  # SCD2 build — q52 (point-in-time SCD2
        # join, first driver row this round) and p07 (streaming CDC
        # to SCD2) keep the family in-window; 2 greens archived
        # Round-7 WINDOW ROTATION (VERDICT r6 item 3): promote the 16
        # never-driver-checked entries the verdict named (p13, p16,
        # m08, t31, q64, p04 — post filterPushdown fix — q42, q43,
        # q45, q54, q57, q59, m03, m04, m05, s06) plus a slot for the
        # NEW p17 queue-rollup ledger. The 17 retirees below each have
        # >= 2 archived green driver rounds and an in-window family
        # representative. One substitution vs the verdict's list: d11
        # (2 greens) retires instead of d15 (only 1 archived green —
        # the >= 2-greens retirement rule holds; d16 keeps the
        # semantic-dedup family in-window and d15 keeps canonical
        # selection accumulating evidence).
        "q46_cms_heavy_hitters",  # CMS sketch — q60/p05 keep the
        # sketch family in-window; 2 greens archived (r5, r6)
        "q47_quantile_sketch",  # log2-histogram quantiles — q60/p05
        # keep sketches in-window; 2 greens archived (r5, r6)
        "q48_kmv_set_sketch",  # KMV distinct/overlap — q60/p05 keep
        # sketches in-window; 2 greens archived (r5, r6); slot goes
        # to the NEW p17 (logical queue rollup + stats EMA ledger)
        "q49_bloom_runtime_filter",  # Bloom semi-join filter — q41
        # keeps the join-strategy row; 2 greens archived (r5, r6)
        "q50_zorder_skipping",  # z-order layout/skipping — q54
        # (zonemap pruning, promoted) keeps the layout family; 3
        # greens archived (r4-r6)
        "q53_mad_outliers",  # MAD anomaly gate — the promoted q59/
        # q42 event analytics keep robust-stats queries in-window; 2
        # greens archived (r5, r6)
        "q55_ab_experiment",  # A/B + SRM gates — t26 (temperature
        # mix) keeps sampling/experiment gates in-window; 2 greens
        "q56_integer_ols_trend",  # integer OLS trend — s10 (PCA
        # power iteration) keeps integer-exact linear algebra; 2
        "q58_gap_fill_interpolate",  # resample/gap-fill — q63
        # (session windows) + q60 keep time-series in-window; 2
        "d03_minhash_lsh_pairs",  # MinHash+LSH — d13 retires but
        # d14/d16 + p08's streaming LSH keep dedup in-window; 6
        # greens archived (r1-r6), the registry's most-evidenced row
        "d11_semantic_dedup",  # embedding cosine near-dup — d16
        # (two-level SemDeDup) keeps the family in-window; 2 greens
        "d12_snapshot_diff",  # corpus diff — p06 (time travel, must
        # re-green this round) keeps corpus versioning in-window; 2
        "d13_exact_substring_repeats",  # Lee-et-al boilerplate —
        # d15 (canonical selection) + q62 keep exact-dedup; 2 greens
        "t01_language_id",  # n-gram lang-id — t28 (bigram surprisal)
        # + t31 (NFC, promoted) keep the text family; 5 greens
        "t16_bpe_merges",  # BPE training — t29/t30 keep token-stats
        # in-window; t17 encoding stays locally checked; 3 greens
        "t18_quality_classifier",  # hashing-trick classifier — t28
        # keeps the quality-scoring family in-window; 2 greens
        "m02_media_header_decode",  # header decode — m03/m04
        # (audio/video headers, promoted) + m06-m08 keep multimodal
        # in-window; 2 greens archived (r5, r6)
        # Slot for the NEW round-7 p18 (watermarked stream-stream
        # join — the one streaming operator category without a row):
        "p05_streaming_sketch_rollup",  # foreachBatch sketch
        # maintenance — p07 (CDC/SCD2) and p08 (incremental CC) keep
        # the foreachBatch-maintenance family in-window, q60/q46-q48
        # archived rows keep sketches evidenced; 2 greens (r5, r6)
        # Slots for the NEW round-7 q65 (native DataSketches
        # HLL/theta/bitmap stack) and q66 (native LISTAGG, SQL text):
        "q41_bucketed_colocated_join",  # bucketed zero-exchange join
        # — q52/q57/q61/p18 keep join strategies in-window and the
        # bucketing tests stay; 3 greens archived (r4-r6)
        "s07_pq_adc_topk",  # PQ/ADC ANN — s06/s08/s09/s10 keep the
        # similarity family in-window; 2 greens archived (r5, r6)
        # Round-8 ENDGAME ROTATION (VERDICT r7 item 1): promote the
        # last 14 never-driver-checked entries (d09, d10, s05, t08,
        # t09, t12, t15, t17, t19, t20, t22, t23, t24, t25) so every
        # registry entry has >= 1 archived driver-green row. The 14
        # retirees below each have >= 2 archived green driver rounds
        # and an in-window family representative:
        "q01_pricing_summary",  # rich aggs — q64 (collated agg) and
        # q65 (native sketch rollup) keep aggregation in-window; 7
        # greens archived (r1-r7), the registry's most-evidenced row;
        # still the entry() flagship smoke query
        "d14_split_assignment",  # leakage-safe splits — promoted t22
        # (source-overlap contamination matrix) + in-window d15 keep
        # decontamination/dedup; 2 greens archived (r6, r7)
        "d16_semantic_dedup_two_level",  # embedding near-dup — d10
        # (incremental LSH near-dup, promoted) + s06 (int8 embedding
        # ops) keep the family; 2 greens archived (r6, r7)
        "s08_range_search",  # radius search — s05 (IVF multiprobe,
        # promoted) + s06/s10 keep similarity in-window; 2 greens
        "s09_hard_negatives",  # hard-negative mining — s05/s06/s10
        # keep similarity in-window; 2 greens archived (r6, r7)
        "t26_temperature_mix",  # temperature sampling — t15 (source
        # mix) + t25 (mix drift), both promoted, keep sampling/mixing
        # in-window; 2 greens archived (r6, r7)
        "t28_bigram_surprisal",  # LM surprisal — t19 (unigram
        # surprisal, promoted) keeps the family; 2 greens (r6, r7)
        "t29_bm25_retrieval",  # BM25 — t23 (inverted-index term
        # retrieval, promoted) keeps retrieval; 2 greens (r6, r7)
        "t30_ngram_novelty",  # n-gram novelty — t09 (collocations) +
        # t12 (repetition), both promoted, keep n-gram statistics
        # in-window; 2 greens archived (r6, r7)
        "q60_sliding_distinct_rollup",  # sliding HLL windows — q65
        # (native sketch stack) + q63 (session windows) keep
        # sketch/window aggs in-window; 2 greens archived (r6, r7)
        "q61_sql_correlated_subquery",  # SQL-text subqueries — q66
        # (listagg report) keeps the SQL-text surface; 2 greens
        "q62_sql_text_dedup",  # SQL-text dedup — q66 keeps SQL-text,
        # d15 keeps exact-dedup canonical selection; 2 greens
        "t21_padding_waste",  # batch shaping — t08 (token chunking,
        # promoted) keeps chunking/packing in-window; 3 greens
        "m06_perceptual_neardup",  # perceptual hash dedup — m03/m04/
        # m05/m07/m08 keep multimodal in-window; 2 greens (r6, r7)
        # Slot for the NEW round-8 p19 (schema-evolution round-trip
        # through the Avro records zone — declared-schema writes +
        # spec Schema Resolution reads), so the new surface lands
        # WITH driver evidence:
        "q52_temporal_scd2_join",  # point-in-time SCD2 join — p07
        # (streaming CDC->SCD2) keeps the SCD2 family in-window,
        # q21/q51 archived keep as-of/temporal joins evidenced; 2
        # greens archived (r6, r7)
        # Slot for the NEW round-8 p20 (watermarked stream-stream
        # LEFT OUTER join — null emission on watermark-proven expiry,
        # sentinel-forced flush), so the new surface lands WITH
        # driver evidence:
        "q63_session_window_native",  # native session_window — 2
        # greens archived (r6, r7); the window-function family stays
        # in-window via q42/q43/q59, native-feature surfaces via
        # q64/q65/q66
        # Slot for the NEW round-8 q67 (frontier recursion: multi-
        # chain hierarchy walk + capped-accumulator fold), so the new
        # surface lands WITH driver evidence:
        "d15_canonical_selection",  # exact-dedup canonical pick — 2
        # greens archived (r6, r7); dedup family stays in-window via
        # d09 (export manifest) and d10 (incremental neardup)
        # Slot for the NEW round-8 p21 (stream-static broadcast
        # enrichment — the stateless streaming-join path), so the new
        # surface lands WITH driver evidence:
        "m07_audio_pcm_features",  # WAV PCM features — 2 greens
        # archived (r6, r7); multimodal stays in-window via
        # m03/m04/m05/m08
        # Slot for the NEW round-8 p22 (data-quality gate: planted
        # PK/FK/null/range/enum violations over a corrupted staged
        # copy), so the new surface lands WITH driver evidence:
        "s10_pca_power_iteration",  # iterative PCA — 2 greens
        # archived (r6, r7); similarity stays in-window via s05
        # (IVF multiprobe) and s06 (int8 quantization)
        # Slot for the NEW round-8 p23 (checkpoint resume across a
        # stream restart — state survival + batch-id continuation),
        # so the new surface lands WITH driver evidence:
        "p09_scheduler_priority_ledger",  # priority drain ledger —
        # 2 greens archived (r6, r7); the scheduler control plane
        # stays in-window via p10/p11/p14/p17
        # Slot for the NEW round-8 p24 (native streaming session
        # windows — the merging-session state operator), so the new
        # surface lands WITH driver evidence:
        "p10_ttl_redelivery_ledger",  # TTL/dead-letter/redelivery —
        # 2 greens archived (r6, r7); the broker control plane stays
        # in-window via p11 (backoff/throttle), p14 (delegation),
        # p17 (queue rollup)
        # Slot for the NEW round-8 p25 (connector streaming loop:
        # task-log stream source -> per-epoch manifest sink over one
        # checkpoint), so the new surface lands WITH driver evidence:
        "p01_ingestion_pipeline",  # full engine run — 7 greens
        # archived (r1-r7); the engine-run family stays in-window via
        # p02 (raw path), and the driver still smoke-runs entry()
        # (which IS p01's flagship shape) every round
        # Slot for the NEW round-8 p26 (chained stateful operators:
        # stream-stream join feeding a windowed aggregation in one
        # query), so the new surface lands WITH driver evidence:
        "p11_backoff_throttle_curves",  # Gompertz/token-bucket —
        # 2 greens archived (r6, r7); the scheduler control plane
        # stays in-window via p14 (delegation) and p17 (rollup)
        # Slot for the NEW round-8 p27 (state-store introspection:
        # the state data source reading a checkpoint back, with
        # batchId time travel), so the new surface lands WITH driver
        # evidence:
        "p12_format_roundtrips",  # six-format write/read matrix —
        # 2 greens archived (r6, r7); formats stay in-window via
        # p19 (Avro schema evolution) and the records zone in p02
        # Slot for the NEW round-8 t32 (Python UDTF: table-function
        # fan-out via LATERAL), so the new surface lands WITH driver
        # evidence:
        "p14_delegation_affinity_ledger",  # delegation/affinity —
        # 2 greens archived (r6, r7); the scheduler control plane
        # stays in-window via p17 (queue rollup + EMA)
        # Slot for the NEW round-8 q68 (LATERAL table subquery —
        # the decorrelated correlated-FROM surface), so the new
        # surface lands WITH driver evidence:
        "p07_streaming_scd2_cdc",  # streaming SCD2 maintenance —
        # 2 greens archived (r6, r7); streaming maintenance sinks
        # stay in-window via p08 (incremental CC, changed this round)
        # Round-9 ROTATION (VERDICT r8 item 1): the four reserved r8
        # slots (q69 AQE skew join, q70 WindowGroupLimit, p28
        # rebalance write, q71 SQL pipe syntax) promote for their
        # FIRST driver rows. The four retirees below each have 2
        # archived green driver rounds (r7, r8) and an in-window
        # family representative:
        "m04_video_header_decode",  # video header decode — m08
        # (video frame sample) keeps video+mapInPandas decode and
        # m03 keeps header decode in-window; 2 greens (r7, r8)
        "m05_fused_features",  # multimodal fusion join — m03/m08
        # keep multimodal in-window, q57 keeps joins; 2 greens
        "q43_conversion_funnel",  # batch funnel — p15 (streaming
        # funnel) keeps funnel/sequence semantics in-window, q42
        # keeps event analytics; 2 greens (r7, r8)
        "q59_month_over_month",  # lag/period-over-period — q42
        # (cohort windows) and the promoted q70 (WindowGroupLimit)
        # keep window functions in-window; 2 greens (r7, r8)
        # Slot for the NEW round-9 q72 (q67's depth-independent
        # scale twin: customer-keyed shuffle + in-partition
        # sequential fold via mapInPandas, pinned to the identical
        # recursion oracle), so the new surface lands WITH driver
        # evidence:
        "q64_collated_aggregation",  # native collation agg — 2
        # greens archived (r7, r8); scalar/semi-structured stays
        # in-window via q45 (VARIANT), aggregation via q65 (native
        # sketch stack), SQL-text via q66/q68/q71
        # Slot for the NEW round-9 p29 (parquet schema drift:
        # mergeSchema over one zone holding two schema generations —
        # the non-Avro evolution twin), so the new surface lands
        # WITH driver evidence:
        "m03_audio_header_decode",  # WAV header decode — 2 greens
        # archived (r7, r8); multimodal stays in-window via m08
        # (AVI chunk-walk frame sampling), m05/m07 archived
        # Slot for the NEW round-9 s11 (truncated-embedding
        # retrieval agreement — the Matryoshka prefix-scan quality
        # gate), so the new surface lands WITH driver evidence:
        "s06_int8_quantization",  # int8 quantization stats — 2
        # greens archived (r7, r8); similarity stays in-window via
        # s05 (IVF multiprobe) and the new s11
        # Slot for the NEW round-9 q73 (dynamic partition pruning
        # proven in-plan — the runtime data-skipping path), so the
        # new surface lands WITH driver evidence:
        "q54_zonemap_pruning",  # zonemap file pruning — 2 greens
        # archived (r7, r8); data-skipping stays in-window via q73
        # (runtime DPP) and p28 (write shaping), q50 archived
        # Slot for the NEW round-9 p30 (RocksDB state backend
        # end-to-end — the production state provider + statestore
        # read-back), so the new surface lands WITH driver evidence:
        "p13_streaming_dropdup",  # native stateful dropDuplicates —
        # 2 greens archived (r7, r8); streaming dedup stays
        # in-window via p16 (withinWatermark) and p23 (checkpoint
        # resume), and p30 carries stateful aggregation
        # Slot for the NEW round-9 q74 (injected runtime Bloom
        # filter proven in-plan — the row-level runtime-filter
        # twin of q73's DPP), so the new surface lands WITH driver
        # evidence:
        "q66_listagg_report",  # native listagg — 2 greens archived
        # (r7, r8); the SQL-text surface stays in-window via q68
        # (LATERAL) and q71 (pipe syntax); q57 keeps the q5x
        # interval-join rep in-window
        # Slot for the NEW round-9 p31 (GDPR erasure vs time travel
        # — every retained snapshot re-stamped), so the new surface
        # lands WITH driver evidence:
        "p04_integration_sink_roundtrip",  # connector batch write —
        # 2 greens archived (r7, r8); the connector/manifest family
        # stays in-window via p06 (time travel), p25 (streaming
        # sink loop) and p31 (erasure over the same zone machinery)
        # Slot for the NEW round-9 q75 (globally-sorted range-shard
        # export, disjointness proven from committed footers), so
        # the new surface lands WITH driver evidence:
        "p18_stream_stream_join",  # watermarked inner join — 2
        # greens archived (r7, r8); stream-stream stays in-window
        # via p20 (outer join) and p26 (chained stateful rollup)
        # Slot for the NEW round-9 p32 (the native parquet stream
        # sink's _spark_metadata exactly-once log, orphan-file
        # invariant), so the new surface lands WITH driver evidence:
        "p06_manifest_time_travel",  # manifest time travel — 3+
        # greens archived (r6-r8); the manifest family stays
        # in-window via p25 (streaming epoch manifests) and p31
        # (erasure re-stamping every retained snapshot)
        # Round-10 ROTATION: four NEW rows (q76 join-hint matrix, q77
        # applyInArrow grouped regression, q78 CBO join reorder, p33
        # multi-watermark union) land WITH driver slots; the four
        # retirees below each have >= 2 archived green driver rounds
        # and an in-window family representative:
        "t25_source_drift",  # per-source drift profile — 2 greens
        # archived (r8, r9); sampling/mixing/drift stays in-window
        # via t15 (source mix); the slot funds q76 (hint matrix),
        # which joins q57/q69/q78 as the window's join coverage
        "t32_udtf_chunk_explode",  # Python UDTF — 2 greens archived
        # (r8 ×2 drives); the Python-UDF surface stays in-window via
        # q72 (mapInPandas), q77 (applyInArrow), t31 (pandas_udf),
        # p15 (applyInPandasWithState); t08 keeps chunking
        "p21_stream_static_enrichment",  # stream-static join — 2
        # greens archived (r8, r9); streaming joins stay in-window
        # via p20 (stream-stream outer) and p26 (chained stateful);
        # p33 adds the multi-input union surface
        "q68_lateral_table_subquery",  # LATERAL subquery — 2 greens
        # archived (r8, r9); the SQL-text family stays in-window via
        # q66 (listagg), q67 (recursion), q71 (pipe syntax)
        # Slot for the NEW round-10 p34 (malformed-record policy:
        # PERMISSIVE quarantine / DROPMALFORMED / FAILFAST over a
        # deterministically-corrupted JSONL zone), so the new surface
        # lands WITH driver evidence:
        "t24_vocab_coverage",  # vocab coverage curves — 2 greens
        # archived (r8, r9); tokenizer training stays in-window via
        # t17 (BPE encoding); t16 archived
        # Slot for the NEW round-10 p35 (late-data accounting:
        # numRowsDroppedByWatermark pinned exact, with the SPARK-42376
        # one-batch late-filter lag measured and documented), so the
        # new surface lands WITH driver evidence:
        "p19_schema_evolution_roundtrip",  # Avro declared-schema
        # round-trip + resolution — 2 greens archived (r8, r9);
        # schema evolution stays in-window via p29 (parquet
        # mergeSchema drift); the Avro write/read path itself stays
        # via p02/p04 and the golden + property suites
        # Slot for the NEW round-10 q79 (AQE partition coalescing
        # proven in-plan — the tiny-task leg of the runtime
        # re-planning ladder), so the new surface lands WITH driver
        # evidence:
        "t09_bigram_collocations",  # PMI collocations — 2 greens
        # archived (r8, r9); text statistics stay in-window via t19
        # (surprisal), t20 (TextRank), t23 (retrieval)
        # Slot for the NEW round-10 p36 (RocksDB changelog
        # checkpointing: per-batch O(delta) uploads, recovery by
        # snapshot+changelog replay proven by restart), so the new
        # surface lands WITH driver evidence:
        "t12_repetition_signals",  # repetition/quality signals — 2
        # greens archived (r8, r9); quality stays in-window via t19
        # (surprisal) and t18/t28/t30 archived
        # Slot for the NEW round-10 q80 (nested schema pruning:
        # one-leaf ReadSchema asserted from the executed scan), so
        # the new surface lands WITH driver evidence:
        "t22_source_overlap",  # cross-source shingle overlap — 2
        # greens archived (r8, r9); decontamination stays in-window
        # via d14 (leakage-safe splits)
        # Slot for the NEW round-10 p37 (state-schema freeze guard:
        # STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE pinned fail-loud,
        # original shape resumes; zero-batch latency of the check
        # measured and documented), so the new surface lands WITH
        # driver evidence:
        "t20_textrank_keywords",  # TextRank keywords — 2 greens
        # archived (r8, r9); token statistics / retrieval stays
        # in-window via t23 (inverted-index ranking)
        # Round-11 ROTATION: three NEW rows (p38 checkpoint-evolution
        # backfill, s12 incremental IVF maintenance, p39 streaming
        # point-in-time SCD2 enrichment — VERDICT r10 items 1-3) land
        # WITH driver slots; the ten r10 rows (q76-q80, p33-p37) stay
        # in-window for their second driver green (VERDICT item 4).
        # The three retirees below each hold >= 2 archived green
        # driver rounds and leave an in-window family representative:
        "q57_interval_bin_join",  # interval/bin join — 4 greens
        # archived (r7-r10); the join surface stays in-window via
        # q69 (AQE skew), q74 (runtime bloom), q76 (hint matrix),
        # q78 (CBO reorder); as-of/range joins archived via q56/q58
        "q42_retention_cohorts",  # retention cohort windows — 4
        # greens archived (r7-r10); window functions stay in-window
        # via q70 (WindowGroupLimit); streaming retention via p24
        "p16_dropdup_within_watermark",  # native withinWatermark
        # dedup — 4 greens archived (r7-r10); streaming dedup stays
        # in-window via p23 (checkpoint-resumed ingest dedup); p13
        # archived with 2 greens
        # Slot for the NEW round-11 d17 (random-projection sign-LSH
        # near-dup — the measured bucket-space scale path past d08's
        # raw-component ceiling, full machinery mirrored in SQL), so
        # the new surface lands WITH driver evidence:
        "q45_variant_ingestion",  # VARIANT ingestion — 4 greens
        # archived (r7-r10); semi-structured ingestion stays in-window
        # via p34 (malformed-record JSONL policy with in-scan
        # quarantine); the scalar/JSON surface keeps q71 (pipe
        # syntax) in-window, q24/q66 archived
        # Slot for the NEW round-11 s13 (streaming IVF admission —
        # continuous drift-gated index maintenance, the streaming twin
        # of s12), so the new surface lands WITH driver evidence:
        "s05_knn_ivf_multiprobe",  # IVF multiprobe query — 3 greens
        # archived (r8-r10); the IVF surface stays in-window via s12
        # (persisted-index maintenance) and s13 (streaming admission);
        # s04/s05/s07 query variants archived with >= 2 greens each
        # Slot for the NEW round-11 s14 (incremental PQ codebook
        # maintenance — the codes-side persisted index completing the
        # s12/s13 pair, per-subspace drift gate), so the new surface
        # lands WITH driver evidence:
        "s11_truncated_retrieval",  # Matryoshka truncation agreement
        # — 2 greens archived (r9, r10); the similarity family stays
        # in-window via s12/s13/s14 (index maintenance) and d17
        # (projection banding); retrieval-quality gates archived
        # Slot for the NEW round-11 q81 (maxRecordsPerFile proven
        # exact from committed footers — the writer-side file-size
        # cap completing p28's partition-side REBALANCE), so the new
        # surface lands WITH driver evidence:
        "q67_recursive_chain_fold",  # per-iteration recursion — 3
        # greens archived (r8-r10); the recursive-fold family stays
        # in-window via q72 (the value-pinned depth-independent scale
        # twin, the documented 100 TB path)
        # Slot for the NEW round-11 q82 (DataFrame.observe in-flight
        # metrics — the zero-extra-cost tier of the quality story),
        # so the new surface lands WITH driver evidence:
        "p22_data_quality_gate",  # row-level constraint gate — 3
        # greens archived (r8-r10); the quality story stays in-window
        # via q82 (in-flight audit) and p34 (ingest-policy
        # quarantine); the deliberate-validation-pass shape archived
        # Round-12 ROTATION: two NEW rows (s15 persisted-IVF query —
        # the read path s12/s13 built the write path for, VERDICT r11
        # item 1 — and s16 IVF-PQ residual search, VERDICT item 6)
        # land WITH driver slots; the eight r11 single-green rows
        # (p38, p39, s12, s13, s14, d17, q81, q82) stay in-window for
        # their second driver green (VERDICT item 5). The two retirees
        # below each hold 2 archived green driver rounds (r10, r11)
        # and leave in-window family representatives:
        "q76_join_hint_matrix",  # join-hint matrix — 2 greens
        # archived (r10, r11); the join-strategy surface stays
        # in-window via q69 (AQE skew), q74 (runtime bloom), q78
        # (CBO reorder)
        "q79_aqe_coalesce_partitions",  # AQE partition coalescing —
        # 2 greens archived (r10, r11); runtime re-planning stays
        # in-window via q69 (AQE skew join) and q73 (DPP); write
        # shaping via p28/q81
        # Slot for the NEW round-12 s17 (streaming IVF-PQ admission —
        # the composed index's lifecycle closed, incremental
        # per-subspace fold from the start), so the new surface lands
        # WITH driver evidence:
        "p27_state_store_introspection",  # statestore read-back — 4
        # greens archived (r8-r11); state introspection stays
        # in-window via p30 (RocksDB backend + statestore reads),
        # p36 (changelog recovery), p38 (evolution backfill verified
        # through statestore reads on both checkpoints)
        # Slot for the NEW round-12 q83 (file-level Bloom-index
        # skipping — the point-lookup tier of the data-skipping
        # ladder, candidate set replayed FP-exact by the oracle), so
        # the new surface lands WITH driver evidence:
        "p28_rebalance_write",  # REBALANCE write shaping — 3 greens
        # archived (r9-r11); write shaping stays in-window via q81
        # (maxRecordsPerFile footer proof); q75 sorted export and
        # p32 native sink archived with >= 2 greens each
        # Round-12 third wave: three slots for t33 (Gopher repetition
        # filters), p40 (streaming Bloom-manifest admission) and s18
        # (IVF-PQ search under admission); each retiree has >= 4
        # archived green driver rounds and an in-window family rep:
        "t19_unigram_surprisal",  # surprisal — 4 greens (r8-r11);
        # the text-quality family keeps t33 (repetition) + t15/t17/
        # t23/t31 in-window, t28 bigram surprisal archived
        "p15_streaming_funnel",  # streaming funnel — 6 greens
        # (r6-r11); watermark-bounded stateful streaming stays via
        # p24 session windows + p20/p26/p33/p35
        "d10_incremental_neardup",  # incremental neardup — 4 greens
        # (r8-r11); the dedup family keeps d09 + d17 in-window,
        # d01/d03/d08/d16 archived
        # Round-12 fourth wave: two slots for q85 (merge-on-read
        # deletion vectors) and s19 (metadata-filtered ANN):
        "q65_native_sketch_rollup",  # native DataSketches — 5 greens
        # (r7-r11); the sketch family keeps q83/p40 bloom manifests
        # in-window, q44/q47/q48/q49/q65 archived
        "p08_streaming_incremental_cc",  # incremental CC — 6 greens
        # (r6-r11); CC semantics stay via d17 (banded pairs → CC) and
        # the archived d08/d11/d16 family; p0 control-plane keeps p02
        # Round-12 fifth wave: one slot for p41 (streaming deletes
        # into deletion vectors — the new family's streaming member):
        "p20_stream_stream_outer_join",  # stream-stream ± outer —
        # 4 greens (r8-r11); the family keeps p26 chained stateful
        # in-window, p18/p19/p21 archived
        # Round-12 sixth wave: one slot for d18 (cross-document
        # boilerplate removal — the rewrite tier of Lee et al.):
        "t15_source_mix",  # sampling/mixing — 4 greens (r8-r11);
        # the family keeps t06/t07/t26/q55 archived and the t-prefix
        # stays via t17/t23/t31/t33
        # Round-12 eighth wave: one slot for s20 (margin-based bitext
        # mining — the LASER/CCMatrix parallel-pair rule):
        "t08_token_chunks",  # chunking/packing — 4 greens (r8-r11);
        # the family is archived-deep: t14/t21 (4+ greens) and t32
        # (2 greens, retired r11)
        # Round-12 ninth wave: one slot for s21 (IVF-bucketed margin
        # mining — the scale form of s20):
        "t23_term_retrieval",  # token retrieval — 4 greens (r8-r11);
        # retrieval is archived-deep: t29 BM25 (3 greens, retired
        # r11) + t23's own 4
        # Round-12 tenth wave: one slot for t34 (unigram-LM Viterbi
        # segmentation — the SentencePiece half of tokenizer training):
        "t17_bpe_encoding",  # BPE encode — 4 greens (r8-r11); the
        # tokenizer family keeps its NEW member t34 in-window, t16
        # (BPE train) + t17 archived
        # Round-12 eleventh wave: one slot for t35 (NB quality-
        # classifier TRAINING — the gap next to t18's frozen weights):
        "p17_queue_rollup_ledger",  # control-plane ledgers — 5
        # greens; the family's p09/p10/p11/p14 are all archived (the
        # deepest archive of any family; ledger bookkeeping is the
        # least live surface in the window)
        # Round-12 twelfth wave: one slot for p42 (streaming NB model
        # refresh — t35's trainer folded per trigger):
        "p23_stream_checkpoint_resume",  # streaming ingestion dedup —
        # 4 greens (and the r12 host-floor A/B subject, fully
        # documented); p13/p16 archived, the stateful streaming
        # surface stays via p24/p26/p33/p35/p36/p38-p42
    }
)

DRIVER_MAX = 50


def driver_registry() -> dict[str, Query]:
    """The curated, driver-facing slice of the registry (≤ DRIVER_MAX).

    Every operator family from SURVEY.md §2 must keep a representative
    here, because only these entries get driver CORRECTNESS rows.
    """
    full = load_all()
    out = {n: q for n, q in sorted(full.items()) if n not in DRIVER_RETIRED}
    if len(out) > DRIVER_MAX:
        over = list(out)[DRIVER_MAX:]
        raise RuntimeError(
            f"driver-facing registry exceeds {DRIVER_MAX} queries; "
            f"entries past the driver's check window: {over}. "
            "Retire a redundant variant in DRIVER_RETIRED."
        )
    return out


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(
            name=name, spark_fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags
        )
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import all query modules (side effect: registry population)."""
    from hyppo_worker_spark.queries import (  # noqa: F401
        dedup_queries,
        multimodal_queries,
        pipeline_queries,
        relational,
        similarity_queries,
        text_queries,
    )

    return REGISTRY
