"""Query catalog registry.

Every engine query is registered once with:
- a Spark callable ``(spark, sf_dir) -> DataFrame``
- optionally, the equivalent ANSI SQL for the DuckDB oracle (driver
  correctness gate). Queries whose semantics are not SQL-expressible
  (LSH, ML scoring, streaming state) register with ``oracle=None`` and
  get a rows-only check — their correctness lives in tests/ instead.

Oracle-parity conventions (keep these or hashes diverge):
- Alias every computed column IDENTICALLY in Spark and SQL.
- Round every floating aggregate to 4 decimals on BOTH sides (summation
  order differs between engines; raw double sums never hash-match).
- Cast every HUGEINT-returning DuckDB aggregate (``SUM(int)``,
  ``count_if``, ...) to BIGINT to match Spark's long: pandas
  materializes HUGEINT as float64, and the driver's value hash is
  dtype-sensitive, so 1996 vs 1996.0 hash-differ (the r03
  ``rel_agg_bool_bit`` fail).
- Never emit raw timestamps: project dates via ``yyyy-MM-dd`` strings
  and timestamps via Unix-microsecond bigints on both sides.
- Rounded floats that can land near zero need ``+ 0.0`` on BOTH sides:
  engines disagree on whether a tiny negative rounds to -0.0 or 0.0,
  and the harness distinguishes signed zeros.
- When the data is fixed-decimal (prices/readings with 2 dp) and the
  aggregate's magnitude is large (>= ~1e9) or the result is an AVG,
  sum EXACT INTEGER CENTS — ``SUM(ROUND(x * 100)) / 100`` — with NO
  final round: integral doubles sum exactly in any partial-agg order,
  so both engines produce bit-identical results. A raw double sum's
  order-dependent error can exceed the 4-dp round at large magnitude,
  and ROUND itself diverges on exact .xxxx5 (Spark rounds the
  shortest-decimal string HALF_UP; DuckDB rounds the binary value).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None
    doc: str = ""
    bench: bool = False  # included in bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}

# The driver's per-round correctness harness compares the FIRST 50 queries in
# catalog order against the DuckDB oracle. Rounds 1 and 2 verified the names
# in ``_DRIVER_VERIFIED`` (hash-green or rows-only-by-contract) — see
# CORRECTNESS_r01.json / CORRECTNESS_r02.json. To get CORRECTNESS rows onto
# the rest of the catalog, ``all_queries()`` orders the catalog as:
#   1. ``_RECHECK_FIRST``   — prior-round failures / changed queries that must
#      re-verify (empty when nothing regressed or changed semantics)
#   2. ``_WINDOW_PRIORITY`` — curated not-yet-verified set packed to exactly
#      fill the 50-query window together with the rechecks
#   3. every other not-yet-verified query, in registration order
#   4. ``_DRIVER_VERIFIED`` — already green; rotated to the back
# Rotate newly-verified names into ``_DRIVER_VERIFIED`` each round until the
# whole catalog has driver rows. ``tools/check_window.py`` asserts the window
# arithmetic (len(_RECHECK_FIRST) + len(_WINDOW_PRIORITY) == 50, no overlap,
# no verified name inside the window without a recheck reason).
# The round this window layout was packed FOR (i.e. results of rounds
# < this are incorporated into _DRIVER_VERIFIED below). tools/
# check_window.py compares it against the driver's PROGRESS.jsonl round
# counter: a new round with a stale epoch fails the test suite until
# the previous round's CORRECTNESS names are rotated — the guard that
# the round-2 and round-3 verdicts asked for after two forgotten
# rotations.
_ROTATED_FOR_ROUND = 7

_RECHECK_FIRST: tuple[str, ...] = (
    # DRIVER-SCALE RE-RUN, NOT A REGRESSION. Round 6 had ZERO failures
    # (CORRECTNESS_r06.json: 48 hash-green + 2 rows-only by contract).
    # These 34 slots re-verify already-green queries at driver scale per
    # the round-6 verdict's task 1: the ML/ANN/dedup/multimodal set whose
    # prior driver rows were rows-only-by-contract (their correctness
    # lives in local recall/precision/equality gates; a fresh driver-scale
    # run keeps the rows-only evidence current after the round-6
    # exact-dup-collapse rewrite of the pair-generation operators), plus
    # the four queries whose DuckDB oracles were upgraded in round 6 to
    # CAST the float32 cosine to DOUBLE before ROUND (dedup_embedding_pairs,
    # sim_topk_bruteforce, sim_knn_batch, sim_hard_negatives — hash-green
    # r01/r03 under the OLD oracle text; fresh hash-green rows under the
    # byte-strict oracle are worth having).
    #
    # ANN / similarity search (rows-only by contract + local recall gates)
    "sem_dedup",
    "sim_ann_lsh",
    "sim_ivf_topk",
    "sim_pq_adc_topk",
    "sim_ivf_pq_topk",
    # float32→DOUBLE oracle upgrades from round 6 (hash oracles changed)
    "sim_topk_bruteforce",
    "sim_knn_batch",
    "sim_hard_negatives",
    "dedup_embedding_pairs",
    # dedup surface (round-6 exact-dup-collapse touched these paths)
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_banded",
    "dedup_clusters",
    # ML ops (rows-only by contract + local quantitative gates)
    "ml_als_recommend",
    "ml_cv_model_selection",
    "ml_kmeans_embeddings",
    "ml_isotonic_calibration",
    "ml_quality_classifier",
    "ml_survival_aft",
    # BPE + corpus ops
    "doc_bpe_vocab",
    "doc_bpe_encode",
    "doc_compression_ratio",
    "doc_dup_pagerank",
    "doc_stratified_sample",
    # multimodal rows
    "mm_feature_extract",
    "mm_resize",
    "mm_phash_neardup",
    # embedding analytics
    "emb_pca_whitening",
    "emb_pq_codes",
    # approx/sketch built-ins (epsilon-gated rows-only)
    "rel_approx_distinct",
    "rel_approx_quantile",
    "rel_hll_partial_merge",
    # streaming pipeline row (rows-only smoke at driver scale);
    # telemetry_score_500k stays rotated out — it re-earns evidence in
    # every round's BENCH_r{N}.json as a headline query.
    "telemetry_stream_roundtrip",
)

_WINDOW_PRIORITY: tuple[str, ...] = (
    # round-7 window: the 16 never-driver-checked names — the 12
    # late-round-5 experimentation/SQL-surface queries plus round 6's
    # four scale-safe metric rewrites — exactly as pre-planned in the
    # round-5/round-6 registry comments and the round-6 verdict. All 16
    # were independently judge-swept hash-green (rel_rfm_bucketed
    # rows-only by declared contract) at sf0.01 in round 6.
    # 34 rechecks + 16 = exactly one 50-slot window. After this round the
    # ENTIRE catalog has driver rows.
    #
    # ROUND-8+ STEADY-STATE POLICY (recorded per the r6 verdict's task 6):
    # once every catalog name has a driver row, the window stops chasing
    # coverage and becomes a ROTATING RECHECK: pack _RECHECK_FIRST with
    # (a) any query whose Spark plan or oracle text changed this round
    # (mandatory), then (b) the least-recently-driver-checked 50-name
    # slice of the catalog in age order (ties by registration order), so
    # the whole catalog re-earns driver evidence roughly every 6-7
    # rounds. New queries enter only to serve a real SURVEY §2.4 gap and
    # go to the front of the next window. sf0.1 sweeps via
    # tools/sweep_catalog.py remain the pre-commit gate for any
    # float-sensitive change.
    # Scale-safe metric rewrites (round 6)
    "ml_roc_auc_hist",
    "ml_lift_bucketed",
    "rel_abc_prefix2",
    "rel_rfm_bucketed",
    # Experimentation & ops meta-analytics (late round 5)
    "rel_cuped_adjustment",
    "rel_srm_check",
    "rel_experiment_mde",
    "rel_bootstrap_ci",
    "rel_proportions_ztest",
    "events_error_rate_wilson",
    "rel_skew_report",
    "rel_join_explosion_estimate",
    # SQL-surface completion (late round 5)
    "rel_offset_fetch_pagination",
    "rel_union_by_name_missing",
    "rel_null_ordering_rank",
    "ts_week_over_week",
    # round-7 addition (serves the r6 verdict's §2.3 gap list): the MQTT
    # 3.1.1 wire transport end-to-end as a driver query — publish via
    # per-partition QoS-1 connections, broker-route, spool, parse.
    "telemetry_mqtt_roundtrip",
)

_DRIVER_VERIFIED: tuple[str, ...] = (
    # round 6 (CORRECTNESS_r06.json): 48 hash-green + 2 rows-only by
    # contract (ml_cv_model_selection, rel_approx_quantile — both in the
    # declared oracle=None set), 0 failures. The two rows-only names sit
    # in the round-7 _RECHECK_FIRST block above, not here.
    "rel_rfm_segmentation",
    "rel_abc_classification",
    "rel_yoy_growth",
    "rel_cohort_ltv",
    "rel_percent_of_total",
    "rel_new_vs_returning",
    "rel_gini_coefficient",
    "rel_herfindahl_index",
    "rel_entropy_by_group",
    "rel_top_decile_ratio",
    "doc_js_divergence",
    "events_dau_stickiness",
    "events_interarrival_stats",
    "events_autocorr_lag1",
    "events_power_user_share",
    "events_weekday_profile",
    "events_cumulative_users",
    "events_hourly_heatmap",
    "ts_bollinger_bands",
    "ts_max_drawdown",
    "ts_xmr_control",
    "ts_naive_forecast_error",
    "doc_ttr",
    "doc_hapax_ratio",
    "doc_word_len_profile",
    "doc_shingle_uniqueness",
    "ml_roc_auc",
    "ml_lift_deciles",
    "ml_confusion_threshold",
    "ml_ndcg_at_k",
    "ml_brier_calibration",
    "ml_precision_at_k",
    "rel_pivot_multi_agg",
    "rel_collect_sorted_string",
    "rel_word_positions",
    "rel_reorder_gaps",
    "rel_date_spine_fill",
    "rel_weighted_avg_price",
    "rel_geo_harmonic_means",
    "rel_self_excluding_avg",
    "rel_json_props_stats",
    "rel_order_linecount_dist",
    "rel_grouping_id",
    "graph_degree_histogram",
    "graph_jaccard_pairs",
    "emb_norm_quantiles",
    "emb_simhash_bits",
    "emb_dim_variance_topk",
    # round 5 (CORRECTNESS_r05.json): 40 hash-green + 10 rows-only by
    # contract, 0 failures.
    "doc_dsir_importance",
    "doc_normalize_text",
    "doc_curriculum_order",
    "doc_token_budget_select",
    "doc_blocklist_filter",
    "doc_chunk_sliding",
    "doc_dataset_card",
    "doc_langid_confusion",
    "doc_zipf_slope",
    "dedup_incremental_batch",
    "emb_matryoshka_truncate",
    "emb_recall_eval",
    "events_activity_streaks",
    "events_state_spans",
    "events_last_touch_attribution",
    "events_time_to_convert",
    "events_ks_two_sample",
    "events_psi_drift",
    "rel_k_anonymity",
    "rel_ab_ttest",
    "rel_chi_square",
    "rel_benford_digits",
    "rel_cms_freq_estimate",
    "rel_equidepth_histogram",
    "rel_weighted_median",
    "rel_basket_pairs_lift",
    "rel_capped_running_balance",
    "rel_fifo_allocation",
    "ml_kaplan_meier",
    "ts_holt_linear",
    "rel_spatial_grid_join",
    "rel_record_linkage",
    "rel_snapshot_diff",
    "rel_delete_where_rewrite",
    "rel_sql_pipe",
    "rel_sql_udf",
    "rel_parameterized_sql",
    "rel_transpose",
    "src_bucketed_groupby",
    "mm_bytes_arrow",
    # round 4 (CORRECTNESS_r04.json): 43 hash-green + 6 rows-only by
    # contract. doc_dsir_importance (the 50th) was re-checked via
    # _RECHECK_FIRST in round 5, came back hash-green
    # (CORRECTNESS_r05.json), and now lives in the round-5 block above.
    "rel_agg_bool_bit",
    "doc_chunk_dedup",
    "doc_span_dedup",
    "doc_bm25_search",
    "doc_bigram_lm",
    "doc_char_entropy",
    "doc_curation_funnel",
    "doc_domain_mix_weights",
    "doc_ngram_novelty",
    "doc_stable_sample",
    "doc_vocab_growth",
    "emb_coreset_per_label",
    "events_retention_cohorts",
    "events_funnel_steps",
    "events_mad_outliers",
    "events_markov_transitions",
    "events_top_paths",
    "events_rolling_active_users",
    "rel_pareto_cumshare",
    "ts_stl_decompose",
    "ts_cusum_changepoint",
    "ts_interpolate_linear",
    "ts_mtbf_stats",
    "ts_seasonal_hour_profile",
    "ts_resample_ohlc",
    "ts_ewma_last",
    "rel_changelog_apply",
    "rel_dq_expectations",
    "src_bucketed_join",
    "src_dynamic_overwrite",
    "src_schema_evolution",
    "src_csv_quarantine",
    "src_compaction",
    "rel_zorder_key",
    "rel_window_ignore_nulls",
    "rel_regexp_funcs",
    "rel_mode_per_group",
    "rel_count_distinct_multi",
    "rel_session_window_builtin",
    "rel_incremental_agg_refresh",
    "rel_observe_metrics",
    "rel_heavy_hitters",
    "graph_triangle_count",
    # round 3 (CORRECTNESS_r03.json): 48 hash-green + 1 rows-only by
    # contract (telemetry_artifact_score). rel_agg_bool_bit (the 50th) is
    # in _RECHECK_FIRST, not here.
    "rel_string_funcs",
    "rel_date_funcs",
    "rel_case_when",
    "rel_json_funcs",
    "rel_null_safe_eq",
    "rel_null_funcs",
    "rel_try_arith",
    "rel_interval_arith",
    "rel_levenshtein",
    "rel_array_funcs",
    "rel_map_funcs",
    "rel_explode",
    "rel_variant_semistructured",
    "rel_distinct_rows",
    "rel_percentiles",
    "rel_string_agg",
    "rel_arg_minmax",
    "rel_corr_covar",
    "rel_skew_kurtosis",
    "rel_histogram",
    "rel_unpivot",
    "rel_grouped_regression",
    "rel_profile_columns",
    "rel_rollup_reuse",
    "rel_latest_by_key",
    "rel_exists_subquery",
    "rel_not_in_subquery",
    "rel_lateral_topk",
    "rel_events_hourly",
    "rel_sessionize",
    "ts_gap_fill_hourly",
    "rel_interval_join_banded",
    "rel_rolling_zscore",
    "rel_grouped_median_pandas",
    "rel_python_udtf",
    "src_xml_roundtrip",
    "src_binaryfile_ingest",
    "rel_merge_upsert",
    "rel_scd2_history",
    "emb_normalize",
    "doc_keep_decision",
    "doc_length_buckets",
    "doc_pack_sequences",
    "doc_unigram_logprob",
    "doc_tfidf_top_terms",
    "emb_dim_stats",
    "emb_centroid_outliers",
    "telemetry_artifact_score",
    "telemetry_score_500k",
    # round 2 (CORRECTNESS_r02.json): 43 hash-green + 7 rows-only by contract
    "emb_quantize_int8",
    "doc_winnow",
    "telemetry_historical_stats",
    "telemetry_scored_alerts",
    "telemetry_train_metrics",
    "telemetry_pysource_stats",
    "rel_window_rank",
    "rel_window_running",
    "rel_window_moving_avg",
    "rel_window_distribution",
    "rel_window_range_frame",
    "rel_topk_global",
    "rel_topk_per_group",
    "rel_union",
    "rel_intersect",
    "rel_except",
    "rel_except_all",
    "rel_intersect_all",
    "src_csv_roundtrip",
    "src_partitioned_pruned",
    "src_json_roundtrip",
    "src_orc_roundtrip",
    "src_text_roundtrip",
    "q2_best_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_nation_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q17_small_quantity",
    "q18_large_orders",
    "q19_disjunctive",
    "q20_heavy_suppliers",
    "q21_sole_returner",
    "q22_global_sales_opportunity",
    "rel_asof_join",
    "rel_join_right",
    "rel_salted_join",
    "rel_recursive_cte",
    "rel_sql_api",
    # round 1 (CORRECTNESS_r01.json): hash-green or rows-only by contract
    "doc_token_stats",
    "doc_quality",
    "doc_langid",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "mm_binary_stats",
    "mm_frame_sample",
    "doc_token_regex",
    "doc_punct_ratio",
    "doc_top_terms",
    "doc_bigrams",
    "doc_decontaminate",
    "doc_chunk",
    "doc_pii_redact",
    "doc_repetition",
    "emb_label_centroids",
    "mm_audio_rms",
    "q1_pricing_summary",
    "rel_agg_stats",
    "rel_agg_distinct",
    "rel_having",
    "rel_rollup",
    "rel_cube",
    "rel_grouping_sets",
    "rel_pivot_status",
    "q3_shipping_priority",
    "q5_local_supplier",
    "rel_join_inner",
    "rel_join_left",
    "rel_join_full",
    "rel_join_semi",
    "rel_join_anti",
    "rel_join_cross",
    "rel_range_join",
    "rel_scalar_subquery",
)


def _catalog_order(names: list[str]) -> list[str]:
    """Order the catalog so the driver's fixed correctness window lands on
    not-yet-verified queries (see comment on the lists above)."""
    rank = {n: (0, i) for i, n in enumerate(_RECHECK_FIRST)}
    for i, n in enumerate(_WINDOW_PRIORITY):
        rank.setdefault(n, (1, i))
    for i, n in enumerate(_DRIVER_VERIFIED):
        rank.setdefault(n, (3, i))
    reg = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: rank.get(n, (2, reg[n])))


def register(
    name: str,
    oracle: str | None = None,
    *,
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(
            name=name,
            spark=fn,
            oracle=oracle.strip() if oracle else None,
            doc=(fn.__doc__ or "").strip(),
            bench=bench,
            tags=tags,
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    from . import load_all

    load_all()
    return {n: _REGISTRY[n] for n in _catalog_order(list(_REGISTRY))}


def get_query(name: str) -> Query:
    return all_queries()[name]
