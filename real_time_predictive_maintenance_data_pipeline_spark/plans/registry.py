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
_ROTATED_FOR_ROUND = 8

_RECHECK_FIRST: tuple[str, ...] = (
    # ROUND-8 STEADY-STATE WINDOW (first rotation under the r8+ policy
    # below): plan/oracle-changed names first (mandatory), then the 48
    # least-recently-driver-checked names, oldest first (ties by
    # registration order) — tools/plan_next_window.py proposal.
    #
    # Mandatory: new this round / transport+close path changed this round
    "telemetry_mqtt_wildcard",
    "telemetry_mqtt_roundtrip",
    # DRIVER-SCALE RE-RUN, NOT A REGRESSION: least-recently-checked
    # rotation; all were green in their last driver round.
    "doc_token_stats",  # last r01
    "doc_quality",  # last r01
    "doc_langid",  # last r01
    "doc_fingerprint",  # last r01
    "dedup_exact",  # last r01
    "dedup_ngram_jaccard",  # last r01
    "mm_binary_stats",  # last r01
    "mm_frame_sample",  # last r01
    "doc_token_regex",  # last r01
    "doc_punct_ratio",  # last r01
    "doc_top_terms",  # last r01
    "doc_bigrams",  # last r01
    "doc_decontaminate",  # last r01
    "doc_chunk",  # last r01
    "doc_pii_redact",  # last r01
    "doc_repetition",  # last r01
    "emb_label_centroids",  # last r01
    "mm_audio_rms",  # last r01
    "q1_pricing_summary",  # last r01
    "rel_agg_stats",  # last r01
    "rel_agg_distinct",  # last r01
    "rel_having",  # last r01
    "rel_rollup",  # last r01
    "rel_cube",  # last r01
    "rel_grouping_sets",  # last r01
    "rel_pivot_status",  # last r01
    "q3_shipping_priority",  # last r01
    "q5_local_supplier",  # last r01
    "rel_join_inner",  # last r01
    "rel_join_left",  # last r01
    "rel_join_full",  # last r01
    "rel_join_semi",  # last r01
    "rel_join_anti",  # last r01
    "rel_join_cross",  # last r01
    "rel_range_join",  # last r01
    "rel_scalar_subquery",  # last r01
    "emb_quantize_int8",  # last r02
    "doc_winnow",  # last r02
    "rel_window_rank",  # last r02
    "rel_window_running",  # last r02
    "rel_window_moving_avg",  # last r02
    "rel_topk_global",  # last r02
    "rel_topk_per_group",  # last r02
    "rel_union",  # last r02
    "rel_intersect",  # last r02
    "rel_except",  # last r02
    "rel_asof_join",  # last r02
    "q6_forecast_revenue",  # last r02
)

_WINDOW_PRIORITY: tuple[str, ...] = (
    # Empty under the ROUND-8+ STEADY-STATE POLICY (recorded per the r6
    # verdict's task 6): every catalog name has a driver row since r7,
    # so the window stops chasing coverage and becomes a ROTATING
    # RECHECK: pack _RECHECK_FIRST with (a) any query whose Spark plan
    # or oracle text changed this round (mandatory), then (b) the
    # least-recently-driver-checked 50-name slice of the catalog in age
    # order (ties by registration order), so the whole catalog re-earns
    # driver evidence roughly every 6-7 rounds. New queries enter only
    # to serve a real SURVEY gap and go to the front of the next
    # window. sf0.1 sweeps via tools/sweep_catalog.py remain the
    # pre-commit gate for any float-sensitive change.
    # tools/plan_next_window.py prints the ready-to-paste proposal and
    # lists latest-round FAILURES as mandatory rechecks.
)

_DRIVER_VERIFIED: tuple[str, ...] = (
    # Cumulative r01-r07 green names (CORRECTNESS_r01..r07: hash-green
    # or rows-only by declared contract; zero failures across all seven
    # rounds), MINUS the 48 names rotated into the r8 recheck window
    # above. After r7 the whole catalog has driver rows; this list now
    # tracks "not in the current recheck window".
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
    "telemetry_historical_stats",
    "telemetry_scored_alerts",
    "telemetry_train_metrics",
    "telemetry_pysource_stats",
    "rel_window_distribution",
    "rel_window_range_frame",
    "rel_except_all",
    "rel_intersect_all",
    "src_csv_roundtrip",
    "src_partitioned_pruned",
    "src_json_roundtrip",
    "src_orc_roundtrip",
    "src_text_roundtrip",
    "q2_best_supplier",
    "q4_order_priority",
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
    "rel_join_right",
    "rel_salted_join",
    "rel_recursive_cte",
    "rel_sql_api",
    "sem_dedup",
    "sim_ann_lsh",
    "sim_ivf_topk",
    "sim_pq_adc_topk",
    "sim_ivf_pq_topk",
    "sim_topk_bruteforce",
    "sim_knn_batch",
    "sim_hard_negatives",
    "dedup_embedding_pairs",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_banded",
    "dedup_clusters",
    "ml_als_recommend",
    "ml_cv_model_selection",
    "ml_kmeans_embeddings",
    "ml_isotonic_calibration",
    "ml_quality_classifier",
    "ml_survival_aft",
    "doc_bpe_vocab",
    "doc_bpe_encode",
    "doc_compression_ratio",
    "doc_dup_pagerank",
    "doc_stratified_sample",
    "mm_feature_extract",
    "mm_resize",
    "mm_phash_neardup",
    "emb_pca_whitening",
    "emb_pq_codes",
    "rel_approx_distinct",
    "rel_approx_quantile",
    "rel_hll_partial_merge",
    "telemetry_stream_roundtrip",
    "ml_roc_auc_hist",
    "ml_lift_bucketed",
    "rel_abc_prefix2",
    "rel_rfm_bucketed",
    "rel_cuped_adjustment",
    "rel_srm_check",
    "rel_experiment_mde",
    "rel_bootstrap_ci",
    "rel_proportions_ztest",
    "events_error_rate_wilson",
    "rel_skew_report",
    "rel_join_explosion_estimate",
    "rel_offset_fetch_pagination",
    "rel_union_by_name_missing",
    "rel_null_ordering_rank",
    "ts_week_over_week",
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
