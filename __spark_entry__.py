"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``big_data_project_jan_2026_tick_data__spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from big_data_project_jan_2026_tick_data__spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.entry_query(spark, "/root/testdata/sf0.001")


# The driver adjudicates a bounded window (the first ~50 names) per
# round, so dict order is the scheduling lever. Round-5 ordering, per
# the r4 verdict: CHANGED-CODE RE-PROOF OUTRANKS NEW-QUERY PROOF — a
# changed green is unproven, a new query is merely unknown.
# (a) queries whose code/oracle changed THIS round (the 3 fixed r4
#     hash-FAILs, the float-sum hardening family, the advisor's latent
#     quantizer fixes) + the one new query,
# (b) queries changed in r4 still carrying stale r3 verdicts,
# (c) the never-adjudicated r4 registrations,
# (d) green queries with the OLDEST verdicts (r1 set) so every row's
#     proof stays fresh against regenerated testdata.
# Deliberately absent: every rows-only entry (doc_minhash_pairs,
# doc_simhash_pairs, doc_fingerprints, ml_anomaly_scores,
# ml_anomaly_scores_ae, emb_ivf_topk, ...) — a slot spent there can
# only ever say `no_oracle`; their value proofs live in md5/mean/
# fixed-weight twins (ml_anomaly_scores_ae → ml_anomaly_scores_ae_fixedw).
_ADJUDICATION_PRIORITY = [
    # (a) fixed r4 hash-FAILs — order-independent integer sums now
    "doc_token_entropy",
    "doc_mixture_weights",
    "doc_distinctive_terms",
    # (a) float-sum hardening + advisor quantizer fixes (code changed)
    "ticks_symbol_correlation",
    "ticks_return_acf",
    "events_moment_stats",
    "events_zipf_fit",
    "emb_diversity_report",
    "doc_source_divergence",
    "emb_mmr_rerank",
    "ticks_drawdown",
    "events_robust_outliers",
    # (a) NEW: fixed-weight autoencoder scoring value proof
    "ml_anomaly_scores_ae_fixedw",
    # (b) changed in r4, verdict still stale r3
    "multimodal_features",
    "multimodal_frame_sample",
    "approx_aggregates",
    "doc_hash_sample",
    "streaming_health",
    "tracking_best_run",
    "doc_dup_clusters",
    "doc_leakage_safe_split",
    "emb_dup_clusters",
    "emb_lsh_topk",
    "emb_ivf_exact",
    "emb_kmeans",
    "emb_near_dup_pairs",
    # (c) registered in r4, never adjudicated
    "orders_cohort_ltv",
    "events_top_paths",
    "ticks_parkinson_vol",
    "events_dau_mau",
    "supplier_return_rates",
    "events_alarm_episodes",
    "doc_pmi_collocations",
    "part_fuzzy_link",
    "orders_segment_migration",
    # (c') registered in r5 (SCD2 dimension history, mergeable HLL,
    # JSONL corpus roundtrip)
    "orders_scd2_priority",
    "orders_scd2_apply",
    "events_hll_user_reach",
    "doc_jsonl_roundtrip",
    "events_histogram_percentiles",
    "ticks_vwap_twap",
    # (d) oldest green verdicts — r1 set, three testdata generations old
    "ticks_value_stats",
    "tpch_q1",
    "tpch_q3_top10",
    "tpch_q5_region_revenue",
    "join_semi_customers_with_orders",
    "join_anti_customers_without_orders",
    "topk_orders_per_priority",
    "window_lag_lead_rank",
    "rollup_orders",
    # ---- 50-slot window boundary; the rest queue for r6 ----
    # r6 head: harness-refactored this round (shared replay helper) —
    # changed-code re-proof outranks the rest of the queue
    "streaming_session_agg",
    "streaming_cusum_alarms",
    # r5 registrations that missed the r5 window
    "events_psi_drift",
    "orders_seasonal_decompose",
    "orders_scd2_asof_state",
    "ticks_market_beta",
    "streaming_vwap_bars",
    "part_copurchase_triangles",
    "part_copurchase_communities",
    "doc_weighted_sample",
    "cube_orders",
    "pivot_user_event_values",
    "stats_min_max_metadata",
    "salted_join_skewed_users",
    "tpch_q6_forecast_revenue",
    "tpch_q4_priority_check",
    "tpch_q14_promo_ratio",
    "tpch_q18_large_orders",
    "scalar_subquery_above_avg",
    "distinct_agg_per_status",
    "grouping_sets_orders",
    "union_all_orders_split",
    "minmax_by_priority",
    "string_funcs_part_names",
    "ntile_percentile_orders",
    "doc_token_stats",
    "doc_exact_dedup",
    "doc_lang_id",
    "emb_cosine_topk",
    # (c) r2 set, as window room permits
    "tpch_q2_min_acctbal_supplier",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_count",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_disjunctive_predicate",
    "tpch_q20_part_promotion",
    "tpch_q22_global_sales_opportunity",
    "doc_ngram_jaccard",
    "doc_quality_scores",
    "doc_pack_sequences",
    "doc_scrub_pii",
    "doc_strip_boilerplate",
    "emb_label_centroids",
    "orders_unpivot",
    "part_name_tokens",
    "tpch_q12_shipmode_buckets",
    "doc_repetition_signals",
    "doc_decontaminate",
    "doc_curation_pipeline",
]


def _ordered(mapping: dict) -> dict:
    def rank(name: str) -> tuple[int, int]:
        if name in _ADJUDICATION_PRIORITY:
            return (0, _ADJUDICATION_PRIORITY.index(name))
        fn = registry.QUERIES[name]
        reads_events = "events" in (fn.__doc__ or "") or any(
            name.startswith(p)
            for p in ("ticks_", "events_", "window_", "asof_", "set_", "ml_")
        ) or name in ("snapshot_time_travel", "streaming_session_agg")
        return (1 if reads_events else 2, 0)

    names = sorted(mapping, key=lambda n: (rank(n), n))
    return {n: mapping[n] for n in names}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(dict(registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    return _ordered(dict(registry.ORACLE))
