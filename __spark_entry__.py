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
# round, so dict order is the scheduling lever. Round-6 ordering, per
# the standing rule: CHANGED-CODE RE-PROOF OUTRANKS NEW-QUERY PROOF —
# a changed green is unproven, a new query is merely unknown.
# (a) the 3 r5 hash-FAILs, rebuilt this round on functions.detmath
#     (bit-identical cross-engine log2/ln; libm was the residual
#     mismatch) — the only changed-code rows,
# (b) r4/r5-refactored streaming rows still carrying stale verdicts,
# (c) the r5 registrations that missed the r5 window (never
#     adjudicated),
# (d) green queries with the OLDEST verdicts (r1 then r2 sets — three
#     to four testdata generations old) so no proof goes stale.
# Deliberately absent: every rows-only entry (doc_minhash_pairs,
# doc_simhash_pairs, doc_fingerprints, ml_anomaly_scores,
# ml_anomaly_scores_ae, emb_ivf_topk, ...) — a slot spent there can
# only ever say `no_oracle`; their value proofs live in md5/mean/
# fixed-weight twins (ml_anomaly_scores_ae → ml_anomaly_scores_ae_fixedw).
_ADJUDICATION_PRIORITY = [
    # (a) r5 hash-FAILs rewritten on detmath (code + oracle changed)
    "doc_token_entropy",
    "doc_mixture_weights",
    "doc_distinctive_terms",
    # (a') advisor fixes this round touched their operators
    # (scd2_apply seed tiebreak, tracking URI routing)
    "orders_scd2_apply",
    "tracking_best_run",
    # (a'') whole-registry libm sweep this round: every remaining
    # ln/log2/exp/pow under a quantizer moved to detmath (and unordered
    # float sums to integer-grid sums) in these queries' operators AND
    # oracles — changed-code re-proof
    "doc_lm_perplexity",
    "doc_quality_classifier",
    "doc_bm25_search",
    "doc_tfidf_top_terms",
    "doc_source_divergence",
    "doc_pmi_collocations",
    "ticks_indicators",
    "events_zipf_fit",
    "ticks_parkinson_vol",
    "events_moment_stats",
    "ticks_rolling_stats",
    "emb_kmeans",
    "emb_semantic_dedup",
    "emb_centroid_outliers",
    # (b) shared-replay-harness refactor in r5, verdicts stale r3/r4
    "streaming_session_agg",
    "streaming_cusum_alarms",
    # (c) registered in r6: product quantization, CMS heavy hitters
    "emb_pq_codes",
    "emb_pq_topk",
    "events_cms_heavy_hitters",
    "streaming_dedup_replay",
    "doc_bpe_merges",
    # (c) registered in r5, never adjudicated
    "events_psi_drift",
    "orders_seasonal_decompose",
    "orders_scd2_asof_state",
    "ticks_market_beta",
    "streaming_vwap_bars",
    "part_copurchase_triangles",
    "part_copurchase_communities",
    "doc_weighted_sample",
    # (d) r1-stale greens — oldest proofs in the registry
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
    # (d) r2-stale greens
    "tpch_q2_min_acctbal_supplier",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_count",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_disjunctive_predicate",
    "tpch_q20_part_promotion",
    "tpch_q21_sole_fault_supplier",
    "tpch_q22_global_sales_opportunity",
    "doc_ngram_jaccard",
    "doc_quality_scores",
    "doc_pack_sequences",
    "doc_scrub_pii",
    # ---- ~50-slot window boundary; the rest queue for r7 ----
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
