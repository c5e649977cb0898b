"""Central query registry — the contract surface for ``__spark_entry__``.

Every implemented operator/query from SURVEY.md §2 registers here with
  - a callable ``(spark, sf_dir) -> DataFrame`` (the Spark-first plan), and
  - optionally a DuckDB-runnable ANSI-SQL oracle string (omitted only for
    genuinely non-SQL-expressible ops, which get a rows-only check).

Domain modules each expose their own ``QUERIES``/``ORACLE`` pair; this module
merges them. Names are globally unique.
"""

from __future__ import annotations

import inspect
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    if name in _QUERIES:
        raise ValueError(f"duplicate query name: {name}")
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


def register_module(module, oracle_map: dict[str, str]) -> None:
    """Register every public ``(spark, sf_dir)`` function in ``module``."""
    for name, fn in inspect.getmembers(module, inspect.isfunction):
        if name.startswith("_") or fn.__module__ != module.__name__:
            continue
        params = list(inspect.signature(fn).parameters)
        if params[:2] == ["spark", "sf_dir"]:
            register(name, fn, oracle_map.get(name))


def _load_all() -> None:
    if _QUERIES:
        return
    from flink_1_3_2_hopsworks_spark.plans import (
        tpch,
        tpch_extra,
        tpch_extra_oracle,
        tpch_full,
        tpch_full_oracle,
        tpch_oracle,
    )

    register_module(tpch, tpch_oracle.ORACLE)
    register_module(tpch_extra, tpch_extra_oracle.ORACLE)
    register_module(tpch_full, tpch_full_oracle.ORACLE)

    from flink_1_3_2_hopsworks_spark.operators import showcase, showcase_oracle

    register_module(showcase, showcase_oracle.ORACLE)

    from flink_1_3_2_hopsworks_spark.functions import showcase as fn_showcase
    from flink_1_3_2_hopsworks_spark.functions import (
        showcase_oracle as fn_showcase_oracle,
    )

    register_module(fn_showcase, fn_showcase_oracle.ORACLE)

    from flink_1_3_2_hopsworks_spark.dedup import showcase as dd_showcase
    from flink_1_3_2_hopsworks_spark.dedup import (
        showcase_oracle as dd_showcase_oracle,
    )

    register_module(dd_showcase, dd_showcase_oracle.ORACLE)

    from flink_1_3_2_hopsworks_spark.similarity import showcase as sim_showcase
    from flink_1_3_2_hopsworks_spark.similarity import (
        showcase_oracle as sim_showcase_oracle,
    )

    register_module(sim_showcase, sim_showcase_oracle.ORACLE)

    from flink_1_3_2_hopsworks_spark.graph import showcase as gr_showcase
    from flink_1_3_2_hopsworks_spark.graph import (
        showcase_oracle as gr_showcase_oracle,
    )

    register_module(gr_showcase, gr_showcase_oracle.ORACLE)

    from flink_1_3_2_hopsworks_spark.streaming import showcase as st_showcase
    from flink_1_3_2_hopsworks_spark.streaming import (
        showcase_oracle as st_showcase_oracle,
    )

    register_module(st_showcase, st_showcase_oracle.ORACLE)

    from flink_1_3_2_hopsworks_spark import table_showcase, table_showcase_oracle

    register_module(table_showcase, table_showcase_oracle.ORACLE)

    from flink_1_3_2_hopsworks_spark.ml import showcase as ml_showcase
    from flink_1_3_2_hopsworks_spark.ml import (
        showcase_oracle as ml_showcase_oracle,
    )

    register_module(ml_showcase, ml_showcase_oracle.ORACLE)


# Round in which each name was LAST proven green (rows+schema+hash) in a
# driver CORRECTNESS artifact — the union of CORRECTNESS_r01–r04.json (every
# registered query is green in at least one). The driver verifies a bounded
# ~50-name prefix of ``queries()``, so emit the LEAST-recently-proven names
# first: each round the stalest cohort rotates back into the artifact and
# re-proves itself after intervening code churn. Never-proven names (round 0,
# i.e. anything not listed here) always sort first. check_parity.py covers
# the full registry locally regardless of order.
_LAST_PROVEN_ROUND: dict[str, int] = {
    # r02 cohort (stalest — two rounds of churn since proven)
    **dict.fromkeys(
        [
            "fn_array_ops", "fn_case_when", "fn_json_ops", "fn_math_ops",
            "fn_native_extras", "fn_string_ops", "fn_temporal_ops",
            "op_anti_join", "op_cogroup", "op_cross_join", "op_cube",
            "op_distinct", "op_first_n_per_group", "op_grouping_sets",
            "op_intersect", "op_max_by", "op_min_by", "op_minus",
            "op_outer_join", "op_over_range_trailing",
            "op_over_rows_moving_sum", "op_over_unbounded_running",
            "op_ranking_functions", "op_rollup", "op_semi_join", "op_top_k",
            "op_union_distinct", "op_zip_with_index",
            "q19_discounted_revenue", "q20_potential_part_promotion",
            "q21_suppliers_kept_orders_waiting", "q2_min_cost_supplier",
            "q8_national_market_share", "q9_product_type_profit",
        ],
        2,
    ),
    # r03 cohort
    **dict.fromkeys(
        [
            "cep_error_spike", "cep_signup_purchase", "cep_signup_timeout",
            "dd_embedding_pairs", "dd_exact_dedup", "dd_minhash_pairs",
            "dd_ngram_jaccard_pairs", "dd_simhash_pairs",
            "ev_async_enrich", "ev_first_event_per_key",
            "ev_running_user_total", "ev_session_5m", "ev_sliding_2h_1h",
            "ev_tumbling_hourly",
            "fn_udaf_grouped", "fn_udf_scalar", "fn_udtf_lateral",
            "gr_customer_jaccard", "gr_degrees", "gr_sssp_hops",
            "ml_linreg_price", "ml_scaled_quantity",
            "q11_important_stock", "q12_shipping_delay",
            "q13_customer_distribution", "q14_promo_revenue",
            "q15_top_supplier", "q16_supplier_cnt",
            "q17_small_quantity_revenue", "q22_global_sales_opportunity",
            "q3_shipping_priority", "q4_order_priority",
            "q5_local_supplier_volume", "q6_forecast_revenue",
            "q7_volume_shipping",
            "sim_bruteforce_topk", "sim_lsh_topk",
            "tbl_expr_priority_stats", "tbl_over_running_revenue",
            "tbl_sql_region_year_revenue", "tbl_tumble_daily_by_type",
            "text_fingerprint", "text_lang_id", "text_quality", "text_stats",
        ],
        3,
    ),
    # r04 cohort (freshest)
    **dict.fromkeys(
        [
            "cep_clean_purchase", "cep_double_error",
            "ds_chain_revenue", "ds_stream_program",
            "ev_count_sliding_20_5", "ev_count_tumbling_20",
            "ev_window_cogroup_click_purchase",
            "ev_window_join_click_purchase",
            "fn_rich_broadcast_lookup",
            "gr_adamic_adar", "gr_clustering_coef",
            "gr_connected_components", "gr_facade_filtered_degrees",
            "gr_graph_summarize", "gr_hits", "gr_label_propagation",
            "gr_pagerank", "gr_triangle_count",
            "ml_knn_neighbors", "ml_minmax_price", "ml_poly_features",
            "mm_binary_stats",
            "op_asof_join", "op_bulk_iteration", "op_delta_iteration",
            "op_group_reduce_stats", "op_histogram", "op_intersect_all",
            "op_interval_join", "op_join_with_huge", "op_join_with_tiny",
            "op_minus_all", "op_percentiles", "op_range_band_join",
            "op_sample_fixed_size", "op_split_select",
            "op_stratified_sample", "op_summarize",
            "pipe_corpus_clean",
            "q10_returned_items", "q18_large_volume_customer",
            "q1_pricing_summary",
            "sim_ivf_topk",
            "tbl_offset_fetch", "tbl_session_30m_by_user",
            "tbl_slide_6h_2h_by_type",
            "text_pack_sequences", "text_pii_redact",
            "text_tfidf_top_terms", "text_vocab_top_terms",
        ],
        4,
    ),
    # r05 cohort (overrides earlier entries — CORRECTNESS_r05.json proved
    # the then-stalest r02 names, the 12 round-5 additions, and q3–q6)
    **dict.fromkeys(
        [
            "fn_array_ops", "fn_case_when", "fn_json_ops", "fn_math_ops",
            "fn_native_extras", "fn_string_ops", "fn_temporal_ops",
            "op_anti_join", "op_bloom_filter_join", "op_cogroup",
            "op_cross_join", "op_cube", "op_distinct",
            "op_first_n_per_group", "op_grouping_sets", "op_intersect",
            "op_kmv_distinct", "op_max_by", "op_min_by", "op_minus",
            "op_outer_join", "op_over_range_trailing",
            "op_over_rows_moving_sum", "op_over_unbounded_running",
            "op_ranking_functions", "op_rollup", "op_salted_aggregate",
            "op_salted_join", "op_sampled_percentiles", "op_semi_join",
            "op_top_k", "op_union_distinct", "op_zip_with_index",
            "pipe_dataset_card", "pipe_lang_mixture",
            "q19_discounted_revenue", "q20_potential_part_promotion",
            "q21_suppliers_kept_orders_waiting", "q2_min_cost_supplier",
            "q3_shipping_priority", "q4_order_priority",
            "q5_local_supplier_volume", "q6_forecast_revenue",
            "q8_national_market_share", "q9_product_type_profit",
            "sim_recall_eval", "text_decontaminate",
            "text_repetition_stats", "text_unigram_rarity",
        ],
        5,
    ),
    # r06 cohort (overrides earlier entries — CORRECTNESS_r06.json proved
    # the 16 round-6 additions plus the then-stalest r03-era names).
    # Deliberately absent, so they sort first for round-7 re-proving:
    #   pipe_near_dedup_star  — renamed: the star pipeline IS pipe_near_dedup
    #                           now (pairs mode moved to pipe_near_dedup_pairs)
    #   dd_minhash_pairs, pipe_incremental_near_ingest — r7 default band
    #                           geometry change (rows-per-band 4 → 8)
    **dict.fromkeys(
        [
            "cep_error_spike", "cep_signup_purchase", "cep_signup_timeout",
            "dd_embedding_pairs", "dd_embedding_recall", "dd_exact_dedup",
            "dd_ngram_jaccard_pairs", "dd_simhash_pairs",
            "ev_async_enrich", "ev_first_event_per_key",
            "ev_running_user_total", "ev_session_5m",
            "fn_udaf_grouped", "fn_udf_scalar", "fn_udtf_lateral",
            "gr_customer_jaccard", "gr_degrees", "gr_k_core", "gr_sssp_hops",
            "gr_sssp_weighted",
            "op_weighted_sample",
            "pipe_incremental_ingest", "pipe_quality_filter",
            "pipe_shuffle_shard", "pipe_token_budget", "pipe_token_mixture",
            "q11_important_stock", "q12_shipping_delay",
            "q13_customer_distribution", "q14_promo_revenue",
            "q15_top_supplier", "q16_supplier_cnt",
            "q17_small_quantity_revenue", "q22_global_sales_opportunity",
            "q7_volume_shipping",
            "sim_bruteforce_topk", "sim_lsh_topk",
            "text_boilerplate_removal", "text_chunk_documents",
            "text_dup_span_removal", "text_dup_span_stats",
            "text_fingerprint", "text_lang_id", "text_normalize_unicode",
            "text_quality", "text_stats",
        ],
        6,
    ),
    # r07 cohort (overrides earlier entries — CORRECTNESS_r07.json proved
    # the 13 round-7 additions plus the then-stalest r04-era names).
    # Deliberately absent, so they sort first for round-8 re-proving
    # (their round-8 code/oracle changes invalidate the r07 proof):
    #   text_line_dedup          — empty-line exemption (ADVICE r7)
    #   pipe_gopher_filter       — ASCII-ellipsis symbols + NULL coalesce
    #   ml_kmeans_spherical      — half-up rounding contract
    #   dd_prefix_dups           — hash-only shuffle reshape
    #   pipe_model_quality_filter— trained (not random-ish) frozen weights
    #   dd_semantic_dedup        — Arrow cell kernel (was r6-proven)
    #   dd_simhash_pairs stays proven (unchanged since 562400f re-proof via
    #   the r8 full parity sweeps); sim_pq_topk removed from the r7 cohort —
    #   pq_encode grew the in-kernel cell path (flat-PQ gate re-proves the
    #   shared kernel)
    **dict.fromkeys(
        [
            "dd_minhash_pairs",
            "ds_chain_revenue", "ev_sliding_2h_1h", "ev_tumbling_hourly",
            "fn_rich_broadcast_lookup",
            "ml_linreg_price", "ml_scaled_quantity", "mm_binary_stats",
            "op_asof_join", "op_bulk_iteration", "op_delta_iteration",
            "op_group_reduce_stats", "op_heavy_hitters_cms", "op_histogram",
            "op_intersect_all", "op_interval_join", "op_join_with_huge",
            "op_join_with_tiny", "op_minus_all", "op_percentiles",
            "op_range_band_join", "op_sample_fixed_size", "op_split_select",
            "op_stratified_sample", "op_summarize",
            "pipe_c4_clean", "pipe_corpus_clean", "pipe_corpus_diff",
            "pipe_incremental_near_ingest",
            "pipe_near_dedup", "pipe_near_dedup_pairs",
            "pipe_temperature_mixture",
            "q10_returned_items", "q18_large_volume_customer",
            "q1_pricing_summary",
            "tbl_expr_priority_stats", "tbl_over_running_revenue",
            "tbl_sql_region_year_revenue", "tbl_tumble_daily_by_type",
            "text_ngram_novelty", "text_oov_rate", "text_pack_sequences",
            "text_pii_redact", "text_tfidf_top_terms",
        ],
        7,
    ),
    # r08 cohort (overrides earlier entries — CORRECTNESS_r08.json proved
    # all 50 of these green on rows+schema+hash).
    # Deliberately absent, so they sort first for round-9 re-proving
    # (their round-9 code changes invalidate the r08 proof — ADVICE fixes):
    #   text_zipf_fit             — degenerate-input guard (lm.py:316)
    #   pipe_lm_perplexity_filter — broadcast-hint gating (lm.py:114)
    #   dd_prefix_dups            — candidate broadcast-hint gating (prefix.py)
    #   ev_window_cogroup_agg_fused — millisecond window precision (window_op)
    #   dd_semantic_contamination — probe_id dtype derivation (contamination.py)
    # Removed again in round 10 (plan change invalidates the r08 proof;
    # heads the r10 artifact):
    #   sim_ivfpq_topk, sim_ivf_topk — probe/assignment moved from the
    #   literal HOF expressions to the Arrow kernels (ivf_probe_cells /
    #   nearest_fixed_vector; ~27s fixed planning tax measured, and the
    #   corpus-side interpreted fallback). Locally re-proven vs their
    #   oracles at sf0.01 the day of the change.
    **dict.fromkeys(
        [
            "cep_clean_purchase", "cep_double_error",
            "dd_semantic_dedup", "dd_simhash_stars",
            "ds_stream_program",
            "ev_count_sliding_20_5", "ev_count_tumbling_20",
            "ev_window_cogroup_click_purchase",
            "ev_window_join_click_purchase",
            "gr_adamic_adar", "gr_clustering_coef",
            "gr_connected_components", "gr_facade_filtered_degrees",
            "gr_graph_summarize", "gr_hits", "gr_label_propagation",
            "gr_pagerank", "gr_triangle_count",
            "ml_bpe_train", "ml_kmeans_spherical", "ml_knn_neighbors",
            "ml_minmax_price", "ml_poly_features",
            "pipe_cluster_balanced_sample", "pipe_dsir_resample",
            "pipe_gopher_filter", "pipe_model_quality_filter",
            "q19_discounted_revenue", "q20_potential_part_promotion",
            "q21_suppliers_kept_orders_waiting", "q2_min_cost_supplier",
            "q3_shipping_priority", "q4_order_priority",
            "q5_local_supplier_volume", "q6_forecast_revenue",
            "sim_bm25_topk", "sim_pq_topk",
            "tbl_offset_fetch", "tbl_session_30m_by_user",
            "tbl_slide_6h_2h_by_type",
            "text_bpe_tokenize", "text_line_dedup", "text_vocab_top_terms",
        ],
        8,
    ),
    # r09 cohort (overrides earlier entries — CORRECTNESS_r09.json proved
    # all 50 of these green on rows+schema+hash: the 15 round-9/late-r8
    # gates plus the then-stalest r05-era names). The six r05-proven
    # stragglers the r09 artifact did not reach — pipe_dataset_card,
    # pipe_lang_mixture, sim_recall_eval, text_decontaminate,
    # text_repetition_stats, text_unigram_rarity — keep their round-5
    # stamp above and therefore head the round-10 artifact.
    **dict.fromkeys(
        [
            "dd_minhash_recall", "dd_prefix_dups",
            "dd_semantic_contamination",
            "ev_curation_stream_stats", "ev_window_cogroup_agg_fused",
            "fn_array_ops", "fn_case_when", "fn_json_ops", "fn_math_ops",
            "fn_native_extras", "fn_string_ops", "fn_temporal_ops",
            "mm_audio_near_dups", "mm_curation_funnel",
            "mm_image_near_dups", "mm_video_near_dups",
            "op_anti_join", "op_bloom_filter_join", "op_cogroup",
            "op_cross_join", "op_cube", "op_distinct",
            "op_first_n_per_group", "op_grouping_sets", "op_intersect",
            "op_kmv_distinct", "op_max_by", "op_min_by", "op_minus",
            "op_outer_join", "op_over_range_trailing",
            "op_over_rows_moving_sum", "op_over_unbounded_running",
            "op_ranking_functions", "op_rollup", "op_salted_aggregate",
            "op_salted_join", "op_sampled_percentiles", "op_semi_join",
            "op_top_k", "op_union_distinct", "op_zip_with_index",
            "pipe_curation_e2e", "pipe_incremental_ann_ingest",
            "pipe_lm_perplexity_filter", "pipe_snapshot_upsert",
            "q8_national_market_share", "q9_product_type_profit",
            "sim_hybrid_rrf_topk", "text_zipf_fit",
        ],
        9,
    ),
    # r10 cohort (overrides earlier entries — CORRECTNESS_r10.json proved
    # all 50 of these green on rows+schema+hash: the six r10 gates, the
    # serve-family kernel-fix re-proofs, and the then-stalest r05-era
    # names). ev_curation_funnel_stream is deliberately absent: its epoch
    # body changed in round 11 (survivor-signature append now projects the
    # epoch's one pinned signature frame instead of re-shingling), which
    # invalidates the r10 proof — it keeps its older stamp and heads the
    # r11 artifact (locally re-proven vs its oracle the day of the change).
    **dict.fromkeys(
        [
            "dd_embedding_pairs", "dd_embedding_recall", "dd_exact_dedup",
            "dd_ngram_jaccard_pairs", "dd_simhash_pairs",
            "fn_udaf_grouped", "fn_udf_scalar", "fn_udtf_lateral",
            "gr_customer_jaccard", "gr_degrees",
            "mm_audio_embed_topk", "mm_curation_funnel_stream",
            "mm_embed_topk", "mm_video_embed_topk",
            "op_weighted_sample",
            "pipe_dataset_card", "pipe_incremental_ingest",
            "pipe_lang_mixture", "pipe_quality_filter",
            "pipe_shuffle_shard", "pipe_token_budget", "pipe_token_mixture",
            "q11_important_stock", "q12_shipping_delay",
            "q13_customer_distribution", "q14_promo_revenue",
            "q15_top_supplier", "q16_supplier_cnt",
            "q17_small_quantity_revenue", "q22_global_sales_opportunity",
            "q7_volume_shipping",
            "sim_bruteforce_topk", "sim_ivf_topk", "sim_ivfpq_rerank_topk",
            "sim_ivfpq_topk", "sim_lsh_topk", "sim_recall_eval",
            "text_boilerplate_removal", "text_chunk_documents",
            "text_decontaminate", "text_dup_span_removal",
            "text_dup_span_stats", "text_fingerprint", "text_lang_id",
            "text_normalize_unicode", "text_quality",
            "text_repetition_stats", "text_stats", "text_unigram_rarity",
        ],
        10,
    ),
    # r11 cohort (overrides earlier entries — CORRECTNESS_r11.json proved
    # all 50 of these green on rows+schema+hash: the stalest-first r6/r7
    # rotation plus the four round-11 gates). The stalest cohort is now
    # the remaining r7 names plus the r8 cohort — they head the r12
    # artifact along with the round-12 gates. Round-12 code notes: the
    # ingest entry points gained a ``materialize_probe`` kwarg whose
    # default path is plan-identical (no algebra change — proofs hold);
    # names whose round-12 changes DO alter plans are removed from this
    # cohort below with per-name rationale.
    **dict.fromkeys(
        [
            "cep_error_spike", "cep_signup_purchase", "cep_signup_timeout",
            "dd_minhash_pairs",
            "ds_chain_revenue",
            "ev_async_enrich", "ev_curation_funnel_stream",
            "ev_first_event_per_key", "ev_running_user_total",
            "ev_session_5m",
            "fn_rich_broadcast_lookup",
            "gr_k_core", "gr_sssp_hops", "gr_sssp_weighted",
            "mm_binary_stats", "mm_pair_curation_funnel",
            "mm_pair_curation_funnel_stream", "mm_text_to_image_topk",
            "op_asof_join", "op_bulk_iteration", "op_delta_iteration",
            "op_group_reduce_stats", "op_heavy_hitters_cms", "op_histogram",
            "op_intersect_all", "op_interval_join", "op_join_with_huge",
            "op_join_with_tiny", "op_minus_all", "op_percentiles",
            "op_range_band_join", "op_sample_fixed_size", "op_split_select",
            "op_stratified_sample", "op_summarize",
            "pipe_c4_clean", "pipe_corpus_clean", "pipe_corpus_diff",
            "pipe_incremental_near_ingest", "pipe_near_dedup",
            "pipe_near_dedup_pairs", "pipe_temperature_mixture",
            "q10_returned_items", "q18_large_volume_customer",
            "q1_pricing_summary",
            "text_ngram_novelty", "text_oov_rate", "text_pack_sequences",
            "text_pii_redact", "text_tfidf_top_terms",
        ],
        11,
    ),
}


# Round-12 (optimization round) plan-shape changes: these names' physical
# plans were restructured this round, which invalidates their last driver
# proof — drop the stamp so they head the r12 artifact (never-proven sort
# order) alongside the three new r12 gates and the stalest r7/r8 cohorts.
# All were re-proven locally in this round's TWO full 203/203 parity
# sweeps (OPTIMIZATION_r12.md). Per-name cause:
#   cep_* (5)                 — match_batch groupBy().applyInPandas →
#                               repartition+sort+mapInPandas; gate column
#                               pruning (streaming/cep.py, showcase.py)
#   ev_async_enrich           — vectorized ordered assembly + size-gated
#                               input spread (operators/async_io.py)
#   dd_minhash_pairs/_recall, pipe_near_dedup(_pairs)
#                             — estimator int-cast + star distinct drop
#   dd_simhash_pairs/_stars   — fingerprint union + pairs dedup collapse
#                               (+ stars input spread)
#   dd_semantic_dedup         — cosine_with_norms + input spread
#   dd_ngram_jaccard_pairs, text_pii_redact — size-gated input spread
#   pipe_incremental_near_ingest, ev_curation_funnel_stream,
#   mm_curation_funnel(_stream), mm_pair_curation_funnel(_stream),
#   mm_image_near_dups, pipe_curation_e2e
#                             — ingest one-shingle-pass epoch body /
#                               star-edge internals
#   sim_bruteforce/lsh/ivf_topk, sim_recall_eval, sim_ivfpq_rerank_topk,
#   sim_hybrid_rrf_topk, ml_knn_neighbors, sim_bm25_topk
#                             — cosine_with_norms through knn/ivf/pq
#   mm_text_to_image_topk     — decode-pass pin + norm hoist (cross_modal)
_R12_PLAN_CHANGED = [
    "cep_clean_purchase", "cep_double_error", "cep_error_spike",
    "cep_signup_purchase", "cep_signup_timeout",
    "dd_minhash_pairs", "dd_minhash_recall", "dd_ngram_jaccard_pairs",
    "dd_semantic_dedup", "dd_simhash_pairs", "dd_simhash_stars",
    "ev_async_enrich", "ev_curation_funnel_stream",
    "ml_knn_neighbors",
    "mm_curation_funnel", "mm_curation_funnel_stream",
    "mm_image_near_dups", "mm_pair_curation_funnel",
    "mm_pair_curation_funnel_stream", "mm_text_to_image_topk",
    "pipe_curation_e2e", "pipe_incremental_near_ingest",
    "pipe_near_dedup", "pipe_near_dedup_pairs",
    "sim_bm25_topk", "sim_bruteforce_topk", "sim_hybrid_rrf_topk",
    "sim_ivf_topk", "sim_ivfpq_rerank_topk", "sim_lsh_topk",
    "sim_recall_eval", "text_pii_redact",
]
for _n in _R12_PLAN_CHANGED:
    _LAST_PROVEN_ROUND.pop(_n, None)


def _ordered(names) -> list[str]:
    # A renamed/removed query silently skewing the rotation would hide a
    # coverage gap — fail loudly instead.
    stale = set(_LAST_PROVEN_ROUND) - set(_QUERIES)
    if stale:
        raise AssertionError(
            f"_LAST_PROVEN_ROUND names not in registry: {sorted(stale)}"
        )
    # Never-proven first (round 0), then stalest cohort; stable within cohort.
    return sorted(names, key=lambda n: _LAST_PROVEN_ROUND.get(n, 0))


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {n: _QUERIES[n] for n in _ordered(_QUERIES)}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {n: _ORACLES[n] for n in _ordered(_ORACLES)}
