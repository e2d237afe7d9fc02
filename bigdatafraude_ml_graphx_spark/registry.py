"""Single import point for the full declared query set.

Importing this module triggers registration from every ``queries*`` module;
``QUERIES`` / ``ORACLE`` are the dicts the driver contract exposes.
"""

from __future__ import annotations

from .queries import ORACLE, QUERIES  # noqa: F401  (base relational set)
from . import queries_graph  # noqa: F401  (graph set — registers on import)
from . import queries_text  # noqa: F401  (text/dedup/similarity set)
from . import queries_ml  # noqa: F401  (ML set — rows-only checks)
from . import queries_stream  # noqa: F401  (streaming set)
from . import queries_multimodal  # noqa: F401  (binary-column set)
from . import queries_gaps  # noqa: F401  (windows/cube/time gap coverage)
from . import queries_scalar  # noqa: F401  (scalar fns, distinct counts, G4)
from . import queries_windows2  # noqa: F401  (sliding/session/percentile/sets)
from . import queries_order  # noqa: F401  (order-by-case, coalesce, array idx)
from . import queries_ann  # noqa: F401  (IVF ANN — rows-only)
from . import queries_temporal  # noqa: F401  (as-of/range joins, pivot, explode)
from . import queries_rollup  # noqa: F401  (hierarchical rollup, hash sampling)
from . import queries_sql2  # noqa: F401  (scalar subquery, unpivot — SQL surface)
from . import queries_arrays  # noqa: F401  (higher-order array functions)
from . import queries_windows3  # noqa: F401  (RANGE frames, ntile/first/last)
from . import queries_quality  # noqa: F401  (repetition/chunking/PII/contamination)
from . import queries_cdc  # noqa: F401  (CDC compaction, scalar quantization)
from . import queries_analytics  # noqa: F401  (sessionization/funnel/cohorts/triangles)
from . import queries_tpch2  # noqa: F401  (deep multi-way joins: Q5/Q14/Q15 shapes)
from . import queries_tpch3  # noqa: F401  (decorrelation/disjunction: Q7/Q8/Q10/Q13/Q17/Q18/Q19/Q22)
from . import queries_corpus  # noqa: F401  (winnowing/bigram-vocab/SRP-LSH/length-deciles)
from . import queries_warehouse  # noqa: F401  (SCD2, token entropy, struct-argmax)
from . import queries_scale  # noqa: F401  (distributed serial-window variants)
from . import queries_tpch4  # noqa: F401  (Q12/Q9/Q21 shapes on the slim schema)
from . import queries_llm2  # noqa: F401  (fuzzy dedup, PMI, splits, KN counts)
from . import queries_tpch5  # noqa: F401  (Q2/Q11/Q16/Q20 shapes on the slim schema)
from . import queries_r6  # noqa: F401  (Benford/KMV/Zipf/rolling-hash/IVM/attribution)
from . import queries_r6b  # noqa: F401  (CDC chunking/OOV/unigram-LM/walks/drift/readability/mixture)
from . import queries_r6c  # noqa: F401  (DAG levels / EWMA / Markov transitions)
from . import queries_r7  # noqa: F401  (BPE merges / SemDeDup)
from . import queries_r7b  # noqa: F401  (perplexity filter / DSIR / boilerplate / BPE encode)
from . import queries_r7c  # noqa: F401  (z-order / compaction / interval coverage / zone maps)
from . import queries_r7d  # noqa: F401  (RFM / Pareto / mode / autocorrelation)
from . import queries_r7e  # noqa: F401  (k-means / target encoding / feature hashing / TextRank)
from . import queries_r9  # noqa: F401  (built-in bag operators on dim-sized input)
from . import queries_r10  # noqa: F401  (df-capped hot-content-safe dedup configs)
from . import queries_r10b  # noqa: F401  (source quota / duplicate spans / source overlap)
from . import queries_r10c  # noqa: F401  (chunk dedup / dup-rate / kNN graph / curation pipeline)
from . import queries_r11  # noqa: F401  (df-capped contamination + r11 additions)
from . import queries_r12  # noqa: F401  (shared-labeling release pipeline)
from . import queries_r13  # noqa: F401  (standing-table + incremental-maintenance consumers)

# ---------------------------------------------------------------------------
# Driver-certification ordering. The per-round correctness gate samples a
# 50-entry PREFIX of queries() in insertion order (CORRECTNESS_r01/r02 both
# contain exactly the first 50 registered entries — the artifact ends at the
# precise point registration order crosses 50). Queries registered later have
# never received a driver row despite passing the identical local gate
# (tests/test_oracle_parity.py). Re-emit the dicts with never-yet-certified
# queries FIRST so the driver certifies them this round; the prefix backfills
# with the longest-certified names (each already has two rounds of green
# driver rows).
# ---------------------------------------------------------------------------

_DRIVER_CERTIFIED = frozenset({
    # every name with a driver row in CORRECTNESS_r01..r04.json ...
    "q01_pricing_summary", "q02_top10_orders", "q03_price_histogram",
    "q04_revenue_filter", "q05_null_census", "q06_distinct_segments",
    "q07_global_stats", "q08_segment_revenue", "q09_customer_order_counts",
    "q10_customers_with_orders", "q11_customers_without_orders",
    "q12_nation_revenue", "q13_top3_orders_per_customer",
    "q14_running_customer_spend", "q15_set_union_except",
    "q16_hourly_event_stats", "q17_json_extract", "q18_cast_projection",
    "q19_rollup_counts", "q20_cooccurrence_edges", "q21_user_degrees",
    "q22_connected_components", "q23_pagerank", "q24_dedup_exact",
    "q25_token_stats", "q26_lang_quality", "q27_ngram_jaccard_pairs",
    "q28_minhash_signatures", "q29_lsh_candidates", "q30_simhash",
    "q31_cosine_topk", "q32_gbt_confusion", "q33_stream_hourly",
    "q34_multimodal_bytes", "q35_lag_lead_delta", "q36_epoch_time_parts",
    "q37_selectexpr_projection", "q38_cube_counts", "q39_distinct_counts",
    "q40_string_functions", "q41_edge_weight_normalization",
    "q42_sliding_window", "q43_session_windows", "q44_percentiles",
    "q45_grouping_sets", "q46_embedding_near_dups", "q47_orderby_case_topk",
    "q48_coalesce_and_array_index", "q49_ivf_topk", "q50_asof_join",
    "q51_range_join", "q52_pivot_counts", "q53_token_explode",
    "q54_hierarchical_rollup", "q55_hash_sample", "q56_scalar_subquery",
    "q57_unpivot", "q58_array_norms", "q59_multimodal_decode",
    "q60_range_frame_trailing_sum", "q61_ntile_first_last",
    "q62_shipping_priority", "q63_exists_late_orders", "q64_near_dup_groups",
    "q65_stratified_sample", "q66_map_functions", "q67_repetition_quality",
    "q68_doc_chunking", "q69_pii_redaction", "q70_contamination_overlap",
    "q71_simhash_near_pairs", "q72_embedding_centroids",
    "q73_tfidf_keywords", "q74_cdc_latest_events", "q75_scalar_quantize",
    "q76_simhash_dup_groups", "q77_batch_sessionization", "q78_event_funnel",
    "q79_retention_cohorts", "q80_triangle_count", "q81_sketch_aggregates",
    "q82_connected_components_star", "q83_sequence_packing",
    "q84_snapshot_diff", "q85_correlation_matrix", "q86_value_outliers",
    "q87_weighted_sample",
    # ... round-4 driver rows (CORRECTNESS_r04.json — 47 exact + 3 no_oracle):
    "q88_packed_hashed", "q89_regional_supplier_volume",
    "q90_promo_revenue_share", "q91_top_supplier", "q92_nation_pair_volume",
    "q93_market_share", "q94_returned_item_customers",
    "q95_order_count_distribution", "q96_small_quantity_revenue",
    "q97_large_volume_orders", "q98_disjunctive_revenue",
    "q99_lapsed_high_balance", "q100_winnow_fingerprints",
    "q101_bigram_vocab", "q102_srp_signatures", "q103_srp_near_pairs",
    "q104_length_deciles", "q105_scd2_intervals", "q106_token_entropy",
    "q107_top_order_per_nation", "q108_merge_upsert",
    "q109_video_frame_sampling", "q110_audio_features",
    "q111_shortest_paths", "q112_gap_fill_locf", "q113_relative_ranks",
    "q114_max_concurrency", "q115_weighted_median",
    "q116_salted_event_totals", "q117_table_fingerprint",
    "q118_stream_sessions", "q119_winnow_overlap_pairs",
    "q120_multiset_ops", "q121_ann_topk_exact",
    "q122_stream_static_enrich", "q123_asof_forward",
    "q124_corpus_mixture", "q125_higher_moments",
    # ... round-5 driver rows (CORRECTNESS_r05.json — 50/50 green; includes
    # the re-certifications of every r5 lineage-changed name):
    "q126_max_concurrency_scaled", "q127_length_deciles_by_lang",
    "q128_length_deciles_scaled", "q129_priority_by_linestatus",
    "q130_profit_by_nation_year", "q131_waiting_orders",
    "q132_fuzzy_prefix_pairs", "q133_stopword_quality", "q134_bigram_pmi",
    "q135_train_split", "q136_continuation_counts",
    "q137_label_propagation", "q138_stream_dedup",
    "q139_split_contamination", "q141_canonical_dedup",
    "q142_strongly_connected", "q143_clustering_coefficient",
    "q144_mad_robust_stats", "q145_skyline_pareto",
    "q146_stream_stream_join", "q147_ordered_string_agg",
    "q148_time_weighted_value", "q149_kcore", "q150_degree_assortativity",
    "q151_minhash_error_contract",
    # ... round-6 driver rows (CORRECTNESS_r06.json — 50/50 green; includes
    # the re-certifications of every r6 lineage-changed name):
    "q140_ivf_recall_contract", "q152_min_cost_supplier",
    "q153_important_part_values", "q154_supplier_diversity",
    "q155_dominant_suppliers", "q156_benford_digits", "q157_zipf_slope",
    "q158_kmv_distinct", "q159_incremental_agg", "q160_rolling_hash_groups",
    "q161_first_touch_attribution", "q162_personalized_pagerank",
    "q163_pixel_histogram", "q164_stream_outer_join",
    "q165_content_defined_chunks", "q166_oov_rate", "q167_unigram_logprob",
    "q168_random_walks", "q169_profile_drift", "q170_readability",
    "q171_temperature_mixture", "q172_pq_recall_contract",
    "q173_recursive_reachability", "q174_lateral_topn", "q175_dag_levels",
    "q176_ewma_values", "q177_event_transitions",
    "q178_heavy_hitters_contract", "q179_als_implicit_contract",
    "q180_ktruss", "q181_python_datasource",
    "q182_link_prediction_features", "q183_sequence_patterns",
    "q184_stateful_running_totals",
    # ... round-7 driver rows (CORRECTNESS_r07.json — 50/50 green: the 6
    # lineage-changed re-certifications above plus these 44 new names):
    "q185_gbt_quality_contract", "q186_bpe_merges", "q187_semdedup",
    "q188_market_basket", "q189_referential_integrity",
    "q190_countmin_sketch", "q191_approx_quantile_contract",
    "q192_group_by_all", "q193_nullsafe_join", "q194_graph_eccentricity",
    "q195_event_streaks", "q196_skew_report", "q197_vocab_coverage",
    "q198_percentile_disc_scaled", "q199_table_profile",
    "q200_time_gap_detection", "q201_embedding_dim_stats",
    "q202_constraint_violations", "q203_normalization_impact",
    "q204_trailing_distinct_users", "q205_delivery_latency",
    "q206_topk_with_ties", "q207_new_vs_returning", "q208_filter_funnel",
    "q209_graph_modularity", "q210_bm25_ranking",
    "q211_python_stream_source", "q212_degree_distribution",
    "q213_perplexity_filter", "q214_dsir_weights",
    "q215_boilerplate_ngrams", "q216_bpe_encode", "q217_zorder_keys",
    "q218_compaction_plan", "q219_interval_coverage", "q220_zonemap_pruning",
    "q221_rfm_segments", "q222_pareto_coverage", "q223_group_mode",
    "q224_revenue_autocorrelation", "q225_kmeans_lloyd",
    "q226_target_encoding", "q227_feature_hashing",
    "q228_textrank_keywords",
    # ... round-8 driver rows (CORRECTNESS_r08.json — 50/50 green: the 19
    # lineage-changed/new names of the r8 subtract-set all re-certified, plus
    # the alphabetical backfill — which happened to include
    # q121_ann_topk_exact, so the ADVICE-flagged srp_signature int→long
    # lineage change in q121's shared helper carries its own green r8 driver
    # row; no exemption needed):
    "q229_srp_near_pairs_scaled",
    # ... round-9 driver rows (CORRECTNESS_r09.json — 50/50 green: the 5
    # lineage-changed names of the r9 subtract-set all re-certified, plus
    # these 3 new names and the longest-certified backfill):
    "q230_bag_ops_builtin", "q231_incremental_ingest_dedup",
    "q232_containment_pairs",
    # ... round-10 driver rows (CORRECTNESS_r10.json — 50/50 green: the 4
    # lineage-changed names of the r10 subtract-set all re-certified
    # (q146/q164/q231/q232 folded back in above), plus these 16 new names):
    "q233_jaccard_df_capped", "q234_containment_df_capped",
    "q235_srp_pairs_bucket_capped", "q236_stream_ingest_dedup",
    "q237_srp_ingest_probe", "q238_duplicate_shingle_fraction",
    "q239_source_quota", "q240_duplicate_spans", "q241_source_overlap",
    "q242_cut_duplicate_spans", "q243_tfdf_cosine_pairs", "q244_chunk_dedup",
    "q245_source_dup_rate", "q246_knn_graph", "q247_curation_pipeline",
    "q248_source_token_tvd",
    # ... round-11 driver rows (CORRECTNESS_r11.json — 50/50 green: the 8
    # lineage-changed names of the r11 subtract-set all re-certified
    # (q49/q140/q240–q243/q247/q248 folded back in above), plus these 6 new
    # names):
    "q249_contamination_df_capped", "q250_dup_cluster_stats",
    "q251_span_savings_by_source", "q252_ivf_cell_stats",
    "q253_token_budget_fill", "q254_clusterwise_split",
    # ... round-12 driver rows (CORRECTNESS_r12.json — 50/50 green: the 7
    # lineage-changed names of the r12 subtract-set all re-certified
    # (q49/q140/q249/q250/q252/q253/q254 folded back in above), plus these 9
    # new names):
    "q255_dedup_release_report", "q256_canonical_corpus_stats",
    "q257_split_leakage_audit", "q258_curation_manifest",
    "q259_shingle_novelty_curve", "q260_ivf_cell_dispersion",
    "q261_semantic_split_leakage", "q262_cluster_source_overlap",
    "q263_incremental_dedup_decisions",
}) - frozenset({
    # ... MINUS queries whose lineage changed since their last driver row —
    # these must re-enter the 50-entry prefix so round 13 certifies the code
    # that actually ships (the round-close rotation discipline,
    # .claude/skills/verify/SKILL.md):
    # (r12 subtract-set fully re-certified in CORRECTNESS_r12.json and folded
    # back in above; r13 changes accumulate here as they land.)
    "q263_incremental_dedup_decisions",  # r13: probe-vs-index join replaces the full-corpus ngram self-join (VERDICT r12 What's-wrong #1)
    "q257_split_leakage_audit",  # r13: consumes cluster_labels' exposed pair frame instead of re-inlining the dup-graph build (ADVICE #2)
    "q259_shingle_novelty_curve",  # r13: empty-corpus guard on max(doc_id)+1 (ADVICE #4)
    "q261_semantic_split_leakage",  # r13: cross_frac guarded for the empty-pair-set edge in BOTH engines (ADVICE #3)
    "q250_dup_cluster_stats",  # r13: cluster_labels default threshold now the shared _JACC_TAU (ADVICE #1)
    "q254_clusterwise_split",  # r13: shares the cluster_labels default-threshold lineage
    "q255_dedup_release_report",  # r13: shares the cluster_labels lineage
    "q256_canonical_corpus_stats",  # r13: shares the cluster_labels lineage
    "q258_curation_manifest",  # r13: shares the cluster_labels lineage
    "q262_cluster_source_overlap",  # r13: shares the cluster_labels lineage
    # r13 OPTIMIZATION round — construction-path rewrite of srp_signature /
    # _nearest_cell_expr / _hyperplane_bit (one-shot F.expr / list literals
    # instead of per-element py4j construction; bit-identical values pinned
    # in tests/test_similarity.py). Values unchanged by proof, but the
    # lineage changed, so the rotation discipline applies:
    "q46_embedding_near_dups",
    "q49_ivf_topk",
    "q102_srp_signatures",
    "q103_srp_near_pairs",
    "q140_ivf_recall_contract",
    "q187_semdedup",
    "q229_srp_near_pairs_scaled",
    "q235_srp_pairs_bucket_capped",
    "q237_srp_ingest_probe",
    "q246_knn_graph",
    "q252_ivf_cell_stats",
    "q260_ivf_cell_dispersion",
    # r13 OPTIMIZATION round — ngram shingle pipeline restructure (map-side
    # array_distinct + one keyed sharing Exchange + merge-hinted self-join;
    # multiset equality pinned in tests/test_dedup.py) and the
    # connected-components lazy-checkpoint job fusion. Values unchanged by
    # construction; lineage changed, so the rotation discipline applies:
    "q22_connected_components",
    "q27_ngram_jaccard_pairs",
    "q64_near_dup_groups",
    "q70_contamination_overlap",
    "q76_simhash_dup_groups",
    "q141_canonical_dedup",
    "q151_minhash_error_contract",
    "q232_containment_pairs",
    "q233_jaccard_df_capped",
    "q234_containment_df_capped",
    "q238_duplicate_shingle_fraction",
    "q249_contamination_df_capped",
})


def _certification_order(d: dict) -> dict:
    fresh = sorted(k for k in d if k not in _DRIVER_CERTIFIED)
    seen = sorted(k for k in d if k in _DRIVER_CERTIFIED)
    return {k: d[k] for k in [*fresh, *seen]}


QUERIES = _certification_order(QUERIES)
ORACLE = _certification_order(ORACLE)
