"""The full query catalog: name -> (spark callable, DuckDB oracle SQL | None).

This is the driver-facing surface (__spark_entry__.py re-exports it) and the
engine's own regression suite: every SURVEY.md §2 operator family implemented
so far has at least one entry here, and every entry with an oracle is
hash-matched against DuckDB at sf0.001 by tests/test_oracle_parity.py (and at
sf0.01 by the external driver's rotating ~50-entry window — see the ordering
contract below; CORRECTNESS_r*.json records which entries each round covered).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vectordb_bioinsight_spark.plans import catalog_citations as cit
from vectordb_bioinsight_spark.plans import catalog_cleaning as cl
from vectordb_bioinsight_spark.plans import catalog_coverage as cov
from vectordb_bioinsight_spark.plans import catalog_evaluation as evl
from vectordb_bioinsight_spark.plans import catalog_explainers as ex
from vectordb_bioinsight_spark.plans import catalog_events as ev
from vectordb_bioinsight_spark.plans import catalog_multimodal as mm
from vectordb_bioinsight_spark.plans import catalog_packing as pk
from vectordb_bioinsight_spark.plans import catalog_network as net
from vectordb_bioinsight_spark.plans import catalog_relational as rel
from vectordb_bioinsight_spark.plans import catalog_singlecell as sc
from vectordb_bioinsight_spark.plans import catalog_stats as st
from vectordb_bioinsight_spark.plans import catalog_text as tx
from vectordb_bioinsight_spark.plans import catalog_tpch as th
from vectordb_bioinsight_spark.plans import catalog_tpch2 as th2
from vectordb_bioinsight_spark.plans import catalog_vector as vec

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (query fn, oracle SQL or None for rows-only checks)
#:
#: ORDERING CONTRACT: the external driver verifies roughly the FIRST 50
#: entries per round; r01-r08 cumulatively drove all 304 entries at least
#: once (r06/r07 windows 50/50, r08 49/50 — gene_id_format hash-red on an
#: oracle-representation bug, fixed and re-earning first in r09). The r09
#: window retires the staleness backlog: after this round no oracle-backed
#: entry's driver row of record predates r03. Below the line: stalest
#: first (remaining r03 block, then r04..r08 freshest last); the two
#: rows-only-by-design entries are parked at the very bottom so no window
#: slot scores as a no_oracle error.
CATALOG: dict[str, tuple[QueryFn, str | None]] = {
    # === ORDERING: r09 rotation (driver checks roughly the FIRST 50) ===
    # (a) gene_id_format: the one red r08 row, re-earning on the fixed
    # SQL twin (the three sum(CASE) counters now cast ::BIGINT; DuckDB
    # HUGEINT surfaced as pandas float64 against Spark bigint and broke
    # the driver's strict stringify-and-hash on value-identical results
    # — VERDICT r08 task 1; plans/verify.compare now rejects the class):
    # (b) bootstrap_purchase_ci: its weight derivation moved to the
    # Arrow kernel late in r08 AFTER that window was allocated (values
    # hash-identical, parity re-verified on landing) — the "no driver
    # row predates its kernel change" bar;
    # (c) the 31 remaining r02-stale oracle-backed entries (VERDICT r08
    # task 3 — after r09 no row of record predates r03), alphabetical;
    # (d) the 15 alphabetically-first r03-stale entries (ivf_knn and
    # hub_parts, the 16th/17th, gave their slots to the summary_parse
    # and part_link_prediction kernel re-earns and lead below the line).
    # 1 + 1 + 2 + 31 + 15 = 50.
    "gene_id_format": (st.q_gene_id_format, st.SQL_GENE_ID_FORMAT),
    "bootstrap_purchase_ci": (st.q_bootstrap_purchase_ci, st.SQL_BOOTSTRAP_PURCHASE_CI),
    # (b2) summary_parse_docs: its text path moved to the shuffle-free
    # per-document Arrow fold THIS round (VERDICT r08 task 7; values
    # property-pinned identical, plan pin 2 -> 0 exchanges) — kernel
    # changed, so its r08 row predates the kernel and it re-earns now,
    # displacing the 17th r03 alphabetical fill (ivf_knn, returned below
    # the line; same precedent as the r08 (e) tier):
    "summary_parse_docs": (ex.q_summary_parse_docs, ex.SQL_SUMMARY_PARSE_DOCS),
    # (b3) part_link_prediction: the zero-row census re-planted its graph
    # (nodes partkey % 1024 instead of raw partkeys — the weight>=2 wedge
    # graph was empty at sf0.1) AFTER the rotation above was allocated,
    # so like important_parts and dominant_shippers (already in the (d)
    # fill below) its row of record predates the planted-input change and
    # it re-earns now, displacing the 16th r03 fill (hub_parts, returned
    # below the line):
    "part_link_prediction": (net.q_part_link_prediction, net.SQL_PART_LINK_PREDICTION),
    # (c) the r02-stale block, alphabetical:
    "knn_classify": (st.q_knn_classify, st.SQL_KNN_CLASSIFY),
    "lens_classify": (sc.q_lens_classify, sc.SQL_LENS_CLASSIFY),
    "line_dedup_global": (cl.q_line_dedup_global, cl.SQL_LINE_DEDUP_GLOBAL),
    "line_quality_stats": (cl.q_line_quality_stats, cl.SQL_LINE_QUALITY_STATS),
    "lognorm_events": (sc.q_lognorm_events, sc.SQL_LOGNORM_EVENTS),
    "media_features": (mm.q_media_features, mm.SQL_MEDIA_FEATURES),
    "media_frame_stats": (mm.q_media_frame_stats, mm.SQL_MEDIA_FRAME_STATS),
    "mixture_sample": (pk.q_mixture_sample, pk.SQL_MIXTURE_SAMPLE),
    "part_assoc_stats": (sc.q_part_assoc_stats, sc.SQL_PART_ASSOC_STATS),
    "pii_redact": (cl.q_pii_redact, cl.SQL_PII_REDACT),
    "priority_size_factors": (sc.q_priority_size_factors, sc.SQL_PRIORITY_SIZE_FACTORS),
    "pseudobulk_parts": (sc.q_pseudobulk_parts, sc.SQL_PSEUDOBULK_PARTS),
    "quality_quota": (tx.q_quality_quota, tx.SQL_QUALITY_QUOTA),
    "rag_context": (vec.q_rag_context, vec.SQL_RAG_CONTEXT),
    "repeated_spans": (tx.q_repeated_spans, tx.SQL_REPEATED_SPANS),
    "repetition_stats": (tx.q_repetition_stats, tx.SQL_REPETITION_STATS),
    "rerank_blend": (vec.q_rerank_blend, vec.SQL_RERANK_BLEND),
    "retrieval_ndcg": (vec.q_retrieval_ndcg, vec.SQL_RETRIEVAL_NDCG),
    "semdedup": (vec.q_semdedup, vec.SQL_SEMDEDUP),
    "sequence_pack": (pk.q_sequence_pack, pk.SQL_SEQUENCE_PACK),
    "sequence_pack_nextfit": (pk.q_sequence_pack_nextfit, pk.SQL_SEQUENCE_PACK_NEXTFIT),
    "sequence_pack_stats": (pk.q_sequence_pack_stats, pk.SQL_SEQUENCE_PACK_STATS),
    "shuffle_shards": (pk.q_shuffle_shards, pk.SQL_SHUFFLE_SHARDS),
    "span_cut_docs": (cl.q_span_cut_docs, cl.SQL_SPAN_CUT_DOCS),
    "temperature_sample": (pk.q_temperature_sample, pk.SQL_TEMPERATURE_SAMPLE),
    "temperature_weights": (pk.q_temperature_weights, pk.SQL_TEMPERATURE_WEIGHTS),
    "tfidf_topk": (tx.q_tfidf_topk, tx.SQL_TFIDF_TOPK),
    "unigram_logprob": (tx.q_unigram_logprob, tx.SQL_UNIGRAM_LOGPROB),
    "user_profile_argmax": (sc.q_user_profile_argmax, sc.SQL_USER_PROFILE_ARGMAX),
    "user_qc_stats": (sc.q_user_qc_stats, sc.SQL_USER_QC_STATS),
    "winnow_fingerprints": (tx.q_winnow_fingerprints, tx.SQL_WINNOW_FINGERPRINTS),
    # (d) the 15 alphabetically-first r03-stale entries:
    "cnv_deviation": (cov.q_cnv_deviation, cov.SQL_CNV_DEVIATION),
    "contamination_check": (tx.q_contamination_check, tx.SQL_CONTAMINATION_CHECK),
    "cube_orders": (cov.q_cube_orders, cov.SQL_CUBE_ORDERS),
    "discount_band_revenue": (th2.q_discount_band_revenue, th2.SQL_DISCOUNT_BAND_REVENUE),
    "disjunctive_revenue": (th.q_disjunctive_revenue, th.SQL_DISJUNCTIVE_REVENUE),
    "distinct_users_by_type": (th.q_distinct_users_by_type, th.SQL_DISTINCT_USERS_BY_TYPE),
    "domain_boilerplate": (cl.q_domain_boilerplate, cl.SQL_DOMAIN_BOILERPLATE),
    "dominant_shippers": (th2.q_dominant_shippers, th2.SQL_DOMINANT_SHIPPERS),
    "embed_documents": (tx.q_embed_documents, tx.SQL_EMBED_DOCUMENTS),
    "exact_dup_groups": (tx.q_exact_dup_groups, tx.SQL_EXACT_DUP_GROUPS),
    "grouping_sets_revenue": (th.q_grouping_sets_revenue, th.SQL_GROUPING_SETS_REVENUE),
    "hash_sample_docs": (th.q_hash_sample_docs, th.SQL_HASH_SAMPLE_DOCS),
    "hash_split_docs": (th.q_hash_split_docs, th.SQL_HASH_SPLIT_DOCS),
    "hub_blend_chain": (net.q_hub_blend_chain, net.SQL_HUB_BLEND_CHAIN),
    "important_parts": (th2.q_important_parts, th2.SQL_IMPORTANT_PARTS),
    # === below the window: stalest driver evidence first (remaining
    # r03 block alphabetical, then r04..r08 freshest last) ===
    # latest driver row: r03
    "hub_parts": (net.q_hub_parts, net.SQL_HUB_PARTS),
    "ivf_knn": (th.q_ivf_knn, th.SQL_IVF_KNN),
    "keyword_and_match": (tx.q_keyword_and_match, tx.SQL_KEYWORD_AND_MATCH),
    "knn_lsh_bucketed": (th.q_knn_lsh_bucketed, th.SQL_KNN_LSH_BUCKETED),
    "large_order_customers": (th.q_large_order_customers, th.SQL_LARGE_ORDER_CUSTOMERS),
    "min_cost_supplier": (th2.q_min_cost_supplier, th2.SQL_MIN_COST_SUPPLIER),
    "mmr_diversify": (vec.q_mmr_diversify, vec.SQL_MMR_DIVERSIFY),
    "nation_market_share": (th2.q_nation_market_share, th2.SQL_NATION_MARKET_SHARE),
    "nation_profit": (th2.q_nation_profit, th2.SQL_NATION_PROFIT),
    "nation_volume_flow": (th.q_nation_volume_flow, th.SQL_NATION_VOLUME_FLOW),
    "neardup_ingest_batch": (tx.q_neardup_ingest_batch, tx.SQL_NEARDUP_INGEST_BATCH),
    "order_count_distribution": (th2.q_order_count_distribution, th2.SQL_ORDER_COUNT_DISTRIBUTION),
    "paga_labels": (net.q_paga_labels, net.SQL_PAGA_LABELS),
    "part_supplier_diversity": (th2.q_part_supplier_diversity, th2.SQL_PART_SUPPLIER_DIVERSITY),
    "part_year_setops": (th.q_part_year_setops, th.SQL_PART_YEAR_SETOPS),
    "perplexity_buckets": (tx.q_perplexity_buckets, tx.SQL_PERPLEXITY_BUCKETS),
    "pivot_unpivot_roundtrip": (th.q_pivot_unpivot_roundtrip, th.SQL_PIVOT_UNPIVOT_ROUNDTRIP),
    "pq_adc_knn": (vec.q_pq_adc_knn, vec.SQL_PQ_ADC_KNN),
    "precision_field_scores": (cov.q_precision_field_scores, cov.SQL_PRECISION_FIELD_SCORES),
    "priority_lines_by_flag": (th.q_priority_lines_by_flag, th.SQL_PRIORITY_LINES_BY_FLAG),
    "profile_documents": (th.q_profile_documents, th.SQL_PROFILE_DOCUMENTS),
    "promo_revenue_monthly": (th.q_promo_revenue_monthly, th.SQL_PROMO_REVENUE_MONTHLY),
    "pseudotime_embeddings": (net.q_pseudotime_embeddings, net.SQL_PSEUDOTIME_EMBEDDINGS),
    "purchase_last_view": (cov.q_purchase_last_view, cov.SQL_PURCHASE_LAST_VIEW),
    "quantized_knn": (th.q_quantized_knn, th.SQL_QUANTIZED_KNN),
    "reservoir_per_source": (th.q_reservoir_per_source, th.SQL_RESERVOIR_PER_SOURCE),
    "returned_revenue_customers": (
        th2.q_returned_revenue_customers,
        th2.SQL_RETURNED_REVENUE_CUSTOMERS,
    ),
    "segment_top_orders": (th2.q_segment_top_orders, th2.SQL_SEGMENT_TOP_ORDERS),
    "small_quantity_revenue": (th.q_small_quantity_revenue, th.SQL_SMALL_QUANTITY_REVENUE),
    "token_doc_index": (cov.q_token_doc_index, cov.SQL_TOKEN_DOC_INDEX),
    "top_revenue_suppliers": (th.q_top_revenue_suppliers, th.SQL_TOP_REVENUE_SUPPLIERS),
    "training_corpus": (tx.q_training_corpus, tx.SQL_TRAINING_CORPUS),
    "waiting_suppliers": (th.q_waiting_suppliers, th.SQL_WAITING_SUPPLIERS),
    "weekly_topic_windows": (ev.q_weekly_topic_windows, ev.SQL_WEEKLY_TOPIC_WINDOWS),
    # latest driver row: r04
    "bpe_encode_docs": (tx.q_bpe_encode_docs, tx.SQL_BPE_ENCODE_DOCS),
    "cluster_top_terms": (tx.q_cluster_top_terms, tx.SQL_CLUSTER_TOP_TERMS),
    "cms_term_counts": (tx.q_cms_term_counts, tx.SQL_CMS_TERM_COUNTS),
    "cohort_retention": (ev.q_cohort_retention, ev.SQL_COHORT_RETENTION),
    "contrastive_triplets": (vec.q_contrastive_triplets, vec.SQL_CONTRASTIVE_TRIPLETS),
    "corpus_data_card": (tx.q_corpus_data_card, tx.SQL_CORPUS_DATA_CARD),
    "corpus_token_budget": (tx.q_corpus_token_budget, tx.SQL_CORPUS_TOKEN_BUDGET),
    "curriculum_shards_docs": (pk.q_curriculum_shards_docs, pk.SQL_CURRICULUM_SHARDS_DOCS),
    "first_order_per_customer": (rel.q_first_order_per_customer, rel.SQL_FIRST_ORDER_PER_CUSTOMER),
    "gsea_brand_es": (st.q_gsea_brand_es, st.SQL_GSEA_BRAND_ES),
    "hard_negatives": (vec.q_hard_negatives, vec.SQL_HARD_NEGATIVES),
    "heatmap_top_parts": (st.q_heatmap_top_parts, st.SQL_HEATMAP_TOP_PARTS),
    "ivfpq_knn": (vec.q_ivfpq_knn, vec.SQL_IVFPQ_KNN),
    "knn_vote_ensemble": (st.q_knn_vote_ensemble, st.SQL_KNN_VOTE_ENSEMBLE),
    "kruskal_by_day": (ev.q_kruskal_by_day, ev.SQL_KRUSKAL_BY_DAY),
    "mixture_budget_plan": (pk.q_mixture_budget_plan, pk.SQL_MIXTURE_BUDGET_PLAN),
    "new_users_daily": (ev.q_new_users_daily, ev.SQL_NEW_USERS_DAILY),
    "ngram_decontaminate": (tx.q_ngram_decontaminate, tx.SQL_NGRAM_DECONTAMINATE),
    "order_priority_exists": (rel.q_order_priority_exists, rel.SQL_ORDER_PRIORITY_EXISTS),
    "phrase_search": (tx.q_phrase_search, tx.SQL_PHRASE_SEARCH),
    "pricing_summary": (rel.q_pricing_summary, rel.SQL_PRICING_SUMMARY),
    "quality_classifier": (tx.q_quality_classifier, tx.SQL_QUALITY_CLASSIFIER),
    "quantile_normalize_values": (ev.q_quantile_normalize_values, ev.SQL_QUANTILE_NORMALIZE_VALUES),
    "region_rollup": (rel.q_region_rollup, rel.SQL_REGION_ROLLUP),
    "robust_scale_values": (ev.q_robust_scale_values, ev.SQL_ROBUST_SCALE_VALUES),
    "rolling_7d_user_value": (ev.q_rolling_7d_user_value, ev.SQL_ROLLING_7D_USER_VALUE),
    "salted_supplier_volume": (rel.q_salted_supplier_volume, rel.SQL_SALTED_SUPPLIER_VOLUME),
    "scd2_customers": (rel.q_scd2_customers, rel.SQL_SCD2_CUSTOMERS),
    "sentence_split_docs": (cl.q_sentence_split_docs, cl.SQL_SENTENCE_SPLIT_DOCS),
    "shard_manifest_docs": (pk.q_shard_manifest_docs, pk.SQL_SHARD_MANIFEST_DOCS),
    "term_proximity": (tx.q_term_proximity, tx.SQL_TERM_PROXIMITY),
    "top_brand_revenue": (rel.q_top_brand_revenue, rel.SQL_TOP_BRAND_REVENUE),
    "top_orders": (rel.q_top_orders, rel.SQL_TOP_ORDERS),
    "url_dedup_docs": (cl.q_url_dedup_docs, cl.SQL_URL_DEDUP_DOCS),
    "url_domain_stats": (cl.q_url_domain_stats, cl.SQL_URL_DOMAIN_STATS),
    "user_skew_profile": (ev.q_user_skew_profile, ev.SQL_USER_SKEW_PROFILE),
    "vocab_dispatch_keywords": (cov.q_vocab_dispatch_keywords, cov.SQL_VOCAB_DISPATCH_KEYWORDS),
    "vocab_dispatch_lexical": (cov.q_vocab_dispatch_lexical, cov.SQL_VOCAB_DISPATCH_LEXICAL),
    "vocab_dispatch_list": (cov.q_vocab_dispatch_list, cov.SQL_VOCAB_DISPATCH_LIST),
    "volcano_parts": (st.q_volcano_parts, st.SQL_VOLCANO_PARTS),
    "web_clean_docs": (cl.q_web_clean_docs, cl.SQL_WEB_CLEAN_DOCS),
    "weighted_sample_docs": (tx.q_weighted_sample_docs, tx.SQL_WEIGHTED_SAMPLE_DOCS),
    "winsorize_values": (ev.q_winsorize_values, ev.SQL_WINSORIZE_VALUES),
    # latest driver row: r05
    "audience_overlap_kmv": (ev.q_audience_overlap_kmv, ev.SQL_AUDIENCE_OVERLAP_KMV),
    "binq_knn": (vec.q_binq_knn, vec.SQL_BINQ_KNN),
    "centroid_importance": (st.q_centroid_importance, st.SQL_CENTROID_IMPORTANCE),
    "cohort_log_rank": (ev.q_cohort_log_rank, ev.SQL_COHORT_LOG_RANK),
    "compaction_plan_events": (pk.q_compaction_plan_events, pk.SQL_COMPACTION_PLAN_EVENTS),
    "daily_trend_ols": (ev.q_daily_trend_ols, ev.SQL_DAILY_TREND_OLS),
    "dp_type_stats": (evl.q_dp_type_stats, evl.SQL_DP_TYPE_STATS),
    "embedding_dim_profile": (vec.q_embedding_dim_profile, vec.SQL_EMBEDDING_DIM_PROFILE),
    "event_transitions": (ev.q_event_transitions, ev.SQL_EVENT_TRANSITIONS),
    "fuzzy_part_names": (evl.q_fuzzy_part_names, evl.SQL_FUZZY_PART_NAMES),
    "holt_backtest_daily": (ev.q_holt_backtest, ev.SQL_HOLT_BACKTEST),
    "holt_conformal_daily": (ev.q_holt_conformal, ev.SQL_HOLT_CONFORMAL),
    "kaplan_meier": (ev.q_kaplan_meier, ev.SQL_KAPLAN_MEIER),
    "mesh_vocab_stats": (cov.q_mesh_vocab_stats, cov.SQL_MESH_VOCAB_STATS),
    "nelson_aalen_churn": (ev.q_nelson_aalen, ev.SQL_NELSON_AALEN),
    "neyman_review_sample": (tx.q_neyman_review_sample, tx.SQL_NEYMAN_REVIEW_SAMPLE),
    "part_name_resolution": (evl.q_part_name_resolution, evl.SQL_PART_NAME_RESOLUTION),
    "part_price_size_frontier": (evl.q_part_price_size_frontier, evl.SQL_PART_PRICE_SIZE_FRONTIER),
    "purchase_auc": (evl.q_purchase_auc, evl.SQL_PURCHASE_AUC),
    "purchase_brier": (evl.q_purchase_brier, evl.SQL_PURCHASE_BRIER),
    "purchase_calibration": (evl.q_purchase_calibration, evl.SQL_PURCHASE_CALIBRATION),
    "purchase_confusion": (evl.q_purchase_confusion, evl.SQL_PURCHASE_CONFUSION),
    "purchase_gains": (ev.q_purchase_gains, ev.SQL_PURCHASE_GAINS),
    "purchase_ks_drift": (evl.q_purchase_ks_drift, evl.SQL_PURCHASE_KS_DRIFT),
    "purchase_pr_curve": (evl.q_purchase_pr_curve, evl.SQL_PURCHASE_PR_CURVE),
    "purchase_woe_iv": (evl.q_purchase_woe_iv, evl.SQL_PURCHASE_WOE_IV),
    "rake_keyphrases": (tx.q_rake_keyphrases, tx.SQL_RAKE_KEYPHRASES),
    "session_paths": (ev.q_session_paths, ev.SQL_SESSION_PATHS),
    "shapley_attribution": (ev.q_shapley_attribution, ev.SQL_SHAPLEY_ATTRIBUTION),
    "ship_overlap_annotation": (evl.q_ship_overlap_annotation, evl.SQL_SHIP_OVERLAP_ANNOTATION),
    "sq8_adc_knn": (vec.q_sq8_adc_knn, vec.SQL_SQ8_ADC_KNN),
    "supplier_ship_coverage": (evl.q_supplier_ship_coverage, evl.SQL_SUPPLIER_SHIP_COVERAGE),
    "supplier_ship_islands": (evl.q_supplier_ship_islands, evl.SQL_SUPPLIER_SHIP_ISLANDS),
    "target_encode_supplier": (rel.q_target_encode_supplier, rel.SQL_TARGET_ENCODE_SUPPLIER),
    "theil_sen_trend": (ev.q_theil_sen_trend, ev.SQL_THEIL_SEN_TREND),
    "touch_attribution": (ev.q_touch_attribution, ev.SQL_TOUCH_ATTRIBUTION),
    "value_anomalies": (ev.q_value_anomalies, ev.SQL_VALUE_ANOMALIES),
    "value_hist_quantiles": (ev.q_value_hist_quantiles, ev.SQL_VALUE_HIST_QUANTILES),
    "value_moments_merged": (ev.q_value_moments_merged, ev.SQL_VALUE_MOMENTS_MERGED),
    "value_percentiles": (vec.q_value_percentiles, vec.SQL_VALUE_PERCENTILES),
    # latest driver row: r06
    "ab_conversion": (st.q_ab_conversion, st.SQL_AB_CONVERSION),
    "binq_codes": (vec.q_binq_codes, vec.SQL_BINQ_CODES),
    "chat_render_docs": (pk.q_chat_render_docs, pk.SQL_CHAT_RENDER_DOCS),
    "claim_support_docs": (cov.q_claim_support_docs, cov.SQL_CLAIM_SUPPORT_DOCS),
    "customer_running_total": (rel.q_customer_running_total, rel.SQL_CUSTOMER_RUNNING_TOTAL),
    "cusum_value_shifts": (st.q_cusum_value_shifts, st.SQL_CUSUM_VALUE_SHIFTS),
    "emerging_keywords_docs": (cov.q_emerging_keywords_docs, cov.SQL_EMERGING_KEYWORDS_DOCS),
    "events_expectations": (ev.q_events_expectations, ev.SQL_EVENTS_EXPECTATIONS),
    "fda_feed_classified": (cov.q_fda_feed_classified, cov.SQL_FDA_FEED_CLASSIFIED),
    "gap_sentences_docs": (cov.q_gap_sentences_docs, cov.SQL_GAP_SENTENCES_DOCS),
    "holt_forecast": (ev.q_holt_forecast, ev.SQL_HOLT_FORECAST),
    "hot_topic_trends": (cov.q_hot_topic_trends, cov.SQL_HOT_TOPIC_TRENDS),
    "kcore_parts": (net.q_kcore_parts, net.SQL_KCORE_PARTS),
    "keyword_topn": (tx.q_keyword_topn, tx.SQL_KEYWORD_TOPN),
    "lagged_correlation": (ev.q_lagged_correlation, ev.SQL_LAGGED_CORRELATION),
    "language_id": (tx.q_language_id, tx.SQL_LANGUAGE_ID),
    "lineitem_flags": (rel.q_lineitem_flags, rel.SQL_LINEITEM_FLAGS),
    "maxsim_docs": (vec.q_maxsim_docs, vec.SQL_MAXSIM_DOCS),
    "news_headline": (cov.q_news_headline, cov.SQL_NEWS_HEADLINE),
    "news_priority_docs": (cov.q_news_priority_docs, cov.SQL_NEWS_PRIORITY_DOCS),
    "order_gap_days": (rel.q_order_gap_days, rel.SQL_ORDER_GAP_DAYS),
    "pagerank_words": (net.q_pagerank_words, net.SQL_PAGERANK_WORDS),
    "paper_consistency_docs": (cov.q_paper_consistency_docs, cov.SQL_PAPER_CONSISTENCY_DOCS),
    "paper_outcomes_docs": (cov.q_paper_outcomes_docs, cov.SQL_PAPER_OUTCOMES_DOCS),
    "part_ppr": (net.q_part_ppr, net.SQL_PART_PPR),
    "preference_pairs_docs": (pk.q_preference_pairs_docs, pk.SQL_PREFERENCE_PAIRS_DOCS),
    "research_gap_priority": (cov.q_research_gap_priority, cov.SQL_RESEARCH_GAP_PRIORITY),
    "rfm_segments": (ev.q_rfm_segments, ev.SQL_RFM_SEGMENTS),
    "source_stats": (tx.q_source_stats, tx.SQL_SOURCE_STATS),
    "sq8_codes": (vec.q_sq8_codes, vec.SQL_SQ8_CODES),
    "summary_validation_docs": (cov.q_summary_validation_docs, cov.SQL_SUMMARY_VALIDATION_DOCS),
    "supplier_nation_lookup": (rel.q_supplier_nation_lookup, rel.SQL_SUPPLIER_NATION_LOOKUP),
    "text_stats": (tx.q_text_stats, tx.SQL_TEXT_STATS),
    "trend_validation_brands": (cov.q_trend_validation_brands, cov.SQL_TREND_VALIDATION_BRANDS),
    "value_psi_drift": (evl.q_value_psi_drift, evl.SQL_VALUE_PSI_DRIFT),
    "whitened_dim_profile": (vec.q_whitened_dim_profile, vec.SQL_WHITENED_DIM_PROFILE),
    "word_cooccurrence": (tx.q_word_cooccurrence, tx.SQL_WORD_COOCCURRENCE),
    "word_triangles": (net.q_word_triangles, net.SQL_WORD_TRIANGLES),
    # latest driver row: r07
    "aggregator_headline": (cov.q_aggregator_headline, cov.SQL_AGGREGATOR_HEADLINE),
    "approx_distinct_users": (th.q_approx_distinct_users, th.SQL_APPROX_DISTINCT_USERS),
    "article_type_docs": (cov.q_article_type_docs, cov.SQL_ARTICLE_TYPE_DOCS),
    "bh_adjust": (ev.q_bh_adjust, ev.SQL_BH_ADJUST),
    "bm25_topk": (vec.q_bm25_topk, vec.SQL_BM25_TOPK),
    "brand_discount_enrichment": (st.q_brand_discount_enrichment, st.SQL_BRAND_DISCOUNT_ENRICHMENT),
    "classification_report_events": (
        evl.q_classification_report_events,
        evl.SQL_CLASSIFICATION_REPORT_EVENTS,
    ),
    "cluster_quality_indices": (evl.q_cluster_quality_indices, evl.SQL_CLUSTER_QUALITY_INDICES),
    "cluster_silhouette": (evl.q_cluster_silhouette, evl.SQL_CLUSTER_SILHOUETTE),
    "customers_without_orders": (rel.q_customers_without_orders, rel.SQL_CUSTOMERS_WITHOUT_ORDERS),
    "daily_event_counts": (ev.q_daily_event_counts, ev.SQL_DAILY_EVENT_COUNTS),
    "dataset_type": (sc.q_dataset_type, sc.SQL_DATASET_TYPE),
    "driver_tracks": (cov.q_driver_tracks, cov.SQL_DRIVER_TRACKS),
    "embedding_neardup": (net.q_embedding_neardup, net.SQL_EMBEDDING_NEARDUP),
    "event_share_per_day": (ev.q_event_share_per_day, ev.SQL_EVENT_SHARE_PER_DAY),
    "event_trends": (ev.q_event_trends, ev.SQL_EVENT_TRENDS),
    "events_in_price_band": (rel.q_events_in_price_band, rel.SQL_EVENTS_IN_PRICE_BAND),
    "fingerprint": (tx.q_fingerprint, tx.SQL_FINGERPRINT),
    "funnel_conversion": (ev.q_funnel_conversion, ev.SQL_FUNNEL_CONVERSION),
    "gene_mentions_docs": (cov.q_gene_mentions_docs, cov.SQL_GENE_MENTIONS_DOCS),
    "hybrid_rrf": (vec.q_hybrid_rrf, vec.SQL_HYBRID_RRF),
    "integrated_drivers": (cov.q_integrated_drivers, cov.SQL_INTEGRATED_DRIVERS),
    "item_cf_parts": (net.q_item_cf_parts, net.SQL_ITEM_CF_PARTS),
    "knn_cosine": (vec.q_knn_cosine, vec.SQL_KNN_COSINE),
    "knn_l2": (vec.q_knn_l2, vec.SQL_KNN_L2),
    "label_centroids": (vec.q_label_centroids, vec.SQL_LABEL_CENTROIDS),
    "maxsim_ivf_docs": (vec.q_maxsim_ivf_docs, vec.SQL_MAXSIM_IVF_DOCS),
    "median_order_value": (net.q_median_order_value, net.SQL_MEDIAN_ORDER_VALUE),
    "minhash_signatures": (tx.q_minhash_signatures, tx.SQL_MINHASH_SIGNATURES),
    "minmax_acctbal": (rel.q_minmax_acctbal, rel.SQL_MINMAX_ACCTBAL),
    "ngram_jaccard": (tx.q_ngram_jaccard, tx.SQL_NGRAM_JACCARD),
    "orders_per_month": (rel.q_orders_per_month, rel.SQL_ORDERS_PER_MONTH),
    "paper_population_docs": (cov.q_paper_population_docs, cov.SQL_PAPER_POPULATION_DOCS),
    "paper_quality_score_docs": (cov.q_paper_quality_score_docs, cov.SQL_PAPER_QUALITY_SCORE_DOCS),
    "part_correlation_network": (net.q_part_correlation_network, net.SQL_PART_CORRELATION_NETWORK),
    "part_price_spread": (rel.q_part_price_spread, rel.SQL_PART_PRICE_SPREAD),
    "part_spearman_network": (net.q_part_spearman_network, net.SQL_PART_SPEARMAN_NETWORK),
    "props_extract": (net.q_props_extract, net.SQL_PROPS_EXTRACT),
    "quantity_share_ppm": (rel.q_quantity_share_ppm, rel.SQL_QUANTITY_SHARE_PPM),
    "recency_score": (rel.q_recency_score, rel.SQL_RECENCY_SCORE),
    "recommend_docs": (vec.q_recommend_docs, vec.SQL_RECOMMEND_DOCS),
    "regional_revenue": (rel.q_regional_revenue, rel.SQL_REGIONAL_REVENUE),
    "rolling_active_users": (ev.q_rolling_active_users, ev.SQL_ROLLING_ACTIVE_USERS),
    "sessionize": (net.q_sessionize, net.SQL_SESSIONIZE),
    "signup_before_purchase": (ev.q_signup_before_purchase, ev.SQL_SIGNUP_BEFORE_PURCHASE),
    "simhash": (tx.q_simhash, tx.SQL_SIMHASH),
    "user_event_window_stats": (ev.q_user_event_window_stats, ev.SQL_USER_EVENT_WINDOW_STATS),
    "welch_halves": (ev.q_welch_halves, ev.SQL_WELCH_HALVES),
    "wilcoxon_brand_price": (st.q_wilcoxon_brand_price, st.SQL_WILCOXON_BRAND_PRICE),
    # latest driver row: r08
    "anova_brand_quantity": (th.q_anova_brand_quantity, th.SQL_ANOVA_BRAND_QUANTITY),
    "answer_confidence_docs": (ex.q_answer_confidence_docs, ex.SQL_ANSWER_CONFIDENCE_DOCS),
    "basket_rules": (net.q_basket_rules, net.SQL_BASKET_RULES),
    "bh_adjust_windowed": (ev.q_bh_adjust_windowed, ev.SQL_BH_ADJUST),
    "bigram_logprob": (tx.q_bigram_logprob, tx.SQL_BIGRAM_LOGPROB),
    "bloom_dedup_batch": (tx.q_bloom_dedup_batch, tx.SQL_BLOOM_DEDUP_BATCH),
    "bm25_batch": (vec.q_bm25_batch, vec.SQL_BM25_BATCH),
    "bpe_train_merges": (tx.q_bpe_train_merges, tx.SQL_BPE_TRAIN_MERGES),
    "cell_cycle_phase": (sc.q_cell_cycle_phase, sc.SQL_CELL_CYCLE_PHASE),
    "citation_network_docs": (cit.q_citation_network_docs, cit.SQL_CITATION_NETWORK_DOCS),
    "citation_trends_docs": (cit.q_citation_trends_docs, cit.SQL_CITATION_TRENDS_DOCS),
    "cluster_silhouette_exact": (evl.q_cluster_silhouette_exact, evl.SQL_CLUSTER_SILHOUETTE_EXACT),
    "dedup_components": (tx.q_dedup_components, tx.SQL_DEDUP_COMPONENTS),
    "discovered_keywords": (cov.q_discovered_keywords, cov.SQL_DISCOVERED_KEYWORDS),
    "doc_chunks": (tx.q_doc_chunks, tx.SQL_DOC_CHUNKS),
    "doc_rule_scores": (st.q_doc_rule_scores, st.SQL_DOC_RULE_SCORES),
    "doublet_scores": (sc.q_doublet_scores, sc.SQL_DOUBLET_SCORES),
    "dsir_scores": (tx.q_dsir_scores, tx.SQL_DSIR_SCORES),
    "dup_token_fraction": (tx.q_dup_token_fraction, tx.SQL_DUP_TOKEN_FRACTION),
    "event_value_quantiles": (ev.q_event_value_quantiles, ev.SQL_EVENT_VALUE_QUANTILES),
    "explain_docs": (ex.q_explain_docs, ex.SQL_EXPLAIN_DOCS),
    "garbled_docs": (cl.q_garbled_docs, cl.SQL_GARBLED_DOCS),
    "gene_confidence_docs": (ex.q_gene_confidence_docs, ex.SQL_GENE_CONFIDENCE_DOCS),
    "gene_symbols_mapped": (st.q_gene_symbols_mapped, st.SQL_GENE_SYMBOLS_MAPPED),
    "high_impact_docs": (cov.q_high_impact_docs, cov.SQL_HIGH_IMPACT_DOCS),
    "hvg_parts": (st.q_hvg_parts, st.SQL_HVG_PARTS),
    "ivf_recall": (vec.q_ivf_recall, vec.SQL_IVF_RECALL),
    "keyword_growth_docs": (cov.q_keyword_growth_docs, cov.SQL_KEYWORD_GROWTH_DOCS),
    "landmark_docs": (cit.q_landmark_docs, cit.SQL_LANDMARK_DOCS),
    "paper_quality_docs": (cov.q_paper_quality_docs, cov.SQL_PAPER_QUALITY_DOCS),
    "paper_trend_scores": (cit.q_paper_trend_scores, cit.SQL_PAPER_TREND_SCORES),
    "pathway_mentions_docs": (cov.q_pathway_mentions_docs, cov.SQL_PATHWAY_MENTIONS_DOCS),
    "prediction_recs_docs": (ex.q_prediction_recs_docs, ex.SQL_PREDICTION_RECS_DOCS),
    "pubmed_parse_docs": (cit.q_pubmed_parse_docs, cit.SQL_PUBMED_PARSE_DOCS),
    "qa_context_docs": (ex.q_qa_context_docs, ex.SQL_QA_CONTEXT_DOCS),
    "query_filtered_docs": (cit.q_query_filtered_docs, cit.SQL_QUERY_FILTERED_DOCS),
    "ref_quantile_dims": (st.q_ref_quantile_dims, st.SQL_REF_QUANTILE_DIMS),
    "related_docs": (cit.q_related_docs, cit.SQL_RELATED_DOCS),
    "sample_conditions": (sc.q_sample_conditions, sc.SQL_SAMPLE_CONDITIONS),
    "seasonal_decompose": (ev.q_seasonal_decompose, ev.SQL_SEASONAL_DECOMPOSE),
    "semdedup_auto": (vec.q_semdedup_auto, vec.SQL_SEMDEDUP_AUTO),
    "shap_gene_stats_dims": (st.q_shap_gene_stats_dims, st.SQL_SHAP_GENE_STATS_DIMS),
    "shap_top_genes_dims": (st.q_shap_top_genes_dims, st.SQL_SHAP_TOP_GENES_DIMS),
    "split_header_docs": (sc.q_split_header_docs, sc.SQL_SPLIT_HEADER_DOCS),
    "trend_census": (cov.q_trend_census, cov.SQL_TREND_CENSUS),
    "trend_primary_docs": (cov.q_trend_primary_docs, cov.SQL_TREND_PRIMARY_DOCS),
    "wealthy_inactive_customers": (
        th.q_wealthy_inactive_customers,
        th.SQL_WEALTHY_INACTIVE_CUSTOMERS,
    ),
    "zscore_recal_values": (st.q_zscore_recal_values, st.SQL_ZSCORE_RECAL_VALUES),
    # rows-only-by-design park (principled exemptions — label_map_2d:
    # the 2D projection is a declared driver-side boundary;
    # compression_ratio: zlib is not expressible in DuckDB SQL, pinned
    # by unit tests vs Python zlib instead):
    "label_map_2d": (vec.q_label_map_2d, None),
    "compression_ratio": (tx.q_compression_ratio, None),
}

def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _sql) in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (fn, sql) in CATALOG.items() if sql is not None}
