"""Physical-plan regression tests — the scale contract, asserted.

Correctness says WHAT each query returns; these tests pin HOW: filters reach
the parquet scan, dimension joins broadcast, top-k compiles to
TakeOrderedAndProject, and — across the ENTIRE catalog — no operator ever
falls back to a row-at-a-time Python UDF (BatchEvalPython). Python appears
only as Arrow-batched stages (ArrowEvalPython / MapInPandas /
FlatMapGroupsInPandas), which is the engine's UDF policy (SURVEY §4.3(4))."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL
from vectordb_bioinsight_spark.plans.catalog import CATALOG


def _plan(spark, name: str) -> str:
    df = CATALOG[name][0](spark, SF_SMALL)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "pricing_summary")
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters", 1)[1][:200]


def test_column_pruning_on_wide_table(spark):
    plan = _plan(spark, "top_brand_revenue")
    # lineitem scan must NOT read unused columns like l_comment-ish fields;
    # assert the ReadSchema keeps only what the query needs
    read = plan.split("ReadSchema", 1)[1][:250]
    assert "l_partkey" in read and "l_extendedprice" in read
    assert "l_shipdate" not in read and "l_returnflag" not in read


def test_dimension_joins_broadcast(spark):
    for name in ["top_brand_revenue", "cnv_deviation", "wilcoxon_brand_price"]:
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name


def test_topk_compiles_to_take_ordered(spark):
    for name in ["knn_cosine", "top_orders", "hvg_parts", "news_headline",
                 "aggregator_headline", "landmark_docs"]:
        plan = _plan(spark, name)
        assert "TakeOrderedAndProject" in plan, name


def test_no_cartesian_in_equi_join_queries(spark):
    # similarity/corr queries are blocked/equi-joined — a CartesianProduct
    # would mean the blocking key was lost
    for name in ["embedding_neardup", "part_correlation_network", "word_cooccurrence"]:
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_no_row_at_a_time_python_udf_anywhere(spark, name):
    """The whole catalog: Python only as Arrow-batched stages, never
    BatchEvalPython (pickled row loop, 10-100x slower)."""
    plan = _plan(spark, name)
    assert "BatchEvalPython" not in plan, name


def test_bloom_membership_is_arrow_batched(spark):
    """with_bloom_hit's bit test is an Arrow pandas UDF over JVM-computed
    probe positions — the intermediate stage (pre-anti-join, so invisible to
    the catalog-entry plans) must never regress to BatchEvalPython."""
    from pyspark.sql import functions as F

    from vectordb_bioinsight_spark.functions.hashing import portable_hash64
    from vectordb_bioinsight_spark.operators.bloom import build_bloom, with_bloom_hit

    df = spark.range(64).select(
        portable_hash64(F.col("id").cast("string")).alias("h")
    )
    bm = build_bloom(df, "h", 1024, 5)
    plan = with_bloom_hit(df, "h", bm, 1024, 5)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


def _n_scans(plan: str) -> int:
    """Count physical scans once — formatted explain mentions each node in
    both the tree and the details section."""
    import re as _re

    return len(_re.findall(r"^\(\d+\) Scan parquet", plan, _re.MULTILINE))


#: Exchange-count ceilings for the 10 most expensive headline bench queries
#: (BENCH_r03 ranking). The r02->r03 bench tail drifted +0.2 s on a few
#: queries with UNCHANGED plans (JVM warm-up noise); these pins make a real
#: plan regression (an extra shuffle) distinguishable from that noise.
#: Values are the measured counts at the time of pinning — a new Exchange
#: anywhere in these plans must be a deliberate, reviewed change.
_MAX_EXCHANGES = {
    "semdedup": 5,
    "cms_term_counts": 3,
    "doublet_scores": 4,
    "wilcoxon_brand_price": 2,
    "hybrid_rrf": 3,
    "dsir_scores": 5,
    "minhash_signatures": 1,
    # bh_adjust_scaled's rank phases run as separate jobs before the final
    # lineage, so the final plan shows 0-1 exchanges
    "bh_adjust": 1,
    "ngram_decontaminate": 3,
    "span_cut_docs": 4,
    # r04 additions (audited at pin time)
    "bpe_encode_docs": 0,  # pure scan-local — ANY exchange is a regression
    "vocab_dispatch_list": 4,
    "vocab_dispatch_keywords": 4,
    # single-pass members: ONE corpus kNN (checkpointed), then 3 small
    # member aggs + vote windows — more exchange NODES than the naive
    # 3-join form, but each moves the tiny neighbor table, never the corpus
    "knn_vote_ensemble": 9,
    # r04 session-3 web-hygiene tier (audited via scripts/explain_catalog.py):
    # the repair/segmentation projections are scan-local — ANY exchange is a
    # regression; the rest are groupBy/window/sort shapes over bounded outputs
    "web_clean_docs": 0,
    "sentence_split_docs": 0,
    "curriculum_shards_docs": 1,   # the shard-window shuffle
    "shard_manifest_docs": 2,      # shard window + final O(shards) sort
    "url_domain_stats": 3,         # multi-distinct agg + O(domains) sort
    # r05 additions (VERDICT r04 tasks 1-2): the funnel rewrite is ONE
    # corpus-sized shuffle (the per-user fold's groupBy) + the 1-row
    # global depth agg; every step count/conversion inlines from that row;
    # ivfpq_knn's FINAL lineage is scan-local — its codebook/centroid
    # fitting runs as separate bounded jobs before this plan, so any
    # exchange appearing here means the assignment join regressed
    "funnel_conversion": 2,
    "ivfpq_knn": 0,
    "gsea_brand_es": 5,
    # r05 session-2 additions (audited at pin time). centroid_importance
    # is len(dims)+1 scoring passes over the exploded frame — the count
    # scales with the dims parameter (3 here), each pass dimension-keyed;
    # the shared centroid table is checkpoint-materialized once
    "centroid_importance": 21,
    "cohort_retention": 6,
    "touch_attribution": 6,
    "chat_render_docs": 1,     # ONE conversation-keyed shuffle, window+agg share it
    "seasonal_decompose": 6,
    "event_transitions": 3,
    "kaplan_meier": 5,
    "target_encode_supplier": 3,
    "preference_pairs_docs": 1,
    "value_moments_merged": 2,
    "embedding_dim_profile": 2,
    # r05 session-4 additions (audited at pin time). binq_knn's corpus
    # scan is the codes table only; the 8 exchanges move the 64-row
    # threshold dim, the k-row shortlist, and the bounded rerank frames.
    # part_link_prediction is 10 AFTER the fan-out checkpoints (was 54
    # with unmaterialized lineage). woe_iv's 7 are all 1-row/bounded
    # total folds.
    "binq_knn": 8,
    "binq_codes": 3,
    "ship_overlap_annotation": 3,
    "value_hist_quantiles": 3,
    "part_link_prediction": 10,
    # 4 after the fold rewrite: word-stat groupBy, per-doc map fold,
    # map join, dedupe — all doc-keyed; the token-position window that
    # cost 100 s/1M docs is gone (SCALING rule 36)
    "rake_keyphrases": 4,
    "session_paths": 2,
    "purchase_woe_iv": 7,
    "daily_trend_ols": 3,
    "holt_backtest_daily": 2,
    # r06 additions (audited at pin time). sq8_codes: dim-range agg +
    # per-id reassembly. maxsim_ivf_docs: the frozen-centroid argmin is
    # scan-local codegen; the 4 exchanges move the 8-row probe set, the
    # pruned doc ids, and the bounded rescore frames. cusum: daily agg,
    # key-stats broadcast-back, per-key fold collect, explode — all
    # key-bounded. whitened: one dim-keyed agg after the mapInPandas
    # moment partials. psi: 11 nodes but the corpus touches only the two
    # fact-side bin aggs; spine/null/window frames are <= n_bins rows.
    # item_cf: basket self-join + counts dim + symmetrize + per-item rank.
    "sq8_codes": 2,
    "maxsim_docs": 2,
    "maxsim_ivf_docs": 4,
    "cusum_value_shifts": 4,
    "whitened_dim_profile": 1,
    "value_psi_drift": 11,
    # 15 after the r07 lazy basket cap (ADVICE r06): cooccurrence_edges'
    # rank window now sits unconditionally in-plan, so each pairs-derived
    # branch (self-join sides + item counts) carries it — the window
    # SHUFFLE is written once and ReusedExchange'd; the old version's 11
    # hid an eager full-fact-table guard job outside the plan
    "item_cf_parts": 15,
    # r06 gap-closing tier (audited at pin time). The paper-insights
    # entries are PURE SCAN-LOCAL expression trees — any exchange is a
    # regression. garbled: the one doc-keyed stats groupBy. trend match
    # (r08 Arrow kernel): the primary pick happens INSIDE the batch
    # scorer, so primary is shuffle-FREE and census keeps only its
    # rollup agg. validation: the brand agg's distinct-journal expand
    # pair; the three dims (part/supplier/orders-at-this-SF) broadcast.
    "garbled_docs": 1,
    "trend_primary_docs": 0,
    "trend_census": 1,
    "paper_quality_docs": 0,
    "paper_outcomes_docs": 0,
    "paper_population_docs": 0,
    "trend_validation_brands": 2,
    # news prioritizer: pure scan-local scoring; the headline pick is
    # TakeOrderedAndProject (asserted below), never a full sort
    "news_priority_docs": 0,
    "news_headline": 0,
    # hybrid hot topics: three topic-keyed count aggs (today/yesterday/
    # week) over the broadcast keyword dim; emerging: two keyword-keyed
    # count aggs. Both reports end in TakeOrdered, never a full sort.
    "hot_topic_trends": 3,
    "emerging_keywords_docs": 2,
    "fda_feed_classified": 0,  # pure scan-local classification
    # research validation: summary/claim are one paper-/claim-keyed agg
    # after broadcast joins; consistency's 9 are the corpus-sized
    # (paper, section, dim) mean agg ONCE, then sections-distinct /
    # count / two resolution windows / mean self-joins / pair sums —
    # every post-mean stage bounded by papers x sections (<= 5/paper)
    "summary_validation_docs": 1,
    "claim_support_docs": 1,
    "paper_consistency_docs": 9,
    # gap mining: the per-(doc, type) cap window; priority adds the
    # source totals agg + evidence agg (both type/source-bounded)
    "gap_sentences_docs": 1,
    "research_gap_priority": 3,
    # keyword discovery: one keyword-keyed count agg (+ the growth
    # split's second period agg and full-outer join)
    "discovered_keywords": 1,
    "keyword_growth_docs": 2,
    # r07 additions (audited at pin time). dataset_type: ONE corpus-sized
    # cell aggregation, then the two-distinct shape agg expands over the
    # bounded cell table (+ KB-scale hint aggs). The briefing ladders are
    # pure scan-local — any exchange is a regression; the headline pick
    # is TakeOrderedAndProject (asserted below). approx_distinct: the
    # bounded (group x 256)-register agg + the estimate fold. rolling:
    # daily exact agg, register agg, served-day merge, estimate, join —
    # all register-bounded after the first two.
    "dataset_type": 6,
    # three bounded per-gene evidence aggs + the full-outer gene join;
    # the ladder itself is scan-local
    "integrated_drivers": 4,
    # broadcast dim join + scan-local ladders + union: ANY exchange is a
    # regression
    "driver_tracks": 0,
    # corpus-enrichment extractors + quality scorer: pure scan-local
    "gene_mentions_docs": 0,
    "pathway_mentions_docs": 0,
    "paper_quality_score_docs": 0,
    # silhouettes: centroid agg (labels x dim) + broadcast-back + one
    # label mean (simplified); the exact twin's self-join is a broadcast
    # nested loop over the bounded diagnostic sample + two bounded aggs
    "cluster_silhouette": 4,
    "cluster_silhouette_exact": 3,
    # multiclass report: the checkpointed confusion table feeds five
    # consumers — every exchange after it is classes^2-bounded
    "classification_report_events": 8,
    # DB/CH indices: checkpointed centroid + per-label frames (corpus
    # scanned twice at build); all final exchanges k-bounded
    "cluster_quality_indices": 7,
    "article_type_docs": 0,
    "high_impact_docs": 0,
    "aggregator_headline": 0,
    "approx_distinct_users": 2,
    "rolling_active_users": 5,
    # citation-analytics tier (audited at pin time). landmark: scan-local
    # ladder + global top-20 (TakeOrderedAndProject, asserted below) —
    # ANY exchange is a regression. trends: (cited, year) groupBy + the
    # cited-keyed peak window. network: id-keyed node/edge aggs + the
    # citer-vs-reference anti-join, every post-agg frame per-paper-
    # bounded. related: the (center, related) dedup window + the
    # center-keyed rank window.
    "landmark_docs": 0,
    "citation_trends_docs": 2,
    "citation_network_docs": 7,
    # 1 after the lag-dedup rewrite (SCALING rule 42): the dedup shares
    # the rank window's center-keyed shuffle
    "related_docs": 1,
    # rule-based explanation tier: pure scan-local expression trees
    # (keyword contains-chains, regex gene extraction, string assembly) —
    # ANY exchange is a regression
    "explain_docs": 0,
    "gene_confidence_docs": 0,
    "prediction_recs_docs": 0,
    # QA retrieval path: ONE query-keyed shuffle shared by the any-pass
    # window, the renumber window, and the context groupBy
    "qa_context_docs": 1,
    "answer_confidence_docs": 0,
    # summary parser: ZERO exchanges since the r09 Arrow kernel — the
    # fold is per-document, so the section struct is one more column on
    # the scan (the expression form paid an explode + doc-keyed window +
    # pivot + broadcast join to express a per-row computation)
    "summary_parse_docs": 0,
    # domain adaptation: ONE per-sample rank shuffle + broadcast ref
    # join; the recalibration's global stats row broadcasts back
    "ref_quantile_dims": 1,
    "zscore_recal_values": 1,
    # SHAP aggregation: gene agg + the genes-bounded rank window; the
    # per-sample top-k shares one sample-keyed shuffle
    "shap_gene_stats_dims": 2,
    "shap_top_genes_dims": 1,
    # crawler paper scoring: the velocity groupBy (paper-keyed, partial-
    # aggregable); the query filter's scan windows share one group-keyed
    # shuffle
    "paper_trend_scores": 1,
    "query_filtered_docs": 1,
    # PubMed XML parse: pure scan-local xpath expressions — ANY exchange
    # is a regression
    "pubmed_parse_docs": 0,
    # upload preprocessing: pure scan-local ladders / line unrolls
    "sample_conditions": 0,
    "split_header_docs": 0,
    # gene-ID pair: the detection head is a bounded top-100 + 1-row agg
    # (TakeOrdered, no exchange); the mapping is one broadcast dim join
    "gene_id_format": 0,
    "gene_symbols_mapped": 0,
}


@pytest.mark.parametrize("name", sorted(_MAX_EXCHANGES))
def test_expensive_query_shuffle_count_pinned(spark, name):
    import re as _re

    # another test may have .cache()d an input table; an InMemoryTableScan
    # changes the exchange structure, so pin against the uncached plan
    spark.catalog.clearCache()
    plan = _plan(spark, name)
    n_ex = len(_re.findall(r"^\(\d+\) Exchange", plan, _re.MULTILINE))
    assert n_ex <= _MAX_EXCHANGES[name], (
        f"{name}: {n_ex} exchanges > pinned {_MAX_EXCHANGES[name]} — a new "
        "shuffle entered this plan; fix it or consciously re-pin"
    )


def test_multi_join_broadcasts_all_dims(spark):
    """Q7 shape: every dimension join (nation x2, supplier, and — at this
    size — customer via AQE) must be a broadcast; only the lineitem↔orders
    path may shuffle. No SortMergeJoin against a dimension."""
    plan = _plan(spark, "nation_volume_flow")
    assert plan.count("BroadcastHashJoin") >= 3, plan.count("BroadcastHashJoin")
    assert "CartesianProduct" not in plan


def test_disjunctive_predicate_single_scan(spark):
    """Q19 shape: the OR-of-ANDs must stay one lineitem scan (no union of
    three filtered scans)."""
    plan = _plan(spark, "disjunctive_revenue")
    assert _n_scans(plan) == 2  # lineitem + part, once each
    assert "Union" not in plan


def test_grouping_sets_single_expand(spark):
    """GROUPING SETS compiles to one Expand + one aggregate, not a union of
    re-scans per set."""
    plan = _plan(spark, "grouping_sets_revenue")
    assert "Expand" in plan
    assert _n_scans(plan) == 1


def test_setops_compile_to_joins(spark):
    """INTERSECT/EXCEPT become (semi/anti) hash joins, never nested loops."""
    plan = _plan(spark, "part_year_setops")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_anti_join_for_inactive_customers(spark):
    """Q22 shape: NOT EXISTS must plan as an anti join."""
    plan = _plan(spark, "wealthy_inactive_customers")
    assert "LeftAnti" in plan


def test_q3_shape_pushdown_broadcast_topk(spark):
    """Q3 shape: both date filters reach their scans, the filtered customer
    dim broadcasts, and the top-10 is TakeOrderedAndProject."""
    plan = _plan(spark, "segment_top_orders")
    assert plan.count("PushedFilters: [") >= 2
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_q6_shape_is_one_scan_with_pushdown(spark):
    """Q6 shape: the whole query is a single lineitem scan; every predicate
    is in PushedFilters (the 100 TB I/O lower bound)."""
    plan = _plan(spark, "discount_band_revenue")
    assert _n_scans(plan) == 1
    pushed = plan.split("PushedFilters", 1)[1][:400]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed


def test_q8_q9_shapes_broadcast_every_dimension(spark):
    """Q8/Q9 shapes: no dimension ever sort-merge-joins — nation/region/
    part/supplier all broadcast; shuffles only between facts."""
    for name in ["nation_market_share", "nation_profit"]:
        plan = _plan(spark, name)
        assert plan.count("BroadcastHashJoin") >= 3, name
        assert "CartesianProduct" not in plan, name


def test_q16_shape_antijoin_and_partial_distinct(spark):
    """Q16 shape: NOT-IN debtor exclusion plans as a broadcast anti join and
    the distinct-count runs two-phase (partial_count(distinct ...))."""
    plan = _plan(spark, "part_supplier_diversity")
    assert "LeftAnti" in plan
    assert "count(distinct" in plan.lower()


def test_q20_shape_reuses_aggregate_no_rescan(spark):
    """Q20 shape: pair and part totals come from ONE widget-filtered lineitem
    scan pipeline (2 scans total incl. the semi-join probe side, not 3+)."""
    plan = _plan(spark, "dominant_shippers")
    assert "CartesianProduct" not in plan


def test_quality_classifier_has_no_shuffle(spark):
    """The classifier gate is a pure scan-local projection — no Exchange
    anywhere in the plan."""
    plan = _plan(spark, "quality_classifier")
    assert "Exchange" not in plan
    assert "Scan parquet" in plan


def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark gram inventory must be the broadcast side; the corpus
    gram stream must never shuffle before the semi-match."""
    plan = _plan(spark, "ngram_decontaminate")
    assert "BroadcastHashJoin" in plan


def test_winsorize_and_robust_broadcast_bounds(spark):
    for name in ["winsorize_values", "robust_scale_values"]:
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name


def test_skew_profile_topk_is_take_ordered(spark):
    plan = _plan(spark, "user_skew_profile")
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_is_take_ordered(spark):
    """Priority-key top-k: per-partition heaps, never a global sort, and
    the scan-local key projection adds no shuffle of its own."""
    plan = _plan(spark, "weighted_sample_docs")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_cms_sketch_join_broadcasts(spark):
    plan = _plan(spark, "cms_term_counts")
    assert "BroadcastHashJoin" in plan


def test_ivfpq_scan_reads_codes_not_vectors(spark):
    """The ADC top-k is TakeOrdered over the probed member scan."""
    plan = _plan(spark, "ivfpq_knn")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


#: Catalog entries ALLOWED to contain an unpartitioned window in their
#: LOGICAL plan — each is provably bounded (documented at the operator):
#: RRF arms are top-fetch_k; funnel aggregates are len(steps) rows; the
#: bounded-pool rerank normalizer is top-k of an upstream retrieval; small-N
#: BH and preranked-GSEA convenience forms run on aggregated tables; 2D-map
#: id assignment is entity-bounded. A query OUTSIDE this list acquiring a
#: global window is a scale regression and fails here — this is the pin
#: VERDICT r03 asked for ("the warning count stops masking a real
#: regression").
_GLOBAL_WINDOW_ALLOWED = {
    "hybrid_rrf", "rerank_blend", "recommend_docs",
    "bh_adjust_windowed", "new_users_daily", "label_map_2d",
    # KM survival: cumulative windows over the week-cardinality lifetime
    # table (calendar-bounded); funnel_conversion LEFT this list in r05 —
    # the fold rewrite has no window at all
    "kaplan_meier",
    # rolling_active_users LEFT this list in r07: the replay-HLL rewrite
    # unions day registers by explode + groupBy, no window at all
    "retrieval_ndcg", "part_correlation_network", "part_spearman_network",
    "embedding_neardup", "hub_parts", "hub_blend_chain",
    "pseudotime_embeddings", "paga_labels", "knn_lsh_bucketed",
    "pivot_unpivot_roundtrip", "temperature_weights", "temperature_sample",
    "mixture_sample", "nation_market_share",
    # rank assignment over an orderBy().limit(top_n) result — the window
    # input is top_n rows by construction (operators/skew.py:105-112)
    "user_skew_profile",
    # same limit-then-rank shape (operators/vector.py::maxsim_topk,
    # operators/pq.py::sq8_adc_topk)
    "maxsim_docs", "sq8_adc_knn", "binq_knn",
    # PR curve / ECDF / PSI / skyline: one cumulative window over a
    # tie-grouped or bin/point-grouped frame — input bounded by score
    # cardinality (bucketed upstream), n_bins, or distinct points, never
    # raw rows (operators/evaluation.py, drift.py, intervals.py)
    "purchase_pr_curve", "purchase_ks_drift", "value_psi_drift",
    "part_price_size_frontier",
    # cumulative windows over CALENDAR-WEEK / n_buckets frames — input
    # bounded by the week count (the kaplan_meier shared risk frame) and
    # the decile count, never raw rows
    "nelson_aalen_churn", "purchase_gains",
    # limit-then-rank over the k-row MaxSim result (the maxsim_docs shape)
    "maxsim_ivf_docs",
    # global top-20 rank: Spark's rank-limit pushdown plans a
    # TakeOrderedAndProject(20) BELOW the window (pinned 0 exchanges +
    # TakeOrdered asserted above), so the window input is 20 rows
    "landmark_docs",
    # the status-card rank runs over the PER-GENE aggregate — input
    # bounded by the gene/feature dimension (64 here, ~20k genes at
    # most in the domain), never raw attribution rows
    "shap_gene_stats_dims",
    # r11 one-pass permutation importance: the base-vs-permuted assembly
    # window runs over the PER-FEATURE accuracy rows — ≤ len(dims)+1 rows
    # (a code parameter, 4 at the catalog entry; ≤ embedding width ever),
    # never data-sized; the data-sized argmin window stays partitioned by
    # (feature, id)
    "centroid_importance",
}


def _count_unpartitioned_windows(plan: str) -> int:
    """Count windowspecdefinition(...) occurrences with an EMPTY partition
    clause: the spec's args are partitionCols..., orderCols (with ASC/DESC
    markers)..., frame — so a spec whose FIRST top-level arg is an ordering
    expression or the frame itself has no partition keys."""
    n_bad = 0
    marker = "windowspecdefinition("
    start = 0
    while True:
        i = plan.find(marker, start)
        if i < 0:
            break
        j = i + len(marker)
        depth = 0
        first_arg = None
        for k in range(j, min(len(plan), j + 2000)):
            ch = plan[k]
            if ch == "(":
                depth += 1
            elif ch == ")" and depth > 0:
                depth -= 1
            elif (ch == "," or ch == ")") and depth == 0:
                first_arg = plan[j:k]
                break
        if first_arg is not None and (
            " ASC" in first_arg
            or " DESC" in first_arg
            or first_arg.startswith("specifiedwindowframe")
        ):
            n_bad += 1
        start = j
    return n_bad


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_no_new_unpartitioned_windows(spark, name):
    """Every catalog plan outside the documented-bounded allow-list must be
    free of single-partition windows in the optimized plan."""
    df = CATALOG[name][0](spark, SF_SMALL)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    n_bad = _count_unpartitioned_windows(plan)
    if name in _GLOBAL_WINDOW_ALLOWED:
        return  # documented bounded usage — presence is fine
    assert n_bad == 0, f"{name}: {n_bad} unpartitioned Window node(s) in plan"
