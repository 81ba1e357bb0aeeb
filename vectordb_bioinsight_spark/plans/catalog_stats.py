"""Stats / scoring / classification catalog additions: Wilcoxon rank-sum
markers (M11), hypergeometric enrichment contingency (M7), rule-ladder
document scoring (V8/V9/M8/W8), k-NN majority-vote classification (M10
analog), and highly-variable selection (A13)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.scoring import checklist_score, ladder_score
from vectordb_bioinsight_spark.operators.stats import (
    enrichment_contingency,
    variance_topk,
    wilcoxon_rank_sum,
)
from vectordb_bioinsight_spark.operators.vector import knn_classify
from vectordb_bioinsight_spark.sources.readers import load_table


def q_wilcoxon_brand_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M11 rank-genes-groups analog: per part-brand Wilcoxon rank-sum of
    extended price, returned (R) vs not — tie-corrected z from window ranks
    (agent_singlecell.py:2139-2225 semantics, distributed closed form)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    df = li.join(F.broadcast(part.select("p_partkey", "p_brand")), li.l_partkey == part.p_partkey)
    df = df.select("p_brand", "l_extendedprice", (F.col("l_returnflag") == "R").alias("is_ret"))
    return wilcoxon_rank_sum(df, ["p_brand"], "is_ret", "l_extendedprice")


SQL_WILCOXON_BRAND_PRICE = """
WITH li AS (
  SELECT p.p_brand, l.l_extendedprice AS v,
         CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS g
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), ranked AS (
  SELECT p_brand, v, g,
         rank() OVER (PARTITION BY p_brand ORDER BY v ASC)
           + (count(*) OVER (PARTITION BY p_brand, v) - 1) / 2.0 AS r
  FROM li
), agg AS (
  SELECT p_brand, count(*)::DOUBLE AS n, sum(g)::DOUBLE AS n_a,
         sum(CASE WHEN g = 1 THEN r END) AS r_a
  FROM ranked GROUP BY 1
), ties AS (
  SELECT p_brand, sum(t * t * t - t) AS tie_sum
  FROM (SELECT p_brand, v, count(*)::DOUBLE AS t FROM li GROUP BY 1, 2)
  GROUP BY 1
), stats AS (
  SELECT a.p_brand, a.n, a.n_a, (a.n - a.n_a) AS n_b,
         a.r_a - a.n_a * (a.n_a + 1.0) / 2.0 AS u,
         a.n_a * (a.n - a.n_a) / 12.0
           * ((a.n + 1.0) - t.tie_sum / (a.n * (a.n - 1.0))) AS var
  FROM agg a JOIN ties t USING (p_brand)
)
SELECT p_brand, n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
       round(u, 4) AS u_stat,
       round((u - n_a * n_b / 2.0) / sqrt(var), 6) AS z
FROM stats WHERE n_a > 0 AND n_b > 0 AND var > 0
"""


def q_brand_discount_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 over-representation contingency per brand: is a brand enriched
    among deep-discounted lineitems? (k, K, n, N, fold) — the Enrichr
    contingency re-expressed (agent3_pathway.py:148-202); the hypergeometric
    tail p is the ``enrichment_pvalues`` UDF tier (numpy-oracle-tested)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    df = li.join(F.broadcast(part.select("p_partkey", "p_brand")), li.l_partkey == part.p_partkey)
    df = df.select("p_brand", (F.col("l_discount") >= 0.08).alias("deep"))
    return enrichment_contingency(df, "p_brand", "deep")


SQL_BRAND_DISCOUNT_ENRICHMENT = """
WITH li AS (
  SELECT p.p_brand, CASE WHEN l.l_discount >= 0.08 THEN 1 ELSE 0 END AS f
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), per_group AS (
  SELECT p_brand, count(*)::BIGINT AS set_size, sum(f)::BIGINT AS overlap
  FROM li GROUP BY 1
), totals AS (
  SELECT count(*)::BIGINT AS pop_size, sum(f)::BIGINT AS n_draws FROM li
)
SELECT p_brand, overlap, set_size, n_draws, pop_size,
       round((overlap::DOUBLE / n_draws) / (set_size::DOUBLE / pop_size), 6) AS fold_enrichment
FROM per_group, totals
"""


def q_doc_rule_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V8/M8/W8: deterministic rule-ladder quality score per document —
    length ladder + language/keyword/source checklist, pure JVM expressions
    (core_paper_reranker.py:193-453 + agent4_validation.py:405-524 pattern)."""
    docs = load_table(spark, sf_dir, "documents")
    length_pts = ladder_score(F.col("n_chars"), [(200.0, 10.0), (300.0, 20.0)])
    checklist = checklist_score(
        [
            (F.col("lang") == "en", 15.0),
            (F.col("text").contains("vector"), 10.0),
            (F.col("source").isin("src0", "src1", "src2"), 5.0),
        ]
    )
    return docs.select(
        "doc_id",
        F.round(length_pts + checklist, 4).alias("quality_points"),
    )


SQL_DOC_RULE_SCORES = """
SELECT doc_id,
       round(
         (CASE WHEN n_chars >= 300 THEN 20.0 WHEN n_chars >= 200 THEN 10.0 ELSE 0.0 END)
         + (CASE WHEN lang = 'en' THEN 15.0 ELSE 0.0 END)
         + (CASE WHEN text LIKE '%vector%' THEN 10.0 ELSE 0.0 END)
         + (CASE WHEN source IN ('src0', 'src1', 'src2') THEN 5.0 ELSE 0.0 END)
       , 4) AS quality_points
FROM documents
"""


def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10 capability analog: 5-NN majority-vote label prediction for the 20
    query vectors vec_id % 25 == 0, against the full corpus (self excluded).
    Deterministic tie-breaks make it hash-matchable, unlike a trained model."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    return knn_classify(queries, emb, "vec_id", "vec_id", "embedding", "label", k=5)


SQL_KNN_CLASSIFY = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 25 = 0
), pairs AS (
  SELECT q.query_id, e.vec_id AS cand_id, e.label,
         unnest(e.embedding)::DOUBLE AS x, unnest(q.qv)::DOUBLE AS y
  FROM embeddings e, q WHERE e.vec_id <> q.query_id
), sums AS (
  SELECT query_id, cand_id, label,
         round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 6) AS score
  FROM pairs GROUP BY 1, 2, 3
), scored AS (
  SELECT query_id, cand_id, label, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, cand_id ASC) AS rn
  FROM sums
), votes AS (
  SELECT query_id, label, count(*)::BIGINT AS votes, round(sum(score), 6) AS vote_score
  FROM scored WHERE rn <= 5 GROUP BY 1, 2
)
SELECT query_id, label AS predicted_label, votes, vote_score
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY votes DESC, vote_score DESC, label ASC) AS pick
  FROM votes
) WHERE pick = 1
"""


def q_knn_vote_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10 ensemble analog (pancancer_classifier.py:702-1015 soft-vote +
    agreement + confidence bands): three kNN members (k = 3/5/7) emit
    per-label vote shares, the ensemble averages them, reports the argmax
    label, the fraction of members agreeing with it, and a
    high/medium/low confidence band. Every step is deterministic
    arithmetic, so the whole ensemble decision is hash-oracle-able —
    exactly the vote/agreement layer the trained-model tier
    (operators/ml_pipeline.ensemble_classifier) reuses."""
    from vectordb_bioinsight_spark.operators.ml_pipeline import (
        knn_vote_members,
        soft_vote_ensemble,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    members = knn_vote_members(
        queries, emb, "vec_id", "vec_id", "embedding", "label", ks=(3, 5, 7)
    )
    return soft_vote_ensemble(members)


SQL_KNN_VOTE_ENSEMBLE = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 25 = 0
), pairs AS (
  SELECT q.query_id, e.vec_id AS cand_id, e.label,
         unnest(e.embedding)::DOUBLE AS x, unnest(q.qv)::DOUBLE AS y
  FROM embeddings e, q WHERE e.vec_id <> q.query_id
), sums AS (
  SELECT query_id, cand_id, label,
         round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 6) AS score
  FROM pairs GROUP BY 1, 2, 3
), scored AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, cand_id ASC) AS rn
  FROM sums
), members AS (
  SELECT 0 AS model, 3 AS k UNION ALL SELECT 1, 5 UNION ALL SELECT 2, 7
), votes AS (
  SELECT m.model, s.query_id, s.label,
         round(count(*) / (m.k * 1.0), 6) AS prob,
         round(sum(s.score), 6) AS vote_score
  FROM scored s JOIN members m ON s.rn <= m.k
  GROUP BY 1, 2, 3, m.k
), picks AS (
  SELECT model, query_id, label AS pick FROM (
    SELECT *, row_number() OVER (PARTITION BY model, query_id
                                 ORDER BY prob DESC, vote_score DESC, label ASC) AS prn
    FROM votes
  ) WHERE prn = 1
), means AS (
  SELECT query_id, label,
         round(sum(prob) / 3.0, 6) AS mean_prob,
         round(sum(vote_score), 6) AS ts
  FROM votes GROUP BY 1, 2
), winners AS (
  SELECT query_id, label AS predicted_label, mean_prob FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY mean_prob DESC, ts DESC, label ASC) AS wrn
    FROM means
  ) WHERE wrn = 1
), agr AS (
  SELECT w.query_id, w.predicted_label, w.mean_prob,
         round(sum(CASE WHEN p.pick = w.predicted_label THEN 1.0 ELSE 0.0 END) / 3.0, 6) AS agreement
  FROM winners w JOIN picks p USING (query_id)
  GROUP BY 1, 2, 3
)
SELECT query_id, predicted_label, mean_prob, agreement,
       CASE WHEN mean_prob >= 0.8 THEN 'high'
            WHEN mean_prob >= 0.5 THEN 'medium'
            ELSE 'low' END AS confidence
FROM agr
"""


_CPI_DIMS = (0, 7, 32)  # 0-based input dims -> features 1/8/33
_CPI_BUCKETS = 64


def q_centroid_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M10 explanation tier (pancancer_classifier.py:1091-1534 SHAP
    analog, VERDICT r04 task 3): permutation importance over a
    nearest-centroid classifier on the embeddings table — centroids from
    the unpermuted data, per-feature accuracy drop after a deterministic
    within-bucket cyclic shift of that feature column. Pure relational
    arithmetic end to end, so the attribution itself is hash-checked
    against DuckDB."""
    from vectordb_bioinsight_spark.operators.ml_pipeline import (
        centroid_permutation_importance,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return centroid_permutation_importance(
        emb, "vec_id", "embedding", "label", dims=list(_CPI_DIMS),
        n_buckets=_CPI_BUCKETS,
    )


def _sql_centroid_importance() -> str:
    per_dim = []
    for d in _CPI_DIMS:
        f = d + 1
        per_dim.append(f"""
perm{f} AS (
  SELECT id, y, dim, x FROM ex WHERE dim <> {f}
  UNION ALL
  SELECT id, y, dim,
         coalesce(lead(x) OVER w, first_value(x) OVER w) AS x
  FROM ex WHERE dim = {f}
  WINDOW w AS (
    PARTITION BY (('0x' || substr(md5(id::VARCHAR), 1, 15))::BIGINT) % {_CPI_BUCKETS}
    ORDER BY ('0x' || substr(md5(id::VARCHAR), 1, 15))::BIGINT, id
  )
), dist{f} AS (
  SELECT e.id, e.y, c.label_c, round(sum((e.x - c.c) * (e.x - c.c)), 6) AS dist
  FROM perm{f} e JOIN cent c ON e.dim = c.dim GROUP BY 1, 2, 3
), acc{f} AS (
  SELECT {f} AS feature, round(avg((label_c = y)::INT::DOUBLE), 6) AS permuted_accuracy
  FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY dist ASC, label_c ASC) AS rn
    FROM dist{f}
  ) WHERE rn = 1
)""")
        # noqa: the CTE chain is assembled below
    accs = " UNION ALL ".join(f"SELECT * FROM acc{d + 1}" for d in _CPI_DIMS)
    return f"""
WITH ex AS (
  SELECT vec_id AS id, label AS y,
         generate_subscripts(embedding, 1) AS dim,
         unnest(embedding)::DOUBLE AS x
  FROM embeddings
), cent AS (
  SELECT y AS label_c, dim, round(avg(x), 6) AS c FROM ex GROUP BY 1, 2
), bdist AS (
  SELECT e.id, e.y, c.label_c, round(sum((e.x - c.c) * (e.x - c.c)), 6) AS dist
  FROM ex e JOIN cent c ON e.dim = c.dim GROUP BY 1, 2, 3
), bacc AS (
  SELECT round(avg((label_c = y)::INT::DOUBLE), 6) AS base_accuracy
  FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY dist ASC, label_c ASC) AS rn
    FROM bdist
  ) WHERE rn = 1
),{",".join(per_dim)}
SELECT a.feature, b.base_accuracy, a.permuted_accuracy,
       round(b.base_accuracy - a.permuted_accuracy, 6) AS importance
FROM ({accs}) a CROSS JOIN bacc b
"""


SQL_CENTROID_IMPORTANCE = _sql_centroid_importance()


def q_hvg_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 HVG selection analog: top-20 parts by sample variance of their
    per-order quantities (preprocessor.py:102-106 var(axis=1).nlargest)."""
    li = load_table(spark, sf_dir, "lineitem")
    return variance_topk(li.select(F.col("l_partkey"), "l_quantity"), ["l_partkey"], "l_quantity", k=20)


SQL_HVG_PARTS = """
SELECT l_partkey, round(var_samp(l_quantity), 4) AS variance, count(*)::BIGINT AS n_obs
FROM lineitem GROUP BY 1
ORDER BY variance DESC, l_partkey ASC LIMIT 20
"""


def q_gsea_brand_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preranked GSEA enrichment score per brand "gene set": are a brand's
    parts enriched toward the top of the retail-price ranking? Routed
    through the SCALE implementation (gsea_prerank_es_scaled: two-phase
    range rank + hits-only compressed walk, no global window, no N x S
    grid) — exact equivalence with the fixed version is test-pinned."""
    from vectordb_bioinsight_spark.operators.stats import gsea_prerank_es_scaled

    part = load_table(spark, sf_dir, "part")
    ranked = part.select(
        F.col("p_partkey").alias("gene"), F.col("p_retailprice").alias("stat")
    )
    membership = part.select(
        F.col("p_brand").alias("gene_set"), F.col("p_partkey").alias("gene")
    )
    return gsea_prerank_es_scaled(ranked, "gene", "stat", membership, "gene_set")


SQL_GSEA_BRAND_ES = """
WITH g AS (
  SELECT p_partkey AS gene, p_retailprice::DOUBLE AS stat,
         row_number() OVER (ORDER BY p_retailprice DESC, p_partkey ASC) AS r
  FROM part
), sets AS (
  SELECT DISTINCT p_brand AS s FROM part
), mem AS (
  SELECT DISTINCT p_brand AS s, p_partkey AS gene FROM part
), grid AS (
  SELECT sets.s, g.gene, g.stat, g.r,
         CASE WHEN mem.gene IS NULL THEN 0 ELSE 1 END AS hit
  FROM g CROSS JOIN sets
  LEFT JOIN mem ON mem.s = sets.s AND mem.gene = g.gene
), consts AS (
  SELECT s, gene, stat, r, hit,
         count(*) OVER (PARTITION BY s) AS n,
         sum(hit) OVER (PARTITION BY s) AS ns,
         sum(abs(stat) * hit) OVER (PARTITION BY s) AS nr
  FROM grid
), walk AS (
  SELECT s, r, n, ns,
         round(sum(CASE WHEN hit = 1 THEN abs(stat) / nullif(nr, 0)
                        ELSE -1.0 / nullif(n - ns, 0) END)
               OVER (PARTITION BY s ORDER BY r), 6) AS run
  FROM consts
)
SELECT s AS gene_set, n::BIGINT AS n_genes, ns::BIGINT AS n_hits,
       run AS es, r::BIGINT AS rank_at_peak
FROM (
  SELECT *, row_number() OVER (PARTITION BY s ORDER BY abs(run) DESC, r ASC) AS pk
  FROM walk
) WHERE pk = 1
"""


def q_volcano_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volcano-plot data contract (agent5_visualization's DEG volcano,
    re-expressed): per part type, log2 fold change of even- vs odd-key
    mean price with the Welch t as the significance axis, classified
    up / down / ns. The t axis keeps the driver row SQL-exact; the
    p-value/padj variant is the same plan + the scipy-oracled t sf."""
    from vectordb_bioinsight_spark.functions.stats import welch_t
    from vectordb_bioinsight_spark.operators.stats import group_moments

    part = load_table(spark, sf_dir, "part").withColumn(
        "grp", F.when(F.col("p_partkey") % 2 == 0, "a").otherwise("b")
    )
    m = group_moments(part, ["p_type"], "grp", "p_retailprice", "a", "b")
    t = welch_t(
        F.col("mean_a"), F.col("var_a"), F.col("n_a"),
        F.col("mean_b"), F.col("var_b"), F.col("n_b"),
    )
    lfc = F.log2(F.col("mean_a") / F.col("mean_b"))
    out = m.select(
        "p_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(lfc, 6).alias("log2fc"),
        F.round(t, 6).alias("t_stat"),
    )
    # thresholds calibrated to the synthetic price spread so every SF
    # yields a MIX of categories (an all-ns result would be the vacuous
    # pass VERDICT r02 flagged on keyword_and_match)
    return out.withColumn(
        "category",
        F.when((F.col("log2fc") >= 0.001) & (F.col("t_stat") >= 0.25), "up")
        .when((F.col("log2fc") <= -0.001) & (F.col("t_stat") <= -0.25), "down")
        .otherwise("ns"),
    )


SQL_VOLCANO_PARTS = """
WITH m AS (
  SELECT p_type,
         count(CASE WHEN p_partkey % 2 = 0 THEN 1 END)::BIGINT AS n_a,
         count(CASE WHEN p_partkey % 2 <> 0 THEN 1 END)::BIGINT AS n_b,
         avg(CASE WHEN p_partkey % 2 = 0 THEN p_retailprice END) AS mean_a,
         var_samp(CASE WHEN p_partkey % 2 = 0 THEN p_retailprice END) AS var_a,
         avg(CASE WHEN p_partkey % 2 <> 0 THEN p_retailprice END) AS mean_b,
         var_samp(CASE WHEN p_partkey % 2 <> 0 THEN p_retailprice END) AS var_b
  FROM part GROUP BY p_type
), s AS (
  SELECT p_type, n_a, n_b,
         round(log2(mean_a / mean_b), 6) AS log2fc,
         round((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b), 6) AS t_stat
  FROM m
)
SELECT p_type, n_a, n_b, log2fc, t_stat,
       CASE WHEN log2fc >= 0.001 AND t_stat >= 0.25 THEN 'up'
            WHEN log2fc <= -0.001 AND t_stat <= -0.25 THEN 'down'
            ELSE 'ns' END AS category
FROM s
"""


def q_heatmap_top_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The expression-heatmap data contract (agent5_visualization.py:535-640:
    top-DEG x sample matrix, row-wise z-scored with the 1e-10 epsilon):
    top-20 highest-variance parts x return-flag pseudo-samples, cell =
    mean extended price, z per part row. Long format (never pivoted);
    one HVG top-k + one cell agg + one broadcast-back z expression."""
    from vectordb_bioinsight_spark.operators.stats import (
        rowwise_zscore_matrix,
        variance_topk,
    )

    li = load_table(spark, sf_dir, "lineitem")
    top = variance_topk(
        li.select("l_partkey", "l_quantity"), ["l_partkey"], "l_quantity", k=20
    ).select("l_partkey")
    cells = (
        li.join(F.broadcast(top), "l_partkey")
        .groupBy("l_partkey", "l_returnflag")
        .agg(F.round(F.avg("l_extendedprice"), 4).alias("value"))
    )
    return rowwise_zscore_matrix(cells, "l_partkey", "l_returnflag", "value")


SQL_HEATMAP_TOP_PARTS = """
WITH hvg AS (
  SELECT l_partkey FROM (
    SELECT l_partkey, round(var_samp(l_quantity), 4) AS variance
    FROM lineitem GROUP BY 1
    ORDER BY variance DESC, l_partkey ASC LIMIT 20
  )
), cells AS (
  SELECT l.l_partkey, l.l_returnflag, round(avg(l.l_extendedprice), 4) AS value
  FROM lineitem l JOIN hvg USING (l_partkey)
  GROUP BY 1, 2
), stats AS (
  SELECT l_partkey, avg(value) AS m, coalesce(stddev_samp(value), 0.0) AS s
  FROM cells GROUP BY 1
)
SELECT c.l_partkey, c.l_returnflag, c.value,
       round((c.value - t.m) / (t.s + 1e-10), 6) AS zscore
FROM cells c JOIN stats t USING (l_partkey)
"""


def q_ab_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B test over the events stream: users split into
    arms by id parity, conversion = >= 14 purchases; per-arm rates +
    pooled z (operators/stats.py::ab_test_summary, closed-form JVM
    arithmetic).

    Planted threshold (r10 all-NULL census): the original conv =
    ">= 1 purchase" converted EVERY user at EVERY SF (per-user event
    density is SF-invariant in the synthetic data: purchases/user mean
    ~13.4 at all three SFs, median 14/13/13 at sf0.001/0.01/0.1), so
    the pooled rate was 1.0 and z_stat was NULL everywhere — both
    engines agreed on a column the expression never computed. 14 sits
    at that center, interior at all three SFs (5/8 vs 3/7 at sf0.001,
    26/75 vs 43/75 at sf0.01, 361/750 vs 336/750 at sf0.1), and stays
    interior under scale-up because density, not user count, drives
    it."""
    from vectordb_bioinsight_spark.operators.stats import ab_test_summary

    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("int")) >= 14
        ).cast("int").alias("conv")
    )
    armed = users.select(
        F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"), "conv"
    )
    return ab_test_summary(armed, "arm", "conv")


SQL_AB_CONVERSION = """
WITH users AS (
  SELECT user_id, (sum((event_type = 'purchase')::INT) >= 14)::INT AS conv
  FROM events GROUP BY 1
), armed AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm, conv FROM users
), per_arm AS (
  SELECT arm, count(*)::BIGINT AS n, sum(conv)::BIGINT AS n_converted
  FROM armed GROUP BY 1
), wide AS (
  SELECT min(arm) AS a_arm, max(arm) AS b_arm FROM per_arm
), z AS (
  SELECT round(
    ((a.n_converted::DOUBLE / a.n) - (b.n_converted::DOUBLE / b.n))
    / nullif(sqrt(((a.n_converted + b.n_converted)::DOUBLE / (a.n + b.n))
                  * (1 - (a.n_converted + b.n_converted)::DOUBLE / (a.n + b.n))
                  * (1.0 / a.n + 1.0 / b.n)), 0), 6) AS z_stat
  FROM per_arm a, per_arm b, wide w
  WHERE a.arm = w.a_arm AND b.arm = w.b_arm
)
SELECT p.arm, p.n, p.n_converted,
       round(p.n_converted::DOUBLE / p.n, 6) AS rate, z.z_stat
FROM per_arm p CROSS JOIN z
"""


def q_cusum_value_shifts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM mean-shift traces per event type
    (operators/stats.py::cusum_changepoints) — hash-oracled: the
    sequential fold executes the identical op sequence cross-engine, so
    the DuckDB twin replays it with a growing-accumulator list_reduce
    (prepend convention — st = [sp_n, sm_n, sp_{n-1}, sm_{n-1}, ...,
    sp_0, sm_0], the Holt-backtest trick)."""
    from vectordb_bioinsight_spark.operators.stats import cusum_changepoints

    ev = load_table(spark, sf_dir, "events")
    out = cusum_changepoints(ev, "event_type", "ts", "value")
    return out.withColumn("day", F.col("day").cast("timestamp"))


SQL_CUSUM_VALUE_SHIFTS = """
WITH daily AS (
  SELECT event_type AS key, ts::DATE AS day, round(sum(value), 4) AS total
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT key, avg(total) AS m, stddev_samp(total) AS s FROM daily GROUP BY 1
), ser AS (
  SELECT d.key,
         list(d.day ORDER BY d.day) AS days,
         list(d.total ORDER BY d.day) AS totals,
         list(coalesce((d.total - st.m) / nullif(st.s, 0.0), 0.0)::DOUBLE
              ORDER BY d.day) AS zs
  FROM daily d JOIN stats st USING (key)
  GROUP BY 1
), folded AS (
  SELECT key, days, totals,
         list_reduce(
           list_prepend([0.0::DOUBLE, 0.0::DOUBLE],
                        list_transform(zs, z -> [z])),
           (acc, x) -> list_concat(
             [greatest(0.0, acc[1] + x[1] - 0.5),
              greatest(0.0, acc[2] - x[1] - 0.5)],
             acc
           )
         ) AS st
  FROM ser
), expanded AS (
  SELECT key,
         unnest(days) AS day,
         unnest(totals) AS total,
         generate_subscripts(days, 1) AS i,
         len(days) AS n,
         st
  FROM folded
)
SELECT key, day::TIMESTAMP AS day, total,
       round(st[2 * (n - i) + 1], 4) AS s_plus,
       round(st[2 * (n - i) + 2], 4) AS s_minus,
       (st[2 * (n - i) + 1] > 4.0 OR st[2 * (n - i) + 2] > 4.0) AS alarm
FROM expanded
"""


_BOOT_B = 50


def q_bootstrap_purchase_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass Poisson-bootstrap CI for the per-user purchase rate
    (operators/stats.py::bootstrap_rate_ci): 50 hash-deterministic
    replicates as conditional sums in a single aggregation, percentile
    envelope sorted in-plan — a resampling method with an exact DuckDB
    twin."""
    from vectordb_bioinsight_spark.operators.stats import bootstrap_rate_ci

    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv")
    )
    return bootstrap_rate_ci(users, "conv", "user_id", n_replicates=_BOOT_B)


def _sql_bootstrap_purchase_ci() -> str:
    from vectordb_bioinsight_spark.operators.stats import _POISSON1_CDF

    def w(j: int) -> str:
        u = (f"(('0x' || substr(md5('{42 * 1000 + j}|' || user_id::VARCHAR), 1, 15))::BIGINT"
             f" / {float(1 << 60)!r})")
        expr = str(len(_POISSON1_CDF))
        for k in range(len(_POISSON1_CDF) - 1, -1, -1):
            expr = f"CASE WHEN {u} < {_POISSON1_CDF[k]!r} THEN {k} ELSE {expr} END"
        return f"({expr})::DOUBLE"

    reps = ", ".join(
        f"sum({w(j)} * conv) / nullif(sum({w(j)}), 0) AS r{j}"
        for j in range(_BOOT_B)
    )
    arr = "list_sort([" + ", ".join(f"r{j}" for j in range(_BOOT_B)) + "])"
    return f"""
WITH users AS (
  SELECT user_id, max((event_type = 'purchase')::INT)::DOUBLE AS conv
  FROM events GROUP BY 1
), one AS (
  SELECT count(*)::BIGINT AS n, round(avg(conv), 6) AS rate, {reps}
  FROM users
)
SELECT n, rate,
       round({arr}[2], 6) AS ci_lo,
       round({arr}[49], 6) AS ci_hi,
       {_BOOT_B} AS n_replicates
FROM one
"""


SQL_BOOTSTRAP_PURCHASE_CI = _sql_bootstrap_purchase_ci()


# --- domain adaptation (operators/stats.py::reference_quantile_map /
# zscore_recalibrate — ml/domain_adapter.py:110-198) -----------------------


def q_ref_quantile_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-quantile domain adaptation (domain_adapter.py:131-171):
    each embedding vector is a sample, its 64 dimensions the features;
    per-sample ranks map onto a planted sorted reference vector
    q(r) = 0.8 * (2r/64 - 1), the narrowed-normal stand-in for the
    stored TCGA quantiles."""
    from vectordb_bioinsight_spark.operators.stats import reference_quantile_map

    emb = load_table(spark, sf_dir, "embeddings")
    frame = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("val", F.round(F.col("val").cast("double"), 6))
    ref = spark.range(1, 65).select(
        F.col("id").cast("int").alias("rank"),
        F.round(0.8 * (2.0 * F.col("id").cast("double") / 64.0 - 1.0), 6).alias("ref_q"),
    )
    return reference_quantile_map(frame, "vec_id", "pos", "val", ref)


SQL_REF_QUANTILE_DIMS = """
WITH m AS (
  SELECT vec_id, u.e.pos AS pos, round(u.e.val::DOUBLE, 6) AS val
  FROM read_embeddings, unnest(list_transform(embedding, (x, j) -> {'val': x, 'pos': j - 1})) u(e)
), ranked AS (
  SELECT vec_id, pos, val,
         row_number() OVER (PARTITION BY vec_id ORDER BY val ASC, pos ASC) AS r
  FROM m WHERE val IS NOT NULL
)
SELECT vec_id, pos, val,
       round(round(0.8 * (2.0 * r / 64.0 - 1.0), 6), 6) AS adapted
FROM ranked
""".replace("read_embeddings", "embeddings")


def q_zscore_recal_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global z-score recalibration (domain_adapter.py:172-198): shift
    and scale a planted expression matrix so the corpus-wide mean/std
    hit the TCGA reference stats (0, 0.8); population std. The planted
    values are INTEGER-VALUED doubles (SCALING rule 44 — the first cut
    averaged the raw float events.value, whose FP-summation order is
    partitioning-dependent and can flip a 6-dp rounding boundary)."""
    from vectordb_bioinsight_spark.operators.stats import zscore_recalibrate

    ev = load_table(spark, sf_dir, "events")
    frame = ev.select(
        "event_id",
        ((F.col("event_id") * 13) % 4001 - 2000).cast("double").alias("value"),
    )
    return zscore_recalibrate(frame, "value", exact_moments=True).select(
        "event_id", "value", "recalibrated"
    )


SQL_ZSCORE_RECAL_VALUES = """
WITH ev AS (
  SELECT event_id, ((event_id * 13) % 4001 - 2000)::DOUBLE AS value FROM events
), stats AS (
  SELECT sum(value) / count(*) AS mu,
         sqrt(sum(value * value) / count(*)
              - (sum(value) / count(*)) * (sum(value) / count(*))) AS sd
  FROM ev
)
SELECT e.event_id, e.value,
       round(CASE WHEN s.sd > 0 THEN (e.value - s.mu) / s.sd * 0.8 + 0.0
                  ELSE e.value - s.mu + 0.0 END, 6) AS recalibrated
FROM ev e CROSS JOIN stats s
"""


# --- SHAP aggregation (operators/ml_pipeline.py::shap_gene_stats /
# shap_top_genes_per_sample — ml/explainer.py:96-246) ----------------------


def _shap_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings as a planted attribution matrix: vec_id = sample,
    dimension = gene. The planted values are INTEGER-VALUED doubles
    (modular arithmetic on ids, not the embedding floats): sums of
    integers below 2^53 are exact in ANY accumulation order, so the
    cross-engine hash of the rounded means cannot flake on FP summation
    order — the first cut averaged raw floats and flipped a 6-dp
    boundary (-0.005097 vs -0.005096) depending on partitioning."""
    emb = load_table(spark, sf_dir, "embeddings")
    m = emb.select("vec_id", F.posexplode("embedding").alias("pos", "v"))
    s, p = F.col("vec_id"), F.col("pos")
    return m.select(
        s.alias("sample_id"),
        F.concat(F.lit("G"), p.cast("string")).alias("gene"),
        ((s * 7 + p * 13) % 2001 - 1000).cast("double").alias("shap_value"),
        ((s * 11 + p * 3) % 5000).cast("double").alias("feature_value"),
    )


_SQL_SHAP_FRAME = """
  SELECT vec_id AS sample_id,
         'G' || (u.e.pos)::VARCHAR AS gene,
         ((vec_id * 7 + u.e.pos * 13) % 2001 - 1000)::DOUBLE AS shap_value,
         ((vec_id * 11 + u.e.pos * 3) % 5000)::DOUBLE AS feature_value
  FROM embeddings, unnest(list_transform(embedding, (x, j) -> {'v': x, 'pos': j - 1})) u(e)
"""


def q_shap_gene_stats_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHAP gene-level aggregation (explainer.py:96-125, 168-246): mean
    and mean-|SHAP|, expression mean/std, the strictly-greater global
    rank, and the status card's direction split."""
    from vectordb_bioinsight_spark.operators.ml_pipeline import shap_gene_stats

    return shap_gene_stats(_shap_frame(spark, sf_dir))


SQL_SHAP_GENE_STATS_DIMS = f"""
WITH m AS ({_SQL_SHAP_FRAME}),
per_gene AS (
  SELECT gene,
         round(avg(shap_value), 6) AS mean_shap,
         round(avg(abs(shap_value)), 6) AS abs_mean_shap,
         round(avg(feature_value), 6) AS mean_expr,
         round(stddev_pop(feature_value), 6) AS std_expr
  FROM m GROUP BY gene
)
SELECT gene, mean_shap, abs_mean_shap, mean_expr, std_expr,
       rank() OVER (ORDER BY abs_mean_shap DESC) AS rank,
       CASE WHEN mean_shap > 0 THEN 'up' ELSE 'down' END AS direction
FROM per_gene
"""


def q_shap_top_genes_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sample top-5 |SHAP| genes with direction and the sample's
    total SHAP (explainer.py:126-167)."""
    from vectordb_bioinsight_spark.operators.ml_pipeline import (
        shap_top_genes_per_sample,
    )

    return shap_top_genes_per_sample(_shap_frame(spark, sf_dir), top_k=5)


SQL_SHAP_TOP_GENES_DIMS = f"""
WITH m AS ({_SQL_SHAP_FRAME}),
ranked AS (
  SELECT sample_id, gene, shap_value,
         CASE WHEN shap_value > 0 THEN 'up' ELSE 'down' END AS direction,
         feature_value,
         row_number() OVER (PARTITION BY sample_id
                            ORDER BY abs(shap_value) DESC, gene ASC) AS rk,
         round(sum(shap_value) OVER (PARTITION BY sample_id), 6) AS total_shap
  FROM m
)
SELECT * FROM ranked WHERE rk <= 5
"""


# --- gene-ID format detection + symbol mapping (operators/deg.py —
# agent4_validation.py:249-331) ---------------------------------------------


def _planted_genes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id % 10 -> 5 Ensembl (two versioned), 3 Entrez-numeric, 2
    symbols — Ensembl-majority so scope resolves to ensembl.gene and
    conversion is required."""
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    g = (
        F.when(d % 10 < 3, F.concat(F.lit("ENSG"), F.lpad((d % 997).cast("string"), 11, "0")))
        .when(d % 10 < 5, F.concat(F.lit("ENSG"), F.lpad((d % 997).cast("string"), 11, "0"), F.lit("."), (d % 9).cast("string")))
        .when(d % 10 < 8, ((d * 7) % 99999).cast("string"))
        .otherwise(F.concat(F.lit("SYM"), (d % 50).cast("string")))
    )
    return docs.select("doc_id", g.alias("gene_id"))


_SQL_PLANTED_GENES = """
  SELECT doc_id,
         CASE WHEN doc_id % 10 < 3 THEN 'ENSG' || lpad((doc_id % 997)::VARCHAR, 11, '0')
              WHEN doc_id % 10 < 5 THEN 'ENSG' || lpad((doc_id % 997)::VARCHAR, 11, '0') || '.' || (doc_id % 9)::VARCHAR
              WHEN doc_id % 10 < 8 THEN ((doc_id * 7) % 99999)::VARCHAR
              ELSE 'SYM' || (doc_id % 50)::VARCHAR END AS gene_id
  FROM documents
"""


def q_gene_id_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gene-ID format detection (agent4_validation.py:258-299): Ensembl/
    Entrez/symbol counts over the first 100 ids (ascending pin), the
    symbol-majority pass-through rule and the mygene scope pick."""
    from vectordb_bioinsight_spark.operators.deg import detect_gene_id_format

    return detect_gene_id_format(_planted_genes(spark, sf_dir))


SQL_GENE_ID_FORMAT = f"""
WITH genes AS ({_SQL_PLANTED_GENES}),
head AS (
  SELECT gene_id AS g FROM genes ORDER BY g LIMIT 100
), agg AS (
  SELECT
    sum(CASE WHEN starts_with(g, 'ENSG') THEN 1 ELSE 0 END)::BIGINT AS ensembl_count,
    sum(CASE WHEN regexp_matches(g, '^\\d+$') THEN 1 ELSE 0 END)::BIGINT AS numeric_count,
    sum(CASE WHEN NOT starts_with(g, 'ENSG') AND NOT regexp_matches(g, '^\\d+$') THEN 1 ELSE 0 END)::BIGINT AS symbol_count,
    count(*) AS n_sampled
  FROM head
)
SELECT ensembl_count, numeric_count, symbol_count, n_sampled,
       (symbol_count <= n_sampled * 0.5)::INT AS needs_conversion,
       CASE WHEN symbol_count > n_sampled * 0.5 THEN 'none'
            WHEN ensembl_count > numeric_count THEN 'ensembl.gene'
            ELSE 'entrezgene' END AS scope
FROM agg
"""


def q_gene_symbols_mapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symbol-mapping application (agent4_validation.py:300-331): planted
    genes through a planted mygene-snapshot dim — version suffixes
    stripped before the lookup, unresolved ids self-mapped."""
    from vectordb_bioinsight_spark.operators.deg import map_gene_symbols

    genes = _planted_genes(spark, sf_dir)
    # the snapshot dim resolves even-numbered Ensembl roots only
    n = F.col("id")
    mapping = spark.range(0, 997, 2).select(
        F.concat(F.lit("ENSG"), F.lpad(n.cast("string"), 11, "0")).alias("query"),
        F.concat(F.lit("S"), n.cast("string")).alias("symbol"),
    )
    return map_gene_symbols(genes, mapping).select("doc_id", "gene_id", "gene_symbol")


SQL_GENE_SYMBOLS_MAPPED = f"""
WITH genes AS ({_SQL_PLANTED_GENES}),
mapping AS (
  SELECT 'ENSG' || lpad(n::VARCHAR, 11, '0') AS query, 'S' || n::VARCHAR AS symbol
  FROM range(0, 997, 2) r(n)
)
SELECT g.doc_id, g.gene_id,
       coalesce(m.symbol, g.gene_id) AS gene_symbol
FROM genes g
LEFT JOIN mapping m ON m.query = string_split(g.gene_id, '.')[1]
"""
