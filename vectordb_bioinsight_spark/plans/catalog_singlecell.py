"""Single-cell analog catalog entries over the driver tables: cell ≡ user /
sample ≡ order-priority, gene ≡ event-type / part. Same operators, same
shapes, oracle-checkable."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.singlecell import (
    cell_qc_metrics,
    normalize_total_log1p,
    pseudobulk,
    size_factors_median_of_ratios,
)
from vectordb_bioinsight_spark.sources.readers import load_table


def q_user_qc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8/M12 QC metrics per 'cell' (user): n distinct positive event types,
    total value, % of value in 'error' events (the mito-% analog)."""
    ev = load_table(spark, sf_dir, "events")
    long = ev.select(
        F.col("user_id").alias("cell_id"),
        F.col("event_type").alias("gene_id"),
        F.col("value").alias("count"),
    )
    return cell_qc_metrics(
        long, flagged_gene_predicate=F.col("gene_id") == "error"
    ).withColumnRenamed("cell_id", "user_id")


SQL_USER_QC_STATS = """
SELECT user_id,
       count(CASE WHEN value > 0 THEN 1 END)::BIGINT AS n_genes,
       sum(value) AS total_counts,
       round(coalesce(
         sum(CASE WHEN event_type = 'error' THEN value ELSE 0 END)
           / nullif(sum(value), 0), 0) * 100.0, 6) AS pct_flagged
FROM events GROUP BY 1
"""


def q_lognorm_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9/M11 normalize_total(1e4) -> log1p per user over event values."""
    ev = load_table(spark, sf_dir, "events")
    long = ev.select("event_id", F.col("user_id").alias("cell_id"), F.col("value").alias("count"))
    out = normalize_total_log1p(long)
    return out.select("event_id", F.round("lognorm", 6).alias("lognorm"))


SQL_LOGNORM_EVENTS = """
SELECT event_id,
       round(ln(1.0 + value / sum(value) OVER (PARTITION BY user_id) * 10000.0), 6) AS lognorm
FROM events
"""


def q_priority_size_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 portable core: DESeq2 median-of-ratios size factors, sample ≡
    order priority, gene ≡ part, count ≡ total quantity. Genes with a zero
    in any sample drop out, matching DESeq2's log-mean discipline."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    long = (
        li.join(orders.select("o_orderkey", "o_orderpriority"), li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("l_partkey").alias("gene_id"),
            F.col("o_orderpriority").alias("sample_id"),
        )
        .agg(F.sum("l_quantity").alias("count"))
    )
    return size_factors_median_of_ratios(long).withColumnRenamed("sample_id", "o_orderpriority")


SQL_PRIORITY_SIZE_FACTORS = """
WITH long AS (
  SELECT l_partkey AS gene_id, o_orderpriority AS sample_id, sum(l_quantity) AS cnt
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
), n_samp AS (SELECT count(DISTINCT sample_id) AS ns FROM long),
geo AS (
  SELECT gene_id, exp(avg(ln(cnt))) AS geomean
  FROM long WHERE cnt > 0 GROUP BY 1
  HAVING count(*) = (SELECT ns FROM n_samp)
)
SELECT sample_id AS o_orderpriority,
       round(quantile_cont(cnt / geomean, 0.5), 6) AS size_factor
FROM long JOIN geo USING (gene_id)
GROUP BY 1
"""


def q_pseudobulk_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 pseudobulk: per-gene (part) sum/mean/exact-median/count over all
    'cells' (lineitems)."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.select(F.col("l_partkey").alias("gene_id"), F.col("l_quantity").alias("count"))
    return pseudobulk(long).withColumnRenamed("gene_id", "l_partkey")


SQL_PSEUDOBULK_PARTS = """
SELECT l_partkey, sum(l_quantity) AS total,
       round(avg(l_quantity), 6) AS mean,
       round(quantile_cont(l_quantity, 0.5), 6) AS median,
       count(*)::BIGINT AS n_cells
FROM lineitem GROUP BY 1
"""


LENS_RULES = {
    "overview": ("table", "scan", "row"),
    "trend": ("stream", "window", "batch"),
    "mechanism": ("join", "merge", "hash"),
    "clinical": ("query", "filter", "sort"),
}


def q_lens_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V12 lens classification: 4-way keyword-rule scores over document text,
    argmax label with deterministic tie-break (score desc, lens name asc) —
    lens_classifier.py:122-487 as pure expressions."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        *[
            sum(F.when(F.col("text").contains(kw), 1).otherwise(0) for kw in kws).alias(f"_s_{lens}")
            for lens, kws in LENS_RULES.items()
        ],
    )
    # argmax via array of structs sorted desc-score / asc-name
    pairs = F.array(
        *[
            F.struct(F.col(f"_s_{lens}").alias("s"), F.lit(lens).alias("lens"))
            for lens in LENS_RULES
        ]
    )
    best = F.array_sort(
        pairs,
        lambda a, b: F.when(a["s"] > b["s"], -1)
        .when(a["s"] < b["s"], 1)
        .when(a["lens"] < b["lens"], -1)
        .when(a["lens"] > b["lens"], 1)
        .otherwise(0),
    )[0]
    return scored.select(
        "doc_id",
        best["lens"].alias("lens"),
        best["s"].cast("long").alias("lens_score"),
    )


def _sql_lens() -> str:
    score_exprs = []
    for lens, kws in LENS_RULES.items():
        hits = " + ".join(
            f"(CASE WHEN text LIKE '%{kw}%' THEN 1 ELSE 0 END)" for kw in kws
        )
        score_exprs.append(f"({hits}) AS s_{lens}")
    scores = ", ".join(score_exprs)
    structs = ", ".join(f"{{'s': s_{lens}, 'lens': '{lens}'}}" for lens in LENS_RULES)
    return f"""
WITH scored AS (SELECT doc_id, {scores} FROM documents),
ranked AS (
  SELECT doc_id, unnest([{structs}], recursive := true) FROM scored
)
SELECT doc_id, lens, s::BIGINT AS lens_score
FROM (
  SELECT doc_id, lens, s,
         row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, lens ASC) AS rn
  FROM ranked
) WHERE rn = 1
"""


SQL_LENS_CLASSIFY = _sql_lens()


#: J10 marker dimension: event-type "marker sets" per user profile.
PROFILE_MARKERS = {
    "browser": ("click", "view"),
    "converter": ("purchase", "signup"),
}


def q_user_profile_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 shape on the driver tables: score each user against marker
    event-type sets (avg event value over the set), assign the argmax
    profile — the cell-type scoring join (agent_singlecell.py:972-1062)
    with users as cells and event types as genes."""
    from vectordb_bioinsight_spark.operators.singlecell import score_cell_types

    events = load_table(spark, sf_dir, "events")
    rows = [(t, p) for p, ts in PROFILE_MARKERS.items() for t in ts]
    markers = spark.createDataFrame(rows, ["event_type", "profile"])
    scored = score_cell_types(
        events.select("user_id", "event_type", "value"),
        markers,
        cell_col="user_id",
        gene_col="event_type",
        value_col="value",
        type_col="profile",
    )
    return scored.withColumnRenamed("assigned_type", "profile")


def _sql_profile_argmax() -> str:
    marker_rows = ", ".join(
        f"('{t}', '{p}')" for p, ts in PROFILE_MARKERS.items() for t in ts
    )
    return f"""
WITH markers(event_type, profile) AS (VALUES {marker_rows}),
scored AS (
  SELECT e.user_id, m.profile, avg(e.value) AS s
  FROM events e JOIN markers m ON e.event_type = m.event_type
  GROUP BY 1, 2
)
SELECT user_id, profile, round(s, 6) AS score
FROM (
  SELECT user_id, profile, s,
         row_number() OVER (PARTITION BY user_id ORDER BY s DESC, profile ASC) AS rn
  FROM scored
) WHERE rn = 1
"""


SQL_USER_PROFILE_ARGMAX = _sql_profile_argmax()


def q_part_assoc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 shape (network_enhancer.py:356-381 KG feature counts): per part,
    association count and max association score — one map-side-combinable
    aggregate over the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey").agg(
        F.count("*").cast("long").alias("n_assoc"),
        F.round(F.max("l_extendedprice"), 2).alias("max_score"),
    )


SQL_PART_ASSOC_STATS = """
SELECT l_partkey, count(*)::BIGINT AS n_assoc,
       round(max(l_extendedprice), 2) AS max_score
FROM lineitem GROUP BY 1
"""


def q_doublet_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M12 doublet detection (scrublet analog, agent1_qc.py:254-257,
    283-307) over the embeddings table as the cell×feature matrix: hash-
    bucket pair simulation -> cosine kNN over observed+simulated ->
    simulated-neighbor fraction, threshold 0.25. Every stage is hash
    arithmetic + kNN, so the whole DAG has an exact DuckDB twin."""
    from vectordb_bioinsight_spark.operators.singlecell import doublet_scores

    emb = load_table(spark, sf_dir, "embeddings")
    return doublet_scores(emb, "vec_id", "embedding", k=10)


def _doublet_sql() -> str:
    from vectordb_bioinsight_spark.operators.singlecell import (  # noqa: F401 (doc link)
        doublet_scores,
    )

    passes = []
    for p in range(2):  # sim_passes=2 default
        salt = 42 + p
        passes.append(
            f"""r{p} AS MATERIALIZED (
  SELECT id, v, g,
         row_number() OVER (
           PARTITION BY g % (SELECT greatest(1, count(*) // 8) FROM cells)
           ORDER BY g ASC, id ASC) AS rn,
         g % (SELECT greatest(1, count(*) // 8) FROM cells) AS bucket
  FROM (SELECT id, v,
               (('0x' || substr(md5('{salt}|' || id::VARCHAR), 1, 15))::BIGINT) AS g
        FROM cells)
), s{p} AS MATERIALIZED (
  SELECT -(('0x' || substr(md5('{p}|' || a.bucket::VARCHAR), 1, 15))::BIGINT) AS id,
         list_transform(range(1, len(a.v) + 1), i -> (a.v[i] + b.v[i]) / 2.0) AS v
  FROM (SELECT * FROM r{p} WHERE rn = 1) a
  JOIN (SELECT * FROM r{p} WHERE rn = 2) b USING (bucket)
)"""
        )
    return ",\n".join(passes)


SQL_DOUBLET_SCORES = f"""
WITH cells AS MATERIALIZED (
  SELECT vec_id AS id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings
),
{_doublet_sql()},
cands AS MATERIALIZED (
  SELECT id, v, 0 AS is_sim FROM cells
  UNION ALL SELECT id, v, 1 FROM s0
  UNION ALL SELECT id, v, 1 FROM s1
),
pairs AS (
  SELECT q.id AS qid, c.id AS cid, c.is_sim,
         unnest(c.v)::DOUBLE AS x, unnest(q.v)::DOUBLE AS y
  FROM cells q JOIN cands c ON c.id <> q.id
),
sums AS (
  SELECT qid, cid, is_sim,
         round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 6) AS score
  FROM pairs GROUP BY 1, 2, 3
),
ranked AS (
  SELECT qid, is_sim,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid ASC) AS rn
  FROM sums
),
topk AS (
  SELECT qid, sum(is_sim)::BIGINT AS n_sim FROM ranked WHERE rn <= 10 GROUP BY 1
)
SELECT qid AS cell_id, n_sim AS n_sim_neighbors,
       round(n_sim / 10.0, 6) AS doublet_score,
       n_sim / 10.0 > 0.25 AS is_doublet
FROM topk
"""


def q_cell_cycle_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M11 tail: cell-cycle phase scoring analog (agent1_qc.py:351-380) on
    the events matrix — user ≡ cell, event_type ≡ gene, 'click'/'view' as
    the S set and 'purchase'/'error' as G2M."""
    from vectordb_bioinsight_spark.operators.singlecell import cell_cycle_scores

    ev = load_table(spark, sf_dir, "events")
    expr = ev.select(
        F.col("user_id").alias("cell_id"),
        F.col("event_type").alias("gene_id"),
        F.col("value").alias("expr"),
    )
    return cell_cycle_scores(expr, s_genes=["click", "view"], g2m_genes=["purchase", "error"])


SQL_CELL_CYCLE_PHASE = """
WITH per_cell AS (
  SELECT user_id AS cell_id,
         avg(CASE WHEN event_type IN ('click', 'view') THEN value END) AS s_mean,
         avg(CASE WHEN event_type IN ('purchase', 'error') THEN value END) AS g2m_mean,
         avg(value) AS all_mean
  FROM events GROUP BY 1
), scored AS (
  SELECT cell_id,
         round(coalesce(s_mean, 0.0) - all_mean, 6) AS s_score,
         round(coalesce(g2m_mean, 0.0) - all_mean, 6) AS g2m_score
  FROM per_cell
)
SELECT cell_id, s_score, g2m_score,
       CASE WHEN s_score < 0 AND g2m_score < 0 THEN 'G1'
            WHEN s_score >= g2m_score THEN 'S'
            ELSE 'G2M' END AS phase
FROM scored
"""
