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


#: planted per-dataset metadata headers and directory listings for the
#: dataset-type detector entry — mixed-evidence rows on purpose (click
#: carries a bulk 'batch' column; signup a single-cell 'cell_type') so the
#: blended-score path earns driver-hash coverage, not just the clean cases
_DTYPE_META = [
    ("view", "cell_type"), ("view", "cluster"), ("view", "umap_1"),
    ("click", "barcode"), ("click", "leiden"), ("click", "batch"),
    ("purchase", "condition"), ("purchase", "batch"), ("purchase", "patient_id"),
    ("signup", "sample_id"), ("signup", "replicate"), ("signup", "tissue"),
    ("signup", "cell_type"),
]
_DTYPE_FILES = [
    ("view", "data.h5ad"), ("view", "barcodes.tsv"),
    ("click", "matrix.mtx.gz"), ("click", "barcodes.tsv.gz"),
    ("purchase", "count_matrix.csv"),
    ("signup", "expression_counts.csv"), ("signup", "metadata.csv"),
]


def q_dataset_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1-family bulk-vs-single-cell routing
    (operators/dataset_type.py::detect_dataset_type — the reference's
    DataTypeDetector rule ladder, data_type_detector.py:58-331): each
    event_type becomes a pending 'upload' whose long-form count matrix is
    the (gene = event_id % 37, sample) cell aggregation — view/click get a
    997-wide sample space (the >= 500-sample single-cell shape branch at
    sf0.01+), the rest a 24-wide one (the <= 200 bulk branch) — plus
    planted metadata headers and directory listings ('error' has neither,
    exercising the hintless left-join path)."""
    from vectordb_bioinsight_spark.operators.dataset_type import detect_dataset_type

    ev = load_table(spark, sf_dir, "events")
    cell = (
        ev.select(
            F.col("event_type").alias("ds"),
            (F.col("event_id") % 37).alias("gene_id"),
            F.when(
                F.col("event_type").isin("view", "click"), F.col("event_id") % 997
            )
            .otherwise(F.col("event_id") % 24)
            .alias("sample_id"),
            "value",
        )
        .groupBy("ds", "gene_id", "sample_id")
        .agg(F.sum("value").alias("v"))
    )
    meta = spark.createDataFrame(_DTYPE_META, "ds string, col_name string")
    files = spark.createDataFrame(_DTYPE_FILES, "ds string, file_name string")
    return detect_dataset_type(
        cell, "ds", "gene_id", "sample_id", "v", meta_cols=meta, files=files
    )


def _sql_dataset_type() -> str:
    from vectordb_bioinsight_spark.operators.dataset_type import (
        BULK_HINTS,
        PIPELINE_BULK,
        PIPELINE_BULK_SMALL,
        PIPELINE_SINGLECELL,
        PIPELINE_UNKNOWN,
        SINGLECELL_HINTS,
    )

    meta_vals = ",".join(f"('{d}','{c}')" for d, c in _DTYPE_META)
    file_vals = ",".join(f"('{d}','{f}')" for d, f in _DTYPE_FILES)
    sc_list = ",".join(f"'{h}'" for h in SINGLECELL_HINTS)
    bulk_list = ",".join(f"'{h}'" for h in BULK_HINTS)
    return f"""
WITH cell AS (
  SELECT event_type AS ds, event_id % 37 AS gene_id,
         CASE WHEN event_type IN ('view','click') THEN event_id % 997
              ELSE event_id % 24 END AS sample_id,
         sum(value) AS v
  FROM events GROUP BY 1, 2, 3
), shape AS (
  SELECT ds, count(DISTINCT gene_id)::BIGINT AS n_genes,
         count(DISTINCT sample_id)::BIGINT AS n_samples,
         sum(CASE WHEN v <> 0 THEN 1 ELSE 0 END)::BIGINT AS nnz
  FROM cell GROUP BY 1
), meta AS (SELECT * FROM (VALUES {meta_vals}) m(ds, col_name)),
files AS (SELECT * FROM (VALUES {file_vals}) f(ds, file_name)),
ms AS (
  SELECT ds,
         sum(CASE WHEN lower(col_name) IN ({sc_list}) THEN 1 ELSE 0 END) AS m_sc,
         sum(CASE WHEN lower(col_name) IN ({bulk_list}) THEN 1 ELSE 0 END) AS m_bulk
  FROM (SELECT DISTINCT ds, col_name FROM meta) GROUP BY 1
), fs AS (
  SELECT ds,
         max(CASE WHEN lower(file_name) LIKE '%.h5ad' THEN 1 ELSE 0 END) AS f_h5ad,
         max(CASE WHEN lower(file_name) IN ('matrix.mtx','matrix.mtx.gz') THEN 1 ELSE 0 END) AS f_mtx,
         max(CASE WHEN lower(file_name) IN ('barcodes.tsv','barcodes.tsv.gz') THEN 1 ELSE 0 END) AS f_barcodes,
         max(CASE WHEN lower(file_name) LIKE 'count%.csv'
                    OR lower(file_name) LIKE '%counts%.csv' THEN 1 ELSE 0 END) AS f_csv
  FROM files GROUP BY 1
), joined AS (
  SELECT s.ds, s.n_genes, s.n_samples, s.nnz,
         coalesce(m_sc, 0) AS m_sc, coalesce(m_bulk, 0) AS m_bulk,
         coalesce(f_h5ad, 0) AS f_h5ad, coalesce(f_mtx, 0) AS f_mtx,
         coalesce(f_barcodes, 0) AS f_barcodes, coalesce(f_csv, 0) AS f_csv,
         (s.n_genes * s.n_samples - s.nnz)::DOUBLE
           / nullif((s.n_genes * s.n_samples)::DOUBLE, 0.0) * 100.0 AS sparsity
  FROM shape s LEFT JOIN ms ON ms.ds = s.ds LEFT JOIN fs ON fs.ds = s.ds
), scored AS (
  SELECT *,
         f_h5ad * 3 + f_mtx * 3 + f_barcodes * 2 + m_sc
           + CASE WHEN n_samples >= 500 THEN 4 ELSE 0 END
           + CASE WHEN sparsity > 80.0 THEN 2 ELSE 0 END AS score_sc,
         CASE WHEN f_csv = 1 AND f_h5ad = 0 THEN 1 ELSE 0 END + m_bulk
           + CASE WHEN n_samples <= 200 THEN 4 ELSE 0 END
           + CASE WHEN sparsity < 30.0 THEN 2 ELSE 0 END AS score_bulk
  FROM joined
), typed AS (
  SELECT *,
         CASE WHEN score_sc + score_bulk = 0 THEN 'unknown'
              WHEN score_sc > score_bulk THEN 'singlecell'
              ELSE 'bulk' END AS data_type
  FROM scored
)
SELECT ds AS dataset, n_genes, n_samples,
       round(sparsity, 4) AS sparsity_pct,
       score_bulk::INT AS score_bulk, score_sc::INT AS score_singlecell,
       data_type,
       CASE WHEN score_sc + score_bulk = 0 THEN 0.0
            ELSE round(greatest(score_sc, score_bulk)::DOUBLE
                       / (score_sc + score_bulk)::DOUBLE, 4) END AS confidence,
       CASE WHEN data_type = 'singlecell' THEN '{PIPELINE_SINGLECELL}'
            WHEN data_type = 'bulk' AND n_samples >= 6 THEN '{PIPELINE_BULK}'
            WHEN data_type = 'bulk' THEN '{PIPELINE_BULK_SMALL}'
            ELSE '{PIPELINE_UNKNOWN}' END AS recommended_pipeline,
       CASE WHEN n_samples >= 500 THEN 'ge_500_singlecell'
            WHEN n_samples <= 200 THEN 'le_200_bulk'
            ELSE 'ambiguous' END AS shape_evidence,
       CASE WHEN sparsity > 80.0 THEN 'high_sparsity_singlecell'
            WHEN sparsity < 30.0 THEN 'low_sparsity_bulk'
            ELSE 'moderate_sparsity' END AS sparsity_evidence
FROM typed
"""


SQL_DATASET_TYPE = _sql_dataset_type()


# --- upload-preprocessing siblings (operators/dataset_type.py —
# routes/rnaseq.py:127-438) --------------------------------------------------

#: doc_id % 12 sample-name shapes crossing every inference branch: the
#: case-split regex fallthrough (l400t), suffix regex hits, keyword
#: walls, bare-letter fallbacks and the unknown default.
_COND_NAMES = [
    "L400T", "L511N", "GSM2142443", "l400t", "x_T3", "y-N",
    "TUMOR_A", "myCTRL", "AAN", "99T", "zzn", "plain",
]

#: doc_id % 6 raw GEO condition values for the normalize ladder.
_COND_RAW = [
    "Primary NSCLC tissue", "adjacent non-malignant", "unknown",
    "Stage II biopsy", "matched control", "CELL LINE A",
]


def q_sample_conditions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-condition inference + GEO normalization
    (routes/rnaseq.py:159-199, 353-368): planted sample-name and raw
    condition rotations through both ladders."""
    from vectordb_bioinsight_spark.operators.dataset_type import (
        infer_condition_from_name,
        normalize_condition,
    )

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    sid = F.concat(
        F.element_at(F.array(*[F.lit(n) for n in _COND_NAMES]), (d % 12 + 1).cast("int")),
        F.lit("_"), (d % 9).cast("string"),
    )
    # the suffix matters: rotate whether the numeric tail is present
    sid = F.when(d % 2 == 0, sid).otherwise(
        F.element_at(F.array(*[F.lit(n) for n in _COND_NAMES]), (d % 12 + 1).cast("int"))
    )
    raw = F.element_at(F.array(*[F.lit(c) for c in _COND_RAW]), (d % 6 + 1).cast("int"))
    return docs.select(
        "doc_id",
        sid.alias("sample_id"),
        infer_condition_from_name(sid).alias("inferred"),
        raw.alias("raw_condition"),
        normalize_condition(raw).alias("normalized"),
    )


def _sql_sample_conditions() -> str:
    from vectordb_bioinsight_spark.operators.dataset_type import (
        NORMAL_COND_KEYWORDS,
        NORMAL_NAME_KEYWORDS,
        TUMOR_COND_KEYWORDS,
        TUMOR_NAME_KEYWORDS,
    )

    names = ",".join(f"'{n}'" for n in _COND_NAMES)
    raws = ",".join(f"'{c}'" for c in _COND_RAW)
    kt = " OR ".join(f"contains(upper(sid), '{k}')" for k in TUMOR_NAME_KEYWORDS)
    kn = " OR ".join(f"contains(upper(sid), '{k}')" for k in NORMAL_NAME_KEYWORDS)
    ct = " OR ".join(f"contains(lower(raw), '{k}')" for k in TUMOR_COND_KEYWORDS)
    cn = " OR ".join(f"contains(lower(raw), '{k}')" for k in NORMAL_COND_KEYWORDS)
    return f"""
WITH rot(i, base) AS (
  SELECT i, l[i + 1] FROM (SELECT [{names}] AS l), range(12) r(i)
), raws(j, raw) AS (
  SELECT j, l[j + 1] FROM (SELECT [{raws}] AS l), range(6) r(j)
), frame AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 2 = 0
              THEN rot.base || '_' || (d.doc_id % 9)::VARCHAR
              ELSE rot.base END AS sid,
         raws.raw
  FROM documents d
  JOIN rot ON rot.i = d.doc_id % 12
  JOIN raws ON raws.j = d.doc_id % 6
)
SELECT doc_id, sid AS sample_id,
       CASE
         WHEN (upper(sid) LIKE '%T' OR contains(upper(sid), '_T') OR contains(upper(sid), '-T'))
              AND (regexp_matches(sid, '[A-Za-z]T$') OR regexp_matches(upper(sid), '_T\\d*$'))
           THEN 'tumor'
         WHEN (upper(sid) LIKE '%N' OR contains(upper(sid), '_N') OR contains(upper(sid), '-N'))
              AND (regexp_matches(sid, '[A-Za-z]N$') OR regexp_matches(upper(sid), '_N\\d*$'))
           THEN 'normal'
         WHEN {kt} THEN 'tumor'
         WHEN {kn} THEN 'normal'
         WHEN sid LIKE '%T' OR sid LIKE '%t' THEN 'tumor'
         WHEN sid LIKE '%N' OR sid LIKE '%n' THEN 'normal'
         ELSE 'unknown' END AS inferred,
       raw AS raw_condition,
       CASE WHEN raw IS NULL OR raw = 'unknown' THEN 'unknown'
            WHEN {ct} THEN 'tumor'
            WHEN {cn} THEN 'normal'
            ELSE replace(lower(raw), ' ', '_') END AS normalized
FROM frame
"""


SQL_SAMPLE_CONDITIONS = _sql_sample_conditions()

#: doc_id % 4 file bodies: 2-continuation split, 3-continuation with a
#: blank data line, intact two-line, single line.
_SPLIT_BODIES = [
    "gene_id,s1,s2\n,s3,s4\n,s5\nG1,1,2,3,4,5\n\nG2,9,8,7,6,5",
    "gene_id,a\n,b\n,c\n,d\nG,1,2,3,4",
    "gene_id,s1,s2\nG1,1,2",
    "one-line",
]


def q_split_header_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-header repair (routes/rnaseq.py:383-438): planted broken and
    intact file bodies (with a per-doc marker line appended so every
    hash row differs) through the comma-continuation join."""
    from vectordb_bioinsight_spark.operators.dataset_type import fix_split_header

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    body = F.concat(
        F.element_at(F.array(*[F.lit(b) for b in _SPLIT_BODIES]), (d % 4 + 1).cast("int")),
        F.lit("\nM"), d.cast("string"), F.lit(",0"),
    )
    fixed = fix_split_header(body)
    return docs.select(
        "doc_id",
        fixed["text"].alias("fixed_text"),
        fixed["was_fixed"].alias("was_fixed"),
    )


def _sql_split_header() -> str:
    bodies = ",".join(
        "'" + b.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"
        for b in _SPLIT_BODIES
    )
    return f"""
WITH rot(i, b) AS (
  SELECT i, l[i + 1] FROM (SELECT [{bodies}] AS l), range(4) r(i)
), frame AS (
  SELECT d.doc_id,
         rot.b || chr(10) || 'M' || d.doc_id::VARCHAR || ',0' AS body
  FROM documents d JOIN rot ON rot.i = d.doc_id % 4
), lined AS (
  SELECT doc_id, body, string_split(body, chr(10)) AS ls FROM frame
), staged AS (
  SELECT doc_id, body, ls,
         len(ls) >= 2 AND starts_with(coalesce(ls[2], ''), ',') AS broken,
         -- chained-AND continuation run over lines 2..10 (1-based)
         (CASE WHEN starts_with(coalesce(ls[2], ''), ',') THEN 1 ELSE 0 END
          + CASE WHEN starts_with(coalesce(ls[2], ''), ',') AND starts_with(coalesce(ls[3], ''), ',') THEN 1 ELSE 0 END
          + CASE WHEN starts_with(coalesce(ls[2], ''), ',') AND starts_with(coalesce(ls[3], ''), ',') AND starts_with(coalesce(ls[4], ''), ',') THEN 1 ELSE 0 END
          + CASE WHEN starts_with(coalesce(ls[2], ''), ',') AND starts_with(coalesce(ls[3], ''), ',') AND starts_with(coalesce(ls[4], ''), ',') AND starts_with(coalesce(ls[5], ''), ',') THEN 1 ELSE 0 END
          + CASE WHEN starts_with(coalesce(ls[2], ''), ',') AND starts_with(coalesce(ls[3], ''), ',') AND starts_with(coalesce(ls[4], ''), ',') AND starts_with(coalesce(ls[5], ''), ',') AND starts_with(coalesce(ls[6], ''), ',') THEN 1 ELSE 0 END
          + CASE WHEN starts_with(coalesce(ls[2], ''), ',') AND starts_with(coalesce(ls[3], ''), ',') AND starts_with(coalesce(ls[4], ''), ',') AND starts_with(coalesce(ls[5], ''), ',') AND starts_with(coalesce(ls[6], ''), ',') AND starts_with(coalesce(ls[7], ''), ',') THEN 1 ELSE 0 END
          + CASE WHEN starts_with(coalesce(ls[2], ''), ',') AND starts_with(coalesce(ls[3], ''), ',') AND starts_with(coalesce(ls[4], ''), ',') AND starts_with(coalesce(ls[5], ''), ',') AND starts_with(coalesce(ls[6], ''), ',') AND starts_with(coalesce(ls[7], ''), ',') AND starts_with(coalesce(ls[8], ''), ',') THEN 1 ELSE 0 END
          + CASE WHEN starts_with(coalesce(ls[2], ''), ',') AND starts_with(coalesce(ls[3], ''), ',') AND starts_with(coalesce(ls[4], ''), ',') AND starts_with(coalesce(ls[5], ''), ',') AND starts_with(coalesce(ls[6], ''), ',') AND starts_with(coalesce(ls[7], ''), ',') AND starts_with(coalesce(ls[8], ''), ',') AND starts_with(coalesce(ls[9], ''), ',') THEN 1 ELSE 0 END
          + CASE WHEN starts_with(coalesce(ls[2], ''), ',') AND starts_with(coalesce(ls[3], ''), ',') AND starts_with(coalesce(ls[4], ''), ',') AND starts_with(coalesce(ls[5], ''), ',') AND starts_with(coalesce(ls[6], ''), ',') AND starts_with(coalesce(ls[7], ''), ',') AND starts_with(coalesce(ls[8], ''), ',') AND starts_with(coalesce(ls[9], ''), ',') AND starts_with(coalesce(ls[10], ''), ',') THEN 1 ELSE 0 END
         ) AS n_cont
  FROM lined
), built AS (
  SELECT doc_id, body, broken,
         trim(coalesce(ls[1], ''))
         || CASE WHEN n_cont >= 1 THEN trim(ls[2]) ELSE '' END
         || CASE WHEN n_cont >= 2 THEN trim(ls[3]) ELSE '' END
         || CASE WHEN n_cont >= 3 THEN trim(ls[4]) ELSE '' END
         || CASE WHEN n_cont >= 4 THEN trim(ls[5]) ELSE '' END
         || CASE WHEN n_cont >= 5 THEN trim(ls[6]) ELSE '' END
         || CASE WHEN n_cont >= 6 THEN trim(ls[7]) ELSE '' END
         || CASE WHEN n_cont >= 7 THEN trim(ls[8]) ELSE '' END
         || CASE WHEN n_cont >= 8 THEN trim(ls[9]) ELSE '' END
         || CASE WHEN n_cont >= 9 THEN trim(ls[10]) ELSE '' END AS header,
         list_filter(ls[n_cont + 2:], x -> trim(x) <> '') AS data
  FROM staged
)
SELECT doc_id,
       CASE WHEN broken
            THEN list_aggregate([header] || data, 'string_agg', chr(10))
            ELSE body END AS fixed_text,
       CASE WHEN broken THEN 1 ELSE 0 END AS was_fixed
FROM built
"""


SQL_SPLIT_HEADER_DOCS = _sql_split_header()
