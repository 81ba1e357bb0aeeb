"""Catalog entries for the citation-analytics tier
(operators/citations.py — backend/app/api/routes/citations.py:287-695).

The reference's citation data arrives from Semantic Scholar over HTTP (a
declared S8 snapshot boundary); here each document doubles as a paper with
PLANTED citation metadata and a planted 3-out-regular citation graph, all
integer modular arithmetic so Spark and DuckDB agree bit-for-bit:

* ``year``: NULL when ``doc_id % 11 = 0`` (exercises the no-year branch),
  else ``1985 + (doc_id * 7) % 40`` — ages 1..40 at current_year 2025.
* ``citation_count``: ``(doc_id * 137) % 20011`` — crosses every ladder
  break (50/500/1000/10000 citations, all velocity tiers).
* ``influential_citations``: ``(doc_id * 911) % (citation_count + 1)`` —
  always <= citation_count.
* ``n_fields``: ``doc_id % 6``; ``is_open_access``: ``doc_id % 3 = 0``.
* edges: every doc cites ``(3d+1) % 500``, ``(5d+2) % 500``,
  ``(7d+3) % 500`` — provably distinct and never self-citing (each
  coincidence needs an even residue to equal an odd one mod 500), and the
  cited ids 0..499 exist at every SF, so low-id papers accumulate citers
  as SF grows while every paper has exactly 3 references.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.citations import (
    citation_network_stats,
    citation_yearly_trends,
    landmark_papers,
    related_papers,
)
from vectordb_bioinsight_spark.sources.readers import load_table

#: modular base for planted cited ids — constant across SFs so the edge
#: set at sf0.001 is a prefix of the edge set at every larger SF.
_CITE_MOD = 500

# SQL fragments shared by every twin (DuckDB):
_SQL_META = f"""
  SELECT doc_id AS paper_id,
         CASE WHEN doc_id % 11 = 0 THEN NULL
              ELSE 1985 + (doc_id * 7) % 40 END AS year,
         (doc_id * 137) % 20011 AS cc,
         (doc_id * 911) % ((doc_id * 137) % 20011 + 1) AS infl,
         doc_id % 6 AS nf,
         doc_id % 3 = 0 AS oa
  FROM documents
"""

_SQL_EDGES = f"""
  SELECT doc_id AS citing_id, unnest([
           (doc_id * 3 + 1) % {_CITE_MOD},
           (doc_id * 5 + 2) % {_CITE_MOD},
           (doc_id * 7 + 3) % {_CITE_MOD}
         ]) AS cited_id
  FROM documents
"""


def _paper_meta(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    cc = (d * 137) % 20011
    return docs.select(
        d.alias("paper_id"),
        F.when(d % 11 == 0, F.lit(None).cast("int"))
        .otherwise((F.lit(1985) + (d * 7) % 40).cast("int"))
        .alias("year"),
        cc.cast("long").alias("citation_count"),
        ((d * 911) % (cc + 1)).cast("long").alias("influential_citations"),
        (d % 6).cast("int").alias("n_fields"),
        (d % 3 == 0).alias("is_open_access"),
    )


def _citation_edges(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    return docs.select(
        d.alias("citing_id"),
        F.explode(
            F.array(
                (d * 3 + 1) % _CITE_MOD,
                (d * 5 + 2) % _CITE_MOD,
                (d * 7 + 3) % _CITE_MOD,
            )
        ).alias("cited_id"),
    )


def q_landmark_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark-papers pipeline (citations.py:287-461): >=50-citation gate,
    four-factor score, reason ladder, top-20 by (score desc, id asc)."""
    docs = load_table(spark, sf_dir, "documents")
    return landmark_papers(_paper_meta(docs), limit=20).withColumnRenamed(
        "paper_id", "doc_id"
    )


SQL_LANDMARK_DOCS = f"""
WITH meta AS ({_SQL_META}),
gated AS (SELECT * FROM meta WHERE cc >= 50),
scored AS (
  SELECT paper_id, year, cc, infl, nf, oa,
         greatest(1, 2025 - year) AS age,
         cc::DOUBLE / greatest(1, 2025 - year)::DOUBLE AS cpy,
         greatest(1, 2025 - coalesce(year, 2025)) AS r_age
  FROM gated
), s2 AS (
  SELECT *,
         CASE WHEN year IS NULL THEN 0.0 ELSE
           least(100.0,
             (CASE WHEN cpy >= 500 THEN 100.0
                   WHEN cpy >= 200 THEN 80.0
                   WHEN cpy >= 100 THEN 60.0
                   WHEN cpy >= 50 THEN 40.0
                   ELSE least(40.0, cpy * 0.8) END)
             + (infl::DOUBLE / greatest(1, cc)::DOUBLE) * 20.0
             + least(10.0, nf::DOUBLE * 2.0)
             + (CASE WHEN age >= 10 AND cc >= 1000 THEN 10.0
                     WHEN age >= 5 AND cc >= 500 THEN 5.0
                     ELSE 0.0 END))
         END AS raw_score,
         cc::DOUBLE / r_age::DOUBLE AS r_cpy
  FROM scored
), reasons AS (
  SELECT *,
    list_filter([
      CASE WHEN cc >= 10000 THEN 'Exceptionally high citations (' || format('{{:,}}', cc) || ')'
           WHEN cc >= 1000 THEN 'Highly cited (' || format('{{:,}}', cc) || ' citations)' END,
      CASE WHEN r_cpy >= 200 THEN 'High citation velocity (' || round(r_cpy, 0)::BIGINT::VARCHAR || '/year)' END,
      CASE WHEN infl >= 100 THEN 'High influential citations (' || infl::VARCHAR || ')' END,
      CASE WHEN nf >= 3 THEN 'Cross-disciplinary impact (' || nf::VARCHAR || ' fields)' END,
      CASE WHEN r_age >= 10 AND cc >= 1000 THEN 'Established foundational work' END,
      CASE WHEN oa THEN 'Open access - widely accessible' END
    ], x -> x IS NOT NULL) AS rl
  FROM s2
), final AS (
  SELECT paper_id AS doc_id,
         round(raw_score, 4) AS landmark_score,
         CASE WHEN len(rl) = 0 THEN ['Significant contribution to the field']
              ELSE rl[1:4] END AS rl2
  FROM reasons
)
SELECT doc_id, landmark_score,
       len(rl2) AS n_reasons,
       list_aggregate(rl2, 'string_agg', ' | ') AS reasons,
       row_number() OVER (ORDER BY landmark_score DESC, doc_id ASC) AS rk
FROM final
QUALIFY rk <= 20
"""


def q_citation_trends_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly citation trends + peak year (citations.py:609-643) over the
    planted 3-regular citation graph; NULL citing years skipped."""
    docs = load_table(spark, sf_dir, "documents")
    return citation_yearly_trends(_citation_edges(docs), _paper_meta(docs))


SQL_CITATION_TRENDS_DOCS = f"""
WITH meta AS ({_SQL_META}), edges AS ({_SQL_EDGES}),
yearly AS (
  SELECT e.cited_id, m.year, count(*) AS n_citing
  FROM edges e JOIN meta m ON m.paper_id = e.citing_id
  WHERE m.year IS NOT NULL
  GROUP BY e.cited_id, m.year
)
SELECT cited_id, year, n_citing,
       (row_number() OVER (PARTITION BY cited_id
                           ORDER BY n_citing DESC, year ASC) = 1)::INT AS is_peak
FROM yearly
"""


def q_citation_network_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-center citation-network stats (citations.py:465-568): seen-ids
    node dedup (reference beats citation), unconditional edge append,
    avg citation count over the deduped node set."""
    docs = load_table(spark, sf_dir, "documents")
    return citation_network_stats(_citation_edges(docs), _paper_meta(docs))


SQL_CITATION_NETWORK_DOCS = f"""
WITH meta AS ({_SQL_META}), edges AS ({_SQL_EDGES}),
refs AS (SELECT citing_id AS center, cited_id AS nbr FROM edges),
cits AS (SELECT cited_id AS center, citing_id AS nbr FROM edges),
new_citers AS (
  SELECT DISTINCT c.center, c.nbr FROM cits c
  WHERE c.nbr <> c.center
    AND NOT EXISTS (SELECT 1 FROM refs r
                    WHERE r.center = c.center AND r.nbr = c.nbr)
),
ref_nodes AS (
  SELECT center, count(*) AS n_ref_nodes, sum(m.cc) AS ref_cc
  FROM (SELECT DISTINCT center, nbr FROM refs WHERE nbr <> center) r
  JOIN meta m ON m.paper_id = r.nbr GROUP BY center
),
ref_edges AS (SELECT center, count(*) AS n_ref_edges FROM refs GROUP BY center),
cit_edges AS (SELECT center, count(*) AS n_cit_edges FROM cits GROUP BY center),
cit_nodes AS (
  SELECT center, count(*) AS n_cit_nodes, sum(m.cc) AS cit_cc
  FROM new_citers n JOIN meta m ON m.paper_id = n.nbr GROUP BY center
)
SELECT m.paper_id AS center,
       1 + coalesce(rn.n_ref_nodes, 0) + coalesce(cn.n_cit_nodes, 0) AS total_nodes,
       coalesce(re.n_ref_edges, 0) + coalesce(ce.n_cit_edges, 0) AS total_edges,
       coalesce(rn.n_ref_nodes, 0) AS references_count,
       coalesce(cn.n_cit_nodes, 0) AS citations_count,
       round((m.cc + coalesce(rn.ref_cc, 0) + coalesce(cn.cit_cc, 0))::DOUBLE
             / (1 + coalesce(rn.n_ref_nodes, 0) + coalesce(cn.n_cit_nodes, 0))::DOUBLE,
             4) AS avg_citations
FROM meta m
LEFT JOIN ref_edges re ON re.center = m.paper_id
LEFT JOIN cit_edges ce ON ce.center = m.paper_id
LEFT JOIN ref_nodes rn ON rn.center = m.paper_id
LEFT JOIN cit_nodes cn ON cn.center = m.paper_id
"""


def q_related_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Related papers by shared citation edges (citations.py:644-695):
    citers + references ranked by the related paper's citation count,
    cites_this-wins dedup, top 10 per center."""
    docs = load_table(spark, sf_dir, "documents")
    return related_papers(_citation_edges(docs), _paper_meta(docs), limit=10)


SQL_RELATED_DOCS = f"""
WITH meta AS ({_SQL_META}), edges AS ({_SQL_EDGES}),
pool AS (
  SELECT cited_id AS center, citing_id AS related_id,
         'cites_this' AS relation, 0 AS rel_ord
  FROM edges
  UNION ALL
  SELECT citing_id AS center, cited_id AS related_id,
         'cited_by_this' AS relation, 1 AS rel_ord
  FROM edges
), scored AS (
  SELECT p.center, p.related_id, p.relation, p.rel_ord, m.cc AS relevance
  FROM pool p JOIN meta m ON m.paper_id = p.related_id
  WHERE p.related_id <> p.center
), dedup AS (
  SELECT *, row_number() OVER (PARTITION BY center, related_id
                               ORDER BY rel_ord) AS dup
  FROM scored
)
SELECT center, related_id, relation, relevance,
       row_number() OVER (PARTITION BY center
                          ORDER BY relevance DESC, related_id ASC) AS rk
FROM dedup WHERE dup = 1
QUALIFY rk <= 10
"""


# --- crawler-side paper scoring (operators/paper_scoring.py —
# web_crawler_agent.py:126-287, 728-792) -----------------------------------

#: doc_id % 5 title rotation for the query-term filter ('cancer
#: immunotherapy'): two title hits, two abstract-only hits, one miss.
_PS_TITLES = [
    "New cancer therapy shows promise",          # title hit
    "Immunotherapy outcomes in melanoma",        # title hit
    "Checkpoint blockade trial results",         # abstract decides
    "Tumor microenvironment atlas",              # abstract decides
    "Unrelated metabolic pathway note",          # abstract decides
]
_PS_ABSTRACTS = [
    "broad cancer cohort",                       # hit (irrelevant: title hit)
    "",                                          # empty
    "first-line immunotherapy arm",              # abstract hit
    "no relevant terms here",                    # miss
    "cancer incidence registry",                 # abstract hit
]
_PS_QUERY = "cancer immunotherapy"


def q_paper_trend_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PaperScorer (web_crawler_agent.py:142-241): planted per-paper
    year / citation counts / publication surge plus a 5-year planted
    citations-by-year series -> recency, citation velocity (with the
    only-recent -> 5.0 rule) and the 35/25/20/20 trend blend; fallback
    branches exercised by zero-velocity/zero-surge and zero-citation
    rotations. current_year pinned 2025."""
    from vectordb_bioinsight_spark.operators.paper_scoring import (
        citation_velocity,
        recency_score,
        trend_score,
    )

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    papers = docs.select(
        d.alias("paper_id"),
        F.when(d % 11 == 0, F.lit(None).cast("int"))
        .otherwise((F.lit(2016) + (d * 3) % 10).cast("int"))
        .alias("year"),
        F.when(d % 7 == 0, F.lit(0)).otherwise((d * 37) % 5000).alias("citation_count"),
        F.when(d % 6 == 0, F.lit(0.0))
        .otherwise(F.round(((d * 3) % 40).cast("double") / 10.0, 4))
        .alias("publication_surge"),
    )
    by_year = docs.select(
        d.alias("paper_id"),
        F.explode(
            F.array(*[F.lit(2025 - off) for off in range(5)])
        ).alias("year"),
    ).withColumn(
        "n_citations",
        F.when(F.col("paper_id") % 4 == 0, F.lit(0)).otherwise(
            (F.col("paper_id") * (F.lit(2026) - F.col("year"))) % 30
        ),
    )
    vel = citation_velocity(by_year, current_year=2025)
    out = papers.join(vel, "paper_id", "left").na.fill(0.0, ["citation_velocity"])
    rec = recency_score(F.col("year"), 2025)
    return out.select(
        F.col("paper_id").alias("doc_id"),
        F.round(rec, 4).alias("recency_score"),
        "citation_velocity",
        F.round(
            trend_score(
                F.col("citation_velocity"),
                F.col("publication_surge"),
                F.col("citation_count"),
                rec,
            ),
            4,
        ).alias("trend_score"),
    )


SQL_PAPER_TREND_SCORES = """
WITH papers AS (
  SELECT doc_id AS paper_id,
         CASE WHEN doc_id % 11 = 0 THEN NULL
              ELSE 2016 + (doc_id * 3) % 10 END AS year,
         CASE WHEN doc_id % 7 = 0 THEN 0 ELSE (doc_id * 37) % 5000 END AS cc,
         CASE WHEN doc_id % 6 = 0 THEN 0.0
              ELSE round(((doc_id * 3) % 40)::DOUBLE / 10.0, 4) END AS surge
  FROM documents
), by_year AS (
  SELECT doc_id AS paper_id, y.year,
         CASE WHEN doc_id % 4 = 0 THEN 0
              ELSE (doc_id * (2026 - y.year)) % 30 END AS n
  FROM documents, (SELECT unnest([2025, 2024, 2023, 2022, 2021]) AS year) y
), vel AS (
  SELECT paper_id,
         round(CASE WHEN sum(CASE WHEN year >= 2022 AND year < 2024 THEN n ELSE 0 END) > 0
                    THEN sum(CASE WHEN year >= 2024 THEN n ELSE 0 END)::DOUBLE
                         / sum(CASE WHEN year >= 2022 AND year < 2024 THEN n ELSE 0 END)::DOUBLE
                    WHEN sum(CASE WHEN year >= 2024 THEN n ELSE 0 END) > 0 THEN 5.0
                    ELSE 0.0 END, 6) AS velocity
  FROM by_year GROUP BY paper_id
), scored AS (
  SELECT p.paper_id, p.year, p.cc, p.surge,
         coalesce(v.velocity, 0.0) AS velocity,
         CASE WHEN p.year IS NULL OR p.year = 0 THEN 0.0
              ELSE greatest(0.0, 100.0 - (2025 - p.year)::DOUBLE * 20.0) END AS rec,
         CASE WHEN p.cc > 0 THEN least(100.0, log10(p.cc::DOUBLE + 1.0) * 30.0)
              ELSE 0.0 END AS cscore
  FROM papers p LEFT JOIN vel v ON v.paper_id = p.paper_id
)
SELECT paper_id AS doc_id,
       round(rec, 4) AS recency_score,
       velocity AS citation_velocity,
       round(CASE WHEN velocity > 0 OR surge > 0
                  THEN least(100.0, velocity * 20.0) * 0.35
                       + least(100.0, surge * 25.0) * 0.25
                       + cscore * 0.20 + rec * 0.20
                  WHEN cc > 0 THEN cscore * 0.6 + rec * 0.4
                  ELSE rec * 0.5 END, 4) AS trend_score
FROM scored
"""


def q_query_filtered_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-term filter with fill-from-abstract overflow
    (web_crawler_agent.py:760-792): documents grouped into 50
    search-result lists, planted title/abstract rotations, max_results 4
    per list; the stateful while-short loop runs as the prefix-rank
    reduction (module docstring)."""
    from vectordb_bioinsight_spark.operators.paper_scoring import (
        filter_by_query_terms,
    )

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    frame = docs.select(
        "doc_id",
        (d % 50).cast("int").alias("group_id"),
        F.floor(d / 50).cast("int").alias("scan_order"),
        F.element_at(
            F.array(*[F.lit(t) for t in _PS_TITLES]), (d % 5 + 1).cast("int")
        ).alias("title"),
        F.element_at(
            F.array(*[F.lit(a) for a in _PS_ABSTRACTS]), (d % 5 + 1).cast("int")
        ).alias("abstract"),
        (d % 90).cast("double").alias("trend_score"),
    )
    return filter_by_query_terms(
        frame, _PS_QUERY, max_results=4, group_col="group_id"
    ).select("group_id", "doc_id", "trend_score", "match_kind")


def _sql_query_filtered() -> str:
    titles = ",".join("'" + t.replace("'", "''") + "'" for t in _PS_TITLES)
    abstracts = ",".join("'" + a.replace("'", "''") + "'" for a in _PS_ABSTRACTS)
    terms = _PS_QUERY.lower().split()

    def hits(col: str) -> str:
        return " OR ".join(f"contains(lower({col}), '{t}')" for t in terms)

    return f"""
WITH rot(i, title, abstract) AS (
  SELECT i, t[i + 1], a[i + 1]
  FROM (SELECT [{titles}] AS t, [{abstracts}] AS a), range(5) r(i)
), frame AS (
  SELECT d.doc_id, d.doc_id % 50 AS group_id, d.doc_id // 50 AS scan_order,
         rot.title, rot.abstract, (d.doc_id % 90)::DOUBLE AS trend_score
  FROM documents d JOIN rot ON rot.i = d.doc_id % 5
), flagged AS (
  SELECT *,
         ({hits('title')}) AS title_hit,
         NOT ({hits('title')}) AND abstract IS NOT NULL AND abstract <> ''
             AND ({hits('abstract')}) AS abs_hit
  FROM frame
), staged AS (
  SELECT *,
         coalesce(sum(CASE WHEN title_hit THEN 1 ELSE 0 END)
           OVER (PARTITION BY group_id ORDER BY scan_order
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tb,
         sum(CASE WHEN abs_hit THEN 1 ELSE 0 END)
           OVER (PARTITION BY group_id ORDER BY scan_order) AS j
  FROM flagged
)
SELECT group_id, doc_id,
       CASE WHEN abs_hit THEN trend_score - 10.0 ELSE trend_score END AS trend_score,
       CASE WHEN title_hit THEN 'title' ELSE 'abstract' END AS match_kind
FROM staged
WHERE title_hit OR (abs_hit AND tb + (j - 1) < 4)
"""


SQL_QUERY_FILTERED_DOCS = _sql_query_filtered()


# --- PubMed XML parse layer (operators/pubmed_xml.py —
# web_crawler_agent.py:947-1053) --------------------------------------------
# Oracle design: Spark BUILDS each article's XML from planted modular
# fields and parses it back with xpath; DuckDB emits the expected output
# DIRECTLY from the same planted fields — any parse defect breaks the
# hash without the oracle ever touching XML.


def q_pubmed_parse_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PubMed efetch XML parsing (web_crawler_agent.py:963-1053): planted
    per-doc XML crossing nested-markup titles (itertext flattening),
    labeled/unlabeled/absent abstracts, missing PMIDs (row dropped),
    invalid years, and typed ArticleId lists."""
    from vectordb_bioinsight_spark.operators.pubmed_xml import parse_pubmed_articles

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    pmid_xml = F.when(d % 13 == 0, F.lit("")).otherwise(
        F.concat(F.lit("<PMID>10"), d.cast("string"), F.lit("</PMID>"))
    )
    title_xml = F.when(
        d % 4 == 0,
        F.concat(
            F.lit("<ArticleTitle>Study of GENE"), (d % 50).cast("string"),
            F.lit(" <i>in vivo</i> effects</ArticleTitle>"),
        ),
    ).otherwise(
        F.concat(
            F.lit("<ArticleTitle>Study of GENE"), (d % 50).cast("string"),
            F.lit(" effects</ArticleTitle>"),
        )
    )
    abstract_xml = (
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit('<Abstract><AbstractText Label="BACKGROUND">bg text '),
                (d % 9).cast("string"),
                F.lit('</AbstractText><AbstractText Label="RESULTS">res text '),
                (d % 9).cast("string"),
                F.lit("</AbstractText></Abstract>"),
            ),
        )
        .when(
            d % 3 == 1,
            F.concat(
                F.lit("<Abstract><AbstractText>plain abstract "),
                (d % 9).cast("string"), F.lit("</AbstractText></Abstract>"),
            ),
        )
        .otherwise(F.lit(""))
    )
    year_xml = F.when(d % 17 == 0, F.lit("<PubDate><Year>n.d.</Year></PubDate>")).otherwise(
        F.concat(F.lit("<PubDate><Year>"), (F.lit(2000) + d % 26).cast("string"), F.lit("</Year></PubDate>"))
    )
    ids_xml = F.concat(
        F.when(d % 3 != 0, F.concat(F.lit('<ArticleId IdType="doi">10.1000/d'), d.cast("string"), F.lit("</ArticleId>"))).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.concat(F.lit('<ArticleId IdType="pmc">PMC'), d.cast("string"), F.lit("</ArticleId>"))).otherwise(F.lit("")),
    )
    kw_xml = F.when(
        d % 2 == 0,
        F.concat(
            F.lit("<KeywordList><Keyword>kw"), (d % 11).cast("string"),
            F.lit("</Keyword><Keyword>kw"), ((d + 1) % 11).cast("string"),
            F.lit("</Keyword></KeywordList>"),
        ),
    ).otherwise(F.lit(""))
    pt_xml = F.concat(
        F.lit("<PublicationTypeList><PublicationType>Journal Article</PublicationType>"),
        F.when(d % 6 == 0, F.lit("<PublicationType>Review</PublicationType>")).otherwise(F.lit("")),
        F.lit("</PublicationTypeList>"),
    )
    xml = F.concat(
        F.lit("<PubmedArticle><MedlineCitation>"),
        pmid_xml,
        F.lit("<Article>"),
        title_xml,
        abstract_xml,
        F.lit("<AuthorList><Author><ForeName>Ann</ForeName><LastName>Lee"),
        (d % 8).cast("string"),
        F.lit("</LastName></Author><Author><ForeName>Bo</ForeName><LastName>Kim"),
        (d % 8).cast("string"),
        F.lit("</LastName></Author></AuthorList>"),
        F.lit("<Journal><Title>Journal of Topic "), (d % 7).cast("string"), F.lit("</Title></Journal>"),
        year_xml,
        pt_xml,
        F.lit("</Article>"),
        kw_xml,
        F.lit("</MedlineCitation><PubmedData>"),
        ids_xml,
        F.lit("</PubmedData></PubmedArticle>"),
    )
    frame = docs.select("doc_id", xml.alias("article_xml"))
    # doc_id passes straight through the parser (non-xml columns are kept)
    return parse_pubmed_articles(frame)


SQL_PUBMED_PARSE_DOCS = """
SELECT doc_id,
       '10' || doc_id::VARCHAR AS pmid,
       CASE WHEN doc_id % 4 = 0
            THEN 'Study of GENE' || (doc_id % 50)::VARCHAR || ' in vivo effects'
            ELSE 'Study of GENE' || (doc_id % 50)::VARCHAR || ' effects' END AS title,
       CASE WHEN doc_id % 3 = 0
            THEN 'BACKGROUND: bg text ' || (doc_id % 9)::VARCHAR
                 || chr(10) || 'RESULTS: res text ' || (doc_id % 9)::VARCHAR
            WHEN doc_id % 3 = 1 THEN 'plain abstract ' || (doc_id % 9)::VARCHAR
            ELSE '' END AS abstract,
       'Ann Lee' || (doc_id % 8)::VARCHAR || ' | Bo Kim' || (doc_id % 8)::VARCHAR AS authors,
       'Journal of Topic ' || (doc_id % 7)::VARCHAR AS journal,
       CASE WHEN doc_id % 17 = 0 THEN 0 ELSE 2000 + doc_id % 26 END AS year,
       CASE WHEN doc_id % 3 <> 0 THEN '10.1000/d' || doc_id::VARCHAR ELSE '' END AS doi,
       CASE WHEN doc_id % 5 = 0 THEN 'PMC' || doc_id::VARCHAR ELSE '' END AS pmcid,
       CASE WHEN doc_id % 2 = 0
            THEN 'kw' || (doc_id % 11)::VARCHAR || ' | kw' || ((doc_id + 1) % 11)::VARCHAR
            ELSE '' END AS keywords,
       CASE WHEN doc_id % 6 = 0 THEN 'Journal Article | Review'
            ELSE 'Journal Article' END AS pub_types,
       'https://pubmed.ncbi.nlm.nih.gov/10' || doc_id::VARCHAR || '/' AS url
FROM documents
WHERE doc_id % 13 <> 0
"""
