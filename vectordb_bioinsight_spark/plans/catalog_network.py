"""Network / ML-adjacent / scalar-function catalog additions: correlation
networks (M2), centralities (M3, rows-only), exact percentiles, JSON
extraction, sessionization, and blocked embedding near-dup."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.network import (
    correlation_edges,
    eigenvector_centrality,
    hub_scores,
    hub_scores_full,
)
from vectordb_bioinsight_spark.operators.vector import similarity_self_join
from vectordb_bioinsight_spark.sources.readers import load_table

N_CORR_PARTS = 20


def _part_month_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly quantity profile for the top-N parts by total quantity
    (deterministic cap — mirrors the reference's 1000-gene cap, logged by
    being explicit in the plan)."""
    li = load_table(spark, sf_dir, "lineitem")
    top = (
        li.groupBy("l_partkey")
        .agg(F.sum("l_quantity").alias("_tq"))
        .orderBy(F.desc("_tq"), F.asc("l_partkey"))
        .limit(N_CORR_PARTS)
        .select("l_partkey")
    )
    return (
        li.join(F.broadcast(top), "l_partkey")
        .groupBy("l_partkey", F.date_trunc("month", "l_shipdate").alias("month"))
        .agg(F.sum("l_quantity").alias("qty"))
    )


def q_part_correlation_network(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: correlation network over part demand profiles — the gene
    co-expression build re-expressed (agent2_network.py:115-205): long
    profiles, pairwise Pearson over shared months, threshold on |r|."""
    prof = _part_month_profiles(spark, sf_dir)
    edges = correlation_edges(prof, "l_partkey", "month", "qty", min_abs_corr=0.4)
    return edges.withColumnRenamed("entity1", "part1").withColumnRenamed("entity2", "part2")


SQL_PART_CORRELATION_NETWORK = f"""
WITH top_parts AS (
  SELECT l_partkey FROM lineitem GROUP BY l_partkey
  ORDER BY sum(l_quantity) DESC, l_partkey ASC LIMIT {N_CORR_PARTS}
), prof AS (
  SELECT l_partkey, date_trunc('month', l_shipdate) AS month, sum(l_quantity) AS qty
  FROM lineitem JOIN top_parts USING (l_partkey)
  GROUP BY 1, 2
), pairs AS (
  SELECT a.l_partkey AS part1, b.l_partkey AS part2,
         count(*) AS n_dims, corr(a.qty, b.qty) AS r
  FROM prof a JOIN prof b ON a.month = b.month
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part1, part2, n_dims, round(r, 6) AS corr
FROM pairs WHERE r IS NOT NULL AND abs(round(r, 6)) >= 0.4
"""


def q_hub_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3+M4: the FULL reference hub blend — 0.35·degree +
    0.30·betweenness + 0.25·eigenvector + 0.10·closeness
    (agent2_network.py:257-295, min_edges_for_hub=5 incl. the all-nodes
    fallback) over the part correlation network.

    Oracle-backed since r03: every metric is replayed in generated SQL —
    the 20-step power iteration unrolled as CTE steps (as in
    ``hub_blend_chain``), and betweenness/closeness via an unrolled
    all-pairs BFS (frontier + path-count sigma per level) with Brandes
    dependency back-propagation unrolled level-by-level. All four metrics
    round to 6 dp BEFORE the blend, so sub-1e-12 float-summation-order
    divergence between engines is quantized away."""
    prof = _part_month_profiles(spark, sf_dir)
    edges = correlation_edges(prof, "l_partkey", "month", "qty", min_abs_corr=0.4)
    return hub_scores_full(edges, top_k_hubs=5)


def _hub_parts_sql(levels: int = 19, eig_iters: int = 20, min_degree: int = 5, top_k: int = 5) -> str:
    """Generated oracle for q_hub_parts: unrolled power iteration +
    unrolled all-pairs BFS (dist, sigma) + unrolled Brandes deltas over
    the <= N_CORR_PARTS-node correlation graph. ``levels`` bounds the BFS
    depth at n_nodes - 1 (worst-case path graph), so the unroll is exact,
    not truncated."""
    p: list[str] = []
    p.append(f"""edges AS MATERIALIZED (
  WITH top_parts AS (
    SELECT l_partkey FROM lineitem GROUP BY l_partkey
    ORDER BY sum(l_quantity) DESC, l_partkey ASC LIMIT {N_CORR_PARTS}
  ), prof AS (
    SELECT l_partkey, date_trunc('month', l_shipdate) AS month, sum(l_quantity) AS qty
    FROM lineitem JOIN top_parts USING (l_partkey) GROUP BY 1, 2
  ), pairs AS (
    SELECT a.l_partkey AS e1, b.l_partkey AS e2, corr(a.qty, b.qty) AS r
    FROM prof a JOIN prof b ON a.month = b.month
    WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2
  )
  SELECT e1, e2 FROM pairs WHERE r IS NOT NULL AND abs(round(r, 6)) >= 0.4
)""")
    p.append("sym AS MATERIALIZED (SELECT e1 AS src, e2 AS dst FROM edges "
             "UNION ALL SELECT e2, e1 FROM edges)")
    p.append("nodes AS MATERIALIZED (SELECT DISTINCT src AS v FROM sym)")
    p.append("nn AS (SELECT count(*)::DOUBLE AS n FROM nodes)")
    p.append("deg AS (SELECT src AS entity, count(*)::BIGINT AS degree FROM sym GROUP BY 1)")
    # eigenvector: unrolled power iteration, L2 normalize each step
    p.append("s0 AS MATERIALIZED (SELECT v AS entity, 1.0/sqrt((SELECT n FROM nn)) AS score FROM nodes)")
    for t in range(1, eig_iters + 1):
        p.append(f"c{t} AS MATERIALIZED (SELECT e.dst AS entity, sum(s.score) AS raw "
                 f"FROM sym e JOIN s{t-1} s ON e.src = s.entity GROUP BY 1)")
        p.append(f"nrm{t} AS (SELECT sqrt(sum(raw*raw)) AS nv FROM c{t})")
        p.append(f"s{t} AS MATERIALIZED (SELECT entity, raw/nv AS score FROM c{t}, nrm{t})")
    p.append(f"eig AS (SELECT entity, round(score, 6) AS eig_centrality FROM s{eig_iters})")
    # all-pairs BFS: v{t} = visited pairs (source s, node, #shortest paths sigma, dist d)
    p.append("v0 AS MATERIALIZED (SELECT v AS s, v AS node, 1.0 AS sigma, 0 AS d FROM nodes)")
    for t in range(1, levels + 1):
        p.append(f"""f{t} AS MATERIALIZED (
  SELECT p.s, e.dst AS node, sum(p.sigma) AS sigma
  FROM v{t-1} p JOIN sym e ON e.src = p.node
  WHERE p.d = {t-1} AND NOT EXISTS (
    SELECT 1 FROM v{t-1} x WHERE x.s = p.s AND x.node = e.dst)
  GROUP BY 1, 2)""")
        p.append(f"v{t} AS MATERIALIZED (SELECT * FROM v{t-1} "
                 f"UNION ALL SELECT s, node, sigma, {t} AS d FROM f{t})")
    p.append(f"lvl AS MATERIALIZED (SELECT * FROM v{levels})")
    # closeness: networkx wf_improved form from the distance table
    p.append("""clo AS (
  SELECT s AS entity,
         round(CASE WHEN sum(d) > 0 AND (SELECT n FROM nn) > 1
               THEN ((count(*) - 1.0) / sum(d)) * ((count(*) - 1.0) / ((SELECT n FROM nn) - 1.0))
               ELSE 0.0 END, 6) AS closeness
  FROM lvl GROUP BY s)""")
    # Brandes: delta back-propagation from the deepest level upward
    p.append(f"dl{levels} AS MATERIALIZED (SELECT s, node, sigma, 0.0 AS delta FROM lvl WHERE d = {levels})")
    for t in range(levels - 1, 0, -1):
        p.append(f"""dl{t} AS MATERIALIZED (
  SELECT c.s, c.node, c.sigma,
         coalesce(sum(c.sigma / p.sigma * (1.0 + p.delta)), 0.0) AS delta
  FROM (SELECT s, node, sigma FROM lvl WHERE d = {t}) c
  LEFT JOIN sym e ON e.src = c.node
  LEFT JOIN dl{t+1} p ON p.s = c.s AND p.node = e.dst
  GROUP BY 1, 2, 3)""")
    all_deltas = " UNION ALL ".join(f"SELECT node, delta FROM dl{t}" for t in range(1, levels + 1))
    p.append(f"""btw AS (
  SELECT node AS entity, round(sum(delta) / 2.0, 6) AS betweenness
  FROM ({all_deltas}) GROUP BY 1)""")
    p.append("""joined AS (
  SELECT d.entity, d.degree,
         coalesce(b.betweenness, 0.0) AS betweenness,
         coalesce(e.eig_centrality, 0.0) AS eig_centrality,
         coalesce(c.closeness, 0.0) AS closeness
  FROM deg d LEFT JOIN btw b USING (entity) LEFT JOIN eig e USING (entity)
  LEFT JOIN clo c USING (entity))""")
    p.append(f"""cand AS (
  SELECT * FROM joined WHERE degree >= {min_degree}
  OR NOT EXISTS (SELECT 1 FROM joined j2 WHERE j2.degree >= {min_degree}))""")
    p.append("""mx AS (
  SELECT max(degree)::DOUBLE AS mdeg, max(betweenness) AS mbtw,
         max(eig_centrality) AS meig, max(closeness) AS mclo
  FROM cand)""")
    p.append("""scored AS (
  SELECT entity, degree, betweenness, eig_centrality, closeness,
         round(0.35 * (CASE WHEN mdeg != 0 THEN degree / mdeg ELSE 0.0 END)
             + 0.30 * (CASE WHEN mbtw != 0 THEN betweenness / mbtw ELSE 0.0 END)
             + 0.25 * (CASE WHEN meig != 0 THEN eig_centrality / meig ELSE 0.0 END)
             + 0.10 * (CASE WHEN mclo != 0 THEN closeness / mclo ELSE 0.0 END), 6) AS hub_score
  FROM cand, mx)""")
    body = ",\n".join(p)
    return f"""WITH {body}
SELECT entity, degree, betweenness, eig_centrality, closeness, hub_score,
       (row_number() OVER (ORDER BY hub_score DESC, entity ASC)) <= {top_k} AS is_hub
FROM scored
"""


SQL_HUB_PARTS = _hub_parts_sql()


def q_median_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (A9 pseudobulk-median semantics,
    singlecell/agent5_cnv_ml.py:187-241) — linear-interpolation median +
    p90, matching DuckDB quantile_cont."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
        F.count("*").cast("long").alias("n_orders"),
    )


SQL_MEDIAN_ORDER_VALUE = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
       count(*) AS n_orders
FROM orders GROUP BY 1
"""


def q_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 JSON codec: extract a typed field from the events JSON props
    column (to_json/from_json family)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    ).filter(F.col("k_val") > 50)


SQL_PROPS_EXTRACT = """
SELECT event_id, json_extract_string(props, '$.k')::BIGINT AS k_val
FROM events WHERE json_extract_string(props, '$.k')::BIGINT > 50
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via gap detection: a new session starts after a >1h
    silence per user; session_id = running count of session starts. The
    batch twin of stream session windows (SURVEY §2.11), pure window algebra.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap_us = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    is_new = F.when(gap_us.isNull() | (gap_us > 3600 * 1_000_000), 1).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.withColumn("_new", is_new)
        .withColumn("session_id", F.sum("_new").over(wsum).cast("long"))
        .select("user_id", "event_id", "session_id")
    )


SQL_SESSIONIZE = """
WITH g AS (
  SELECT user_id, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 3600::BIGINT * 1000000
              THEN 1 ELSE 0 END AS is_new,
         ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT user_id, event_id,
       CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
FROM g
"""


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, label-blocked (BASELINE dedup
    extension): the all-pairs cosine join restricted to a blocking key so it
    is an equi-join, not a cross product."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity_self_join(emb, "vec_id", "embedding", min_cosine=0.25, block_col="label")


SQL_EMBEDDING_NEARDUP = """
WITH p AS (
  SELECT a.vec_id AS id1, b.vec_id AS id2, a.embedding AS ea, b.embedding AS eb
  FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
), sums AS (
  SELECT id1, id2, sum(x * y) AS dot, sum(x * x) AS nx, sum(y * y) AS ny
  FROM (SELECT id1, id2, unnest(ea)::DOUBLE AS x, unnest(eb)::DOUBLE AS y FROM p)
  GROUP BY 1, 2
)
SELECT id1, id2, round(dot / (sqrt(nx) * sqrt(ny)), 6) AS cosine
FROM sums WHERE round(dot / (sqrt(nx) * sqrt(ny)), 6) >= 0.25
"""


def q_part_spearman_network(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 with the reference's default metric (Spearman, agent2_network.py:
    64-67): rank-transform each part's monthly profile, Pearson on ranks."""
    from vectordb_bioinsight_spark.operators.network import spearman_edges

    prof = _part_month_profiles(spark, sf_dir)
    edges = spearman_edges(prof, "l_partkey", "month", "qty", min_abs_corr=0.4)
    return edges.withColumnRenamed("entity1", "part1").withColumnRenamed("entity2", "part2")


SQL_PART_SPEARMAN_NETWORK = f"""
WITH top_parts AS (
  SELECT l_partkey FROM lineitem GROUP BY l_partkey
  ORDER BY sum(l_quantity) DESC, l_partkey ASC LIMIT {N_CORR_PARTS}
), prof AS (
  SELECT l_partkey, date_trunc('month', l_shipdate) AS month, sum(l_quantity) AS qty
  FROM lineitem JOIN top_parts USING (l_partkey)
  GROUP BY 1, 2
), ranked AS (
  SELECT l_partkey, month,
         rank() OVER (PARTITION BY l_partkey ORDER BY qty ASC)
           + (count(*) OVER (PARTITION BY l_partkey, qty) - 1) / 2.0 AS rv
  FROM prof
), pairs AS (
  SELECT a.l_partkey AS part1, b.l_partkey AS part2,
         count(*) AS n_dims, corr(a.rv, b.rv) AS r
  FROM ranked a JOIN ranked b ON a.month = b.month
  WHERE a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part1, part2, n_dims, round(r, 6) AS corr
FROM pairs WHERE r IS NOT NULL AND abs(round(r, 6)) >= 0.4
"""


def q_hub_blend_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3/M4 oracle-bearing blend check: the full 4-metric hub score on a
    deterministic 25-node CHAIN (nations ordered by key, consecutive keys
    joined). On a chain every metric is SQL-replayable: degree/betweenness/
    closeness have closed forms by position, and the 20-step power iteration
    is unrolled as 20 CTE iterations in the oracle (per-node sums have <= 2
    terms, so float addition order is exact on both engines). This pins the
    exact blend weights + normalize-over-candidates + top-k semantics of
    agent2_network.py:257-295 with a hash-checked oracle."""
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey")
    edges = (
        nat.alias("a")
        .join(nat.alias("b"), F.col("a.n_nationkey") + 1 == F.col("b.n_nationkey"))
        .select(
            F.col("a.n_nationkey").cast("long").alias("entity1"),
            F.col("b.n_nationkey").cast("long").alias("entity2"),
        )
    )
    out = hub_scores_full(edges, top_k_hubs=5, min_degree=2)
    return out.withColumn("entity", F.col("entity").cast("long"))


def _eig_chain_cte(n: int = 25, iters: int = 20) -> str:
    """Unrolled power-iteration CTEs mirroring eigenvector_centrality."""
    parts = [f"s0 AS MATERIALIZED (SELECT n_nationkey::BIGINT AS entity, 1.0/sqrt({n}.0) AS score FROM nation)"]
    for t in range(1, iters + 1):
        parts.append(
            f"c{t} AS MATERIALIZED (SELECT e.dst AS entity, sum(s.score) AS raw "
            f"FROM sym e JOIN s{t-1} s ON e.src = s.entity GROUP BY 1)"
        )
        parts.append(f"n{t} AS (SELECT sqrt(sum(raw*raw)) AS nv FROM c{t})")
        parts.append(f"s{t} AS MATERIALIZED (SELECT entity, raw/nv AS score FROM c{t}, n{t})")
    return ",\n".join(parts)


SQL_HUB_BLEND_CHAIN = f"""
WITH sym AS MATERIALIZED (
  SELECT a.n_nationkey::BIGINT AS src, b.n_nationkey::BIGINT AS dst
  FROM nation a JOIN nation b ON a.n_nationkey + 1 = b.n_nationkey
  UNION ALL
  SELECT b.n_nationkey::BIGINT, a.n_nationkey::BIGINT
  FROM nation a JOIN nation b ON a.n_nationkey + 1 = b.n_nationkey
),
{_eig_chain_cte(25, 20)},
metrics AS (
  SELECT n_nationkey::BIGINT AS entity,
         (CASE WHEN n_nationkey IN (0, 24) THEN 1 ELSE 2 END)::BIGINT AS degree,
         round((n_nationkey * (24 - n_nationkey))::DOUBLE, 6) AS betweenness,
         round(24.0 / (n_nationkey * (n_nationkey + 1) / 2.0
                       + (24 - n_nationkey) * (25 - n_nationkey) / 2.0), 6) AS closeness
  FROM nation
),
joined AS (
  SELECT m.entity, m.degree, m.betweenness,
         round(s.score, 6) AS eig_centrality, m.closeness
  FROM metrics m JOIN s20 s ON m.entity = s.entity
),
cand AS (
  SELECT * FROM joined WHERE degree >= 2
),
mx AS (
  SELECT max(degree)::DOUBLE AS mdeg, max(betweenness) AS mbtw,
         max(eig_centrality) AS meig, max(closeness) AS mclo
  FROM cand
),
scored AS (
  SELECT entity, degree, betweenness, eig_centrality, closeness,
         round(0.35 * (degree / mdeg) + 0.30 * (betweenness / mbtw)
               + 0.25 * (eig_centrality / meig) + 0.10 * (closeness / mclo), 6) AS hub_score
  FROM cand, mx
)
SELECT entity, degree, betweenness, eig_centrality, closeness, hub_score,
       (row_number() OVER (ORDER BY hub_score DESC, entity ASC)) <= 5 AS is_hub
FROM scored
"""


def q_pseudotime_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M11 tail: pseudotime over the cell kNN graph (trajectory analog,
    agent4_trajectory.py:245-268) — 3-NN cosine graph over the sampled
    embedding cells (vec_id % 25 == 0), BFS hop distance from root cell 0
    normalized to [0, 1]. The iterative frontier relaxation is replayed in
    the oracle as a recursive CTE over the same kNN edges."""
    from vectordb_bioinsight_spark.operators.network import pseudotime_bfs
    from vectordb_bioinsight_spark.operators.vector import knn_join

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 25 == 0)
    neigh = knn_join(emb, emb, "vec_id", "vec_id", "embedding", k=3, metric="cosine")
    edges = neigh.select(
        F.col("query_id").alias("entity1"), F.col("cand_id").alias("entity2")
    )
    return pseudotime_bfs(edges, root=0)


SQL_PSEUDOTIME_EMBEDDINGS = """
WITH RECURSIVE cells AS MATERIALIZED (
  SELECT vec_id AS id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings WHERE vec_id % 25 = 0
),
pairs AS (
  SELECT q.id AS qid, c.id AS cid, unnest(c.v)::DOUBLE AS x, unnest(q.v)::DOUBLE AS y
  FROM cells q JOIN cells c ON c.id <> q.id
),
sums AS (
  SELECT qid, cid,
         round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 6) AS score
  FROM pairs GROUP BY 1, 2
),
knn AS MATERIALIZED (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid ASC) AS rn
    FROM sums
  ) WHERE rn <= 3
),
sym AS MATERIALIZED (
  SELECT qid AS src, cid AS dst FROM knn
  UNION SELECT cid, qid FROM knn
),
walk(entity, d) AS (
  SELECT 0::BIGINT AS entity, 0 AS d
  UNION
  SELECT e.dst, w.d + 1 FROM walk w JOIN sym e ON e.src = w.entity
  WHERE w.d < (SELECT count(*) FROM cells)
),
dist AS MATERIALIZED (
  SELECT entity, min(d)::INT AS dist FROM walk GROUP BY 1
),
joined AS MATERIALIZED (
  -- every kNN node is a cell, so cells is the node universe (unreached
  -- cells keep NULL dist, matching the Spark side)
  SELECT c.id AS entity, d.dist FROM cells c LEFT JOIN dist d ON c.id = d.entity
)
SELECT entity, dist,
       CASE WHEN dist IS NULL THEN NULL
            WHEN (SELECT max(dist) FROM joined) > 0
            THEN round(dist::DOUBLE / (SELECT max(dist) FROM joined), 6)
            ELSE 0.0 END AS pseudotime
FROM joined
"""


def q_paga_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M11 tail: PAGA-analog connectivity between embedding labels over the
    3-NN cosine graph of sampled cells (vec_id % 10 == 0) — which label
    pairs are wired above chance (agent4_trajectory.py:182-221)."""
    from vectordb_bioinsight_spark.operators.network import cluster_connectivity
    from vectordb_bioinsight_spark.operators.vector import knn_join

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    neigh = knn_join(emb, emb, "vec_id", "vec_id", "embedding", k=3, metric="cosine")
    edges = neigh.select(
        F.col("query_id").alias("entity1"), F.col("cand_id").alias("entity2")
    )
    clusters = emb.select(F.col("vec_id").alias("entity"), F.col("label").alias("cluster"))
    return cluster_connectivity(edges, clusters, threshold=0.05)


SQL_PAGA_LABELS = """
WITH cells AS MATERIALIZED (
  SELECT vec_id AS id, label, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings WHERE vec_id % 10 = 0
),
pairs AS (
  SELECT q.id AS qid, c.id AS cid, unnest(c.v)::DOUBLE AS x, unnest(q.v)::DOUBLE AS y
  FROM cells q JOIN cells c ON c.id <> q.id
),
sums AS (
  SELECT qid, cid,
         round(sum(x * y) / (sqrt(sum(x * x)) * sqrt(sum(y * y))), 6) AS score
  FROM pairs GROUP BY 1, 2
),
knn AS MATERIALIZED (
  SELECT qid, cid FROM (
    SELECT qid, cid,
           row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid ASC) AS rn
    FROM sums
  ) WHERE rn <= 3
),
labeled AS (
  SELECT least(a.label, b.label) AS cluster_a, greatest(a.label, b.label) AS cluster_b
  FROM knn JOIN cells a ON knn.qid = a.id JOIN cells b ON knn.cid = b.id
  WHERE a.label <> b.label
),
inter AS (
  SELECT cluster_a, cluster_b, count(*)::BIGINT AS n_edges FROM labeled GROUP BY 1, 2
),
sizes AS (SELECT label, count(*)::BIGINT AS sz FROM cells GROUP BY 1),
tot AS (
  SELECT (SELECT count(*)::DOUBLE FROM knn) AS te,
         (SELECT count(*)::DOUBLE FROM cells) AS n
)
SELECT i.cluster_a, i.cluster_b, i.n_edges,
       round(i.n_edges / (sa.sz * sb.sz * t.te / (t.n * (t.n - 1.0) / 2.0)), 6) AS connectivity
FROM inter i
JOIN sizes sa ON i.cluster_a = sa.label
JOIN sizes sb ON i.cluster_b = sb.label, tot t
WHERE round(i.n_edges / (sa.sz * sb.sz * t.te / (t.n * (t.n - 1.0) / 2.0)), 6) > 0.05
"""


def q_pagerank_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (d=0.85, 10 fixed iterations) over the word
    co-occurrence graph — the KG node-importance measure
    (operators/network.pagerank). Oracle: the identical recurrence unrolled
    as chained CTEs (the same convention as the eigenvector chain oracle)."""
    from vectordb_bioinsight_spark.operators.joins import cooccurrence_edges
    from vectordb_bioinsight_spark.operators.network import pagerank

    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                    lambda t: F.length(t) >= 4,
                )
            )
        ).alias("word"),
    )
    edges = cooccurrence_edges(pairs, "word", "doc_id", min_weight=50).select(
        F.col("item1").alias("entity1"), F.col("item2").alias("entity2")
    )
    return pagerank(edges, damping=0.85, max_iter=10).withColumnRenamed(
        "entity", "word"
    )


def _pagerank_chain_cte(iters: int = 10, damping: float = 0.85) -> str:
    """Unrolled PageRank CTEs mirroring operators/network.pagerank."""
    parts = [
        "nodes AS MATERIALIZED (SELECT DISTINCT src FROM sym)",
        "nn AS (SELECT count(*)::DOUBLE AS c FROM nodes)",
        "dg AS MATERIALIZED (SELECT src, count(*)::DOUBLE AS d FROM sym GROUP BY 1)",
        "p0 AS MATERIALIZED (SELECT src AS entity, 1.0/(SELECT c FROM nn) AS score FROM nodes)",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"p{t} AS MATERIALIZED (SELECT e.dst AS entity, "
            f"(1.0 - {damping})/(SELECT c FROM nn) + {damping} * sum(p.score / dg.d) AS score "
            f"FROM sym e JOIN p{t-1} p ON e.src = p.entity JOIN dg ON dg.src = e.src "
            f"GROUP BY e.dst)"
        )
    return ",\n".join(parts)


SQL_PAGERANK_WORDS = f"""
WITH dw AS (
  SELECT DISTINCT doc_id, word FROM (
    SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                          t -> length(t) >= 4)) AS word
    FROM documents
  )
),
pairs AS MATERIALIZED (
  SELECT a.word AS item1, b.word AS item2
  FROM dw a JOIN dw b USING (doc_id)
  WHERE a.word < b.word
  GROUP BY 1, 2 HAVING count(*) >= 50
),
sym AS MATERIALIZED (
  SELECT item1 AS src, item2 AS dst FROM pairs
  UNION
  SELECT item2, item1 FROM pairs
),
{_pagerank_chain_cte(10, 0.85)}
SELECT entity AS word, round(score, 6) AS pagerank FROM p10
"""


def q_word_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the word co-occurrence graph — the
    ordered wedge-close join (each triangle enumerated once), zeros kept."""
    from vectordb_bioinsight_spark.operators.joins import cooccurrence_edges
    from vectordb_bioinsight_spark.operators.network import triangle_counts

    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                    lambda t: F.length(t) >= 4,
                )
            )
        ).alias("word"),
    )
    edges = cooccurrence_edges(pairs, "word", "doc_id", min_weight=50)
    return triangle_counts(edges, "item1", "item2").withColumnRenamed("node", "word")


SQL_WORD_TRIANGLES = """
WITH dw AS (
  SELECT DISTINCT doc_id, word FROM (
    SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                          t -> length(t) >= 4)) AS word
    FROM documents
  )
), e AS (
  SELECT a.word AS a, b.word AS b
  FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.word < b.word
  GROUP BY 1, 2
  HAVING count(*) >= 50
), tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
), per_node AS (
  SELECT node, count(*)::BIGINT AS n_triangles FROM (
    SELECT x AS node FROM tri UNION ALL
    SELECT y FROM tri UNION ALL
    SELECT z FROM tri
  ) GROUP BY node
), nodes AS (
  SELECT a AS node FROM e UNION SELECT b FROM e
)
SELECT n.node AS word, coalesce(p.n_triangles, 0)::BIGINT AS n_triangles
FROM nodes n LEFT JOIN per_node p ON n.node = p.node
"""


_KCORE_K = 2
_KCORE_ROUNDS = 4


def q_kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core backbone of the part co-purchase graph: parts co-occurring
    in >= 2 orders form edges; a 4-round degree-2 peel strips the
    pendant tails and keeps the recurrent-basket core
    (operators/network.py::kcore_peel — fixed-round unroll, identical
    CTE chain on the DuckDB side)."""
    from vectordb_bioinsight_spark.operators.network import kcore_peel

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= 2)
    )
    return kcore_peel(pairs, "p1", "p2", k=_KCORE_K, rounds=_KCORE_ROUNDS)


def _sql_kcore_parts() -> str:
    rounds = []
    for i in range(_KCORE_ROUNDS):
        prev = f"e{i}"
        rounds.append(f"""
k{i} AS (SELECT a FROM {prev} GROUP BY a HAVING count(*) >= {_KCORE_K}),
e{i + 1} AS (
  SELECT e.a, e.b FROM {prev} e
  JOIN k{i} ka ON e.a = ka.a
  JOIN k{i} kb ON e.b = kb.a
)""")
    return f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pr AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS w
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
e0 AS (
  SELECT p1 AS a, p2 AS b FROM pr
  UNION
  SELECT p2, p1 FROM pr
),{",".join(rounds)}
SELECT a AS node, count(*)::BIGINT AS core_degree
FROM e{_KCORE_ROUNDS} GROUP BY a
"""


SQL_KCORE_PARTS = _sql_kcore_parts()


def q_item_cf_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item CF over order baskets (operators/joins.py::item_cf_topk):
    top-5 'also bought' parts per part by cosine-normalized co-purchase —
    the content-free recommender baseline next to the embedding arm."""
    from vectordb_bioinsight_spark.operators.joins import item_cf_topk

    li = load_table(spark, sf_dir, "lineitem")
    return item_cf_topk(li, "l_partkey", "l_orderkey", k=5, min_cooc=2)


SQL_ITEM_CF_PARTS = """
WITH li AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS item FROM lineitem),
edges AS (
  SELECT a.item AS item1, b.item AS item2, count(*)::BIGINT AS weight
  FROM li a JOIN li b ON a.b = b.b AND a.item < b.item
  GROUP BY 1, 2 HAVING count(*) >= 2
),
counts AS (SELECT item, count(*)::BIGINT AS n_item FROM li GROUP BY 1),
sym AS (
  SELECT item1 AS item, item2 AS neighbor, weight FROM edges
  UNION ALL
  SELECT item2, item1, weight FROM edges
),
scored AS (
  SELECT s.item, s.neighbor, s.weight,
         round(s.weight / sqrt(ci.n_item * cn.n_item), 6) AS similarity
  FROM sym s
  JOIN counts ci ON ci.item = s.item
  JOIN counts cn ON cn.item = s.neighbor
)
SELECT item, neighbor, weight AS cooc, similarity, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY item
                               ORDER BY similarity DESC, neighbor ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""


def q_part_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the part co-purchase graph (operators/
    network.py::link_prediction): the top-20 part pairs NEVER bought
    together whose basket neighborhoods overlap most — common-neighbor
    count with Jaccard and Adamic-Adar, the "suggest a missing
    association" step over the reference's KG shape (agent2_network.py
    builds the graph; Liben-Nowell & Kleinberg 2003 scores the absent
    edges). Wedge self-join on the shared-neighbor key, anti-join of
    existing edges; full tiebreak (cn desc, aa desc, pair) keeps the
    LIMIT deterministic.

    Nodes are partkey % 1024 — a BOUNDED catalog (r09 zero-row census):
    TPC-H grows the part universe with SF, so raw-partkey pair-collision
    probability falls ~1/parts^2 and the weight>=2 wedge graph is EMPTY
    at sf0.1 (14314/76/0 qualifying wedges). A real co-purchase catalog
    is bounded while orders grow, which is exactly what the bucket
    models — and the bounded node space also caps the wedge join
    (SCALING rule 27: aggregate onto a bounded key space)."""
    from vectordb_bioinsight_spark.operators.joins import cooccurrence_edges
    from vectordb_bioinsight_spark.operators.network import link_prediction

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 1024).alias("part"), F.col("l_orderkey").alias("okey")
    )
    edges = cooccurrence_edges(li, "part", "okey", min_weight=2)
    scored = link_prediction(edges, "item1", "item2", min_common=2)
    return scored.orderBy(
        F.desc("cn"), F.desc("aa"), F.asc("u"), F.asc("v")
    ).limit(20)


SQL_PART_LINK_PREDICTION = """
WITH dw AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey % 1024 AS part FROM lineitem
), e AS (
  SELECT a.part AS a, b.part AS b
  FROM dw a JOIN dw b ON a.okey = b.okey AND a.part < b.part
  GROUP BY 1, 2
  HAVING count(*) >= 2
), sym AS (
  SELECT a, b FROM e UNION SELECT b, a FROM e
), deg AS (
  SELECT a AS node, count(*)::BIGINT AS deg FROM sym GROUP BY 1
), ctr AS (
  SELECT s.a AS w, s.b AS leaf, d.deg AS deg_w
  FROM sym s JOIN deg d ON d.node = s.a
), pairs AS (
  SELECT l.leaf AS u, r.leaf AS v,
         count(*)::BIGINT AS cn,
         sum(1.0 / ln(l.deg_w)) AS aa_raw
  FROM ctr l JOIN ctr r ON l.w = r.w AND l.leaf < r.leaf
  GROUP BY 1, 2
  HAVING count(*) >= 2
), cand AS (
  SELECT p.* FROM pairs p
  ANTI JOIN e ON e.a = p.u AND e.b = p.v
)
SELECT u, v, cn,
       round(cn / (du.deg + dv.deg - cn), 6) AS jaccard,
       round(aa_raw, 6) AS aa
FROM cand
JOIN deg du ON du.node = cand.u
JOIN deg dv ON dv.node = cand.v
ORDER BY cn DESC, aa DESC, u ASC, v ASC
LIMIT 20
"""


def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets (operators/joins.py::
    association_rules): directed part -> part rules with
    support/confidence/lift, co-orders >= 3, confidence >= 0.1 — the
    rule-form reading of the same co-occurrence counts item_cf ranks.
    (confidence lowered from 0.5 in r08: the synthetic baskets top out
    near 0.2, so the old threshold returned ZERO rows at every test SF
    and the driver hash check was vacuous; 0.1 yields 417/45/1 rules at
    sf0.001/0.01/0.1 — the detection branch is actually exercised.)"""
    from vectordb_bioinsight_spark.operators.joins import association_rules

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("part"), F.col("l_orderkey").alias("okey")
    )
    return association_rules(li, "part", "okey", min_cooc=3, min_confidence=0.1)


SQL_BASKET_RULES = """
WITH dw AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
), e AS (
  SELECT a.part AS a, b.part AS b, count(*)::BIGINT AS w
  FROM dw a JOIN dw b ON a.okey = b.okey AND a.part < b.part
  GROUP BY 1, 2
  HAVING count(*) >= 3
), bo AS (
  SELECT a, b, w FROM e UNION ALL SELECT b, a, w FROM e
), items AS (
  SELECT part AS i, count(*)::BIGINT AS n_i FROM dw GROUP BY 1
), tot AS (
  SELECT count(DISTINCT l_orderkey)::DOUBLE AS n FROM lineitem
)
SELECT bo.a AS antecedent, bo.b AS consequent, w AS n_ab,
       ia.n_i AS n_a, ib.n_i AS n_b,
       round(w / t.n, 6) AS support,
       round(w::DOUBLE / ia.n_i, 6) AS confidence,
       round((w::DOUBLE / ia.n_i) / (ib.n_i / t.n), 6) AS lift
FROM bo
JOIN items ia ON ia.i = bo.a
JOIN items ib ON ib.i = bo.b
CROSS JOIN tot t
WHERE w::DOUBLE / ia.n_i >= 0.1
"""


def _ppr_chain_cte(iters: int = 6, damping: float = 0.85) -> str:
    """Unrolled personalized-PageRank CTEs mirroring operators/
    network.personalized_pagerank with a single data-derived source
    (the minimum part key in the graph): restart mass 1 at the source,
    every node keeps a row each round (LEFT JOIN + coalesce 0)."""
    parts = [
        "nodes AS MATERIALIZED (SELECT DISTINCT src FROM sym)",
        "dg AS MATERIALIZED (SELECT src, count(*)::DOUBLE AS d FROM sym GROUP BY 1)",
        "s0 AS (SELECT min(src) AS m FROM nodes)",
        "p0 AS MATERIALIZED (SELECT src AS entity, "
        "CASE WHEN src = (SELECT m FROM s0) THEN 1.0 ELSE 0.0 END AS score "
        "FROM nodes)",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"p{t} AS MATERIALIZED (SELECT n.src AS entity, "
            f"(1.0 - {damping}) * (CASE WHEN n.src = (SELECT m FROM s0) THEN 1.0 ELSE 0.0 END) "
            f"+ {damping} * coalesce(mass.mm, 0.0) AS score "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT e.dst, sum(p.score / dg.d) AS mm "
            f"FROM sym e JOIN p{t-1} p ON e.src = p.entity JOIN dg ON dg.src = e.src "
            f"GROUP BY e.dst) mass ON mass.dst = n.src)"
        )
    return ",\n".join(parts)


_PPR_ITERS, _PPR_D = 6, 0.85


def q_part_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from the minimum part key over the
    co-purchase graph (operators/network.py::personalized_pagerank):
    the walk-with-restart proximity recommender — top-20 parts nearest
    the seed through basket neighborhoods; fixed 6-iteration unroll,
    identical chained-CTE twin."""
    from vectordb_bioinsight_spark.operators.joins import cooccurrence_edges
    from vectordb_bioinsight_spark.operators.network import (
        personalized_pagerank,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("part"), F.col("l_orderkey").alias("okey")
    )
    edges = cooccurrence_edges(li, "part", "okey", min_weight=2).localCheckpoint(
        eager=False
    )
    seed = edges.agg(
        F.min(F.least("item1", "item2")).alias("m")
    ).first()["m"]
    scored = personalized_pagerank(
        edges.withColumnRenamed("item1", "entity1").withColumnRenamed(
            "item2", "entity2"
        ),
        [seed],
        damping=_PPR_D,
        max_iter=_PPR_ITERS,
    )
    return scored.orderBy(F.desc("ppr"), F.asc("entity")).limit(20)


SQL_PART_PPR = f"""
WITH dw AS (
  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
), e AS (
  SELECT a.part AS a, b.part AS b
  FROM dw a JOIN dw b ON a.okey = b.okey AND a.part < b.part
  GROUP BY 1, 2 HAVING count(*) >= 2
), sym AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM e UNION SELECT b, a FROM e
),
{_ppr_chain_cte(_PPR_ITERS, _PPR_D)}
SELECT entity, round(score, 6) AS ppr FROM p{_PPR_ITERS}
ORDER BY ppr DESC, entity ASC LIMIT 20
"""
