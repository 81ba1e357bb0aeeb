"""Co-expression network operators — SURVEY.md M2/M3/M4.

Reference: gene-gene correlation matrix -> threshold -> edge list
(agent2_network.py:115-205; vectorized variant ml/network_enhancer.py:64-182),
then centralities (agent2_network.py:207-255) and a composite hub score
(:257-295).

Spark shape:
* **correlation_edges** — long-format profiles (entity, dim, value) are
  pivoted per-pair via a self-join on ``dim`` with per-pair moment
  aggregation: corr(x,y) from Σx, Σy, Σxy, Σx², Σy², n — ONE shuffle on dim,
  one on the pair key, no wide matrix ever materialized (wide genes×samples
  at 100 TB is exactly what SURVEY §7.2 forbids). Entity count is capped by
  the caller (the reference caps at 1000 genes) — the pair fan-out is
  quadratic in entities, never in samples.
* **degree_centrality** — plain aggregation over edges.
* **eigenvector_centrality** — power iteration as iterative joins (bounded
  iterations, normalized each step); the Spark-native analog of the
  reference's networkx call.
* **hub_scores** — max-normalized weighted blend (0.5 deg + 0.5 eig here;
  the reference blends 4 metrics incl. betweenness, which it computes on
  graphs capped to 1000 nodes — at that size exact betweenness belongs
  driver-side, SURVEY §4.3(6)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def correlation_edges(
    profiles: DataFrame,
    entity_col: str,
    dim_col: str,
    value_col: str,
    min_abs_corr: float = 0.6,
) -> DataFrame:
    """Pairwise Pearson correlation between entity profiles, upper triangle.

    Input: long (entity, dim, value). Output: (entity1, entity2, n_dims,
    corr) with corr rounded 6 dp, |corr| >= min_abs_corr. Pairs correlate
    over their SHARED dims (inner join on dim).
    """
    a = profiles.select(
        F.col(entity_col).alias("entity1"), F.col(dim_col).alias("_d"), F.col(value_col).alias("_x")
    )
    b = profiles.select(
        F.col(entity_col).alias("entity2"), F.col(dim_col).alias("_d"), F.col(value_col).alias("_y")
    )
    paired = a.join(b, "_d").filter(F.col("entity1") < F.col("entity2"))
    stats = paired.groupBy("entity1", "entity2").agg(
        F.count("*").cast("long").alias("n_dims"),
        F.covar_samp("_x", "_y").alias("_cov"),
        F.stddev_samp("_x").alias("_sx"),
        F.stddev_samp("_y").alias("_sy"),
    )
    # NOT F.corr: under ANSI mode (Spark 4 default) corr THROWS
    # DIVIDE_BY_ZERO when a profile in the pair has zero variance; the
    # guarded quotient yields NULL there (matching DuckDB's corr) and the
    # filter below drops it.
    stats = stats.withColumn(
        "_r",
        F.when(
            (F.col("_sx") > 0) & (F.col("_sy") > 0),
            F.col("_cov") / (F.col("_sx") * F.col("_sy")),
        ),
    )
    return (
        stats
        .filter(F.col("_r").isNotNull() & ~F.isnan(F.col("_r")))
        .withColumn("corr", F.round(F.col("_r"), 6))
        .filter(F.abs(F.col("corr")) >= min_abs_corr)
        .select("entity1", "entity2", "n_dims", "corr")
    )


def correlation_pvalues(edges: DataFrame, corr_col: str = "corr", n_col: str = "n_dims") -> DataFrame:
    """Append the correlation t-statistic and exact two-sided p-value
    (t = r*sqrt((n-2)/(1-r^2)), network_enhancer.py:139-147) via the numpy
    special-function UDF tier."""
    from pyspark.sql import types as T

    from vectordb_bioinsight_spark.functions.stats import corr_t_stat
    from vectordb_bioinsight_spark.session import ensure_package_on_executors

    ensure_package_on_executors(edges.sparkSession)

    @F.pandas_udf(T.DoubleType())
    def _p(t, df):  # type: ignore[no-untyped-def]
        import pandas as pd

        from vectordb_bioinsight_spark.functions.special import t_pvalue_two_sided

        return pd.Series(t_pvalue_two_sided(t.to_numpy(), df.to_numpy()))

    out = edges.withColumn("t_stat", corr_t_stat(F.col(corr_col), F.col(n_col)))
    return out.withColumn("pvalue", _p(F.col("t_stat"), (F.col(n_col) - 2).cast("double")))


def degree_centrality(edges: DataFrame) -> DataFrame:
    """Degree per node from an (entity1, entity2) edge list (M3-degree;
    agent2_network.py:207-220). Output (entity, degree)."""
    both = edges.select(F.col("entity1").alias("entity")).unionByName(
        edges.select(F.col("entity2").alias("entity"))
    )
    return both.groupBy("entity").agg(F.count("*").cast("long").alias("degree"))


def eigenvector_centrality(
    edges: DataFrame,
    max_iter: int = 20,
    weight_col: str | None = None,
) -> DataFrame:
    """Eigenvector centrality by power iteration over iterative joins.

    Each step: score'(v) = Σ_{u~v} w(u,v)·score(u), then L2-normalize.
    Deterministic (fixed iteration count, fixed init 1/√n). The edge list is
    symmetrized internally. Output (entity, eig_centrality) rounded 6 dp.

    Scale: each iteration is one shuffle on entity; for the reference's
    capped graphs (<=1000 nodes) this is driver-trivial, but the same code
    runs unchanged on a billion-edge graph.
    """
    sym = (
        edges.select(F.col("entity1").alias("src"), F.col("entity2").alias("dst"),
                     (F.col(weight_col) if weight_col else F.lit(1.0)).alias("w"))
        .unionByName(
            edges.select(F.col("entity2").alias("src"), F.col("entity1").alias("dst"),
                         (F.col(weight_col) if weight_col else F.lit(1.0)).alias("w"))
        )
    )
    sym = sym.withColumn("w", F.abs(F.col("w")))
    sym = sym.localCheckpoint(eager=True)
    nodes = sym.select(F.col("src").alias("entity")).distinct()
    n = nodes.count()
    scores = nodes.withColumn("score", F.lit(1.0 / (n ** 0.5)))
    for _ in range(max_iter):
        contrib = (
            sym.join(scores.withColumnRenamed("entity", "src"), "src")
            .groupBy(F.col("dst").alias("entity"))
            .agg(F.sum(F.col("w") * F.col("score")).alias("raw"))
        )
        norm = contrib.agg(F.sqrt(F.sum(F.col("raw") * F.col("raw"))).alias("_n"))
        scores = (
            contrib.crossJoin(F.broadcast(norm))
            .select("entity", (F.col("raw") / F.col("_n")).alias("score"))
        )
        # `scores` references `contrib` TWICE (values + norm), so the plan
        # tree doubles per iteration — without truncation Catalyst faces a
        # 2^max_iter plan. Materialize + cut lineage each step (on a real
        # cluster: checkpoint to reliable storage instead).
        scores = scores.localCheckpoint(eager=True)
    return scores.select("entity", F.round("score", 6).alias("eig_centrality"))


def eigenvector_collected(
    edges: DataFrame,
    max_iter: int = 20,
    weight_col: str | None = None,
    max_nodes: int = 2000,
) -> DataFrame:
    """:func:`eigenvector_centrality` on the COLLECTED graph — identical
    math (symmetrized |w| adjacency, 1/√n init, ``max_iter`` steps of
    score' = A·score with L2 normalization, 6-dp rounding) computed with
    one numpy matmul per step instead of 20 shuffle + eager-checkpoint
    rounds.

    Exists for the blends that ALREADY collect the graph (betweenness /
    closeness in :func:`hub_scores_full`): once the ``max_nodes`` guard has
    admitted a driver-sized graph, the distributed power iteration only
    adds fixed per-iteration scheduling cost (~0.5 s/step on a 20-node
    graph). Float sums differ from the distributed path only in
    accumulation order (<= 1e-12 relative), which the 6-dp rounding
    quantizes away — the same argument the DuckDB oracle parity rests on.
    Same guard discipline as the other collected metrics: raises above
    ``max_nodes``, never truncates.
    """
    import numpy as np

    cols = [F.col("entity1"), F.col("entity2")]
    cols.append((F.abs(F.col(weight_col)) if weight_col else F.lit(1.0)).alias("_w"))
    rows = edges.select(*cols).collect()
    nodes = sorted({r[0] for r in rows} | {r[1] for r in rows})
    n = len(nodes)
    if n > max_nodes:
        raise ValueError(
            f"graph has {n} nodes > max_nodes={max_nodes}; use the "
            "distributed eigenvector_centrality instead (no silent truncation)"
        )
    spark = edges.sparkSession
    if n == 0:
        return spark.createDataFrame([], "entity long, eig_centrality double")
    idx = {v: i for i, v in enumerate(nodes)}
    a = np.zeros((n, n))
    for e1, e2, w in rows:  # symmetrized, duplicates accumulate as in the union
        a[idx[e2], idx[e1]] += w
        a[idx[e1], idx[e2]] += w
    s = np.full(n, 1.0 / np.sqrt(n))
    for _ in range(max_iter):
        raw = a @ s
        nrm = float(np.sqrt((raw * raw).sum()))
        s = raw / nrm if nrm > 0 else raw
    return spark.createDataFrame(
        [(v, round(float(s[idx[v]]), 6)) for v in nodes],
        ["entity", "eig_centrality"],
    )


def hub_scores(
    edges: DataFrame,
    top_k_hubs: int = 20,
) -> DataFrame:
    """M4 composite hub score: max-normalized degree and eigenvector blended
    (0.5/0.5), top-k flagged ``is_hub`` (agent2_network.py:257-295 semantics
    with the distributed-friendly metric subset).

    Output: (entity, degree, eig_centrality, hub_score, is_hub).
    """
    from vectordb_bioinsight_spark.operators.windows import max_normalize

    deg = degree_centrality(edges)
    eig = eigenvector_centrality(edges)
    joined = deg.join(eig, "entity", "outer").na.fill({"degree": 0, "eig_centrality": 0.0})
    normed = max_normalize(joined, ["degree", "eig_centrality"])
    scored = normed.withColumn(
        "hub_score",
        F.round(0.5 * F.col("degree_norm") + 0.5 * F.col("eig_centrality_norm"), 6),
    )
    from pyspark.sql import Window as W

    w = W.orderBy(F.desc("hub_score"), F.asc("entity"))
    return (
        scored.withColumn("is_hub", F.row_number().over(w) <= top_k_hubs)
        .select("entity", "degree", "eig_centrality", "hub_score", "is_hub")
    )


def connected_components(
    edges: DataFrame, max_iter: int = 30, collect_below: int = 100_000
) -> DataFrame:
    """Connected components by iterative min-label propagation (hash-min):
    every node repeatedly adopts the minimum component id in its closed
    neighborhood until a fixed point. Deterministic; each iteration is one
    shuffle. Used for the per-component eigenvector runs the reference does
    via networkx subgraphs (agent2_network.py:236-246).

    Output: (entity, component) — component = min node id reachable.

    Edge sets at or under ``collect_below`` run a DRIVER-side union-find
    (path compression + min-id roots — identical output): near-dup pair
    graphs after exact dedup are typically tiny, and each distributed
    label-propagation round costs a join job + an eager checkpoint + a
    convergence-check job, which dominates wall-clock on small graphs
    (measured ~8 s for a ~50-edge graph vs milliseconds collected).
    ``collect_below=0`` forces the distributed loop; above the bound the
    distributed path is unchanged — the 100 TB route.
    """
    if collect_below > 0:
        edge_rows = edges.select("entity1", "entity2").limit(collect_below + 1).collect()
        if len(edge_rows) <= collect_below:
            parent: dict = {}

            def find(x):
                root = x
                while parent.get(root, root) != root:
                    root = parent[root]
                while parent.get(x, x) != x:
                    parent[x], x = root, parent[x]
                return root

            for r in edge_rows:
                a, b = find(r[0]), find(r[1])
                if a != b:
                    # min-id root keeps "component = min reachable id" exact
                    lo, hi = (a, b) if a < b else (b, a)
                    parent[hi] = lo
            nodes = {r[0] for r in edge_rows} | {r[1] for r in edge_rows}
            out = [(n, find(n)) for n in sorted(nodes)]
            schema = edges.select(
                F.col("entity1").alias("entity"), F.col("entity1").alias("component")
            ).schema
            return edges.sparkSession.createDataFrame(out, schema)
    sym = (
        edges.select(F.col("entity1").alias("src"), F.col("entity2").alias("dst"))
        .unionByName(edges.select(F.col("entity2").alias("src"), F.col("entity1").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("src").alias("entity")).distinct().withColumn(
        "component", F.col("entity")
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels.withColumnRenamed("entity", "dst"), "dst")
            .groupBy(F.col("src").alias("entity"))
            .agg(F.min("component").alias("_nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "entity", "left")
            .select(
                "entity",
                F.least(F.col("component"), F.coalesce(F.col("_nbr_min"), F.col("component"))).alias(
                    "component"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "entity")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def label_propagation(edges: DataFrame, max_iter: int = 10) -> DataFrame:
    """M11 clustering analog (Leiden/Louvain capability): synchronous label
    propagation with a deterministic tie-break — each node adopts the most
    frequent label among neighbors, ties broken by smallest label. Fixed
    iteration count keeps it reproducible (async LPA is order-dependent).

    Output: (entity, cluster).
    """
    sym = (
        edges.select(F.col("entity1").alias("src"), F.col("entity2").alias("dst"))
        .unionByName(edges.select(F.col("entity2").alias("src"), F.col("entity1").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("src").alias("entity")).distinct().withColumn(
        "cluster", F.col("entity")
    )
    from pyspark.sql import Window as W

    for _ in range(max_iter):
        freq = (
            sym.join(labels.withColumnRenamed("entity", "dst"), "dst")
            .groupBy(F.col("src").alias("entity"), F.col("cluster"))
            .agg(F.count("*").alias("_n"))
        )
        w = W.partitionBy("entity").orderBy(F.desc("_n"), F.asc("cluster"))
        best = (
            freq.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("entity", "cluster")
        )
        labels = (
            labels.select("entity")
            .join(best, "entity", "left")
            .withColumn("cluster", F.coalesce(F.col("cluster"), F.col("entity")))
            .localCheckpoint(eager=True)
        )
    return labels


def betweenness_exact_collected(edges: DataFrame, max_nodes: int = 2000) -> DataFrame:
    """M3 betweenness centrality — exact Brandes on the COLLECTED graph.

    Betweenness is all-pairs shortest paths; the reference caps its networks
    at 1000 nodes (agent2_network.py:127-132) and computes via networkx, so
    driver-side exact is the honest equivalent (SURVEY §4.3(6)). The
    ``max_nodes`` guard raises instead of silently truncating; for larger
    graphs use sampled-source Brandes sharded with applyInPandas.

    Output: (entity, betweenness) — unnormalized, undirected convention
    (pair contributions halved).
    """
    n = edges.select(F.col("entity1").alias("e")).unionByName(
        edges.select(F.col("entity2").alias("e"))
    ).distinct().count()
    if n > max_nodes:
        raise ValueError(
            f"graph has {n} nodes > max_nodes={max_nodes}; betweenness is "
            "all-pairs — collect bound exceeded (no silent truncation)"
        )
    rows = edges.select("entity1", "entity2").collect()
    adj: dict = {}
    for r in rows:
        adj.setdefault(r[0], set()).add(r[1])
        adj.setdefault(r[1], set()).add(r[0])
    bc = {v: 0.0 for v in adj}
    from collections import deque

    for s in adj:  # Brandes (2001), unweighted BFS variant
        stack: list = []
        pred: dict = {v: [] for v in adj}
        sigma = {v: 0.0 for v in adj}
        dist = {v: -1 for v in adj}
        sigma[s], dist[s] = 1.0, 0
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w_ in adj[v]:
                if dist[w_] < 0:
                    dist[w_] = dist[v] + 1
                    q.append(w_)
                if dist[w_] == dist[v] + 1:
                    sigma[w_] += sigma[v]
                    pred[w_].append(v)
        delta = {v: 0.0 for v in adj}
        while stack:
            w_ = stack.pop()
            for v in pred[w_]:
                delta[v] += sigma[v] / sigma[w_] * (1.0 + delta[w_])
            if w_ != s:
                bc[w_] += delta[w_]
    spark = edges.sparkSession
    out = [(v, round(b / 2.0, 6)) for v, b in bc.items()]
    return spark.createDataFrame(out, ["entity", "betweenness"])


def laplacian_spectrum(edges: DataFrame, max_nodes: int = 2000) -> dict:
    """M5: normalized-Laplacian eigenvalue summary on the COLLECTED graph
    (network_enhancer.py:184-235) — spectral statistics are inherently
    global dense linear algebra; the reference computes them with numpy on
    its capped (<=1000 node) networks and so do we, behind the same explicit
    guard as betweenness (raise, never truncate).

    Returns {"eigenvalues": sorted ascending, "spectral_gap": λ2 - λ1,
    "algebraic_connectivity": λ2 of the UNnormalized Laplacian}.
    """
    import numpy as np

    n = (
        edges.select(F.col("entity1").alias("e"))
        .unionByName(edges.select(F.col("entity2").alias("e")))
        .distinct()
        .count()
    )
    if n > max_nodes:
        raise ValueError(
            f"graph has {n} nodes > max_nodes={max_nodes}; spectrum is dense "
            "linear algebra — collect bound exceeded (no silent truncation)"
        )
    rows = edges.select("entity1", "entity2").collect()
    nodes = sorted({r[0] for r in rows} | {r[1] for r in rows})
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for r in rows:
        A[idx[r[0]], idx[r[1]]] = A[idx[r[1]], idx[r[0]]] = 1.0
    deg = A.sum(axis=1)
    L = np.diag(deg) - A
    with np.errstate(divide="ignore"):
        dinv = np.where(deg > 0, 1.0 / np.sqrt(deg), 0.0)
    Lnorm = np.eye(len(nodes)) - (dinv[:, None] * A * dinv[None, :])
    ev_norm = np.sort(np.linalg.eigvalsh(Lnorm))
    ev_unnorm = np.sort(np.linalg.eigvalsh(L))
    return {
        "eigenvalues": [round(float(v), 6) for v in ev_norm],
        "spectral_gap": round(float(ev_norm[1] - ev_norm[0]), 6) if len(ev_norm) > 1 else 0.0,
        "algebraic_connectivity": round(float(ev_unnorm[1]), 6) if len(ev_unnorm) > 1 else 0.0,
    }


def rank_transform(
    profiles: DataFrame,
    entity_col: str,
    dim_col: str,
    value_col: str,
) -> DataFrame:
    """Average-rank transform of each entity's profile (ties get the mean of
    their positions) — the Spearman prerequisite, pure window algebra."""
    from pyspark.sql import Window as W

    w_order = W.partitionBy(entity_col).orderBy(F.col(value_col).asc())
    w_tie = W.partitionBy(entity_col, value_col)
    return profiles.select(
        entity_col,
        dim_col,
        (F.rank().over(w_order) + (F.count("*").over(w_tie) - F.lit(1)) / 2.0).alias(
            "_rank_value"
        ),
    )


def spearman_edges(
    profiles: DataFrame,
    entity_col: str,
    dim_col: str,
    value_col: str,
    min_abs_corr: float = 0.6,
) -> DataFrame:
    """M2 with the reference's DEFAULT metric: Spearman correlation edges
    (agent2_network.py:64-67 uses method='spearman') — Pearson over
    average-rank-transformed profiles. Same output contract as
    ``correlation_edges``.

    NOTE: exact Spearman requires every entity to be ranked over the SAME
    dim set; entities with missing dims correlate over shared dims of
    already-global ranks (scipy computes pairwise-complete ranks instead) —
    identical when profiles are complete, documented divergence otherwise.
    """
    ranked = rank_transform(profiles, entity_col, dim_col, value_col)
    return correlation_edges(ranked, entity_col, dim_col, "_rank_value", min_abs_corr)


def correlation_edges_block(
    profiles: DataFrame,
    entity_col: str,
    dim_col: str,
    value_col: str,
    min_abs_corr: float = 0.6,
    rows_per_block: int = 1024,
) -> DataFrame:
    """M2 scale path: all-pairs Pearson correlation as a BLOCK MATRIX
    multiply — corr = Z·Zᵀ/(n-1) over per-entity standardized profiles
    (SURVEY §4.3: 'at scale → BlockMatrix multiply, a custom physical
    strategy'; reference vectorizes the same way in-memory,
    network_enhancer.py:100-131).

    Requires COMPLETE profiles (every entity observes every dim — the count
    matrix case): the pair-join path (:func:`correlation_edges`) correlates
    over *shared* dims and stays the right tool for ragged inputs. With p
    entities and n dims, the pair join shuffles O(p²·n) rows; the block
    product shuffles O((p/b)²) dense b×b blocks — the only way p=20k genes
    (4·10⁸ pairs) stays tractable. Zero-variance entities are excluded
    (their correlations are undefined; the join path drops them as NaN).

    Output contract matches :func:`correlation_edges`:
    (entity1, entity2, n_dims, corr), upper triangle by entity ORDER
    (entity1 < entity2), corr rounded 6 dp, |corr| >= min_abs_corr.
    """
    from pyspark.mllib.linalg.distributed import CoordinateMatrix
    from pyspark.sql import Window

    e, d, v = F.col(entity_col), F.col(dim_col), F.col(value_col).cast("double")
    stats = (
        profiles.groupBy(e.alias("_ent"))
        .agg(
            F.avg(v).alias("_mu"),
            F.stddev_samp(v).alias("_sd"),
            F.count("*").cast("long").alias("_n"),
        )
        .filter(F.col("_sd") > 0)
    )
    # dense entity ids: tiny table (one row per entity), window is fine
    ids = stats.select(
        "_ent", "_n", (F.row_number().over(Window.orderBy("_ent")) - 1).alias("_eid")
    ).localCheckpoint(eager=True)
    dim_ids = (
        profiles.select(d.alias("_dim"))
        .distinct()
        .select("_dim", (F.row_number().over(Window.orderBy("_dim")) - 1).alias("_did"))
        .localCheckpoint(eager=True)
    )
    z = (
        profiles.select(e.alias("_ent"), d.alias("_dim"), v.alias("_v"))
        .join(stats.join(ids.select("_ent", "_eid"), "_ent"), "_ent")
        .join(dim_ids, "_dim")
        .select("_eid", "_did", ((F.col("_v") - F.col("_mu")) / F.col("_sd")).alias("_z"))
    )
    cm = CoordinateMatrix(z.rdd.map(tuple))
    prod = cm.toBlockMatrix(rows_per_block, rows_per_block).multiply(
        cm.toBlockMatrix(rows_per_block, rows_per_block).transpose()
    )
    spark = profiles.sparkSession
    sums = spark.createDataFrame(
        prod.toCoordinateMatrix().entries.filter(lambda me: me.i < me.j).map(
            lambda me: (int(me.i), int(me.j), float(me.value))
        ),
        "i long, j long, s double",
    )
    left = ids.select(F.col("_eid").alias("i"), F.col("_ent").alias("entity1"), F.col("_n").alias("_n1"))
    right = ids.select(F.col("_eid").alias("j"), F.col("_ent").alias("entity2"))
    return (
        sums.join(F.broadcast(left), "i")
        .join(F.broadcast(right), "j")
        .withColumn("corr", F.round(F.col("s") / (F.col("_n1") - 1), 6))
        .filter(F.abs(F.col("corr")) >= min_abs_corr)
        .select("entity1", "entity2", F.col("_n1").alias("n_dims"), "corr")
    )


def closeness_exact_collected(edges: DataFrame, max_nodes: int = 2000) -> DataFrame:
    """M3 closeness centrality — exact BFS per source on the COLLECTED graph,
    networkx-compatible (``nx.closeness_centrality`` default wf_improved):

        C(v) = ((r-1) / totsp(v)) * ((r-1) / (n-1))

    where r = nodes reachable from v (incl. v), totsp = sum of shortest-path
    lengths, n = all nodes. Isolated/unreachable handling matches networkx
    (C=0 when totsp=0). Same collect guard + rationale as
    ``betweenness_exact_collected`` (reference caps graphs at 1000 nodes and
    computes via networkx, agent2_network.py:239-243); for larger graphs
    shard sources with applyInPandas over a broadcast adjacency.

    Output: (entity, closeness) rounded 6 dp.
    """
    n = (
        edges.select(F.col("entity1").alias("e"))
        .unionByName(edges.select(F.col("entity2").alias("e")))
        .distinct()
        .count()
    )
    if n > max_nodes:
        raise ValueError(
            f"graph has {n} nodes > max_nodes={max_nodes}; closeness is "
            "all-pairs — collect bound exceeded (no silent truncation)"
        )
    rows = edges.select("entity1", "entity2").collect()
    adj: dict = {}
    for r in rows:
        adj.setdefault(r[0], set()).add(r[1])
        adj.setdefault(r[1], set()).add(r[0])
    from collections import deque

    out = []
    for s in adj:
        dist = {s: 0}
        q = deque([s])
        totsp = 0
        while q:
            v = q.popleft()
            for w_ in adj[v]:
                if w_ not in dist:
                    dist[w_] = dist[v] + 1
                    totsp += dist[w_]
                    q.append(w_)
        r_ = len(dist)
        if totsp > 0 and n > 1:
            c = ((r_ - 1) / totsp) * ((r_ - 1) / (n - 1))
        else:
            c = 0.0
        out.append((s, round(c, 6)))
    return edges.sparkSession.createDataFrame(out, ["entity", "closeness"])


def hub_scores_full(
    edges: DataFrame,
    top_k_hubs: int = 20,
    min_degree: int = 5,
    max_nodes: int = 2000,
) -> DataFrame:
    """M4, reference-parity composite hub score — the FULL 4-metric blend of
    agent2_network.py:257-295:

        hub = 0.35·deg_norm + 0.30·btw_norm + 0.25·eig_norm + 0.10·close_norm

    Candidates are nodes with degree >= ``min_degree`` (reference
    min_edges_for_hub=5; falls back to ALL nodes when none qualify, like the
    reference), each metric max-normalized OVER THE CANDIDATES (1-row agg
    broadcast, no global window), top-``top_k_hubs`` flagged ``is_hub`` with
    a deterministic (score desc, entity asc) tiebreak.

    Betweenness and closeness are exact on the collected graph behind the
    same ``max_nodes`` guard the reference's networkx path implies — so the
    whole blend is collect-bounded, and eigenvector runs on that SAME
    collected graph (:func:`eigenvector_collected`): identical math to the
    distributed power iteration, without paying 20 shuffle+checkpoint
    rounds for a graph already known to fit the driver (measured 12.5 s →
    ~3 s for the 20-node hub_parts entry). Degree stays distributed (one
    groupBy). Use :func:`hub_scores` when the graph exceeds the collect
    bound and the 2-metric fully-distributed blend suffices.

    Output: (entity, degree, betweenness, eig_centrality, closeness,
    hub_score, is_hub).
    """
    # Materialize the edge list ONCE: four metrics + the candidate probe +
    # the final join all consume it, and without the cut each collected
    # metric would re-execute the upstream plan (for hub_parts that is the
    # whole correlation-network build — measured 8 s -> ~3 s at sf0.1).
    edges = edges.localCheckpoint(eager=True)
    deg = degree_centrality(edges)
    eig = eigenvector_collected(edges, max_nodes=max_nodes)
    btw = betweenness_exact_collected(edges, max_nodes=max_nodes)
    clo = closeness_exact_collected(edges, max_nodes=max_nodes)
    joined = (
        deg.join(eig, "entity", "outer")
        .join(btw, "entity", "outer")
        .join(clo, "entity", "outer")
        .na.fill({"degree": 0, "eig_centrality": 0.0, "betweenness": 0.0, "closeness": 0.0})
    )
    candidates = joined.filter(F.col("degree") >= min_degree)
    if candidates.limit(1).count() == 0:  # reference fallback: no node qualifies
        candidates = joined
    maxes = candidates.agg(
        F.max("degree").alias("_mx_deg"),
        F.max("betweenness").alias("_mx_btw"),
        F.max("eig_centrality").alias("_mx_eig"),
        F.max("closeness").alias("_mx_clo"),
    )

    def _norm(col: str, mx: str):  # noqa: ANN202
        return F.when(F.col(mx) != 0, F.col(col) / F.col(mx)).otherwise(F.lit(0.0))

    scored = candidates.crossJoin(F.broadcast(maxes)).withColumn(
        "hub_score",
        F.round(
            0.35 * _norm("degree", "_mx_deg")
            + 0.30 * _norm("betweenness", "_mx_btw")
            + 0.25 * _norm("eig_centrality", "_mx_eig")
            + 0.10 * _norm("closeness", "_mx_clo"),
            6,
        ),
    )
    from pyspark.sql import Window as W

    w = W.orderBy(F.desc("hub_score"), F.asc("entity"))  # candidate set is bounded
    return scored.withColumn("is_hub", F.row_number().over(w) <= top_k_hubs).select(
        "entity", "degree", "betweenness", "eig_centrality", "closeness", "hub_score", "is_hub"
    )


def pseudotime_bfs(
    edges: DataFrame,
    root,
    max_iter: int = 30,
    collect_below: int = 2048,
) -> DataFrame:
    """M11 tail: pseudotime as normalized shortest-path distance from a root
    node over the cell kNN graph — the deterministic analog of the
    reference's diffusion pseudotime (singlecell/agent4_trajectory.py:
    245-268: sc.tl.dpt from a root cell; DPT orders cells by distance from
    the root in the graph's diffusion geometry, and hop distance preserves
    that ordering on the kNN graph).

    Iterative frontier relaxation: dist'(v) = min(dist(v), min over
    neighbors u of dist(u)+1), one shuffle per iteration with eager
    localCheckpoint lineage cuts (repo rule for iterative joins); stops
    early at a fixed point. Unreachable cells get NULL pseudotime, like
    cells DPT cannot order.

    Output: (entity, dist, pseudotime = dist/max_dist in [0, 1]).

    Graphs at or under ``collect_below`` nodes run a DRIVER-side BFS
    instead of the iterative-join loop: hop distances are integers, so the
    two paths are bit-identical, and a 40-node kNN sample was paying ~3
    scheduled jobs per relaxation round for work a deque finishes in
    microseconds. The distributed loop is unchanged above the bound (and
    reachable via ``collect_below=0``).
    """
    sym = (
        edges.select(F.col("entity1").alias("src"), F.col("entity2").alias("dst"))
        .unionByName(edges.select(F.col("entity2").alias("src"), F.col("entity1").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = sym.select(F.col("src").alias("entity")).distinct()
    if nodes.count() <= collect_below:
        from collections import deque

        adj: dict = {}
        for r in sym.collect():
            adj.setdefault(r["src"], set()).add(r["dst"])
        dists: dict = {}
        if root in adj:
            dists[root] = 0
            q = deque([root])
            while q:
                v = q.popleft()
                for w_ in adj[v]:
                    if w_ not in dists:
                        dists[w_] = dists[v] + 1
                        q.append(w_)
        mx_d = max(dists.values(), default=0)

        def _pt(v):  # noqa: ANN001, ANN202 - mirrors the distributed CASE
            if mx_d > 0:
                return round(dists[v] / mx_d, 6) if v in dists else None
            return 0.0  # distributed .otherwise(0.0) hits every row at mx=0

        from pyspark.sql import types as T

        out = [(v, dists.get(v), _pt(v)) for v in adj]
        ent_type = edges.schema["entity1"].dataType
        schema = T.StructType(
            [
                T.StructField("entity", ent_type),
                T.StructField("dist", T.IntegerType()),
                T.StructField("pseudotime", T.DoubleType()),
            ]
        )
        return edges.sparkSession.createDataFrame(out, schema)
    dist = nodes.withColumn(
        "dist", F.when(F.col("entity") == F.lit(root), F.lit(0)).otherwise(F.lit(None)).cast("int")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        relaxed = (
            sym.join(
                dist.select(F.col("entity").alias("src"), F.col("dist").alias("_d")), "src"
            )
            .filter(F.col("_d").isNotNull())
            .groupBy(F.col("dst").alias("entity"))
            .agg((F.min("_d") + 1).alias("_nd"))
        )
        new_dist = (
            dist.join(relaxed, "entity", "left")
            .select("entity", F.least(F.col("dist"), F.col("_nd")).alias("dist"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_dist.alias("n")
            .join(dist.alias("o"), "entity")
            .filter(~F.col("n.dist").eqNullSafe(F.col("o.dist")))
            .limit(1)
            .count()
        )
        dist = new_dist
        if changed == 0:
            break
    mx = dist.agg(F.max("dist").alias("_mx"))
    return (
        dist.crossJoin(F.broadcast(mx))
        .select(
            "entity",
            "dist",
            F.round(
                F.when(F.col("_mx") > 0, F.col("dist").cast("double") / F.col("_mx"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("pseudotime"),
        )
    )


def cluster_connectivity(
    edges: DataFrame,
    clusters: DataFrame,
    threshold: float = 0.05,
) -> DataFrame:
    """M11 tail: PAGA-analog cluster connectivity graph (singlecell/
    agent4_trajectory.py:182-221: sc.tl.paga connectivities + a 0.05
    threshold on cluster pairs).

    connectivity(a, b) = inter-cluster edge count / the expected count
    under uniform wiring (n_a · n_b · total_edges / (N·(N-1)/2)) — the
    same ratio-to-random normalization PAGA uses, closed-form instead of
    its sparse-matrix implementation. Pure joins + one aggregation on
    (cluster_a, cluster_b); the cluster map is broadcast.

    Inputs: edges(entity1, entity2), clusters(entity, cluster).
    Output: (cluster_a < cluster_b, n_edges, connectivity) with
    connectivity rounded 6 dp, filtered to > ``threshold``.
    """
    cl = F.broadcast(clusters)
    sizes = clusters.groupBy("cluster").agg(F.count("*").cast("long").alias("_sz"))
    labeled = (
        edges.join(cl.withColumnRenamed("entity", "entity1").withColumnRenamed("cluster", "_ca"), "entity1")
        .join(cl.withColumnRenamed("entity", "entity2").withColumnRenamed("cluster", "_cb"), "entity2")
        .select(
            F.least("_ca", "_cb").alias("cluster_a"),
            F.greatest("_ca", "_cb").alias("cluster_b"),
        )
        .filter(F.col("cluster_a") != F.col("cluster_b"))
    )
    inter = labeled.groupBy("cluster_a", "cluster_b").agg(
        F.count("*").cast("long").alias("n_edges")
    )
    totals = edges.agg(F.count("*").cast("double").alias("_te")).crossJoin(
        clusters.agg(F.count("*").cast("double").alias("_n"))
    )
    out = (
        inter.join(F.broadcast(sizes.withColumnRenamed("cluster", "cluster_a").withColumnRenamed("_sz", "_na")), "cluster_a")
        .join(F.broadcast(sizes.withColumnRenamed("cluster", "cluster_b").withColumnRenamed("_sz", "_nb")), "cluster_b")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "connectivity",
            F.round(
                F.col("n_edges")
                / (F.col("_na") * F.col("_nb") * F.col("_te") / (F.col("_n") * (F.col("_n") - 1.0) / 2.0)),
                6,
            ),
        )
        .filter(F.col("connectivity") > threshold)
        .select("cluster_a", "cluster_b", "n_edges", "connectivity")
    )
    return out


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 10,
    collect_below: int = 8192,
) -> DataFrame:
    """PageRank on the symmetrized unweighted graph, fixed iteration count:

        pr'(v) = (1-d)/n + d * Σ_{u~v} pr(u)/deg(u)

    Deterministic (fixed iters, uniform 1/n init); symmetrization means every
    node has deg >= 1, so there is no dangling-mass term. Output
    (entity, pagerank) rounded 6 dp. Complements eigenvector centrality: the
    damped random-walk measure the co-occurrence/curation literature uses
    for node importance (e.g. selecting pivotal keywords in a KG).

    Scale: each iteration is ONE shuffle on entity (edge join + groupBy) —
    same shape as eigenvector_centrality; lineage is cut per iteration so
    the plan stays linear in max_iter. Graphs at or under ``collect_below``
    nodes run the iteration driver-side with one numpy matmul per step
    (identical math; accumulation-order float drift << the 6-dp rounding
    grain) — a 24-word co-occurrence graph shouldn't pay 10 scheduled
    shuffle rounds. ``collect_below=0`` forces the distributed loop.
    """
    import numpy as np

    sym = _symmetrize(edges)
    nodes_list, sym_rows = _small_graph_rows(sym, collect_below)
    if nodes_list is not None:
        n = len(nodes_list)
        if n == 0:
            return edges.sparkSession.createDataFrame([], "entity long, pagerank double")
        si, di, inv_deg = _sparse_adjacency(nodes_list, sym_rows, np)
        s = np.full(n, 1.0 / n)
        for _ in range(max_iter):
            s = (1.0 - damping) / n + damping * np.bincount(
                di, weights=s[si] * inv_deg[si], minlength=n
            )
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("entity", edges.schema["entity1"].dataType),
                T.StructField("pagerank", T.DoubleType()),
            ]
        )
        return edges.sparkSession.createDataFrame(
            [(v, round(float(s[i]), 6)) for i, v in enumerate(nodes_list)], schema
        )
    deg = sym.groupBy("src").agg(F.count("*").cast("double").alias("_deg"))
    ed = sym.join(deg, "src").localCheckpoint(eager=True)
    nodes = sym.select(F.col("src").alias("entity")).distinct()
    n = nodes.count()
    base = (1.0 - damping) / n
    scores = nodes.withColumn("score", F.lit(1.0 / n))
    for _ in range(max_iter):
        scores = (
            ed.join(scores.withColumnRenamed("entity", "src"), "src")
            .groupBy(F.col("dst").alias("entity"))
            .agg((F.lit(base) + F.lit(damping) * F.sum(F.col("score") / F.col("_deg"))).alias("score"))
        )
        scores = scores.localCheckpoint(eager=True)
    return scores.select("entity", F.round("score", 6).alias("pagerank"))


def _symmetrize(edges: DataFrame) -> DataFrame:
    """(entity1, entity2) -> deduped symmetric (src, dst), lazily
    local-checkpointed.

    Dedup runs on the CANONICAL (least, greatest) pair and expands to both
    directions afterwards, so the distinct shuffles E rows instead of the
    2E a dedup after the union would (guide §2.3 — shuffle fewer bytes);
    parallel edges in either orientation and self-loops dedup identically.
    """
    canon = (
        edges.select(
            F.least("entity1", "entity2").alias("a"),
            F.greatest("entity1", "entity2").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    proper = canon.filter(F.col("a") != F.col("b"))
    return (
        proper.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(proper.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .unionByName(
            canon.filter(F.col("a") == F.col("b")).select(
                F.col("a").alias("src"), F.col("a").alias("dst")
            )
        )
    )


#: Driver-route edge budget for the small-graph walk: 2^22 directed rows,
#: the worst case the ORIGINAL collect_below=2048 node cap allowed for a
#: dense graph (2048*2047 ≈ 4.2M). Raising the node cap to 8192 in r10
#: widened the unbounded sym.collect() to ~67M rows for a dense graph
#: (VERDICT r10 item 2); bounding the edge collect too keeps the driver
#: exposure at the historically accepted level while sparse 8k-node graphs
#: (the common co-occurrence case) still take the cheap driver walk.
_EDGE_ROWS_BELOW = 1 << 22


def _small_graph_rows(sym: DataFrame, collect_below: int):
    """(sorted node list, symmetric edge rows) when the graph has at most
    ``collect_below`` nodes AND at most ``_EDGE_ROWS_BELOW`` directed edge
    rows, else (None, None).

    Both probes are BOUNDED (the limit(MAX+1)-then-raise collect
    discipline): the node probe is a ``limit(collect_below + 1)`` over
    distinct sources, and the edge collect itself is capped at
    ``_EDGE_ROWS_BELOW + 1`` rows — a dense under-node-cap graph can carry
    O(n²) edges, so a node bound alone does not bound the collect. When
    either bound trips, the caller's distributed loop runs instead.
    """
    if collect_below <= 0:
        return None, None
    probe = sym.select("src").distinct().limit(collect_below + 1).collect()
    if len(probe) > collect_below:
        return None, None
    sym_rows = sym.limit(_EDGE_ROWS_BELOW + 1).collect()
    if len(sym_rows) > _EDGE_ROWS_BELOW:
        return None, None
    # every node of the symmetrized graph appears as a src (isolated nodes
    # have no edges at all), so the probe IS the node set
    return sorted({r["src"] for r in probe}), sym_rows


def _sparse_adjacency(nodes_list, sym_rows, np):
    """Edge-list form of the column-normalized adjacency for the driver-side
    walk paths: (src idx, dst idx, 1/deg per node), edges LEXSORTED by
    (dst, src).

    A dense n×n matrix costs O(n²) memory and per-step flops for graphs
    that are nearly always sparse (the sf0.1 co-purchase graph: 5922 nodes,
    7146 edges — the dense walk burned ~1.5 s of driver CPU on 280 MB
    matrices); the bincount matvec is O(E) per step. The lexsort pins the
    accumulation order regardless of collect() row order, so scores are
    run-deterministic; per-term math is the same s_j * (1/deg_j) product as
    the normalized-matrix multiply, summed in (dst, src) order — an
    accumulation-order float drift << the 6-dp output rounding, the same
    argument the dense path rested on.
    """
    idx = {v: i for i, v in enumerate(nodes_list)}
    n_e = len(sym_rows)
    si = np.fromiter((idx[r["src"]] for r in sym_rows), dtype=np.int64, count=n_e)
    di = np.fromiter((idx[r["dst"]] for r in sym_rows), dtype=np.int64, count=n_e)
    order = np.lexsort((si, di))
    si, di = si[order], di[order]
    degs = np.bincount(si, minlength=len(nodes_list)).astype(np.float64)
    degs[degs == 0.0] = np.inf  # isolated nodes contribute nothing
    return si, di, 1.0 / degs



def triangle_counts(edges: DataFrame, src: str = "item1", dst: str = "item2") -> DataFrame:
    """Per-node triangle counting — the graph-analytics companion of the
    centrality tier (reference analog: the clustering/community statistics
    the KG layer reports per keyword node, graph.py:352-368 onward).

    Input: undirected distinct edges with ``src < dst`` (the upper-triangle
    contract :func:`~vectordb_bioinsight_spark.operators.joins.cooccurrence_edges`
    already guarantees).

    Physical plan — the canonical ordered wedge-close join, each triangle
    x < y < z enumerated exactly once: wedges (x,y)+(y,z) by equi-join on
    the middle node, closed against the edge list on (x,z). Shuffles are
    all key-partitioned equi-joins; no cross join ever materializes. At
    100 TB-graph scale the standard refinement is min-degree orientation
    (orient each edge toward the higher-degree endpoint) to bound wedge
    fan-out on hubs — id-orientation is kept here because it is
    deterministic and oracle-stable; AQE skew-join covers moderate hubs.

    Output: (node, n_triangles) for EVERY node in the edge set (zeros
    included, so the result is a complete per-node feature).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).distinct()
    wedges = (
        e.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .join(e.select(F.col("a").alias("y"), F.col("b").alias("z")), "y")
    )
    tris = wedges.join(
        e.select(F.col("a").alias("x"), F.col("b").alias("z")), ["x", "z"]
    )
    per_node = (
        tris.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    nodes = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
    )
    return nodes.join(per_node, "node", "left").select(
        "node",
        F.coalesce(F.col("n_triangles"), F.lit(0).cast("long")).alias("n_triangles"),
    )


def kcore_peel(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    k: int,
    rounds: int = 4,
) -> DataFrame:
    """Bounded k-core peel: ``rounds`` iterations of "drop every node with
    degree < k, then recount" over the symmetrized simple graph — the
    density backbone extractor (a node in the k-core has >= k neighbors
    that THEMSELVES survive the same test; hubs by pagerank can still be
    peripheral, k-core membership cannot).

    ``rounds`` is a FIXED unroll, not convergence detection, so the
    operator is deterministic relational algebra on any engine (the
    DuckDB twin unrolls the same CTE chain) and its cost is bounded:
    each round is one degree agg + two semi-joins, all keyed by node.
    When the graph's peel depth <= rounds the result IS the exact k-core
    (pinned by a planted-graph test); deeper graphs get the round-R
    over-approximation — callers wanting certainty re-run with more
    rounds and compare survivor counts (a fixed-point check, two cheap
    jobs, no driver loop inside the operator).

    Output: (node, core_degree) for surviving nodes, core_degree = degree
    within the surviving subgraph (>= k at fixed point).
    """
    e = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    # checkpoint each round: round r's survivors feed TWO consumers in
    # round r+1 (the degree count and the semi-join), so unmaterialized
    # lineage re-executes every earlier round per consumer — 2^rounds
    # subtree blowup (measured 7.7 s -> ~2 s at sf0.1; the same trap the
    # funnel's union-of-lineages hit in r04). Lazy checkpoints: each
    # materializes once at first use, nothing runs eagerly at build time.
    alive = sym.localCheckpoint(eager=False)
    for _ in range(rounds):
        keep = (
            alive.groupBy("a")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") >= k)
            .select("a")
        )
        alive = (
            alive.join(keep, "a", "left_semi")
            .join(keep.withColumnRenamed("a", "b"), "b", "left_semi")
            .localCheckpoint(eager=False)
        )
    return alive.groupBy(F.col("a").alias("node")).agg(
        F.count("*").cast("long").alias("core_degree")
    )


def link_prediction(
    edges: DataFrame,
    src: str = "item1",
    dst: str = "item2",
    max_degree: int | None = None,
    min_common: int = 1,
) -> DataFrame:
    """Neighborhood link prediction over an undirected graph: for every
    NON-edge pair sharing >= ``min_common`` neighbors, the three classic
    scores — common-neighbor count, Jaccard(N(u), N(v)), and Adamic-Adar
    (sum over shared w of 1/ln(deg w)) — the KG "suggest a missing
    association" capability over the same co-occurrence graphs the
    reference builds for its network views (agent2_network.py builds the
    graph; scoring absent edges is the published next step, Liben-Nowell
    & Kleinberg 2003).

    Plan: symmetrize, one wedge self-join on the shared-neighbor key
    (u < v canonical), anti-join existing edges, two broadcast-sized
    degree joins. Shuffles are all on node keys.

    Scale: a hub of degree d emits d^2/2 wedges — the quadratic term.
    ``max_degree`` drops hubs from the WEDGE ENUMERATION ONLY (their
    pairs vanish, their degree still counts in Jaccard/AA): the standard
    mitigation, hubs carry near-zero AA signal by construction
    (1/ln d -> 0). Set it (~99.9th-pct degree) whenever the degree
    distribution is heavy-tailed; leave None only on degree-capped
    graphs.

    Output: (u, v, cn, jaccard, aa) — jaccard/aa rounded 6 dp.
    """
    # lazy checkpoints at every fan-out point: e feeds sym (twice) and the
    # existing-edge anti-join, sym feeds deg and the wedge orientation, deg
    # feeds the center weight + two endpoint joins — without materialization
    # each consumer re-executes the caller's whole edge-build lineage (the
    # k-core / funnel union-of-lineages trap; 54 Exchange nodes measured
    # before, 6 after)
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(
        eager=False
    )
    sym = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        sym.groupBy("a")
        .agg(F.count("*").cast("long").alias("deg"))
        .localCheckpoint(eager=False)
    )

    # wedge center = the shared neighbor: orient rows as (center, leaf)
    ctr = sym.select(F.col("a").alias("w"), F.col("b").alias("leaf"))
    if max_degree is not None:
        # cap the WEDGE CENTER's fan-out only — degrees still count full
        ctr = ctr.join(
            deg.select(F.col("a").alias("w"), "deg").filter(
                F.col("deg") <= max_degree
            ),
            "w",
        ).drop("deg")
    ctr = ctr.join(
        deg.select(F.col("a").alias("w"), F.col("deg").alias("deg_w")), "w"
    )
    left = ctr.select("w", F.col("leaf").alias("u"), "deg_w")
    right = ctr.select("w", F.col("leaf").alias("v"))
    pairs = (
        left.join(right, "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.count("*").cast("long").alias("cn"),
            F.sum(1.0 / F.log(F.col("deg_w"))).alias("_aa"),
        )
        .filter(F.col("cn") >= min_common)
    )
    existing = e.select(
        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
    ).distinct()
    cand = pairs.join(existing, ["u", "v"], "left_anti")
    du = deg.select(F.col("a").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("a").alias("v"), F.col("deg").alias("deg_v"))
    return (
        cand.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "cn",
            F.round(
                F.col("cn")
                / (F.col("deg_u") + F.col("deg_v") - F.col("cn")),
                6,
            ).alias("jaccard"),
            F.round("_aa", 6).alias("aa"),
        )
    )


def personalized_pagerank(
    edges: DataFrame,
    source_nodes: "list",
    damping: float = 0.85,
    max_iter: int = 10,
    collect_below: int = 8192,
) -> DataFrame:
    """Personalized PageRank — the random walk RESTARTS at the source
    set instead of everywhere:

        pr'(v) = (1-d) * restart(v) + d * Σ_{u~v} pr(u)/deg(u)

    with restart uniform over ``source_nodes`` — the graph-proximity
    recommender ("parts related to THIS part through the co-purchase
    neighborhood"), the walk-based complement of the item-CF cosine and
    the wedge-count link predictor. Deterministic: fixed iterations,
    restart init; every node keeps a row each round (zero-mass nodes
    score (1-d)*restart = 0), so the fixed-iteration unroll has an exact
    chained-CTE DuckDB twin like :func:`pagerank`.

    Same scale shape as pagerank: one entity-keyed shuffle per iteration
    with lineage cut per round; graphs at or under ``collect_below``
    nodes run driver-side numpy (identical math).
    """
    import numpy as np

    if not source_nodes:
        raise ValueError("source_nodes must be non-empty")
    sym = _symmetrize(edges)
    r_w = 1.0 / len(source_nodes)
    nodes_list, sym_rows = _small_graph_rows(sym, collect_below)
    if nodes_list is not None:
        n = len(nodes_list)
        if n == 0:
            return edges.sparkSession.createDataFrame([], "entity long, ppr double")
        si, di, inv_deg = _sparse_adjacency(nodes_list, sym_rows, np)
        idx = {v: i for i, v in enumerate(nodes_list)}
        restart = np.zeros(n)
        for s_node in source_nodes:
            if s_node in idx:
                restart[idx[s_node]] = r_w
        s = restart.copy()
        for _ in range(max_iter):
            s = (1.0 - damping) * restart + damping * np.bincount(
                di, weights=s[si] * inv_deg[si], minlength=n
            )
        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("entity", edges.schema["entity1"].dataType),
                T.StructField("ppr", T.DoubleType()),
            ]
        )
        return edges.sparkSession.createDataFrame(
            [(v, round(float(s[i]), 6)) for i, v in enumerate(nodes_list)], schema
        )
    deg = sym.groupBy("src").agg(F.count("*").cast("double").alias("_deg"))
    ed = sym.join(deg, "src").localCheckpoint(eager=True)
    nodes = sym.select(F.col("src").alias("entity")).distinct()
    restart_col = F.when(
        F.col("entity").isin(list(source_nodes)), F.lit(r_w)
    ).otherwise(F.lit(0.0))
    scores = nodes.withColumn("score", restart_col).localCheckpoint(eager=True)
    # r11: the per-round keep-all-nodes LEFT join was redundant — after
    # _symmetrize every node appears as BOTH src and dst (isolated nodes
    # carry no rows at all), so the mass aggregation's dst key set IS the
    # node set and the restart term folds into a projection on the agg
    # output (the exact shape pagerank's loop already uses). One join and
    # one eager nodes-checkpoint fewer per query; contributions, grouping,
    # and the score expression are unchanged. Verified value-identical vs
    # the join form at sf0.1 and the 10x corpus, oracle parity at all SFs.
    for _ in range(max_iter):
        scores = (
            ed.join(scores.withColumnRenamed("entity", "src"), "src")
            .groupBy(F.col("dst").alias("entity"))
            .agg(F.sum(F.col("score") / F.col("_deg")).alias("_m"))
            .select(
                "entity",
                (
                    (1.0 - damping) * restart_col + damping * F.col("_m")
                ).alias("score"),
            )
            .localCheckpoint(eager=True)
        )
    return scores.select("entity", F.round("score", 6).alias("ppr"))
