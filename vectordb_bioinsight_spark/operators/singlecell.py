"""Single-cell pipeline operators — SURVEY.md M9/M11/M12, A9, F8, W7.

The reference's scanpy pipeline (agent_singlecell.py:746-930;
singlecell/agent1_qc.py:242-350) runs on an in-memory AnnData matrix. The
engine keeps the matrix in LONG form (cell_id, gene_id, count) — the wide
cells×genes pivot is exactly what SURVEY §7.2 forbids at scale — and each
scanpy step becomes one or two shuffles:

* ``cell_qc_metrics`` / ``apply_qc_filters`` — per-cell aggregates + chained
  filters (F8, agent1_qc.py:318-350): n_genes, total counts, pct of counts in
  a flagged gene set (the mito-% analog via prefix match).
* ``normalize_total_log1p`` — scanpy ``normalize_total(target_sum) -> log1p``
  (agent_singlecell.py:746-930): per-cell total (one agg, broadcast back),
  scale to target, log1p.
* ``size_factors_median_of_ratios`` — DESeq2's median-of-ratios (M1 portable
  core, agent1_deg.py:168-345): per-gene geometric mean over samples, then
  per-sample exact median of count/geomean ratios.
* ``pseudobulk`` — A9 (singlecell/agent5_cnv_ml.py:187-241): sum/mean/median
  per gene across cells.

All pure DataFrame ops — no UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cell_qc_metrics(
    long_counts: DataFrame,
    cell_col: str = "cell_id",
    gene_col: str = "gene_id",
    value_col: str = "count",
    flagged_gene_predicate: Column | None = None,
) -> DataFrame:
    """Per-cell QC aggregates in ONE pass: n_genes (nonzero), total_counts,
    pct_flagged (share of counts in genes matching the predicate — the
    mito-'MT-' prefix analog, agent1_qc.py:296-300).
    Output: (cell, n_genes, total_counts, pct_flagged)."""
    v = F.col(value_col).cast("double")
    flagged = (
        F.when(flagged_gene_predicate, v).otherwise(F.lit(0.0))
        if flagged_gene_predicate is not None
        else F.lit(0.0)
    )
    return long_counts.groupBy(F.col(cell_col).alias("cell_id")).agg(
        F.count(F.when(v > 0, 1)).cast("long").alias("n_genes"),
        F.sum(v).alias("total_counts"),
        F.round(
            F.coalesce(F.sum(flagged) / F.nullif(F.sum(v), F.lit(0.0)), F.lit(0.0)) * 100.0, 6
        ).alias("pct_flagged"),
    )


def apply_qc_filters(
    long_counts: DataFrame,
    qc: DataFrame,
    min_genes: int = 200,
    max_genes: int | None = None,
    min_counts: float = 500.0,
    max_pct_flagged: float = 20.0,
    cell_col: str = "cell_id",
) -> DataFrame:
    """F8: keep cells passing all QC gates; semi-join back to the long matrix
    (broadcast when the surviving-cell list is small)."""
    keep = qc.filter(
        (F.col("n_genes") >= min_genes)
        & (F.col("total_counts") >= min_counts)
        & (F.col("pct_flagged") <= max_pct_flagged)
    )
    if max_genes is not None:
        keep = keep.filter(F.col("n_genes") <= max_genes)
    return long_counts.join(
        keep.select(F.col("cell_id").alias(cell_col)), cell_col, "left_semi"
    )


def normalize_total_log1p(
    long_counts: DataFrame,
    cell_col: str = "cell_id",
    value_col: str = "count",
    target_sum: float = 1e4,
    out_col: str = "lognorm",
) -> DataFrame:
    """scanpy normalize_total(target_sum) + log1p in long form: one agg for
    per-cell totals, broadcast join back, expression arithmetic."""
    totals = long_counts.groupBy(cell_col).agg(
        F.sum(F.col(value_col).cast("double")).alias("_total")
    )
    return (
        long_counts.join(F.broadcast(totals), cell_col)
        .withColumn(
            out_col,
            F.log1p(F.col(value_col).cast("double") / F.col("_total") * target_sum),
        )
        .drop("_total")
    )


def size_factors_median_of_ratios(
    long_counts: DataFrame,
    sample_col: str = "sample_id",
    gene_col: str = "gene_id",
    value_col: str = "count",
) -> DataFrame:
    """M1 portable core — DESeq2 median-of-ratios size factors:

    1. per-gene geometric mean over samples where count > 0 for ALL samples
       (genes with any zero are excluded, matching DESeq2's log-based mean);
    2. per-sample exact median (linear interpolation) of count/geomean.

    Output: (sample, size_factor). Two shuffles (gene agg, sample agg).
    """
    v = F.col(value_col).cast("double")
    n_samples = long_counts.select(sample_col).distinct().count()
    geo = (
        long_counts.filter(v > 0)
        .groupBy(gene_col)
        .agg(
            F.count("*").alias("_n_nonzero"),
            F.exp(F.avg(F.log(v))).alias("_geomean"),
        )
        .filter(F.col("_n_nonzero") == n_samples)
        .select(gene_col, "_geomean")
    )
    ratios = long_counts.join(geo, gene_col).select(
        sample_col, (v / F.col("_geomean")).alias("_ratio")
    )
    return ratios.groupBy(sample_col).agg(
        F.round(F.percentile("_ratio", F.lit(0.5)), 6).alias("size_factor")
    )


def pseudobulk(
    long_counts: DataFrame,
    gene_col: str = "gene_id",
    value_col: str = "count",
) -> DataFrame:
    """A9: per-gene sum / mean / exact median across cells
    (singlecell/agent5_cnv_ml.py:187-241)."""
    v = F.col(value_col).cast("double")
    return long_counts.groupBy(gene_col).agg(
        F.sum(v).alias("total"),
        F.round(F.avg(v), 6).alias("mean"),
        F.round(F.percentile(v, F.lit(0.5)), 6).alias("median"),
        F.count("*").cast("long").alias("n_cells"),
    )


def score_cell_types(
    expr: DataFrame,
    markers: DataFrame,
    cell_col: str = "cell_id",
    gene_col: str = "gene_id",
    value_col: str = "expr",
    type_col: str = "cell_type",
) -> DataFrame:
    """J10: marker-set cell-type scoring with argmax assignment
    (agent_singlecell.py:972-1062 — ``sc.tl.score_genes`` per marker set,
    then argmax over the score columns).

    Score(cell, type) = mean expression of that type's marker genes in the
    cell (the deterministic core of score_genes; the random control-set
    subtraction is a constant shift per cell under argmax and is omitted).
    The marker table is a broadcast dimension; the only shuffle is the
    (cell, type) aggregation — long format, never a pivoted wide matrix.

    Output: (cell, assigned_type, score) — one row per cell that expresses
    at least one marker; ties break on type name ascending.
    """
    from pyspark.sql import Window

    scored = (
        expr.join(F.broadcast(markers.select(gene_col, type_col)), gene_col)
        .groupBy(cell_col, type_col)
        .agg(F.avg(F.col(value_col)).alias("_score"))
    )
    w = Window.partitionBy(cell_col).orderBy(F.desc("_score"), F.asc(type_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(cell_col),
            F.col(type_col).alias("assigned_type"),
            F.round("_score", 6).alias("score"),
        )
    )


def simulate_doublets(
    cells: DataFrame,
    id_col: str,
    vec_col: str,
    sim_passes: int = 2,
    seed: int = 42,
    bucket_load: int = 8,
) -> DataFrame:
    """M12 support: synthesize doublets by averaging deterministic pseudo-
    random cell pairs — the scrublet simulation step (singlecell/
    agent1_qc.py:95-98, 283-307) without RNG state.

    Pairing is pure hash arithmetic, so it is reproducible in SQL and needs
    no global ordering: per pass p, each cell gets g = H(seed+p || id); cells
    sharing g mod nb (nb ≈ n/bucket_load buckets) are ranked inside their
    bucket by (g, id) and the FIRST two in each bucket are averaged
    element-wise — one simulated doublet per non-singleton bucket, so each
    pass yields ≈ n/bucket_load sims and (sim_passes, bucket_load) together
    play scrublet's sim_doublet_ratio role (simulated density is the
    score's normalizer, so it is an explicit knob, not an accident of
    pairing). The only window is per-bucket (bounded by the hash load
    factor) — no single-partition shapes. One count() action sizes the
    bucket space.

    Output: (sim_id < 0 hash-derived, vector array<double>).
    """
    from pyspark.sql import Window as W

    from vectordb_bioinsight_spark.functions.hashing import portable_hash64, salted_hash64

    n = cells.count()
    nb = max(1, n // bucket_load)
    base = cells.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    out = None
    for p in range(sim_passes):
        g = salted_hash64(F.col("_id").cast("string"), seed + p)
        w = W.partitionBy("_bucket").orderBy(F.asc("_g"), F.asc("_id"))
        ranked = (
            base.withColumn("_g", g)
            .withColumn("_bucket", F.pmod(F.col("_g"), F.lit(nb)))
            .withColumn("_rn", F.row_number().over(w))
        )
        a = ranked.filter(F.col("_rn") == 1).select("_bucket", F.col("_v").alias("_va"))
        b = ranked.filter(F.col("_rn") == 2).select("_bucket", F.col("_v").alias("_vb"))
        sims = a.join(b, ["_bucket"]).select(
            (-portable_hash64(F.concat_ws("|", F.lit(p), F.col("_bucket")))).alias("sim_id"),
            F.zip_with("_va", "_vb", lambda x, y: (x + y) / 2.0).alias("vector"),
        )
        out = sims if out is None else out.unionByName(sims)
    return out


def doublet_scores(
    cells: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    sim_passes: int = 2,
    seed: int = 42,
    threshold: float = 0.25,
    metric: str = "cosine",
    ann: str = "gemm",
) -> DataFrame:
    """M12 doublet detection — the scrublet analog (singlecell/
    agent1_qc.py:254-257, 283-307): each observed cell is scored by the
    fraction of SIMULATED doublets among its k nearest neighbors in the
    union of observed + simulated vectors, flagged above ``threshold``
    (reference config doublet_score_threshold = 0.25, agent1_qc.py:98).
    The default two passes at bucket_load 8 yield ≈ n/4 simulated doublets;
    at that density a genuinely-singlet neighborhood sees an expected sim
    fraction around 0.2, comfortably under the 0.25 threshold, while real
    doublets sit where the (midpoint-shaped) sims concentrate — scrublet
    instead simulates 2·n and rescales by a likelihood ratio; same
    discriminator, different normalization.

    Neighbor search: ``ann="gemm"`` (default) is exact — one BLAS matmul
    per Arrow batch — but its max_queries guard bounds the collected query
    side at 10k cells. ``ann="ivf"`` is the beyond-guard scale path: a
    seeded KMeans IVF index over the union, probed WITHOUT broadcasting
    the (corpus-sized) query side — both sides shuffle on the cell key, so
    nothing is collected anywhere; neighbor lists become approximate the
    way every production scrublet-at-scale is. Deviation from
    scrublet, documented: neighbors in raw vector space with ``metric``
    (default cosine) rather than Euclidean-on-30-PCs; the reference's PCA
    projection can be prepended via hvg_cell_vectors + MLlib PCA when
    needed.

    Output: (cell_id, n_sim_neighbors, doublet_score, is_doublet) —
    cell_id keeps the input id for numeric ids (sims get negative hash
    ids), string ids stay strings (sims get a "sim|" prefix).
    """
    from vectordb_bioinsight_spark.operators.vector import (
        ivf_build_index,
        ivf_search_gemm,
        knn_join_gemm,
    )

    if ann not in ("gemm", "ivf"):
        raise ValueError(f"unknown ann path {ann!r}")
    # the union below is consumed TWICE (kNN candidates + the is_sim flag
    # join); pin the small simulated frame so its per-bucket windows run
    # once, not per consumer
    # eager, and measured to stay eager (r10): lazy materialization raced
    # the two consumers inside one action and measured ~0.3 s SLOWER
    sims = simulate_doublets(
        cells, id_col, vec_col, sim_passes=sim_passes, seed=seed
    ).localCheckpoint(eager=True)
    numeric_ids = dict(cells.dtypes)[id_col] in ("tinyint", "smallint", "int", "bigint")
    sim_id = (
        F.col("sim_id")
        if numeric_ids
        else F.concat(F.lit("sim|"), (-F.col("sim_id")).cast("string"))
    )
    observed = cells.select(
        F.col(id_col).cast("long" if numeric_ids else "string").alias("cid"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.lit(0).alias("is_sim"),
    )
    union = observed.unionByName(
        sims.select(sim_id.alias("cid"), F.col("vector").alias("v"), F.lit(1).alias("is_sim"))
    )
    if ann == "gemm":
        neigh = knn_join_gemm(observed, union, "cid", "cid", "v", k=k, metric=metric)
    else:
        index = ivf_build_index(union, "cid", "v", n_cells=16, seed=seed)
        neigh = ivf_search_gemm(index, observed, "cid", "v", k=k, n_probe=4)
    flagged = neigh.join(union.select(F.col("cid").alias("cand_id"), "is_sim"), "cand_id")
    return (
        flagged.groupBy(F.col("query_id").alias("cell_id"))
        .agg(F.sum("is_sim").cast("long").alias("n_sim_neighbors"))
        .withColumn("doublet_score", F.round(F.col("n_sim_neighbors") / F.lit(k), 6))
        .withColumn("is_doublet", F.col("doublet_score") > threshold)
    )


def cell_cycle_scores(
    expr: DataFrame,
    s_genes: list[str],
    g2m_genes: list[str],
    cell_col: str = "cell_id",
    gene_col: str = "gene_id",
    value_col: str = "expr",
) -> DataFrame:
    """M11 tail: cell-cycle phase scoring — the deterministic core of
    ``sc.tl.score_genes_cell_cycle`` (agent1_qc.py:52-80 marker sets,
    :351-380 scoring): score each cell against the S and G2M marker sets,
    then phase = G1 when both scores are negative, else the larger score's
    set (scanpy's rule).

    score_genes subtracts a *random* control pool's mean; the deterministic
    stand-in here subtracts the cell's mean expression over ALL genes, so a
    score is positive exactly when the marker set is expressed above the
    cell's average — same sign semantics, no RNG. Pure conditional
    aggregation: ONE groupBy(cell) computing both set means and the global
    mean (no explode, no pivot, map-side combinable).

    Output: (cell_id, s_score, g2m_score, phase) — scores rounded 6 dp,
    ties (s == g2m, both >= 0) resolve to 'S' for determinism.
    """
    s_set = [g.lower() for g in s_genes]
    g2m_set = [g.lower() for g in g2m_genes]
    g = F.lower(F.col(gene_col))
    v = F.col(value_col)
    per_cell = expr.groupBy(F.col(cell_col).alias("cell_id")).agg(
        F.avg(F.when(g.isin(*s_set), v)).alias("_s_mean"),
        F.avg(F.when(g.isin(*g2m_set), v)).alias("_g2m_mean"),
        F.avg(v).alias("_all_mean"),
    )
    s_score = F.round(F.coalesce(F.col("_s_mean"), F.lit(0.0)) - F.col("_all_mean"), 6)
    g2m_score = F.round(F.coalesce(F.col("_g2m_mean"), F.lit(0.0)) - F.col("_all_mean"), 6)
    return per_cell.select(
        "cell_id",
        s_score.alias("s_score"),
        g2m_score.alias("g2m_score"),
        F.when((s_score < 0) & (g2m_score < 0), F.lit("G1"))
        .when(s_score >= g2m_score, F.lit("S"))
        .otherwise(F.lit("G2M"))
        .alias("phase"),
    )
