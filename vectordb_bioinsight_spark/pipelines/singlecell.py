"""Single-cell dataflow end-to-end — SURVEY M11's scanpy recipe composed
from the operator library, long-format throughout:

    QC → filter → normalize_total+log1p → HVG → cell kNN graph (cosine over
    HVG profiles) → label-propagation clustering → per-cluster markers
    (Wilcoxon rank-sum) → pseudobulk per cluster

Reference: agent_singlecell.py:746-930 (normalize/HVG/cluster),
:2139-2225 (rank_genes_groups wilcoxon), singlecell/agent1_qc.py:242-350
(QC), agent5_cnv_ml.py:187-241 (pseudobulk). UMAP/t-SNE 2D embedding is the
documented driver-side escape hatch (SURVEY §4.3(7)) and not part of the
distributed DAG.

The cell-cell kNN uses the vector layer: each cell's HVG expression vector
is assembled with a SORTED collect_list (deterministic positions), then
``knn_join`` builds the graph — the same code path as document embeddings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.network import label_propagation
from vectordb_bioinsight_spark.operators.singlecell import (
    apply_qc_filters,
    cell_qc_metrics,
    normalize_total_log1p,
    pseudobulk,
)
from vectordb_bioinsight_spark.operators.stats import variance_topk, wilcoxon_rank_sum
from vectordb_bioinsight_spark.operators.vector import knn_join


def hvg_cell_vectors(lognorm: DataFrame, n_hvg: int = 50) -> DataFrame:
    """Top-``n_hvg`` variable genes → per-cell dense vector over that gene
    panel (missing genes = 0.0), ordered by gene id for determinism.
    Output: (cell_id, vector array<double>)."""
    hvg = variance_topk(
        lognorm.select(F.col("gene_id"), F.col("lognorm")), ["gene_id"], "lognorm", k=n_hvg
    ).select("gene_id")
    panel = hvg.withColumn("_pos", F.row_number().over(Window.orderBy("gene_id")) - 1)
    n = panel.count()
    cells = (
        lognorm.join(F.broadcast(panel), "gene_id")
        .groupBy("cell_id")
        .agg(
            F.map_from_arrays(F.collect_list("_pos"), F.collect_list("lognorm")).alias("_m")
        )
        .select(
            "cell_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(n - 1)),
                lambda i: F.coalesce(F.element_at(F.col("_m"), i), F.lit(0.0)),
            ).alias("vector"),
        )
    )
    return cells


def run_singlecell_pipeline(
    long_counts: DataFrame,
    min_genes: int = 50,
    min_counts: float = 100.0,
    n_hvg: int = 50,
    knn_k: int = 5,
    lpa_iters: int = 5,
    detect_doublets: bool = False,
    doublet_threshold: float = 0.25,
) -> dict[str, DataFrame]:
    """QC → normalize → HVG vectors → [doublet removal] → kNN graph → LPA
    clusters → Wilcoxon markers → pseudobulk per cluster. Returns every
    stage. ``detect_doublets`` mirrors enable_doublet_detection in the
    reference QC agent (agent1_qc.py:95-98, 254-257): cells whose
    scrublet-analog score exceeds ``doublet_threshold`` are dropped before
    graph building, like the reference drops predicted doublets before
    downstream steps."""
    qc = cell_qc_metrics(long_counts)
    filtered = apply_qc_filters(long_counts, qc, min_genes=min_genes, min_counts=min_counts)
    lognorm = normalize_total_log1p(filtered)
    vectors = hvg_cell_vectors(lognorm, n_hvg=n_hvg)

    doublets = None
    if detect_doublets:
        from vectordb_bioinsight_spark.operators.singlecell import doublet_scores

        doublets = doublet_scores(
            vectors, "cell_id", "vector", threshold=doublet_threshold
        )
        keep = doublets.filter(~F.col("is_doublet")).select("cell_id")
        vectors = vectors.join(keep, "cell_id")
        lognorm = lognorm.join(keep, "cell_id")

    graph = knn_join(vectors, vectors, "cell_id", "cell_id", "vector", k=knn_k)
    edges = graph.select(
        F.col("query_id").alias("entity1"), F.col("cand_id").alias("entity2")
    ).distinct()
    clusters = label_propagation(edges, max_iter=lpa_iters).withColumnRenamed(
        "entity", "cell_id"
    )

    clustered = lognorm.join(clusters, "cell_id")
    # markers: for each (cluster, gene), cluster cells vs the rest
    all_clusters = [r["cluster"] for r in clusters.select("cluster").distinct().collect()]
    marker_frames = []
    for c in all_clusters:
        in_c = clustered.withColumn("_in", (F.col("cluster") == c).cast("int"))
        mk = wilcoxon_rank_sum(in_c, ["gene_id"], "_in", "lognorm").withColumn(
            "cluster", F.lit(c)
        )
        marker_frames.append(mk)
    markers = marker_frames[0]
    for mf in marker_frames[1:]:
        markers = markers.unionByName(mf)

    pseudo = pseudobulk(clustered.withColumn("count", F.col("lognorm")))
    out = {
        "qc": qc,
        "lognorm": lognorm,
        "cell_vectors": vectors,
        "knn_edges": edges,
        "clusters": clusters,
        "markers": markers,
        "pseudobulk": pseudo,
    }
    if doublets is not None:
        out["doublets"] = doublets
    return out
