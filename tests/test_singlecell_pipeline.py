"""End-to-end single-cell dataflow on a planted two-population fixture:
clustering must separate the populations and markers must surface the
planted genes."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.pipelines.singlecell import run_singlecell_pipeline


@pytest.fixture(scope="module")
def sc_stages(spark):
    rng = np.random.default_rng(11)
    n_cells, n_genes = 40, 60
    base = rng.poisson(5, size=(n_cells, n_genes)).astype(float)
    # population A (cells 0-19) overexpresses genes 0-9; B genes 10-19
    base[:20, 0:10] *= 8.0
    base[20:, 10:20] *= 8.0
    rows = [
        (f"c{c:02d}", f"g{g:02d}", float(base[c, g]))
        for c in range(n_cells)
        for g in range(n_genes)
        if base[c, g] > 0
    ]
    df = spark.createDataFrame(rows, ["cell_id", "gene_id", "count"])
    return run_singlecell_pipeline(df, min_genes=10, min_counts=10.0, n_hvg=30, knn_k=5)


def test_all_cells_survive_qc_and_cluster(sc_stages):
    clusters = sc_stages["clusters"].collect()
    assert len(clusters) == 40


def test_clusters_separate_planted_populations(sc_stages):
    got = {r["cell_id"]: r["cluster"] for r in sc_stages["clusters"].collect()}
    pop_a = [got[f"c{c:02d}"] for c in range(20)]
    pop_b = [got[f"c{c:02d}"] for c in range(20, 40)]
    # dominant label within each population is consistent and differs
    from collections import Counter

    lab_a, n_a = Counter(pop_a).most_common(1)[0]
    lab_b, n_b = Counter(pop_b).most_common(1)[0]
    assert n_a >= 16 and n_b >= 16, (Counter(pop_a), Counter(pop_b))
    assert lab_a != lab_b


def test_markers_surface_planted_genes(sc_stages):
    markers = sc_stages["markers"]
    top = (
        markers.withColumn("_absz", F.abs(F.col("z")))
        .orderBy(F.desc("_absz"))
        .limit(20)
        .collect()
    )
    planted = {f"g{g:02d}" for g in range(20)}
    hits = sum(1 for r in top if r["gene_id"] in planted)
    assert hits >= 12, [r["gene_id"] for r in top]


def test_knn_graph_degree_bounds(sc_stages):
    edges = sc_stages["knn_edges"].collect()
    out_deg = {}
    for r in edges:
        out_deg[r["entity1"]] = out_deg.get(r["entity1"], 0) + 1
    assert max(out_deg.values()) <= 5
    assert len(out_deg) == 40


def test_pseudobulk_covers_all_genes(sc_stages):
    pb = sc_stages["pseudobulk"].collect()
    assert len(pb) == 60
    assert all(r["n_cells"] > 0 for r in pb)


def test_pipeline_doublet_stage_drops_flagged_cells(spark):
    """detect_doublets=True produces a doublets frame over string cell ids
    and removes flagged cells before clustering (agent1_qc.py:254-257)."""
    rng = np.random.default_rng(5)
    base = rng.poisson(5, size=(30, 40)).astype(float)
    base[:15, 0:8] *= 8.0
    base[15:, 8:16] *= 8.0
    rows = [
        (f"c{c:02d}", f"g{g:02d}", float(base[c, g]))
        for c in range(30)
        for g in range(40)
        if base[c, g] > 0
    ]
    df = spark.createDataFrame(rows, ["cell_id", "gene_id", "count"])
    stages = run_singlecell_pipeline(
        df, min_genes=10, min_counts=10.0, n_hvg=20, knn_k=3, detect_doublets=True
    )
    dbl = stages["doublets"].collect()
    assert {r["cell_id"] for r in dbl} == {f"c{c:02d}" for c in range(30)}
    flagged = {r["cell_id"] for r in dbl if r["is_doublet"]}
    clustered = {r["cell_id"] for r in stages["clusters"].collect()}
    assert clustered == {f"c{c:02d}" for c in range(30)} - flagged
