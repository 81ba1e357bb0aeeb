"""Single-cell operator semantics against pandas/numpy closed forms on the
seeded counts fixture (planted effects, conftest.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.singlecell import (
    apply_qc_filters,
    cell_qc_metrics,
    normalize_total_log1p,
    pseudobulk,
    size_factors_median_of_ratios,
)


@pytest.fixture(scope="module")
def long_df(spark, counts_fixture):
    counts, _meta = counts_fixture
    # cell ≡ sample, gene ≡ gene — the fixture is already long-format
    return spark.createDataFrame(
        counts.rename(columns={"sample_id": "cell_id"})[["cell_id", "gene_id", "count"]]
    )


def test_cell_qc_metrics_matches_pandas(spark, long_df, counts_fixture):
    counts, _ = counts_fixture
    qc = {r["cell_id"]: r for r in cell_qc_metrics(
        long_df, flagged_gene_predicate=F.col("gene_id").startswith("GENE1")
    ).collect()}
    pdf = counts.rename(columns={"sample_id": "cell_id"})
    for cell, grp in pdf.groupby("cell_id"):
        want_genes = int((grp["count"] > 0).sum())
        want_total = float(grp["count"].sum())
        flagged = grp[grp["gene_id"].str.startswith("GENE1")]["count"].sum()
        want_pct = round(flagged / want_total * 100.0, 6) if want_total else 0.0
        got = qc[cell]
        assert got["n_genes"] == want_genes
        assert got["total_counts"] == pytest.approx(want_total)
        assert got["pct_flagged"] == pytest.approx(want_pct, abs=1e-6)


def test_qc_filter_gates(spark, long_df):
    qc = cell_qc_metrics(long_df)
    # impossible gate: nothing survives
    assert apply_qc_filters(long_df, qc, min_genes=10**6).count() == 0
    # permissive gate: everything survives
    assert apply_qc_filters(long_df, qc, min_genes=0, min_counts=0).count() == long_df.count()
    # threshold on n_genes keeps exactly the qualifying cells' rows
    thr = qc.agg(F.expr("percentile(n_genes, 0.5)")).first()[0]
    kept_cells = {r["cell_id"] for r in qc.filter(F.col("n_genes") >= thr).collect()}
    filtered = apply_qc_filters(long_df, qc, min_genes=int(thr), min_counts=0)
    assert {r["cell_id"] for r in filtered.select("cell_id").distinct().collect()} == kept_cells


def test_normalize_total_log1p_matches_numpy(spark, long_df, counts_fixture):
    counts, _ = counts_fixture
    out = normalize_total_log1p(long_df).filter(F.col("cell_id") == "Tumor_0")
    got = {r["gene_id"]: r["lognorm"] for r in out.collect()}
    pdf = counts[counts["sample_id"] == "Tumor_0"]
    total = pdf["count"].sum()
    for _, row in pdf.iterrows():
        want = float(np.log1p(row["count"] / total * 1e4))
        assert got[row["gene_id"]] == pytest.approx(want, rel=1e-12)


def test_size_factors_median_of_ratios_matches_pandas(spark, long_df, counts_fixture):
    counts, _ = counts_fixture
    sf = {
        r["sample_id"]: r["size_factor"]
        for r in size_factors_median_of_ratios(
            long_df.withColumnRenamed("cell_id", "sample_id")
        ).collect()
    }
    wide = counts.pivot(index="gene_id", columns="sample_id", values="count").astype(float)
    keep = (wide > 0).all(axis=1)
    logg = np.log(wide[keep])
    geomean = np.exp(logg.mean(axis=1))
    for s in wide.columns:
        want = float((wide[keep][s] / geomean).median())
        assert sf[s] == pytest.approx(round(want, 6), abs=1e-6), s
    # size factors should hover around 1 for balanced libraries
    assert 0.3 < np.median(list(sf.values())) < 3.0


def test_pseudobulk_matches_pandas(spark, long_df, counts_fixture):
    counts, _ = counts_fixture
    got = {r["gene_id"]: r for r in pseudobulk(long_df).collect()}
    for gene, grp in counts.groupby("gene_id"):
        assert got[gene]["total"] == pytest.approx(float(grp["count"].sum()))
        assert got[gene]["median"] == pytest.approx(round(float(grp["count"].median()), 6))
        assert got[gene]["n_cells"] == len(grp)


def test_simulate_doublets_deterministic_pairing(spark):
    from vectordb_bioinsight_spark.operators.singlecell import simulate_doublets

    cells = spark.createDataFrame(
        [(i, [float(i), float(2 * i)]) for i in range(40)], ["cell_id", "vector"]
    )
    sims1 = simulate_doublets(cells, "cell_id", "vector", sim_passes=2, seed=7)
    sims2 = simulate_doublets(cells, "cell_id", "vector", sim_passes=2, seed=7)
    r1 = sorted((r["sim_id"], tuple(r["vector"])) for r in sims1.collect())
    r2 = sorted((r["sim_id"], tuple(r["vector"])) for r in sims2.collect())
    assert r1 == r2 and len(r1) > 0
    assert all(sid < 0 for sid, _ in r1)  # sim ids never clash with cell ids
    # every simulated vector is a midpoint of two input vectors: 2nd coord
    # is exactly twice the 1st by construction
    assert all(abs(v[1] - 2 * v[0]) < 1e-9 for _, v in r1)


def test_doublet_scores_recover_planted_doublets(spark):
    """Two tight clusters on orthogonal axes + planted midpoint cells (the
    doublet signature). Simulated cross-cluster pairs land at the midpoint,
    so planted cells see mostly-simulated neighbors while genuine cluster
    cells see mostly-genuine ones (scrublet's separation logic)."""
    from vectordb_bioinsight_spark.operators.singlecell import doublet_scores

    rows = []
    for i in range(50):  # cluster A along axis 0, unique angles
        rows.append((i, [10.0 + 0.01 * i, 0.05 * i, 0.0, 0.0]))
    for i in range(50, 100):  # cluster B along axis 1
        rows.append((i, [0.05 * (i - 50), 10.0 + 0.01 * (i - 50), 0.0, 0.0]))
    planted = list(range(100, 104))
    for i in planted:  # midpoints = synthetic real-doublet cells
        rows.append((i, [5.0 + (i - 100) * 0.05, 5.0 - (i - 100) * 0.05, 0.0, 0.0]))
    cells = spark.createDataFrame(rows, ["cell_id", "vector"])
    got = {
        r["cell_id"]: r
        for r in doublet_scores(cells, "cell_id", "vector", k=10).collect()
    }
    assert set(got) == set(range(104))
    planted_scores = [got[i]["doublet_score"] for i in planted]
    normal_scores = [got[i]["doublet_score"] for i in range(100)]
    # every planted doublet outranks every genuine cell and crosses the
    # reference threshold (0.25)
    assert min(planted_scores) > max(normal_scores)
    assert all(got[i]["is_doublet"] for i in planted)
    # a dense 1-D synthetic manifold leaves some borderline singlets, as in
    # scrublet itself — bound the false-positive rate rather than demand 0
    fp_rate = sum(1 for s in normal_scores if s > 0.25) / len(normal_scores)
    assert fp_rate <= 0.2


def test_cell_cycle_scores_phases(spark):
    from vectordb_bioinsight_spark.operators.singlecell import cell_cycle_scores

    rows = []
    # cell s1: S markers above its average -> phase S
    rows += [("s1", "mcm5", 10.0), ("s1", "pcna", 8.0), ("s1", "cdk1", 1.0), ("s1", "actb", 1.0)]
    # cell g1cell: both marker sets BELOW the cell average -> G1
    rows += [("g1cell", "mcm5", 1.0), ("g1cell", "cdk1", 1.0), ("g1cell", "actb", 10.0), ("g1cell", "gapdh", 8.0)]
    # cell m1: G2M markers dominate -> G2M
    rows += [("m1", "cdk1", 9.0), ("m1", "top2a", 7.0), ("m1", "mcm5", 1.0), ("m1", "actb", 1.0)]
    expr = spark.createDataFrame(rows, ["cell_id", "gene_id", "expr"])
    got = {
        r["cell_id"]: r
        for r in cell_cycle_scores(
            expr, s_genes=["MCM5", "PCNA"], g2m_genes=["CDK1", "TOP2A"]
        ).collect()
    }
    assert got["s1"]["phase"] == "S" and got["s1"]["s_score"] > 0
    assert got["g1cell"]["phase"] == "G1"
    assert got["g1cell"]["s_score"] < 0 and got["g1cell"]["g2m_score"] < 0
    assert got["m1"]["phase"] == "G2M" and got["m1"]["g2m_score"] > got["m1"]["s_score"]


def test_pseudotime_bfs_recovers_planted_ordering(spark):
    from vectordb_bioinsight_spark.operators.network import pseudotime_bfs

    # planted trajectory: chain 0..9 with two side branches and one
    # disconnected cell
    edges = [(i, i + 1) for i in range(9)] + [(3, 20), (6, 21)]
    df = spark.createDataFrame(edges + [(30, 31)], ["entity1", "entity2"])
    got = {r["entity"]: r for r in pseudotime_bfs(df, root=0).collect()}
    assert [got[i]["dist"] for i in range(10)] == list(range(10))
    assert got[20]["dist"] == 4 and got[21]["dist"] == 7
    # normalized to [0,1] by the farthest reachable cell (9)
    assert got[9]["pseudotime"] == 1.0
    assert got[5]["pseudotime"] == pytest.approx(5 / 9, abs=1e-6)
    # unreachable cells stay unordered, like DPT
    assert got[30]["dist"] is None and got[30]["pseudotime"] is None


def test_doublet_scores_ivf_path_recovers_planted(spark):
    """The beyond-guard IVF path (nothing collected, probe join shuffles on
    the cell key) still separates planted midpoint doublets."""
    from vectordb_bioinsight_spark.operators.singlecell import doublet_scores

    rows = []
    for i in range(50):
        rows.append((i, [10.0 + 0.01 * i, 0.05 * i, 0.0, 0.0]))
    for i in range(50, 100):
        rows.append((i, [0.05 * (i - 50), 10.0 + 0.01 * (i - 50), 0.0, 0.0]))
    planted = list(range(100, 104))
    for i in planted:
        rows.append((i, [5.0 + (i - 100) * 0.05, 5.0 - (i - 100) * 0.05, 0.0, 0.0]))
    cells = spark.createDataFrame(rows, ["cell_id", "vector"])
    got = {
        r["cell_id"]: r
        for r in doublet_scores(cells, "cell_id", "vector", k=10, ann="ivf").collect()
    }
    planted_scores = [got[i]["doublet_score"] for i in planted]
    normal_scores = [got[i]["doublet_score"] for i in range(100)]
    assert min(planted_scores) > max(normal_scores)
    assert all(got[i]["is_doublet"] for i in planted)


def test_simulate_doublets_partition_invariant(spark):
    """Hash-bucket pairing must not depend on physical partitioning — the
    property that makes it reproducible on any cluster layout."""
    from vectordb_bioinsight_spark.operators.singlecell import simulate_doublets

    cells = spark.createDataFrame(
        [(i, [float(i % 13), float(i % 7), 1.0]) for i in range(120)],
        ["cell_id", "vector"],
    )
    a = simulate_doublets(cells.repartition(3), "cell_id", "vector")
    b = simulate_doublets(cells.repartition(11), "cell_id", "vector")
    ra = sorted((r["sim_id"], tuple(r["vector"])) for r in a.collect())
    rb = sorted((r["sim_id"], tuple(r["vector"])) for r in b.collect())
    assert ra == rb and len(ra) > 10
