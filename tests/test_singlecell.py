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
