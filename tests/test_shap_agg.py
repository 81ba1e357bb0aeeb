"""SHAP aggregation (operators/ml_pipeline.py::shap_gene_stats /
shap_top_genes_per_sample) — pinned against numpy ports of
ml/explainer.py:96-167 and the status-card stats block (:168-246)."""

from __future__ import annotations

import numpy as np
import pytest

from vectordb_bioinsight_spark.operators.ml_pipeline import (
    shap_gene_stats,
    shap_top_genes_per_sample,
)


@pytest.fixture(scope="module")
def attribution(spark):
    rng = np.random.default_rng(3)
    n_samp, n_gene = 12, 9
    S = rng.normal(size=(n_samp, n_gene))
    X = rng.normal(loc=2.0, size=(n_samp, n_gene))
    rows = [
        (s, f"G{g}", round(float(S[s, g]), 6), round(float(X[s, g]), 6))
        for s in range(n_samp)
        for g in range(n_gene)
    ]
    df = spark.createDataFrame(
        rows, "sample_id int, gene string, shap_value double, feature_value double"
    )
    return df, S, X, n_samp, n_gene


def test_gene_stats_match_numpy(spark, attribution):
    df, S, X, n_samp, n_gene = attribution
    Sr = np.round(S, 6)
    Xr = np.round(X, 6)
    got = {r["gene"]: r for r in shap_gene_stats(df).collect()}
    global_imp = np.abs(Sr).mean(axis=0)
    for g in range(n_gene):
        r = got[f"G{g}"]
        assert r["mean_shap"] == pytest.approx(round(float(Sr[:, g].mean()), 6), abs=1e-6)
        assert r["abs_mean_shap"] == pytest.approx(round(float(np.abs(Sr[:, g]).mean()), 6), abs=1e-6)
        assert r["mean_expr"] == pytest.approx(round(float(Xr[:, g].mean()), 6), abs=1e-6)
        assert r["std_expr"] == pytest.approx(round(float(Xr[:, g].std()), 6), abs=1e-5)
        # the card's rule: strictly-greater count + 1 (explainer.py:201)
        want_rank = int(
            (np.round(global_imp, 6) > round(float(np.abs(Sr[:, g]).mean()), 6)).sum()
        ) + 1
        assert r["rank"] == want_rank, g
        assert r["direction"] == ("up" if Sr[:, g].mean() > 0 else "down")


def test_top_genes_per_sample_match_numpy(spark, attribution):
    df, S, X, n_samp, n_gene = attribution
    Sr = np.round(S, 6)
    out = shap_top_genes_per_sample(df, top_k=3).collect()
    by_sample = {}
    for r in out:
        by_sample.setdefault(r["sample_id"], []).append(r)
    for s in range(n_samp):
        rows = sorted(by_sample[s], key=lambda r: r["rk"])
        # port: argsort by |shap| desc, tie -> gene asc (the pinned order)
        order = sorted(range(n_gene), key=lambda g: (-abs(Sr[s, g]), f"G{g}"))[:3]
        assert [r["gene"] for r in rows] == [f"G{g}" for g in order], s
        assert rows[0]["total_shap"] == pytest.approx(round(float(Sr[s].sum()), 6), abs=1e-5)
        for r in rows:
            assert r["direction"] == ("up" if r["shap_value"] > 0 else "down")
