"""DEG pipeline (SURVEY M1 fallback semantics) against a pandas/scipy oracle
replicating the reference's own fallback math (agent1_deg.py:347-447):
group means -> log2((m1+1)/(m2+1)) -> Welch t -> BH-FDR -> significance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vectordb_bioinsight_spark.operators.deg import deg_analysis, significant_degs


def _welch_numpy(a: np.ndarray, b: np.ndarray) -> tuple[float, float]:
    """Welch t + exact two-sided p, computed independently of the engine's
    column expressions (plain numpy formulas; shares only the scalar
    incomplete-beta special function, which is itself pinned against
    reference values in test_special.py)."""
    from vectordb_bioinsight_spark.functions.special import t_pvalue_two_sided

    va, vb = a.var(ddof=1), b.var(ddof=1)
    na, nb = len(a), len(b)
    se2 = va / na + vb / nb
    t = (a.mean() - b.mean()) / np.sqrt(se2)
    df = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    return float(t), float(t_pvalue_two_sided(t, df))


def _pandas_deg_oracle(counts: pd.DataFrame, meta: pd.DataFrame) -> pd.DataFrame:
    merged = counts.merge(meta[["sample_id", "condition"]], on="sample_id")
    totals = merged.groupby("gene_id")["count"].sum()
    keep = totals[totals >= 10.0].index
    merged = merged[merged.gene_id.isin(keep)]
    out = []
    for gene, grp in merged.groupby("gene_id"):
        a = grp[grp.condition == "tumor"]["count"].to_numpy(dtype=float)
        b = grp[grp.condition == "normal"]["count"].to_numpy(dtype=float)
        t, p = _welch_numpy(a, b)
        if np.isnan(p):
            p = 1.0
        out.append(
            {
                "gene_id": gene,
                "baseMean": grp["count"].mean(),
                "log2FC": np.log2((a.mean() + 1) / (b.mean() + 1)),
                "stat": t,
                "pvalue": p,
            }
        )
    df = pd.DataFrame(out)
    # BH
    p = df.pvalue.to_numpy()
    order = np.argsort(p, kind="mergesort")
    ranked = p[order] * len(p) / (np.arange(len(p)) + 1)
    adj = np.minimum.accumulate(ranked[::-1])[::-1]
    padj = np.empty_like(adj)
    padj[order] = np.minimum(adj, 1.0)
    df["padj"] = padj
    df["direction"] = np.where(
        (df.padj < 0.05) & (df.log2FC > 1.0),
        "up",
        np.where((df.padj < 0.05) & (df.log2FC < -1.0), "down", None),
    )
    return df


@pytest.fixture(scope="module")
def deg_result(spark, counts_fixture):
    counts_pd, meta_pd = counts_fixture
    counts = spark.createDataFrame(counts_pd)
    meta = spark.createDataFrame(meta_pd)
    return deg_analysis(counts, meta).toPandas(), _pandas_deg_oracle(counts_pd, meta_pd)


def test_deg_matches_scipy_oracle(deg_result):
    got, want = deg_result
    merged = got.merge(want, on="gene_id", suffixes=("", "_want"))
    assert len(merged) == len(want) == len(got)
    for col in ["baseMean", "log2FC", "stat", "pvalue", "padj"]:
        np.testing.assert_allclose(merged[col], merged[f"{col}_want"], rtol=1e-9, atol=1e-12, err_msg=col)
    assert (merged.direction.fillna("-") == merged.direction_want.fillna("-")).all()


def test_planted_degs_recovered(deg_result):
    """Genes 0-19 carry planted fold changes {4,5,6,.15,.2,.25}. With 5v5
    samples and BH over 300 genes the weakest effects can land above the padj
    cutoff, so require >= 15/20 recovered, every recovered one with the
    correct direction, and essentially no false positives among null genes."""
    got, _ = deg_result
    sig = got[got.direction.notna()].set_index("gene_id")
    fcs = [4.0, 5.0, 6.0, 0.15, 0.2, 0.25]
    planted = {f"GENE{i}": ("up" if fcs[i % 6] > 1 else "down") for i in range(20)}
    recovered = [g for g in planted if g in sig.index]
    assert len(recovered) >= 15, f"only {len(recovered)}/20 planted DEGs recovered"
    for g in recovered:
        assert sig.loc[g, "direction"] == planted[g], g
    false_pos = [g for g in sig.index if g not in planted]
    assert len(false_pos) <= 2, f"too many false positives: {false_pos}"


def test_significant_subset_ordering(spark, counts_fixture):
    counts_pd, meta_pd = counts_fixture
    deg = deg_analysis(spark.createDataFrame(counts_pd), spark.createDataFrame(meta_pd))
    sig = significant_degs(deg).toPandas()
    assert (sig.padj.values[:-1] <= sig.padj.values[1:]).all()
    assert sig.direction.notna().all()


# --- gene-ID format detection + symbol mapping (agent4_validation.py:249-331)


def test_gene_id_format_detection_branches(spark):
    from pyspark.sql import functions as F

    from vectordb_bioinsight_spark.operators.deg import detect_gene_id_format

    # symbol-majority -> pass through (scope 'none')
    syms = spark.createDataFrame(
        [("TP53",), ("KRAS",), ("EGFR",), ("ENSG000001",)], "gene_id string"
    )
    r = detect_gene_id_format(syms).collect()[0]
    assert (r["symbol_count"], r["needs_conversion"], r["scope"]) == (3, 0, "none")

    # entrez-majority -> entrezgene scope
    nums = spark.createDataFrame(
        [("7157",), ("672",), ("1956",), ("SYM1",)], "gene_id string"
    )
    r = detect_gene_id_format(nums).collect()[0]
    assert (r["numeric_count"], r["needs_conversion"], r["scope"]) == (3, 1, "entrezgene")

    # ensembl beats entrez
    ens = spark.createDataFrame(
        [("ENSG01",), ("ENSG02",), ("7157",), ("SYM1",)], "gene_id string"
    )
    r = detect_gene_id_format(ens).collect()[0]
    assert r["scope"] == "ensembl.gene" and r["needs_conversion"] == 1


def test_map_gene_symbols_version_strip_and_fallback(spark):
    from vectordb_bioinsight_spark.operators.deg import map_gene_symbols

    genes = spark.createDataFrame(
        [(1, "ENSG01.5"), (2, "ENSG01"), (3, "ENSG99"), (4, "TP53")],
        "id int, gene_id string",
    )
    mapping = spark.createDataFrame([("ENSG01", "GENE1")], "query string, symbol string")
    got = {r["id"]: r["gene_symbol"] for r in map_gene_symbols(genes, mapping).collect()}
    # versioned and clean forms both resolve; unmapped ids self-map
    assert got == {1: "GENE1", 2: "GENE1", 3: "ENSG99", 4: "TP53"}
