"""End-to-end bulk RNA-seq dataflow (SURVEY §3.2) on the planted fixture:
the pipeline must recover planted DEGs, enrich the planted gene set over a
random one, and produce consistent validation/summary tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.pipelines.bulk_rnaseq import run_bulk_pipeline


@pytest.fixture(scope="module")
def pipeline_result(spark, counts_fixture, tmp_path_factory):
    counts_pd, meta_pd = counts_fixture
    counts = spark.createDataFrame(counts_pd)
    meta = spark.createDataFrame(meta_pd)
    # gene sets: the planted DEG block (+ a few nulls) vs a pure-null set
    planted = [("planted_block", f"GENE{i}") for i in range(20)]
    planted += [("planted_block", f"GENE{i}") for i in range(200, 205)]
    random_set = [("null_set", f"GENE{i}") for i in range(100, 125)]
    gene_sets = spark.createDataFrame(planted + random_set, ["set_id", "gene_id"])
    db = spark.createDataFrame([(f"GENE{i}",) for i in range(0, 10)], ["gene_id"])
    workdir = str(tmp_path_factory.mktemp("bulk_stages"))
    stages = run_bulk_pipeline(counts, meta, gene_sets, db, workdir=workdir)
    return stages, workdir


def test_stages_persisted(spark, pipeline_result):
    stages, workdir = pipeline_result
    for name in ["deg", "significant", "network_edges", "hubs", "enrichment", "validated", "summary"]:
        back = spark.read.parquet(f"{workdir}/{name}")
        assert back.count() == stages[name].count(), name


def test_enrichment_separates_planted_from_null(pipeline_result):
    stages, _ = pipeline_result
    enrich = {r["set_id"]: r for r in stages["enrichment"].collect()}
    assert "planted_block" in enrich
    p = enrich["planted_block"]
    assert p["fold_enrichment"] > 3.0
    assert p["pvalue"] < 1e-6
    if "null_set" in enrich:  # may fall below min_overlap entirely
        assert enrich["null_set"]["pvalue"] > 0.05


def test_validation_and_summary_consistent(pipeline_result):
    stages, _ = pipeline_result
    validated = stages["validated"].collect()
    summary = stages["summary"].first()
    assert summary["n_genes"] == len(validated)
    assert summary["n_up"] == sum(1 for r in validated if r["direction"] == "up")
    assert summary["n_hubs"] == sum(1 for r in validated if r["is_hub"])
    assert summary["n_high_conf"] == sum(1 for r in validated if r["confidence"] == "high")
    # a planted, db-matched gene should reach >= medium confidence
    g0 = next(r for r in validated if r["gene_id"] == "GENE0")
    assert g0["db_match"] and g0["direction"] == "up"
    assert g0["confidence"] in ("high", "medium")
    # every high-confidence gene is significant
    for r in validated:
        if r["confidence"] == "high":
            assert r["direction"] is not None


def test_network_edges_connect_coregulated_planted_genes(pipeline_result):
    stages, _ = pipeline_result
    edges = stages["network_edges"].collect()
    assert len(edges) > 0
    planted = {f"GENE{i}" for i in range(20)}
    planted_edges = [r for r in edges if r["entity1"] in planted and r["entity2"] in planted]
    # planted genes share the tumor/normal split -> correlated profiles
    assert len(planted_edges) > 0
