"""Shared fixtures: one SparkSession per test session, seeded synthetic
fixtures following the reference's pattern (seed=42, planted effects with
analytically known answers — tests/conftest.py:29-95 of the reference)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from vectordb_bioinsight_spark.session import get_session

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_session("tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def counts_fixture():
    """Long-format RNA-seq counts with planted DEGs (FIXTURES.md §2):
    negative_binomial(20, 0.05) base; genes 0-19 get fold changes
    {4,5,6,0.15,0.2,0.25} cycling in tumor samples."""
    rng = np.random.default_rng(42)
    n_genes, n_samples = 300, 10
    genes = [f"GENE{i}" for i in range(n_genes)]
    samples = [f"Tumor_{i}" for i in range(5)] + [f"Normal_{i}" for i in range(5)]
    base = rng.negative_binomial(20, 0.05, size=(n_genes, n_samples)).astype(float)
    fcs = [4.0, 5.0, 6.0, 0.15, 0.2, 0.25]
    for i in range(20):
        base[i, :5] = base[i, :5] * fcs[i % len(fcs)]
    rows = [
        (genes[g], samples[s], int(base[g, s]))
        for g in range(n_genes)
        for s in range(n_samples)
    ]
    counts = pd.DataFrame(rows, columns=["gene_id", "sample_id", "count"])
    meta = pd.DataFrame(
        {
            "sample_id": samples,
            "condition": ["tumor"] * 5 + ["normal"] * 5,
            "batch": ["batch1", "batch2"] * 5,
        }
    )
    return counts, meta
