"""Domain-adaptation operators (operators/stats.py::reference_quantile_map
/ zscore_recalibrate) — pinned against numpy ports of
ml/domain_adapter.py:131-198."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.stats import (
    reference_quantile_map,
    zscore_recalibrate,
)


def test_reference_quantile_map_matches_numpy(spark):
    rng = np.random.default_rng(7)
    n_feat, n_samp = 40, 6
    X = rng.normal(size=(n_feat, n_samp))
    ref = np.sort(rng.normal(size=n_feat)) * 0.8

    rows = [
        (int(s), int(f), float(X[f, s]))
        for s in range(n_samp)
        for f in range(n_feat)
    ]
    df = spark.createDataFrame(rows, "sample int, feature int, value double")
    ref_df = spark.createDataFrame(
        [(i + 1, float(q)) for i, q in enumerate(ref)], "rank int, ref_q double"
    )
    got = {
        (r["sample"], r["feature"]): r["adapted"]
        for r in reference_quantile_map(df, "sample", "feature", "value", ref_df).collect()
    }
    # the reference port: ranks = argsort(argsort(column)), mapped into ref
    for s in range(n_samp):
        ranks = np.argsort(np.argsort(X[:, s]))
        want = ref[ranks]
        for f in range(n_feat):
            assert got[(s, f)] == pytest.approx(round(float(want[f]), 6)), (s, f)


def test_zscore_recalibrate_matches_numpy(spark):
    rng = np.random.default_rng(11)
    vals = rng.normal(loc=5.0, scale=3.0, size=200)
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id int, value double"
    )
    out = {r["id"]: r["recalibrated"] for r in zscore_recalibrate(df, "value").collect()}
    mu, sd = vals.mean(), vals.std()  # ddof=0, as the reference's .std()
    want = (vals - mu) / sd * 0.8 + 0.0
    for i in range(len(vals)):
        assert out[i] == pytest.approx(round(float(want[i]), 6), abs=1e-5), i


def test_zscore_recalibrate_degenerate_std(spark):
    df = spark.createDataFrame([(i, 4.2) for i in range(5)], "id int, value double")
    out = zscore_recalibrate(df, "value", target_mean=1.5).collect()
    # std == 0: shift-only branch -> value - mean + target_mean
    assert all(r["recalibrated"] == pytest.approx(1.5) for r in out)
