"""Feature-encoding tier (operators/encoding.py): leave-one-out target
encoding, frequency encoding, quantile binning."""

from __future__ import annotations

import pytest


@pytest.fixture()
def labeled(spark):
    # key 'a': targets 1,1,0 ; key 'b': 0,0 ; key 'c': singleton 1
    rows = [("a", 1), ("a", 1), ("a", 0), ("b", 0), ("b", 0), ("c", 1)]
    return spark.createDataFrame(rows, "k string, y int")


def test_target_encode_loo_excludes_own_row(spark, labeled):
    from vectordb_bioinsight_spark.operators.encoding import target_encode_loo

    out = target_encode_loo(labeled, ["k"], "y", prior_weight=0.0).collect()
    by = {}
    for r in out:
        by.setdefault((r["k"], r["y"]), []).append(r["target_enc"])
    # key a, y=1 rows: remaining labels are (1, 0) -> 0.5
    assert by[("a", 1)] == [0.5, 0.5]
    # key a, y=0 row: remaining labels (1, 1) -> 1.0
    assert by[("a", 0)] == [1.0]
    # key b rows: the other row is always 0
    assert by[("b", 0)] == [0.0, 0.0]


def test_target_encode_loo_smoothing_and_singletons(spark, labeled):
    from vectordb_bioinsight_spark.operators.encoding import target_encode_loo

    prior = 3 / 6  # global mean
    out = {(r["k"], r["y"]): r["target_enc"] for r in
           target_encode_loo(labeled, ["k"], "y", prior_weight=2.0).collect()}
    # key a, y=1: (2 - 1 + 2*0.5) / (3 - 1 + 2) = 0.5
    assert out[("a", 1)] == 0.5
    # singleton key c: no LOO evidence -> pure prior
    assert out[("c", 1)] == prior
    # smoothing pulls key b toward the prior (0 raw -> above 0)
    assert 0.0 < out[("b", 0)] < prior


def test_frequency_encode_shares(spark, labeled):
    from vectordb_bioinsight_spark.operators.encoding import frequency_encode

    out = {r["k"]: r["freq_enc"] for r in frequency_encode(labeled, ["k"]).collect()}
    assert out == {"a": 0.5, "b": pytest.approx(2 / 6, abs=1e-6), "c": pytest.approx(1 / 6, abs=1e-6)}


def test_quantile_bin_equal_frequency(spark):
    from pyspark.sql import functions as F
    from vectordb_bioinsight_spark.operators.encoding import quantile_bin

    df = spark.range(100).select(F.col("id").cast("double").alias("v"))
    out = quantile_bin(df, "v", n_bins=4)
    counts = {r["bin"]: r["n"] for r in
              out.groupBy("bin").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {0, 1, 2, 3}
    # exact quantiles (relative_error=0) -> near-equal occupancy
    assert all(20 <= n <= 30 for n in counts.values())
    # monotone: bin of 0 < bin of 99
    lo = out.filter(F.col("v") == 0.0).first()["bin"]
    hi = out.filter(F.col("v") == 99.0).first()["bin"]
    assert lo == 0 and hi == 3
