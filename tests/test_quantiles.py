"""Exact + approximate per-group quantiles (operators/relational.py)."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.relational import (
    group_quantiles,
    group_quantiles_approx,
)


def _lower_disc(vals, q):
    s = sorted(vals)
    return s[max(1, math.ceil(q * len(s))) - 1]


def test_exact_quantiles_match_numpy_rule(spark):
    rng = np.random.default_rng(7)
    rows = [
        (f"g{i % 3}", float(v))
        for i, v in enumerate(rng.normal(0, 10, 1000))
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    out = {
        r.k: r
        for r in group_quantiles(df, ["k"], "v", [0.0, 0.5, 0.9, 1.0]).collect()
    }
    by_k = {}
    for k, v in rows:
        by_k.setdefault(k, []).append(v)
    for k, vals in by_k.items():
        assert out[k].n == len(vals)
        assert out[k]["p0"] == _lower_disc(vals, 0.0)  # q=0 -> min
        assert out[k]["p50"] == _lower_disc(vals, 0.5)
        assert out[k]["p90"] == _lower_disc(vals, 0.9)
        assert out[k]["p100"] == max(vals)


def test_exact_quantiles_tie_stability(spark):
    """Heavy ties: the rank-k VALUE is deterministic whichever tied row
    row_number happens to pick."""
    rows = [("a", float(v)) for v in [1, 1, 1, 2, 2, 3]]
    df = spark.createDataFrame(rows, "k string, v double")
    r = group_quantiles(df, ["k"], "v", [0.5, 0.99]).collect()[0]
    assert r["p50"] == 1.0  # rank ceil(0.5*6)=3 -> third 1.0
    assert r["p99"] == 3.0


def test_approx_within_rank_tolerance(spark):
    """percentile_approx(accuracy=A) guarantees rank error <= n/A; with
    A >= n it should land exactly on a group member near the target rank."""
    rng = np.random.default_rng(11)
    vals = sorted(float(v) for v in rng.uniform(0, 1, 2000))
    df = spark.createDataFrame([("a", v) for v in vals], "k string, v double")
    exact = group_quantiles(df, ["k"], "v", [0.5, 0.9]).collect()[0]
    approx = group_quantiles_approx(df, ["k"], "v", [0.5, 0.9], accuracy=10000).collect()[0]
    n = len(vals)
    for name, q in (("p50", 0.5), ("p90", 0.9)):
        # allow a small rank window around the exact answer
        lo = vals[max(0, math.ceil(q * n) - 1 - 3)]
        hi = vals[min(n - 1, math.ceil(q * n) - 1 + 3)]
        assert lo <= approx[name] <= hi, (name, exact[name], approx[name])


class TestHistShards:
    """Mergeable fixed-grid histogram quantiles (operators/sketches.py::
    hist_shards / merge_hist_shards / hist_quantiles)."""

    def test_merge_equals_rebuild_exactly(self, spark):
        """Integer counts: shard-then-merge == one-pass build, EXACT."""
        import random

        from vectordb_bioinsight_spark.operators.sketches import (
            hist_shards,
            merge_hist_shards,
        )

        rng = random.Random(3)
        rows = [
            (f"g{i % 3}", i % 7, rng.uniform(-50, 450)) for i in range(2000)
        ]
        df = spark.createDataFrame(rows, "g string, day int, x double")
        sharded = merge_hist_shards(
            hist_shards(df, ["g", "day"], "x", lo=0.0, hi=400.0), ["g"]
        )
        direct = hist_shards(df, ["g"], "x", lo=0.0, hi=400.0)
        a = {(r["g"], r["bin"]): r["cnt"] for r in sharded.collect()}
        b = {(r["g"], r["bin"]): r["cnt"] for r in direct.collect()}
        assert a == b

    def test_quantile_error_bounded_by_bin_width(self, spark):
        """Estimate >= exact quantile (conservative rank query) and
        within one bin width above it, for in-range data."""
        import random

        import numpy as np

        from vectordb_bioinsight_spark.operators.sketches import (
            hist_quantiles,
            hist_shards,
        )

        rng = random.Random(5)
        vals = [rng.uniform(0, 400) for _ in range(5000)]
        df = spark.createDataFrame([("a", v) for v in vals], "g string, x double")
        n_bins, width = 128, 400.0 / 128
        h = hist_shards(df, ["g"], "x", lo=0.0, hi=400.0, n_bins=n_bins)
        out = hist_quantiles(h, ["g"], lo=0.0, hi=400.0, n_bins=n_bins).first()
        assert out["n"] == 5000
        for q, col in ((0.5, "q50"), (0.9, "q90"), (0.99, "q99")):
            # exact lower quantile: the ceil(q*n)-th smallest value
            exact = float(np.sort(vals)[int(np.ceil(q * 5000)) - 1])
            assert exact <= out[col] <= exact + width + 1e-9

    def test_out_of_range_clamps_to_edge_bins(self, spark):
        from vectordb_bioinsight_spark.operators.sketches import hist_shards

        df = spark.createDataFrame(
            [("a", -99.0), ("a", 0.0), ("a", 400.0), ("a", 9e9)],
            "g string, x double",
        )
        got = {
            r["bin"]: r["cnt"]
            for r in hist_shards(df, ["g"], "x", 0.0, 400.0, 128).collect()
        }
        assert got == {0: 2, 127: 2}


class TestKMV:
    def test_unsaturated_is_exact_and_merge_equals_rebuild(self, spark):
        from vectordb_bioinsight_spark.operators.sketches import (
            kmv_shards,
            kmv_to_stats,
            merge_kmv_shards,
        )

        rows = [(f"s{i % 4}", i % 120) for i in range(2000)]
        df = spark.createDataFrame(rows, "shard string, k int")
        sh = kmv_shards(df, ["shard"], "k", k=256)
        merged = merge_kmv_shards(sh.withColumnRenamed("shard", "s"), ["s"], k=256)
        # shard s_j holds keys {i%120 : i ≡ j mod 4} = 30 distinct each;
        # < 256 -> exact counts
        for r in kmv_to_stats(sh, k=256).collect():
            assert r["n_distinct_est"] == 30.0
        # merge to one grain == rebuild from all keys
        all_m = merge_kmv_shards(
            sh.withColumn("g", F.lit(1)), ["g"], k=256
        )
        direct = kmv_shards(df.withColumn("g", F.lit(1)), ["g"], "k", k=256)
        assert all_m.first()["kmv"] == direct.first()["kmv"]

    def test_saturated_estimate_within_kmv_error(self, spark):
        """n = 20k distinct >> k = 256: estimate within ~3/sqrt(k) rel
        error (the KMV envelope)."""
        from vectordb_bioinsight_spark.operators.sketches import (
            kmv_shards,
            kmv_to_stats,
        )

        df = spark.range(20_000).select(F.lit("g").alias("g"), F.col("id"))
        sh = kmv_shards(df, ["g"], "id", k=256)
        est = kmv_to_stats(sh, k=256).first()["n_distinct_est"]
        assert abs(est - 20_000) / 20_000 < 3 / (256 ** 0.5)

    def test_overlap_estimates_known_jaccard(self, spark):
        """A = 0..9999, B = 5000..14999: true Jaccard 1/3, intersection
        5000 — estimates within the sketch envelope."""
        from vectordb_bioinsight_spark.operators.sketches import (
            kmv_overlap,
            kmv_shards,
        )

        a = spark.range(0, 10_000).select(F.lit("g").alias("g"), "id")
        b = spark.range(5_000, 15_000).select(F.lit("g").alias("g"), "id")
        sa = kmv_shards(a, ["g"], "id", k=256)
        sb = kmv_shards(b, ["g"], "id", k=256)
        r = kmv_overlap(sa, sb, k=256).first()
        assert abs(r["jaccard"] - 1 / 3) < 0.12
        assert abs(r["est_intersect"] - 5_000) / 5_000 < 0.4
        assert abs(r["est_union"] - 15_000) / 15_000 < 0.2
