"""Count-min sketch (operators/sketches.py): one-sided error guarantee,
shard mergeability, bounded size."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.sketches import cms_build, cms_estimate


@pytest.fixture(scope="module")
def items(spark):
    # zipf-ish term stream: term_i appears (50 - i) times
    rows = [(f"t{i}",) for i in range(40) for _ in range(50 - i)]
    return spark.createDataFrame(rows, "term string")


def test_estimate_never_underestimates(spark, items):
    """The CMS guarantee: est >= exact for every term, even with a tiny
    sketch that forces collisions."""
    sketch = cms_build(items, "term", width=8, depth=2)
    terms = items.distinct()
    est = {r["term"]: r["cms_est"] for r in cms_estimate(sketch, terms, "term", 8, 2).collect()}
    exact = {r["term"]: r["n"] for r in items.groupBy("term").agg(F.count("*").alias("n")).collect()}
    assert set(est) == set(exact)
    for t, e in exact.items():
        assert est[t] >= e, t


def test_wide_sketch_is_exact_here(spark, items):
    sketch = cms_build(items, "term", width=4096, depth=4)
    terms = items.distinct()
    est = {r["term"]: r["cms_est"] for r in cms_estimate(sketch, terms, "term", 4096, 4).collect()}
    exact = {r["term"]: r["n"] for r in items.groupBy("term").agg(F.count("*").alias("n")).collect()}
    assert est == exact


def test_shard_sketches_merge_additively(spark, items):
    """sketch(A union B) == merge-by-sum of sketch(A), sketch(B)."""
    a = items.filter(F.length("term") == 2)   # t0..t9
    b = items.filter(F.length("term") > 2)
    merged = (
        cms_build(a, "term", 16, 3)
        .unionAll(cms_build(b, "term", 16, 3))
        .groupBy("j", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    full = cms_build(items, "term", 16, 3)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_unseen_term_estimates_from_empty_buckets(spark, items):
    sketch = cms_build(items, "term", width=1 << 20, depth=4)
    terms = spark.createDataFrame([("never-seen-term-xyz",)], "term string")
    [r] = cms_estimate(sketch, terms, "term", 1 << 20, 4).collect()
    assert r["cms_est"] == 0


def test_cell_guard(spark, items):
    with pytest.raises(ValueError):
        cms_build(items, "term", width=1 << 22, depth=2)


def test_streaming_cms_equals_batch(spark, tmp_path_factory):
    """The sketch build is one bounded-key streaming aggregation: the
    incremental (multi-micro-batch) sketch must equal the batch sketch —
    the additive-merge property, exercised through real streaming state."""
    from tests.conftest import SF_SMALL
    from vectordb_bioinsight_spark.functions.text import tokenize
    from vectordb_bioinsight_spark.sources.readers import load_table
    from vectordb_bioinsight_spark.streaming.trends_stream import (
        run_stream_to_memory,
        stream_events_from_dir,
    )

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    path = str(tmp_path_factory.mktemp("docs_stream"))
    docs.repartition(4).write.mode("overwrite").parquet(path)

    def toks(df):
        return df.select(F.explode(tokenize(F.col("text"))).alias("term"))

    batch = cms_build(toks(spark.read.schema(docs.schema).parquet(path)), "term", 64, 3)
    stream = cms_build(
        toks(stream_events_from_dir(spark, path, docs.schema)), "term", 64, 3
    )
    got = run_stream_to_memory(stream, "cms_stream_test")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_winsorize_idempotent(spark):
    """Winsorizing an already-winsorized column changes nothing: the
    clamped values' quantiles clamp to themselves."""
    from vectordb_bioinsight_spark.operators.stats import winsorize_by_group
    from tests.conftest import SF_SMALL
    from vectordb_bioinsight_spark.sources.readers import load_table

    ev = load_table(spark, SF_SMALL, "events").select("event_id", "event_type", "value")
    once = winsorize_by_group(ev, ["event_type"], "value").select(
        "event_id", "event_type", F.col("value_w").alias("value")
    )
    twice = winsorize_by_group(once, ["event_type"], "value")
    assert twice.filter(F.col("value") != F.col("value_w")).count() == 0


def test_winsorize_and_robust_scale_null_discipline(spark):
    """NULL values must not shift the quantile fit (rank windows would
    count them and engines order NULLs differently); NULL rows pass
    through with NULL outputs."""
    from vectordb_bioinsight_spark.operators.stats import (
        robust_scale_by_group,
        winsorize_by_group,
    )

    base = [("a", float(i)) for i in range(1, 21)]
    with_nulls = base + [("a", None)] * 5
    df_clean = spark.createDataFrame(base, "g string, v double")
    df_nulls = spark.createDataFrame(with_nulls, "g string, v double")

    w_clean = {r["v"]: r["v_w"] for r in winsorize_by_group(df_clean, ["g"], "v").collect()}
    out = winsorize_by_group(df_nulls, ["g"], "v").collect()
    w_nulls = {r["v"]: r["v_w"] for r in out if r["v"] is not None}
    assert w_clean == w_nulls                      # fit unchanged by NULLs
    null_rows = [r for r in out if r["v"] is None]
    assert len(null_rows) == 5
    assert all(r["v_w"] is None for r in null_rows)

    r_clean = {r["v"]: r["robust_z"] for r in robust_scale_by_group(df_clean, ["g"], "v").collect()}
    r_nulls = {
        r["v"]: r["robust_z"]
        for r in robust_scale_by_group(df_nulls, ["g"], "v").collect()
        if r["v"] is not None
    }
    assert r_clean == r_nulls


class TestMomentShards:
    def test_merge_equals_rebuild(self, spark):
        """merge(profile(day shards)) == profile(whole) — the maintenance
        property that lets ingest keep column stats in O(shards)/batch."""
        import math

        from pyspark.sql import functions as F

        from vectordb_bioinsight_spark.operators.sketches import (
            merge_moment_shards,
            moment_shards,
            moments_to_stats,
        )
        from vectordb_bioinsight_spark.sources.readers import load_table
        from tests.conftest import SF_SMALL

        ev = load_table(spark, SF_SMALL, "events").withColumn(
            "shard_day", F.to_date("ts")
        )
        merged = moments_to_stats(
            merge_moment_shards(
                moment_shards(ev, ["event_type", "shard_day"], "value"),
                ["event_type"],
            )
        )
        direct = moments_to_stats(moment_shards(ev, ["event_type"], "value"))
        m = {r["event_type"]: r for r in merged.collect()}
        d = {r["event_type"]: r for r in direct.collect()}
        assert m.keys() == d.keys()
        for k in d:
            assert m[k]["n"] == d[k]["n"]
            for col in ("mean", "var", "std"):
                assert math.isclose(m[k][col], d[k][col], rel_tol=0, abs_tol=1e-6), (
                    k, col, m[k][col], d[k][col]
                )

    def test_merge_is_incremental(self, spark):
        """Folding a new day's shard into a standing profile equals
        rebuilding from scratch — the streaming-batch contract."""
        from pyspark.sql import functions as F

        from vectordb_bioinsight_spark.operators.sketches import (
            merge_moment_shards,
            moment_shards,
            moments_to_stats,
        )

        rows = [("a", d, float(v)) for d in (1, 2, 3) for v in range(d, d + 5)]
        df = spark.createDataFrame(rows, "k string, day int, v double")
        old = moment_shards(df.filter(F.col("day") < 3), ["k", "day"], "v")
        new = moment_shards(df.filter(F.col("day") == 3), ["k", "day"], "v")
        folded = moments_to_stats(
            merge_moment_shards(old.unionByName(new), ["k"])
        ).first()
        rebuilt = moments_to_stats(moment_shards(df, ["k"], "v")).first()
        assert folded["n"] == rebuilt["n"] == 15
        assert folded["mean"] == rebuilt["mean"]
        assert folded["var"] == rebuilt["var"]

    def test_single_row_shards_merge(self, spark):
        """1-row shards have NULL var_samp -> m2 must coalesce to 0, and
        the merged variance must still be exact."""
        from vectordb_bioinsight_spark.operators.sketches import (
            merge_moment_shards,
            moment_shards,
            moments_to_stats,
        )

        df = spark.createDataFrame(
            [("a", i, float(i)) for i in range(6)], "k string, shard int, v double"
        )
        out = moments_to_stats(
            merge_moment_shards(moment_shards(df, ["k", "shard"], "v"), ["k"])
        ).first()
        assert out["n"] == 6 and out["mean"] == 2.5
        assert out["var"] == 3.5  # var_samp of 0..5

    def test_hll_shards_merge_equals_rebuild_exactly(self, spark):
        """Union-of-sketches == sketch-of-union: the merged estimate must
        EQUAL the direct estimate (same registers), not just approximate
        it — and both land inside the HLL envelope of the exact count."""
        from pyspark.sql import functions as F

        from vectordb_bioinsight_spark.operators.sketches import (
            hll_shards,
            hll_to_stats,
            merge_hll_shards,
        )
        from vectordb_bioinsight_spark.sources.readers import load_table
        from tests.conftest import SF_SMALL

        ev = load_table(spark, SF_SMALL, "events").withColumn(
            "shard_day", F.to_date("ts")
        )
        merged = hll_to_stats(
            merge_hll_shards(
                hll_shards(ev, ["event_type", "shard_day"], "user_id"),
                ["event_type"],
            )
        )
        direct = hll_to_stats(hll_shards(ev, ["event_type"], "user_id"))
        exact = {r["event_type"]: r["n"] for r in
                 ev.groupBy("event_type").agg(
                     F.count_distinct("user_id").alias("n")).collect()}
        m = {r["event_type"]: r for r in merged.collect()}
        d = {r["event_type"]: r for r in direct.collect()}
        assert m.keys() == d.keys() == exact.keys()
        for k in d:
            assert m[k]["n_distinct"] == d[k]["n_distinct"]   # exact in sketch space
            assert m[k]["n_rows"] == d[k]["n_rows"]
            assert abs(m[k]["n_distinct"] - exact[k]) / exact[k] < 0.03


class TestHllReplay:
    """Deterministic-replay HLL (r07): the portable-hash register pipeline
    whose state AND estimate replay in DuckDB/Python — the oracle behind
    the approx_distinct_users / rolling_active_users catalog entries."""

    @staticmethod
    def _py_estimate(keys):
        """Pure-python port of registers + estimate (the semantic oracle)."""
        import hashlib

        from vectordb_bioinsight_spark.operators.sketches import (
            HLL_REPLAY_LG_K,
            HLL_REPLAY_RHO_MAX,
        )

        m = 1 << HLL_REPLAY_LG_K
        regs = {}
        for k in set(keys):
            h = int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16)
            bucket = h & (m - 1)
            w = h >> HLL_REPLAY_LG_K
            if w == 0:
                rho = HLL_REPLAY_RHO_MAX
            else:
                rho = min(((w & -w).bit_length() - 1) + 1, HLL_REPLAY_RHO_MAX)
            regs[bucket] = max(regs.get(bucket, 0), rho)
        s_int = sum(1 << (HLL_REPLAY_RHO_MAX - r) for r in regs.values())
        nb = len(regs)
        v = m - nb
        alpha = 0.7213 / (1.0 + 1.079 / m)
        s = s_int / float(1 << HLL_REPLAY_RHO_MAX) + v
        raw = alpha * m * m / s
        import math

        est = m * math.log(m / v) if (raw <= 2.5 * m and v > 0) else raw
        return round(est, 4)

    def test_registers_and_estimate_match_python_port(self, spark):
        from pyspark.sql import functions as F

        from vectordb_bioinsight_spark.operators.sketches import (
            hll_replay_estimate,
            hll_replay_registers,
        )

        import random

        rng = random.Random(7)
        rows = [(f"g{i % 3}", f"user-{rng.randrange(4000)}") for i in range(6000)]
        df = spark.createDataFrame(rows, "g string, k string")
        got = {r["g"]: r["approx_distinct"] for r in hll_replay_estimate(
            hll_replay_registers(df, ["g"], "k"), ["g"]).collect()}
        for g in ["g0", "g1", "g2"]:
            keys = [k for gg, k in rows if gg == g]
            assert got[g] == self._py_estimate(keys), g

    def test_merge_equals_rebuild_exactly_and_accuracy(self, spark):
        from pyspark.sql import functions as F

        from vectordb_bioinsight_spark.operators.sketches import (
            hll_replay_estimate,
            hll_replay_registers,
            merge_hll_replay_registers,
        )
        from vectordb_bioinsight_spark.sources.readers import load_table
        from tests.conftest import SF_SMALL

        ev = load_table(spark, SF_SMALL, "events").withColumn(
            "shard_day", F.to_date("ts")
        )
        merged = hll_replay_estimate(
            merge_hll_replay_registers(
                hll_replay_registers(ev, ["event_type", "shard_day"], "user_id"),
                ["event_type"],
            ),
            ["event_type"],
        )
        direct = hll_replay_estimate(
            hll_replay_registers(ev, ["event_type"], "user_id"), ["event_type"]
        )
        exact = {r["event_type"]: r["n"] for r in
                 ev.groupBy("event_type").agg(
                     F.count_distinct("user_id").alias("n")).collect()}
        m = {r["event_type"]: r["approx_distinct"] for r in merged.collect()}
        d = {r["event_type"]: r["approx_distinct"] for r in direct.collect()}
        assert m == d                       # merge == rebuild, bit-exact
        for k, e in exact.items():
            assert abs(d[k] - e) / e < 0.15, (k, d[k], e)

    def test_rolling_replay_matches_exact_window_envelope(self, spark):
        from pyspark.sql import functions as F

        from vectordb_bioinsight_spark.operators.trends import (
            rolling_active_users_replay,
        )

        # planted history: 40 days, user u{d}-{i} active on day d, plus a
        # stable cohort active every day
        rows = []
        for d in range(40):
            for i in range(30):
                rows.append((f"u{d}-{i}", d))
            for i in range(20):
                rows.append((f"stable-{i}", d))
        df = spark.createDataFrame(rows, "user string, d int").withColumn(
            "ts", F.expr("timestampadd(DAY, d, timestamp'2024-01-01')")
        )
        out = {str(r["day"]): r for r in rolling_active_users_replay(
            df, "user", "ts", window_days=7).collect()}
        assert len(out) == 40
        # day 10 window = days 4..10: 7*30 churned + 20 stable = 230 exact
        r = out["2024-01-11"]
        assert r["daily_active"] == 50
        assert abs(r["rolling_active"] - 230) / 230 < 0.15
        # first day window = just day 0: 50 exact
        r0 = out["2024-01-01"]
        assert abs(r0["rolling_active"] - 50) / 50 < 0.15
