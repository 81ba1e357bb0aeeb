"""Deterministic sampling/splitting operators (training-data-pipeline tier):
stability under repartitioning, leak-free splits, rate accuracy, bottom-k
reservoir semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vectordb_bioinsight_spark.operators.sampling import (
    hash_sample,
    hash_split,
    reservoir_per_group,
    stratified_hash_sample,
)
from vectordb_bioinsight_spark.sources.readers import load_table


def test_hash_sample_stable_under_repartition(spark):
    df = spark.range(0, 20_000).select(F.col("id").alias("k"))
    a = {r["k"] for r in hash_sample(df, "k", 0.2, salt=5).collect()}
    b = {r["k"] for r in hash_sample(df.repartition(17), "k", 0.2, salt=5).collect()}
    assert a == b
    # rate within 2% absolute of the target on 20k keys
    assert abs(len(a) / 20_000 - 0.2) < 0.02


def test_hash_sample_incremental_consistency(spark):
    """New data samples consistently: the sample of a union equals the union
    of samples — the property RNG sampling lacks."""
    old = spark.range(0, 5_000).select(F.col("id").alias("k"))
    new = spark.range(5_000, 8_000).select(F.col("id").alias("k"))
    both = hash_sample(old.union(new), "k", 0.1, salt=2)
    parts = hash_sample(old, "k", 0.1, salt=2).union(hash_sample(new, "k", 0.1, salt=2))
    assert {r["k"] for r in both.collect()} == {r["k"] for r in parts.collect()}


def test_salt_decorrelates_samples(spark):
    df = spark.range(0, 10_000).select(F.col("id").alias("k"))
    a = {r["k"] for r in hash_sample(df, "k", 0.1, salt=0).collect()}
    b = {r["k"] for r in hash_sample(df, "k", 0.1, salt=99).collect()}
    overlap = len(a & b) / max(len(a), 1)
    assert 0.0 < overlap < 0.25  # ~10% expected for independent samples


def test_stratified_rates(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    out = stratified_hash_sample(docs, "doc_id", "lang", {"en": 0.5}, default_fraction=0.1)
    full = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(got.get("en", 0) / full["en"] - 0.5) < 0.1
    for lang, n in full.items():
        if lang != "en" and n >= 50:
            assert got.get(lang, 0) / n < 0.3


def test_hash_split_partitions_every_key_once(spark):
    df = spark.range(0, 10_000).select(F.col("id").alias("k"))
    out = hash_split(df, "k", [0.8, 0.1, 0.1], ["train", "val", "test"], salt=3)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 10_000  # exhaustive and disjoint by construction
    assert abs(counts["train"] / 10_000 - 0.8) < 0.02


def test_reservoir_fixed_size_and_stable(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    out = reservoir_per_group(docs, ["source"], "doc_id", n_per_group=3, salt=1)
    sizes = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 3 for n in sizes.values())
    again = reservoir_per_group(docs.repartition(13), ["source"], "doc_id", 3, salt=1)
    assert {tuple(r) for r in out.select("source", "doc_id").collect()} == {
        tuple(r) for r in again.select("source", "doc_id").collect()
    }


def test_quantized_cosine_recall(spark):
    """int8 symmetric quantization keeps cosine ranking: top-10 by quantized
    cosine overlaps >=8/10 with the float top-10, and round-trip error is
    bounded by scale/254 per component."""
    from vectordb_bioinsight_spark.functions.vector import (
        dequantize_int8,
        dot_product,
        l2_norm,
        max_abs,
        quantize_int8,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    q = emb.select(
        "vec_id",
        "embedding",
        max_abs("embedding").alias("s"),
        quantize_int8("embedding", max_abs("embedding")).alias("qv"),
    )
    # round-trip error bound: |x - deq(q(x))| <= s/254 (half a quant step)
    err = q.select(
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                dequantize_int8("qv", "s"),
                lambda x, y: F.abs(x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda a, v: F.greatest(a, v),
        ).alias("max_err"),
        (F.col("s") / 254.0 + 1e-12).alias("bound"),
    )
    assert err.filter(F.col("max_err") > F.col("bound")).count() == 0

    qrow = q.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("fq"), F.col("qv").alias("qq")
    )
    pairs = q.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(qrow))
    fscore = dot_product("embedding", "fq") / (l2_norm("embedding") * l2_norm("fq"))
    qscore = dot_product("qv", "qq") / (l2_norm("qv") * l2_norm("qq"))
    top_f = [r["vec_id"] for r in pairs.select("vec_id", fscore.alias("s"))
             .orderBy(F.desc("s"), F.asc("vec_id")).limit(10).collect()]
    top_q = [r["vec_id"] for r in pairs.select("vec_id", qscore.alias("s"))
             .orderBy(F.desc("s"), F.asc("vec_id")).limit(10).collect()]
    assert len(set(top_f) & set(top_q)) >= 8


def test_sample_rate_check_ratio(spark):
    import pytest

    from vectordb_bioinsight_spark.operators.sampling import hash_sample, sample_rate_check

    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    sampled = hash_sample(df, "k", fraction=0.2)
    ratio = sample_rate_check(sampled, total_rows=10_000, fraction=0.2).first()["rate_ratio"]
    assert ratio == pytest.approx(1.0, abs=0.05)
    with pytest.raises(ValueError):
        sample_rate_check(sampled, total_rows=0, fraction=0.2)


def test_perplexity_buckets_total_order_and_quota(spark):
    """ntile tiers are equal-size (±1), deterministic under repartition,
    and `kept` drops exactly the worst tier."""
    from vectordb_bioinsight_spark.operators.sampling import perplexity_bucket_select

    rows = [(i, "en" if i % 2 == 0 else "fr", float(100 + i)) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, ppl double")
    out = perplexity_bucket_select(df, "lang", "ppl", "doc_id", 3, 2)
    got = {r["doc_id"]: (r["ppl_bucket"], r["kept"]) for r in out.collect()}
    # 10 docs per lang -> tiers of 4/3/3; lowest-ppl docs land in tier 1
    en = sorted(i for i in range(20) if i % 2 == 0)
    assert [got[i][0] for i in en] == [1, 1, 1, 1, 2, 2, 2, 3, 3, 3]
    assert all(got[i][1] == (got[i][0] <= 2) for i in range(20))
    # stable under repartition (total order via the id tie-break)
    got2 = {
        r["doc_id"]: (r["ppl_bucket"], r["kept"])
        for r in perplexity_bucket_select(
            df.repartition(7), "lang", "ppl", "doc_id", 3, 2
        ).collect()
    }
    assert got == got2


class TestWeightedHashSample:
    def test_high_weight_rows_dominate(self, spark):
        from vectordb_bioinsight_spark.operators.sampling import weighted_hash_sample

        rows = [(i, 1_000_000.0 if i < 5 else 0.001) for i in range(200)]
        df = spark.createDataFrame(rows, "id long, w double")
        got = {r["id"] for r in weighted_hash_sample(df, "id", "w", k=5).collect()}
        assert got == {0, 1, 2, 3, 4}

    def test_deterministic_under_repartition(self, spark):
        from vectordb_bioinsight_spark.operators.sampling import weighted_hash_sample

        rows = [(i, float(1 + i % 7)) for i in range(500)]
        df = spark.createDataFrame(rows, "id long, w double")
        a = [tuple(r) for r in weighted_hash_sample(df, "id", "w", k=40).collect()]
        b = [tuple(r) for r in weighted_hash_sample(df.repartition(13), "id", "w", k=40).collect()]
        assert a == b

    def test_nonpositive_weights_excluded(self, spark):
        from vectordb_bioinsight_spark.operators.sampling import weighted_hash_sample

        df = spark.createDataFrame([(1, 0.0), (2, -3.0), (3, 2.0)], "id long, w double")
        got = [r["id"] for r in weighted_hash_sample(df, "id", "w", k=10).collect()]
        assert got == [3]


class TestNeymanAllocation:
    def test_allocation_proportional_to_n_times_std(self, spark):
        """Two equal-size strata, one with 4x the std, gets ~4x the
        seats; caps at stratum size; single-row strata get floor 1."""
        import random

        from vectordb_bioinsight_spark.operators.sampling import (
            neyman_allocation,
        )

        rng = random.Random(3)
        rows = (
            [("lo", i, 100 + rng.uniform(-1, 1)) for i in range(500)]
            + [("hi", 1000 + i, 100 + rng.uniform(-4, 4)) for i in range(500)]
            + [("solo", 9999, 5.0)]
        )
        df = spark.createDataFrame(rows, "s string, id long, v double")
        out = {r["s"]: r for r in neyman_allocation(df, ["s"], "v", 100).collect()}
        assert out["solo"]["n_alloc"] == 1          # floor
        ratio = out["hi"]["n_alloc"] / out["lo"]["n_alloc"]
        assert 3.0 < ratio < 5.5                    # ~4x
        # tiny stratum cap: budget larger than a stratum cannot oversample
        out2 = {r["s"]: r for r in neyman_allocation(df, ["s"], "v", 10_000).collect()}
        assert out2["hi"]["n_alloc"] <= 500 and out2["lo"]["n_alloc"] <= 500

    def test_sample_matches_allocation_and_is_deterministic(self, spark):
        from vectordb_bioinsight_spark.operators.sampling import (
            neyman_allocation,
            sample_by_allocation,
        )

        rows = [("a", i, float(i % 7)) for i in range(300)] + [
            ("b", 1000 + i, float(i % 31)) for i in range(300)
        ]
        df = spark.createDataFrame(rows, "s string, id long, v double")
        alloc = neyman_allocation(df, ["s"], "v", 50)
        want = {r["s"]: r["n_alloc"] for r in alloc.collect()}
        s1 = sample_by_allocation(df, alloc, ["s"], "id", salt=5)
        got = {
            r["s"]: r["n"]
            for r in s1.groupBy("s").agg(F.count("*").alias("n")).collect()
        }
        assert got == want
        ids1 = sorted(r["id"] for r in s1.collect())
        ids2 = sorted(
            r["id"]
            for r in sample_by_allocation(
                df.repartition(13), alloc, ["s"], "id", salt=5
            ).collect()
        )
        assert ids1 == ids2  # repartition-invariant draw
