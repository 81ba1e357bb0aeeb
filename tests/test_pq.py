"""Product-quantization operators (operators/pq.py): exactness in the
self-codebook limit, fold==GEMM equivalence, learned-codebook recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vectordb_bioinsight_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    pq_encode_gemm,
    pq_fixed_codebook,
    pq_train_kmeans,
)
from vectordb_bioinsight_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMALL, "embeddings")


def test_self_codebook_is_exact(spark):
    """With k == corpus size the codebook IS the corpus: every vector
    encodes to itself and ADC distance == exact L2² (rounded)."""
    rng = np.random.default_rng(7)
    # float32 first: array<float> storage truncates, and the codebook is
    # read back from storage — the expectation must use the same values
    vecs = [(i, [float(np.float32(x)) for x in rng.normal(size=8)]) for i in range(16)]
    df = spark.createDataFrame(vecs, "vid long, v array<float>")
    cb = pq_fixed_codebook(df, "vid", "v", m=2, k=16)
    codes = pq_encode(df, "vid", "v", cb)
    q = [float(np.float32(x)) for x in rng.normal(size=8)]
    got = {r["vid"]: r["adc_dist"] for r in pq_adc_topk(codes, "vid", "pq_code", cb, q, 16).collect()}
    arr = {i: np.asarray(v, dtype=np.float64) for i, v in vecs}
    qa = np.asarray(q)
    for i, v in arr.items():
        exact = round(
            round(((qa[:4] - v[:4]) ** 2).sum(), 6) + round(((qa[4:] - v[4:]) ** 2).sum(), 6),
            6,
        )
        assert abs(got[i] - exact) < 1e-9


def test_fold_and_gemm_encoders_agree(spark, emb):
    cb = pq_fixed_codebook(emb, "vec_id", "embedding", m=4, k=16)
    a = {r["vec_id"]: list(r["pq_code"]) for r in pq_encode(emb, "vec_id", "embedding", cb).collect()}
    b = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode_gemm(emb, "vec_id", "embedding", cb).collect()
    }
    assert a == b


def test_trained_codebook_beats_fixed_on_distortion(spark, emb):
    """Lloyd iterations must reduce total quantization distortion vs the
    arbitrary fixed codebook (the reason to train at all)."""
    fixed = pq_fixed_codebook(emb, "vec_id", "embedding", m=4, k=16)
    trained = pq_train_kmeans(emb, "vec_id", "embedding", m=4, k=16, iters=10)

    def distortion(cb):
        rows = emb.select("embedding").collect()
        X = np.asarray([r[0] for r in rows], dtype=np.float64)
        total = 0.0
        for i in range(4):
            sub = X[:, i * 16 : (i + 1) * 16]
            C = np.asarray(cb[i])
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            total += d2.min(axis=1).sum()
        return total

    assert distortion(trained) < distortion(fixed)


def test_adc_recall_monotone_in_subspaces(spark, emb):
    """Recall@10 vs exact L2 must not degrade as the code gets finer
    (more subspaces = less quantization error), with an absolute floor
    at m=16. The synthetic corpus is near-isotropic — the hardest case
    for PQ — so the floor is deliberately modest (measured 2/3/4)."""
    from vectordb_bioinsight_spark.operators.vector import knn_brute_force

    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = {
        r["vec_id"] for r in knn_brute_force(emb, "vec_id", "embedding", q, k=10, metric="l2").collect()
    }
    recalls = []
    for m in (4, 8, 16):
        cb = pq_train_kmeans(emb, "vec_id", "embedding", m=m, k=16, iters=10)
        codes = pq_encode_gemm(emb, "vec_id", "embedding", cb)
        approx = {
            r["vec_id"] for r in pq_adc_topk(codes, "vec_id", "pq_code", cb, q, 10).collect()
        }
        recalls.append(len(approx & exact))
    assert recalls == sorted(recalls), recalls
    assert recalls[-1] >= 3, recalls


def test_codebook_guards(spark, emb):
    with pytest.raises(ValueError, match="divisible"):
        pq_fixed_codebook(emb, "vec_id", "embedding", m=5, k=8)
    with pytest.raises(ValueError, match="ragged"):
        pq_encode(emb, "vec_id", "embedding", [[[0.0], [0.0, 1.0]]])
    cb = pq_fixed_codebook(emb, "vec_id", "embedding", m=4, k=4)
    with pytest.raises(ValueError, match="dim mismatch"):
        pq_adc_topk(emb.withColumn("pq_code", F.array(F.lit(0))), "vec_id", "pq_code", cb, [0.0] * 8)


def test_encode_plan_is_jvm_only(spark, emb):
    """The fold encoder must stay in whole-stage codegen (no Python)."""
    cb = pq_fixed_codebook(emb, "vec_id", "embedding", m=4, k=16)
    plan = pq_encode(emb, "vec_id", "embedding", cb)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_ivfpq_full_probe_equals_full_adc(spark, emb):
    """n_probe == n_cells degrades IVF-PQ to plain full-corpus ADC —
    routing must only restrict, never rescore."""
    from vectordb_bioinsight_spark.operators.pq import ivfpq_topk

    cb = pq_fixed_codebook(emb, "vec_id", "embedding", m=4, k=16)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 3).head()["embedding"]]
    codes = pq_encode(emb, "vec_id", "embedding", cb)
    full = [tuple(r) for r in pq_adc_topk(codes, "vec_id", "pq_code", cb, q, 10).collect()]
    ivf = [
        tuple(r)
        for r in ivfpq_topk(
            emb, "vec_id", "embedding", cb, q, n_cells=8, n_probe=8, k_top=10
        ).collect()
    ]
    assert ivf == full


def test_ivfpq_probe_subset_of_full(spark, emb):
    """Probed search returns ids drawn from the probed cells only, ranked
    by the same ADC distance as the full scan (recall can drop; scores of
    returned ids cannot change)."""
    from vectordb_bioinsight_spark.operators.pq import ivfpq_topk

    cb = pq_fixed_codebook(emb, "vec_id", "embedding", m=4, k=16)
    q = [float(x) for x in emb.filter(F.col("vec_id") == 3).head()["embedding"]]
    codes = pq_encode(emb, "vec_id", "embedding", cb)
    full = {r["vec_id"]: r["adc_dist"] for r in pq_adc_topk(codes, "vec_id", "pq_code", cb, q, 10_000).collect()}
    probed = ivfpq_topk(emb, "vec_id", "embedding", cb, q, n_cells=8, n_probe=2, k_top=10).collect()
    assert len(probed) == 10
    for r in probed:
        assert full[r["vec_id"]] == r["adc_dist"]


class TestSQ8:
    def test_codes_and_reconstruction(self, spark):
        """Extremes encode to 0/255, reconstruction error is bounded by
        half a quantization step per dim, constant dims encode to 0."""
        from vectordb_bioinsight_spark.operators.pq import sq8_quantize

        rows = [
            (1, [0.0, -1.0, 5.0]),
            (2, [1.0, 1.0, 5.0]),
            (3, [0.5, 0.0, 5.0]),
        ]
        df = spark.createDataFrame(rows, "id long, v array<double>")
        out = {r["id"]: r for r in sq8_quantize(df, "id", "v").collect()}
        assert out[1]["codes"][0] == 0 and out[2]["codes"][0] == 255
        assert out[1]["codes"][1] == 0 and out[2]["codes"][1] == 255
        assert out[3]["codes"][0] == 128  # 0.5 of the [0,1] range, rounded
        # constant dim 3: zero code, zero error contribution
        assert all(out[i]["codes"][2] == 0 for i in (1, 2, 3))
        # step = range/255; max per-dim error half a step -> mse tiny
        assert all(out[i]["mse"] <= (2.0 / 255 / 2) ** 2 + 1e-12 for i in (1, 2, 3))

    def test_roundtrip_error_on_real_embeddings(self, spark):
        from pyspark.sql import functions as F

        from tests.conftest import SF_SMALL
        from vectordb_bioinsight_spark.operators.pq import sq8_quantize
        from vectordb_bioinsight_spark.sources.readers import load_table

        emb = load_table(spark, SF_SMALL, "embeddings")
        out = sq8_quantize(emb, "vec_id", "embedding")
        stats = out.agg(F.max("mse").alias("mx"), F.count("*").alias("n")).first()
        assert stats["n"] == emb.count()
        assert stats["mx"] < 1e-4  # 8-bit over ~[-0.4, 0.4] ranges

    def test_adc_self_is_nearest(self, spark):
        from pyspark.sql import functions as F

        from tests.conftest import SF_SMALL
        from vectordb_bioinsight_spark.operators.pq import (
            sq8_adc_topk,
            sq8_quantize,
            sq8_ranges,
        )
        from vectordb_bioinsight_spark.sources.readers import load_table

        emb = load_table(spark, SF_SMALL, "embeddings")
        codes = sq8_quantize(emb, "vec_id", "embedding").select("id", "codes")
        ranges = sq8_ranges(emb, "embedding")
        query = emb.filter(F.col("vec_id") == 7).select(
            F.posexplode(F.col("embedding").cast("array<double>")).alias("d0", "qx")
        ).select((F.col("d0") + 1).alias("dim"), "qx")
        top = sq8_adc_topk(codes, ranges, query, k=5).orderBy("rank").collect()
        assert top[0]["id"] == 7           # self survives quantization
        assert top[0]["dist"] < 1e-3       # ~quantization noise only


class TestBinaryQuantization:
    def test_known_packing(self, spark):
        """Hand-checkable 3-row frame: median thresholds, bit layout, and
        word packing are exactly the documented (dim-1)%32 / (dim-1)//32
        arithmetic."""
        from vectordb_bioinsight_spark.operators.pq import binary_quantize

        # dim 1: values 0,1,2 -> median 1 -> only id 3 sets bit 0
        # dim 2: values 5,3,1 -> median 3 -> only id 1 sets bit 1
        # dim 33: bit 0 of word 1
        rows = [
            (1, [0.0, 5.0] + [0.0] * 30 + [9.0]),
            (2, [1.0, 3.0] + [0.0] * 30 + [9.0]),
            (3, [2.0, 1.0] + [0.0] * 30 + [0.0]),
        ]
        df = spark.createDataFrame(rows, "id long, v array<double>")
        out = {r["id"]: r for r in binary_quantize(df, "id", "v").collect()}
        assert out[1]["words"] == [2, 0] and out[1]["n_set"] == 1
        assert out[2]["words"] == [0, 0] and out[2]["n_set"] == 0
        # id 3: dim-1 bit set (x=2 > median 1); dim 33 is 0 == median 9? no:
        # median of (9,9,0) is 9 -> no bit
        assert out[3]["words"] == [1, 0] and out[3]["n_set"] == 1

    def test_median_balance(self, spark, emb):
        """Median thresholds keep the code balanced: mean popcount within
        ~15% of D/2 on the real embeddings."""
        from vectordb_bioinsight_spark.operators.pq import binary_quantize

        out = binary_quantize(emb, "vec_id", "embedding")
        avg = out.agg(F.avg("n_set")).first()[0]
        d = len(emb.select("embedding").first()[0])
        assert abs(avg - d / 2) < 0.15 * d

    def test_hamming_self_is_zero_and_recall(self, spark, emb):
        """Self has Hamming 0; the two-stage search's top-10 overlaps the
        exact cosine top-10 well above chance (sign codes keep coarse
        geometry)."""
        from vectordb_bioinsight_spark.operators.pq import (
            binary_quantize,
            binary_thresholds,
            binq_search,
            hamming_topk,
        )
        from vectordb_bioinsight_spark.operators.vector import knn_brute_force

        thresholds = binary_thresholds(emb, "embedding")
        codes = binary_quantize(emb, "vec_id", "embedding", thresholds).select(
            "id", "words"
        )
        qw = codes.filter(F.col("id") == 0).select(
            F.posexplode("words").alias("word", "qw")
        )
        ham = hamming_topk(codes, qw, k=5).orderBy("rank").collect()
        assert ham[0]["id"] == 0 and ham[0]["hamming"] == 0

        query = (
            emb.filter(F.col("vec_id") == 0)
            .select(
                F.posexplode(F.col("embedding").cast("array<double>")).alias(
                    "d0", "qx"
                )
            )
            .select((F.col("d0") + 1).alias("dim"), "qx")
        )
        approx = binq_search(
            emb, "vec_id", "embedding", codes, qw, query, k=10, shortlist=60
        )
        qvec = emb.filter(F.col("vec_id") == 0).first()["embedding"]
        exact = knn_brute_force(emb, "vec_id", "embedding", list(qvec), k=10)
        a = {r["id"] for r in approx.collect()}
        e = {r[0] for r in exact.select(exact.columns[0]).collect()}
        assert len(a & e) >= 5  # >= 50% recall@10 at 500 vectors

    def test_codes_scan_reads_words_only(self, spark, emb):
        """The Hamming stage's scan must not touch the raw vector column
        once codes are materialized (the D/8-byte point of the layout)."""
        from vectordb_bioinsight_spark.operators.pq import (
            binary_quantize,
            hamming_topk,
        )

        codes = binary_quantize(emb, "vec_id", "embedding").select("id", "words")
        codes.write.mode("overwrite").parquet("/tmp/binq_codes_test")
        stored = spark.read.parquet("/tmp/binq_codes_test")
        qw = stored.filter(F.col("id") == 0).select(
            F.posexplode("words").alias("word", "qw")
        )
        df = hamming_topk(stored, qw, k=10)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "embedding" not in plan


def test_binary_encode_inline_equals_relational(spark, emb):
    """The scan-local inlined-threshold encoder produces byte-identical
    words to the relational (oracle-twin) path, and its plan has ZERO
    exchanges."""
    import re

    from vectordb_bioinsight_spark.operators.pq import (
        binary_encode_inline,
        binary_quantize,
        binary_thresholds,
    )

    th = binary_thresholds(emb, "embedding")
    mu = [r["mu"] for r in th.orderBy("dim").collect()]
    inline = binary_encode_inline(emb, "vec_id", "embedding", mu)
    rel = binary_quantize(emb, "vec_id", "embedding", th).select("id", "words")
    a = {r["id"]: r["words"] for r in inline.collect()}
    b = {r["id"]: r["words"] for r in rel.collect()}
    assert a == b
    plan = inline._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE)) == 0
