"""ANN recall measurement: exactness at full probe, monotonicity in n_probe."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vectordb_bioinsight_spark.operators.vector import (
    ann_recall_at_k,
    ivf_build_index,
    ivf_search,
    knn_join,
)
from vectordb_bioinsight_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def recall_setup(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = knn_join(queries, emb, "vec_id", "vec_id", "embedding", k=10)
    index = ivf_build_index(emb, "vec_id", "embedding", n_cells=8, seed=42)
    return emb, queries, exact, index


def _mean_recall(df):
    rows = df.collect()
    return sum(r["recall"] for r in rows) / len(rows), rows


def test_full_probe_is_exact(recall_setup):
    _emb, queries, exact, index = recall_setup
    approx = ivf_search(index, queries, "vec_id", "embedding", k=10, n_probe=8)
    mean, rows = _mean_recall(ann_recall_at_k(exact, approx, k=10))
    assert mean == 1.0
    assert all(r["n_exact"] == 10 and r["n_hit"] == 10 for r in rows)


def test_recall_monotone_in_probes(recall_setup):
    _emb, queries, exact, index = recall_setup
    means = []
    for n_probe in (1, 2, 4, 8):
        approx = ivf_search(index, queries, "vec_id", "embedding", k=10, n_probe=n_probe)
        mean, _ = _mean_recall(ann_recall_at_k(exact, approx, k=10))
        means.append(mean)
    assert means == sorted(means), f"recall not monotone: {means}"
    assert means[0] > 0.0


def test_recall_counts_misses(spark):
    exact = spark.createDataFrame(
        [(0, i, i + 1) for i in range(10)], "query_id long, cand_id long, rank int"
    )
    approx = spark.createDataFrame(
        [(0, i, i + 1) for i in range(5)] + [(0, 100 + i, 6 + i) for i in range(5)],
        "query_id long, cand_id long, rank int",
    )
    row = ann_recall_at_k(exact, approx, k=10).collect()[0]
    assert (row["n_exact"], row["n_hit"], row["recall"]) == (10, 5, 0.5)


def test_retrieval_metrics_hand_computed(spark):
    import math

    from vectordb_bioinsight_spark.operators.fusion import retrieval_metrics

    results = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3), (1, 20, 1), (1, 21, 2)],
        "query_id long, cand_id long, rank int",
    )
    relevance = spark.createDataFrame(
        # q0: rel docs 11 (rank 2) and 99 (missed); q1: none relevant
        [(0, 11, 1.0), (0, 99, 1.0)],
        "query_id long, cand_id long, rel double",
    )
    rows = {r["query_id"]: r for r in retrieval_metrics(results, relevance, k=3).collect()}
    dcg = 1.0 / math.log2(3)          # hit at rank 2
    idcg = 1.0 + 1.0 / math.log2(3)   # two rel docs at ideal ranks 1,2
    assert rows[0]["dcg"] == round(dcg, 6)
    assert rows[0]["idcg"] == round(idcg, 6)
    assert rows[0]["ndcg"] == round(dcg / idcg, 6)
    assert rows[0]["mrr"] == 0.5
    assert rows[0]["precision_k"] == round(1 / 3, 6)
    assert rows[1]["ndcg"] == 0.0 and rows[1]["n_rel"] == 0


def test_retrieval_metrics_nrel_uncapped_and_dup_judgments(spark):
    """n_rel reports the query's TOTAL relevant-doc count (not min(n_rel, k)),
    and duplicate (query_id, cand_id) judgment rows must not fan out the
    results join or inflate dcg/precision."""
    import math

    from vectordb_bioinsight_spark.operators.fusion import retrieval_metrics

    results = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], "query_id long, cand_id long, rank int"
    )
    relevance = spark.createDataFrame(
        # doc 10 judged TWICE (rel 1.0 then 2.0) + three unseen rel docs ->
        # n_rel = 4 despite k=2; dup row must collapse to max(rel)=2.0
        [(0, 10, 1.0), (0, 10, 2.0), (0, 97, 1.0), (0, 98, 1.0), (0, 99, 1.0)],
        "query_id long, cand_id long, rel double",
    )
    row = retrieval_metrics(results, relevance, k=2).collect()[0]
    assert row["n_rel"] == 4
    assert row["dcg"] == round(2.0 / math.log2(2), 6)  # one hit, max-rel gain
    assert row["idcg"] == round(2.0 + 1.0 / math.log2(3), 6)
    assert row["precision_k"] == 0.5
    assert row["mrr"] == 1.0


class TestMMR:
    def _fixture(self, spark):
        """3 candidates for one query: A most relevant; B nearly identical
        to A; C less relevant but orthogonal. MMR must pick A then C —
        pure relevance would pick A then B."""
        cands = spark.createDataFrame(
            [(0, 1, 0.9), (0, 2, 0.85), (0, 3, 0.5)],
            "query_id long, cand_id long, rel double",
        )
        sims = spark.createDataFrame(
            [
                (0, 1, 2, 0.99), (0, 2, 1, 0.99),
                (0, 1, 3, 0.0), (0, 3, 1, 0.0),
                (0, 2, 3, 0.0), (0, 3, 2, 0.0),
            ],
            "query_id long, id_a long, id_b long, sim double",
        )
        return cands, sims

    def test_greedy_semantics_hand_computed(self, spark):
        from vectordb_bioinsight_spark.operators.fusion import mmr_select

        cands, sims = self._fixture(spark)
        out = {
            r["pick_rank"]: (r["cand_id"], r["mmr_score"])
            for r in mmr_select(cands, sims, lam=0.7, k=3).collect()
        }
        # step1: A (0.7*0.9=0.63); step2: B scores 0.7*0.85-0.3*0.99=0.298
        # < C 0.7*0.5-0.3*0=0.35 -> C; step3: B (0.298)
        assert out[1] == (1, 0.63)
        assert out[2] == (3, 0.35)
        assert out[3] == (2, round(0.7 * 0.85 - (1.0 - 0.7) * 0.99, 7))

    def test_unrolled_equals_grouped(self, spark):
        """Plan-unrolled greedy == applyInPandas greedy on the embeddings
        candidate pools (the catalog shape)."""
        from vectordb_bioinsight_spark.operators.fusion import (
            mmr_select,
            mmr_select_grouped,
            pairwise_candidate_sims,
        )
        from vectordb_bioinsight_spark.operators.vector import knn_join

        emb = load_table(spark, SF_SMALL, "embeddings")
        queries = emb.filter(F.col("vec_id").isin(0, 1, 2))
        cands = knn_join(queries, emb, "vec_id", "vec_id", "embedding", k=15)
        with_vecs = cands.join(
            emb.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("vec")),
            "cand_id",
        )
        sims = pairwise_candidate_sims(with_vecs, "query_id", "cand_id", "vec")
        rel = cands.withColumnRenamed("score", "rel")
        a = sorted(map(tuple, mmr_select(rel, sims, k=5).collect()))
        b = sorted(map(tuple, mmr_select_grouped(rel, sims, k=5).collect()))
        assert a == b

    def test_fewer_candidates_than_k(self, spark):
        from vectordb_bioinsight_spark.operators.fusion import mmr_select

        cands, sims = self._fixture(spark)
        out = mmr_select(cands, sims, k=5).collect()
        assert sorted(r["pick_rank"] for r in out) == [1, 2, 3]


def test_ivf_append_matches_rebuild_assignment(spark):
    """Appending vectors to an existing IVF index assigns them to exactly
    the cells a full re-assignment (same centroids) would pick, and the
    appended index searches identically to an index built over the full
    corpus with those centroids."""
    from vectordb_bioinsight_spark.operators.vector import (
        ivf_append,
        ivf_build_index,
        ivf_search,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    old = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    assigned, cents = ivf_build_index(old, "vec_id", "embedding", n_cells=8)

    appended, _ = ivf_append((assigned, cents), new, "vec_id", "embedding")
    # reassign the FULL corpus against the same centroids via ivf_append
    # on an empty base — the pure assignment rule
    empty = assigned.limit(0)
    full_assign, _ = ivf_append((empty, cents), emb, "vec_id", "embedding")
    a = {r["cand_id"]: r["_cell"] for r in appended.collect()}
    b = {r["cand_id"]: r["_cell"] for r in full_assign.collect()}
    # old rows keep their original (model.transform) cells; appended rows
    # must match the rule-based reassignment
    assert a == b

    q = emb.filter(F.col("vec_id") == 3)
    s1 = ivf_search((appended, cents), q, "vec_id", "embedding", k=5, n_probe=8)
    s2 = ivf_search((full_assign, cents), q, "vec_id", "embedding", k=5, n_probe=8)
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))


def test_contrastive_triplets_contract(spark):
    """Every triplet pairs a labeled positive with a top-k hard negative;
    margins exist iff the positive was inside the candidate pool."""
    from vectordb_bioinsight_spark.operators.vector import contrastive_triplets

    cands = spark.createDataFrame(
        [  # query 1 pool: 10 (pos, in pool), 20, 21 (negs)
            (1, 10, 0.9), (1, 20, 0.8), (1, 21, 0.7),
        ],
        "query_id long, cand_id long, score double",
    )
    pos = spark.createDataFrame(
        [(1, 10), (1, 11)],  # 11 is a positive OUTSIDE the pool
        "query_id long, cand_id long",
    )
    rows = contrastive_triplets(cands, pos, k_neg=2).collect()
    trips = {(r["pos_id"], r["neg_id"]): r for r in rows}
    # 2 positives x 2 negatives
    assert set(trips) == {(10, 20), (10, 21), (11, 20), (11, 21)}
    assert trips[(10, 20)]["margin"] == 0.1 and trips[(10, 21)]["margin"] == 0.2
    assert trips[(11, 20)]["margin"] is None  # pooled-out positive
    assert trips[(10, 20)]["neg_rank"] == 1 and trips[(10, 21)]["neg_rank"] == 2


class TestWhitening:
    def test_output_covariance_is_identity(self, spark):
        import numpy as np

        from tests.conftest import SF_SMALL
        from vectordb_bioinsight_spark.operators.vector import whiten_embeddings
        from vectordb_bioinsight_spark.sources.readers import load_table

        emb = load_table(spark, SF_SMALL, "embeddings")
        out = whiten_embeddings(emb, "vec_id", "embedding")
        Y = np.stack([r["vec"] for r in out.collect()])
        assert Y.shape[0] == emb.count()
        cov = np.cov(Y, rowvar=False, bias=True)
        assert np.abs(cov - np.eye(Y.shape[1])).max() < 0.05

    def test_truncation_keeps_principal_directions(self, spark):
        """out_dim keeps the TOP-variance directions: truncating a
        planted 3+noise-dim space to 3 dims must preserve ~all variance."""
        import numpy as np

        from vectordb_bioinsight_spark.operators.vector import whiten_embeddings

        rng = np.random.default_rng(5)
        Z = rng.normal(size=(400, 3)) @ (10.0 * rng.normal(size=(3, 8)))
        Z += 0.01 * rng.normal(size=(400, 8))
        df = spark.createDataFrame(
            [(i, z.tolist()) for i, z in enumerate(Z)], "id long, v array<double>"
        )
        out = whiten_embeddings(df, "id", "v", out_dim=3)
        Y = np.stack([r["vec"] for r in out.collect()])
        assert Y.shape == (400, 3)
        # whitened coords are ~unit variance in the kept directions
        assert np.abs(Y.var(axis=0) - 1.0).max() < 0.2

    def test_partitioning_invariance_tolerance(self, spark):
        """1 vs 8 partitions agree within float tolerance (the documented
        rows-only trade)."""
        import numpy as np

        from tests.conftest import SF_SMALL
        from vectordb_bioinsight_spark.operators.vector import whiten_embeddings
        from vectordb_bioinsight_spark.sources.readers import load_table

        emb = load_table(spark, SF_SMALL, "embeddings")
        a = {
            r["id"]: np.asarray(r["vec"])
            for r in whiten_embeddings(emb.coalesce(1), "vec_id", "embedding").collect()
        }
        b = {
            r["id"]: np.asarray(r["vec"])
            for r in whiten_embeddings(emb.repartition(8), "vec_id", "embedding").collect()
        }
        diffs = [np.abs(a[k] - b[k]).max() for k in a]
        assert max(diffs) < 1e-6


class TestMaxSimIVF:
    def _fixture(self, spark):
        from tests.conftest import SF_SMALL
        from vectordb_bioinsight_spark.sources.readers import load_table

        emb = load_table(spark, SF_SMALL, "embeddings")
        docs = emb.select(
            (F.col("vec_id") / 25).cast("long").alias("doc"), "embedding"
        )
        q = emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("qtok"), "embedding"
        )
        return docs, q

    def test_full_probe_equals_exact_maxsim(self, spark):
        from vectordb_bioinsight_spark.operators.vector import (
            maxsim_ivf,
            maxsim_topk,
        )

        docs, q = self._fixture(spark)
        exact = [tuple(r) for r in maxsim_topk(docs, q, "doc", "embedding", k=10).collect()]
        full = [
            tuple(r)
            for r in maxsim_ivf(
                docs, q, "doc", "embedding", n_cells=8, n_probe=8, k=10
            ).collect()
        ]
        assert full == exact

    def test_frozen_centroids_full_probe_equals_exact(self, spark):
        """The SQL-replayable frozen-centroid mode must inherit the same
        contract: probing every cell degrades to exact MaxSim regardless
        of which vectors serve as centroids."""
        from vectordb_bioinsight_spark.operators.vector import (
            maxsim_ivf,
            maxsim_topk,
        )
        from vectordb_bioinsight_spark.sources.readers import load_table

        docs, q = self._fixture(spark)
        emb = load_table(spark, SF_SMALL, "embeddings")
        cent = emb.filter(
            (F.col("vec_id") >= 100) & (F.col("vec_id") < 108)
        ).select(
            (F.col("vec_id") - 100).cast("int").alias("_cell"),
            F.col("embedding").cast("array<double>").alias("_centroid"),
        )
        exact = [
            tuple(r)
            for r in maxsim_topk(docs, q, "doc", "embedding", k=10).collect()
        ]
        frozen_full = [
            tuple(r)
            for r in maxsim_ivf(
                docs, q, "doc", "embedding",
                n_cells=8, n_probe=8, k=10, centroids=cent,
            ).collect()
        ]
        assert frozen_full == exact

    def test_prebuilt_index_equals_oneshot(self, spark):
        """index=(assigned, cent_df) must produce exactly the one-shot
        result — assignment is build cost, not a semantic knob."""
        from vectordb_bioinsight_spark.operators.vector import (
            ivf_build_index,
            maxsim_ivf,
        )

        docs, q = self._fixture(spark)
        oneshot = [
            tuple(r)
            for r in maxsim_ivf(
                docs, q, "doc", "embedding", n_cells=8, n_probe=3, k=10
            ).collect()
        ]
        assigned, cent_df = ivf_build_index(docs, "doc", "embedding", n_cells=8)
        prebuilt = [
            tuple(r)
            for r in maxsim_ivf(
                docs, q, "doc", "embedding", n_probe=3, k=10,
                index=(assigned, cent_df),
            ).collect()
        ]
        assert prebuilt == oneshot

    def test_pruned_probe_recall_floor(self, spark):
        from vectordb_bioinsight_spark.operators.vector import (
            maxsim_ivf,
            maxsim_topk,
        )

        docs, q = self._fixture(spark)
        exact = {r["doc"] for r in maxsim_topk(docs, q, "doc", "embedding", k=10).collect()}
        pruned = {
            r["doc"]
            for r in maxsim_ivf(
                docs, q, "doc", "embedding", n_cells=8, n_probe=3, k=10
            ).collect()
        }
        # multi-token queries probe the union of cells — recall stays high
        assert len(pruned & exact) >= 5


def test_replay_oversized_centroids_raise(spark):
    """ADVICE r08: ivf_search_replay collects AND inlines the centroid
    frame as expression literals; an unbounded codebook must raise rather
    than silently pull onto the driver / blow the codegen budget."""
    from vectordb_bioinsight_spark.operators.semdedup import MAX_INLINE_CENTROIDS
    from vectordb_bioinsight_spark.operators.vector import ivf_search_replay

    emb = load_table(spark, SF_SMALL, "embeddings")
    big_cents = emb.limit(MAX_INLINE_CENTROIDS + 1).select(
        F.col("vec_id").cast("int").alias("_cell"),
        F.col("embedding").cast("array<double>").alias("_centroid"),
    )
    with pytest.raises(ValueError, match="inlines centroids"):
        ivf_search_replay(
            emb, emb.limit(2), "vec_id", "vec_id", "embedding", big_cents
        )
