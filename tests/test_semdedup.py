"""SemDeDup semantic dedup: planted near-duplicate recovery + determinism."""

from __future__ import annotations

import numpy as np
import pytest

from vectordb_bioinsight_spark.operators.semdedup import (
    assign_fixed_centroids,
    semdedup_flags,
    semdedup_pairs,
    semdedup_survivors,
)


@pytest.fixture(scope="module")
def planted_vectors(spark):
    """60 unit-ish vectors in 16 dims: 50 random bases + 10 near-copies of
    bases 0-9 (tiny seeded jitter, cosine > 0.99 to their source)."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(50, 16))
    dups = base[:10] + rng.normal(scale=0.01, size=(10, 16))
    vecs = np.vstack([base, dups])
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(60)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_assignment_deterministic_and_total(planted_vectors):
    a1 = assign_fixed_centroids(planted_vectors, "vec_id", "embedding", 4)
    a2 = assign_fixed_centroids(planted_vectors, "vec_id", "embedding", 4)
    rows1 = {r["vec_id"]: (r["cluster_id"], r["centroid_cos"]) for r in a1.collect()}
    rows2 = {r["vec_id"]: (r["cluster_id"], r["centroid_cos"]) for r in a2.collect()}
    assert rows1 == rows2
    assert len(rows1) == 60
    # centroids assign to themselves with cosine 1.0
    for cid in range(4):
        assert rows1[cid] == (cid, 1.0)


def test_planted_dups_pruned(planted_vectors):
    # a near-copy and its source always share a cluster (cosine ~1 to the
    # same centroid), so every planted dup must lose to its min-id source
    flags = {
        r["vec_id"]: r["keep"]
        for r in semdedup_flags(
            planted_vectors, "vec_id", "embedding", n_clusters=4, min_cosine=0.95
        ).collect()
    }
    assert all(not flags[i] for i in range(50, 60)), "planted dups must be dropped"
    assert all(flags[i] for i in range(10)), "min-id sources must survive"

    surv = semdedup_survivors(
        planted_vectors, "vec_id", "embedding", n_clusters=4, min_cosine=0.95
    )
    kept = {r["vec_id"] for r in surv.collect()}
    assert kept == {i for i, k in flags.items() if k}


def test_pairs_are_within_cluster_upper_triangle(planted_vectors):
    assigned = assign_fixed_centroids(planted_vectors, "vec_id", "embedding", 4)
    cluster = {r["vec_id"]: r["cluster_id"] for r in assigned.collect()}
    pairs = semdedup_pairs(
        planted_vectors, "vec_id", "embedding", n_clusters=4, min_cosine=0.95
    ).collect()
    assert len(pairs) >= 10
    for r in pairs:
        assert r["id1"] < r["id2"]
        assert cluster[r["id1"]] == cluster[r["id2"]]
        assert r["cosine"] >= 0.95


def test_centroid_bound_enforced(planted_vectors):
    with pytest.raises(ValueError):
        assign_fixed_centroids(planted_vectors, "vec_id", "embedding", 1000)


def test_pairs_from_assigned_matches_fixed(planted_vectors):
    from vectordb_bioinsight_spark.operators.semdedup import semdedup_pairs_from_assigned

    assigned = assign_fixed_centroids(planted_vectors, "vec_id", "embedding", 4)
    via_assigned = semdedup_pairs_from_assigned(
        assigned, "vec_id", "embedding", "cluster_id", min_cosine=0.95
    )
    direct = semdedup_pairs(
        planted_vectors, "vec_id", "embedding", n_clusters=4, min_cosine=0.95
    )
    assert sorted(map(tuple, via_assigned.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_gemm_path_matches_fold_path(planted_vectors):
    from vectordb_bioinsight_spark.operators.semdedup import (
        semdedup_survivors,
        semdedup_survivors_gemm,
    )

    # 0.95 threshold sits far from any pair's cosine in the fixture, so the
    # BLAS-vs-fold last-ulp difference cannot flip a decision
    fold = semdedup_survivors(planted_vectors, "vec_id", "embedding", 4, 0.95)
    gemm = semdedup_survivors_gemm(planted_vectors, "vec_id", "embedding", 4, 0.95)
    assert sorted(r["vec_id"] for r in fold.collect()) == sorted(
        r["vec_id"] for r in gemm.collect()
    )


def test_gemm_chunking_exact(planted_vectors):
    from vectordb_bioinsight_spark.operators.semdedup import (
        assign_fixed_centroids,
        semdedup_losers_gemm,
    )

    assigned = assign_fixed_centroids(planted_vectors, "vec_id", "embedding", 4)
    big = semdedup_losers_gemm(assigned, "vec_id", "embedding", min_cosine=0.95)
    small = semdedup_losers_gemm(
        assigned, "vec_id", "embedding", min_cosine=0.95, chunk=3
    )
    assert sorted(r["vec_id"] for r in big.collect()) == sorted(
        r["vec_id"] for r in small.collect()
    )
