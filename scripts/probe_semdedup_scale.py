#!/usr/bin/env python
"""Scale probe: semdedup cluster-count rule at 1M vectors (SCALING.md row).

Measures the within-cluster candidate-pair total and wall time of the
learned-codebook semdedup route (`semdedup_survivors_auto`) with k chosen by
`scale_aware_n_clusters`, against the fixed-k assignment the bench-SF path
uses — demonstrating that k ∝ N keeps the quadratic step's pair budget
linear in corpus size while fixed k lets it blow up.

Usage: python scripts/probe_semdedup_scale.py [n_vectors] [dim]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.semdedup import (
    scale_aware_n_clusters,
    semdedup_losers_gemm,
)
from vectordb_bioinsight_spark.operators.vector import ivf_build_index
from vectordb_bioinsight_spark.session import get_session


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_session("probe-semdedup-scale", cpus=32)

    # deterministic synthetic corpus: hash-uniform coordinates (sin() of the
    # row id is near-rank-1 — almost every pair passes 0.95 cosine, which
    # degenerates the probe); ids ...99 are near-copies of their predecessor
    src = F.when(F.col("id") % 100 == 99, F.col("id") - 1).otherwise(F.col("id"))
    coord = lambda i: (  # noqa: E731
        (F.xxhash64(src * F.lit(dim) + i) % 10_000) / 10_000.0
        + F.when(F.col("id") % 100 == 99, F.lit(1e-5)).otherwise(F.lit(0.0))
    )
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(1), F.lit(dim)), coord).alias("embedding"),
    )

    def pair_total(assigned) -> int:
        sizes = assigned.groupBy("_cell").agg(F.count("*").alias("m")).collect()
        return sum(r["m"] * (r["m"] - 1) // 2 for r in sizes)

    for label, k in (
        ("rule k=N/1024", scale_aware_n_clusters(n, 1024)),
        ("fixed k=64", 64),
    ):
        t0 = time.perf_counter()
        assigned, _ = ivf_build_index(
            base, "vec_id", "embedding", n_cells=k, seed=42,
            fit_sample_fraction=min(1.0, 50_000 / n),
        )
        assigned = assigned.persist()
        pairs = pair_total(assigned)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        clustered = assigned.select(
            F.col("cand_id").alias("vec_id"),
            F.col("_cv").alias("embedding"),
            F.col("_cell").alias("cluster_id"),
        )
        n_losers = semdedup_losers_gemm(
            clustered, "vec_id", "embedding", "cluster_id", 0.95
        ).count()
        t_gemm = time.perf_counter() - t0
        assigned.unpersist()
        print(
            f"RESULT {label}: k={k} pairs={pairs:.3e} losers={n_losers} "
            f"build={t_build:.1f}s gemm={t_gemm:.1f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
