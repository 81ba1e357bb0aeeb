#!/usr/bin/env python
"""Scale probe: late-interaction retrieval at 1M token vectors (40k docs
x 25 tokens x 64d) — exact MaxSim vs IVF-routed MaxSim (KMeans and
frozen-centroid modes), plus the pruning fraction actually achieved.

The 100 TB claim under test (SCALING rule 38): candidate generation must
touch ~n_probe/n_cells of the token corpus, and the exact rescore only
the pruned doc union — so IVF-MaxSim should beat exact MaxSim by roughly
the pruning factor once the corpus dwarfs the query.

Usage: python scripts/probe_maxsim_scale.py
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

from vectordb_bioinsight_spark.session import get_session
from vectordb_bioinsight_spark.sources.readers import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(label: str, df) -> float:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    print(f"{label}\t{dt:.1f}s")
    return dt


def main() -> None:
    from vectordb_bioinsight_spark.operators.vector import maxsim_ivf, maxsim_topk

    spark = get_session("probe-maxsim", cpus=32)
    emb = load_table(spark, SF_DIR, "embeddings")
    rep = max(1, 1_000_000 // emb.count())
    # CLUSTERED corpus: each replica block is a "topic" — its docs' tokens
    # share a large per-topic offset, the structure real ColBERT corpora
    # have and the structure doc-level pruning needs (with topic-free
    # random tokens, P(doc has NO token in the probed cells) ~ 0.88^25,
    # i.e. ~every doc survives and pruning is vacuous by construction)
    toks = (
        emb.crossJoin(spark.range(rep).select(F.col("id").alias("_r")))
        .select((F.col("vec_id") * rep + F.col("_r")).alias("tok_id"), "embedding")
        .select(
            "tok_id",
            ((F.col("tok_id") / 25).cast("long") % 64).alias("_topic"),
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x, i: x
                + F.when(F.col("_topic") == (i % 64), F.lit(3.0)).otherwise(0.0),
            ).alias("embedding"),
        )
        .drop("_topic")
        .repartition(64)
        .localCheckpoint()
    )
    docs = toks.select(
        (F.col("tok_id") / 25).cast("long").alias("doc"), "embedding"
    )
    print(f"token vectors: {docs.count()}  docs: 40000 (25 tokens each, topic-clustered)")
    q = toks.filter(F.col("tok_id") < 8).select(
        F.col("tok_id").alias("qtok"), "embedding"
    )

    t_exact = timed("maxsim_exact_1m", maxsim_topk(docs, q, "doc", "embedding", k=10))

    # one-shot mode (fit + assign + search in a single call)
    timed(
        "maxsim_ivf_oneshot_1m (incl. fit+assign)",
        maxsim_ivf(docs, q, "doc", "embedding", n_cells=64, n_probe=4, k=10),
    )

    # production shape (ivf_search discipline): assignment is index-BUILD
    # cost paid once — steady-state query cost is routing + pruned rescore
    from vectordb_bioinsight_spark.operators.vector import ivf_build_index

    t0 = time.perf_counter()
    assigned, cent_df = ivf_build_index(docs, "doc", "embedding", n_cells=64)
    assigned = assigned.select("cand_id", "_cell").localCheckpoint()
    cent_df = cent_df.localCheckpoint()
    print(f"index_build_1m\t{time.perf_counter() - t0:.1f}s")
    t_idx = timed(
        "maxsim_ivf_prebuilt_search_1m",
        maxsim_ivf(docs, q, "doc", "embedding", n_probe=4, k=10,
                   index=(assigned, cent_df)),
    )
    print(f"speedup prebuilt vs exact: {t_exact / max(t_idx, 1e-9):.1f}x")


if __name__ == "__main__":
    main()
