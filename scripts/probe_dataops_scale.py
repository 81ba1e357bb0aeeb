#!/usr/bin/env python
"""Scale probe: the r03 data-selection additions at 1M docs / 1M events
(SCALING.md rows).

Replicates the sf0.1 tables to 1M rows (fresh ids) and times each new
operator end-to-end with the noop sink, confirming the linear behavior the
plan shapes promise: the quality classifier and weighted sampler are
scan-local; CMS is one bounded-key groupBy; exact-n-gram decontamination
is a broadcast semi-join; the funnel is one user-keyed fold aggregation
(r05 rewrite — see scripts/probe_funnel_retention.py for its dedicated
wide/deep probe).

Usage: python scripts/probe_dataops_scale.py [replication]
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


def timed(label: str, df) -> None:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    print(f"{label}\t{time.perf_counter() - t0:.1f}s")


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    spark = get_session("probe-dataops-scale", cpus=32)

    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()
    reps = spark.range(rep).select(F.col("id").alias("_r"))
    big = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") * rep + F.col("_r")).alias("doc_id"),
            "text",
            "n_chars",
        )
        .repartition(64)
        .localCheckpoint()  # materialize once so every probe reads the same input
    )
    n = big.count()
    print(f"docs: {n0} x {rep} = {n}")

    from vectordb_bioinsight_spark.operators.text_analysis import (
        hashed_linear_quality,
        ngram_decontaminate,
    )

    timed("hashed_linear_quality", hashed_linear_quality(big, "doc_id", "text"))

    from vectordb_bioinsight_spark.operators.sketches import cms_build, cms_estimate
    from vectordb_bioinsight_spark.functions.text import tokenize

    toks = big.select(F.explode(tokenize(F.col("text"))).alias("term"))
    sketch = cms_build(toks, "term", width=1024, depth=4)
    watch = spark.createDataFrame(
        [("batch",), ("join",), ("scan",), ("data",)], ["term"]
    )
    timed("cms_build+estimate", cms_estimate(sketch, watch, "term", 1024, 4))

    # benchmark = ~1% of SOURCE docs, one replica each (a realistic
    # eval-set shape; taking doc_id % k on the replicated ids would sample
    # replicas of EVERY source doc and make 100% of grams match)
    bench = big.filter(
        (F.floor(F.col("doc_id") / rep) % 97 == 0) & (F.col("doc_id") % rep == 0)
    ).select("doc_id", "text")
    timed(
        "ngram_decontaminate (1% benchmark)",
        ngram_decontaminate(big, bench, "doc_id", "text", n=5),
    )

    from vectordb_bioinsight_spark.operators.sampling import weighted_hash_sample

    timed(
        "weighted_hash_sample k=1000",
        weighted_hash_sample(big, "doc_id", "n_chars", k=1000),
    )

    ev = load_table(spark, SF_DIR, "events")
    ev_rep = max(1, 1_000_000 // max(1, ev.count()))
    big_ev = (
        ev.crossJoin(spark.range(ev_rep).select(F.col("id").alias("_r")))
        .select(
            (F.col("user_id") * ev_rep + F.col("_r")).alias("user_id"),
            "event_type",
            "ts",
            "value",
            "event_id",
        )
        .repartition(64)
        .localCheckpoint()
    )
    print(f"events: {big_ev.count()}")

    from vectordb_bioinsight_spark.operators.trends import funnel_conversion
    from vectordb_bioinsight_spark.operators.stats import (
        robust_scale_by_group,
        winsorize_by_group,
    )

    timed(
        "funnel_conversion (3 steps)",
        funnel_conversion(big_ev, "user_id", "event_type", "ts", ["signup", "view", "purchase"]),
    )
    timed("winsorize_by_group", winsorize_by_group(big_ev, ["event_type"], "value"))
    timed("robust_scale_by_group", robust_scale_by_group(big_ev, ["event_type"], "value"))

    from vectordb_bioinsight_spark.operators.stats import quantile_normalize

    timed(
        "quantile_normalize",
        quantile_normalize(big_ev, "event_type", "event_id", "value"),
    )

    from vectordb_bioinsight_spark.operators.text_analysis import class_tfidf_top_terms

    labeled = big.withColumn("label", F.pmod(F.col("doc_id"), F.lit(20)))
    timed(
        "class_tfidf_top_terms (20 classes)",
        class_tfidf_top_terms(labeled, "label", "text", top_n=5),
    )

    # --- r04 additions: the newest stats kernels at 1M rows -----------------
    from vectordb_bioinsight_spark.functions.stats import welch_t
    from vectordb_bioinsight_spark.operators.stats import (
        gsea_prerank_es,
        group_moments,
        kruskal_wallis,
    )

    # Kruskal-Wallis: 10k keys x ~100 rows, 5 groups per key — the rank
    # window is KEY-partitioned, so cost is linear in rows
    kw_in = big_ev.select(
        F.pmod(F.col("user_id"), F.lit(10_000)).alias("k"),
        "event_type",
        "value",
    )
    timed("kruskal_wallis (10k keys)", kruskal_wallis(kw_in, ["k"], "event_type", "value"))

    # volcano chain: per-key two-group moments -> Welch t + log2FC + class,
    # all one map-side-combinable agg + scalar exprs
    v_in = big_ev.select(
        F.pmod(F.col("user_id"), F.lit(10_000)).alias("k"),
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("grp"),
        "value",
    )
    vm = group_moments(v_in, ["k"], "grp", "value", "a", "b")
    volcano = vm.select(
        "k",
        F.log2(F.col("mean_a") / F.col("mean_b")).alias("lfc"),
        welch_t(
            F.col("mean_a"), F.col("var_a"), F.col("n_a"),
            F.col("mean_b"), F.col("var_b"), F.col("n_b"),
        ).alias("t"),
    )
    timed("volcano chain (10k keys)", volcano)

    # preranked GSEA: 1M distinct genes, 100 sets — the global rank is the
    # documented single-partition step (inherent to preranked GSEA: the
    # statistic is a running sum over the TOTAL ordering); the per-set
    # running sum after it is set-partitioned
    genes = big_ev.select(F.col("event_id").alias("gene")).distinct().select(
        "gene", (F.pmod(F.col("gene") * 2654435761, F.lit(100_000)) / 1000.0).alias("stat")
    )
    membership = genes.select(
        F.pmod(F.col("gene"), F.lit(100)).cast("string").alias("gene_set"), "gene"
    )
    timed("gsea_prerank_es (distinct event-id genes, 100 sets)", gsea_prerank_es(genes, "gene", "stat", membership, "gene_set"))

    # the scale twin: two-phase rank + hits-only compressed walk — the
    # shuffled row count is |membership|, never N x S
    from vectordb_bioinsight_spark.operators.stats import gsea_prerank_es_scaled

    timed(
        "gsea_prerank_es_scaled (distinct event-id genes, 100 sets)",
        gsea_prerank_es_scaled(genes, "gene", "stat", membership, "gene_set"),
    )

    # BPE tier: train = one corpus scan + vocab-bounded loop; encode =
    # scan-local replace chain
    from vectordb_bioinsight_spark.operators.bpe import bpe_encode, bpe_train

    t0 = time.perf_counter()
    merges = bpe_train(big.select("doc_id", "text"), "text", n_merges=16)
    print(f"bpe_train 16 merges\t{time.perf_counter() - t0:.1f}s")
    timed("bpe_encode (16 merges)", bpe_encode(big, "text", merges))

    spark.stop()


if __name__ == "__main__":
    main()
