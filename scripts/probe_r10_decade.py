#!/usr/bin/env python
"""One-more-decade complexity probe (VERDICT r09 task 5): the most
expensive sf0.1 sweep entries re-measured at 10x (embeddings also 100x)
amplified input, so each plan's claimed growth class is CONFIRMED with
s-vs-scale pairs instead of asserted from the plan shape.

Amplification is the rule-47 technique: replicate the sf0.1 table with
remapped keys (new order/user/doc ids so replication adds ENTITIES, not
fatter groups), light text salting so document replicas are near- but not
exact-dups, `repartition(64).localCheckpoint()` so the replication cost
stays out of the timed runs. Protocol: 1 warm + median-of-3 per point,
all runs printed (the question is the GROWTH RATIO, not +-2%; rule-37
spikes are visible in the printed spread). noop sink.

CAVEAT (rule 48 x100 coda): the trailing-token salt leaves replicas
colliding in most LSH bands, so for the two LSH doc entries this probe's
amplified points measure corpus size AND near-dup multiplicity together
— at x10 the multiplicity inflation is mild, at x100 it dominates. A
diversified control (per-replica token in every inter-word gap) isolates
the corpus axis; both numbers and the axis each measures are recorded in
SCALING rule 48.

Claims under test (each from the entry's docstring / PLANS.md):
- ab_conversion         linear  (one user-keyed agg + tiny fan-in)
- neardup_ingest_batch  linear  (banded LSH: candidates bounded per doc)
- training_corpus       linear  (same LSH core + component survivors)
- hub_parts             linear scan into a BOUNDED top-N_CORR_PARTS graph
- ivf_recall            linear  (the exact-recall arm is a 16 x N scan)
- semdedup_auto         linear; the 10x point CROSSES the 8*1024 router
                        clamp, so it measures the learned-codebook path
                        (KMeans fit + GEMM assignment) the small SFs
                        never exercise
- part_link_prediction  PLATEAU: the 1024-bucket wedge join is capped at
                        ~1024*deg^2 regardless of data size; only the
                        lineitem scan/agg below it grows linearly

    python scripts/probe_r10_decade.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def timed(label: str, make_df, clear_cache) -> float:
    """make_df is a THUNK: several probed operators materialize work at
    BUILD time (eager localCheckpoint lineage cuts in the network tier,
    MEMORY_AND_DISK persists inside prepare_training_data), so a
    build-once-write-thrice protocol would time only the post-checkpoint
    tail. Rebuilding per run charges every run the full one-shot cost;
    clearCache() between runs releases the previous run's persisted
    intermediates so runs stay independent."""
    make_df().write.mode("overwrite").format("noop").save()  # warm
    runs = []
    for _ in range(3):
        clear_cache()
        t0 = time.perf_counter()
        make_df().write.mode("overwrite").format("noop").save()
        runs.append(time.perf_counter() - t0)
    med = statistics.median(runs)
    print(f"{label}\t{med:.2f}s median-of-3 (runs {['%.2f' % r for r in runs]})", flush=True)
    return med


def main() -> None:
    from pyspark.sql import functions as F

    from vectordb_bioinsight_spark.session import get_session
    from vectordb_bioinsight_spark.sources.readers import load_table

    spark = get_session("probe-r10-decade", cpus=32)

    def amplify(df, factor: int, remaps: dict, salt_text: str | None = None):
        """Replicate df `factor`x; remaps: col -> fn(col_expr, rep_expr)."""
        rep = df.crossJoin(
            spark.range(factor).select(F.col("id").alias("_r"))
        )
        for col, fn in remaps.items():
            rep = rep.withColumn(col, fn(F.col(col), F.col("_r")))
        if salt_text is not None:
            rep = rep.withColumn(
                salt_text,
                F.concat(
                    F.col(salt_text), F.lit(" probesalt"), F.col("_r").cast("string")
                ),
            )
        return rep.drop("_r").repartition(64).localCheckpoint()

    results: dict[str, list[tuple[int, float]]] = {}

    def point(name: str, factor: int, make_df) -> None:
        med = timed(f"{name} x{factor}", make_df, spark.catalog.clearCache)
        results.setdefault(name, []).append((factor, med))

    # --- ab_conversion: events, new users per replica ---------------------
    from vectordb_bioinsight_spark.operators.stats import ab_test_summary

    ev = load_table(spark, SF_DIR, "events").select("user_id", "event_type")

    def ab(frame):
        users = frame.groupBy("user_id").agg(
            (F.sum((F.col("event_type") == "purchase").cast("int")) >= 14)
            .cast("int")
            .alias("conv")
        )
        armed = users.select(
            F.when(F.col("user_id") % 2 == 0, "A").otherwise("B").alias("arm"),
            "conv",
        )
        return ab_test_summary(armed, "arm", "conv")

    base = ev.repartition(64).localCheckpoint()
    point("ab_conversion", 1, lambda f=base: ab(f))
    amp = amplify(ev, 10, {"user_id": lambda c, r: c * 10 + r})
    point("ab_conversion", 10, lambda f=amp: ab(f))
    amp100 = amplify(ev, 100, {"user_id": lambda c, r: c * 100 + r})
    point("ab_conversion", 100, lambda f=amp100: ab(f))
    amp100.unpersist()
    amp.unpersist()
    base.unpersist()

    # --- neardup_ingest_batch: documents, salted replicas ------------------
    from vectordb_bioinsight_spark.operators.dedup import near_dedup_against_corpus

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")

    def neardup(frame):
        corpus = frame.filter(F.col("doc_id") % 2 == 0)
        batch = frame.filter(F.col("doc_id") % 2 == 1)
        return near_dedup_against_corpus(
            batch, corpus, "doc_id", "text", min_jaccard=0.6
        ).select("doc_id")

    dbase = docs.repartition(64).localCheckpoint()
    point("neardup_ingest_batch", 1, lambda f=dbase: neardup(f))
    damp = amplify(docs, 10, {"doc_id": lambda c, r: c * 10 + r}, salt_text="text")
    point("neardup_ingest_batch", 10, lambda f=damp: neardup(f))

    # --- training_corpus: the full pipeline on the same salted corpus ------
    from vectordb_bioinsight_spark.pipelines.training_data import (
        prepare_training_data,
    )

    full_docs = load_table(spark, SF_DIR, "documents")

    def corpus_q(frame):
        out = prepare_training_data(frame, min_quality=0.3, near_dup_jaccard=0.6)
        return out.select("doc_id", "split", F.round("quality_score", 6).alias("q"))

    fbase = full_docs.repartition(64).localCheckpoint()
    point("training_corpus", 1, lambda f=fbase: corpus_q(f))
    famp = amplify(full_docs, 10, {"doc_id": lambda c, r: c * 10 + r}, salt_text="text")
    point("training_corpus", 10, lambda f=famp: corpus_q(f))
    famp.unpersist()
    damp.unpersist()
    fbase.unpersist()
    dbase.unpersist()

    # --- hub_parts / part_link_prediction: lineitem, new orders ------------
    from vectordb_bioinsight_spark.operators.joins import cooccurrence_edges
    from vectordb_bioinsight_spark.operators.network import (
        correlation_edges,
        hub_scores_full,
        link_prediction,
    )
    from vectordb_bioinsight_spark.plans.catalog_network import N_CORR_PARTS

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey", "l_shipdate", "l_quantity"
    )

    def hub(frame):
        # inlined _part_month_profiles on the amplified frame
        top = (
            frame.groupBy("l_partkey")
            .agg(F.sum("l_quantity").alias("_tq"))
            .orderBy(F.desc("_tq"), F.asc("l_partkey"))
            .limit(N_CORR_PARTS)
            .select("l_partkey")
        )
        prof = (
            frame.join(F.broadcast(top), "l_partkey")
            .groupBy("l_partkey", F.date_trunc("month", "l_shipdate").alias("month"))
            .agg(F.sum("l_quantity").alias("qty"))
        )
        edges = correlation_edges(prof, "l_partkey", "month", "qty", min_abs_corr=0.4)
        return hub_scores_full(edges, top_k_hubs=5)

    def linkpred(frame):
        pairs = frame.select(
            (F.col("l_partkey") % 1024).alias("part"),
            F.col("l_orderkey").alias("okey"),
        )
        edges = cooccurrence_edges(pairs, "part", "okey", min_weight=2)
        scored = link_prediction(edges, "item1", "item2", min_common=2)
        return scored.orderBy(
            F.desc("cn"), F.desc("aa"), F.asc("u"), F.asc("v")
        ).limit(20)

    lbase = li.repartition(64).localCheckpoint()
    point("hub_parts", 1, lambda f=lbase: hub(f))
    point("part_link_prediction", 1, lambda f=lbase: linkpred(f))
    lamp = amplify(li, 10, {"l_orderkey": lambda c, r: c * 10 + r})
    point("hub_parts", 10, lambda f=lamp: hub(f))
    point("part_link_prediction", 10, lambda f=lamp: linkpred(f))
    lamp.unpersist()
    lbase.unpersist()

    # --- ivf_recall / semdedup_auto: embeddings -----------------------------
    from vectordb_bioinsight_spark.operators.semdedup import semdedup_survivors
    from vectordb_bioinsight_spark.operators.vector import (
        ann_recall_at_k,
        ivf_search_replay,
        knn_join,
    )
    from vectordb_bioinsight_spark.plans.catalog_vector import SEMDEDUP_MIN_COS

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")

    def ivf(frame):
        queries = frame.filter(F.col("vec_id") < 16)
        cent = frame.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 116)).select(
            (F.col("vec_id") - 100).cast("int").alias("_cell"),
            F.col("embedding").cast("array<double>").alias("_centroid"),
        )
        exact = knn_join(queries, frame, "vec_id", "vec_id", "embedding", k=10)
        approx = ivf_search_replay(
            frame, queries, "vec_id", "vec_id", "embedding", cent, k=10, n_probe=4
        )
        return ann_recall_at_k(exact, approx, k=10)

    def semd(frame):
        return semdedup_survivors(
            frame, "vec_id", "embedding", min_cosine=SEMDEDUP_MIN_COS
        ).select("vec_id")

    ebase = emb.repartition(64).localCheckpoint()
    point("ivf_recall", 1, lambda f=ebase: ivf(f))
    point("semdedup_auto", 1, lambda f=ebase: semd(f))
    # replicas keep ids >= 10M so the original 16 queries / 16 frozen
    # centroid rows stay singular; replica vectors are identical (ties
    # don't change the work done by assignment/scan stages)
    for factor in (10, 100):
        eamp = amplify(
            emb,
            factor,
            {
                "vec_id": lambda c, r: F.when(r == 0, c).otherwise(
                    c + r * 10_000_000
                )
            },
        )
        point("ivf_recall", factor, lambda f=eamp: ivf(f))
        point("semdedup_auto", factor, lambda f=eamp: semd(f))
        eamp.unpersist()
    ebase.unpersist()

    print("\n== s-vs-scale pairs ==")
    for name, pts in results.items():
        pts = sorted(pts)
        ratios = [
            f"x{b[0]//a[0]}:{b[1]/a[1]:.1f}x" for a, b in zip(pts, pts[1:])
        ]
        print(f"{name}: {[(f'x{f}', round(s, 2)) for f, s in pts]}  growth {ratios}")
    spark.stop()


if __name__ == "__main__":
    main()
