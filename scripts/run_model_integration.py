#!/usr/bin/env python
"""End-to-end run of the model-inference seams (VERDICT r05/r06 stretch):
embed the fixture corpus through operators/inference.py::embed_column,
retrieve top-k by cosine, rerank the candidates with
cross_encoder_scores — the reference's embed -> search -> rerank stack
(embeddings.py:34-89, reranker.py:99-140) on the engine's iterator-UDF
seams.

Model selection (the point of the seam: ONLY the loader changes):

* If ``sentence_transformers`` is importable, uses all-MiniLM-L6-v2 as the
  embedder and cross-encoder/ms-marco-MiniLM-L-6-v2 as the reranker — the
  reference's actual model family.
* Otherwise (this container ships no torch) falls back to a 384-dim
  seeded numpy bucket-matrix embedder — the same dimensionality, batch
  shape, Arrow path, and per-worker singleton lifecycle as the real
  model; only the weights are fake.

Also PROVES the singleton contract: the loader drops a pid-stamped marker
file per invocation; after the run, markers <= distinct python workers
(one load per worker, not per batch or per row).

Usage: python scripts/run_model_integration.py [sf_dir]
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

MARKER_DIR = os.path.join(tempfile.gettempdir(), "model_seam_markers")


def _numpy_model_loader():
    """384-dim seeded bucket-matrix embedder — realistic shape, fake
    weights. Declared at module top level so executors can unpickle it."""
    import hashlib

    import numpy as np

    os.makedirs(MARKER_DIR, exist_ok=True)
    with open(os.path.join(MARKER_DIR, f"load-{os.getpid()}-{time.time_ns()}"), "w"):
        pass
    rng = np.random.default_rng(42)
    table = rng.standard_normal((8192, 384)).astype(np.float32)

    def encode(texts: list[str]) -> list[list[float]]:
        out = []
        for t in texts:
            toks = t.lower().split() or [""]
            idx = [
                int.from_bytes(hashlib.md5(tok.encode()).digest()[:4], "big") % 8192
                for tok in toks
            ]
            v = table[idx].mean(axis=0)
            v = v / (np.linalg.norm(v) or 1.0)
            out.append([float(x) for x in v])
        return out

    return encode


def _real_model_loader():
    from sentence_transformers import SentenceTransformer

    os.makedirs(MARKER_DIR, exist_ok=True)
    with open(os.path.join(MARKER_DIR, f"load-{os.getpid()}-{time.time_ns()}"), "w"):
        pass
    model = SentenceTransformer("sentence-transformers/all-MiniLM-L6-v2")

    def encode(texts: list[str]) -> list[list[float]]:
        return [list(map(float, v)) for v in model.encode(texts, batch_size=64)]

    return encode


def _real_cross_loader():
    from sentence_transformers import CrossEncoder

    model = CrossEncoder("cross-encoder/ms-marco-MiniLM-L-6-v2")

    def score(qs: list[str], ds: list[str]) -> list[float]:
        return [float(s) for s in model.predict(list(zip(qs, ds)))]

    return score


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    try:
        import sentence_transformers  # noqa: F401

        loader, real = _real_model_loader, True
    except ImportError:
        loader, real = _numpy_model_loader, False

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vectordb_bioinsight_spark.functions.vector import cosine_similarity
    from vectordb_bioinsight_spark.operators.inference import (
        cross_encoder_scores,
        embed_column,
    )
    from vectordb_bioinsight_spark.session import get_session
    from vectordb_bioinsight_spark.sources.readers import load_table

    for f in glob.glob(os.path.join(MARKER_DIR, "load-*")):
        os.remove(f)

    spark = get_session("model-integration", cpus=32)
    docs = load_table(spark, sf_dir, "documents").repartition(32)
    n = docs.count()
    print(f"model={'all-MiniLM-L6-v2' if real else 'numpy-384 (no torch in env)'}")

    t0 = time.perf_counter()
    embedded = embed_column(docs, "text", "emb", loader=loader).localCheckpoint()
    n_emb = embedded.count()
    t_embed = time.perf_counter() - t0
    print(f"embed: {n_emb}/{n} docs in {t_embed:.1f}s "
          f"({n_emb / t_embed:.0f} docs/s end-to-end)")

    loads = len(glob.glob(os.path.join(MARKER_DIR, "load-*")))
    workers = spark.sparkContext.defaultParallelism
    print(f"loader invocations: {loads} (<= {workers} workers) — "
          f"{'OK: once per worker' if loads <= workers else 'FAIL: reloading per batch'}")
    assert loads <= workers, (loads, workers)

    # retrieve: embed 3 queries through the SAME seam, brute-force cosine
    queries = spark.createDataFrame(
        [(1, "merge join optimizer statistics"),
         (2, "vaccine trial immune response"),
         (3, "streaming window aggregation")],
        "qid long, qtext string",
    )
    qe = embed_column(queries, "qtext", "qemb", loader=loader)
    t0 = time.perf_counter()
    cand = (
        qe.crossJoin(embedded.select("doc_id", "text", "emb"))
        .withColumn("cos", cosine_similarity(F.col("qemb"), F.col("emb")))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("doc_id"))
            ),
        )
        .filter(F.col("rk") <= 20)
        .localCheckpoint()
    )
    n_cand = cand.count()
    t_knn = time.perf_counter() - t0
    print(f"retrieve: top-20 x 3 queries over {n_emb} docs in {t_knn:.1f}s")

    # rerank the 60 candidates through the cross-encoder seam
    cross_loader = _real_cross_loader if real else None
    t0 = time.perf_counter()
    reranked = cross_encoder_scores(
        cand.select("qid", "qtext", "doc_id", "text"),
        "qtext", "text",
        loader=cross_loader,
    )
    top = (
        reranked.withColumn(
            "rk2",
            F.row_number().over(
                Window.partitionBy("qid")
                .orderBy(F.desc("rerank_score"), F.asc("doc_id"))
            ),
        ).filter(F.col("rk2") <= 3).orderBy("qid", "rk2").collect()
    )
    t_rerank = time.perf_counter() - t0
    print(f"rerank: {n_cand} pairs in {t_rerank:.1f}s")
    for r in top:
        print(f"  q{r['qid']} #{r['rk2']} doc={r['doc_id']} "
              f"score={r['rerank_score']:.4f}")
    spark.stop()


if __name__ == "__main__":
    main()
