"""Model-inference stages — SURVEY V1/V6/M10 mapping, §4.3(4).

The reference loads SentenceTransformer / CrossEncoder lazily once per
process and batches inputs (embeddings.py:34-45, 58-67; reranker.py:99-140).
The engine's equivalent is the ITERATOR pandas UDF: the model loads once per
Python worker (not once per batch), every Arrow batch reuses it, and batch
size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.

No real model ships in this container, so ``deterministic_embedder`` stands
in: a seeded feature-hash projection with the same signature a
SentenceTransformer wrapper would have. Swap ``make_loader`` for one that
returns ``model.encode`` and nothing else changes — that swap-point is the
whole design.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def deterministic_embedder(dim: int = 16, seed: int = 42) -> Callable:
    """A fake 'model': feature-hash each text into a seeded projection —
    deterministic, dependency-free, shaped like SentenceTransformer.encode
    (list[str] -> list[list[float]])."""
    import hashlib

    def encode(texts: list[str]) -> list[list[float]]:
        out = []
        for t in texts:
            vec = [0.0] * dim
            for tok in t.lower().split():
                h = int.from_bytes(
                    hashlib.md5(f"{seed}:{tok}".encode()).digest()[:8], "big"
                )
                vec[h % dim] += 1.0 if (h >> 8) % 2 == 0 else -1.0
            norm = sum(v * v for v in vec) ** 0.5 or 1.0
            out.append([round(v / norm, 6) for v in vec])
        return out

    return encode


def embed_column(
    df: DataFrame,
    text_col: str,
    out_col: str = "embedding",
    loader: Callable[[], Callable] | None = None,
    dim: int = 16,
) -> DataFrame:
    """V1 batch-embed stage: iterator pandas UDF with a per-worker model
    singleton. ``loader()`` runs AT MOST ONCE per Python worker process —
    the lazy-singleton semantics of the reference's embedder."""
    from vectordb_bioinsight_spark.session import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)
    if loader is None:
        def loader() -> Callable:  # noqa: D401 - default fake model
            return deterministic_embedder(dim=dim)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model = loader()  # once per worker, reused across all Arrow batches
        for series in batches:
            yield pd.Series(model(series.tolist()))

    return df.withColumn(out_col, _embed(F.col(text_col)))


def cross_encoder_scores(
    pairs: DataFrame,
    query_col: str,
    doc_col: str,
    out_col: str = "rerank_score",
    loader: Callable[[], Callable] | None = None,
) -> DataFrame:
    """V6 pair-scoring stage (CrossEncoder.predict shape): score(query, doc)
    per row, same iterator/singleton pattern. Default fake model: cosine of
    the deterministic embeddings — monotone in term overlap."""
    from vectordb_bioinsight_spark.session import ensure_package_on_executors

    ensure_package_on_executors(pairs.sparkSession)
    if loader is None:
        def loader() -> Callable:
            enc = deterministic_embedder()

            def score(qs: list[str], ds: list[str]) -> list[float]:
                qv, dv = enc(qs), enc(ds)
                return [
                    round(sum(a * b for a, b in zip(q, d)), 6)
                    for q, d in zip(qv, dv)
                ]

            return score

    @F.pandas_udf(T.DoubleType())
    def _score(batches: Iterator[Tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        model = loader()
        for qs, ds in batches:
            yield pd.Series(model(qs.tolist(), ds.tolist()))

    return pairs.withColumn(out_col, _score(F.col(query_col), F.col(doc_col)))
