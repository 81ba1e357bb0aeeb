"""Chunking semantics (overlap/coverage), junk filtering, and the
iterator-UDF inference stages (singleton loads, determinism)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.chunking import (
    chunk_text,
    filter_junk_chunks,
)
from vectordb_bioinsight_spark.operators.inference import (
    cross_encoder_scores,
    deterministic_embedder,
    embed_column,
)


def test_chunk_text_overlap_and_coverage(spark):
    text = "abcdefghij" * 50  # 500 chars
    df = spark.createDataFrame([(1, text)], ["id", "txt"])
    chunks = chunk_text(df, "id", "txt", chunk_size=200, overlap=50).orderBy("chunk_idx").collect()
    # stride 150: n_chunks = ceil((500-50)/150) = 3, starts 0,150,300 —
    # the last chunk ends exactly at 500, full coverage with no stub chunk
    assert [r["chunk_len"] for r in chunks] == [200, 200, 200]
    # overlap: chunk i's last 50 chars == chunk i+1's first 50
    for a, b in zip(chunks, chunks[1:]):
        assert a["chunk"][-50:] == b["chunk"][:50] or len(b["chunk"]) < 50
    # reconstruction: stitching chunks at stride boundaries yields the text
    stitched = chunks[0]["chunk"] + "".join(c["chunk"][50:] for c in chunks[1:])
    assert stitched == text


def test_chunk_text_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "tiny")], ["id", "txt"])
    rows = chunk_text(df, "id", "txt", chunk_size=200, overlap=50).collect()
    assert len(rows) == 1 and rows[0]["chunk"] == "tiny"


def test_chunk_text_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "x")], ["id", "txt"])
    with pytest.raises(ValueError):
        chunk_text(df, "id", "txt", chunk_size=100, overlap=100)


def test_junk_filter(spark):
    rows = [
        (1, "Results show significant enrichment of pathway X."),
        (2, "Author Contributions: J.S. wrote the paper."),
        (3, "Funding: supported by grant 12345."),
        (4, "Acknowledgments: we thank the reviewers."),
        (5, "Conflicts of Interest: none declared."),
    ]
    df = spark.createDataFrame(rows, ["id", "chunk"])
    kept = [r["id"] for r in filter_junk_chunks(df).collect()]
    assert kept == [1]


def test_embed_column_deterministic_and_normalized(spark):
    df = spark.createDataFrame([(1, "merge join"), (2, "merge join"), (3, "other words")], ["id", "txt"])
    out = {r["id"]: r["embedding"] for r in embed_column(df, "txt", dim=16).collect()}
    assert out[1] == out[2]            # same text -> same vector
    assert out[1] != out[3]
    assert len(out[1]) == 16
    norm = sum(v * v for v in out[1]) ** 0.5
    assert norm == pytest.approx(1.0, abs=1e-4)
    # matches the driver-side model exactly (same code path the UDF runs)
    assert out[1] == deterministic_embedder(dim=16)(["merge join"])[0]


def test_cross_encoder_scores_monotone_in_overlap(spark):
    rows = [
        (1, "merge join filter", "merge join filter tables"),
        (2, "merge join filter", "completely unrelated words here"),
    ]
    df = spark.createDataFrame(rows, ["id", "q", "d"])
    got = {r["id"]: r["rerank_score"] for r in cross_encoder_scores(df, "q", "d").collect()}
    assert got[1] > got[2]
