"""Streaming document ingest: gate → within-batch dedup → corpus dedup → append."""

from __future__ import annotations

import json

import pytest

from vectordb_bioinsight_spark.streaming.ingest_stream import (
    run_ingest_stream,
    stream_documents_from_dir,
)


def _jsonl(path, rows):
    path.write_text(
        "\n".join(
            json.dumps({"doc_id": i, "text": t, "lang": "en", "source": "s"})
            for i, t in rows
        )
        + "\n"
    )


@pytest.fixture()
def dirs(tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    return landing, str(tmp_path / "corpus"), str(tmp_path / "ckpt")


def test_ingest_gates_and_dedups(spark, dirs):
    landing, corpus, ckpt = dirs
    # seed corpus with one existing text
    spark.createDataFrame(
        [(100, "existing corpus document text", "en", "s")],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(corpus)

    _jsonl(
        landing / "batch1.jsonl",
        [
            (1, "a fresh document about alpha topics"),
            (2, "a fresh document about alpha topics"),  # within-batch dup of 1
            (3, "existing corpus document text"),  # already in corpus
            (4, "!!!"),  # junk: fails the quality gate
            (5, "another fresh document entirely"),
        ],
    )
    stream = stream_documents_from_dir(spark, str(landing))
    run_ingest_stream(stream, corpus, ckpt)
    got = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert got == {100, 1, 5}

    # second batch: re-sends doc 1's text (now in corpus) + one new doc
    _jsonl(
        landing / "batch2.jsonl",
        [(6, "a fresh document about alpha topics"), (7, "late-arriving new text")],
    )
    stream2 = stream_documents_from_dir(spark, str(landing))
    run_ingest_stream(stream2, corpus, ckpt)
    got2 = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert got2 == {100, 1, 5, 7}


def test_ingest_url_dedup_across_batches(spark, dirs):
    """url_dedup=True drops a later doc whose canonical first URL matches
    an earlier one (within batch AND against the corpus), keeps url-less
    docs, and persists url_key with the corpus rows."""
    landing, corpus, ckpt = dirs
    _jsonl(
        landing / "b1.jsonl",
        [
            (1, "read this https://WWW.Example.COM/a?utm_source=x today"),
            (2, "read this https://example.com/a now"),  # same canonical as 1
            (3, "plain document with no link at all"),
            (4, "another plain document without links"),
        ],
    )
    run_ingest_stream(
        stream_documents_from_dir(spark, str(landing)),
        corpus,
        ckpt,
        url_dedup=True,
    )
    got = spark.read.parquet(corpus)
    assert "url_key" in got.columns
    assert sorted(r["doc_id"] for r in got.collect()) == [1, 3, 4]

    # second batch: same URL again (vs corpus), plus a fresh URL
    _jsonl(
        landing / "b2.jsonl",
        [
            (10, "repost https://example.com/a once more"),
            (11, "fresh page https://example.com/b here"),
        ],
    )
    run_ingest_stream(
        stream_documents_from_dir(spark, str(landing)),
        corpus,
        str(ckpt) + "2",
        url_dedup=True,
    )
    final = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert final == [1, 3, 4, 11]


def test_ingest_maintains_shard_manifest(spark, dirs):
    """manifest after two batches == manifest recomputed from the corpus
    on disk — the O(shards)/batch fold matches a full rebuild."""
    from vectordb_bioinsight_spark.operators.packing import shard_manifest, shuffle_shards

    landing, corpus, ckpt = dirs
    man = str(landing.parent / "manifest")
    _jsonl(landing / "m1.jsonl", [(i, f"first batch doc {i} body words") for i in range(8)])
    run_ingest_stream(
        stream_documents_from_dir(spark, str(landing)), corpus, ckpt,
        manifest_path=man, manifest_shards=4,
    )
    _jsonl(landing / "m2.jsonl", [(i, f"second wave doc {i} more words") for i in range(10, 16)])
    run_ingest_stream(
        stream_documents_from_dir(spark, str(landing)), corpus, str(ckpt) + "2",
        manifest_path=man, manifest_shards=4,
    )
    standing = {r["shard"]: r for r in spark.read.parquet(man).collect()}
    rebuilt = {
        r["shard"]: r
        for r in shard_manifest(
            shuffle_shards(spark.read.parquet(corpus), "doc_id", 4, salt=0),
            "shard", "doc_id", "text",
        ).collect()
    }
    assert standing == rebuilt
    assert sum(r["n_docs"] for r in standing.values()) == 14


def test_ingest_maintains_column_moments(spark, dirs, tmp_path):
    """With moments_path set, the standing per-source (n, mean, m2)
    profile after two batches equals a rebuild over the final corpus —
    the merge==rebuild contract, operationally."""
    import math

    from pyspark.sql import functions as F

    from vectordb_bioinsight_spark.operators.sketches import (
        moment_shards,
        moments_to_stats,
    )

    landing, corpus, ckpt = dirs
    moments = str(tmp_path / "moments")

    # moments_col must exist on the batch, so the landing files carry an
    # n_chars field alongside the usual doc columns
    import json as _json
    (landing / "b1.jsonl").write_text("\n".join(
        _json.dumps({"doc_id": i, "text": t, "lang": "en", "source": "s",
                     "n_chars": len(t)})
        for i, t in [(1, "alpha words here now"), (2, "beta text body goes on")]
    ) + "\n")
    from pyspark.sql.types import StructType, StructField, LongType, StringType
    schema = StructType([
        StructField("doc_id", LongType()), StructField("text", StringType()),
        StructField("lang", StringType()), StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ])
    stream = spark.readStream.schema(schema).json(str(landing))
    run_ingest_stream(stream, corpus, ckpt, moments_path=moments, moments_col="n_chars")

    (landing / "b2.jsonl").write_text("\n".join(
        _json.dumps({"doc_id": i, "text": t, "lang": "en", "source": "s",
                     "n_chars": len(t)})
        for i, t in [(3, "gamma third document with more words in it")]
    ) + "\n")
    stream2 = spark.readStream.schema(schema).json(str(landing))
    run_ingest_stream(stream2, corpus, str(tmp_path / "ckpt2"),
                      moments_path=moments, moments_col="n_chars")

    standing = moments_to_stats(spark.read.parquet(moments)).first()
    rebuilt = moments_to_stats(
        moment_shards(
            spark.read.parquet(corpus).withColumn("_grain", F.lit("all")),
            ["source", "_grain"], "n_chars",
        )
    ).first()
    assert standing["n"] == rebuilt["n"] == 3
    assert math.isclose(standing["mean"], rebuilt["mean"], abs_tol=1e-6)
    assert math.isclose(standing["var"], rebuilt["var"], abs_tol=1e-6)


def test_ingest_maintains_histogram_state(spark, dirs, tmp_path):
    """With hist_path set, the standing fixed-grid histogram after two
    batches EQUALS a one-pass rebuild over the final corpus — exact
    (integer counts), and hist_quantiles reads off the standing state."""
    import json as _json

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from vectordb_bioinsight_spark.operators.sketches import (
        hist_quantiles,
        hist_shards,
    )

    landing, corpus, ckpt = dirs
    hist = str(tmp_path / "hist")
    schema = StructType([
        StructField("doc_id", LongType()), StructField("text", StringType()),
        StructField("lang", StringType()), StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ])

    def _write(name, docs):
        (landing / name).write_text("\n".join(
            _json.dumps({"doc_id": i, "text": t, "lang": "en", "source": "s",
                         "n_chars": len(t)})
            for i, t in docs
        ) + "\n")

    kw = dict(hist_path=hist, hist_col="n_chars",
              hist_lo=0.0, hist_hi=100.0, hist_bins=10)
    _write("b1.jsonl", [(1, "alpha words here now"), (2, "beta text body goes on")])
    stream = spark.readStream.schema(schema).json(str(landing))
    run_ingest_stream(stream, corpus, ckpt, **kw)

    _write("b2.jsonl", [(3, "gamma third document with many more words in it")])
    stream2 = spark.readStream.schema(schema).json(str(landing))
    run_ingest_stream(stream2, corpus, str(tmp_path / "ckpt2"), **kw)

    standing = {
        (r["source"], r["bin"]): r["cnt"]
        for r in spark.read.parquet(hist).collect()
    }
    rebuilt = {
        (r["source"], r["bin"]): r["cnt"]
        for r in hist_shards(
            spark.read.parquet(corpus).withColumn("_grain", F.lit("all")),
            ["source", "_grain"], "n_chars", lo=0.0, hi=100.0, n_bins=10,
        ).collect()
    }
    assert standing == rebuilt and sum(standing.values()) == 3
    q = hist_quantiles(
        spark.read.parquet(hist), ["source"], lo=0.0, hi=100.0, n_bins=10,
        qs=(0.5,),
    ).first()
    assert q["n"] == 3 and 0.0 < q["q50"] <= 100.0
