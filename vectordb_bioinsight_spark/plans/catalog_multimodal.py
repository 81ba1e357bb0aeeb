"""Multimodal catalog entries: the opaque-payload feature pipeline
(mapInPandas, Arrow-batched) and JVM-side frame sampling, both
hash-matchable because the fake decode is md5 arithmetic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.multimodal import (
    attach_payload,
    extract_features,
    frame_sample,
)
from vectordb_bioinsight_spark.sources.readers import load_table

FEATURE_DIM = 4


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction end-to-end: documents.text -> UTF-8
    payload -> mapInPandas (md5 fake embedding) -> flattened scalar features.
    The Python stage is the real plumbing a learned encoder would use."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_payload(docs, "doc_id", "text")
    feats = extract_features(media, dim=FEATURE_DIM)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        "payload_md5",
        *[F.round(F.col("feature")[i], 6).alias(f"f{i}") for i in range(FEATURE_DIM)],
    )


SQL_MEDIA_FEATURES = """
SELECT doc_id AS media_id, 'text' AS kind,
       octet_length(encode(text))::BIGINT AS n_bytes,
       md5(text) AS payload_md5,
       round(('0x' || substr(md5(text), 1, 2))::INT / 255.0, 6) AS f0,
       round(('0x' || substr(md5(text), 3, 2))::INT / 255.0, 6) AS f1,
       round(('0x' || substr(md5(text), 5, 2))::INT / 255.0, 6) AS f2,
       round(('0x' || substr(md5(text), 7, 2))::INT / 255.0, 6) AS f3
FROM documents
"""


def q_media_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (video-payload analog): 256-byte frames, every 2nd kept
    — per-media sampled-frame count and byte total, all JVM higher-order
    array functions (no Python in the path)."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_payload(docs, "doc_id", "text")
    frames = frame_sample(media, frame_bytes=256, every_n=2)
    return frames.groupBy("media_id").agg(
        F.count("*").cast("long").alias("n_frames"),
        F.sum(F.length("frame")).cast("long").alias("sampled_bytes"),
    )


SQL_MEDIA_FRAME_STATS = """
WITH m AS (
  SELECT doc_id AS media_id, octet_length(encode(text)) AS nb FROM documents
  WHERE octet_length(encode(text)) > 0
), frames AS (
  SELECT media_id, nb, unnest(generate_series(0, (ceil(nb / 256.0)::INT - 1))) AS i
  FROM m
)
SELECT media_id, count(*)::BIGINT AS n_frames,
       sum(least(256, nb - i * 256))::BIGINT AS sampled_bytes
FROM frames WHERE i % 2 = 0
GROUP BY 1
"""
