"""Streaming count-min sketch — bounded-state frequency tracking on a
document stream.

Exact streaming term counts keep one state row PER DISTINCT TERM — an
unbounded, skew-prone state store that grows with the vocabulary forever
(the classic streaming-aggregation trap). Projecting each token onto its
``depth`` CMS buckets first makes the streaming aggregation's key space
``depth x width`` BY CONSTRUCTION: state is bounded for any stream length,
the update is an ordinary streaming groupBy-count (incremental, partial
aggregation, no custom state op needed), and the resulting sketch table is
the SAME artifact ``operators/sketches.cms_build`` produces — additive with
batch shards and probed by ``cms_estimate`` without touching the stream.

Stream == batch equivalence is test-pinned: the final streamed sketch is
cell-for-cell identical to ``cms_build`` over the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.functions.text import tokenize
from vectordb_bioinsight_spark.operators.sketches import MAX_SKETCH_CELLS, _buckets


def cms_term_stream(
    stream_df: DataFrame,
    text_col: str = "text",
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """The streaming sketch plan: tokenize -> scan-local bucket projection
    -> streaming groupBy on the bounded (j, bucket) key space. Run in
    ``complete`` (small bounded result — it always fits) or ``update``
    output mode; the sink table IS the sketch.

    Output: (j, bucket, cnt) — merge with other shards by summing cnt.
    """
    if width * depth > MAX_SKETCH_CELLS:
        raise ValueError(f"sketch too large: {width * depth} > {MAX_SKETCH_CELLS}")
    toks = stream_df.select(F.explode(tokenize(text_col)).alias("term"))
    cells = toks.select(
        F.posexplode(_buckets(F.col("term"), width, depth)).alias("j", "bucket")
    )
    return cells.groupBy("j", "bucket").agg(F.count("*").cast("long").alias("cnt"))
