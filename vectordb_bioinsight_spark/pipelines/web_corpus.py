"""Crawl → corpus: the web-ingest composition in front of
pipelines/training_data.py.

One lazy DAG from raw WARC segments to clean candidate documents,
composed entirely from the r04 web-hygiene operators (each independently
oracle-tested):

  1. **WARC scan** (sources/readers.read_warc): record split at the
     source, header parse, response→(url, http_status, body) handoff;
  2. **status gate**: keep 2xx responses only;
  3. **URL hygiene** (operators/urls): canonical-first-URL key, blocklist
     gate on the registrable domain, lowest-id-per-canonical-URL dedup —
     the cheapest duplicate signal, applied BEFORE the text is even
     repaired;
  4. **text repair** (operators/cleaning.clean_web_docs): HTML strip +
     entity decode + mojibake fix;
  5. **id assignment**: the 64-bit canonical-URL/content hash as doc_id —
     deterministic, partition-independent.

The output schema matches what prepare_training_data consumes, so the
full crawl→shards path is: warc_to_documents | prepare_training_data |
shuffle_shards/pack_* — every stage scan-local or bounded-key.

Scale shape: steps 1-2 and 4-5 are scan-local; step 3 carries the only
shuffles (the 16-byte (key,id) dedup decision + the survivor semi-join
— the materializing-dedup floor, see SCALING.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.functions.hashing import portable_hash64
from vectordb_bioinsight_spark.operators.cleaning import clean_web_docs
from vectordb_bioinsight_spark.sources.readers import (
    read_warc,
    warc_responses_to_documents,
)


def warc_to_documents(
    spark: SparkSession,
    warc_path: str,
    blocked_domains: list[str] | DataFrame | None = None,
    source: str = "crawl",
) -> DataFrame:
    """WARC segments → clean, URL-deduped candidate documents.

    Output: (doc_id, url, source, text) — doc_id is the 64-bit hash of
    the target URL (stable across re-crawls of the same page), text is
    the repaired plain text. Ready for
    :func:`~vectordb_bioinsight_spark.pipelines.training_data.prepare_training_data`.
    """
    from pyspark.sql import Window

    from vectordb_bioinsight_spark.operators.urls import normalize_url

    responses = warc_responses_to_documents(read_warc(spark, warc_path))
    ok = responses.filter(
        (F.col("http_status") >= 200) & (F.col("http_status") < 300)
    ).select(
        portable_hash64(normalize_url(F.col("url"))).alias("doc_id"),
        "url",
        F.lit(source).alias("source"),
        "text",
    )
    # same-canonical-URL re-crawls collapse to ONE deterministic row
    # before anything else touches the text (doc_id IS the canonical-URL
    # hash, so this is the RefinedWeb stage-1 dedup as a keyed window;
    # the text-hash order makes the survivor partition-independent)
    w = Window.partitionBy("doc_id").orderBy(portable_hash64("text").asc())
    deduped = (
        ok.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if blocked_domains is not None:
        # block on the PAGE's own registrable domain (the url column) —
        # filter_blocked_domains scans link targets inside text, which is
        # the wrong signal for a crawl: a page ON a blocked domain rarely
        # links to itself
        from vectordb_bioinsight_spark.operators.urls import (
            registered_domain,
            url_host,
        )

        if not isinstance(blocked_domains, DataFrame):
            blocked_domains = spark.createDataFrame(
                [(d,) for d in blocked_domains], "domain string"
            )
        deduped = (
            deduped.withColumn(
                "_dom", registered_domain(url_host(F.col("url")))
            )
            .join(
                F.broadcast(
                    blocked_domains.select(F.col("domain").alias("_dom")).distinct()
                ),
                "_dom",
                "left_anti",
            )
            .drop("_dom")
        )
    cleaned = clean_web_docs(deduped, "doc_id", "text")
    return cleaned.select(
        "doc_id", "url", "source", F.col("text_clean").alias("text")
    ).filter(F.col("text") != "")
