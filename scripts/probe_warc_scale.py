#!/usr/bin/env python
"""Scale probe: WARC parse throughput (SCALING.md row) — synthesize a
multi-file segment set (~1M records across 32 files), read with
read_warc, and time parse + the response→document handoff + the full
warc_to_documents pipeline.

Usage: python scripts/probe_warc_scale.py [n_records]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F

from vectordb_bioinsight_spark.session import get_session


def timed(label: str, df) -> None:
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    print(f"{label}\t{time.perf_counter() - t0:.1f}s", flush=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_files = 32
    spark = get_session("probe-warc", cpus=32)

    base = "/tmp/warc_probe"
    seg_dir = os.path.join(base, "segs")
    os.makedirs(seg_dir, exist_ok=True)

    # synthesize with Spark itself (writing 1M records single-threaded in
    # Python would dominate the probe): one text row per record, custom
    # delimiter framing, then write as n_files text parts
    body = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>synthetic page body with some words repeated for bulk</p> tail"
    rec = spark.range(n).select(
        F.concat(
            F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:"),
            F.col("id").cast("string"),
            F.lit(">\r\nWARC-Date: 2024-01-15T10:00:00Z\r\nWARC-Target-URI: https://site"),
            (F.col("id") % 1000).cast("string"),
            F.lit(".org/page/"),
            F.col("id").cast("string"),
            F.lit(f"\r\nContent-Length: {len(body)}\r\n\r\n{body}\r\n\r\n"),
        ).alias("value")
    )
    t0 = time.perf_counter()
    rec.repartition(n_files).write.mode("overwrite").text(seg_dir)
    print(f"synthesized {n} records in {time.perf_counter() - t0:.1f}s", flush=True)

    from vectordb_bioinsight_spark.pipelines.web_corpus import warc_to_documents
    from vectordb_bioinsight_spark.sources.readers import (
        read_warc,
        warc_responses_to_documents,
    )

    timed("read_warc (header parse)", read_warc(spark, seg_dir))
    timed(
        "warc_responses_to_documents",
        warc_responses_to_documents(read_warc(spark, seg_dir)),
    )
    timed(
        "warc_to_documents (full pipeline: dedup+clean)",
        warc_to_documents(spark, seg_dir, blocked_domains=["site7.org"]),
    )

    import shutil

    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
