#!/usr/bin/env python
"""Streaming-tier state/throughput probe (VERDICT r10 item 9).

Two measurements, both on the 100 TB-relevant axes:

1. **ingest_stream growth law**: drive N identical-size JSONL batches
   through ``run_ingest_stream`` (quality gate -> in-batch dedup -> Bloom
   dedup against the corpus built so far -> append) and record per-batch
   wall time as the corpus grows. The design claim to check: per-batch cost
   is (batch work) + (corpus-hash scan for the Bloom build + confirm) —
   i.e. LINEAR in corpus size with a small slope (the corpus is scanned on
   its 8-byte hash projection, never shuffled), not quadratic.

2. **windowed_event_counts state**: run the watermarked sliding-window
   aggregation over a 10x event batch and read the state-store operator
   metrics from the query progress (numRowsTotal, memoryUsedBytes) — the
   state is keyed by (window x event_type) and must stay bounded by the
   watermark horizon, not the row count.

Usage: python scripts/probe_r11_streaming.py [n_batches] [rows_per_batch]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from vectordb_bioinsight_spark.session import get_session  # noqa: E402


def probe_ingest(spark, n_batches: int, rows_per_batch: int, work: str) -> list[dict]:
    from vectordb_bioinsight_spark.streaming.ingest_stream import (
        run_ingest_stream,
        stream_documents_from_dir,
    )

    landing = os.path.join(work, "landing")
    corpus = os.path.join(work, "corpus")
    os.makedirs(landing, exist_ok=True)
    rows = []
    for b in range(n_batches):
        # deterministic batch: 10% exact dupes of batch 0 (exercises the
        # against-corpus path), the rest unique
        batch = spark.range(rows_per_batch).select(
            (F.col("id") + b * rows_per_batch).alias("doc_id"),
            F.concat(
                F.lit("document body text token stream number "),
                F.when(F.col("id") % 10 == 0, F.col("id") % rows_per_batch)
                .otherwise(F.col("id") + b * rows_per_batch)
                .cast("string"),
            ).alias("text"),
            F.lit("en").alias("lang"),
            F.lit("probe").alias("source"),
        )
        batch.coalesce(1).write.mode("overwrite").json(os.path.join(landing, f"b{b:03d}"))
        ckpt = os.path.join(work, f"ckpt{b:03d}")
        t0 = time.perf_counter()
        run_ingest_stream(
            stream_documents_from_dir(spark, os.path.join(landing, f"b{b:03d}", "*.json")),
            corpus,
            ckpt,
            bloom_bits=1 << 20,
        )
        dt = time.perf_counter() - t0
        n_corpus = spark.read.parquet(corpus).count()
        rows.append({"batch": b, "sec": round(dt, 3), "corpus_rows": n_corpus})
        print(f"ingest batch {b}: {dt:.3f} s, corpus={n_corpus}", flush=True)
    return rows


def probe_windowed_state(spark, n_rows: int, work: str) -> dict:
    from vectordb_bioinsight_spark.streaming.trends_stream import windowed_event_counts

    src_dir = os.path.join(work, "events")
    # n_rows events over 30 days x 8 types, sliding 1d/6h windows
    spark.range(n_rows).select(
        (F.to_timestamp(F.lit("2024-01-01 00:00:00")) +
         F.make_interval(mins=(F.col("id") * 7) % (30 * 24 * 60))).alias("ts"),
        F.concat(F.lit("type_"), (F.col("id") % 8).cast("string")).alias("event_type"),
        (F.col("id") % 100).cast("double").alias("value"),
    ).coalesce(4).write.mode("overwrite").json(src_dir)

    stream = spark.readStream.schema("ts timestamp, event_type string, value double").json(src_dir)
    agg = windowed_event_counts(stream, window_duration="1 day", slide_duration="6 hours",
                                watermark="1 day")
    sink = os.path.join(work, "win_out")
    ckpt = os.path.join(work, "win_ckpt")
    t0 = time.perf_counter()
    q = (agg.writeStream.outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start(sink, format="parquet"))
    q.awaitTermination()
    dt = time.perf_counter() - t0
    progress = q.lastProgress
    ops = (progress or {}).get("stateOperators", [])
    out = {
        "sec": round(dt, 3),
        "input_rows": n_rows,
        "state_operators": [
            {k: op.get(k) for k in
             ("operatorName", "numRowsTotal", "numRowsUpdated", "memoryUsedBytes")}
            for op in ops
        ],
    }
    print(json.dumps(out), flush=True)
    return out


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rows_per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    work = tempfile.mkdtemp(prefix="stream_probe_")
    spark = get_session("probe-streaming", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    try:
        ingest = probe_ingest(spark, n_batches, rows_per_batch, work)
        state = probe_windowed_state(spark, rows_per_batch * 10, work)
        print(json.dumps({"ingest": ingest, "windowed": state}))
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
