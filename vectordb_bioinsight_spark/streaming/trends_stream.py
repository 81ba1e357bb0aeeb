"""Streaming trend aggregation — SURVEY.md §2.11.

The reference's closest analogs are a daily scheduled briefing batch with
week-over-week deltas (bio-daily-briefing/src/scheduler.py:464-480,
trend_analyzer.py:23-66) and year-bucketed keyword trends
(backend/app/utils/trend_analyzer.py:144-282). The engine re-expresses that
as Structured Streaming over an event stream:

* tumbling / sliding event-time windows (``F.window``),
* watermark for late data,
* counts + value aggregates per (window, event_type).

Semantics contract (tested in tests/test_streaming.py): a stream processed
with ``trigger(availableNow=True)`` over a static directory produces exactly
the batch ``groupBy(window(...))`` result — stream/batch equivalence, the
property that makes the batch oracle meaningful for the streaming path.

Scale notes: the aggregation state is keyed by (window, event_type) — bounded
by watermark horizon x type cardinality; shuffle partitions carry partial
aggregates (map-side combine applies to streaming state updates too).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 day",
    slide_duration: str | None = None,
    watermark: str = "1 day",
) -> DataFrame:
    """Windowed counts per event_type. Works on BOTH a static and a streaming
    DataFrame (same code path — that is the point of the Structured
    Streaming model).

    Output: (window_start, window_end, event_type, n, value_sum).
    """
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    win = F.window("ts", window_duration, slide_duration) if slide_duration else F.window("ts", window_duration)
    agg = (
        src.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n"), F.round(F.sum("value"), 4).alias("value_sum"))
    )
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "event_type",
        "n",
        "value_sum",
    )


def stream_events_from_dir(
    spark: SparkSession,
    parquet_dir: str,
    schema,
) -> DataFrame:
    """File-source stream over a parquet directory (one file per micro-batch
    with maxFilesPerTrigger=1 to exercise incremental state)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(parquet_dir)
    )


def run_stream_to_memory(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
) -> "DataFrame":
    """Run a streaming aggregation to completion (availableNow) into an
    in-memory sink and return the result table."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def week_over_week_deltas(windowed: DataFrame) -> DataFrame:
    """The briefing's week_change semantics (trend_analyzer.py:34-66) over
    windowed counts: delta and ratio vs the previous window per event_type."""
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy("window_start")
    prev = F.lag("n").over(w)
    return windowed.select(
        "window_start",
        "event_type",
        "n",
        (F.col("n") - prev).alias("delta"),
        F.when(prev > 0, F.round(F.col("n") / prev, 6)).alias("ratio"),
    )
