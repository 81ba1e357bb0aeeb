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


def session_window_counts(
    events: DataFrame,
    gap: str = "1 hour",
    watermark: str = "1 day",
) -> DataFrame:
    """Session windows (gap-based) per user — the streaming twin of the
    batch ``sessionize`` operator (catalog_network.q_sessionize): a session
    closes after ``gap`` of silence. Same code path batch/stream.

    Output: (user_id, session_start, session_end, n_events, value_sum).
    """
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    agg = src.groupBy(F.session_window("ts", gap).alias("w"), "user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(F.sum("value"), 4).alias("value_sum"),
    )
    return agg.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
        "value_sum",
    )


def stateful_type_totals(stream_df: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` (SURVEY §2.11):
    per event_type running totals carried in explicit state across
    micro-batches — the engine's extension point for stateful logic that
    windowed aggregation cannot express (e.g. the briefing's cumulative
    week-over-week ledger, trend_analyzer.py:23-66).

    Emits (event_type, n_total, value_total) each time a batch touches the
    key; the memory-sink table in update mode keeps the latest per key.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "event_type string, n_total long, value_total double"
    state_schema = "n long, v double"

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd

        n, v = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            v += float(pdf["value"].sum())
        state.update((n, round(v, 4)))
        yield pd.DataFrame(
            {"event_type": [key[0]], "n_total": [n], "value_total": [round(v, 4)]}
        )

    return (
        stream_df.groupBy("event_type")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
