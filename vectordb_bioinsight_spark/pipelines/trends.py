"""The daily-briefing trend dataflow — SURVEY §2.11 composed end-to-end.

Reference: scheduled batch computing per-topic counts, week-over-week deltas
and emerging/declining/stable labels from persisted history
(bio-daily-briefing/src/scheduler.py:464-480, trend_analyzer.py:23-66;
year-bucketed variant backend/app/utils/trend_analyzer.py:232-282).

Engine: ONE composition that runs identically on a static DataFrame (the
scheduled-batch mode) and — because every stage is window/agg algebra over
event time — on a stream via ``windowed_event_counts``'s shared code path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.streaming.trends_stream import (
    week_over_week_deltas,
    windowed_event_counts,
)


def classify_trends(deltas: DataFrame, up_ratio: float = 2.0, down_ratio: float = 0.5) -> DataFrame:
    """The reference's emerging/declining/stable thresholds
    (trend_analyzer.py:232-282: >2x recent = emerging, <0.5x = declining)."""
    label = (
        F.when(F.col("ratio") >= up_ratio, "emerging")
        .when(F.col("ratio") <= down_ratio, "declining")
        .when(F.col("ratio").isNull(), "new")
        .otherwise("stable")
    )
    return deltas.withColumn("trend", label)


def run_trend_briefing(
    events: DataFrame,
    window_duration: str = "7 days",
) -> DataFrame:
    """Weekly counts per event_type → deltas/ratios vs previous window →
    trend labels. Output: (window_start, event_type, n, delta, ratio, trend).
    """
    win = windowed_event_counts(events, window_duration)
    deltas = week_over_week_deltas(win)
    return classify_trends(deltas)
