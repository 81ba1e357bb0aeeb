"""Stream/batch equivalence for the trend path (SURVEY §2.11): the streaming
windowed aggregation over a file source must equal the batch groupBy(window)
on the same data — this is what licenses the batch oracle for streaming."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vectordb_bioinsight_spark.sources.readers import load_table
from vectordb_bioinsight_spark.streaming.trends_stream import (
    run_stream_to_memory,
    stream_events_from_dir,
    week_over_week_deltas,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def event_files(spark, tmp_path_factory):
    """Split sf0.001 events into several parquet files so maxFilesPerTrigger
    produces real multi-batch incremental state."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_table(spark, SF_SMALL, "events")
    ev.repartition(4).write.mode("overwrite").parquet(out)
    return out, ev.schema


def test_stream_batch_equivalence(spark, event_files):
    path, schema = event_files
    batch = windowed_event_counts(spark.read.schema(schema).parquet(path))
    stream = windowed_event_counts(stream_events_from_dir(spark, path, schema))
    got = run_stream_to_memory(stream, "windowed_counts_test")
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in got.collect()}
    assert b == s
    assert len(b) > 0


def test_sliding_windows_and_deltas(spark, event_files):
    path, schema = event_files
    ev = spark.read.schema(schema).parquet(path)
    win = windowed_event_counts(ev, "7 days", "1 day")
    deltas = week_over_week_deltas(win)
    rows = deltas.filter(F.col("event_type") == "click").orderBy("window_start").collect()
    assert len(rows) > 5
    # first window has no predecessor
    assert rows[0]["delta"] is None
    # delta consistency: n[i] - n[i-1] == delta[i]
    for prev, cur in zip(rows, rows[1:]):
        assert cur["delta"] == cur["n"] - prev["n"]


def test_watermark_accepted_on_stream(spark, event_files):
    path, schema = event_files
    stream = windowed_event_counts(stream_events_from_dir(spark, path, schema), watermark="2 days")
    assert stream.isStreaming
