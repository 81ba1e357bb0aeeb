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


def test_session_windows_stream_batch_equivalence(spark, event_files):
    from vectordb_bioinsight_spark.streaming.trends_stream import session_window_counts

    path, schema = event_files
    batch = session_window_counts(spark.read.schema(schema).parquet(path))
    # files arrive in random time order, so batch/stream equivalence requires
    # a watermark wider than the fixture's full span — with a tight watermark
    # session state is finalized and genuinely-late events are dropped, which
    # is the documented streaming semantics, not a bug
    stream = session_window_counts(
        stream_events_from_dir(spark, path, schema), watermark="365 days"
    )
    got = run_stream_to_memory(stream, "session_counts_test")
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in got.collect()}
    assert b == s and len(b) > 0
    # sessions for one user never overlap
    rows = sorted(
        (r for r in b if r[0] == next(iter(b))[0]), key=lambda r: r[1]
    )
    for prev, cur in zip(rows, rows[1:]):
        assert cur[1] >= prev[2]


def test_stateful_type_totals_accumulates(spark, event_files):
    from vectordb_bioinsight_spark.streaming.trends_stream import stateful_type_totals

    path, schema = event_files
    stream = stateful_type_totals(stream_events_from_dir(spark, path, schema))
    q = (
        stream.writeStream.format("memory")
        .queryName("stateful_totals_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode appends one row per (batch, key); the LAST row per key is
    # the final state — compare against the batch ground truth
    got = (
        spark.table("stateful_totals_test")
        .groupBy("event_type")
        .agg(F.max("n_total").alias("n"), F.max("value_total").alias("v"))
    )
    want = (
        spark.read.schema(schema)
        .parquet(path)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("v"))
    )
    g = {r["event_type"]: (r["n"], r["v"]) for r in got.collect()}
    w = {r["event_type"]: (r["n"], r["v"]) for r in want.collect()}
    assert g.keys() == w.keys()
    for k in w:
        assert g[k][0] == w[k][0]
        assert abs(g[k][1] - w[k][1]) < 0.01


def test_foreachbatch_incremental_parquet_sink(spark, event_files, tmp_path):
    """S11/S13 incremental sink: stream micro-batches appended to a parquet
    table via foreachBatch; the final table equals the batch input."""
    path, schema = event_files
    out = str(tmp_path / "events_sink")
    stream = stream_events_from_dir(spark, path, schema)

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination()
    got = spark.read.parquet(out)
    want = spark.read.schema(schema).parquet(path)
    assert got.count() == want.count()
    assert {r["event_id"] for r in got.select("event_id").collect()} == {
        r["event_id"] for r in want.select("event_id").collect()
    }


def test_stream_stream_join_batch_equivalence(spark, event_files):
    """The watermarked stream-stream join returns exactly the batch join on
    the same files (append mode — rows emit once both watermarks pass)."""
    from vectordb_bioinsight_spark.streaming.trends_stream import (
        signup_purchase_stream_join,
    )

    path, schema = event_files
    static = spark.read.schema(schema).parquet(path)
    signups_b = static.filter(F.col("event_type") == "signup")
    purchases_b = static.filter(F.col("event_type") == "purchase")
    batch = signup_purchase_stream_join(signups_b, purchases_b)

    # files are not time-ordered, so give a watermark covering the full span:
    # equivalence holds for any data within the lateness horizon (rows beyond
    # it are DROPPED by design - that is the late-data contract, not a bug)
    src = stream_events_from_dir(spark, path, schema)
    stream = signup_purchase_stream_join(
        src.filter(F.col("event_type") == "signup"),
        src.filter(F.col("event_type") == "purchase"),
        watermark="90 days",
    )
    got = run_stream_to_memory(stream, "ss_join_test", output_mode="append")
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in got.collect()}
    assert len(b) > 0
    assert s == b


def test_stream_dedup_bounded_state(spark, event_files, tmp_path):
    """Duplicated input files -> the streaming dedup emits each event_id
    once, equal to batch dropDuplicates on the same data."""
    from vectordb_bioinsight_spark.streaming.trends_stream import dedup_events_stream

    path, schema = event_files
    dup_dir = str(tmp_path / "dup_events")
    ev = spark.read.schema(schema).parquet(path)
    ev.write.mode("overwrite").parquet(dup_dir)
    ev.write.mode("append").parquet(dup_dir)  # every event twice

    n_unique = ev.select("event_id").distinct().count()
    stream = dedup_events_stream(
        stream_events_from_dir(spark, dup_dir, schema), watermark="90 days"
    )
    got = run_stream_to_memory(stream, "dedup_stream_test", output_mode="append")
    assert got.select("event_id").distinct().count() == n_unique
    assert got.count() == n_unique


def test_funnel_stream_matches_batch(spark, tmp_path_factory):
    """Streaming funnel == batch funnel when each user's events stay
    together: per-stage user counts must agree with funnel_conversion."""
    from vectordb_bioinsight_spark.operators.trends import funnel_conversion
    from vectordb_bioinsight_spark.streaming.trends_stream import funnel_stage_stream

    steps = ["signup", "view", "purchase"]
    ev = load_table(spark, SF_SMALL, "events")
    # hash-partition by user so every user's events land in ONE file ->
    # one batch touch per user regardless of file processing order
    path = str(tmp_path_factory.mktemp("funnel_stream"))
    ev.select("user_id", "event_type", "ts").repartition(4, "user_id").write.mode(
        "overwrite"
    ).parquet(path)
    schema = spark.read.parquet(path).schema

    stream = funnel_stage_stream(stream_events_from_dir(spark, path, schema), steps)
    got = run_stream_to_memory(stream, "funnel_stream_test", output_mode="update")
    # update-mode memory sink may append one row per touch; keep the last
    # (= highest stage) per user
    final = (
        got.groupBy("user_id").agg(F.max("stage").alias("stage"))
    )
    stream_counts = {
        i: final.filter(F.col("stage") >= i).count() for i in range(1, len(steps) + 1)
    }
    batch = funnel_conversion(ev, "user_id", "event_type", "ts", steps)
    batch_counts = {r["step"]: r["n_users"] for r in batch.collect()}
    assert stream_counts == batch_counts
    assert stream_counts[1] > 0


def test_funnel_stream_string_user_ids(spark, tmp_path_factory):
    """The output id field inherits the stream's actual type — string/UUID
    user ids must work, not just longs (ADVICE r03: out_schema hardcoded
    `long` while parameterizing the column name)."""
    from vectordb_bioinsight_spark.streaming.trends_stream import funnel_stage_stream

    steps = ["signup", "view"]
    path = str(tmp_path_factory.mktemp("funnel_stream_str"))
    ev = spark.createDataFrame(
        [("u-a", "signup", "2024-01-01 00:00:00"),
         ("u-a", "view", "2024-01-02 00:00:00"),
         ("u-b", "signup", "2024-01-03 00:00:00")],
        "uid string, event_type string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    ev.repartition(1).write.mode("overwrite").parquet(path)
    schema = spark.read.parquet(path).schema

    stream = funnel_stage_stream(
        stream_events_from_dir(spark, path, schema), steps, user_col="uid"
    )
    got = run_stream_to_memory(stream, "funnel_stream_str_test", output_mode="update")
    assert got.schema["uid"].dataType.simpleString() == "string"
    final = {r["uid"]: r["stage"] for r in
             got.groupBy("uid").agg(F.max("stage").alias("stage")).collect()}
    assert final == {"u-a": 2, "u-b": 1}


def test_cms_stream_matches_batch_sketch(spark, tmp_path_factory):
    """Streaming CMS (bounded depth*width state) must equal cms_build over
    the same documents cell-for-cell, and estimates through the streamed
    sketch must equal batch estimates."""
    from vectordb_bioinsight_spark.operators.sketches import cms_build, cms_estimate
    from vectordb_bioinsight_spark.streaming.sketch_stream import cms_term_stream
    from vectordb_bioinsight_spark.functions.text import tokenize

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text").limit(200)
    path = str(tmp_path_factory.mktemp("cms_stream"))
    docs.repartition(4).write.mode("overwrite").parquet(path)
    schema = spark.read.parquet(path).schema
    static = spark.read.parquet(path)

    stream = cms_term_stream(
        stream_events_from_dir(spark, path, schema), "text", width=256, depth=4
    )
    got = run_stream_to_memory(stream, "cms_stream_test", output_mode="complete")
    assert got.count() <= 256 * 4  # bounded state, by construction

    toks = static.select(F.explode(tokenize(F.col("text"))).alias("term"))
    want = cms_build(toks, "term", width=256, depth=4)
    streamed = {(r["j"], r["bucket"]): r["cnt"] for r in got.collect()}
    batch = {(r["j"], r["bucket"]): r["cnt"] for r in want.collect()}
    assert streamed == batch

    watch = spark.createDataFrame([("join",), ("merge",), ("zzzz",)], ["term"])
    est_stream = {r["term"]: r["cms_est"] for r in
                  cms_estimate(got, watch, "term", 256, 4).collect()}
    est_batch = {r["term"]: r["cms_est"] for r in
                 cms_estimate(want, watch, "term", 256, 4).collect()}
    assert est_stream == est_batch
    assert est_stream["join"] > 0


def test_anomaly_stream_matches_batch(spark, tmp_path_factory):
    """Streaming rolling-anomaly == batch rolling_anomalies when events
    arrive day-ordered in one batch: same rows, same rounded stats, same
    NULL-zscore-on-flat-baseline contract."""
    from vectordb_bioinsight_spark.operators.trends import rolling_anomalies
    from vectordb_bioinsight_spark.streaming.trends_stream import anomaly_stream

    ev = load_table(spark, SF_SMALL, "events")
    path = str(tmp_path_factory.mktemp("anomaly_stream"))
    ev.select("event_type", "ts", "value").repartition(2, "event_type").write.mode(
        "overwrite"
    ).parquet(path)
    schema = spark.read.parquet(path).schema

    stream = anomaly_stream(stream_events_from_dir(spark, path, schema))
    got = run_stream_to_memory(stream, "anomaly_stream_test", output_mode="append")
    want = rolling_anomalies(ev, "event_type", "ts", "value", window_rows=7)

    g = {(r["event_type"], str(r["day"])): (r["total"], r["base_mean"], r["base_std"],
                                            r["zscore"], r["is_anomaly"])
         for r in got.collect()}
    w = {(r["key"], str(r["day"])): (r["total"], r["base_mean"], r["base_std"],
                                     r["zscore"], r["is_anomaly"])
         for r in want.collect()}
    assert g == w and len(g) > 0


def test_transition_stream_matches_batch(spark, tmp_path_factory):
    """Summed streaming transition emissions == the batch matrix counts
    when each user's events stay in one file (event-time order kept)."""
    from vectordb_bioinsight_spark.operators.trends import event_transition_matrix
    from vectordb_bioinsight_spark.streaming.trends_stream import transition_stream

    ev = load_table(spark, SF_SMALL, "events")
    path = str(tmp_path_factory.mktemp("transition_stream"))
    ev.select("user_id", "event_type", "ts", "event_id").repartition(
        2, "user_id"
    ).write.mode("overwrite").parquet(path)
    schema = spark.read.parquet(path).schema

    stream = transition_stream(stream_events_from_dir(spark, path, schema))
    got = run_stream_to_memory(stream, "transition_stream_test", output_mode="append")
    stream_counts = {
        (r["from_type"], r["to_type"]): r["total"]
        for r in got.groupBy("from_type", "to_type")
        .agg(F.sum("n").alias("total"))
        .collect()
    }
    batch = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in event_transition_matrix(
            ev, "user_id", "event_type", "ts", "event_id"
        ).collect()
    }
    assert stream_counts == batch and len(batch) > 0
