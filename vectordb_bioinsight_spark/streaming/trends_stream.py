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


def signup_purchase_stream_join(
    signups: DataFrame,
    purchases: DataFrame,
    max_gap: str = "7 days",
    watermark: str = "1 day",
) -> DataFrame:
    """Stream-stream inner join: each purchase matched to the same user's
    earlier signup within ``max_gap`` (the batch ``signup_before_purchase``
    correlation expressed as a live join).

    Both sides carry watermarks and the join condition carries the
    event-time band — that pair is what lets Spark BOUND the join state:
    a buffered signup can be dropped once the watermark passes
    signup_ts + max_gap (without the band, state grows forever).
    Works identically on static frames (batch-equivalence is the test).

    Output: (user_id, signup_ts, purchase_ts, gap_hours, value).
    """
    s = signups.select(
        F.col("user_id").alias("s_user"), F.col("ts").alias("signup_ts")
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value"),
    )
    if s.isStreaming:
        s = s.withWatermark("signup_ts", watermark)
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("s_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("signup_ts"))
        & (F.col("purchase_ts") <= F.col("signup_ts") + F.expr(f"INTERVAL {max_gap}"))
    )
    joined = s.join(p, cond, "inner")
    return joined.select(
        F.col("s_user").alias("user_id"),
        "signup_ts",
        "purchase_ts",
        F.round(
            (F.unix_timestamp("purchase_ts") - F.unix_timestamp("signup_ts")) / 3600.0, 4
        ).alias("gap_hours"),
        "value",
    )


def dedup_events_stream(
    events: DataFrame,
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming exact dedup by event_id (A15's stream form): state keeps
    only ids within the watermark horizon (``dropDuplicatesWithinWatermark``)
    instead of every id ever seen — the difference between bounded and
    unbounded state on an infinite stream. On a static frame it degrades to
    plain ``dropDuplicates`` (same result set for in-horizon duplicates)."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def funnel_stage_stream(
    stream_df: DataFrame,
    steps: "list[str]",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Live funnel tracking — the streaming twin of
    ``operators/trends.funnel_conversion``: per-user state machine carried
    across micro-batches with ``applyInPandasWithState``, advancing one
    stage whenever the NEXT step's event arrives strictly after the
    current reach time (earliest-completion, the batch semantics).

    Equivalence contract (test-pinned): matches the batch funnel whenever
    each user's events are processed in event-time order — one batch, or
    any batching that keeps a user's events together. A late event older
    than the already-reached stage cannot retro-advance the machine
    (streaming funnels share this limit; bound it upstream with a
    watermark if exactness under disorder matters).

    State per user: (stage, reach-epoch) — two scalars, so state size is
    O(active users), independent of event volume.

    Emits (user, stage, stage_name, reached_ts) on every batch that
    touches the user; update-mode sinks keep the latest row per user.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # the id field inherits the stream's actual type (string/UUID user ids
    # are as valid as longs — only the column NAME is parameterized)
    user_type = stream_df.schema[user_col].dataType.simpleString()
    out_schema = f"{user_col} {user_type}, stage int, stage_name string, reached_ts timestamp"
    state_schema = "stage int, reached double"

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd

        stage, reached = state.get if state.exists else (0, -1.0)
        ev = pd.concat([pdf[[type_col, ts_col]] for pdf in pdfs])
        ev = ev.sort_values(ts_col)
        for t, ts in zip(ev[type_col], ev[ts_col]):
            if stage < len(steps) and t == steps[stage]:
                tsec = ts.timestamp()
                if stage == 0 or tsec > reached:
                    stage += 1
                    reached = tsec
        state.update((int(stage), float(reached)))
        yield pd.DataFrame(
            {
                user_col: [key[0]],
                "stage": [stage],
                "stage_name": [steps[stage - 1] if stage > 0 else None],
                # micro-aligned reconstruction: Arrow refuses ns-precision
                # timestamps that do not cast losslessly to us
                "reached_ts": [
                    pd.Timestamp(int(reached * 1_000_000), unit="us")
                    if stage > 0
                    else pd.NaT
                ],
            }
        )

    return stream_df.groupBy(user_col).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def anomaly_stream(
    stream_df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    window_rows: int = 7,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Live rolling z-score anomaly detection — the streaming twin of
    ``operators/trends.rolling_anomalies``: per-key state carries the
    trailing ``window_rows`` OBSERVED days' totals (the batch op's
    rows-frame, not calendar days) across micro-batches with
    ``applyInPandasWithState``; each newly completed day is scored against
    the self-excluded trailing baseline with the batch arithmetic
    (stddev_samp, 4 dp rounds, NULL zscore on a flat baseline — the
    ADVICE r04 nullif contract).

    Equivalence contract (test-pinned): matches the batch op whenever
    days arrive in event-time order and each day's events are complete
    before the next day begins (one batch, or day-aligned batches). A
    late event for an already-scored day updates state totals but cannot
    retro-score — bound disorder upstream with a watermark if that
    matters.

    State per key: two aligned arrays of at most ``window_rows + 1``
    scalars — O(active keys), independent of event volume.

    Emits (key, day, total, base_mean, base_std, zscore, is_anomaly) for
    every day that completes a full baseline in the batch.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_type = stream_df.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, day date, total double, base_mean double, "
        "base_std double, zscore double, is_anomaly boolean"
    )
    state_schema = "days array<int>, totals array<double>"

    def update(key, pdfs, state: "GroupState"):
        import datetime as dt

        import pandas as pd

        days, totals = state.get if state.exists else ([], [])
        days, totals = list(days), list(totals)
        ev = pd.concat([pdf[[ts_col, value_col]] for pdf in pdfs])
        day_ints = (
            pd.to_datetime(ev[ts_col]).dt.normalize().astype("int64") // 86_400_000_000_000
        )
        per_day = ev[value_col].groupby(day_ints).sum().sort_index()

        out = {c: [] for c in
               ("key", "day", "total", "base_mean", "base_std", "zscore", "is_anomaly")}
        for day, v in per_day.items():
            if days and day <= days[-1]:
                # in-window (or late) refinement: fold into the stored total
                if day in days:
                    totals[days.index(day)] += float(v)
                continue
            total = round(float(v), 4)
            if len(days) >= window_rows:
                base = pd.Series(totals[-window_rows:], dtype="float64")
                mean, std = float(base.mean()), float(base.std(ddof=1))
                zscore = None if std == 0.0 else round((total - mean) / std, 4)
                r_std = round(std, 4)
                out["key"].append(key[0])
                out["day"].append(dt.date(1970, 1, 1) + dt.timedelta(days=int(day)))
                out["total"].append(total)
                out["base_mean"].append(round(mean, 4))
                out["base_std"].append(r_std)
                out["zscore"].append(zscore)
                out["is_anomaly"].append(
                    bool(r_std > 0 and zscore is not None and abs(zscore) >= z_threshold)
                )
            # store the ROUNDED total: the batch op's trailing window reads
            # the 4dp daily aggregate, so the baseline must too
            days.append(int(day))
            totals.append(total)
            if len(days) > window_rows:
                days, totals = days[-window_rows:], totals[-window_rows:]
        state.update((days, totals))
        yield pd.DataFrame({key_col if c == "key" else c: vs for c, vs in out.items()})

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def transition_stream(
    stream_df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    session_gap_s: int = 3600,
) -> DataFrame:
    """Live Markov transition counting — the streaming twin of
    ``operators/trends.event_transition_matrix``: per-user state carries
    (last event type, last epoch) across micro-batches; each arriving
    event whose gap to the previous one is within ``session_gap_s``
    emits a (from, to) pair. The batch op's tie discipline is kept by
    sorting each batch on (ts, id).

    Emits per-batch per-user pair counts (from_type, to_type, n); a
    downstream ``groupBy(from_type, to_type).sum(n)`` over the sink
    recovers the global matrix. Equivalence contract (test-pinned):
    summed emissions equal the batch matrix counts whenever each user's
    events arrive in event-time order across batches.

    State per user: one string + one double — O(active users).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "from_type string, to_type string, n long"
    state_schema = "last_type string, last_epoch double"

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd

        last_type, last_epoch = state.get if state.exists else (None, -1.0)
        ev = pd.concat([pdf[[type_col, ts_col, id_col]] for pdf in pdfs])
        ev = ev.sort_values([ts_col, id_col])
        counts: "dict[tuple[str, str], int]" = {}
        for t, ts in zip(ev[type_col], ev[ts_col]):
            tsec = ts.timestamp()
            if last_type is not None and tsec - last_epoch <= session_gap_s:
                pair = (last_type, t)
                counts[pair] = counts.get(pair, 0) + 1
            last_type, last_epoch = t, tsec
        state.update((last_type, float(last_epoch)))
        yield pd.DataFrame(
            {
                "from_type": [p[0] for p in counts],
                "to_type": [p[1] for p in counts],
                "n": list(counts.values()),
            }
        )

    return stream_df.groupBy(user_col).applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
