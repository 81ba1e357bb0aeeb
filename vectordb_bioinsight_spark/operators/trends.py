"""Corpus/trend analytics — SURVEY.md A6/A7/A8 + streaming batch twin.

Reference: papers-per-year histograms and keyword trend classification
(backend/app/utils/trend_analyzer.py:144-282): split the year range at its
midpoint, compare recent vs older keyword counts, label emerging (>2x),
declining (<0.5x), else stable.

Engine shape: one tokenise+explode pass, two filtered aggregations expressed
as a single conditional aggregation (no second scan), a when-ladder label.
Fully oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.functions.text import STOPWORDS, tokenize


def keyword_frequencies(
    df: DataFrame,
    text_col: str,
    top_n: int = 20,
    drop_stopwords: bool = True,
) -> DataFrame:
    """A7: top-N token frequencies. Output (word, n) ordered desc, word asc
    tiebreak (total order for hash-stable top-N)."""
    words = df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
    if drop_stopwords:
        # isin compiles to InSet (hash lookup) — O(1) per token vs the O(|SW|)
        # linear scan an array_contains(literal array) would do
        words = words.filter(~F.col("word").isin(*STOPWORDS))
    return (
        words.groupBy("word")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(top_n)
    )


def histogram_by_bucket(df: DataFrame, bucket: Column, name: str = "bucket") -> DataFrame:
    """A6: counts per bucket (papers-per-year / events-per-day)."""
    return df.groupBy(bucket.alias(name)).agg(F.count("*").cast("long").alias("n"))


def trend_classification(
    df: DataFrame,
    key_col: str,
    time_col: Column,
    split_point,
    emerging_ratio: float = 2.0,
    declining_ratio: float = 0.5,
) -> DataFrame:
    """A8: emerging/declining/stable per key.

    recent = count where time >= split_point, older = count before it — one
    conditional aggregation (single shuffle). Ratio guards division by zero
    the way the reference does: older==0 & recent>0 -> emerging.
    Output (key, older_n, recent_n, trend).
    """
    agg = df.groupBy(F.col(key_col).alias("key")).agg(
        F.sum(F.when(time_col < split_point, 1).otherwise(0)).cast("long").alias("older_n"),
        F.sum(F.when(time_col >= split_point, 1).otherwise(0)).cast("long").alias("recent_n"),
    )
    trend = (
        F.when((F.col("older_n") == 0) & (F.col("recent_n") > 0), F.lit("emerging"))
        .when(F.col("recent_n") > F.col("older_n") * emerging_ratio, F.lit("emerging"))
        .when(F.col("recent_n") < F.col("older_n") * declining_ratio, F.lit("declining"))
        .otherwise(F.lit("stable"))
    )
    return agg.withColumn("trend", trend)


def new_users_cumulative(df: DataFrame, user_col: str, ts_col: str) -> DataFrame:
    """Daily new-user counts + running distinct-user total — the growth
    curve of the trends tier (trend_analyzer.py's per-day histogram,
    extended to a distinct-entity cumulative).

    The naive form — COUNT(DISTINCT user) OVER (ORDER BY day) — holds the
    full user set per frame and is quadratic; the scalable identity is
    first-seen attribution: each user contributes exactly once, on their
    first day, and the cumulative distinct count is the running SUM of
    daily first-seen counts. That turns the plan into one user-keyed
    min-agg + one day-keyed count + a running sum over the DAY-cardinality
    table (bounded: rows = distinct days, so the unpartitioned window is
    a deliberate driver-scale step over a dimension-sized input, the same
    convention as the trends histograms).

    Output: (day, new_users, cum_users) for every day with >= 1 first-seen
    user.
    """
    first_seen = (
        df.select(F.col(user_col).alias("u"), F.to_date(ts_col).alias("d"))
        .groupBy("u")
        .agg(F.min("d").alias("day"))
    )
    daily = first_seen.groupBy("day").agg(F.count("*").cast("long").alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day", "new_users", F.sum("new_users").over(w).cast("long").alias("cum_users")
    )


def funnel_conversion(
    df: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    steps: "list[str]",
) -> DataFrame:
    """Ordered funnel analysis — how many users complete step 1, then
    step 2 STRICTLY AFTER their step-1 time, and so on (the product-
    analytics staple; reference analog: the event-sequence questions the
    trends tier answers per day, upgraded to per-user ordering).

    Semantics: a user reaches step i at the EARLIEST occurrence of
    ``steps[i]`` strictly after their step-(i-1) reach time. Earliest-
    completion is the standard funnel definition and makes reach times
    unique per (user, step).

    Physical plan: one pass per step — filter to that step's events
    (pushed to the scan), equi-join on user against the previous step's
    reach table WITH the range predicate inside the join, min-agg. All
    shuffles are user-keyed, so a cluster reuses one partitioning across
    every step; the reach table only ever shrinks. len(steps) is small
    and fixed (a query parameter, not data).

    Output: (step, step_name, n_users, conversion) where conversion is
    the fraction of step-1 users reaching this step, rounded 6 dp.
    """
    ev = df.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("t"), F.col(ts_col).alias("ts")
    )
    reach = (
        ev.filter(F.col("t") == steps[0]).groupBy("u").agg(F.min("ts").alias("ts"))
    )
    tables = [reach]
    for step in steps[1:]:
        nxt = ev.filter(F.col("t") == step).select("u", F.col("ts").alias("ts2"))
        reach = (
            reach.join(nxt, "u")
            .filter(F.col("ts2") > F.col("ts"))
            .groupBy("u")
            .agg(F.min("ts2").alias("ts"))
        )
        tables.append(reach)
    branches = [
        t.select(
            F.lit(i + 1).alias("step"),
            F.lit(steps[i]).alias("step_name"),
            F.col("u"),
        )
        for i, t in enumerate(tables)
    ]
    unioned = branches[0]
    for b in branches[1:]:
        unioned = unioned.unionAll(b)
    agg = unioned.groupBy("step", "step_name").agg(
        F.count("*").cast("long").alias("n_users")
    )
    # a step nobody reaches is an EMPTY group — left-join the static step
    # list so every step still emits a row with n_users = 0 (matching the
    # SQL shape, where count(*) over an empty CTE is one 0-row)
    step_dim = df.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step INT, step_name STRING"
    )
    agg = step_dim.join(agg, ["step", "step_name"], "left").withColumn(
        "n_users", F.coalesce(F.col("n_users"), F.lit(0).cast("long"))
    )
    # the agg result is len(steps) rows — the unpartitioned window is a
    # dimension-sized step, same convention as the trends histograms
    base = Window.orderBy("step").rowsBetween(Window.unboundedPreceding, 0)
    return agg.select(
        "step",
        "step_name",
        "n_users",
        F.round(
            F.col("n_users")
            / F.nullif(F.first("n_users").over(base), F.lit(0)),
            6,
        ).alias("conversion"),
    )


def rolling_anomalies(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_rows: int = 7,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Rolling z-score anomaly detection over per-key daily totals — the
    trend-break detector the reference's year-over-year deltas
    (trend_analyzer.py:249-289 growth classification) approximate by eye:
    a day is anomalous when its total deviates from the trailing
    ``window_rows``-day mean by >= ``z_threshold`` trailing standard
    deviations.

    Physical plan: one (key, day) groupBy (map-side combinable), then one
    KEY-partitioned ordered window for the trailing mean/std — rows per
    key = distinct days, so the window input is calendar-bounded however
    large the fact table is. The current day is EXCLUDED from its own
    baseline (frame -window..-1): a spike must not mask itself by
    inflating the mean it is compared against.

    Output: (key, day, total, base_mean, base_std, zscore, is_anomaly)
    for days with a full baseline window; rounded 4 dp.
    """
    from pyspark.sql import Window

    daily = df.groupBy(
        F.col(key_col).alias("key"), F.to_date(F.col(ts_col)).alias("day")
    ).agg(F.round(F.sum(value_col), 4).alias("total"))
    w = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(-window_rows, -1)
    )
    base_mean = F.avg("total").over(w)
    base_std = F.stddev_samp("total").over(w)
    n_base = F.count("total").over(w)
    # every window-derived column is materialized BEFORE the baseline-size
    # filter: a window expression referenced after the filter would see the
    # FILTERED frame (fewer trailing rows) and silently shift the baseline
    windowed = (
        daily.withColumn("_n", n_base)
        .withColumn("base_mean", F.round(base_mean, 4))
        .withColumn("base_std", F.round(base_std, 4))
        .withColumn("zscore", F.round((F.col("total") - base_mean) / base_std, 4))
    )
    return (
        windowed.filter(F.col("_n") >= window_rows)  # full baseline only
        .withColumn(
            "is_anomaly",
            F.when(F.col("base_std") > 0, F.abs(F.col("zscore")) >= z_threshold)
            .otherwise(F.lit(False)),
        )
        .select("key", "day", "total", "base_mean", "base_std", "zscore", "is_anomaly")
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly cohort retention — the user-lifecycle matrix every analytics
    stack ships: users grouped by FIRST-SEEN week, retention(k) = fraction
    of the cohort active k weeks later.

    Physical plan: one user-keyed min-agg (first-seen week), one
    (user, week) distinct activity projection, one broadcast-back join on
    user, one (cohort, offset) count — every shuffle user- or
    cohort-keyed; the output is calendar² bounded.

    Output: (cohort_week, week_offset, n_active, cohort_size, retention)
    with retention rounded 6 dp; week_offset 0 row carries the cohort
    size by construction.

    Weeks are ``date_trunc('week')`` Mondays — NOT year*52+weekofyear,
    which mislabels ISO year-boundary weeks (Jan 1 can be ISO week 52 of
    the prior year) and breaks offsets across New Year.
    """
    weeks = df.select(
        F.col(user_col).alias("u"),
        F.to_date(F.date_trunc("week", F.col(ts_col))).alias("wk"),
    )
    first = weeks.groupBy("u").agg(F.min("wk").alias("cohort_week"))
    active = weeks.distinct()
    joined = active.join(first, "u").select(
        "cohort_week",
        (F.datediff(F.col("wk"), F.col("cohort_week")) / 7).cast("long").alias("week_offset"),
        "u",
    )
    counts = joined.groupBy("cohort_week", "week_offset").agg(
        F.count_distinct("u").cast("long").alias("n_active")
    )
    sizes = first.groupBy("cohort_week").agg(
        F.count("*").cast("long").alias("cohort_size")
    )
    return (
        counts.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
        )
    )
