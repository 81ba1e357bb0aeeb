"""Events & statistics query catalog — SURVEY.md §2.5 windows, A3/A4 stats,
A6/A8 trends, plus the as-of/range join capabilities, on the driver's
``events`` table. Each query paired with its DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.joins import asof_join
from vectordb_bioinsight_spark.operators.stats import bh_adjust, group_moments
from vectordb_bioinsight_spark.operators.trends import trend_classification
from vectordb_bioinsight_spark.operators.windows import percent_composition
from vectordb_bioinsight_spark.functions.stats import welch_t
from vectordb_bioinsight_spark.sources.readers import load_table

SPLIT_TS = "2024-01-16"


def q_daily_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: counts per (day, event_type)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.count("*").cast("long").alias("n"), F.round(F.sum("value"), 4).alias("value_sum"))
    )


SQL_DAILY_EVENT_COUNTS = """
SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, event_type, count(*) AS n, round(sum(value), 4) AS value_sum
FROM events GROUP BY 1, 2
"""


def q_event_share_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: percent composition of event types within each day."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type").agg(
        F.count("*").cast("long").alias("n")
    )
    out = percent_composition(counts, ["day"], "n", "pct")
    return out.select("day", "event_type", "n", F.round("pct", 6).alias("pct"))


SQL_EVENT_SHARE_PER_DAY = """
WITH counts AS (
  SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, event_type, count(*) AS n FROM events GROUP BY 1, 2
)
SELECT day, event_type, n, round(n / sum(n) OVER (PARTITION BY day)::DOUBLE, 6) AS pct
FROM counts
"""


def q_event_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: emerging/declining/stable per event_type, split at mid-month
    (trend_analyzer.py:232-282 ratio rules)."""
    ev = load_table(spark, sf_dir, "events")
    return trend_classification(ev, "event_type", F.col("ts"), F.lit(SPLIT_TS).cast("timestamp"))


SQL_EVENT_TRENDS = f"""
WITH agg AS (
  SELECT event_type AS key,
         CAST(sum(CASE WHEN ts <  TIMESTAMP '{SPLIT_TS}' THEN 1 ELSE 0 END) AS BIGINT) AS older_n,
         CAST(sum(CASE WHEN ts >= TIMESTAMP '{SPLIT_TS}' THEN 1 ELSE 0 END) AS BIGINT) AS recent_n
  FROM events GROUP BY 1
)
SELECT key, older_n, recent_n,
       CASE WHEN older_n = 0 AND recent_n > 0 THEN 'emerging'
            WHEN recent_n > older_n * 2.0 THEN 'emerging'
            WHEN recent_n < older_n * 0.5 THEN 'declining'
            ELSE 'stable' END AS trend
FROM agg
"""


def q_signup_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward): each purchase matched to the user's latest
    signup at-or-before it. SURVEY §2.3 'Absent' capability; implemented as
    the scalable union-and-carry composition, oracled by DuckDB's native
    ASOF LEFT JOIN."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("signup_ts")
    )
    out = asof_join(
        purchases,
        signups.withColumn("sts", F.col("signup_ts")),
        on="user_id",
        left_ts="ts",
        right_ts="sts",
        value_cols=["signup_ts"],
    )
    return out.select("event_id", "user_id", "signup_ts")


SQL_SIGNUP_BEFORE_PURCHASE = """
SELECT p.event_id, p.user_id, s.ts AS signup_ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
"""


def q_welch_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: Welch t statistic per event_type — first half of the month vs the
    second. Moments in one conditional aggregation; t is closed-form
    (agent1_deg.py:390-414 semantics, JVM-side)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "half", F.when(F.col("ts") < F.lit(SPLIT_TS).cast("timestamp"), "a").otherwise("b")
    )
    m = group_moments(ev, ["event_type"], "half", "value", "a", "b")
    out = m.withColumn(
        "t_stat", welch_t(F.col("mean_a"), F.col("var_a"), F.col("n_a"), F.col("mean_b"), F.col("var_b"), F.col("n_b"))
    )
    return out.select(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round("t_stat", 6).alias("t_stat"),
    )


SQL_WELCH_HALVES = f"""
WITH m AS (
  SELECT event_type,
         avg(CASE WHEN ts <  TIMESTAMP '{SPLIT_TS}' THEN value END) AS mean_a,
         var_samp(CASE WHEN ts <  TIMESTAMP '{SPLIT_TS}' THEN value END) AS var_a,
         count(CASE WHEN ts <  TIMESTAMP '{SPLIT_TS}' THEN value END)::DOUBLE AS n_a,
         avg(CASE WHEN ts >= TIMESTAMP '{SPLIT_TS}' THEN value END) AS mean_b,
         var_samp(CASE WHEN ts >= TIMESTAMP '{SPLIT_TS}' THEN value END) AS var_b,
         count(CASE WHEN ts >= TIMESTAMP '{SPLIT_TS}' THEN value END)::DOUBLE AS n_b
  FROM events GROUP BY 1
)
SELECT event_type, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
       round((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b), 6) AS t_stat
FROM m
"""


def q_bh_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: BH-FDR over a deterministic pseudo-p column ((event_id*37) mod
    1000 / 1000), including tie groups (multipletests 'fdr_bh' parity).

    HEADLINE entry — routed through the SCALE implementation
    (operators/stats.bh_adjust_scaled: repartitionByRange two-phase rank +
    driver-carry reverse cummin, NO single-partition window), so the plan
    the driver checks and bench times is the one that survives 100x. The
    windowed convenience form is ``bh_adjust_windowed``."""
    from vectordb_bioinsight_spark.operators.stats import bh_adjust_scaled

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", (((F.col("event_id") * 37) % 1000) / 1000.0).alias("pvalue")
    )
    out = bh_adjust_scaled(ev, "pvalue", "padj", num_partitions=16)
    return out.select("event_id", F.round("pvalue", 6).alias("pvalue"), F.round("padj", 6).alias("padj"))


SQL_BH_ADJUST = """
WITH p AS (
  SELECT event_id, ((event_id * 37) % 1000) / 1000.0 AS pvalue FROM events
), ranked AS (
  SELECT event_id, pvalue,
         row_number() OVER (ORDER BY pvalue ASC) AS rnk,
         count(*) OVER () AS n
  FROM p
), raw AS (
  SELECT event_id, pvalue, pvalue * n::DOUBLE / rnk AS raw, rnk FROM ranked
)
SELECT event_id, round(pvalue, 6) AS pvalue,
       round(least(min(raw) OVER (ORDER BY pvalue DESC, rnk DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 1.0), 6) AS padj
FROM raw
"""


def q_user_event_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered window: event sequence number and running value sum —
    the per-entity stateful-scan shape that becomes a keyed stream at scale."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        F.row_number().over(w).cast("long").alias("seq"),
        F.round(F.sum("value").over(wsum), 4).alias("running_value"),
    )


SQL_USER_EVENT_WINDOW_STATS = """
SELECT user_id, event_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS BIGINT) AS seq,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
FROM events
"""


def q_bh_adjust_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 small-table convenience form: double-window reverse-cummin
    (operators/stats.bh_adjust). Acceptable only on aggregated per-gene
    tables; the headline ``bh_adjust`` entry uses the scaled implementation.
    Exact equivalence between the two forms is unit-test-pinned; same
    oracle as ``bh_adjust``."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", (((F.col("event_id") * 37) % 1000) / 1000.0).alias("pvalue")
    )
    out = bh_adjust(ev, "pvalue", "padj")
    return out.select(
        "event_id", F.round("pvalue", 6).alias("pvalue"), F.round("padj", 6).alias("padj")
    )


def q_event_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group discrete quantiles (p50/p90/p99 of value per
    event_type) — operators/relational.group_quantiles: value at rank
    max(1, ceil(q*n)), an actual group member, so it hash-matches the
    identically-defined SQL. The sketch path (percentile_approx) is the
    100 TB default and is tolerance-tested against this in unit tests."""
    from vectordb_bioinsight_spark.operators.relational import group_quantiles

    ev = load_table(spark, sf_dir, "events")
    out = group_quantiles(ev, ["event_type"], "value", [0.5, 0.9, 0.99])
    return out.select(
        "event_type",
        "n",
        F.round("p50", 6).alias("p50"),
        F.round("p90", 6).alias("p90"),
        F.round("p99", 6).alias("p99"),
    )


SQL_EVENT_VALUE_QUANTILES = """
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type, max(n)::BIGINT AS n,
       round(max(CASE WHEN rn = greatest(1, ceil(0.5  * n)) THEN value END), 6) AS p50,
       round(max(CASE WHEN rn = greatest(1, ceil(0.9  * n)) THEN value END), 6) AS p90,
       round(max(CASE WHEN rn = greatest(1, ceil(0.99 * n)) THEN value END), 6) AS p99
FROM r GROUP BY event_type
"""


def q_weekly_topic_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.11 driver proxy for the streaming trend tier: the EXACT plan the
    streaming path runs — ``windowed_event_counts(window(ts, '7 days'))``
    counts + value sums per event_type, then the briefing's
    week-over-week delta/ratio (trend_analyzer.py:23-66).

    Structured Streaming's stream==batch equivalence (pinned by
    tests/test_streaming.py with trigger(availableNow=True)) makes this
    batch run semantically identical to the streaming aggregation, so a
    driver hash-match here certifies the streaming tier's window/agg
    semantics, which otherwise have no driver row."""
    from vectordb_bioinsight_spark.streaming.trends_stream import (
        week_over_week_deltas,
        windowed_event_counts,
    )

    ev = load_table(spark, sf_dir, "events")
    windowed = windowed_event_counts(ev, window_duration="7 days")
    return week_over_week_deltas(windowed)


SQL_WEEKLY_TOPIC_WINDOWS = """
WITH win AS (
  SELECT make_timestamp((floor(epoch(ts) / 604800) * 604800)::BIGINT * 1000000) AS window_start,
         event_type, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
)
SELECT window_start, event_type, n,
       n - lag(n) OVER w AS delta,
       CASE WHEN lag(n) OVER w > 0 THEN round(n::DOUBLE / lag(n) OVER w, 6) END AS ratio
FROM win
WINDOW w AS (PARTITION BY event_type ORDER BY window_start)
"""


def q_winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type winsorization of ``value`` at the exact discrete
    p5/p95 — every event kept, outliers clamped, with a clipped flag."""
    from vectordb_bioinsight_spark.operators.stats import winsorize_by_group

    ev = load_table(spark, sf_dir, "events")
    out = winsorize_by_group(ev, ["event_type"], "value", lo=0.05, hi=0.95)
    return out.select(
        "event_id",
        "event_type",
        F.round("value", 6).alias("value"),
        F.round("value_w", 6).alias("value_w"),
        "clipped",
    )


SQL_WINSORIZE_VALUES = """
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
), b AS (
  SELECT event_type,
         max(CASE WHEN rn = greatest(1, ceil(0.05 * n)) THEN value END) AS lo,
         max(CASE WHEN rn = greatest(1, ceil(0.95 * n)) THEN value END) AS hi
  FROM r GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       round(e.value, 6) AS value,
       round(least(greatest(e.value, b.lo), b.hi), 6) AS value_w,
       (e.value < b.lo OR e.value > b.hi) AS clipped
FROM events e JOIN b ON e.event_type = b.event_type
"""


def q_new_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new users + cumulative distinct users via first-seen
    attribution (the linear-plan alternative to a distinct-count window)."""
    from vectordb_bioinsight_spark.operators.trends import new_users_cumulative

    ev = load_table(spark, sf_dir, "events")
    return new_users_cumulative(ev, "user_id", "ts").withColumn(
        "day", F.col("day").cast("timestamp")
    )


SQL_NEW_USERS_DAILY = """
WITH fs AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
), daily AS (
  SELECT day, count(*)::BIGINT AS new_users FROM fs GROUP BY day
)
SELECT CAST(day AS TIMESTAMP) AS day, new_users,
       (sum(new_users) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_users
FROM daily
"""


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step ordered funnel (signup -> view -> purchase): users
    reaching each step strictly after their previous-step time, with
    conversion vs step 1."""
    from vectordb_bioinsight_spark.operators.trends import funnel_conversion

    ev = load_table(spark, sf_dir, "events")
    return funnel_conversion(
        ev, "user_id", "event_type", "ts", ["signup", "view", "purchase"]
    )


SQL_FUNNEL_CONVERSION = """
WITH s1 AS (
  SELECT user_id AS u, min(ts) AS ts FROM events WHERE event_type = 'signup' GROUP BY 1
), s2 AS (
  SELECT e.user_id AS u, min(e.ts) AS ts
  FROM events e JOIN s1 ON s1.u = e.user_id AND e.ts > s1.ts
  WHERE e.event_type = 'view' GROUP BY 1
), s3 AS (
  SELECT e.user_id AS u, min(e.ts) AS ts
  FROM events e JOIN s2 ON s2.u = e.user_id AND e.ts > s2.ts
  WHERE e.event_type = 'purchase' GROUP BY 1
), c AS (
  SELECT 1 AS step, 'signup' AS step_name, count(*)::BIGINT AS n_users FROM s1
  UNION ALL SELECT 2, 'view', count(*)::BIGINT FROM s2
  UNION ALL SELECT 3, 'purchase', count(*)::BIGINT FROM s3
)
SELECT step, step_name, n_users,
       round(n_users / nullif(first_value(n_users) OVER (ORDER BY step), 0), 6) AS conversion
FROM c
"""


def q_user_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 heaviest users by event count with share and uniform-ratio —
    the skew-diagnosis step that gates salting (operators/skew.py)."""
    from vectordb_bioinsight_spark.operators.skew import key_skew_profile

    ev = load_table(spark, sf_dir, "events")
    return key_skew_profile(ev, ["user_id"], top_n=20)


SQL_USER_SKEW_PROFILE = """
WITH c AS (
  SELECT user_id, count(*)::BIGINT AS n FROM events GROUP BY 1
), t AS (
  SELECT sum(n)::DOUBLE AS tot, count(*)::DOUBLE AS keys FROM c
)
SELECT user_id, n, share, skew_ratio, rank FROM (
  SELECT c.user_id, c.n,
         round(c.n / t.tot, 6) AS share,
         round(c.n * t.keys / t.tot, 6) AS skew_ratio,
         row_number() OVER (ORDER BY c.n DESC, c.user_id ASC) AS rank
  FROM c, t
) WHERE rank <= 20
"""


def q_robust_scale_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust z-score of event values per event_type — the
    outlier-insensitive normalizer (two exact-quantile passes, broadcast
    back; sketch twin at scale)."""
    from vectordb_bioinsight_spark.operators.stats import robust_scale_by_group

    ev = load_table(spark, sf_dir, "events")
    out = robust_scale_by_group(ev, ["event_type"], "value")
    return out.select(
        "event_id",
        "event_type",
        F.round("value", 6).alias("value"),
        F.round("_med", 6).alias("med"),
        F.round("_mad", 6).alias("mad"),
        "robust_z",
    )


SQL_ROBUST_SCALE_VALUES = """
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
), med AS (
  SELECT event_type,
         max(CASE WHEN rn = greatest(1, ceil(0.5 * n)) THEN value END) AS med
  FROM r GROUP BY event_type
), d AS (
  SELECT e.event_id, e.event_type, e.value, m.med, abs(e.value - m.med) AS absdev
  FROM events e JOIN med m ON e.event_type = m.event_type
), r2 AS (
  SELECT event_type, absdev,
         row_number() OVER (PARTITION BY event_type ORDER BY absdev) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM d
), mad AS (
  SELECT event_type,
         max(CASE WHEN rn = greatest(1, ceil(0.5 * n)) THEN absdev END) AS mad
  FROM r2 GROUP BY event_type
)
SELECT d.event_id, d.event_type,
       round(d.value, 6) AS value,
       round(d.med, 6) AS med,
       round(m.mad, 6) AS mad,
       round((d.value - d.med) / nullif(m.mad, 0), 6) AS robust_z
FROM d JOIN mad m ON d.event_type = m.event_type
"""


def q_rolling_7d_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day per-user value sum/count at each event — the
    time-RANGE frame shape (interval-defined, not row-defined)."""
    from vectordb_bioinsight_spark.operators.windows import rolling_time_sum

    ev = load_table(spark, sf_dir, "events")
    out = rolling_time_sum(ev, "user_id", "ts", "value", days=7)
    return out.select("event_id", "user_id", "w_sum", "w_cnt")


SQL_ROLLING_7D_USER_VALUE = """
SELECT event_id, user_id,
       round(sum(value) OVER w, 4) AS w_sum,
       (count(*) OVER w)::BIGINT AS w_cnt
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
"""


def q_quantile_normalize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of event values across event_type "samples"
    (limma normalizeQuantiles semantics, deterministic tie ranks)."""
    from vectordb_bioinsight_spark.operators.stats import quantile_normalize

    ev = load_table(spark, sf_dir, "events")
    out = quantile_normalize(ev, "event_type", "event_id", "value")
    return out.select(
        "event_type", "event_id", F.round("value", 6).alias("value"), "qnorm"
    )


SQL_QUANTILE_NORMALIZE_VALUES = """
WITH ranked AS (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC) AS r
  FROM events
), ref AS (
  SELECT r, avg(value) AS refv FROM ranked GROUP BY r
)
SELECT k.event_type, k.event_id, round(k.value, 6) AS value, round(f.refv, 6) AS qnorm
FROM ranked k JOIN ref f USING (r)
"""


def q_kruskal_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H of event values across event types, one test per
    day — the k-group nonparametric companion of welch_halves/anova."""
    from vectordb_bioinsight_spark.operators.stats import kruskal_wallis

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )
    return kruskal_wallis(ev, ["day"], "event_type", "value")


SQL_KRUSKAL_BY_DAY = """
WITH base AS (
  SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day, event_type AS g, value AS v
  FROM events
), vg AS (
  SELECT day, v, g, count(*)::DOUBLE AS c FROM base GROUP BY 1, 2, 3
), tied AS (
  SELECT day, v, sum(c) AS t FROM vg GROUP BY 1, 2
), ranked AS (
  SELECT day, v, t,
         coalesce(sum(t) OVER (PARTITION BY day ORDER BY v ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + (t + 1.0) / 2.0 AS avg_r
  FROM tied
), merged AS (
  SELECT vg.day, vg.g, vg.c, r.avg_r
  FROM vg JOIN ranked r ON vg.day = r.day AND vg.v = r.v
), per_group AS (
  SELECT day, g, sum(c) AS ng, sum(c * avg_r) AS rg FROM merged GROUP BY 1, 2
), stats AS (
  SELECT day, sum(ng) AS n, count(*)::BIGINT AS k_groups,
         sum(rg * rg / ng) AS s
  FROM per_group GROUP BY day
), ties AS (
  SELECT day, sum(t * t * t - t) AS tie FROM ranked GROUP BY day
)
SELECT s.day, s.n::BIGINT AS n, s.k_groups,
       round((12.0 / (s.n * (s.n + 1.0)) * s.s - 3.0 * (s.n + 1.0))
             / nullif(1.0 - t.tie / nullif(s.n * s.n * s.n - s.n, 0), 0), 6) AS h_stat
FROM stats s JOIN ties t ON s.day = t.day
WHERE (12.0 / (s.n * (s.n + 1.0)) * s.s - 3.0 * (s.n + 1.0))
      / nullif(1.0 - t.tie / nullif(s.n * s.n * s.n - s.n, 0), 0) IS NOT NULL
"""


def q_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: per event type, days whose total
    value deviates >= 2 trailing-7-day sigmas from the (self-excluded)
    baseline — one day-keyed agg + one type-partitioned ordered window
    over calendar-bounded rows."""
    from vectordb_bioinsight_spark.operators.trends import rolling_anomalies

    ev = load_table(spark, sf_dir, "events")
    out = rolling_anomalies(ev, "event_type", "ts", "value", window_rows=7)
    # DATE -> TIMESTAMP for the cross-engine comparator (catalog convention)
    return out.withColumn("day", F.col("day").cast("timestamp"))


SQL_VALUE_ANOMALIES = """
WITH daily AS (
  SELECT event_type AS key, ts::DATE AS day, round(sum(value), 4) AS total
  FROM events GROUP BY 1, 2
), win AS (
  SELECT key, day::TIMESTAMP AS day, total,
         avg(total)         OVER w AS m,
         stddev_samp(total) OVER w AS s,
         count(total)       OVER w AS n
  FROM daily
  WINDOW w AS (PARTITION BY key ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT key, day, total,
       round(m, 4) AS base_mean,
       round(s, 4) AS base_std,
       round((total - m) / nullif(s, 0), 4) AS zscore,
       CASE WHEN round(s, 4) > 0 THEN abs(round((total - m) / nullif(s, 0), 4)) >= 2.0
            ELSE false END AS is_anomaly
FROM win WHERE n >= 7
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users bucketed by first-seen week
    (date_trunc Mondays — ISO-boundary-safe), retention(k) = fraction
    active k weeks later. Every shuffle user- or cohort-keyed; output
    calendar^2 bounded."""
    from vectordb_bioinsight_spark.operators.trends import cohort_retention

    ev = load_table(spark, sf_dir, "events")
    out = cohort_retention(ev, "user_id", "ts")
    return out.withColumn("cohort_week", F.col("cohort_week").cast("timestamp"))


SQL_COHORT_RETENTION = """
WITH weeks AS (
  SELECT DISTINCT user_id AS u, date_trunc('week', ts)::DATE AS wk FROM events
), first AS (
  SELECT u, min(wk) AS cohort_week FROM weeks GROUP BY 1
), joined AS (
  SELECT f.cohort_week, (w.wk - f.cohort_week) / 7 AS week_offset, w.u
  FROM weeks w JOIN first f USING (u)
), counts AS (
  SELECT cohort_week, week_offset::BIGINT AS week_offset,
         count(DISTINCT u)::BIGINT AS n_active
  FROM joined GROUP BY 1, 2
), sizes AS (
  SELECT cohort_week, count(*)::BIGINT AS cohort_size FROM first GROUP BY 1
)
SELECT c.cohort_week::TIMESTAMP AS cohort_week, c.week_offset, c.n_active,
       s.cohort_size,
       round(c.n_active / (s.cohort_size * 1.0), 6) AS retention
FROM counts c JOIN sizes s USING (cohort_week)
"""


def q_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution over the events stream: purchase
    conversions credited to the view/click touches strictly before each
    user's first purchase, under first/last/linear models in one pass
    (operators/trends.py::touch_attribution — every corpus shuffle
    user-keyed)."""
    from vectordb_bioinsight_spark.operators.trends import touch_attribution

    ev = load_table(spark, sf_dir, "events")
    return touch_attribution(
        ev, "user_id", "event_type", "ts", "purchase", ["view", "click"]
    )


SQL_TOUCH_ATTRIBUTION = """
WITH ev AS (SELECT user_id AS u, event_type AS t, ts FROM events),
conv AS (SELECT u, min(ts) AS conv_ts FROM ev WHERE t = 'purchase' GROUP BY 1),
touches AS (
  SELECT e.u, e.t, e.ts, c.conv_ts
  FROM ev e JOIN conv c ON c.u = e.u AND e.ts < c.conv_ts
  WHERE e.t IN ('view', 'click')
),
per_uc AS (
  SELECT u, t, count(*)::BIGINT AS n_uc, min(ts) AS min_ts, max(ts) AS max_ts,
         sum(exp(-0.6931471805599453 * ((epoch_us(conv_ts) - epoch_us(ts)) / 1e6)
                 / 604800.0)) AS w_uc
  FROM touches GROUP BY 1, 2
),
per_u AS (SELECT u, sum(n_uc)::BIGINT AS n_u, sum(w_uc) AS w_u FROM per_uc GROUP BY 1),
firsts AS (
  SELECT u, t AS first_t FROM (
    SELECT u, t, row_number() OVER (PARTITION BY u ORDER BY min_ts ASC, t ASC) AS rn
    FROM per_uc
  ) WHERE rn = 1
),
lasts AS (
  SELECT u, t AS last_t FROM (
    SELECT u, t, row_number() OVER (PARTITION BY u ORDER BY max_ts DESC, t DESC) AS rn
    FROM per_uc
  ) WHERE rn = 1
)
SELECT pc.t AS channel,
       sum((f.first_t = pc.t)::INT)::BIGINT AS first_touch,
       sum((l.last_t = pc.t)::INT)::BIGINT AS last_touch,
       round(sum(pc.n_uc::DOUBLE / pu.n_u), 6) AS linear,
       round(sum(pc.w_uc / pu.w_u), 6) AS decayed,
       count(*)::BIGINT AS touched_users
FROM per_uc pc
JOIN per_u pu USING (u) JOIN firsts f USING (u) JOIN lasts l USING (u)
GROUP BY 1
"""


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite additive decomposition of per-type daily value totals:
    centered 7-day trend, zero-centered day-of-week seasonal, residual
    (operators/trends.py::seasonal_decompose_daily)."""
    from vectordb_bioinsight_spark.operators.trends import seasonal_decompose_daily

    ev = load_table(spark, sf_dir, "events")
    # cents-scaled integer-valued inputs (SCALING rule 44): summing raw
    # float values made the daily total's 4-dp round partitioning-
    # dependent — the review's full-suite sweep caught it flipping while
    # isolated runs passed
    ev = ev.withColumn("value", F.round(F.col("value") * 100).cast("double"))
    out = seasonal_decompose_daily(ev, "event_type", "ts", "value", period=7)
    return out.withColumn("day", F.col("day").cast("timestamp"))


SQL_SEASONAL_DECOMPOSE = """
WITH ev AS (
  SELECT event_type, ts, round(value * 100)::DOUBLE AS value FROM events
), daily AS (
  SELECT event_type AS key, ts::DATE AS day, round(sum(value), 4) AS total
  FROM ev GROUP BY 1, 2
), tr AS (
  SELECT key, day, total,
         count(total) OVER w AS n,
         round(avg(total) OVER w, 4) AS trend
  FROM daily
  WINDOW w AS (PARTITION BY key ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), fullw AS (
  SELECT key, day, total, trend, total - trend AS detr,
         dayofweek(day) + 1 AS pos
  FROM tr WHERE n >= 7
), seas AS (
  SELECT key, pos, avg(detr) AS s_raw FROM fullw GROUP BY 1, 2
), seasc AS (
  SELECT s.key, s.pos, round(s.s_raw - m.s_mean, 4) AS seasonal
  FROM seas s JOIN (SELECT key, avg(s_raw) AS s_mean FROM seas GROUP BY 1) m USING (key)
)
SELECT f.key, f.day::TIMESTAMP AS day, f.total, f.trend, sc.seasonal,
       round(f.total - f.trend - sc.seasonal, 4) AS residual
FROM fullw f JOIN seasc sc USING (key, pos)
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over event types within
    1h-gap sessions (operators/trends.py::event_transition_matrix): one
    user-keyed lead window, a type²-bounded count, P(to | from)."""
    from vectordb_bioinsight_spark.operators.trends import event_transition_matrix

    ev = load_table(spark, sf_dir, "events")
    return event_transition_matrix(
        ev, "user_id", "event_type", "ts", "event_id", session_gap_s=3600
    )


SQL_EVENT_TRANSITIONS = """
WITH p AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER w AS to_type,
         epoch_us(lead(ts) OVER w) - epoch_us(ts) AS gap
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), t AS (
  SELECT from_type, to_type, count(*)::BIGINT AS n FROM p
  WHERE to_type IS NOT NULL AND gap <= 3600::BIGINT * 1000000
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       round(n / sum(n) OVER (PARTITION BY from_type)::DOUBLE, 6) AS p
FROM t
"""


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-week Kaplan-Meier churn curve over user lifetimes with
    final-week censoring (operators/trends.py::kaplan_meier_weeks) — the
    survival tier above cohort_retention."""
    from vectordb_bioinsight_spark.operators.trends import kaplan_meier_weeks

    ev = load_table(spark, sf_dir, "events")
    return kaplan_meier_weeks(ev, "user_id", "ts")


SQL_KAPLAN_MEIER = """
WITH spans AS (
  SELECT user_id AS u, min(ts)::DATE AS first_day, max(ts)::DATE AS last_day
  FROM events GROUP BY 1
), hz AS (SELECT max(last_day) AS max_day FROM spans),
per_user AS (
  -- // (integer division, floors) — CAST(x/7 AS BIGINT) would ROUND in
  -- DuckDB while Spark's cast truncates, splitting week buckets
  SELECT (datediff('day', first_day, last_day) // 7)::BIGINT AS week,
         (datediff('day', last_day, h.max_day) < 7)::INT AS censored
  FROM spans CROSS JOIN hz h
),
tot AS (SELECT count(*)::BIGINT AS n FROM per_user),
by_wk AS (
  SELECT week, count(*)::BIGINT AS ending,
         sum(1 - censored)::BIGINT AS n_churned,
         sum(censored)::BIGINT AS n_censored
  FROM per_user GROUP BY 1
), risked AS (
  SELECT week, n_churned, n_censored,
         (t.n - coalesce(sum(ending) OVER (ORDER BY week
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT AS n_risk
  FROM by_wk CROSS JOIN tot t
), f AS (
  SELECT *, 1.0 - n_churned::DOUBLE / n_risk AS fct FROM risked
), g AS (
  SELECT *, max((fct <= 0)::INT) OVER wc AS dead,
         sum(ln(CASE WHEN fct > 0 THEN fct END)) OVER wc AS lsum
  FROM f
  WINDOW wc AS (ORDER BY week ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT week, n_risk, n_churned, n_censored,
       round(CASE WHEN dead = 1 THEN 0.0 ELSE exp(lsum) END, 6) AS survival
FROM g
"""


def q_value_moments_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-moments maintenance algebra EXERCISED INSIDE the oracle
    check: per-(type, day) moment shards folded up to per-type stats
    (operators/sketches.py::moment_shards / merge_moment_shards) must
    equal a direct aggregate over the raw events — the property that lets
    a streaming ingest keep column statistics current in O(shards) per
    batch."""
    from vectordb_bioinsight_spark.operators.sketches import (
        merge_moment_shards,
        moment_shards,
        moments_to_stats,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "shard_day", F.to_date("ts")
    )
    shards = moment_shards(ev, ["event_type", "shard_day"], "value")
    merged = merge_moment_shards(shards, ["event_type"])
    return moments_to_stats(merged)


SQL_VALUE_MOMENTS_MERGED = """
SELECT event_type,
       count(value)::BIGINT AS n,
       round(avg(value), 6) AS mean,
       round(var_samp(value), 6) AS var,
       round(stddev_samp(value), 6) AS std
FROM events GROUP BY 1
"""


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer-value grid over the events stream
    (operators/trends.py::rfm_scores — exact rank-quintiles via the
    range-partitioned two-phase rank, no global window): per-user scores
    rolled up to segment counts."""
    from vectordb_bioinsight_spark.operators.trends import rfm_scores

    ev = load_table(spark, sf_dir, "events")
    scores = rfm_scores(ev, "user_id", "ts", "value", n_bins=5)
    return scores.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").cast("long").alias("n_users"),
        F.round(F.avg("monetary"), 4).alias("avg_monetary"),
    )


SQL_RFM_SEGMENTS = """
WITH spans AS (
  SELECT user_id AS u, max(ts)::DATE AS last_day,
         count(*)::BIGINT AS frequency, round(sum(value), 4) AS monetary
  FROM events GROUP BY 1
), hz AS (SELECT max(last_day) AS max_day FROM spans),
base AS (
  SELECT u, datediff('day', last_day, h.max_day)::BIGINT AS recency_days,
         frequency, monetary, (SELECT count(*) FROM spans) AS n
  FROM spans CROSS JOIN hz h
), ranked AS (
  SELECT *,
    row_number() OVER (ORDER BY recency_days ASC, u ASC) AS rr,
    row_number() OVER (ORDER BY frequency ASC, u ASC) AS fr,
    row_number() OVER (ORDER BY monetary ASC, u ASC) AS mr
  FROM base
), scored AS (
  SELECT u, monetary,
    (5 - ((rr - 1) * 5 // n))::INT AS r_score,
    (((fr - 1) * 5 // n) + 1)::INT AS f_score,
    (((mr - 1) * 5 // n) + 1)::INT AS m_score
  FROM ranked
)
SELECT r_score, f_score, m_score, count(*)::BIGINT AS n_users,
       round(avg(monetary), 4) AS avg_monetary
FROM scored GROUP BY 1, 2, 3
"""


def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users via mergeable deterministic-replay HLL
    day registers (operators/trends.py::rolling_active_users_replay) —
    day sketches union across the calendar-trailing window by
    register-wise max, and the portable-hash register pipeline replays
    in the DuckDB twin, so the entry is hash-checked (it was the last
    rows-only sketch family with its sibling approx_distinct_users).
    The Datasketches variant (rolling_active_users) remains the
    production default, pinned by the planted-history unit test."""
    from vectordb_bioinsight_spark.operators.trends import (
        rolling_active_users_replay,
    )

    ev = load_table(spark, sf_dir, "events")
    return rolling_active_users_replay(ev, "user_id", "ts", window_days=7).withColumn(
        "day", F.col("day").cast("timestamp")
    )


def _sql_rolling_active_users() -> str:
    from vectordb_bioinsight_spark.operators.sketches import hll_replay_estimate_sql

    # day registers fan out to the 7 calendar days they serve, then fold
    # by register-wise max == union of day sketches (the Spark plan's
    # explode + merge, replayed): the estimate helper's group expr is the
    # SERVED day computed inside its source subquery
    inner = hll_replay_estimate_sql(
        "SELECT (ts::DATE + i.i)::DATE AS sday, user_id "
        "FROM events CROSS JOIN (SELECT unnest(range(0, 7))::INT AS i) i",
        "sday",
        "user_id::VARCHAR",
    )
    return f"""
WITH daily AS (
  SELECT ts::DATE AS day, count(DISTINCT user_id)::BIGINT AS daily_active
  FROM events GROUP BY 1
), est AS (
  SELECT grp AS day, approx_distinct AS rolling_active FROM ({inner})
)
SELECT CAST(d.day AS TIMESTAMP) AS day, d.daily_active, e.rolling_active
FROM daily d JOIN est e ON e.day = d.day
"""


SQL_ROLLING_ACTIVE_USERS = _sql_rolling_active_users()


_HOLT_A, _HOLT_B = 0.5, 0.3


def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear smoothing per event type
    (operators/trends.py::holt_linear): level/trend fold over the daily
    series, next-day forecast — the sequential recursion is one fold
    expression, bit-identical cross-engine, hence hash-checked."""
    from vectordb_bioinsight_spark.operators.trends import holt_linear

    ev = load_table(spark, sf_dir, "events")
    return holt_linear(ev, "event_type", "ts", "value", _HOLT_A, _HOLT_B, 1)


SQL_HOLT_FORECAST = f"""
WITH daily AS (
  SELECT event_type AS key, ts::DATE AS day, round(sum(value), 4) AS total
  FROM events GROUP BY 1, 2
), arr AS (
  SELECT key, count(*)::BIGINT AS n_days,
         list_reduce(
           list_transform(list(total::DOUBLE ORDER BY day), t -> [t, 0.0::DOUBLE]),
           (acc, x) -> [
             {_HOLT_A} * x[1] + {1 - _HOLT_A} * (acc[1] + acc[2]),
             {_HOLT_B} * (({_HOLT_A} * x[1] + {1 - _HOLT_A} * (acc[1] + acc[2])) - acc[1])
               + {1 - _HOLT_B} * acc[2]
           ]
         ) AS st
  FROM daily GROUP BY key
)
SELECT key, n_days, round(st[1], 6) AS level, round(st[2], 6) AS trend,
       round(st[1] + st[2] * 1.0, 6) AS forecast
FROM arr
"""


def q_events_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract audit of the events table
    (operators/validation.py::table_expectations): not-null, accepted
    values, range, timestamp-shape and uniqueness rules — all row rules
    share one scan; the ledger inlines from a one-row aggregate."""
    from vectordb_bioinsight_spark.operators.validation import table_expectations

    ev = load_table(spark, sf_dir, "events")
    return table_expectations(
        ev,
        [
            ("not_null", "user_id"),
            ("not_null", "ts"),
            ("accepted", "event_type", ["signup", "view", "click", "purchase", "error"]),
            ("range", "value", 0.0, None),
            ("regex", "event_type", "^[a-z]+$"),
            ("unique", ["event_id"]),
        ],
    )


SQL_EVENTS_EXPECTATIONS = """
WITH one AS (
  SELECT count(*)::BIGINT AS n,
         sum((user_id IS NULL)::INT)::BIGINT AS v0,
         sum((ts IS NULL)::INT)::BIGINT AS v1,
         sum(coalesce(event_type NOT IN ('signup','view','click','purchase','error'), FALSE)::INT)::BIGINT AS v2,
         sum(coalesce(value < 0.0, FALSE)::INT)::BIGINT AS v3,
         sum(coalesce(NOT regexp_matches(event_type, '^[a-z]+$'), FALSE)::INT)::BIGINT AS v4,
         (count(event_id) - count(DISTINCT event_id))::BIGINT AS vu
  FROM events
)
SELECT rule, "column", n_violations, n_rows, n_violations = 0 AS passed FROM (
  SELECT 'not_null' AS rule, 'user_id' AS "column", v0 AS n_violations, n AS n_rows FROM one
  UNION ALL SELECT 'not_null', 'ts', v1, n FROM one
  UNION ALL SELECT 'accepted', 'event_type', v2, n FROM one
  UNION ALL SELECT 'range', 'value', v3, n FROM one
  UNION ALL SELECT 'regex', 'event_type', v4, n FROM one
  UNION ALL SELECT 'unique', 'event_id', vu, n FROM one
)
"""


def q_lagged_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag Pearson correlation between event-type daily totals at
    lags -3..3 (operators/trends.py::lagged_cross_correlation) — the
    lead-indicator scan, keys²-x-lags bounded."""
    from vectordb_bioinsight_spark.operators.trends import lagged_cross_correlation

    ev = load_table(spark, sf_dir, "events")
    return lagged_cross_correlation(ev, "event_type", "ts", "value", max_lag=3)


SQL_LAGGED_CORRELATION = """
WITH daily AS (
  SELECT event_type AS key, ts::DATE AS day, round(sum(value), 4) AS total
  FROM events GROUP BY 1, 2
), lags AS (SELECT unnest(generate_series(-3, 3)) AS lag)
SELECT a.key AS key_a, b.key AS key_b, l.lag,
       count(*)::BIGINT AS n_days,
       round(corr(a.total, b.total), 6) AS corr
FROM daily a CROSS JOIN lags l
JOIN daily b ON a.day + to_days(l.lag::INT) = b.day AND a.key < b.key
GROUP BY 1, 2, 3
"""


def q_value_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HISTOGRAM-quantile algebra exercised inside the oracle
    check (operators/sketches.py::hist_shards / merge_hist_shards /
    hist_quantiles — the quantile member of the mergeable-sketch family):
    per-(type, day) fixed-grid [0, 400]x128 histogram shards folded to
    per-type state, then conservative rank queries (right bin edge at
    ceil(q*n)). The DuckDB twin builds the histogram in ONE direct pass —
    so the hash asserts merge == rebuild exactly, integer counts having
    no float-associativity envelope."""
    from vectordb_bioinsight_spark.operators.sketches import (
        hist_quantiles,
        hist_shards,
        merge_hist_shards,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "shard_day", F.to_date("ts")
    )
    shards = hist_shards(
        ev, ["event_type", "shard_day"], "value", lo=0.0, hi=400.0, n_bins=128
    )
    merged = merge_hist_shards(shards, ["event_type"])
    return hist_quantiles(
        merged, ["event_type"], lo=0.0, hi=400.0, n_bins=128, qs=(0.5, 0.9, 0.99)
    )


SQL_VALUE_HIST_QUANTILES = """
WITH b AS (
  SELECT event_type,
         least(greatest(floor((value::DOUBLE - 0.0) / 400.0 * 128), 0), 127)::INT AS bin
  FROM events
), h AS (
  SELECT event_type, bin, count(*)::BIGINT AS cnt FROM b GROUP BY 1, 2
), c AS (
  SELECT event_type, bin, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM h
)
SELECT event_type, max(n)::BIGINT AS n,
       round(0.0 + (min(CASE WHEN cum >= ceil(0.5  * n) THEN bin END) + 1) / 128.0 * 400.0, 6) AS q50,
       round(0.0 + (min(CASE WHEN cum >= ceil(0.9  * n) THEN bin END) + 1) / 128.0 * 400.0, 6) AS q90,
       round(0.0 + (min(CASE WHEN cum >= ceil(0.99 * n) THEN bin END) + 1) / 128.0 * 400.0, 6) AS q99
FROM c GROUP BY 1
"""


def q_daily_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS trend line over daily event totals (operators/
    trends.py::daily_ols_trend — regr_slope/intercept/r2, one map-side-
    combinable shuffle; x centered on each key's first day so raw-moment
    float accumulation stays engine-stable)."""
    from vectordb_bioinsight_spark.operators.trends import daily_ols_trend

    ev = load_table(spark, sf_dir, "events")
    return daily_ols_trend(ev, "event_type", "ts", "value")


SQL_DAILY_TREND_OLS = """
WITH daily AS (
  SELECT event_type AS key, ts::DATE AS day, round(sum(value), 4) AS total
  FROM events GROUP BY 1, 2
), d0 AS (
  SELECT key, min(day) AS _d0 FROM daily GROUP BY 1
)
SELECT d.key, count(*)::BIGINT AS n_days,
       round(regr_slope(total, (d.day - x._d0)::DOUBLE), 4) AS slope,
       round(regr_intercept(total, (d.day - x._d0)::DOUBLE), 4) AS intercept,
       round(regr_r2(total, (d.day - x._d0)::DOUBLE), 4) AS r2
FROM daily d JOIN d0 x USING (key)
GROUP BY 1
"""


_HB_A, _HB_B = 0.5, 0.3


def q_holt_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin forecast backtest per event type (operators/
    trends.py::holt_backtest): ONE fold pass accumulates every one-step-
    ahead Holt forecast (appended before each state update), then
    MAE/sMAPE over the last 7 observed days — forecast-accuracy
    accounting at the cost of the forecast itself."""
    from vectordb_bioinsight_spark.operators.trends import holt_backtest

    ev = load_table(spark, sf_dir, "events")
    return holt_backtest(ev, "event_type", "ts", "value", _HB_A, _HB_B, 7)


SQL_HOLT_BACKTEST = f"""
WITH daily AS (
  SELECT event_type AS key, ts::DATE AS day, round(sum(value), 4) AS total
  FROM events GROUP BY 1, 2
), arr AS (
  SELECT key, count(*)::BIGINT AS n_days,
         list(total::DOUBLE ORDER BY day) AS series
  FROM daily GROUP BY key
), folded AS (
  SELECT key, n_days, series,
         least(7, n_days - 1) AS k,
         list_reduce(
           list_prepend([series[1], 0.0::DOUBLE],
                        list_transform(series[2:], t -> [t, 0.0::DOUBLE])),
           (acc, x) -> list_concat(
             [
               {_HB_A} * x[1] + {1 - _HB_A} * (acc[1] + acc[2]),
               {_HB_B} * (({_HB_A} * x[1] + {1 - _HB_A} * (acc[1] + acc[2])) - acc[1])
                 + {1 - _HB_B} * acc[2]
             ],
             list_concat(acc[3:], [acc[1] + acc[2]])
           )
         ) AS st
  FROM arr
  WHERE n_days >= 2
), tails AS (
  SELECT key, n_days, k,
         list_slice(series, n_days - k + 1, n_days) AS at,
         list_slice(st[3:], len(st) - 2 - k + 1, len(st) - 2) AS ft
  FROM folded
)
SELECT key, n_days, k::BIGINT AS n_eval,
       round(list_sum(list_transform(list_zip(at, ft),
             s -> abs(s[1] - s[2]))) / k, 6) AS mae,
       round(list_sum(list_transform(list_zip(at, ft),
             s -> 2.0 * abs(s[1] - s[2]) / (abs(s[1]) + abs(s[2])))) / k, 6) AS smape
FROM tails
"""


def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 session journeys (operators/trends.py::session_paths):
    1-hour-gap sessionization, first-3-step event-type path per session,
    sessions + distinct users per path — the n-gram generalization of
    the bigram transition matrix, all in one user-keyed window pair plus
    two bounded aggregations."""
    from vectordb_bioinsight_spark.operators.trends import session_paths

    ev = load_table(spark, sf_dir, "events")
    return session_paths(
        ev, "user_id", "ts", "event_type", "event_id",
        gap_s=3600, max_steps=3, top_n=20,
    )


SQL_SESSION_PATHS = """
WITH g AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600::BIGINT * 1000000
              THEN 1 ELSE 0 END AS nf
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), s AS (
  SELECT user_id, ts, event_id, event_type,
         sum(nf) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM g
), per_sess AS (
  SELECT user_id, sid,
         array_to_string(
           list_slice(list(event_type ORDER BY ts ASC, event_id ASC), 1, 3),
           '>') AS path
  FROM s GROUP BY 1, 2
)
SELECT path, count(*)::BIGINT AS n_sessions,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM per_sess GROUP BY 1
ORDER BY n_sessions DESC, path ASC
LIMIT 20
"""


def q_audience_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap via K-Minimum-Values sketches (operators/
    sketches.py::kmv_shards / kmv_overlap): viewers vs purchasers —
    distinct estimates per side, union, Jaccard, intersection. KMV state
    is a pure function of the key set (min-k portable hashes), so unlike
    HLL the whole sketch pipeline hash-matches the DuckDB twin; and
    unlike HLL it answers INTERSECTIONS."""
    from vectordb_bioinsight_spark.operators.sketches import (
        kmv_overlap,
        kmv_shards,
    )

    ev = load_table(spark, sf_dir, "events").withColumn("_g", F.lit("all"))
    a = kmv_shards(ev.filter(F.col("event_type") == "view"), ["_g"], "user_id")
    b = kmv_shards(
        ev.filter(F.col("event_type") == "purchase"), ["_g"], "user_id"
    )
    return kmv_overlap(a, b, k=256)


SQL_AUDIENCE_OVERLAP_KMV = """
WITH ha AS (
  SELECT DISTINCT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
  FROM events WHERE event_type = 'view'
), hb AS (
  SELECT DISTINCT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
  FROM events WHERE event_type = 'purchase'
), ka AS (
  SELECT list(h ORDER BY h) AS ka FROM (SELECT h FROM ha ORDER BY h LIMIT 256)
), kb AS (
  SELECT list(h ORDER BY h) AS kb FROM (SELECT h FROM hb ORDER BY h LIMIT 256)
), u AS (
  SELECT ka, kb,
         list_slice(list_sort(list_distinct(list_concat(ka, kb))), 1, 256) AS ku
  FROM ka, kb
), est AS (
  SELECT ka, kb, ku,
         CASE WHEN len(ka) < 256 THEN len(ka)::DOUBLE
              ELSE round(255.0 / (ka[256]::DOUBLE / 1152921504606846976.0), 4) END AS est_a,
         CASE WHEN len(kb) < 256 THEN len(kb)::DOUBLE
              ELSE round(255.0 / (kb[256]::DOUBLE / 1152921504606846976.0), 4) END AS est_b,
         CASE WHEN len(ku) < 256 THEN len(ku)::DOUBLE
              ELSE round(255.0 / (ku[256]::DOUBLE / 1152921504606846976.0), 4) END AS est_union,
         round(len(list_filter(ku, h -> list_contains(ka, h) AND list_contains(kb, h)))
               / len(ku)::DOUBLE, 6) AS jaccard
  FROM u
)
SELECT est_a, est_b, est_union, jaccard,
       round(jaccard * est_union, 4) AS est_intersect
FROM est
"""


def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative churn hazard (operators/trends.py::
    nelson_aalen_weeks) over the same discrete-week risk table as the
    KM curve — additive hazard localizes WHEN churn risk spikes."""
    from vectordb_bioinsight_spark.operators.trends import nelson_aalen_weeks

    ev = load_table(spark, sf_dir, "events")
    return nelson_aalen_weeks(ev, "user_id", "ts")


SQL_NELSON_AALEN = """
WITH spans AS (
  SELECT user_id AS u, min(ts)::DATE AS first_day, max(ts)::DATE AS last_day
  FROM events GROUP BY 1
), hz AS (SELECT max(last_day) AS max_day FROM spans),
per_user AS (
  SELECT ((last_day - first_day) // 7)::BIGINT AS week,
         (max_day - last_day < 7)::INT AS censored
  FROM spans, hz
), by_wk AS (
  SELECT week, count(*)::BIGINT AS ending,
         sum(1 - censored)::BIGINT AS n_churned,
         sum(censored)::BIGINT AS n_censored
  FROM per_user GROUP BY 1
), risked AS (
  SELECT week, n_churned, n_censored,
         ((SELECT count(*) FROM per_user)
          - coalesce(sum(ending) OVER (ORDER BY week
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT AS n_risk
  FROM by_wk
)
SELECT week, n_risk, n_churned, n_censored,
       round(sum(n_churned::DOUBLE / n_risk) OVER wc, 6) AS cum_hazard,
       round(sum(n_churned::DOUBLE / (n_risk * n_risk)) OVER wc, 6) AS hazard_var
FROM risked
WINDOW wc AS (ORDER BY week ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_purchase_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift of event value as a purchase targeting
    score (operators/trends.py::cumulative_gains): PSI-style rounded
    decile cuts broadcast back, scan-local bucket assignment, one
    bucket groupBy + bucket-cardinality cumulative window."""
    from vectordb_bioinsight_spark.operators.trends import cumulative_gains

    ev = load_table(spark, sf_dir, "events").select(
        "value", (F.col("event_type") == "purchase").cast("int").alias("y")
    )
    return cumulative_gains(ev, "y", "value", n_buckets=10)


SQL_PURCHASE_GAINS = """
WITH ev AS (
  SELECT value::DOUBLE AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
), cuts AS (
  SELECT list_transform(
           quantile_cont(s, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
           c -> round(c, 4)) AS cuts
  FROM ev
), b AS (
  SELECT 10 - len(list_filter(cuts, c -> s > c)) AS bucket, y
  FROM ev, cuts
), per AS (
  SELECT bucket, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos
  FROM b GROUP BY 1
)
SELECT bucket, n, n_pos,
       round((sum(n) OVER wc)::DOUBLE / (sum(n) OVER ()), 6) AS cum_pop_share,
       round((sum(n_pos) OVER wc)::DOUBLE / nullif(sum(n_pos) OVER (), 0), 6) AS cum_capture,
       round(((sum(n_pos) OVER wc)::DOUBLE / nullif(sum(n_pos) OVER (), 0))
             / ((sum(n) OVER wc)::DOUBLE / (sum(n) OVER ())), 6) AS lift
FROM per
WINDOW wc AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


_SHAP_CH = ["click", "error", "signup", "view"]


def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value channel attribution for purchases over the
    4-channel event lattice (operators/trends.py::shapley_attribution):
    one user-keyed agg builds the coalition table (<= 16 rows), the
    Shapley sum is a broadcast self-join against the channel dimension —
    the game-theoretic upgrade of the touch-attribution heuristics."""
    from vectordb_bioinsight_spark.operators.trends import shapley_attribution

    ev = load_table(spark, sf_dir, "events")
    return shapley_attribution(
        ev, "user_id", "event_type", "ts", "purchase", _SHAP_CH
    )


SQL_SHAPLEY_ATTRIBUTION = """
WITH per AS (
  SELECT user_id,
         min(ts) FILTER (WHERE event_type = 'purchase') AS conv_ts,
         list(struct_pack(t := ts, e := event_type))
           FILTER (WHERE event_type IN ('click','error','signup','view')) AS touches
  FROM events GROUP BY 1
), sets AS (
  SELECT list_sort(list_distinct(list_transform(
           list_filter(coalesce(touches, []),
                       x -> conv_ts IS NULL OR x.t < conv_ts),
           x -> x.e))) AS cset,
         (conv_ts IS NOT NULL)::INT AS conv
  FROM per
), combos AS (
  SELECT cset, count(*)::BIGINT AS n, sum(conv)::BIGINT AS n_conv
  FROM sets GROUP BY 1
), cv AS (
  SELECT cset, n,
         CASE WHEN len(cset) = 0 THEN 0.0 ELSE n_conv::DOUBLE / n END AS v
  FROM combos
), ch AS (
  SELECT unnest(['click','error','signup','view']) AS channel
), pairs AS (
  SELECT ch.channel,
         ([1.0,1,2,6,24,120,720,5040,40320][len(c.cset) + 1]
          * [1.0,1,2,6,24,120,720,5040,40320][4 - len(c.cset)]
          / 24.0) * (c2.v - c.v) AS contrib
  FROM cv c
  JOIN ch ON NOT list_contains(c.cset, ch.channel)
  JOIN cv c2 ON c2.cset = list_sort(list_append(c.cset, ch.channel))
), phi AS (
  SELECT channel, round(sum(contrib), 6) AS shapley FROM pairs GROUP BY 1
), touched AS (
  SELECT unnest(cset) AS channel, n FROM cv
), tt AS (
  SELECT channel, sum(n)::BIGINT AS n_users_touched FROM touched GROUP BY 1
)
SELECT ch.channel,
       coalesce(phi.shapley, 0.0) AS shapley,
       coalesce(tt.n_users_touched, 0)::BIGINT AS n_users_touched
FROM ch LEFT JOIN phi USING (channel) LEFT JOIN tt USING (channel)
"""


def q_holt_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal interval around the next-day Holt forecast per
    event type (operators/trends.py::holt_conformal): calibration scores
    are the one-step residuals the backtest fold accumulates; the
    half-width is the ceil(0.8(m+1))-th smallest — distribution-free
    80% coverage at the cost of the forecast itself."""
    from vectordb_bioinsight_spark.operators.trends import holt_conformal

    ev = load_table(spark, sf_dir, "events")
    return holt_conformal(ev, "event_type", "ts", "value", 0.5, 0.3, 0.2)


SQL_HOLT_CONFORMAL = f"""
WITH daily AS (
  SELECT event_type AS key, ts::DATE AS day, round(sum(value), 4) AS total
  FROM events GROUP BY 1, 2
), arr AS (
  SELECT key, count(*)::BIGINT AS n_days,
         list(total::DOUBLE ORDER BY day) AS series
  FROM daily GROUP BY key
), folded AS (
  SELECT key, n_days, series,
         list_reduce(
           list_prepend([series[1], 0.0::DOUBLE],
                        list_transform(series[2:], t -> [t, 0.0::DOUBLE])),
           (acc, x) -> list_concat(
             [
               {_HB_A} * x[1] + {1 - _HB_A} * (acc[1] + acc[2]),
               {_HB_B} * (({_HB_A} * x[1] + {1 - _HB_A} * (acc[1] + acc[2])) - acc[1])
                 + {1 - _HB_B} * acc[2]
             ],
             list_concat(acc[3:], [acc[1] + acc[2]])
           )
         ) AS st
  FROM arr
  WHERE n_days >= 2
), scored AS (
  SELECT key, n_days,
         list_sort(list_transform(
           list_zip(series[2:], st[3:]),
           s -> abs(s[1] - s[2]))) AS resid,
         st[1] + st[2] AS fc
  FROM folded
), ranked AS (
  SELECT key, n_days, len(resid)::BIGINT AS n_cal, fc,
         CASE WHEN ceil(0.8 * (len(resid) + 1))::INT <= len(resid)
              THEN resid[ceil(0.8 * (len(resid) + 1))::INT] END AS q
  FROM scored
)
SELECT key, n_days, n_cal,
       round(fc, 6) AS forecast,
       round(q, 6) AS q_resid,
       round(fc - q, 6) AS lo,
       round(fc + q, 6) AS hi
FROM ranked
"""


def q_cohort_log_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-cohort log-rank churn test (operators/trends.py::
    log_rank_test — Mantel 1966): even- vs odd-id users' discrete-week
    lifetimes under the pooled-hazard null; the inferential companion
    of the KM/Nelson-Aalen curves.

    Planted thinning (r10 all-NULL census): over the RAW stream every
    user's last event sits within 7 days of the horizon at every SF
    (~67 events/user/30 days, SF-invariant density), so the test saw
    zero deaths and observed_a/expected_a/z/chi2 were NULL everywhere —
    a vacuous green. Lifetimes are therefore measured on the
    deterministic 1/16 interaction subsample (event_id % 16 = 0, exactly
    replayable in the twin), which spreads last-seen dates enough for
    both deaths and censored users in both cohorts at all three SFs
    (2/6 and 4/3 deaths/censored at sf0.001) and stays mixed under
    scale-up for the same density argument."""
    from vectordb_bioinsight_spark.operators.trends import log_rank_test

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 16 == 0
    ).withColumn(
        "cohort",
        F.when(F.col("user_id") % 2 == 0, F.lit("even")).otherwise(
            F.lit("odd")
        ),
    )
    return log_rank_test(ev, "user_id", "ts", "cohort")


SQL_COHORT_LOG_RANK = """
WITH spans AS (
  SELECT user_id,
         CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS grp,
         min(ts)::DATE AS fd, max(ts)::DATE AS ld
  FROM events WHERE event_id % 16 = 0 GROUP BY 1, 2
), hz AS (SELECT max(ld) AS md FROM spans),
per AS (
  SELECT grp, ((ld - fd) // 7)::BIGINT AS week,
         (md - ld < 7)::INT AS censored
  FROM spans, hz
), tot AS (
  SELECT grp, count(*)::BIGINT AS n_g FROM per GROUP BY 1
), byg AS (
  SELECT grp, week, count(*)::BIGINT AS ending,
         sum(1 - censored)::BIGINT AS d
  FROM per GROUP BY 1, 2
), wks AS (SELECT DISTINCT week FROM per),
spine AS (SELECT w.week, t.grp, t.n_g FROM wks w CROSS JOIN tot t),
filled AS (
  SELECT s.grp, s.week, s.n_g,
         coalesce(b.ending, 0) AS ending, coalesce(b.d, 0) AS d
  FROM spine s LEFT JOIN byg b ON b.grp = s.grp AND b.week = s.week
), risked AS (
  SELECT grp, week, d,
         (n_g - coalesce(sum(ending) OVER (PARTITION BY grp ORDER BY week
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT AS n_risk
  FROM filled
), wk AS (
  SELECT week,
         sum(CASE WHEN grp = 'even' THEN d END) AS d_a,
         sum(CASE WHEN grp = 'even' THEN n_risk END) AS r_a,
         sum(d) AS d_t, sum(n_risk) AS r_t
  FROM risked GROUP BY 1
  HAVING sum(n_risk) > 1 AND sum(d) > 0
), one AS (
  SELECT sum(d_a)::BIGINT AS observed_a,
         round(sum(d_t * (r_a::DOUBLE / r_t)), 6) AS expected_a,
         sum(d_a - d_t * (r_a::DOUBLE / r_t)) AS num,
         sum(d_t * (r_a::DOUBLE / r_t) * (1 - r_a::DOUBLE / r_t)
             * (r_t - d_t) / (r_t - 1.0)) AS var
  FROM wk
)
SELECT 'even' AS group_a,
       (SELECT n_g FROM tot WHERE grp = 'even') AS n_a,
       (SELECT n_g FROM tot WHERE grp = 'odd') AS n_b,
       observed_a, expected_a,
       round(num / sqrt(var), 6) AS z,
       round((num / sqrt(var)) * (num / sqrt(var)), 6) AS chi2
FROM one
"""


def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust daily trend per event type (operators/trends.py::
    theil_sen_trend): the median-of-pairwise-slopes estimator a spiked
    day cannot move — reported beside the OLS line; the pair join is
    bounded by the calendar (~435 pairs/key)."""
    from vectordb_bioinsight_spark.operators.trends import theil_sen_trend

    ev = load_table(spark, sf_dir, "events")
    return theil_sen_trend(ev, "event_type", "ts", "value")


SQL_THEIL_SEN_TREND = """
WITH daily AS (
  SELECT event_type AS key, ts::DATE AS day, round(sum(value), 4) AS total
  FROM events GROUP BY 1, 2
), d0 AS (
  SELECT key, min(day) AS _d0, count(*)::BIGINT AS n_days
  FROM daily GROUP BY 1
), pts AS (
  SELECT d.key, x.n_days, (d.day - x._d0)::DOUBLE AS x, d.total AS y
  FROM daily d JOIN d0 x USING (key)
), pairs AS (
  SELECT a.key, a.n_days,
         (b.y - a.y) / (b.x - a.x) AS s
  FROM pts a JOIN pts b ON a.key = b.key AND a.x < b.x
), sl AS (
  SELECT key, n_days, count(*)::BIGINT AS n_pairs,
         quantile_cont(s, 0.5) AS slope
  FROM pairs GROUP BY 1, 2
), ic AS (
  SELECT p.key, quantile_cont(p.y - sl.slope * p.x, 0.5) AS icept
  FROM pts p JOIN sl USING (key)
  GROUP BY 1
)
SELECT sl.key, sl.n_days, sl.n_pairs,
       round(sl.slope, 4) AS slope,
       round(ic.icept, 4) AS intercept
FROM sl JOIN ic USING (key)
"""
