"""Relational query catalog — SURVEY.md §2.2-§2.7 operators exercised on the
driver's TPC-H-ish tables, each paired with a DuckDB oracle SQL string.

Hash-match discipline (applies to every query in the catalog):
* every computed double is ``round(x, 4..6)`` in BOTH engines so partition-
  order float summation cannot flip the value hash;
* every ``ORDER BY ... LIMIT k`` orders on the *rounded* value plus a unique
  tie-break key (total order ⇒ identical top-k membership across engines);
* DuckDB integer sums are cast to BIGINT to match Spark's long.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.relational import conditional_counts, top_k
from vectordb_bioinsight_spark.operators.windows import lag_delta, rank_rows, running_aggregate
from vectordb_bioinsight_spark.sources.readers import load_table


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: filter → groupBy → 6 aggregates.

    Exercises F-filters + A-aggregations; Catalyst pushes the shipdate filter
    and prunes to 7 columns at the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join lineitem ⨝ part (broadcast dim) → revenue per brand → top 10.

    The part table is a dimension — explicit broadcast keeps lineitem
    shuffle-free; top-k compiles to TakeOrderedAndProject.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )
    return top_k(rev, [F.desc("revenue")], 10, [F.asc("p_brand")])


SQL_TOP_BRAND_REVENUE = """
SELECT p_brand,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY revenue DESC, p_brand ASC
LIMIT 10
"""


def q_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped: orders with >= 1 discounted lineitem (left-semi join),
    counted per priority."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05)
    return (
        orders.join(li.select(F.col("l_orderkey").alias("o_orderkey")), "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("n_orders"))
    )


SQL_ORDER_PRIORITY_EXISTS = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_discount > 0.05)
GROUP BY o_orderpriority
"""


def q_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(region, nation) over customer ⨝ nation ⨝ region — grouping-sets
    capability (SURVEY §2.4 'Absent': free from Catalyst, declared here)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.round(F.sum("c_acctbal"), 4).alias("total_acctbal"),
    )


SQL_REGION_ROLLUP = """
SELECT r_name, n_name, count(*) AS n_customers, round(sum(c_acctbal), 4) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by raw double column with unique tie-break (W1)."""
    orders = load_table(spark, sf_dir, "orders")
    return top_k(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.desc("o_totalprice")],
        10,
        [F.asc("o_orderkey")],
    )


SQL_TOP_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def q_first_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/W4: row_number over (customer, orderdate) → earliest order per
    customer. Tie-break on orderkey makes the order total."""
    orders = load_table(spark, sf_dir, "orders")
    ranked = rank_rows(orders, [F.asc("o_orderdate"), F.asc("o_orderkey")], ["o_custkey"], "rn")
    return ranked.filter(F.col("rn") == 1).select("o_custkey", "o_orderkey", "o_orderdate")


SQL_FIRST_ORDER_PER_CUSTOMER = """
SELECT o_custkey, o_orderkey, o_orderdate FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn = 1
"""


def q_supplier_nation_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: broadcast dimension lookup with coalesce fallback
    (gene-id → symbol semantics, agent1_deg.py:109-166)."""
    from vectordb_bioinsight_spark.operators.joins import broadcast_lookup

    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("nation")
    )
    out = broadcast_lookup(s, n, "s_nationkey", fallback={"nation": "s_name"})
    return out.select("s_suppkey", "s_name", "nation")


SQL_SUPPLIER_NATION_LOOKUP = """
SELECT s_suppkey, s_name, coalesce(n_name, s_name) AS nation
FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
"""


def q_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: conditional aggregation — N boolean flags in one shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    out = conditional_counts(
        li,
        ["l_linestatus"],
        {
            "n_returned": F.col("l_returnflag") == "R",
            "n_highdisc": F.col("l_discount") >= 0.05,
            "n_taxed": F.col("l_tax") > 0.0,
        },
    )
    total = li.groupBy("l_linestatus").agg(F.count("*").cast("long").alias("n_total"))
    return (
        out.join(total, "l_linestatus")
        .withColumn("returned_share", F.round(F.col("n_returned") / F.col("n_total"), 6))
    )


SQL_LINEITEM_FLAGS = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
       CAST(sum(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_highdisc,
       CAST(sum(CASE WHEN l_tax > 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxed,
       count(*) AS n_total,
       round(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) / count(*)::DOUBLE, 6) AS returned_share
FROM lineitem GROUP BY l_linestatus
"""


def q_customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per customer over order history (frame-spec window —
    SURVEY §2.5 'Absent', declared capability)."""
    orders = load_table(spark, sf_dir, "orders")
    out = running_aggregate(
        orders, ["o_custkey"], [F.asc("o_orderdate"), F.asc("o_orderkey")], "o_totalprice", "running_spend"
    )
    return out.select("o_custkey", "o_orderkey", F.round("running_spend", 4).alias("running_spend"))


SQL_CUSTOMER_RUNNING_TOTAL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend
FROM orders
"""


def q_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(): days between a customer's consecutive orders
    (week-over-week delta semantics, bio-daily-briefing trend_analyzer)."""
    orders = load_table(spark, sf_dir, "orders").withColumn("od", F.to_date("o_orderdate"))
    out = lag_delta(
        orders.withColumn("day_num", F.datediff(F.col("od"), F.lit("1995-01-01").cast("date"))),
        ["o_custkey"],
        [F.asc("o_orderdate"), F.asc("o_orderkey")],
        "day_num",
        "gap_days",
    )
    return out.select("o_custkey", "o_orderkey", F.col("gap_days").cast("long").alias("gap_days"))


SQL_ORDER_GAP_DAYS = """
SELECT o_custkey, o_orderkey,
       CAST(datediff('day', CAST('1995-01-01' AS DATE), CAST(o_orderdate AS DATE))
            - lag(datediff('day', CAST('1995-01-01' AS DATE), CAST(o_orderdate AS DATE)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS BIGINT) AS gap_days
FROM orders
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference as left-anti join (isolated-DEGs semantics,
    agent2_network.py:195-200): customers with no urgent high-value order."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_totalprice") > 150000) & (F.col("o_orderpriority") == "1-URGENT"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.join(o, "c_custkey", "left_anti").select("c_custkey", "c_name")


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_totalprice > 150000 AND o_orderpriority = '1-URGENT')
"""


def q_part_price_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 (HVG-variance semantics): per-part price stddev, top 20."""
    li = load_table(spark, sf_dir, "lineitem")
    spread = li.groupBy("l_partkey").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_sd"),
    ).filter(F.col("n") >= 3)
    return top_k(spread, [F.desc("price_sd")], 20, [F.asc("l_partkey")])


SQL_PART_PRICE_SPREAD = """
SELECT l_partkey, count(*) AS n, round(stddev_samp(l_extendedprice), 4) AS price_sd
FROM lineitem GROUP BY l_partkey HAVING count(*) >= 3
ORDER BY price_sd DESC, l_partkey ASC LIMIT 20
"""


def q_quantity_share_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (CPM semantics): per-row share of the order's total quantity ×1e6."""
    from vectordb_bioinsight_spark.operators.stats import cpm_normalize

    li = load_table(spark, sf_dir, "lineitem")
    out = cpm_normalize(li, "l_orderkey", "l_quantity", "qty_ppm")
    return out.select("l_orderkey", "l_linenumber", F.round("qty_ppm", 4).alias("qty_ppm"))


SQL_QUANTITY_SHARE_PPM = """
SELECT l_orderkey, l_linenumber,
       round(l_quantity / sum(l_quantity) OVER (PARTITION BY l_orderkey) * 1e6, 4) AS qty_ppm
FROM lineitem
"""


def q_minmax_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: min-max normalization within market segment (reranker.py:173-181)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(
            (F.col("c_acctbal") - F.min("c_acctbal").over(w))
            / (F.max("c_acctbal").over(w) - F.min("c_acctbal").over(w)),
            6,
        ).alias("bal_norm"),
    )


SQL_MINMAX_ACCTBAL = """
SELECT c_custkey, c_mktsegment,
       round((c_acctbal - min(c_acctbal) OVER (PARTITION BY c_mktsegment))
             / (max(c_acctbal) OVER (PARTITION BY c_mktsegment)
                - min(c_acctbal) OVER (PARTITION BY c_mktsegment)), 6) AS bal_norm
FROM customer
"""


def q_recency_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8: piecewise recency-bucket score (recommender.py:431-452 age ladder)."""
    orders = load_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    score = (
        F.when(yr >= 2000, 100)
        .when(yr >= 1998, 80)
        .when(yr >= 1996, 60)
        .otherwise(40)
    )
    return orders.select("o_orderkey", score.cast("long").alias("recency_score"))


SQL_RECENCY_SCORE = """
SELECT o_orderkey,
       CAST(CASE WHEN year(o_orderdate) >= 2000 THEN 100
                 WHEN year(o_orderdate) >= 1998 THEN 80
                 WHEN year(o_orderdate) >= 1996 THEN 60
                 ELSE 40 END AS BIGINT) AS recency_score
FROM orders
"""


def q_orders_per_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: histogram by month bucket (papers-per-year semantics)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_trunc("month", "o_orderdate").alias("month_start"))
        .agg(F.count("*").cast("long").alias("n_orders"), F.round(F.sum("o_totalprice"), 4).alias("total"))
    )


SQL_ORDERS_PER_MONTH = """
SELECT date_trunc('month', o_orderdate) AS month_start, count(*) AS n_orders,
       round(sum(o_totalprice), 4) AS total
FROM orders GROUP BY 1
"""


def q_regional_revenue(spark, sf_dir):
    """TPC-H Q5 shape: six-table join (customer-orders-lineitem-supplier-
    nation-region) — revenue per nation where customer and supplier share
    the nation. Catalyst reorders and broadcasts the dimension chain; the
    only shuffles are the two fact joins."""
    from vectordb_bioinsight_spark.sources.readers import load_tables

    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem", "supplier", "nation", "region"))
    return (
        t["customer"]
        .join(t["orders"], t["customer"].c_custkey == t["orders"].o_custkey)
        .join(t["lineitem"], t["orders"].o_orderkey == t["lineitem"].l_orderkey)
        .join(t["supplier"], (t["lineitem"].l_suppkey == t["supplier"].s_suppkey)
              & (t["customer"].c_nationkey == t["supplier"].s_nationkey))
        .join(F.broadcast(t["nation"]), t["supplier"].s_nationkey == t["nation"].n_nationkey)
        .join(F.broadcast(t["region"]), t["nation"].n_regionkey == t["region"].r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


SQL_REGIONAL_REVENUE = """
SELECT n_name, r_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*)::BIGINT AS n_items
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY 1, 2
"""


def q_events_in_price_band(spark, sf_dir):
    """Range join via bucketing (§2.3 declared capability): event values
    matched into overlapping price bands — interval explode to buckets,
    equi-join, predicate recheck. No nested-loop inequality join."""
    from vectordb_bioinsight_spark.operators.joins import range_join_bucketed
    from vectordb_bioinsight_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    bands = spark.createDataFrame(
        [("low", 0.0, 25.0), ("mid", 20.0, 60.0), ("high", 55.0, 100.0)],
        ["band", "lo", "hi"],
    )
    joined = range_join_bucketed(ev, bands, "value", "lo", "hi", bucket_width=10.0)
    return joined.groupBy("band").agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )


SQL_EVENTS_IN_PRICE_BAND = """
WITH bands(band, lo, hi) AS (VALUES ('low', 0.0, 25.0), ('mid', 20.0, 60.0), ('high', 55.0, 100.0))
SELECT band, count(*)::BIGINT AS n_events, round(avg(value), 6) AS avg_value
FROM events JOIN bands ON value >= lo AND value <= hi
GROUP BY 1
"""


def q_scd2_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD merge over the customer dimension: every 7th customer's
    segment changes at a later timestamp — the old row closes its validity
    interval, a new open row appears, everyone else passes through
    (sources/maintenance.scd2_merge)."""
    from vectordb_bioinsight_spark.sources.maintenance import scd2_init, scd2_merge

    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").alias("id"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("2024-01-01").cast("timestamp").alias("ts"),
    )
    cur = scd2_init(base, "ts")
    upd = base.filter(F.col("id") % 7 == 0).select(
        "id",
        F.lit("PROMOTED").alias("segment"),
        F.lit("2024-06-01").cast("timestamp").alias("ts"),
    )
    return scd2_merge(cur, upd, ["id"], "ts")


SQL_SCD2_CUSTOMERS = """
WITH b AS (
  SELECT c_custkey AS id, c_mktsegment AS segment FROM customer
)
SELECT id, segment,
       TIMESTAMP '2024-01-01' AS valid_from,
       CASE WHEN id % 7 = 0 THEN TIMESTAMP '2024-06-01' END AS valid_to,
       id % 7 <> 0 AS is_current
FROM b
UNION ALL
SELECT id, 'PROMOTED', TIMESTAMP '2024-06-01', NULL, true
FROM b WHERE id % 7 = 0
"""


def q_salted_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier line counts + quantity extremes routed through the
    SALTED two-phase aggregation (operators/skew.salted_aggregate) — the
    hot-key-proof plan; result is identical to the direct groupBy, which
    is exactly what the oracle asserts. count/min/max only (decomposable
    and float-order-safe)."""
    from vectordb_bioinsight_spark.operators.skew import salted_aggregate

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_aggregate(
        li,
        ["l_suppkey"],
        {
            "n_lines": ("count", "l_orderkey"),
            "min_qty": ("min", "l_quantity"),
            "max_qty": ("max", "l_quantity"),
        },
        n_salts=16,
    )
    return out.select(
        "l_suppkey",
        "n_lines",
        F.round("min_qty", 6).alias("min_qty"),
        F.round("max_qty", 6).alias("max_qty"),
    )


SQL_SALTED_SUPPLIER_VOLUME = """
SELECT l_suppkey,
       count(l_orderkey)::BIGINT AS n_lines,
       round(min(l_quantity), 6) AS min_qty,
       round(max(l_quantity), 6) AS max_qty
FROM lineitem GROUP BY l_suppkey
"""


def q_target_encode_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-prep tier: smoothed leave-one-out target encoding of
    l_suppkey against the return flag (operators/encoding.py — the
    high-cardinality-categorical encoder a one-hot would explode on; the
    supplier key is the table's widest categorical). The row-level
    encoding collapses to its distinct (key, target, encoding) combos for
    a compact hash: LOO means the encoding is a function of exactly that
    pair."""
    from vectordb_bioinsight_spark.operators.encoding import target_encode_loo

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_suppkey", (F.col("l_returnflag") == "R").cast("int").alias("returned")
    )
    enc = target_encode_loo(base, ["l_suppkey"], "returned", prior_weight=20.0)
    return enc.groupBy("l_suppkey", "returned", "target_enc").agg(
        F.count("*").cast("long").alias("n_rows")
    )


SQL_TARGET_ENCODE_SUPPLIER = """
WITH base AS (
  SELECT l_suppkey, (l_returnflag = 'R')::INT AS returned FROM lineitem
), stats AS (
  SELECT l_suppkey, sum(returned::DOUBLE) AS t_sum, count(*)::BIGINT AS t_n
  FROM base GROUP BY 1
), prior AS (SELECT avg(returned::DOUBLE) AS p FROM base)
SELECT b.l_suppkey, b.returned,
       round(CASE WHEN s.t_n > 1
                  THEN (s.t_sum - b.returned + 20.0 * pr.p) / (s.t_n - 1 + 20.0)
                  ELSE pr.p END, 6) AS target_enc,
       count(*)::BIGINT AS n_rows
FROM base b JOIN stats s USING (l_suppkey) CROSS JOIN prior pr
GROUP BY 1, 2, 3
"""
