"""TPC-H-shaped coverage, part 2 — the remaining classic query shapes.

Completes the TPC-H shape sweep started in catalog_tpch.py (the reference has
none of these — SURVEY.md §2.3/§2.4 "Absent; declare for oracle coverage").
The driver's synthetic schema has no ``partsupp`` table, so Q2/Q11/Q16/Q20 are
reshaped onto ``lineitem`` (supplier×part pairs) while keeping each query's
characteristic *plan shape*: correlated min (Q2), segment top-k (Q3), pure
scan-agg (Q6), market-share conditional ratio (Q8), multi-dim profit rollup
(Q9), returned-revenue top-k (Q10), global-scalar HAVING (Q11), outer-join
count distribution (Q13), distinct-agg with NOT-IN exclusion (Q16), and
nested-aggregate semi-join (Q20).

Cross-engine exactness discipline (see SCALING.md): money sums accumulate in
DECIMAL — prices/discounts/taxes are 2-decimal-exact in the testdata, so
price*(1-disc) is 4-decimal-exact and price*(1-disc)*(1+tax) 6-decimal-exact —
then round and cast double on BOTH engines; every LIMIT orders on the rounded
value with a unique key tie-break.

Scale notes: all fact-fact joins shuffle on their join key and benefit from
AQE; every dimension (part, supplier, nation, region, filtered customer) is
broadcast-size by construction, and Catalyst's join reordering puts the
selective dimension filters below the shuffles (PushedFilters on every scan —
pinned by tests/test_plans.py for the Q3/Q8/Q9 shapes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.sources.readers import load_table, load_tables


def _rev_dec():
    # 4-decimal-exact: 2-dec price × 2-dec (1-discount)
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(20,4)")


# ---------------------------------------------------------------------------
# Q3 shape: shipping-priority top-k for one market segment
# ---------------------------------------------------------------------------

def q_segment_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-shaped: top-10 BUILDING-segment orders by open revenue (ordered
    before, shipped after the cutoff). Two fact shuffles; the filtered
    customer dimension broadcasts. Top-k compiles to TakeOrderedAndProject —
    no global sort materializes."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t["orders"].filter(F.col("o_orderdate") < "1997-01-01")
    li = t["lineitem"].filter(F.col("l_shipdate") > "1997-01-01")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(_rev_dec()), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


SQL_SEGMENT_TOP_ORDERS = """
SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
       round(sum((l.l_extendedprice * (1 - l.l_discount))::DECIMAL(20,4)), 2)::DOUBLE AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < '1997-01-01'
  AND l.l_shipdate > '1997-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l.l_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q6 shape: pure scan-filter-aggregate (forecast revenue change)
# ---------------------------------------------------------------------------

def q_discount_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6-shaped single-scan aggregate: revenue that a discount-band change
    would affect. No join, no groupBy key — the whole query is one scan with
    every predicate in PushedFilters and a map-side partial sum; at 100 TB
    this is the I/O-bound lower bound of the suite."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate").between("1996-01-01", "1996-12-31"))
        .filter(F.col("l_discount").between(0.02, 0.04))
        .filter(F.col("l_quantity") < 10)
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(20,4)")), 2
            ).cast("double").alias("revenue_affected"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


SQL_DISCOUNT_BAND_REVENUE = """
SELECT round(sum((l_extendedprice * l_discount)::DECIMAL(20,4)), 2)::DOUBLE AS revenue_affected,
       count(*)::BIGINT AS n_lines
FROM lineitem
WHERE l_shipdate BETWEEN '1996-01-01' AND '1996-12-31'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 10
"""


# ---------------------------------------------------------------------------
# Q8 shape: market share of one supplier nation within a region, per year
# ---------------------------------------------------------------------------

def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-shaped conditional ratio: per order-year, NATION_1 suppliers' share
    of PROMO-part revenue sold to EUROPE customers. One pass computes both
    the conditional and total sums (no second scan); all five dimension
    tables broadcast under the two fact shuffles."""
    t = load_tables(
        spark, sf_dir, ("customer", "orders", "lineitem", "supplier", "nation", "region", "part")
    )
    cnation = t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    europe = t["region"].filter(F.col("r_name") == "EUROPE")
    promo = t["part"].filter(F.col("p_type") == "PROMO").select("p_partkey")
    snation = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = _rev_dec()
    return (
        t["lineitem"]
        .join(t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey)
        .join(t["customer"], t["orders"].o_custkey == t["customer"].c_custkey)
        .join(F.broadcast(cnation), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(europe), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(promo), t["lineitem"].l_partkey == promo.p_partkey)
        .join(t["supplier"], t["lineitem"].l_suppkey == t["supplier"].s_suppkey)
        .join(F.broadcast(snation), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(F.sum(F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(F.lit(0).cast("decimal(20,4)"))), 2)
            .cast("double").alias("nation_revenue"),
            F.round(F.sum(rev), 2).cast("double").alias("total_revenue"),
        )
        .withColumn("mkt_share", F.round(F.col("nation_revenue") / F.col("total_revenue"), 6))
    )


SQL_NATION_MARKET_SHARE = """
WITH flat AS (
  SELECT year(o.o_orderdate)::INT AS o_year,
         (l.l_extendedprice * (1 - l.l_discount))::DECIMAL(20,4) AS rev,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
)
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_1' THEN rev ELSE 0::DECIMAL(20,4) END), 2)::DOUBLE
         AS nation_revenue,
       round(sum(rev), 2)::DOUBLE AS total_revenue,
       round(round(sum(CASE WHEN supp_nation = 'NATION_1' THEN rev ELSE 0::DECIMAL(20,4) END), 2)::DOUBLE
             / round(sum(rev), 2)::DOUBLE, 6) AS mkt_share
FROM flat
GROUP BY o_year
"""


# ---------------------------------------------------------------------------
# Q9 shape: product-line profit by supplier nation and year
# ---------------------------------------------------------------------------

def q_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-shaped profit rollup: after-tax widget-part revenue per supplier
    nation per ship-year. (No partsupp table ⇒ profit := price×(1-disc)×
    (1+tax), 6-decimal-exact.) The p_name LIKE filter prunes the part
    dimension before broadcast; grouping key is (nation, year) — low
    cardinality, so the final shuffle is trivial next to the fact scan."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "nation", "part"))
    widgets = t["part"].filter(F.col("p_name").like("%widget%")).select("p_partkey")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast("decimal(22,6)")
    return (
        t["lineitem"]
        .join(F.broadcast(widgets), t["lineitem"].l_partkey == widgets.p_partkey)
        .join(t["supplier"], t["lineitem"].l_suppkey == t["supplier"].s_suppkey)
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("profit"))
    )


SQL_NATION_PROFIT = """
SELECT n.n_name AS nation, year(l.l_shipdate)::INT AS o_year,
       round(sum((l.l_extendedprice * (1 - l.l_discount) * (1 + l.l_tax))::DECIMAL(22,6)), 2)::DOUBLE
         AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q10 shape: returned-item revenue loss per customer, top 20
# ---------------------------------------------------------------------------

def q_returned_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-shaped: top-20 customers by revenue on returned ('R') lineitems
    for orders placed in 1996Q1, with nation context. Group key carries the
    customer attributes (functionally dependent on c_custkey) so no second
    join is needed after the agg."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    orders = t["orders"].filter(
        F.col("o_orderdate").between("1996-01-01", "1996-03-31")
    )
    returned = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        returned.join(orders, returned.l_orderkey == orders.o_orderkey)
        .join(t["customer"], orders.o_custkey == t["customer"].c_custkey)
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(_rev_dec()), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_RETURNED_REVENUE_CUSTOMERS = """
SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name AS nation,
       round(sum((l.l_extendedprice * (1 - l.l_discount))::DECIMAL(20,4)), 2)::DOUBLE AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate BETWEEN '1996-01-01' AND '1996-03-31'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q13 shape: customer order-count distribution (outer join + double agg)
# ---------------------------------------------------------------------------

def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-shaped: distribution of per-customer order counts, counting only
    non-urgent orders, customers with zero included via the left outer join
    (count(o_orderkey) ignores the null-extended rows). Two aggregations:
    per-customer (shuffles on c_custkey) then per-count (tiny)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    calm = t["orders"].filter(~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
    per_cust = (
        t["customer"]
        .join(calm, t["customer"].c_custkey == calm.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


SQL_ORDER_COUNT_DISTRIBUTION = """
SELECT c_count, count(*)::BIGINT AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q2 shape: minimum-cost supplier per part within a region (correlated min)
# ---------------------------------------------------------------------------

def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-shaped correlated-min: for each STANDARD part, the ASIA supplier(s)
    whose lineitem hit the minimum extended price for that part among ASIA
    suppliers. Decorrelated form: aggregate min per part once, join back on
    (part, price) equality — exact double equality is safe because both
    engines compare the same parquet-read values. Top-20 by price desc."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "nation", "region", "part"))
    asia_nations = (
        t["nation"]
        .join(t["region"].filter(F.col("r_name") == "ASIA"), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey")
    )
    asia_supp = (
        t["supplier"]
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    std_parts = t["part"].filter(F.col("p_type") == "STANDARD").select("p_partkey", "p_name")
    offers = (
        t["lineitem"]
        .join(F.broadcast(asia_supp), F.col("l_suppkey") == asia_supp.s_suppkey)
        .join(F.broadcast(std_parts), t["lineitem"].l_partkey == std_parts.p_partkey)
        .select("p_partkey", "p_name", "l_suppkey", "s_name", "l_extendedprice")
    )
    min_price = offers.groupBy(F.col("p_partkey").alias("mp_key")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        offers.join(
            min_price,
            (offers.p_partkey == F.col("mp_key")) & (offers.l_extendedprice == F.col("min_price")),
        )
        .select("p_partkey", "p_name", F.col("l_suppkey").alias("s_suppkey"), "s_name",
                F.round("min_price", 2).alias("min_price"))
        .distinct()
        .orderBy(F.desc("min_price"), F.asc("p_partkey"), F.asc("s_suppkey"))
        .limit(20)
    )


SQL_MIN_COST_SUPPLIER = """
WITH offers AS (
  SELECT p.p_partkey, p.p_name, l.l_suppkey, s.s_name, l.l_extendedprice
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
)
SELECT DISTINCT o.p_partkey, o.p_name, o.l_suppkey AS s_suppkey, o.s_name,
       round(o.l_extendedprice, 2) AS min_price
FROM offers o
WHERE o.l_extendedprice = (
  SELECT min(o2.l_extendedprice) FROM offers o2 WHERE o2.p_partkey = o.p_partkey
)
ORDER BY min_price DESC, o.p_partkey ASC, s_suppkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q11 shape: important parts by value share (global-scalar HAVING)
# ---------------------------------------------------------------------------

def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-shaped: parts whose NATION_3-supplied revenue exceeds TWICE the
    mean per-part revenue — a HAVING against a global scalar. The scalar
    is a one-row aggregate of the same grouped intermediate (reused, not
    rescanned); Spark broadcasts it as a crossJoin'd literal-like row.

    The threshold is 2x the MEAN, not a fraction of the TOTAL: TPC-H Q11's
    own fraction shrinks with SF (0.0001/SF) because a fixed share of a
    growing total selects nothing once the part count dilutes every share
    — the r09 zero-row census measured exactly that here (186/364/0 rows
    above 0.1% at sf0.001/0.01/0.1). A multiple-of-mean threshold is
    scale-free by construction (15/126/1235 rows at the three SFs). The
    comparison stays in DECIMAL (n*value > 2*total, no FP mean) so a
    boundary part cannot flip across engines — the rule-44 flake class."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "nation"))
    n3_supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name") == "NATION_3")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    per_part = (
        t["lineitem"]
        .join(F.broadcast(n3_supp), t["lineitem"].l_suppkey == n3_supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(_rev_dec()).alias("_value"))
    )
    total = per_part.agg(
        F.sum("_value").alias("_total"), F.count(F.lit(1)).alias("_n")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("_value") * F.col("_n") > 2 * F.col("_total"))
        .select("l_partkey", F.round(F.col("_value"), 2).cast("double").alias("value"))
        .orderBy(F.desc("value"), F.asc("l_partkey"))
    )


SQL_IMPORTANT_PARTS = """
WITH per_part AS (
  SELECT l.l_partkey,
         sum((l.l_extendedprice * (1 - l.l_discount))::DECIMAL(20,4)) AS _value
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_3'
  GROUP BY 1
)
SELECT l_partkey, round(_value, 2)::DOUBLE AS value
FROM per_part
WHERE _value * (SELECT count(*) FROM per_part)
      > 2 * (SELECT sum(_value) FROM per_part)
ORDER BY value DESC, l_partkey ASC
"""


# ---------------------------------------------------------------------------
# Q16 shape: supplier diversity per part attribute (distinct agg + NOT IN)
# ---------------------------------------------------------------------------

def q_part_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-shaped: count of distinct suppliers that shipped each
    (brand, type, size∈{1,14,23,45}) combination, excluding BRAND_0 and
    suppliers in debt (acctbal < 0 — the complaint-supplier NOT-IN analog).
    The distinct travels inside the agg (two-phase partial distinct); the
    debtor exclusion is a broadcast anti-join."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "part"))
    parts = (
        t["part"]
        .filter(F.col("p_brand") != "BRAND_0")
        .filter(F.col("p_size").isin(1, 14, 23, 45))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    debtors = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .join(F.broadcast(parts), t["lineitem"].l_partkey == parts.p_partkey)
        .join(F.broadcast(debtors), t["lineitem"].l_suppkey == debtors.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size"))
    )


SQL_PART_SUPPLIER_DIVERSITY = """
SELECT p.p_brand, p.p_type, p.p_size, count(DISTINCT l.l_suppkey)::BIGINT AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'BRAND_0'
  AND p.p_size IN (1, 14, 23, 45)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p.p_brand ASC, p.p_type ASC, p.p_size ASC
"""


# ---------------------------------------------------------------------------
# Q20 shape: dominant shippers (nested aggregate semi-join)
# ---------------------------------------------------------------------------

def q_dominant_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-shaped nested-aggregate semi-join: suppliers who shipped more
    than 30% of some widget part's total 1996 quantity, with their nation.
    Inner level aggregates (supplier, part); the part-total is a second
    aggregate of the SAME intermediate (no rescan); qualifying pairs
    semi-join back to the supplier-nation dimension. Quantities are
    integral doubles, so sums are exact.

    No single-nation pin (r09 zero-row census): only ~10 dominant
    suppliers exist at sf0.001 spread over ~10 nations, so any one-nation
    filter is vacuously empty at small SF by lottery — the nation is an
    output column instead (10/92/919 rows at the three SFs)."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "nation", "part"))
    widgets = t["part"].filter(F.col("p_name").like("%widget%")).select("p_partkey")
    li96 = (
        t["lineitem"]
        .filter(F.col("l_shipdate").between("1996-01-01", "1996-12-31"))
        .join(F.broadcast(widgets), t["lineitem"].l_partkey == widgets.p_partkey)
    )
    pair_qty = li96.groupBy("l_suppkey", "l_partkey").agg(F.sum("l_quantity").alias("pair_qty"))
    part_qty = pair_qty.groupBy(F.col("l_partkey").alias("pq_key")).agg(
        F.sum("pair_qty").alias("part_qty")
    )
    dominant = (
        pair_qty.join(part_qty, pair_qty.l_partkey == F.col("pq_key"))
        .filter(F.col("pair_qty") > 0.3 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    return (
        supp.join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .orderBy("s_suppkey")
    )


SQL_DOMINANT_SHIPPERS = """
WITH pair_qty AS (
  SELECT l.l_suppkey, l.l_partkey, sum(l.l_quantity) AS pair_qty
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE '%widget%'
    AND l.l_shipdate BETWEEN '1996-01-01' AND '1996-12-31'
  GROUP BY 1, 2
), part_qty AS (
  SELECT l_partkey, sum(pair_qty) AS part_qty FROM pair_qty GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, n.n_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_suppkey IN (
    SELECT pq.l_suppkey
    FROM pair_qty pq JOIN part_qty pt ON pq.l_partkey = pt.l_partkey
    WHERE pq.pair_qty > 0.3 * pt.part_qty
  )
ORDER BY s.s_suppkey
"""
