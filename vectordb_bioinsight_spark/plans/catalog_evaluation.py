"""Evaluation / drift / interval / linkage catalog entries (r05 session 3):
classifier evaluation (ROC-AUC, PR curve, calibration + Brier, confusion
tables), distribution-drift monitoring (PSI, KS), interval algebra
(islands + coverage), Pareto frontier, and fuzzy entity resolution.

The evaluation tier scores `value` as a naive purchase-propensity signal
over the events stream (p = value/500 clamped — exact per-row arithmetic,
so bin assignment is engine-deterministic); drift compares the first and
second half of the event month; intervals merge supplier ship windows;
linkage resolves the part-name dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.drift import ks_two_sample, psi_drift
from vectordb_bioinsight_spark.operators.evaluation import (
    calibration_bins,
    calibration_summary,
    confusion_at_thresholds,
    pr_curve,
    roc_auc,
)
from vectordb_bioinsight_spark.operators.intervals import (
    coverage_stats,
    merge_intervals,
    pareto_frontier,
)
from vectordb_bioinsight_spark.operators.linkage import (
    fuzzy_name_pairs,
    resolve_entities,
)
from vectordb_bioinsight_spark.sources.readers import load_table


def _purchase_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("value").alias("score"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
        F.least(F.col("value") / 500.0, F.lit(1.0)).alias("p"),
        # day as TIMESTAMP on both sides — the catalog's cross-engine hash
        # convention for date outputs (pandas renders both as midnight)
        F.to_date("ts").cast("timestamp").alias("day"),
    )


def q_purchase_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day exact tie-aware ROC-AUC of event value as a purchase
    discriminator — the Mann-Whitney identity over tie-grouped ranks
    (operators/evaluation.roc_auc; pancancer_classifier.py:214-420 trains
    and prints sklearn metrics driver-side, this is the distributed form)."""
    return roc_auc(_purchase_scored(spark, sf_dir), ["day"], "y", "score")


SQL_PURCHASE_AUC = """
WITH ev AS (
  SELECT date_trunc('day', ts)::DATE AS day, value::DOUBLE AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
), tied AS (
  SELECT day, s, count(*)::DOUBLE AS t, sum(y)::DOUBLE AS tp FROM ev GROUP BY 1, 2
), ranked AS (
  SELECT day, t, tp,
         coalesce(sum(t) OVER (PARTITION BY day ORDER BY s ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + (t + 1.0) / 2.0 AS r
  FROM tied
), agg AS (
  SELECT day, sum(tp) AS np, sum(t) - sum(tp) AS nn, sum(tp * r) AS rp
  FROM ranked GROUP BY 1
)
SELECT day, np::BIGINT AS n_pos, nn::BIGINT AS n_neg,
       round((rp - np * (np + 1.0) / 2.0) / (np * nn), 6) AS auc
FROM agg WHERE np > 0 AND nn > 0
"""


def q_purchase_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall curve over tens-bucketed value thresholds —
    tie-grouped cumulative counts, one bounded global window
    (operators/evaluation.pr_curve)."""
    df = _purchase_scored(spark, sf_dir).select(
        # floor-bucketing, not round: round(x, -1) half-rounding differs
        # between engines at .5 boundaries; floor is unambiguous
        (F.floor(F.col("score") / 10.0) * 10.0).alias("score"), "y"
    )
    return pr_curve(df, "y", "score")


SQL_PURCHASE_PR_CURVE = """
WITH ev AS (
  SELECT floor(value / 10.0) * 10.0 AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
), tied AS (
  SELECT score::DOUBLE AS score, count(*)::BIGINT AS n, sum(y)::BIGINT AS np
  FROM ev GROUP BY 1
)
SELECT score,
       (sum(np) OVER w)::BIGINT AS cum_tp,
       (sum(n - np) OVER w)::BIGINT AS cum_fp,
       round(sum(np) OVER w::DOUBLE
             / nullif(sum(np) OVER w + sum(n - np) OVER w, 0), 6) AS precision,
       round(sum(np) OVER w::DOUBLE / nullif(sum(np) OVER (), 0), 6) AS recall
FROM tied
WINDOW w AS (ORDER BY score DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_purchase_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram bins for the naive propensity p = value/500 —
    one map-side-combinable groupBy on the bin index
    (operators/evaluation.calibration_bins)."""
    return calibration_bins(_purchase_scored(spark, sf_dir), "y", "p", n_bins=10)


SQL_PURCHASE_CALIBRATION = """
WITH ev AS (
  SELECT least(value::DOUBLE / 500.0, 1.0) AS p,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
), b AS (
  SELECT least(floor(p * 10), 9)::INT AS bin, count(*)::BIGINT AS n,
         avg(p) AS mp, avg(y::DOUBLE) AS fp
  FROM ev GROUP BY 1
)
SELECT bin, n, round(mp, 6) AS mean_prob, round(fp, 6) AS frac_pos,
       round(mp - fp, 6) AS gap
FROM b
"""


def q_purchase_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row Brier score with Murphy's reliability/resolution/uncertainty
    decomposition (operators/evaluation.calibration_summary) — two tiny
    aggregations, base rate folded out of the same partials."""
    return calibration_summary(_purchase_scored(spark, sf_dir), "y", "p", n_bins=10)


SQL_PURCHASE_BRIER = """
WITH ev AS (
  SELECT least(value::DOUBLE / 500.0, 1.0) AS p,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
), b AS (
  SELECT least(floor(p * 10), 9)::INT AS bin, count(*)::DOUBLE AS n,
         avg(p) AS mp, avg(y::DOUBLE) AS fp,
         sum((p - y) * (p - y)) AS se, sum(y)::DOUBLE AS pos
  FROM ev GROUP BY 1
)
SELECT sum(n)::BIGINT AS n,
       round(sum(se) / sum(n), 6) AS brier,
       round(sum(n * (mp - fp) * (mp - fp)) / sum(n), 6) AS reliability,
       round(sum(n * fp * fp) / sum(n)
             - (sum(pos) / sum(n)) * (sum(pos) / sum(n)), 6) AS resolution,
       round((sum(pos) / sum(n)) * (1.0 - sum(pos) / sum(n)), 6) AS uncertainty
FROM b
"""


_CONF_THRESHOLDS = [50.0, 150.0, 300.0]


def q_purchase_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion table + precision/recall/F1 at three value thresholds —
    ONE global conditional aggregation, rows inlined from the 1-row frame
    (operators/evaluation.confusion_at_thresholds; the funnel counts shape)."""
    return confusion_at_thresholds(
        _purchase_scored(spark, sf_dir), "y", "score", _CONF_THRESHOLDS
    )


SQL_PURCHASE_CONFUSION = """
WITH ev AS (
  SELECT value::DOUBLE AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
), t AS (
  SELECT unnest([50.0, 150.0, 300.0]) AS threshold
), c AS (
  SELECT t.threshold,
         sum(CASE WHEN s >= t.threshold AND y = 1 THEN 1 ELSE 0 END)::BIGINT AS tp,
         sum(CASE WHEN s >= t.threshold AND y = 0 THEN 1 ELSE 0 END)::BIGINT AS fp,
         sum(CASE WHEN s < t.threshold AND y = 1 THEN 1 ELSE 0 END)::BIGINT AS fn,
         sum(CASE WHEN s < t.threshold AND y = 0 THEN 1 ELSE 0 END)::BIGINT AS tn
  FROM ev, t GROUP BY 1
)
SELECT threshold, tp, fp, fn, tn,
       round(tp::DOUBLE / nullif(tp + fp, 0), 6) AS precision,
       round(tp::DOUBLE / nullif(tp + fn, 0), 6) AS recall,
       round(2.0 * tp / nullif(2 * tp + fp + fn, 0), 6) AS f1
FROM c
"""


_DRIFT_SPLIT = "2024-01-16"


def q_value_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI of event values, second half of the month vs the first — exact
    reference deciles (percentile == quantile_cont, cuts rounded 4 dp for
    engine-deterministic binning), ε-smoothed shares
    (operators/drift.psi_drift; crawler.py refresh endpoints have no such
    guard — this is the snapshot-drift check a refresh pipeline needs)."""
    ev = load_table(spark, sf_dir, "events")
    split = F.to_timestamp(F.lit(_DRIFT_SPLIT))
    return psi_drift(
        ev.filter(F.col("ts") < split),
        ev.filter(F.col("ts") >= split),
        "value",
        n_bins=10,
    )


SQL_VALUE_PSI_DRIFT = """
WITH ref AS (
  SELECT value::DOUBLE AS v FROM events WHERE ts < TIMESTAMP '2024-01-16'
), cur AS (
  SELECT value::DOUBLE AS v FROM events WHERE ts >= TIMESTAMP '2024-01-16'
), cuts AS (
  SELECT list_transform(
           quantile_cont(v, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
           c -> round(c, 4)) AS cs
  FROM ref
), spine AS (
  SELECT unnest(generate_series(0, 9)) AS bin
), rb AS (
  SELECT len(list_filter(cs, c -> c <= v)) AS bin, count(*)::BIGINT AS ref_n
  FROM ref, cuts WHERE v IS NOT NULL GROUP BY 1
), cb AS (
  SELECT len(list_filter(cs, c -> c <= v)) AS bin, count(*)::BIGINT AS cur_n
  FROM cur, cuts WHERE v IS NOT NULL GROUP BY 1
), rnull AS (
  SELECT count(*)::BIGINT AS ref_null FROM ref WHERE v IS NULL
), cnull AS (
  SELECT count(*)::BIGINT AS cur_null FROM cur WHERE v IS NULL
), j AS (
  SELECT s.bin,
         CASE WHEN s.bin > 0 THEN cs[s.bin] END AS lo,
         CASE WHEN s.bin < 9 THEN cs[s.bin + 1] END AS hi,
         coalesce(rb.ref_n, 0) AS ref_n, coalesce(cb.cur_n, 0) AS cur_n
  FROM spine s CROSS JOIN cuts
  LEFT JOIN rb ON rb.bin = s.bin LEFT JOIN cb ON cb.bin = s.bin
), f AS (
  SELECT bin, lo, hi, ref_n, cur_n,
         greatest(ref_n::DOUBLE / nullif(sum(ref_n) OVER (), 0), 1e-6) AS rf,
         greatest(cur_n::DOUBLE / nullif(sum(cur_n) OVER (), 0), 1e-6) AS cf
  FROM j
)
SELECT bin, round(lo, 6) AS lo, round(hi, 6) AS hi, ref_n, cur_n,
       round(rf, 6) AS ref_frac, round(cf, 6) AS cur_frac,
       round((cf - rf) * ln(cf / rf), 6) AS psi_term,
       round(sum((cf - rf) * ln(cf / rf)) OVER (), 6) AS psi_total,
       ref_null, cur_null
FROM f CROSS JOIN rnull CROSS JOIN cnull ORDER BY bin
"""


def q_purchase_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS statistic between purchase and non-purchase value
    distributions — tie-grouped ECDFs, one bounded window, 1-row top-off
    (operators/drift.ks_two_sample)."""
    ev = load_table(spark, sf_dir, "events")
    df = ev.select(
        (F.col("event_type") == "purchase").cast("int").alias("g"),
        F.col("value"),
    )
    return ks_two_sample(df, "g", "value")


SQL_PURCHASE_KS_DRIFT = """
WITH ev AS (
  SELECT value::DOUBLE AS v,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g
  FROM events
), tied AS (
  SELECT v, sum(g)::DOUBLE AS na, sum(1 - g)::DOUBLE AS nb FROM ev GROUP BY 1
), c AS (
  SELECT v, sum(na) OVER w AS cna, sum(nb) OVER w AS cnb,
         sum(na) OVER () AS ta, sum(nb) OVER () AS tb
  FROM tied
  WINDOW w AS (ORDER BY v ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT ta::BIGINT AS n_a, tb::BIGINT AS n_b,
       round(abs(cna / nullif(ta, 0) - cnb / nullif(tb, 0)), 6) AS d_stat,
       v AS d_at_value
FROM c ORDER BY d_stat DESC, d_at_value ASC LIMIT 1
"""


def _ship_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_suppkey"),
        F.col("l_shipdate").cast("date").alias("s"),
        F.date_add(
            F.col("l_shipdate").cast("date"), F.col("l_quantity").cast("int") % 3
        ).alias("e"),
    )


def q_supplier_ship_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands merge of per-supplier ship windows
    ([shipdate, shipdate + qty%3 days]) — one key-partitioned window pair
    sharing a partitioning + one rollup (operators/intervals.merge_intervals)."""
    return merge_intervals(
        _ship_intervals(spark, sf_dir), ["l_suppkey"], "s", "e"
    ).select(
        "l_suppkey",
        "island",
        F.col("start").cast("timestamp").alias("start"),
        F.col("end").cast("timestamp").alias("end"),
        "n_intervals",
    )


SQL_SUPPLIER_SHIP_ISLANDS = """
WITH iv AS (
  SELECT l_suppkey, l_shipdate::DATE AS s,
         l_shipdate::DATE + to_days(l_quantity::INT % 3) AS e
  FROM lineitem
), m AS (
  SELECT l_suppkey, s, e,
         max(e) OVER (PARTITION BY l_suppkey ORDER BY s ASC, e ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
  FROM iv
), fl AS (
  SELECT l_suppkey, s, e,
         CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS nf
  FROM m
), isl AS (
  SELECT l_suppkey, s, e,
         sum(nf) OVER (PARTITION BY l_suppkey ORDER BY s ASC, e ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::INT AS island
  FROM fl
)
SELECT l_suppkey, island, min(s) AS start, max(e) AS "end",
       count(*)::BIGINT AS n_intervals
FROM isl GROUP BY 1, 2
"""


def q_supplier_ship_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier coverage summary over the merged ship islands —
    islands + one more per-key aggregation
    (operators/intervals.coverage_stats)."""
    return coverage_stats(_ship_intervals(spark, sf_dir), ["l_suppkey"], "s", "e")


SQL_SUPPLIER_SHIP_COVERAGE = """
WITH iv AS (
  SELECT l_suppkey, l_shipdate::DATE AS s,
         l_shipdate::DATE + to_days(l_quantity::INT % 3) AS e
  FROM lineitem
), m AS (
  SELECT l_suppkey, s, e,
         max(e) OVER (PARTITION BY l_suppkey ORDER BY s ASC, e ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
  FROM iv
), fl AS (
  SELECT l_suppkey, s, e,
         CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS nf
  FROM m
), isl AS (
  SELECT l_suppkey, s, e,
         sum(nf) OVER (PARTITION BY l_suppkey ORDER BY s ASC, e ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::INT AS island
  FROM fl
), islands AS (
  SELECT l_suppkey, island, min(s) AS st, max(e) AS en
  FROM isl GROUP BY 1, 2
), per AS (
  SELECT l_suppkey, count(*)::BIGINT AS n_islands,
         sum(datediff('day', st, en) + 1)::BIGINT AS covered,
         min(st) AS lo, max(en) AS hi
  FROM islands GROUP BY 1
)
SELECT l_suppkey, n_islands, covered,
       (datediff('day', lo, hi) + 1)::BIGINT AS span,
       ((datediff('day', lo, hi) + 1) - covered)::BIGINT AS gaps,
       round(covered::DOUBLE / nullif(datediff('day', lo, hi) + 1, 0), 6) AS coverage
FROM per
"""


def q_part_price_size_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto skyline of parts — cheapest price per strictly-better
    size: distinct points + one sorted sweep, no self-join
    (operators/intervals.pareto_frontier; generalizes the reranker's
    scalar blend at core_paper_reranker.py:193-453 to the non-dominated
    set)."""
    part = load_table(spark, sf_dir, "part")
    return pareto_frontier(part, "p_retailprice", "p_size")


SQL_PART_PRICE_SIZE_FRONTIER = """
WITH pts AS (
  SELECT p_retailprice AS mn, p_size AS mx, count(*)::BIGINT AS n_rows
  FROM part GROUP BY 1, 2
), sw AS (
  SELECT mn, mx, n_rows,
         max(mx) OVER (ORDER BY mn ASC, mx DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pb
  FROM pts
)
SELECT mn AS p_retailprice, mx AS p_size, n_rows
FROM sw WHERE pb IS NULL OR mx > pb
"""


def q_fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked edit-distance linkage over the distinct part-name dimension
    — block on the noun (last token), levenshtein ≤ 1
    (operators/linkage.fuzzy_name_pairs; the typo-tolerant upgrade of
    medical_vocabulary.py's exact synonym lookup)."""
    part = load_table(spark, sf_dir, "part")
    return fuzzy_name_pairs(
        part, "p_name", lambda c: F.substring_index(c, " ", -1), max_dist=1
    )


SQL_FUZZY_PART_NAMES = """
WITH dim AS (
  SELECT p_name AS name, count(*)::BIGINT AS n FROM part GROUP BY 1
), b AS (
  SELECT name, n, split_part(name, ' ', 2) AS blk FROM dim
)
SELECT a.name AS name_a, c.name AS name_b,
       levenshtein(a.name, c.name)::INT AS dist, a.n AS n_a, c.n AS n_b
FROM b a JOIN b c ON a.blk = c.blk AND a.name < c.name
WHERE levenshtein(a.name, c.name) <= 1
ORDER BY 1, 2
"""


def q_part_name_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full entity resolution of the part-name dimension: fuzzy pairs →
    transitive closure (connected components, min-label) → canonical name
    mapping (operators/linkage.resolve_entities)."""
    part = load_table(spark, sf_dir, "part")
    return resolve_entities(
        part, "p_name", lambda c: F.substring_index(c, " ", -1), max_dist=1
    )


SQL_PART_NAME_RESOLUTION = """
WITH RECURSIVE dim AS (
  SELECT p_name AS name, count(*)::BIGINT AS n FROM part GROUP BY 1
), b AS (
  SELECT name, split_part(name, ' ', 2) AS blk FROM dim
), pr AS (
  SELECT a.name AS na, c.name AS nb
  FROM b a JOIN b c ON a.blk = c.blk AND a.name < c.name
  WHERE levenshtein(a.name, c.name) <= 1
), e AS (
  SELECT na AS src, nb AS dst FROM pr UNION SELECT nb, na FROM pr
), reach(nm, r) AS (
  SELECT DISTINCT src, src FROM e
  UNION
  SELECT e.dst, reach.r FROM reach JOIN e ON e.src = reach.nm
), comp AS (
  SELECT nm, min(r) AS canonical FROM reach GROUP BY 1
)
SELECT d.name, coalesce(c.canonical, d.name) AS canonical, d.n
FROM dim d LEFT JOIN comp c ON c.nm = d.name
ORDER BY 1
"""


def q_ship_overlap_annotation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bin-blocked interval-overlap join (operators/intervals.py::
    interval_overlap_join — the bedtools-intersect / variant-annotation
    shape): ±5-day-tolerance windows around a sampled shipment set are
    annotated against the supplier's merged activity islands; per
    (supplier, island) the hit count and total inclusive overlap days.
    The inequality join runs as an equi-join on (suppkey, 32-day bin)
    with owner-bin dedup — no nested loop, no distinct pass."""
    from vectordb_bioinsight_spark.operators.intervals import (
        interval_overlap_join,
    )

    li = load_table(spark, sf_dir, "lineitem")
    epoch = F.lit("1970-01-01").cast("date")
    ship = F.datediff(F.col("l_shipdate"), epoch).cast("long")
    # no receiptdate in the synthetic lineitem — derive a transit window
    # of qty % 14 days (the supplier_ship_islands convention)
    recv = ship + (F.col("l_quantity").cast("long") % 14)
    iv = li.select(
        F.col("l_suppkey").alias("suppkey"),
        ship.alias("start"),
        recv.alias("end"),
    )
    islands = merge_intervals(iv, ["suppkey"], "start", "end").select(
        "suppkey", "island", "start", "end"
    )
    sample = li.filter(F.col("l_orderkey") % 37 == 0).select(
        F.col("l_suppkey").alias("suppkey"),
        (ship - 5).alias("start"),
        (recv + 5).alias("end"),
    )
    joined = interval_overlap_join(sample, islands, ["suppkey"], bin_size=32)
    return joined.groupBy(
        "suppkey", F.col("island_r").alias("island")
    ).agg(
        F.count("*").cast("long").alias("n_overlaps"),
        F.sum("overlap").cast("long").alias("overlap_days"),
    )


SQL_SHIP_OVERLAP_ANNOTATION = """
WITH iv AS (
  SELECT l_suppkey AS suppkey,
         (l_shipdate::DATE - DATE '1970-01-01') AS s,
         (l_shipdate::DATE - DATE '1970-01-01') + (l_quantity::BIGINT % 14) AS e
  FROM lineitem
), m AS (
  SELECT suppkey, s, e,
         max(e) OVER (PARTITION BY suppkey ORDER BY s ASC, e ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
  FROM iv
), fl AS (
  SELECT suppkey, s, e,
         CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END AS nf
  FROM m
), isl AS (
  SELECT suppkey, s, e,
         sum(nf) OVER (PARTITION BY suppkey ORDER BY s ASC, e ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::INT AS island
  FROM fl
), islands AS (
  SELECT suppkey, island, min(s) AS rs, max(e) AS re
  FROM isl GROUP BY 1, 2
), sample AS (
  SELECT l_suppkey AS suppkey,
         (l_shipdate::DATE - DATE '1970-01-01') - 5 AS ls,
         (l_shipdate::DATE - DATE '1970-01-01') + (l_quantity::BIGINT % 14) + 5 AS le
  FROM lineitem WHERE l_orderkey % 37 = 0
)
SELECT s.suppkey, i.island,
       count(*)::BIGINT AS n_overlaps,
       sum(least(s.le, i.re) - greatest(s.ls, i.rs) + 1)::BIGINT AS overlap_days
FROM sample s JOIN islands i
  ON s.suppkey = i.suppkey AND s.ls <= i.re AND i.rs <= s.le
GROUP BY 1, 2
"""


def q_purchase_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WOE / Information-Value audit of the 50-wide value bucket against
    the purchase label (operators/encoding.py::woe_iv — one bucket
    groupBy, totals folded back from broadcast 1-row aggregates): the
    standard predictiveness screen for a binned feature, completing the
    evaluation tier's feature-side story."""
    from vectordb_bioinsight_spark.operators.encoding import woe_iv

    ev = load_table(spark, sf_dir, "events")
    binned = ev.select(
        F.floor(F.col("value") / 50.0).cast("int").alias("vbucket"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    return woe_iv(binned, "vbucket", "y", smoothing=0.5)


SQL_PURCHASE_WOE_IV = """
WITH b AS (
  SELECT floor(value / 50.0)::INT AS bucket,
         (event_type = 'purchase')::INT AS y
  FROM events
), per AS (
  SELECT bucket, sum(y)::BIGINT AS n_pos, sum(1 - y)::BIGINT AS n_neg
  FROM b GROUP BY 1
), tot AS (
  SELECT sum(n_pos)::DOUBLE AS tp, sum(n_neg)::DOUBLE AS tn FROM per
), scored AS (
  SELECT bucket, n_pos, n_neg,
         round(ln(((n_pos + 0.5) / tp) / ((n_neg + 0.5) / tn)), 6) AS woe,
         round((n_pos / tp - n_neg / tn)
               * ln(((n_pos + 0.5) / tp) / ((n_neg + 0.5) / tn)), 6) AS iv_contrib
  FROM per, tot
)
SELECT bucket, n_pos, n_neg, woe, iv_contrib,
       (SELECT round(sum(iv_contrib), 6) FROM scored) AS iv_total
FROM scored
"""


_DP_EPS, _DP_CLIP, _DP_SEED_N, _DP_SEED_S = 1.0, 400.0, 101, 202


def q_dp_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-DP release of per-type event counts and clipped value totals
    (operators/privacy.py::dp_counts / dp_sum — Laplace mechanism with
    PRF-derived noise, seed fixed HERE because this entry's job is
    cross-engine verification; a real release keeps its seed secret).
    One exact groupBy each + a scan-local noise projection."""
    from vectordb_bioinsight_spark.operators.privacy import dp_counts, dp_sum

    ev = load_table(spark, sf_dir, "events")
    n = dp_counts(ev, ["event_type"], epsilon=_DP_EPS, seed=_DP_SEED_N)
    s = dp_sum(
        ev, ["event_type"], "value", clip=_DP_CLIP, epsilon=_DP_EPS,
        seed=_DP_SEED_S,
    )
    return n.join(s, "event_type")


SQL_DP_TYPE_STATS = f"""
WITH per AS (
  SELECT event_type, count(*)::DOUBLE AS n,
         sum(least(greatest(value::DOUBLE, 0.0), {_DP_CLIP})) AS s
  FROM events GROUP BY 1
), noised AS (
  SELECT event_type, n, s,
         ((('0x' || substr(md5('{_DP_SEED_N}|' || event_type), 1, 15))::BIGINT + 0.5)
           / 1152921504606846976.0) - 0.5 AS cn,
         ((('0x' || substr(md5('{_DP_SEED_S}|' || event_type), 1, 15))::BIGINT + 0.5)
           / 1152921504606846976.0) - 0.5 AS cs
  FROM per
)
SELECT event_type,
       greatest(round(n + (-(1.0 / {_DP_EPS}) * sign(cn) * ln(1.0 - 2.0 * abs(cn))), 0), 0.0)::BIGINT AS n_dp,
       round(greatest(s + (-({_DP_CLIP} / {_DP_EPS}) * sign(cs) * ln(1.0 - 2.0 * abs(cs))), 0.0), 4) AS sum_dp
FROM noised
"""


def q_cluster_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label SIMPLIFIED silhouette over the embeddings table
    (operators/evaluation.py::silhouette_simplified — the linear
    centroid form of the evaluator's clustering score,
    sc_pipeline_evaluator.py:911-959)."""
    from vectordb_bioinsight_spark.operators.evaluation import silhouette_simplified

    emb = load_table(spark, sf_dir, "embeddings")
    return silhouette_simplified(emb, "vec_id", "embedding", "label")


SQL_CLUSTER_SILHOUETTE = """
WITH cent AS (
  SELECT label, gs AS pos, avg(v) AS m
  FROM (SELECT label, unnest(embedding)::DOUBLE AS v,
               generate_subscripts(embedding, 1) AS gs
        FROM embeddings)
  GROUP BY 1, 2
), centarr AS (
  SELECT label AS clbl, list(m ORDER BY pos) AS c FROM cent GROUP BY 1
), d AS (
  SELECT p.vec_id AS id, p.label AS lbl, c.clbl,
         round(sqrt(list_sum(list_transform(
           list_zip(p.embedding, c.c), z -> (z[1]::DOUBLE - z[2]) * (z[1]::DOUBLE - z[2])
         ))), 6) AS d
  FROM embeddings p CROSS JOIN centarr c
), pp AS (
  SELECT id, lbl,
         min(CASE WHEN clbl = lbl THEN d END) AS a,
         min(CASE WHEN clbl <> lbl THEN d END) AS b
  FROM d GROUP BY 1, 2
), s AS (
  SELECT lbl,
         CASE WHEN a IS NULL OR b IS NULL OR greatest(a, b) = 0 THEN 0.0
              ELSE (b - a) / greatest(a, b) END AS s
  FROM pp
)
SELECT lbl AS label, count(*)::BIGINT AS n_points,
       round(avg(s), 6) AS mean_silhouette,
       round((avg(s) + 1.0) / 2.0 * 100.0, 4) AS eval_score
FROM s GROUP BY 1
"""


def q_cluster_silhouette_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mean silhouette (all-pairs, the sklearn statistic the
    reference evaluator computes, sc_pipeline_evaluator.py:911-953) on a
    deterministic 1-in-5 sample — the small-n diagnostic path; the
    corpus-scale surrogate is cluster_silhouette."""
    from vectordb_bioinsight_spark.operators.evaluation import silhouette_exact

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    return silhouette_exact(emb, "vec_id", "embedding", "label")


SQL_CLUSTER_SILHOUETTE_EXACT = """
WITH pts AS (
  SELECT vec_id AS id, label, embedding FROM embeddings WHERE vec_id % 5 = 0
), pm AS (
  SELECT a.id, a.label AS lbl, b.label AS jlbl,
         avg(round(sqrt(list_sum(list_transform(
           list_zip(a.embedding, b.embedding),
           z -> (z[1]::DOUBLE - z[2]::DOUBLE) * (z[1]::DOUBLE - z[2]::DOUBLE)
         ))), 6)) AS md
  FROM pts a JOIN pts b ON a.id <> b.id
  GROUP BY 1, 2, 3
), pp AS (
  SELECT id, lbl,
         max(CASE WHEN jlbl = lbl THEN md END) AS a,
         min(CASE WHEN jlbl <> lbl THEN md END) AS b
  FROM pm GROUP BY 1, 2
), s AS (
  SELECT lbl,
         CASE WHEN a IS NULL OR b IS NULL OR greatest(a, b) = 0 THEN 0.0
              ELSE (b - a) / greatest(a, b) END AS s
  FROM pp
)
SELECT lbl AS label, count(*)::BIGINT AS n_points,
       round(avg(s), 6) AS mean_silhouette,
       round((avg(s) + 1.0) / 2.0 * 100.0, 4) AS eval_score
FROM s GROUP BY 1
"""


def q_classification_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiclass classification report (operators/evaluation.py::
    classification_report — the sklearn metric suite of the reference's
    validation scripts, robust_model_validation.py:30-31,201-216):
    event_type as the true label, a planted noisy predictor (5-in-7
    correct, rotating confusions) as the prediction."""
    from vectordb_bioinsight_spark.operators.evaluation import classification_report

    ev = load_table(spark, sf_dir, "events")
    types = F.array(
        F.lit("signup"), F.lit("view"), F.lit("click"),
        F.lit("purchase"), F.lit("error"),
    )
    pred = F.when(F.col("event_id") % 7 < 5, F.col("event_type")).otherwise(
        F.element_at(types, (F.col("event_id") % 5 + 1).cast("int"))
    )
    return classification_report(
        ev.select(F.col("event_type").alias("t"), pred.alias("p")), "t", "p"
    )


SQL_CLASSIFICATION_REPORT_EVENTS = """
WITH scored0 AS (
  SELECT event_type AS t,
         CASE WHEN event_id % 7 < 5 THEN event_type
              ELSE ['signup','view','click','purchase','error'][(event_id % 5 + 1)::INT]
         END AS p
  FROM events
), cm AS (
  SELECT t, p, count(*)::DOUBLE AS n FROM scored0 GROUP BY 1, 2
), labels AS (
  SELECT t AS lbl FROM cm UNION SELECT p FROM cm
), pc AS (
  SELECT l.lbl,
         coalesce(tn.true_n, 0.0) AS true_n,
         coalesce(pn.pred_n, 0.0) AS pred_n,
         coalesce(dg.tp, 0.0) AS tp
  FROM labels l
  LEFT JOIN (SELECT t, sum(n) AS true_n FROM cm GROUP BY 1) tn ON tn.t = l.lbl
  LEFT JOIN (SELECT p, sum(n) AS pred_n FROM cm GROUP BY 1) pn ON pn.p = l.lbl
  LEFT JOIN (SELECT t, n AS tp FROM cm WHERE t = p) dg ON dg.t = l.lbl
), sc AS (
  SELECT lbl, true_n, pred_n, tp,
         CASE WHEN pred_n > 0 THEN tp / pred_n ELSE 0.0 END AS prec,
         CASE WHEN true_n > 0 THEN tp / true_n ELSE 0.0 END AS rec
  FROM pc
), scf AS (
  SELECT *, CASE WHEN prec + rec > 0 THEN 2 * prec * rec / (prec + rec)
                 ELSE 0.0 END AS f1
  FROM sc
), class_rows AS (
  SELECT lbl AS scope, 'precision' AS metric, round(prec, 6) AS value FROM scf
  UNION ALL SELECT lbl, 'recall', round(rec, 6) FROM scf
  UNION ALL SELECT lbl, 'f1', round(f1, 6) FROM scf
  UNION ALL SELECT lbl, 'support', true_n FROM scf
), tot AS (
  SELECT sum(tp) AS c, sum(true_n) AS s,
         sum(pred_n * true_n) AS pt, sum(pred_n * pred_n) AS pp,
         sum(true_n * true_n) AS tt,
         avg(prec) AS macro_p, avg(rec) AS macro_r, avg(f1) AS macro_f1,
         sum(f1 * true_n) / sum(true_n) AS w_f1,
         sum(prec * true_n) / sum(true_n) AS w_p,
         sum(rec * true_n) / sum(true_n) AS w_r
  FROM scf
), summary_rows AS (
  SELECT 'overall' AS scope, 'accuracy' AS metric, round(c / s, 6) AS value FROM tot
  UNION ALL SELECT 'overall', 'mcc',
    round(CASE WHEN sqrt((s * s - pp) * (s * s - tt)) > 0
               THEN (c * s - pt) / sqrt((s * s - pp) * (s * s - tt))
               ELSE 0.0 END, 6) FROM tot
  UNION ALL SELECT 'overall', 'kappa',
    round(CASE WHEN pt / (s * s) < 1.0
               THEN (c / s - pt / (s * s)) / (1 - pt / (s * s))
               ELSE 0.0 END, 6) FROM tot
  UNION ALL SELECT 'macro', 'precision', round(macro_p, 6) FROM tot
  UNION ALL SELECT 'macro', 'recall', round(macro_r, 6) FROM tot
  UNION ALL SELECT 'macro', 'f1', round(macro_f1, 6) FROM tot
  UNION ALL SELECT 'weighted', 'precision', round(w_p, 6) FROM tot
  UNION ALL SELECT 'weighted', 'recall', round(w_r, 6) FROM tot
  UNION ALL SELECT 'weighted', 'f1', round(w_f1, 6) FROM tot
)
SELECT * FROM class_rows UNION ALL SELECT * FROM summary_rows
"""


def q_cluster_quality_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies-Bouldin + Calinski-Harabasz over the embeddings table
    (operators/evaluation.py::cluster_variance_indices — the
    centroid-based index pair completing the clustering-quality family
    next to the silhouettes, sc_pipeline_evaluator.py:908-959)."""
    from vectordb_bioinsight_spark.operators.evaluation import (
        cluster_variance_indices,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return cluster_variance_indices(emb, "vec_id", "embedding", "label")


SQL_CLUSTER_QUALITY_INDICES = """
WITH cent AS (
  SELECT label, gs AS pos, avg(v) AS m
  FROM (SELECT label, unnest(embedding)::DOUBLE AS v,
               generate_subscripts(embedding, 1) AS gs
        FROM embeddings)
  GROUP BY 1, 2
), centarr AS (
  SELECT label, list(m ORDER BY pos) AS c FROM cent GROUP BY 1
), pts AS (
  SELECT p.label, round(sqrt(list_sum(list_transform(
           list_zip(p.embedding, ca.c),
           z -> (z[1]::DOUBLE - z[2]) * (z[1]::DOUBLE - z[2])
         ))), 6) AS d
  FROM embeddings p JOIN centarr ca ON ca.label = p.label
), per_label AS (
  SELECT label, count(*)::BIGINT AS n, avg(d) AS s, sum(d * d) AS w
  FROM pts GROUP BY 1
), grandarr AS (
  SELECT list(gm ORDER BY pos) AS g FROM (
    SELECT u.pos, sum(u.cv * pl.n) / sum(pl.n) AS gm
    FROM centarr ca
    JOIN per_label pl ON pl.label = ca.label,
    LATERAL (SELECT unnest(ca.c) AS cv, generate_subscripts(ca.c, 1) AS pos) u
    GROUP BY u.pos)
), grand2 AS (
  SELECT t.tot, t.k, ga.g
  FROM (SELECT sum(n)::BIGINT AS tot, count(*)::BIGINT AS k FROM per_label) t
  CROSS JOIN grandarr ga
), bterm AS (
  SELECT sum(pl.n::DOUBLE * pow(round(sqrt(list_sum(list_transform(
           list_zip(ca.c, g2.g), z -> (z[1] - z[2]) * (z[1] - z[2])
         ))), 6), 2)) AS B,
         sum(pl.w) AS W
  FROM per_label pl JOIN centarr ca ON ca.label = pl.label CROSS JOIN grand2 g2
), db AS (
  SELECT avg(rmax) AS DB FROM (
    SELECT a.label, max((pa.s + pb.s)
           / nullif(round(sqrt(list_sum(list_transform(
               list_zip(a.c, b.c), z -> (z[1] - z[2]) * (z[1] - z[2])
             ))), 6), 0.0)) AS rmax
    FROM centarr a JOIN centarr b ON a.label <> b.label
    JOIN per_label pa ON pa.label = a.label
    JOIN per_label pb ON pb.label = b.label
    GROUP BY 1
  )
)
SELECT g2.tot AS n_points, g2.k AS n_clusters,
       round(CASE WHEN g2.k > 1 AND bt.W > 0
                  THEN (bt.B / (g2.k - 1)) / (bt.W / (g2.tot - g2.k)) END, 4)
         AS calinski_harabasz,
       round(CASE WHEN g2.k > 1 THEN db.DB END, 4) AS davies_bouldin
FROM grand2 g2 CROSS JOIN bterm bt CROSS JOIN db
"""
