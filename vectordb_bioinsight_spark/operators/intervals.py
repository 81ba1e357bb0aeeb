"""Interval algebra — gaps-and-islands merging and coverage statistics
over per-key [start, end] ranges, plus Pareto-frontier (skyline)
extraction.

Reference parity: the reference reasons about date ranges ad hoc
(backend/app/utils/trend_analyzer.py:144-282 year-span splits;
bio-daily-briefing windows its feeds by crawl date) — interval
merging is the general operator underneath: collapse overlapping
ranges into islands, then coverage/gap arithmetic is a per-island
aggregation. The skyline operator generalizes the reference's
"best paper by multiple criteria" reranking
(backend/app/core/core_paper_reranker.py:193-453 blends scores into
one scalar) to the non-dominated set — rows no other row beats on
every criterion at once.

Both are window + aggregation compositions over key-bounded frames —
no joins, no self-products — and fully hash-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    key_cols: "list[str]",
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Collapse overlapping/touching [start, end] intervals per key into
    islands (classic gaps-and-islands).

    Plan: one key-partitioned window ordered by (start, end) computes the
    running max of prior ends; a new island starts where start > that max
    (strictly — touching intervals share an endpoint and merge). The
    island id is the running sum of start flags over the same window
    order (NO second shuffle — both windows share one partitioning), and
    the island rollup is a per-(key, island) aggregation. Window input is
    bounded by intervals per key.

    Output: (key..., island, start, end, n_intervals) — island is
    1-based in start order.
    """
    s, e = F.col(start_col), F.col(end_col)
    w = Window.partitionBy(*key_cols).orderBy(s.asc(), e.asc())
    prior_max_end = F.max(e).over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(
        prior_max_end.isNull() | (s > prior_max_end), F.lit(1)
    ).otherwise(F.lit(0))
    islands = df.withColumn(
        "island",
        F.sum(new_island).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
    )
    return (
        islands.groupBy(*key_cols, "island")
        .agg(
            F.min(s).alias("start"),
            F.max(e).alias("end"),
            F.count("*").cast("long").alias("n_intervals"),
        )
        .orderBy(*key_cols, "island")
    )


def coverage_stats(
    df: DataFrame,
    key_cols: "list[str]",
    start_col: str,
    end_col: str,
    unit_days: bool = True,
) -> DataFrame:
    """Per-key coverage summary over the merged islands: island count,
    covered length, spanned length, gap length, coverage ratio.

    Composes ``merge_intervals`` (so the cost is the same single window +
    agg) with one more per-key aggregation over the ≤islands-per-key
    frame. With ``unit_days`` the columns are DATE-typed and lengths are
    inclusive day counts (datediff + 1); otherwise plain numeric deltas.

    Output: (key..., n_islands, covered, span, gaps, coverage) with
    coverage = covered/span rounded 6 dp.
    """
    islands = merge_intervals(df, key_cols, start_col, end_col)
    if unit_days:
        length = (F.datediff(F.col("end"), F.col("start")) + F.lit(1)).cast("long")
    else:
        length = (F.col("end") - F.col("start")).cast("double")
    per_key = islands.groupBy(*key_cols).agg(
        F.count("*").cast("long").alias("n_islands"),
        F.sum(length).alias("covered"),
        F.min("start").alias("_lo"),
        F.max("end").alias("_hi"),
    )
    if unit_days:
        span = (F.datediff(F.col("_hi"), F.col("_lo")) + F.lit(1)).cast("long")
    else:
        span = (F.col("_hi") - F.col("_lo")).cast("double")
    return per_key.select(
        *key_cols,
        "n_islands",
        "covered",
        span.alias("span"),
        (span - F.col("covered")).alias("gaps"),
        F.round(F.col("covered") / F.nullif(span, F.lit(0)), 6).alias("coverage"),
    )


def pareto_frontier(
    df: DataFrame,
    minimize_col: str,
    maximize_col: str,
) -> DataFrame:
    """2-D skyline: the distinct (minimize, maximize) points no other
    point dominates (other.min ≤ mine AND other.max ≥ mine, strictly
    better on at least one).

    Plan: exact duplicate points collapse first (groupBy → n), then ONE
    ordered window over the distinct points — sorted by (minimize asc,
    maximize desc), a point is on the frontier iff its maximize value
    strictly exceeds the running max over all strictly-preceding rows
    (every preceding row has minimize ≤ mine; after dedup, an equal or
    higher maximize there is a dominator). No self-join — the O(n²)
    dominance test collapses to a sort, the textbook skyline sweep.
    Window input is bounded by distinct point count. The window is
    global because dominance is a global relation; shard by a partition
    key first if the distinct-point set is unbounded, then re-sweep the
    per-shard frontiers (frontier-of-frontiers is exact).

    Output: (minimize, maximize, n_rows) frontier points in minimize
    order.
    """
    mn, mx = F.col(minimize_col), F.col(maximize_col)
    pts = df.groupBy(mn.alias("mn"), mx.alias("mx")).agg(
        F.count("*").cast("long").alias("n_rows")
    )
    w = Window.orderBy(F.col("mn").asc(), F.col("mx").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    prior_best = F.max("mx").over(w)
    return (
        pts.withColumn("_pb", prior_best)
        .filter(F.col("_pb").isNull() | (F.col("mx") > F.col("_pb")))
        .select(
            F.col("mn").alias(minimize_col),
            F.col("mx").alias(maximize_col),
            "n_rows",
        )
        .orderBy(minimize_col)
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: "list[str]",
    bin_size: int,
    suffixes: "tuple[str, str]" = ("_l", "_r"),
) -> DataFrame:
    """Bin-blocked interval-overlap join — the genomic range-join shape
    (bedtools intersect / ADAM's region join; the variant→gene annotation
    step downstream of the VCF/MAF scans in sources/readers.py — the
    reference matches variant positions against hotspot regions one row
    at a time, rnaseq_pipeline/agents/agent_variant.py:242-262; the
    interval join is that capability over two distributed tables).

    Both inputs carry ``key_cols`` (the chromosome analog) plus numeric
    ``start``/``end`` (inclusive). A naive overlap join is an inequality
    predicate — a nested-loop/cartesian per key on any SQL engine. This
    operator turns it into an EQUI-join Catalyst can shuffle-hash: each
    interval replicates to the fixed-width bins it touches
    (floor(start/bin) .. floor(end/bin), one F.sequence + explode), the
    join key is (key..., bin), and each overlapping pair is kept in
    EXACTLY ONE bin — the bin of max(l.start, r.start), which both
    intervals provably cover — so no distinct pass is needed.

    ``bin_size`` tunes replication: ~the typical interval length gives
    ~2 bins per interval. A pathologically long interval replicates to
    len/bin_size bins — cap or split outliers upstream if the length
    distribution is heavy-tailed (the skew note in SCALING.md).

    Output: key cols + (start_l, end_l, start_r, end_r, rest of both
    sides suffixed) + overlap = inclusive overlap length.
    """
    sl, sr = suffixes

    def binned(df: DataFrame, suffix: str) -> DataFrame:
        renamed = df.select(
            *key_cols,
            *[
                F.col(c).alias(f"{c}{suffix}")
                for c in df.columns
                if c not in key_cols
            ],
        )
        s, e = F.col(f"start{suffix}"), F.col(f"end{suffix}")
        return renamed.withColumn(
            "bin",
            F.explode(
                F.sequence(
                    F.floor(s / bin_size).cast("long"),
                    F.floor(e / bin_size).cast("long"),
                )
            ),
        )

    lb, rb = binned(left, sl), binned(right, sr)
    l_s, l_e = F.col(f"start{sl}"), F.col(f"end{sl}")
    r_s, r_e = F.col(f"start{sr}"), F.col(f"end{sr}")
    owner_bin = F.floor(F.greatest(l_s, r_s) / bin_size).cast("long")
    return (
        lb.join(rb, [*key_cols, "bin"])
        .filter((l_s <= r_e) & (r_s <= l_e) & (F.col("bin") == owner_bin))
        .drop("bin")
        .withColumn(
            "overlap",
            (F.least(l_e, r_e) - F.greatest(l_s, r_s) + F.lit(1)).cast("long"),
        )
    )
