"""Distribution-drift monitoring — PSI and Kolmogorov–Smirnov between a
reference and a current sample of a numeric column.

Reference parity: the reference re-crawls its sources on a schedule
(backend/app/api/routes/crawler.py refresh endpoints) but has no check
that the refreshed corpus still *looks like* the old one; drift
monitoring is the standard production guard for exactly that hand-off
(and for any training-data pipeline: a feature whose distribution moves
between snapshots silently degrades every model trained on it).

Engine shape: both metrics reduce to tiny grouped aggregations —
PSI bins come from exact reference deciles (Spark ``percentile`` ==
DuckDB ``quantile_cont``, the type-7 convention already proven
hash-safe by the percentile-summary operators), the KS statistic from
tie-grouped cumulative counts. No sampling, fully deterministic,
hash-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: floor for bin shares in the PSI log ratio — the standard guard for
#: empty bins (PSI is +inf on a truly-empty bin; 1e-6 caps a bin's
#: contribution at ~13.8·|other share| instead, keeping totals finite).
PSI_EPS = 1e-6


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_bins: int = 10,
    round_cuts: int = 4,
) -> DataFrame:
    """Population Stability Index of ``cur`` vs ``ref`` over equal-frequency
    reference bins.

    Cut points are rounded to ``round_cuts`` decimals before binning: an
    interpolated quantile can differ between engines in the last ulp, and
    a data value sitting exactly on an unrounded cut would then flip bins
    engine-to-engine. Rounding pins every cut to an exact decimal both
    engines represent identically, so ``cut <= value`` is deterministic
    (pick round_cuts > the data's decimal precision).

    Plan: ONE tiny agg on the reference computes the n_bins−1 interior
    decile cut points (exact ``percentile``); both sides then bin by
    counting cuts ≤ value against the broadcast 1-row cut array (a
    scan-local array op — no join against a bin table, no second pass on
    either side) and aggregate to n_bins counts each. The bin spine is
    exploded from the cuts row itself, so bins that one side leaves empty
    still appear with share ε. Everything after the two fact-table aggs
    operates on ≤ n_bins rows.

    NULL values never reach the bins (an all-NULL batch would otherwise
    read as low-end mass drift — ADVICE r05): each side's single
    aggregation routes NULLs to a NULL bin group, reported as the
    constant ``ref_null``/``cur_null`` columns — missing data surfaces
    as its own signal, and the PSI fractions are over non-null mass only.

    Output: (bin, lo, hi, ref_n, cur_n, ref_frac, cur_frac, psi_term,
    psi_total, ref_null, cur_null) ordered by bin — lo/hi are the bin's
    cut bounds (NULL at the open ends), psi_total and the null counts
    repeat on every row. Rounded 6 dp.
    """
    v = F.col(value_col).cast("double")
    fracs = [i / n_bins for i in range(1, n_bins)]
    cuts_row = ref.agg(
        F.transform(
            F.percentile(v, F.array(*[F.lit(f) for f in fracs])),
            lambda c: F.round(c, round_cuts),
        ).alias("_cuts")
    )

    def _binned(df: DataFrame, out: str) -> DataFrame:
        # NULL v -> NULL bin group: null counting rides the same single
        # pass instead of polluting bin 0 or needing a second scan
        b = F.when(
            v.isNotNull(), F.size(F.filter(F.col("_cuts"), lambda c: c <= v))
        ).alias("bin")
        return (
            df.crossJoin(F.broadcast(cuts_row))
            .groupBy(b)
            .agg(F.count("*").cast("long").alias(out))
        )

    def _null_row(binned: DataFrame, out: str) -> DataFrame:
        return binned.agg(
            F.coalesce(
                F.sum(F.when(F.col("bin").isNull(), F.col(out))), F.lit(0)
            ).cast("long").alias(f"{out[:3]}_null")
        )

    spine = cuts_row.select(
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"),
        F.col("_cuts"),
    ).select(
        "bin",
        # element_at is 1-based; the untaken when-branch is never evaluated,
        # so the open ends never index out of bounds under ANSI mode
        F.when(F.col("bin") > 0, F.element_at(F.col("_cuts"), F.col("bin"))).alias("lo"),
        F.when(
            F.col("bin") < n_bins - 1, F.element_at(F.col("_cuts"), F.col("bin") + 1)
        ).alias("hi"),
    )
    ref_b = _binned(ref, "ref_n")
    cur_b = _binned(cur, "cur_n")
    joined = (
        spine.join(ref_b.filter(F.col("bin").isNotNull()), "bin", "left")
        .join(cur_b.filter(F.col("bin").isNotNull()), "bin", "left")
        .select(
            "bin",
            "lo",
            "hi",
            F.coalesce("ref_n", F.lit(0)).alias("ref_n"),
            F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
        )
    )
    totals = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    rf = F.greatest(
        F.col("ref_n") / F.nullif(F.sum("ref_n").over(totals), F.lit(0)),
        F.lit(PSI_EPS),
    )
    cf = F.greatest(
        F.col("cur_n") / F.nullif(F.sum("cur_n").over(totals), F.lit(0)),
        F.lit(PSI_EPS),
    )
    term = (cf - rf) * F.log(cf / rf)
    with_term = joined.select(
        "bin",
        F.round(F.col("lo"), 6).alias("lo"),
        F.round(F.col("hi"), 6).alias("hi"),
        "ref_n",
        "cur_n",
        F.round(rf, 6).alias("ref_frac"),
        F.round(cf, 6).alias("cur_frac"),
        F.round(term, 6).alias("psi_term"),
        F.round(F.sum(term).over(totals), 6).alias("psi_total"),
    ).crossJoin(F.broadcast(_null_row(ref_b, "ref_n"))).crossJoin(
        F.broadcast(_null_row(cur_b, "cur_n"))
    )
    return with_term.orderBy("bin")


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic: D = max |ECDF_a − ECDF_b|
    over the pooled sample, with the value attaining it.

    ``group_col`` must be boolean-like (1 = sample A). Tie-grouped first
    (groupBy value → per-group counts), then one cumulative window over
    distinct values — window input bounded by value cardinality, the same
    discipline as ``evaluation.roc_auc``. The max is taken by a 1-row
    orderBy/limit on the ≤|distinct| frame (TakeOrderedAndProject, no
    global sort materialization); ties on D break to the smallest value.

    Output one row: (n_a, n_b, d_stat, d_at_value), rounded 6 dp.
    """
    v = F.col(value_col).cast("double")
    g = F.col(group_col).cast("int")
    tied = df.groupBy(v.alias("_v")).agg(
        F.sum(g).cast("double").alias("_na"),
        F.sum(1 - g).cast("double").alias("_nb"),
    )
    w = Window.orderBy(F.col("_v").asc()).rowsBetween(Window.unboundedPreceding, 0)
    totals = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    tot_a = F.sum("_na").over(totals)
    tot_b = F.sum("_nb").over(totals)
    diff = F.abs(
        F.sum("_na").over(w) / F.nullif(tot_a, F.lit(0.0))
        - F.sum("_nb").over(w) / F.nullif(tot_b, F.lit(0.0))
    )
    scored = tied.select(
        tot_a.cast("long").alias("n_a"),
        tot_b.cast("long").alias("n_b"),
        F.round(diff, 6).alias("d_stat"),
        F.col("_v").alias("d_at_value"),
    )
    return scored.orderBy(F.desc("d_stat"), F.asc("d_at_value")).limit(1)
