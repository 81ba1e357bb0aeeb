"""Distributed statistics operators — SURVEY.md A3/A4, §4.3(5).

Two tiers:
* **Closed-form column expressions** (this module's default): moments are one
  map-side-combinable aggregation; t statistics, fold changes, and BH-FDR are
  window/expression arithmetic. Scales to any number of groups with exactly
  one shuffle per statistic.
* **pandas-UDF tier** for exact p-values (scipy's t survival function has no
  closed form); Arrow-batched, applied to the already-aggregated moments table
  (rows = number of genes/groups, i.e. tiny relative to the fact table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from vectordb_bioinsight_spark.functions.stats import welch_df, welch_t


def group_moments(
    df: DataFrame,
    key_cols: list[str],
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Per-key two-group moments in ONE aggregation (no pivot shuffle):
    (key..., mean_a, var_a, n_a, mean_b, var_b, n_b)."""
    is_a = F.col(group_col) == group_a
    is_b = F.col(group_col) == group_b
    v = F.col(value_col).cast("double")
    return df.groupBy(*key_cols).agg(
        F.avg(F.when(is_a, v)).alias("mean_a"),
        F.var_samp(F.when(is_a, v)).alias("var_a"),
        F.count(F.when(is_a, v)).cast("double").alias("n_a"),
        F.avg(F.when(is_b, v)).alias("mean_b"),
        F.var_samp(F.when(is_b, v)).alias("var_b"),
        F.count(F.when(is_b, v)).cast("double").alias("n_b"),
    )


def welch_ttest(
    moments: DataFrame,
    exact_pvalues: bool = True,
) -> DataFrame:
    """Welch t-test columns (t_stat, df, pvalue) appended to a moments table.

    ``exact_pvalues=True`` uses an Arrow-batched pandas UDF computing the
    exact Student-t two-sided p (regularized incomplete beta, pure numpy —
    functions/special.py) on the aggregated table; False uses the JVM-side
    normal approximation. Reference A3: per-gene scipy.stats.ttest_ind
    (agent1_deg.py:390-414), NaN -> 1.0.
    """
    out = moments.withColumn(
        "t_stat", welch_t(F.col("mean_a"), F.col("var_a"), F.col("n_a"), F.col("mean_b"), F.col("var_b"), F.col("n_b"))
    ).withColumn("df", welch_df(F.col("var_a"), F.col("n_a"), F.col("var_b"), F.col("n_b")))
    if exact_pvalues:
        from vectordb_bioinsight_spark.session import ensure_package_on_executors

        ensure_package_on_executors(moments.sparkSession)

        @F.pandas_udf(T.DoubleType())
        def _t_sf2(t, df):  # type: ignore[no-untyped-def]
            import pandas as pd

            from vectordb_bioinsight_spark.functions.special import t_pvalue_two_sided

            return pd.Series(t_pvalue_two_sided(t.to_numpy(), df.to_numpy()))

        out = out.withColumn("pvalue", _t_sf2(F.col("t_stat"), F.col("df")))
    else:
        from vectordb_bioinsight_spark.functions.stats import normal_sf

        out = out.withColumn("pvalue", F.coalesce(2.0 * normal_sf(F.abs(F.col("t_stat"))), F.lit(1.0)))
    return out.withColumn("pvalue", F.coalesce(F.col("pvalue"), F.lit(1.0)))


def bh_adjust(df: DataFrame, pvalue_col: str = "pvalue", out_col: str = "padj") -> DataFrame:
    """A4: Benjamini-Hochberg FDR — padj = reverse-cummin(p * n / rank), <=1.

    Pure window arithmetic (statsmodels-compatible, incl. ties): rank by
    p ascending; reverse running min over the descending-rank frame. The
    unpartitioned windows are acceptable because BH runs on the aggregated
    per-gene table (1e4-1e6 rows), not the fact table; for larger inputs
    partition by contrast/batch key.
    Reference: multipletests(method='fdr_bh') (agent1_deg.py:417-420).
    """
    n_df = df.agg(F.count("*").cast("double").alias("_n"))
    w_rank = Window.orderBy(F.col(pvalue_col).asc())
    # Reverse pass ordered by (p desc, rank desc): within a tie group the
    # max-rank row (smallest raw) comes first, so every tied row sees it —
    # exact BH tie semantics regardless of row_number's arbitrary tie order.
    w_rev = Window.orderBy(F.col(pvalue_col).desc(), F.col("_rank").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        df.crossJoin(F.broadcast(n_df))
        .withColumn("_rank", F.row_number().over(w_rank))
        .withColumn("_raw", F.col(pvalue_col) * F.col("_n") / F.col("_rank"))
        .withColumn(out_col, F.least(F.min("_raw").over(w_rev), F.lit(1.0)))
        .drop("_rank", "_raw", "_n")
    )


def log2fc_by_group(
    df: DataFrame,
    key_cols: list[str],
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    pseudocount: float = 1.0,
) -> DataFrame:
    """A1: per-key group means + log2((mean_a+pc)/(mean_b+pc))
    (agent1_deg.py:347-390). Output (key..., mean_a, mean_b, log2fc)."""
    from vectordb_bioinsight_spark.functions.stats import log2_fold_change

    v = F.col(value_col).cast("double")
    return (
        df.groupBy(*key_cols)
        .agg(
            F.avg(F.when(F.col(group_col) == group_a, v)).alias("mean_a"),
            F.avg(F.when(F.col(group_col) == group_b, v)).alias("mean_b"),
        )
        .withColumn("log2fc", log2_fold_change(F.col("mean_a"), F.col("mean_b"), pseudocount))
    )


def cpm_normalize(
    df: DataFrame,
    sample_col: str,
    value_col: str,
    out_col: str = "cpm",
) -> DataFrame:
    """A2: counts-per-million — value / per-sample-total * 1e6
    (agent1_deg.py:436-438). Group-agg + broadcast join back (not a window:
    the agg output is one row per sample, tiny, and the fact table is joined
    shuffle-free when sample count is broadcastable)."""
    totals = df.groupBy(sample_col).agg(F.sum(F.col(value_col).cast("double")).alias("_total"))
    return (
        df.join(F.broadcast(totals), sample_col)
        .withColumn(out_col, F.col(value_col).cast("double") / F.col("_total") * 1e6)
        .drop("_total")
    )
