"""Closed-form statistics kernels as column expressions.

SURVEY.md §4.3(5): the main genuinely-new code in the engine. Everything here
is pure column arithmetic over pre-aggregated moments (mean/var/count per
group) so the heavy lifting is a map-side-combinable aggregation — one shuffle
per statistic at any scale, no Python.

Reference semantics:
* Welch/pooled t-test per gene: rnaseq_pipeline/agents/agent1_deg.py:390-414.
* log2 fold change log2((m1+1)/(m2+1)): agent1_deg.py:347-390.
* correlation t-statistic t = r*sqrt((n-2)/(1-r^2)):
  rnaseq_pipeline/ml/network_enhancer.py:100-158.

P-values need the incomplete beta / normal CDF: normal-approximation survival
functions are provided as expressions (erf is a Spark builtin); exact scipy
parity lives behind a pandas UDF in operators/stats.py for the DEG pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def log2_fold_change(mean_a: Column, mean_b: Column, pseudocount: float = 1.0) -> Column:
    """log2((mean_a + pc) / (mean_b + pc)) — agent1_deg.py:384."""
    return F.log2((mean_a + F.lit(pseudocount)) / (mean_b + F.lit(pseudocount)))


def welch_t(mean_a: Column, var_a: Column, n_a: Column, mean_b: Column, var_b: Column, n_b: Column) -> Column:
    """Welch's t statistic from per-group sample moments."""
    se = F.sqrt(var_a / n_a + var_b / n_b)
    return (mean_a - mean_b) / se


def welch_df(var_a: Column, n_a: Column, var_b: Column, n_b: Column) -> Column:
    """Welch-Satterthwaite degrees of freedom."""
    va, vb = var_a / n_a, var_b / n_b
    return (va + vb) ** 2 / (va ** 2 / (n_a - 1) + vb ** 2 / (n_b - 1))


def corr_t_stat(r: Column, n: Column) -> Column:
    """t = r * sqrt((n-2)/(1-r^2)) — network_enhancer.py:139-147."""
    return r * F.sqrt((n - 2) / (1 - r * r))


def normal_sf(z: Column) -> Column:
    """Normal survival function 1 - Φ(z), JVM-side.

    Abramowitz & Stegun 26.2.17 polynomial approximation (|err| < 7.5e-8) —
    Spark SQL has no erf builtin. Used as the large-df approximation for
    t-test p-values; exact scipy.stats.t.sf parity is available via the
    pandas-UDF path in operators/stats.py. Valid for z >= 0 (callers pass |z|).
    """
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * z)
    poly = t * (
        F.lit(0.319381530)
        + t * (F.lit(-0.356563782) + t * (F.lit(1.781477937) + t * (F.lit(-1.821255978) + t * F.lit(1.330274429))))
    )
    pdf = F.exp(-z * z / 2.0) / F.sqrt(F.lit(2.0 * 3.141592653589793))
    return pdf * poly
