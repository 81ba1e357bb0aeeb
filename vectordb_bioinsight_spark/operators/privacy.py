"""Differentially-private release aggregates — Laplace-mechanism counts
and clipped sums with PRF-derived noise.

A training-data pipeline that publishes corpus statistics (per-source doc
counts, token totals, the data-card numbers in pipelines/web_corpus.py)
leaks membership at the margins; the Laplace mechanism is the standard
fix (Dwork et al. 2006). The reference publishes report statistics
verbatim (rnaseq_pipeline/reports render counts straight from the data);
these operators are the release-hardened form of that capability.

Noise derivation — the engineering trade this module makes explicit:
noise is drawn from a PRF over (secret seed, group key) via the portable
md5 hash, then inverse-CDF mapped to Laplace(b). With the seed secret
this is the standard practical instantiation of DP noise (a PRF draw is
indistinguishable from random to anyone without the seed); with the seed
KNOWN the release is merely derandomized-reproducible — which is exactly
what the cross-engine oracle needs. Treat the seed like a key: the
catalog entry uses a fixed seed because its job is verification, a real
release must not publish its seed.

Both operators are one map-side-combinable groupBy plus a scan-local
noise projection — no extra shuffle over the exact aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.functions.hashing import salted_hash64

#: hash range — portable_hash64 yields [0, 2^60)
_H_RANGE = float(1 << 60)


def _laplace_noise(key: Column, b: float, seed: int) -> Column:
    """Laplace(0, b) noise as a pure function of (seed, key): md5-uniform
    in (0, 1), inverse CDF  -b * sign(u - 1/2) * ln(1 - 2|u - 1/2|).
    The +0.5 offset keeps u strictly inside (0, 1) so the log never sees
    0 or negative arguments (ANSI-safe)."""
    u = (salted_hash64(key, seed) + F.lit(0.5)) / F.lit(_H_RANGE)
    c = u - F.lit(0.5)
    return -F.lit(float(b)) * F.signum(c) * F.log(1.0 - 2.0 * F.abs(c))


def dp_counts(
    df: DataFrame,
    key_cols: "list[str]",
    epsilon: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """ε-DP group counts: exact count + Laplace(1/ε) noise (unit
    sensitivity — one row moves one count by one), floored at 0 and
    rounded to an integer for release. Output: (key..., n_dp).

    The group-key string itself seeds the PRF, so the same release run
    twice (or on two engines) is identical — and two different seeds
    give independent noise, which the distribution test exercises.
    """
    if epsilon <= 0:
        raise ValueError("epsilon must be > 0")
    per = df.groupBy(*key_cols).agg(F.count("*").cast("double").alias("_n"))
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    noisy = F.col("_n") + _laplace_noise(key, 1.0 / epsilon, seed)
    return per.select(
        *key_cols,
        F.greatest(F.round(noisy, 0), F.lit(0.0)).cast("long").alias("n_dp"),
    )


def dp_sum(
    df: DataFrame,
    key_cols: "list[str]",
    value_col: str,
    clip: float,
    epsilon: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """ε-DP group sums with contribution clipping: each row's value
    clamps into [0, clip] FIRST (that bound IS the sensitivity — without
    it one outlier row moves the sum arbitrarily and no finite noise is
    private), then Laplace(clip/ε) noise is added to the exact clipped
    sum. Output: (key..., sum_dp rounded 4 dp, floored at 0).
    """
    if epsilon <= 0:
        raise ValueError("epsilon must be > 0")
    if clip <= 0:
        raise ValueError("clip must be > 0")
    v = F.least(
        F.greatest(F.col(value_col).cast("double"), F.lit(0.0)), F.lit(float(clip))
    )
    per = df.groupBy(*key_cols).agg(F.sum(v).alias("_s"))
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    noisy = F.col("_s") + _laplace_noise(key, float(clip) / epsilon, seed)
    return per.select(
        *key_cols,
        F.round(F.greatest(noisy, F.lit(0.0)), 4).alias("sum_dp"),
    )
