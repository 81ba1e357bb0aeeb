"""Skew-mitigation operators — SURVEY §4.2's 'hub genes / hot terms' case.

AQE's skew-join splitting handles shuffle-join skew automatically, but two
shapes still need explicit salting at 100 TB:

* **aggregation skew** — one hot key (a hub gene's edges, a stopword's
  postings) lands on one reducer. ``salted_aggregate`` does the classic
  two-phase: partial agg on (key, salt) — map-side combine already shrinks
  this — then final agg on key. Works for any algebraic aggregate
  (sum/count/min/max; avg via sum+count).
* **broadcast-defeating join skew** — when the small side is too big to
  broadcast and one left key dominates, ``salted_join`` replicates each
  right row ``n_salts`` times and scatters left rows across salts, turning
  one hot partition into ``n_salts`` even ones. Deterministic salt =
  pmod(xxhash64(whole row), n_salts) so results are reproducible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: (key, salt) partial -> key final.

    ``aggs``: out_col -> (fn, in_col) with fn in {sum, count, min, max}.
    Result equals the direct groupBy (tested), but the widest shuffle carries
    n_salts× more, n_salts× smaller partitions — no single-reducer hot key.
    """
    allowed = {"sum", "count", "min", "max"}
    for fn, _ in aggs.values():
        if fn not in allowed:
            raise ValueError(f"{fn!r} not decomposable; use sum/count/min/max")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).alias("_salt")
    partial_aggs = []
    final_aggs = []
    for out, (fn, col) in aggs.items():
        p = f"_p_{out}"
        if fn == "count":
            partial_aggs.append(F.count(col).alias(p))
            final_aggs.append(F.sum(p).cast("long").alias(out))
        elif fn == "sum":
            partial_aggs.append(F.sum(col).alias(p))
            final_aggs.append(F.sum(p).alias(out))
        elif fn == "min":
            partial_aggs.append(F.min(col).alias(p))
            final_aggs.append(F.min(p).alias(out))
        else:
            partial_aggs.append(F.max(col).alias(p))
            final_aggs.append(F.max(p).alias(out))
    partial = df.select(*df.columns, salt).groupBy(*key_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*key_cols).agg(*final_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join with the right side replicated across ``n_salts``
    salts and left rows scattered deterministically. Use when the right side
    exceeds the broadcast threshold AND left keys are skewed (else plain
    join + AQE is better — replication is not free).
    """
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    r = right.select("*", salts)
    l_salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    lt = left.withColumn("_salt", l_salt.cast("int"))
    return lt.join(r, [on, "_salt"]).drop("_salt")


def key_skew_profile(df: DataFrame, key_cols: Sequence[str], top_n: int = 20) -> DataFrame:
    """Skew diagnosis — the measurement step that decides whether the
    mitigations above are needed: the ``top_n`` heaviest key groups with
    their share of all rows and the ratio to a perfectly uniform key
    (share * n_distinct_keys; >> 1 means a hot key).

    Plan: one map-side-combinable groupBy on the keys, a broadcast of the
    two scalar totals (row count, distinct-key count, both derived from
    the SAME aggregated table — no second corpus scan), and a top-n heap.

    Output: (key..., n, share, skew_ratio, rank), rounded 6 dp.
    """
    keys = list(key_cols)
    counts = df.groupBy(*keys).agg(F.count("*").cast("long").alias("n"))
    totals = counts.agg(
        F.sum("n").cast("double").alias("_tot"),
        F.count("*").cast("double").alias("_keys"),
    )
    scored = counts.crossJoin(F.broadcast(totals)).select(
        *keys,
        "n",
        F.round(F.col("n") / F.col("_tot"), 6).alias("share"),
        F.round(F.col("n") * F.col("_keys") / F.col("_tot"), 6).alias("skew_ratio"),
    )
    # top-n FIRST via orderBy+limit -> TakeOrderedAndProject (per-partition
    # heaps over the aggregated table); the rank window then runs on the
    # top_n-row result, never on the full key space
    w_order = [F.desc("n")] + [F.asc(k) for k in keys]
    from pyspark.sql import Window

    top = scored.orderBy(*w_order).limit(top_n)
    return top.withColumn("rank", F.row_number().over(Window.orderBy(*w_order)))
