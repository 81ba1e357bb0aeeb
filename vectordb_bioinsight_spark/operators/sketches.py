"""Count-min sketch — bounded-state frequency estimation (Cormode &
Muthukrishnan 2005), the streaming/corpus-scale companion of the exact
term-count aggregations in operators/trends.py.

Why it earns a place in a 100 TB engine: an exact term-frequency table is
VOCABULARY-sized (unbounded, skew-prone); the CMS table is ``depth*width``
rows BY CONSTRUCTION — a dimension you can broadcast, persist, merge
across corpus shards (sketches are additive), and probe for any watchlist
without rescanning the corpus. The reference keeps keyword counts in
driver memory (trend_analyzer.py's Counter); this is the distributed,
bounded-state upgrade.

Determinism: buckets come from the engine's portable salted 60-bit hash
(functions/hashing.py), so the sketch and every estimate are exactly
reproducible in DuckDB/Python — estimates carry the classic one-sided
guarantee (est >= exact, test-pinned) with error eps ~ e/width at
confidence 1 - e^-depth.

Physical plan: build = one scan-local projection of ``depth`` bucket ids
per row + ONE map-side-combinable groupBy on a bounded key space (never a
per-term shuffle); estimate = broadcast-join the watchlist's probe buckets
against the sketch and take the per-term min.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.functions.hashing import salted_hash64

MAX_SKETCH_CELLS = 1 << 22  # broadcast-safety guard (~4M cells = MBs)


def _buckets(term: F.Column, width: int, depth: int) -> F.Column:
    return F.array(*[F.pmod(salted_hash64(term, j), F.lit(width)) for j in range(depth)])


def cms_build(
    items: DataFrame, term_col: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Build the sketch table (j, bucket, cnt) from an item stream — one
    row per (row-of-input x depth), aggregated onto the bounded
    ``depth*width`` key space. Sketches over corpus shards merge by
    summing cnt on (j, bucket)."""
    if width * depth > MAX_SKETCH_CELLS:
        raise ValueError(f"width*depth must be <= {MAX_SKETCH_CELLS}")
    return (
        items.select(
            F.posexplode(_buckets(F.col(term_col), width, depth)).alias("j", "bucket")
        )
        .groupBy("j", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    terms: DataFrame,
    term_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Estimate each watchlist term's frequency: min over the term's
    ``depth`` probe buckets. The sketch is dimension-sized -> broadcast;
    probe buckets never observed in the build count as 0.

    Output: (term, cms_est)."""
    probes = terms.select(
        F.col(term_col).alias("term"),
        F.posexplode(_buckets(F.col(term_col), width, depth)).alias("j", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# Mergeable moment shards — incremental statistics maintenance
# ---------------------------------------------------------------------------


def moment_shards(
    df: "DataFrame",
    shard_cols: "list[str]",
    value_col: str,
) -> "DataFrame":
    """Per-shard first/second moments in the MERGEABLE representation
    (n, mean, m2) — the numeric-column counterpart of the xor shard
    manifest (sources/writers.py): maintain one row per shard as batches
    land, fold with :func:`merge_moment_shards`, and the corpus is never
    rescanned for accounting. m2 = sum((x - mean)^2); var = m2/(n-1).

    One map-side-combinable groupBy; output is shard-cardinality."""
    return df.groupBy(*shard_cols).agg(
        F.count(value_col).cast("long").alias("n"),
        F.avg(value_col).alias("mean"),
        # m2 from var_samp (n-1 factor); a 1-row shard has NULL var -> m2 0
        F.coalesce(
            F.var_samp(value_col) * (F.count(value_col) - 1), F.lit(0.0)
        ).alias("m2"),
    )


def merge_moment_shards(
    shards: "DataFrame",
    group_cols: "list[str]",
) -> "DataFrame":
    """Combine (n, mean, m2) shard rows into the same representation at a
    coarser grain — exact, associative, ONE aggregation (no pairwise
    Chan recursion needed; the pooled closed form is):

        N    = sum(n)
        mean = sum(n * mean) / N
        m2   = sum(m2) + sum(n * mean_s^2) - N * mean^2

    so merge(profile(day shards)) == profile(whole table) exactly up to
    float associativity (property-tested). This is what lets a streaming
    ingest or a partitioned backfill keep column statistics current in
    O(shards) per batch."""
    agg = shards.groupBy(*group_cols).agg(
        F.sum("n").cast("long").alias("n"),
        (F.sum(F.col("n") * F.col("mean")) / F.sum("n")).alias("mean"),
        (
            F.sum("m2")
            + F.sum(F.col("n") * F.col("mean") * F.col("mean"))
        ).alias("_raw2"),
    )
    return agg.select(
        *group_cols,
        "n",
        "mean",
        (F.col("_raw2") - F.col("n") * F.col("mean") * F.col("mean")).alias("m2"),
    )


def moments_to_stats(profile: "DataFrame") -> "DataFrame":
    """(n, mean, m2) -> presentation stats: (n, mean, var, std) rounded
    6 dp; var NULL for n < 2 (matching var_samp)."""
    var = F.when(F.col("n") > 1, F.col("m2") / (F.col("n") - 1))
    keep = [c for c in profile.columns if c not in ("mean", "m2")]
    return profile.select(
        *keep,
        F.round("mean", 6).alias("mean"),
        F.round(var, 6).alias("var"),
        F.round(F.sqrt(var), 6).alias("std"),
    )


def hll_shards(
    df: "DataFrame",
    shard_cols: "list[str]",
    key_col: str,
    lg_k: int = 14,
) -> "DataFrame":
    """Per-shard DISTINCT-COUNT state as mergeable HLL sketches — the
    cardinality sibling of :func:`moment_shards`: one binary sketch row
    per shard (2^lg_k bytes), foldable to any coarser grain without
    rescanning the corpus. Union-of-sketches equals sketch-of-union by
    construction (register-wise max), so merge == rebuild is EXACT in
    sketch space, not approximately — only the final estimate carries
    the HLL error envelope."""
    return df.groupBy(*shard_cols).agg(
        F.hll_sketch_agg(F.col(key_col).cast("string"), F.lit(lg_k)).alias("hll"),
        F.count(key_col).cast("long").alias("n_rows"),
    )


def merge_hll_shards(
    shards: "DataFrame",
    group_cols: "list[str]",
) -> "DataFrame":
    """Fold HLL shard rows to a coarser grain: sketch union + row-count
    sum, one aggregation."""
    return shards.groupBy(*group_cols).agg(
        F.hll_union_agg("hll").alias("hll"),
        F.sum("n_rows").cast("long").alias("n_rows"),
    )


def hll_to_stats(profile: "DataFrame") -> "DataFrame":
    """Sketch rows -> presentation stats: (.., n_rows, n_distinct)."""
    keep = [c for c in profile.columns if c != "hll"]
    return profile.select(
        *keep, F.hll_sketch_estimate("hll").cast("long").alias("n_distinct")
    )


# --- deterministic-replay HLL -------------------------------------------
#
# The Datasketches path above (hll_sketch_agg) is the PRODUCTION default:
# one fixed-size binary buffer per shard, union in the JVM. Its register
# state is implementation-specific, so catalog entries over it were
# rows-only. This tier is the same HLL algorithm re-derived from the
# engine's PORTABLE hash (functions/hashing.py md5-prefix, the KMV
# discipline): register state is rows of (bucket, reg) built from exact
# integer arithmetic, so the whole sketch — registers AND estimate —
# replays bit-for-bit in DuckDB/Python, turning the last rows-only sketch
# family into a hash-oracle-able one.
#
# Determinism notes (each step exact on both engines):
# * h: 60-bit md5-prefix integer; bucket = h & (m-1); w = h >> lg_k.
# * rho = trailing-zero count of w + 1 (capped at 61-lg_k when w == 0).
#   Trailing zeros — not the textbook leading zeros — because
#   tz = bit_count((w & -w) - 1) is pure integer arithmetic (no float
#   log2 whose rounding could differ cross-engine); w's bits are uniform,
#   so the rho distribution (and therefore the HLL estimator and its
#   constants) is identical.
# * sum(2^-reg) is computed as the INTEGER sum(1 << (HLL_REPLAY_RHO_MAX
#   - reg)) then divided once — float summation order can round
#   differently across engines; the integer sum cannot (max 2^52 * m
#   fits int64 for lg_k >= 8).
# * Only the final estimate (one division, one optional ln in the
#   linear-counting branch) is float, rounded to 4 dp.

#: rho cap for lg_k = 8 (60-bit hash, 52-bit w): tz + 1 in [1, 53].
HLL_REPLAY_LG_K = 8
HLL_REPLAY_RHO_MAX = 60 - HLL_REPLAY_LG_K + 1


def _hll_replay_rho(h: "F.Column") -> "F.Column":
    """Trailing-zero rank of the post-bucket bits, 1-based, capped."""
    w = F.shiftright(h, HLL_REPLAY_LG_K)
    low = w.bitwiseAND(-w)
    return F.least(
        F.bit_count(low - F.lit(1)) + F.lit(1), F.lit(HLL_REPLAY_RHO_MAX)
    ).cast("int")


def hll_replay_registers(
    df: "DataFrame",
    shard_cols: "list[str]",
    key_col: str,
) -> "DataFrame":
    """Per-shard replayable HLL register state: (shard..., bucket, reg).

    One map-side-combinable groupBy on the bounded (shard x 2^lg_k) key
    space — like :func:`hll_shards`, the shuffle payload is register rows,
    never user ids. Only occupied buckets emit rows (empty registers are
    implicit zeros, reconstructed at estimate time). Register rows merge
    to any coarser grain with :func:`merge_hll_replay_registers` —
    register-wise max, so merge == rebuild is EXACT (integers)."""
    from vectordb_bioinsight_spark.functions.hashing import portable_hash64

    m = 1 << HLL_REPLAY_LG_K
    h = portable_hash64(F.col(key_col).cast("string"))
    return (
        df.select(*shard_cols, h.alias("_h"))
        .groupBy(*shard_cols, F.col("_h").bitwiseAND(F.lit(m - 1)).cast("int").alias("bucket"))
        .agg(F.max(_hll_replay_rho(F.col("_h"))).alias("reg"))
    )


def merge_hll_replay_registers(
    registers: "DataFrame", group_cols: "list[str]"
) -> "DataFrame":
    """Fold register rows to a coarser grain (register-wise max)."""
    return registers.groupBy(*group_cols, "bucket").agg(F.max("reg").alias("reg"))


def hll_replay_estimate(
    registers: "DataFrame", group_cols: "list[str]"
) -> "DataFrame":
    """Register rows -> distinct estimate per group, the standard HLL
    estimator (Flajolet et al. 2007): raw = alpha_m * m^2 / sum(2^-reg)
    (empty registers contribute 2^0), with the small-range linear-counting
    correction E = m * ln(m / V) when raw <= 2.5 m and V empty buckets
    remain. The 60-bit hash makes the large-range correction unreachable.

    Output: (group..., approx_distinct double round 4) — kept as the
    rounded estimate, never cast to long (a long cast at an integer
    boundary would flake the cross-engine hash)."""
    m = 1 << HLL_REPLAY_LG_K
    alpha = 0.7213 / (1.0 + 1.079 / m)
    gb = registers.groupBy(*group_cols).agg(
        # exact integer form of sum(2^-reg) * 2^(rho_max): addition order
        # cannot matter
        F.sum(
            F.expr(f"shiftleft(1L, {HLL_REPLAY_RHO_MAX} - reg)")
        ).cast("long").alias("_s_int"),
        F.count("*").cast("long").alias("_nb"),
    )
    two_pow = float(1 << HLL_REPLAY_RHO_MAX)
    v = F.lit(m) - F.col("_nb")  # empty buckets
    # empty registers contribute 2^0 = 1 each to sum(2^-reg)
    s = (F.col("_s_int").cast("double") / F.lit(two_pow)) + v.cast("double")
    raw = F.lit(alpha * m * m) / s
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return gb.select(*group_cols, F.round(est, 4).alias("approx_distinct"))


def hll_replay_estimate_sql(from_sql: str, group_expr: str, key_expr: str) -> str:
    """DuckDB twin of registers+estimate: one SQL string computing
    ``SELECT {group_expr} AS grp, approx_distinct FROM ({from_sql})``
    with the identical portable-hash register pipeline. ``key_expr`` must
    be a VARCHAR expression."""
    lg_k = HLL_REPLAY_LG_K
    m = 1 << lg_k
    rho_max = HLL_REPLAY_RHO_MAX
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return f"""
WITH _hll_src AS ({from_sql}),
_hll_h AS (
  SELECT {group_expr} AS grp,
         ('0x' || substr(md5({key_expr}), 1, 15))::BIGINT AS h
  FROM _hll_src
),
_hll_reg AS (
  SELECT grp, (h & {m - 1})::INT AS bucket,
         max(least(bit_count(((h >> {lg_k}) & -(h >> {lg_k})) - 1) + 1,
                   {rho_max}))::INT AS reg
  FROM _hll_h GROUP BY 1, 2
),
_hll_s AS (
  SELECT grp,
         sum((1::BIGINT << ({rho_max} - reg)))::BIGINT AS s_int,
         count(*)::BIGINT AS nb
  FROM _hll_reg GROUP BY 1
)
SELECT grp,
       round(CASE WHEN ({alpha!r}::DOUBLE * {m} * {m})
                       / (s_int::DOUBLE / {float(1 << rho_max)!r}::DOUBLE + ({m} - nb))
                  <= {2.5 * m} AND ({m} - nb) > 0
             THEN {float(m)!r}::DOUBLE * ln({float(m)!r}::DOUBLE / ({m} - nb))
             ELSE ({alpha!r}::DOUBLE * {m} * {m})
                  / (s_int::DOUBLE / {float(1 << rho_max)!r}::DOUBLE + ({m} - nb))
             END, 4) AS approx_distinct
FROM _hll_s
"""


def hist_shards(
    df: "DataFrame",
    shard_cols: "list[str]",
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 128,
) -> "DataFrame":
    """Per-shard fixed-grid HISTOGRAM state — the quantile sibling of
    :func:`moment_shards` / :func:`hll_shards`, closing the mergeable-
    sketch family (moments / distinct / heavy-hitters / quantiles).
    Values clamp into ``n_bins`` equal-width bins over the FIXED [lo, hi]
    grid; out-of-range values land in the edge bins, so a drifting
    production stream never errors, it shows up as edge mass.

    The grid is caller-fixed (from the reference period / data contract),
    NOT data-derived — that is what makes the state mergeable across
    shards, days, and engines: counts are integers, so merge == rebuild
    is EXACT (property-tested), unlike the float-associativity envelope
    of moment shards. Quantile estimates from the merged state carry a
    bounded error of one bin width — the standard fixed-grid trade
    (q-digest/KLL buy adaptive grids at the cost of a custom UDAF; the
    fixed grid stays in pure JVM expressions).

    One map-side-combinable groupBy; output (shard..., bin, cnt) is
    shard-cardinality x occupied bins."""
    span = float(hi) - float(lo)
    x = F.col(value_col).cast("double")
    bin_ = F.least(
        F.greatest(F.floor((x - F.lit(float(lo))) / span * n_bins), F.lit(0)),
        F.lit(n_bins - 1),
    ).cast("int")
    return (
        df.select(*shard_cols, bin_.alias("bin"))
        .groupBy(*shard_cols, "bin")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def merge_hist_shards(
    shards: "DataFrame",
    group_cols: "list[str]",
) -> "DataFrame":
    """Fold histogram shard rows to a coarser grain: one integer-sum
    aggregation per (group, bin) — exact and associative."""
    return shards.groupBy(*group_cols, "bin").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def hist_quantiles(
    hist: "DataFrame",
    group_cols: "list[str]",
    lo: float,
    hi: float,
    n_bins: int = 128,
    qs: "tuple[float, ...]" = (0.5, 0.9, 0.99),
) -> "DataFrame":
    """Quantile estimates from merged histogram state: per group, the
    RIGHT EDGE of the first bin whose cumulative count reaches
    ceil(q * n) — a conservative (never-underestimating) rank query with
    error bounded by one bin width. One bin-ordered window over the
    ≤n_bins-per-group frame + one aggregation; deterministic integer
    arithmetic, so the estimates hash across engines.

    Output: (group..., n, q50, q90, ... one column per requested q
    rounded 6 dp)."""
    from pyspark.sql import Window

    span = float(hi) - float(lo)
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy(*group_cols))
    )
    aggs = [F.max("n").cast("long").alias("n")]
    for q in qs:
        hit = F.when(F.col("cum") >= F.ceil(F.lit(q) * F.col("n")), F.col("bin"))
        aggs.append(
            F.round(
                F.lit(float(lo)) + (F.min(hit) + 1) / n_bins * span, 6
            ).alias(f"q{int(round(q * 100))}")
        )
    return cum.groupBy(*group_cols).agg(*aggs)


def kmv_shards(
    df: "DataFrame",
    shard_cols: "list[str]",
    key_col: str,
    k: int = 256,
) -> "DataFrame":
    """Per-shard K-Minimum-Values sketch (Bar-Yossef et al. 2002) — the
    DETERMINISTIC distinct-count state: the k smallest 60-bit portable
    hashes of the key, sorted. Where the HLL shards trade exact replay
    for fixed 2^lg_k bytes, KMV's state is a pure function of the key
    set — identical on every engine — so the sketch itself (and every
    estimate derived from it) is hash-oracle-able, and set INTERSECTIONS
    are estimable (HLL unions only).

    Plan (two-phase min-k — min-k of a union IS the min-k of per-part
    min-k's, the same closure property merge relies on): hash
    projection, (shard, salt, hash) distinct pre-aggregation (map-side
    combinable), per-(shard, salt) min-k rank over 64 salt buckets, then
    the final min-k folds <= 64k candidate rows per shard in one
    aggregation. No shard-wide window: a single global sketch would
    otherwise sort ALL distinct keys in one partition.

    Output: (shard..., kmv array<bigint> ascending, n_rows)."""
    from pyspark.sql import Window

    from vectordb_bioinsight_spark.functions.hashing import portable_hash64

    if k <= 1:
        raise ValueError("k must be > 1")
    h = portable_hash64(F.col(key_col).cast("string"))
    rows = df.groupBy(*shard_cols).agg(F.count("*").cast("long").alias("n_rows"))
    per = (
        df.select(*shard_cols, h.alias("h"))
        .withColumn("_salt", F.pmod(F.col("h"), F.lit(64)))
        .groupBy(*shard_cols, "_salt", "h")
        .agg(F.lit(1).alias("_one"))
    )
    w = Window.partitionBy(*shard_cols, "_salt").orderBy("h")
    mins = (
        per.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .groupBy(*shard_cols)
        .agg(
            F.slice(F.array_sort(F.collect_list("h")), 1, k).alias("kmv")
        )
    )
    return mins.join(rows, list(shard_cols))


def merge_kmv_shards(
    shards: "DataFrame",
    group_cols: "list[str]",
    k: int = 256,
) -> "DataFrame":
    """Fold KMV shard rows to a coarser grain: union the hash sets, keep
    the k smallest again — closed under merge, and EXACTLY equal to
    rebuilding from the union of the underlying key sets (the min-k of a
    union is the min-k of the per-part min-k's)."""
    ex = shards.select(
        *group_cols, F.explode("kmv").alias("h"), "n_rows"
    )
    rows = shards.groupBy(*group_cols).agg(
        F.sum("n_rows").cast("long").alias("n_rows")
    )
    merged = (
        ex.groupBy(*group_cols)
        .agg(
            F.slice(
                F.array_sort(F.collect_set("h")), 1, k
            ).alias("kmv")
        )
    )
    return merged.join(rows, list(group_cols))


#: hash range of portable_hash64
_KMV_RANGE = float(1 << 60)


def kmv_to_stats(profile: "DataFrame", k: int = 256) -> "DataFrame":
    """Sketch rows -> distinct-count estimate: exact when the sketch is
    unsaturated (fewer than k distinct keys — the k-th min never
    materialized), else the classic (k-1) / normalized k-th minimum.
    Deterministic arithmetic, rounded 4 dp."""
    size = F.size("kmv")
    kth = F.element_at("kmv", k).cast("double")
    est = F.when(size < k, size.cast("double")).otherwise(
        F.round((k - 1) / (kth / F.lit(_KMV_RANGE)), 4)
    )
    keep = [c for c in profile.columns if c != "kmv"]
    return profile.select(*keep, est.alias("n_distinct_est"))


def kmv_overlap(
    a: "DataFrame",
    b: "DataFrame",
    k: int = 256,
) -> "DataFrame":
    """Set-overlap estimates from two single-row KMV sketches (columns
    ``kmv``, ``n_rows``): distinct estimates for each side, the union,
    the Jaccard similarity, and the intersection — the audience-overlap
    query HLL cannot answer. Method: the union's min-k is the k smallest
    of the combined arrays; Jaccard = fraction of those present in BOTH
    sketches; intersection = Jaccard x union estimate. All
    deterministic; rounded 4 dp (6 for Jaccard).

    Output: one row (est_a, est_b, est_union, jaccard, est_intersect).
    """
    sa = a.select(F.col("kmv").alias("ka"))
    sb = b.select(F.col("kmv").alias("kb"))
    x = sa.join(sb)

    def _est(col):
        size = F.size(col)
        kth = F.element_at(col, k).cast("double")
        return F.when(size < k, size.cast("double")).otherwise(
            F.round((k - 1) / (kth / F.lit(_KMV_RANGE)), 4)
        )

    union_k = F.slice(
        F.array_sort(F.array_distinct(F.concat("ka", "kb"))), 1, k
    )
    both = F.filter(
        union_k,
        lambda h: F.array_contains(F.col("ka"), h)
        & F.array_contains(F.col("kb"), h),
    )
    jac = F.round(F.size(both) / F.size(union_k).cast("double"), 6)
    return x.select(
        _est(F.col("ka")).alias("est_a"),
        _est(F.col("kb")).alias("est_b"),
        _est(union_k).alias("est_union"),
        jac.alias("jaccard"),
        F.round(jac * _est(union_k), 4).alias("est_intersect"),
    )
