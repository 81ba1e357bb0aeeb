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
