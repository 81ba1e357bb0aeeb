"""S7-S9: external-API sources as *snapshot dimension tables*.

The reference calls PubMed/Semantic Scholar/KEGG-style HTTP APIs inline
(recommender.py:217-375, rnaseq_pipeline/external_apis/*). Inline HTTP in a
1000-executor job is a thundering herd — the engine's pattern is instead:

  1. collect the (bounded) key set to fetch;
  2. fetch with ``fetch_keyed_snapshot`` — partition-parallel, each partition
     throttled to a per-task rate budget so the aggregate request rate is
     ``num_partitions / min_interval_s`` and survives API rate limits
     (reference throttles 0.34-0.5 s/request: recommender.py:263, 370);
  3. land the result as a parquet/Delta dimension table (broadcast-size by
     construction), refreshed by this batch job — queries join the snapshot,
     never the network.

The fetcher is injected, so tests (and airgapped runs) use deterministic
fakes; production wires ``requests`` inside the closure. Failures are rows
with ``error`` set, not task crashes — one bad key must not kill a 10k-key
refresh (at-least-once semantics; the upsert into the snapshot table is the
idempotency point, sources/maintenance.upsert_by_key).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def fetch_keyed_snapshot(
    spark: SparkSession,
    keys: list[str],
    fetch_fn: Callable[[str], dict],
    min_interval_s: float = 0.0,
    num_partitions: int = 4,
) -> DataFrame:
    """Fetch ``keys`` through ``fetch_fn`` into a (key, payload_json, error)
    DataFrame — the snapshot-refresh kernel.

    ``fetch_fn`` runs on executors (must be picklable, import inside); each
    partition sleeps ``min_interval_s`` between calls, so the aggregate rate
    is bounded by ``num_partitions / min_interval_s`` requests/second.
    """

    def _worker(it):
        import json
        import time

        last = 0.0
        for row in it:
            key = row[0]
            wait = min_interval_s - (time.monotonic() - last)
            if wait > 0:
                time.sleep(wait)
            last = time.monotonic()
            try:
                yield (key, json.dumps(fetch_fn(key), sort_keys=True), None)
            except Exception as exc:  # noqa: BLE001 - error rows, not task death
                yield (key, None, f"{type(exc).__name__}: {exc}")

    kdf = spark.createDataFrame([(k,) for k in keys], "key string").repartition(num_partitions)
    return kdf.rdd.mapPartitions(_worker).toDF("key string, payload_json string, error string")


def snapshot_to_dimension(
    snapshot: DataFrame,
    fields: dict[str, str],
) -> DataFrame:
    """Project fetched JSON payloads into a typed dimension table:
    ``fields`` maps column name -> JSON path type, e.g. {"title": "string",
    "year": "int"}. Error rows are excluded (they stay in the raw snapshot
    for retry)."""
    from pyspark.sql import functions as F

    ok = snapshot.filter(F.col("error").isNull())
    cols = [F.col("key")]
    for name, dtype in fields.items():
        cols.append(F.get_json_object("payload_json", f"$.{name}").cast(dtype).alias(name))
    return ok.select(*cols)
