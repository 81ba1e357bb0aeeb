"""S7-S9 snapshot connector: rate limiting, error isolation, typed projection."""

from __future__ import annotations

import time


def _make_fetch():
    # nested so cloudpickle ships it by value (test modules aren't importable
    # on executor workers)
    def fake_fetch(key: str) -> dict:
        if key == "bad":
            raise ValueError("upstream 404")
        return {"title": f"paper-{key}", "year": 2000 + len(key), "score": 1.5}

    return fake_fetch


def test_snapshot_fetch_and_projection(spark):
    from vectordb_bioinsight_spark.sources.snapshot import (
        fetch_keyed_snapshot,
        snapshot_to_dimension,
    )

    keys = ["a", "bb", "ccc", "bad"]
    snap = fetch_keyed_snapshot(spark, keys, _make_fetch(), num_partitions=2)
    rows = {r["key"]: r for r in snap.collect()}
    assert set(rows) == set(keys)
    assert rows["bad"]["error"] and rows["bad"]["payload_json"] is None
    assert rows["a"]["error"] is None

    dim = snapshot_to_dimension(snap, {"title": "string", "year": "int"})
    got = {r["key"]: (r["title"], r["year"]) for r in dim.collect()}
    assert got == {"a": ("paper-a", 2001), "bb": ("paper-bb", 2002), "ccc": ("paper-ccc", 2003)}


def test_snapshot_rate_limit_bounds_partition_rate(spark):
    from vectordb_bioinsight_spark.sources.snapshot import fetch_keyed_snapshot

    keys = [f"k{i}" for i in range(6)]
    t0 = time.monotonic()
    fetch_keyed_snapshot(
        spark, keys, _make_fetch(), min_interval_s=0.2, num_partitions=1
    ).count()
    elapsed = time.monotonic() - t0
    # 6 sequential calls at >= 0.2s spacing: at least 1.0s of enforced waits
    assert elapsed >= 1.0, elapsed
