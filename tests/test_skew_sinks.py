"""Salted skew mitigation (equivalence with direct plans), sinks round-trip,
and incremental BM25 index maintenance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vectordb_bioinsight_spark.operators.bm25 import (
    bm25_scores,
    build_postings,
    doc_lengths,
    incremental_index_update,
)
from vectordb_bioinsight_spark.operators.skew import salted_aggregate, salted_join
from vectordb_bioinsight_spark.sources.readers import load_table
from vectordb_bioinsight_spark.sources.writers import write_csv, write_table


def test_salted_aggregate_equals_direct(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    direct = {
        r["l_returnflag"]: (r["n"], r["s"], r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(F.count("l_quantity").alias("n"), F.sum("l_quantity").alias("s"), F.max("l_quantity").alias("mx"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["n"], r["s"], r["mx"])
        for r in salted_aggregate(
            li,
            ["l_returnflag"],
            {"n": ("count", "l_quantity"), "s": ("sum", "l_quantity"), "mx": ("max", "l_quantity")},
            n_salts=16,
        ).collect()
    }
    assert direct.keys() == salted.keys()
    for k in direct:
        assert direct[k][0] == salted[k][0]
        assert direct[k][1] == pytest.approx(salted[k][1])
        assert direct[k][2] == salted[k][2]


def test_salted_aggregate_rejects_nonalgebraic(spark):
    li = load_table(spark, SF_SMALL, "lineitem")
    with pytest.raises(ValueError, match="not decomposable"):
        salted_aggregate(li, ["l_returnflag"], {"m": ("avg", "l_quantity")})


def test_salted_join_equals_direct(spark):
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    orders = load_table(spark, SF_SMALL, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    direct = li.join(orders, "l_orderkey").groupBy("o_orderpriority").count()
    salted = salted_join(li, orders, "l_orderkey", n_salts=4).groupBy("o_orderpriority").count()
    d = {r["o_orderpriority"]: r["count"] for r in direct.collect()}
    s = {r["o_orderpriority"]: r["count"] for r in salted.collect()}
    assert d == s


def test_write_table_partitioned_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    out = str(tmp_path / "docs_by_lang")
    write_table(docs, out, partition_by=["lang"])
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # partition pruning: reading one lang touches only that directory
    import os

    langs = [d for d in os.listdir(out) if d.startswith("lang=")]
    assert len(langs) == docs.select("lang").distinct().count()
    one = back.filter(F.col("lang") == "en")
    assert one.count() == docs.filter(F.col("lang") == "en").count()


def test_write_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    out = str(tmp_path / "csv_out")
    write_csv(df, out)
    back = spark.read.option("header", "true").option("inferSchema", "true").csv(out)
    assert {tuple(r) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_incremental_bm25_equals_full_rebuild(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    old = docs.filter(F.col("doc_id") < 400)
    delta = docs.filter(F.col("doc_id") >= 400)
    p_old, s_old = build_postings(old, "doc_id", "text"), doc_lengths(old, "doc_id", "text")
    p_inc, s_inc = incremental_index_update(p_old, s_old, delta, "doc_id", "text")
    q = ["merge", "join", "filter"]
    inc = {r["doc_id"]: r["score"] for r in bm25_scores(p_inc, s_inc, q).collect()}
    p_full, s_full = build_postings(docs, "doc_id", "text"), doc_lengths(docs, "doc_id", "text")
    full = {r["doc_id"]: r["score"] for r in bm25_scores(p_full, s_full, q).collect()}
    assert inc == full and len(full) > 0


def test_bucketed_join_is_shuffle_free(spark):
    """The co-location contract: same-key same-count bucketed tables join
    with NO Exchange in the plan (the shuffle was paid at write time)."""
    import uuid

    from vectordb_bioinsight_spark.sources.writers import write_bucketed_table

    # warehouse dir is a static conf (set at session build); managed tables
    # land in ./spark-warehouse and are dropped below (dir is gitignored)
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_totalprice")
    t1, t2 = f"li_b_{uuid.uuid4().hex[:8]}", f"ord_b_{uuid.uuid4().hex[:8]}"
    write_bucketed_table(li, t1, "l_orderkey", n_buckets=8, sort_col="l_orderkey")
    write_bucketed_table(orders, t2, "o_orderkey", n_buckets=8, sort_col="o_orderkey")
    a = spark.table(t1)
    b = spark.table(t2)
    # disable auto-broadcast so the join would otherwise need a shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a.l_orderkey == b.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan
        # and it is correct
        n = joined.count()
        want = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        assert n == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {t1}")
        spark.sql(f"DROP TABLE IF EXISTS {t2}")


def test_write_clustered_files_have_disjoint_ranges(spark, tmp_path):
    """The range-clustered sink must produce files whose footer min/max on
    the cluster key are pairwise disjoint (that's what lets a point/range
    predicate skip whole files), with rows sorted inside each file."""
    import glob

    import pyarrow.parquet as pq

    from vectordb_bioinsight_spark.sources.writers import write_clustered

    df = spark.range(0, 20_000).selectExpr(
        "id", "cast(id * 37 % 9973 as long) as k", "cast(rand(7) * 100 as double) as v"
    )
    out = str(tmp_path / "clustered")
    write_clustered(df, out, cluster_by=["k"], num_files=8)

    ranges = []
    for f in sorted(glob.glob(out + "/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        k_idx = [md.schema.column(i).name for i in range(md.num_columns)].index("k")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(k_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 4  # actually split into multiple files
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges ({hi1} > {lo2})"

    # and the predicate prunes: count with a narrow filter reads correctly
    back = spark.read.parquet(out)
    lo, hi = ranges[0][0], ranges[0][1]
    expect = df.filter((F.col("k") >= lo) & (F.col("k") <= hi)).count()
    assert back.filter((F.col("k") >= lo) & (F.col("k") <= hi)).count() == expect


def test_orc_round_trip(spark, tmp_path):
    from vectordb_bioinsight_spark.sources.writers import write_orc

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "a", 3.5)], "id long, k string, v double"
    )
    path = str(tmp_path / "orc_rt")
    write_orc(df, path, partition_by=["k"])
    back = spark.read.orc(path).select("id", "k", "v")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # partition pruning: the k filter must reach the file listing
    plan = back.filter(F.col("k") == "a")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "k#" in plan


def test_write_zordered_skips_files_on_every_column(spark, tmp_path):
    """The Z-ordered layout must bound each file to a small hyper-rectangle:
    a narrow range predicate on EITHER clustered column overlaps only a
    minority of files' footer min/max — the multi-column skipping
    write_clustered cannot give (its second key prunes nothing)."""
    import glob

    import pyarrow.parquet as pq

    from vectordb_bioinsight_spark.sources.writers import write_zordered

    # two independent uniform dims — the classic z-order shape
    df = spark.range(0, 40_000).selectExpr(
        "id",
        "cast(id * 2654435761 % 10000 as long) as x",
        "cast(id * 40503 % 10000 as long) as y",
    )
    out = str(tmp_path / "zordered")
    write_zordered(df, out, cluster_by=["x", "y"], num_files=16)

    def file_ranges(col):
        ranges = []
        for f in sorted(glob.glob(out + "/part-*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = [md.schema.column(i).name for i in range(md.num_columns)].index(col)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            ranges.append((min(mins), max(maxs)))
        return ranges

    n_files = len(glob.glob(out + "/part-*.parquet"))
    assert n_files >= 8
    # repartitionByRange SAMPLES its boundaries, so a z-interval that
    # straddles a high-order bit transition of one dim spans that dim's
    # full extent — per-dim touch counts vary run to run. The stable
    # property: EVERY dim skips something (single-key clustering skips
    # nothing on its second key), and the two dims skip well on average.
    lo, hi = 4000, 4500  # a 5%-wide predicate
    touched = {}
    for col in ("x", "y"):
        ranges = file_ranges(col)
        touched[col] = sum(1 for (mn, mx) in ranges if not (mx < lo or mn > hi))
        assert touched[col] < n_files, (col, touched[col], n_files, ranges)
    assert touched["x"] + touched["y"] <= int(1.3 * n_files), (touched, n_files)

    # the z column is layout only — it must not survive into the data
    cols = set(spark.read.parquet(out).columns)
    assert cols == {"id", "x", "y"}
    assert spark.read.parquet(out).count() == 40_000


def test_zorder_edge_cases(spark, tmp_path):
    """Review findings r04: empty input / all-NULL columns must write
    cleanly (constant bucket), and an over-budget bit layout must raise
    instead of silently wrapping shift amounts."""
    import pytest

    from vectordb_bioinsight_spark.sources.writers import write_zordered, zorder_key

    empty = spark.range(0).selectExpr("id", "id as x", "id as y")
    out = str(tmp_path / "z_empty")
    write_zordered(empty, out, cluster_by=["x", "y"], num_files=4)
    assert spark.read.parquet(out).count() == 0

    nulls = spark.range(10).selectExpr("id", "cast(null as long) as x", "id as y")
    out2 = str(tmp_path / "z_nulls")
    write_zordered(nulls, out2, cluster_by=["x", "y"], num_files=2)
    assert spark.read.parquet(out2).count() == 10

    with pytest.raises(ValueError, match="63-bit"):
        zorder_key(spark.range(4).selectExpr(*[f"id as c{i}" for i in range(8)]),
                   [f"c{i}" for i in range(8)], bits_per_col=16)


def test_write_training_shards_layout_and_manifest(spark, tmp_path):
    """Shard-partitioned data + a manifest whose totals and fingerprints
    match a from-scratch recomputation over what was written."""
    from vectordb_bioinsight_spark.operators.packing import shard_manifest
    from vectordb_bioinsight_spark.sources.writers import write_training_shards

    docs = spark.createDataFrame(
        [(i, f"document body {i} " * (1 + i % 3)) for i in range(60)],
        "doc_id long, text string",
    )
    base = str(tmp_path / "corpus")
    write_training_shards(docs, base, "doc_id", "text", n_shards=4, salt=0)

    data = spark.read.parquet(f"{base}/data")
    assert data.count() == 60
    assert set(r["shard"] for r in data.select("shard").distinct().collect()) == {0, 1, 2, 3}
    # shard_pos is a dense 0..n-1 sequence within every shard
    from pyspark.sql import functions as F

    per = data.groupBy("shard").agg(
        F.count("*").alias("n"), F.max("shard_pos").alias("mx"), F.min("shard_pos").alias("mn")
    )
    for r in per.collect():
        assert r["mn"] == 0 and r["mx"] == r["n"] - 1

    written_manifest = {
        r["shard"]: r for r in spark.read.parquet(f"{base}/manifest").collect()
    }
    recomputed = {
        r["shard"]: r
        for r in shard_manifest(data, "shard", "doc_id", "text").collect()
    }
    assert written_manifest == recomputed


def test_write_training_shards_curriculum_order(spark, tmp_path):
    from vectordb_bioinsight_spark.sources.writers import write_training_shards
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "w " * (1 + (i * 7) % 50), float((i * 7) % 50)) for i in range(80)],
        "doc_id long, text string, difficulty double",
    )
    base = str(tmp_path / "curr")
    write_training_shards(
        docs, base, "doc_id", "text", n_shards=3, score_col="difficulty"
    )
    data = spark.read.parquet(f"{base}/data").orderBy("shard", "shard_pos").collect()
    by_shard: dict[int, list[float]] = {}
    for r in data:
        by_shard.setdefault(r["shard"], []).append(r["difficulty"])
    for scores in by_shard.values():
        assert scores == sorted(scores)  # easy-first on disk
