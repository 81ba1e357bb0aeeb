"""Copy-on-write table maintenance (SURVEY S11/S14/S7-S9): snapshot flip
atomicity, delete-by-predicate, key upsert, dense id assignment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.sources.maintenance import (
    append_with_ids,
    assign_dense_ids,
    create_table,
    delete_where,
    read_current,
    snapshot_path,
    upsert_by_key,
)
from vectordb_bioinsight_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def doc_store(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select("doc_id", "text", "lang", "source")
    path = str(tmp_path / "docs_store")
    create_table(docs, path)
    return path, docs


def test_create_and_read_roundtrip(spark, doc_store):
    path, docs = doc_store
    assert read_current(spark, path).count() == docs.count()


def test_delete_where_removes_only_matches(spark, doc_store):
    path, docs = doc_store
    n_total = docs.count()
    n_en = docs.filter(F.col("lang") == "en").count()
    assert 0 < n_en < n_total
    v = delete_where(spark, path, F.col("lang") == "en")
    cur = read_current(spark, path)
    assert cur.count() == n_total - n_en
    assert cur.filter(F.col("lang") == "en").count() == 0
    assert v == 1
    # the pre-delete snapshot is still readable (time travel by version)
    assert spark.read.parquet(snapshot_path(path, 0)).count() == n_total


def test_upsert_replaces_and_inserts(spark, doc_store):
    path, docs = doc_store
    n_total = docs.count()
    max_id = docs.agg(F.max("doc_id")).first()[0]
    updates = spark.createDataFrame(
        [
            (0, "replaced text", "en", "srcX"),  # existing key -> replace
            (max_id + 1000, "brand new", "de", "srcY"),  # new key -> insert
        ],
        ["doc_id", "text", "lang", "source"],
    )
    upsert_by_key(spark, path, updates, ["doc_id"])
    cur = read_current(spark, path)
    assert cur.count() == n_total + 1
    assert cur.filter(F.col("doc_id") == 0).first()["text"] == "replaced text"
    assert cur.filter(F.col("doc_id") == max_id + 1000).count() == 1


def test_assign_dense_ids_is_dense_and_unique(spark):
    df = spark.range(0, 5000, 1, 7).select(F.col("id").alias("payload"))
    out = assign_dense_ids(df, id_col="row_id", start=100).toPandas()
    ids = sorted(out["row_id"].tolist())
    assert ids == list(range(100, 5100))
    # ids did not disturb payload pairing: every payload still present once
    assert sorted(out["payload"].tolist()) == list(range(5000))


def test_append_with_ids_continues_after_max(spark, tmp_path):
    base = spark.range(0, 100).select(
        F.col("id").cast("long").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
    )
    path = str(tmp_path / "append_store")
    create_table(base, path)
    new = spark.createDataFrame([("x",), ("y",), ("z",)], ["text"])
    append_with_ids(spark, path, new, id_col="doc_id")
    cur = read_current(spark, path).toPandas()
    assert len(cur) == 103
    assert sorted(cur["doc_id"].tolist()) == list(range(103))
    new_ids = cur[cur["text"].isin(["x", "y", "z"])]["doc_id"].tolist()
    assert sorted(new_ids) == [100, 101, 102]


# --- wide→long ingestion (S1/S4, §1.1 melt discipline) ---


def test_read_counts_wide_csv_bulk(spark, tmp_path):
    from vectordb_bioinsight_spark.sources.readers import read_counts_wide_csv

    p = tmp_path / "counts.tsv"
    p.write_text("gene_id\tS1\tS2\tS3\nG1\t10\t0\t5\nG2\t7\t2\t9\n")
    out = read_counts_wide_csv(spark, str(p)).toPandas()
    assert sorted(out.columns) == ["count", "gene_id", "sample_id"]
    assert len(out) == 6
    got = {(r.gene_id, r.sample_id): r.count for r in out.itertuples()}
    assert got[("G1", "S1")] == 10 and got[("G2", "S3")] == 9


def test_read_counts_wide_csv_singlecell_roles(spark, tmp_path):
    from vectordb_bioinsight_spark.sources.readers import read_counts_wide_csv

    p = tmp_path / "cells.csv"
    p.write_text("cell_id,G1,G2\nC1,3,0\nC2,1,8\n")
    out = read_counts_wide_csv(spark, str(p), transpose_roles=True).toPandas()
    assert sorted(out.columns) == ["cell_id", "count", "gene_id"]
    got = {(r.cell_id, r.gene_id): r.count for r in out.itertuples()}
    assert got[("C2", "G2")] == 8 and got[("C1", "G2")] == 0


def test_read_h5ad_raises_clearly(spark):
    import pytest as _pytest

    from vectordb_bioinsight_spark.sources.readers import read_h5ad

    with _pytest.raises(NotImplementedError, match="read_counts_wide_csv"):
        read_h5ad(spark, "/nonexistent.h5ad")


class TestScd2Merge:
    def _base(self, spark):
        from vectordb_bioinsight_spark.sources.maintenance import scd2_init

        snap = spark.createDataFrame(
            [(1, "gold", "2024-01-01"), (2, "silver", "2024-01-01")],
            "id long, segment string, ts string",
        ).withColumn("ts", F.to_timestamp("ts"))
        return scd2_init(snap, "ts")

    def test_change_closes_and_reopens(self, spark):
        from vectordb_bioinsight_spark.sources.maintenance import scd2_merge

        cur = self._base(spark)
        upd = spark.createDataFrame(
            [(1, "platinum", "2024-02-01"),   # changed
             (2, "silver", "2024-02-01"),     # unchanged
             (3, "bronze", "2024-02-01")],    # new key
            "id long, segment string, ts string",
        ).withColumn("ts", F.to_timestamp("ts"))
        out = scd2_merge(cur, upd, ["id"], "ts").collect()
        rows = {(r["id"], r["segment"], r["is_current"]): r for r in out}
        assert len(out) == 4
        closed = rows[(1, "gold", False)]
        assert str(closed["valid_to"]).startswith("2024-02-01")
        opened = rows[(1, "platinum", True)]
        assert str(opened["valid_from"]).startswith("2024-02-01")
        assert opened["valid_to"] is None
        assert (2, "silver", True) in rows          # untouched open row
        assert (3, "bronze", True) in rows          # first version of new key

    def test_idempotent_on_no_change(self, spark):
        from vectordb_bioinsight_spark.sources.maintenance import scd2_merge

        cur = self._base(spark)
        upd = spark.createDataFrame(
            [(1, "gold", "2024-03-01")], "id long, segment string, ts string"
        ).withColumn("ts", F.to_timestamp("ts"))
        out = scd2_merge(cur, upd, ["id"], "ts")
        assert sorted(map(tuple, out.collect())) == sorted(map(tuple, cur.collect()))

    def test_multi_row_per_key_batch_applies_latest_only(self, spark):
        """A CDC batch with several rows for one key must collapse to the
        LATEST row before merging — no fan-out, exactly one open row per
        key (ADVICE r03: the left join previously emitted one closed + one
        open row PER update row)."""
        from vectordb_bioinsight_spark.sources.maintenance import scd2_merge

        cur = self._base(spark)
        upd = spark.createDataFrame(
            [(1, "platinum", "2024-02-01"),
             (1, "diamond", "2024-02-15"),   # same key, later — must win
             (1, "gold", "2024-01-15")],     # same key, earlier — ignored
            "id long, segment string, ts string",
        ).withColumn("ts", F.to_timestamp("ts"))
        out = scd2_merge(cur, upd, ["id"], "ts")
        k1 = [r for r in out.collect() if r["id"] == 1]
        open_rows = [r for r in k1 if r["is_current"]]
        assert len(open_rows) == 1
        assert open_rows[0]["segment"] == "diamond"
        assert str(open_rows[0]["valid_from"]).startswith("2024-02-15")
        closed = [r for r in k1 if not r["is_current"]]
        assert len(closed) == 1 and closed[0]["segment"] == "gold"
        assert str(closed[0]["valid_to"]).startswith("2024-02-15")

    def test_history_passes_through(self, spark):
        from vectordb_bioinsight_spark.sources.maintenance import scd2_merge

        cur = self._base(spark)
        upd1 = spark.createDataFrame(
            [(1, "platinum", "2024-02-01")], "id long, segment string, ts string"
        ).withColumn("ts", F.to_timestamp("ts"))
        v2 = scd2_merge(cur, upd1, ["id"], "ts")
        upd2 = spark.createDataFrame(
            [(1, "diamond", "2024-03-01")], "id long, segment string, ts string"
        ).withColumn("ts", F.to_timestamp("ts"))
        v3 = scd2_merge(v2, upd2, ["id"], "ts")
        hist = [r for r in v3.collect() if r["id"] == 1]
        assert len(hist) == 3
        by_seg = {r["segment"]: r for r in hist}
        assert not by_seg["gold"]["is_current"] and not by_seg["platinum"]["is_current"]
        assert by_seg["diamond"]["is_current"] and by_seg["diamond"]["valid_to"] is None


class TestCompactAndVacuum:
    def test_compact_reduces_file_count(self, spark, tmp_path):
        from vectordb_bioinsight_spark.sources.maintenance import (
            compact_table,
            create_table,
            read_current,
            snapshot_path,
        )

        path = str(tmp_path / "tbl")
        df = spark.range(0, 10_000).select(F.col("id"), (F.col("id") % 5).alias("k"))
        create_table(df.repartition(64), path)   # 64 tiny files

        def n_files(p):
            import os
            return sum(f.endswith(".parquet") for f in os.listdir(p))

        before = n_files(snapshot_path(path))
        assert before >= 32
        compact_table(spark, path, target_file_mb=128)
        after = n_files(snapshot_path(path))
        assert after == 1
        assert read_current(spark, path).count() == 10_000

    def test_vacuum_keeps_recent_and_current(self, spark, tmp_path):
        import os

        from vectordb_bioinsight_spark.sources.maintenance import (
            create_table,
            read_current,
            vacuum_table,
            write_snapshot,
        )

        path = str(tmp_path / "tbl2")
        df = spark.range(0, 100)
        create_table(df, path)                       # v0
        for _ in range(3):
            write_snapshot(read_current(spark, path), path)   # v1..v3
        removed = vacuum_table(path, keep_last=2)
        assert removed == [0, 1]
        dirs = sorted(d for d in os.listdir(path) if d.startswith("v") and d[1:].isdigit())
        assert dirs == ["v2", "v3"]
        assert read_current(spark, path).count() == 100


class TestAnnStore:
    def test_ivf_index_save_load_search_parity(self, spark, tmp_path):
        """Build -> save -> load -> search must equal searching the fresh
        index, and the loaded probe scan must PRUNE partitions (only
        n_probe cell directories read)."""
        from vectordb_bioinsight_spark.operators.vector import (
            ivf_build_index,
            ivf_search,
        )
        from vectordb_bioinsight_spark.sources.ann_store import (
            load_ivf_index,
            probed_cells_scan,
            save_ivf_index,
        )
        from vectordb_bioinsight_spark.sources.readers import load_table
        from tests.conftest import SF_SMALL

        emb = load_table(spark, SF_SMALL, "embeddings")
        index = ivf_build_index(emb, "vec_id", "embedding", n_cells=8)
        path = str(tmp_path / "ivf_index")
        v = save_ivf_index(path, index[0], index[1], meta={"n_cells": 8})
        assert v == 0

        assigned, centroids, codebook, manifest = load_ivf_index(spark, path)
        assert codebook is None and manifest["n_cells"] == 8
        queries = emb.filter(F.col("vec_id") < 8)
        fresh = ivf_search(index, queries, "vec_id", "embedding", k=5, n_probe=3)
        loaded = ivf_search(
            (assigned, centroids), queries, "vec_id", "embedding", k=5, n_probe=3
        )
        f = {(r["query_id"], r["rank"]): (r["cand_id"], r["score"]) for r in fresh.collect()}
        l = {(r["query_id"], r["rank"]): (r["cand_id"], r["score"]) for r in loaded.collect()}
        assert f == l and len(f) > 0

        # partition pruning: filtering the partition column must reach the
        # scan as a partition filter, not a data filter
        plan = probed_cells_scan(assigned, [1, 3])._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "PartitionFilters" in plan
        seg = plan.split("PartitionFilters", 1)[1][:200]
        assert "_cell" in seg

    def test_ivf_index_versions_flip_atomically(self, spark, tmp_path):
        from vectordb_bioinsight_spark.operators.vector import ivf_build_index
        from vectordb_bioinsight_spark.sources.ann_store import (
            load_ivf_index,
            save_ivf_index,
        )
        from vectordb_bioinsight_spark.sources.readers import load_table
        from tests.conftest import SF_SMALL

        emb = load_table(spark, SF_SMALL, "embeddings")
        path = str(tmp_path / "ivf_versions")
        a8 = ivf_build_index(emb, "vec_id", "embedding", n_cells=8)
        save_ivf_index(path, a8[0], a8[1], meta={"n_cells": 8})
        a4 = ivf_build_index(emb, "vec_id", "embedding", n_cells=4)
        v = save_ivf_index(path, a4[0], a4[1], meta={"n_cells": 4})
        assert v == 1
        _, _, _, manifest = load_ivf_index(spark, path)
        assert manifest["n_cells"] == 4  # reader sees the committed version

    def test_pq_codebook_roundtrip(self, spark, tmp_path):
        from vectordb_bioinsight_spark.operators.pq import pq_encode, pq_train_kmeans
        from vectordb_bioinsight_spark.operators.vector import ivf_build_index
        from vectordb_bioinsight_spark.sources.ann_store import (
            load_ivf_index,
            save_ivf_index,
        )
        from vectordb_bioinsight_spark.sources.readers import load_table
        from tests.conftest import SF_SMALL

        emb = load_table(spark, SF_SMALL, "embeddings")
        cb = pq_train_kmeans(emb, "vec_id", "embedding", m=4, k=8, iters=3)
        index = ivf_build_index(emb, "vec_id", "embedding", n_cells=4)
        path = str(tmp_path / "ivfpq_index")
        save_ivf_index(path, index[0], index[1], codebook=cb)
        _, _, cb2, manifest = load_ivf_index(spark, path)
        assert manifest["has_codebook"]
        assert cb2 == [[list(map(float, c)) for c in sub] for sub in cb]
        # encoding through the reloaded codebook is identical
        e1 = {r["vec_id"]: r["pq_code"] for r in pq_encode(emb, "vec_id", "embedding", cb).collect()}
        e2 = {r["vec_id"]: r["pq_code"] for r in pq_encode(emb, "vec_id", "embedding", cb2).collect()}
        assert e1 == e2


def test_snapshot_diff_classifies_changes(spark, doc_store):
    from vectordb_bioinsight_spark.sources.maintenance import (
        snapshot_diff,
        upsert_by_key,
        delete_where,
    )

    path, docs = doc_store
    max_id = docs.agg(F.max("doc_id")).first()[0]
    updates = spark.createDataFrame(
        [(0, "edited", "en", "src0"), (max_id + 1, "fresh", "de", "srcN")],
        ["doc_id", "text", "lang", "source"],
    )
    upsert_by_key(spark, path, updates, ["doc_id"])          # v1
    delete_where(spark, path, F.col("doc_id") == 1)          # v2

    diff = snapshot_diff(spark, path, ["doc_id"], 0, 2).collect()
    by_id = {r["doc_id"]: r for r in diff}
    assert set(by_id) == {0, 1, max_id + 1}
    assert by_id[0]["_change_type"] == "update_postimage" and by_id[0]["text"] == "edited"
    assert by_id[1]["_change_type"] == "delete" and by_id[1]["text"] is None
    assert by_id[max_id + 1]["_change_type"] == "insert" and by_id[max_id + 1]["text"] == "fresh"
    # adjacent identical versions diff to empty
    assert snapshot_diff(spark, path, ["doc_id"], 2, 2).count() == 0
