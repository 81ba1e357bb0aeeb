"""Streaming PSI monitor (streaming/drift_stream.py): stable batches log
'stable', a shifted batch logs 'alert', and the streamed PSI equals the
batch psi_drift on the same data."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.drift import psi_drift
from vectordb_bioinsight_spark.streaming.drift_stream import run_psi_monitor


@pytest.fixture()
def ref(spark):
    # uniform-ish reference on [0, 100): 500 points
    return spark.range(500).select((F.col("id") % 100).cast("double").alias("v"))


def _write_batch(landing, name, vals):
    (landing / name).write_text(
        "\n".join(json.dumps({"v": float(x)}) for x in vals) + "\n"
    )


def test_monitor_flags_shift_and_matches_batch_psi(spark, tmp_path, ref):
    landing = tmp_path / "landing"
    landing.mkdir()
    log = str(tmp_path / "log")

    same = [float(i % 100) for i in range(300)]          # same distribution
    _write_batch(landing, "b1.jsonl", same)
    stream = spark.readStream.schema("v double").json(str(landing))
    run_psi_monitor(stream, ref, "v", str(tmp_path / "ck1"), log)

    shifted = [float(80 + (i % 20)) for i in range(300)]  # mass into top bins
    _write_batch(landing, "b2.jsonl", shifted)
    stream2 = spark.readStream.schema("v double").json(str(landing))
    run_psi_monitor(stream2, ref, "v", str(tmp_path / "ck2"), log)

    # both runs log batch_id 0 (separate checkpoints) — key by n_rows:
    # run 1 scored b1 alone (300), run 2 scored b1+b2 together (600)
    by_n = {r["n_rows"]: r for r in spark.read.parquet(log).collect()}
    assert by_n[300]["status"] == "stable" and by_n[300]["psi_total"] < 0.1
    assert by_n[600]["status"] in ("watch", "alert")

    # streamed number == batch psi_drift on the same concatenated data
    cur = spark.createDataFrame([(x,) for x in same + shifted], "v double")
    expect = psi_drift(ref, cur, "v").agg(F.max("psi_total")).first()[0]
    assert abs(by_n[600]["psi_total"] - expect) < 1e-9
