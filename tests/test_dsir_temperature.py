"""DSIR importance scoring and temperature mixture: planted-fixture math."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.packing import (
    temperature_mixture_sample,
    temperature_mixture_weights,
)
from vectordb_bioinsight_spark.operators.text_analysis import dsir_logratio_scores


def test_temperature_weights_known_math(spark):
    # 90/10 split at 1/T=0.5: q = (sqrt(.9), sqrt(.1))/Z -> (0.75, 0.25)
    rows = [(i, "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    w = {r["domain"]: r for r in temperature_mixture_weights(df, "domain", 0.5).collect()}
    assert w["big"]["p"] == 0.9 and w["small"]["p"] == 0.1
    z = math.sqrt(0.9) + math.sqrt(0.1)
    assert w["big"]["q"] == round(math.sqrt(0.9) / z, 6) == 0.75
    assert w["small"]["q"] == 0.25
    assert w["big"]["weight"] == round(0.75 / 0.9, 6)
    assert w["small"]["weight"] == round(0.25 / 0.1, 6) == 2.5


def test_temperature_weights_uniform_is_identity(spark):
    rows = [(i, f"d{i % 4}") for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    for r in temperature_mixture_weights(df, "domain", 0.5).collect():
        assert r["weight"] == 1.0


def test_temperature_sample_realizes_q(spark):
    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    out = temperature_mixture_sample(df, "doc_id", "domain", 0.5, salt=3)
    by_dom = {
        r["domain"]: r["n"]
        for r in out.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    # expected copies: big 900*0.8333~750, small 100*2.5=250; hash gate is
    # uniform-ish, allow 5% slack on the fractional part
    assert abs(by_dom["big"] - 750) < 40
    assert abs(by_dom["small"] - 250) < 1  # 2.5 -> exactly 2 + gated 0.5
    # deterministic
    out2 = temperature_mixture_sample(df, "doc_id", "domain", 0.5, salt=3)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out2.collect()))


def test_temperature_invalid_inv_temp(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, domain string")
    with pytest.raises(ValueError):
        temperature_mixture_weights(df, "domain", 0.0)


def test_dsir_ranks_target_like_docs_higher(spark):
    # target corpus speaks "qqqx"; distractors speak "zzzx"
    tgt_text = " ".join(["qqqx wwwx eeex rrrx"] * 5)
    far_text = " ".join(["zzzx xxxw cccx vvvx"] * 5)
    rows = (
        [(i, tgt_text, True) for i in range(10)]
        + [(100 + i, tgt_text, False) for i in range(3)]  # raw docs, target-like
        + [(200 + i, far_text, False) for i in range(3)]  # raw docs, far
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    scored = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_logratio_scores(
            df, "doc_id", "text", is_target=F.col("tgt"), n_buckets=512
        ).collect()
    }
    for like in range(100, 103):
        for far in range(200, 203):
            assert scored[like] > scored[far]
    # target-like raw docs share every feature with the target model
    assert scored[100] == scored[0]
