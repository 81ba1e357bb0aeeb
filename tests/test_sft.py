"""SFT chat-template rendering (operators/sft.py): span arithmetic,
role masking, turn ordering."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.sft import render_chat


def _turns(spark, rows):
    return spark.createDataFrame(rows, "conv long, turn int, role string, text string")


def test_spans_address_exactly_the_assistant_text(spark):
    df = _turns(spark, [
        (1, 0, "user", "hi"),
        (1, 1, "assistant", "hello there"),
        (1, 2, "user", "bye"),
        (1, 3, "assistant", "ok"),
    ])
    r = render_chat(df, "conv", "turn", "role", "text").first()
    assert r["n_turns"] == 4
    assert r["rendered"].startswith("<|user|>hi<|end|><|assistant|>")
    got = [r["rendered"][s["start"]:s["end"]] for s in r["mask_spans"]]
    assert got == ["hello there", "ok"]
    assert r["mask_chars"] == len("hello there") + len("ok")
    # markers are never inside a span
    for s in r["mask_spans"]:
        assert "<|" not in r["rendered"][s["start"]:s["end"]]


def test_turn_order_is_total_regardless_of_input_order(spark):
    shuffled = _turns(spark, [
        (1, 2, "user", "third"),
        (1, 0, "user", "first"),
        (1, 1, "assistant", "second"),
    ]).repartition(3)
    r = render_chat(shuffled, "conv", "turn", "role", "text").first()
    assert r["rendered"] == (
        "<|user|>first<|end|><|assistant|>second<|end|><|user|>third<|end|>"
    )
    (s,) = r["mask_spans"]
    assert r["rendered"][s["start"]:s["end"]] == "second"


def test_conversation_without_assistant_turns(spark):
    df = _turns(spark, [(7, 0, "user", "just me"), (7, 1, "system", "rules")])
    r = render_chat(df, "conv", "turn", "role", "text").first()
    assert r["mask_spans"] == [] and r["mask_chars"] == 0
    assert r["n_turns"] == 2


def test_custom_mask_role(spark):
    df = _turns(spark, [(1, 0, "user", "q"), (1, 1, "tool", "result!")])
    r = render_chat(df, "conv", "turn", "role", "text", mask_role="tool").first()
    (s,) = r["mask_spans"]
    assert r["rendered"][s["start"]:s["end"]] == "result!"


def test_plan_single_conversation_shuffle(spark):
    """The render must shuffle on the conversation key only — one window
    + one groupBy on the same key (AQE may reuse the partitioning)."""
    import re

    df = _turns(spark, [(1, 0, "user", "a"), (1, 1, "assistant", "b")])
    plan = (
        render_chat(df, "conv", "turn", "role", "text")
        ._jdf.queryExecution()
        .explainString(
            df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    n_ex = len(re.findall(r"^\(\d+\) Exchange", plan, re.MULTILINE))
    assert n_ex <= 2
    assert "BatchEvalPython" not in plan


class TestPreferencePairs:
    def test_chosen_rejected_and_cap(self, spark):
        from vectordb_bioinsight_spark.operators.sft import preference_pairs

        rows = [("c1", i, float(10 - i)) for i in range(7)]  # chosen = id 0
        rows += [("solo", 99, 5.0)]                           # singleton: no pairs
        rows += [("tie", 10, 3.0), ("tie", 11, 3.0)]          # tie -> min id chosen
        df = spark.createDataFrame(rows, "cluster string, id long, score double")
        out = preference_pairs(df, "cluster", "id", "score", max_rejected_per_cluster=3)
        by_cluster = {}
        for r in out.collect():
            by_cluster.setdefault(r["cluster"], []).append(r)
        # cap: only the 3 hardest (highest-score) rejected survive
        c1 = sorted(by_cluster["c1"], key=lambda r: -r["rejected_score"])
        assert [r["rejected_id"] for r in c1] == [1, 2, 3]
        assert all(r["chosen_id"] == 0 and r["chosen_score"] == 10.0 for r in c1)
        assert c1[0]["margin"] == 1.0
        assert "solo" not in by_cluster
        (t,) = by_cluster["tie"]
        assert t["chosen_id"] == 10 and t["rejected_id"] == 11 and t["margin"] == 0.0


def test_kfold_assign_group_integrity(spark):
    from pyspark.sql import functions as F

    from vectordb_bioinsight_spark.operators.ml_pipeline import kfold_assign

    rows = [(i % 40, i) for i in range(400)]  # 40 groups x 10 rows
    df = spark.createDataFrame(rows, "grp long, row_id long")
    out = kfold_assign(df, "grp", n_folds=5)
    # every group maps to exactly one fold
    per_group = out.groupBy("grp").agg(F.count_distinct("fold").alias("nf"))
    assert per_group.filter(F.col("nf") != 1).count() == 0
    # all folds populated, deterministic across invocations
    folds = {r["fold"] for r in out.select("fold").distinct().collect()}
    assert folds == {0, 1, 2, 3, 4}
    again = {(r["grp"], r["fold"]) for r in
             kfold_assign(df, "grp", n_folds=5).select("grp", "fold").distinct().collect()}
    first = {(r["grp"], r["fold"]) for r in
             out.select("grp", "fold").distinct().collect()}
    assert again == first
