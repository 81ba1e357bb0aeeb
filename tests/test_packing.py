"""Training-batch tier: sequence packing + data-mixture sampling
(operators/packing.py). Catalog-level DuckDB parity is covered by
test_oracle_parity; these tests pin the operator semantics on small frames
with hand-checkable answers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.packing import (
    mixture_weight_sample,
    pack_concat_chunk,
    pack_next_fit,
    packing_stats,
    with_token_counts,
)


@pytest.fixture(scope="module")
def docs(spark):
    # texts with known whitespace/BPE token counts
    rows = [
        (0, "a b c d", "s1"),          # 4 ws tokens
        (1, "e f g", "s1"),            # 3
        (2, "h i j k l m n o", "s2"),  # 8
        (3, "", "s2"),                 # 0
        (4, "p q r s t u", "s3"),      # 6
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_token_counts_ws(docs):
    out = {
        r["doc_id"]: r["n_tokens"]
        for r in with_token_counts(docs, "doc_id", "text", counter="ws").collect()
    }
    assert out == {0: 4, 1: 3, 2: 8, 3: 0, 4: 6}


def test_with_token_counts_rejects_unknown_counter(docs):
    with pytest.raises(ValueError):
        with_token_counts(docs, "doc_id", "text", counter="nope")


def test_concat_chunk_spans(docs):
    # one shard => a single global stream in doc_id order; seq_len 5
    packed = {
        r["doc_id"]: r.asDict()
        for r in pack_concat_chunk(
            docs, "doc_id", "text", seq_len=5, n_shards=1, counter="ws"
        ).collect()
    }
    # stream: doc0 tokens [0,4) seq0; doc1 [4,7) spans seq0-1; doc2 [7,15)
    # spans seq1-2; doc3 empty at 15 (seq3 start); doc4 [15,21) spans 3-4
    assert packed[0]["tok_start"] == 0 and packed[0]["seq_first"] == 0
    assert packed[0]["seq_last"] == 0
    assert packed[1]["tok_start"] == 4 and packed[1]["seq_first"] == 0
    assert packed[1]["seq_offset"] == 4 and packed[1]["seq_last"] == 1
    assert packed[2]["tok_start"] == 7 and packed[2]["seq_first"] == 1
    assert packed[2]["seq_last"] == 2
    # empty doc occupies no tokens: span collapses to its start position
    assert packed[3]["n_tokens"] == 0 and packed[3]["seq_first"] == packed[3]["seq_last"] == 3
    assert packed[4]["tok_start"] == 15 and packed[4]["seq_last"] == 4


def test_concat_chunk_shard_independence(docs):
    # multi-shard: tok_start restarts per shard, and every doc appears once
    packed = pack_concat_chunk(docs, "doc_id", "text", seq_len=5, n_shards=3, counter="ws")
    rows = packed.collect()
    assert sorted(r["doc_id"] for r in rows) == [0, 1, 2, 3, 4]
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for members in by_shard.values():
        members.sort(key=lambda r: r["doc_id"])
        assert members[0]["tok_start"] == 0
        acc = 0
        for m in members:
            assert m["tok_start"] == acc
            acc += m["n_tokens"]


def test_packing_stats(docs):
    packed = pack_concat_chunk(docs, "doc_id", "text", seq_len=5, n_shards=1, counter="ws")
    stats = packing_stats(packed, 5).collect()
    assert len(stats) == 1
    s = stats[0]
    # 21 tokens over 5 sequences of 5 => fill 21/25; docs 1, 2, 4 straddle
    assert s["n_docs"] == 5 and s["total_tokens"] == 21
    assert s["n_seqs"] == 5 and s["n_split_docs"] == 3
    assert s["fill_ratio"] == pytest.approx(21 / 25, abs=1e-6)


def test_next_fit_no_split(docs):
    out = {
        r["doc_id"]: r.asDict()
        for r in pack_next_fit(
            docs, "doc_id", "text", seq_len=8, n_shards=1, counter="ws"
        ).collect()
    }
    # doc0 (4) -> seq0 acc4; doc1 (3) -> seq0 acc7; doc2 (8) overflows -> seq1
    # acc8; doc3 (0) fits seq1; doc4 (6) overflows -> seq2
    assert out[0]["seq_id"] == 0 and out[1]["seq_id"] == 0
    assert out[2]["seq_id"] == 1 and not out[2]["truncated"]
    assert out[3]["seq_id"] == 1
    assert out[4]["seq_id"] == 2
    # a doc longer than seq_len gets its own sequence, flagged
    big = docs.sparkSession.createDataFrame(
        [(0, "x " * 9 + "x", "s")], "doc_id long, text string, source string"
    )
    r = pack_next_fit(big, "doc_id", "text", seq_len=8, n_shards=1, counter="ws").collect()[0]
    assert r["truncated"] and r["seq_id"] == 0


def test_next_fit_rejects_bad_params(docs):
    with pytest.raises(ValueError):
        pack_next_fit(docs, "doc_id", "text", seq_len=0)
    with pytest.raises(ValueError):
        pack_concat_chunk(docs, "doc_id", "text", seq_len=10, n_shards=0)


def test_mixture_integer_weights(docs):
    out = mixture_weight_sample(
        docs, "doc_id", "source", {"s1": 2.0, "s2": 0.0}, default_weight=1.0
    )
    rows = out.groupBy("source").agg(F.count("*").alias("n")).collect()
    by_src = {r["source"]: r["n"] for r in rows}
    # s1: 2 docs x2 copies; s2 dropped entirely; s3 default x1
    assert by_src == {"s1": 4, "s3": 1}
    # copy ids are 0-based and dense per doc
    copies = sorted(
        (r["doc_id"], r["copy_id"]) for r in out.filter(F.col("source") == "s1").collect()
    )
    assert copies == [(0, 0), (0, 1), (1, 0), (1, 1)]


def test_mixture_fractional_determinism(spark):
    # expected multiplicity of weight 1.5 over many keys ~ 1.5; exact set is
    # hash-deterministic (two runs identical)
    docs = spark.createDataFrame(
        [(i, "t", "s") for i in range(400)], "doc_id long, text string, source string"
    )
    a = mixture_weight_sample(docs, "doc_id", "source", {"s": 1.5}, salt=3)
    b = mixture_weight_sample(docs, "doc_id", "source", {"s": 1.5}, salt=3)
    na, nb = a.count(), b.count()
    assert na == nb
    assert 500 <= na <= 700  # 400*1.5 = 600 expected; hash-uniform tolerance
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_mixture_rejects_negative_weight(docs):
    with pytest.raises(ValueError):
        mixture_weight_sample(docs, "doc_id", "source", {"s1": -1.0})


def test_shuffle_shards_deterministic_and_complete(spark):
    from vectordb_bioinsight_spark.operators.packing import shuffle_shards

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = shuffle_shards(df, "doc_id", n_shards=8, salt=1).collect()
    b = shuffle_shards(df.repartition(13), "doc_id", n_shards=8, salt=1).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # complete cover, dense 0..k positions per shard
    assert len(a) == 500 and len({r["doc_id"] for r in a}) == 500
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    assert set(by_shard) == set(range(8))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    # a different salt yields a different order
    c = shuffle_shards(df, "doc_id", n_shards=8, salt=2).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_shard_manifest_order_independent(spark):
    """The xor fingerprints must be identical under any partitioning and
    must change when any doc's text changes."""
    from vectordb_bioinsight_spark.operators.packing import shard_manifest, shuffle_shards

    docs = spark.createDataFrame(
        [(i, f"doc text number {i} " * (1 + i % 3)) for i in range(40)],
        "doc_id long, text string",
    )
    sharded = shuffle_shards(docs, "doc_id", n_shards=4, salt=0)
    base = {r["shard"]: r for r in shard_manifest(sharded, "shard", "doc_id", "text").collect()}
    scrambled = sharded.repartition(13).sortWithinPartitions(F.desc("text"))
    again = {r["shard"]: r for r in shard_manifest(scrambled, "shard", "doc_id", "text").collect()}
    assert base == again
    mutated = sharded.withColumn(
        "text", F.when(F.col("doc_id") == 7, F.lit("changed")).otherwise(F.col("text"))
    )
    mm = {r["shard"]: r for r in shard_manifest(mutated, "shard", "doc_id", "text").collect()}
    changed_shard = sharded.filter(F.col("doc_id") == 7).first()["shard"]
    assert mm[changed_shard]["content_xor"] != base[changed_shard]["content_xor"]
    assert mm[changed_shard]["id_xor"] == base[changed_shard]["id_xor"]


def test_merge_shard_manifests_equals_full_rebuild(spark):
    """manifest(corpus ∪ batch) == merge(manifest(corpus), manifest(batch))
    — the algebra an ingest pipeline relies on; xor also UN-folds a
    retracted batch."""
    from vectordb_bioinsight_spark.operators.packing import (
        merge_shard_manifests,
        shard_manifest,
        shuffle_shards,
    )

    mk = lambda lo, hi: spark.createDataFrame(
        [(i, f"text {i} " * (1 + i % 4)) for i in range(lo, hi)],
        "doc_id long, text string",
    )
    corpus, batch = mk(0, 50), mk(50, 70)
    sh = lambda df: shuffle_shards(df, "doc_id", n_shards=4, salt=0)
    man = lambda df: shard_manifest(sh(df), "shard", "doc_id", "text")
    full = {r["shard"]: r for r in man(mk(0, 70)).collect()}
    merged = {
        r["shard"]: r
        for r in merge_shard_manifests(man(corpus), man(batch)).collect()
    }
    assert full == merged
    # retract the batch by folding it again, minus the additive counts
    unfolded = {
        r["shard"]: (r["content_xor"], r["id_xor"])
        for r in merge_shard_manifests(man(mk(0, 70)), man(batch)).collect()
    }
    want = {r["shard"]: (r["content_xor"], r["id_xor"]) for r in man(corpus).collect()}
    for s, pair in want.items():
        assert unfolded[s] == pair


def test_curriculum_shards_ordering_and_balance(spark):
    from vectordb_bioinsight_spark.operators.packing import curriculum_shards

    df = spark.createDataFrame(
        [(i, float((i * 37) % 100)) for i in range(200)],
        "doc_id long, score double",
    )
    out = curriculum_shards(df, "doc_id", "score", n_shards=4, salt=1).collect()
    by_shard: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["shard_pos"])):
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for rows in by_shard.values():
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores)  # easy-first within shard
        assert [r["shard_pos"] for r in rows] == list(range(len(rows)))
    # same salt ⇒ same assignment as shuffle_shards (only the order differs)
    from vectordb_bioinsight_spark.operators.packing import shuffle_shards

    a = {r["doc_id"]: r["shard"] for r in out}
    b = {
        r["doc_id"]: r["shard"]
        for r in shuffle_shards(df, "doc_id", n_shards=4, salt=1).collect()
    }
    assert a == b


def test_mixture_budget_plan_arithmetic(spark):
    from vectordb_bioinsight_spark.operators.packing import mixture_budget_plan

    docs = spark.createDataFrame(
        [("big", 1, "t"), ("tiny", 2, "t")], "source string, doc_id long, text string"
    )
    # explicit token counts: big has 1000 avail, tiny has 10
    counts = spark.createDataFrame(
        [("big", 1, 1000), ("tiny", 2, 10)],
        "source string, doc_id long, n_tokens long",
    )
    shares = spark.createDataFrame(
        [("big", 3.0), ("tiny", 1.0)], "source string, share double"
    )
    rows = {
        r["source"]: r
        for r in mixture_budget_plan(
            counts, "source", "text", 400, shares, max_epochs=2.0, token_col="n_tokens"
        ).collect()
    }
    # big: want 300 of 1000 -> rate 0.3 (0 epochs + 0.3 frac), not starved
    assert rows["big"]["want_tokens"] == 300 and rows["big"]["rate"] == 0.3
    assert rows["big"]["n_epochs"] == 0 and rows["big"]["sample_frac"] == 0.3
    assert rows["big"]["realized_tokens"] == 300 and not rows["big"]["starved"]
    # tiny: want 100 of 10 -> rate 10 capped at 2 epochs, starved
    assert rows["tiny"]["rate"] == 2.0 and rows["tiny"]["n_epochs"] == 2
    assert rows["tiny"]["sample_frac"] == 0.0
    assert rows["tiny"]["realized_tokens"] == 20 and rows["tiny"]["starved"]


def test_mixture_budget_plan_zero_token_source_is_starved(spark):
    """A source whose docs all tokenize to zero must come back starved with
    rate/realized 0 — not throw DIVIDE_BY_ZERO under the session's ANSI
    default (ADVICE r04)."""
    from vectordb_bioinsight_spark.operators.packing import mixture_budget_plan

    counts = spark.createDataFrame(
        [("ok", 1, 1000), ("empty", 2, 0)],
        "source string, doc_id long, n_tokens long",
    )
    shares = spark.createDataFrame(
        [("ok", 1.0), ("empty", 1.0)], "source string, share double"
    )
    rows = {
        r["source"]: r
        for r in mixture_budget_plan(
            counts, "source", "text", 400, shares, max_epochs=2.0, token_col="n_tokens"
        ).collect()
    }
    assert rows["empty"]["avail_tokens"] == 0
    assert rows["empty"]["rate"] == 0.0 and rows["empty"]["n_epochs"] == 0
    assert rows["empty"]["realized_tokens"] == 0
    assert rows["empty"]["starved"] is True
    assert rows["ok"]["starved"] is False and rows["ok"]["rate"] == 0.2


def test_next_fit_bins_matches_greedy_reference(spark):
    """Fold output == the textbook next-fit walk, incl. oversized items
    (own bin) and exact-fit boundaries (fill == target does NOT spill)."""
    import random

    from vectordb_bioinsight_spark.operators.packing import next_fit_bins

    rng = random.Random(9)
    rows = [("g", i, float(rng.choice([100, 400, 900, 1600]))) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, id long, size double")

    def greedy(sizes, target):
        fill, b, out = 0.0, 0, []
        for s in sizes:
            if fill + s > target and fill > 0:
                b, fill = b + 1, s
            else:
                fill += s
            out.append(b)
        return out

    expect = greedy([s for _, _, s in rows], 1500.0)
    got = {
        r["id"]: r["bin"]
        for r in next_fit_bins(df, ["g"], "id", "size", 1500.0).collect()
    }
    assert [got[i] for i in range(40)] == expect
    # oversized item 1600 sits alone: its bin contains exactly one item
    from collections import Counter

    per_bin = Counter(got[i] for i in range(40))
    for (_, i, s) in rows:
        if s > 1500.0:
            assert per_bin[got[i]] == 1


def test_next_fit_bins_exact_fit_boundary(spark):
    from vectordb_bioinsight_spark.operators.packing import next_fit_bins

    df = spark.createDataFrame(
        [("g", 1, 750.0), ("g", 2, 750.0), ("g", 3, 1.0)],
        "g string, id long, size double",
    )
    got = {r["id"]: r["bin"] for r in next_fit_bins(df, ["g"], "id", "size", 1500.0).collect()}
    assert got == {1: 0, 2: 0, 3: 1}  # 750+750 == target stays; +1 spills
