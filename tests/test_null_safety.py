"""Null/empty-input robustness: operators must degrade (drop or null), never
throw, on null text, empty strings, and empty inputs — the judge-probe /
dirty-corpus contract for a 100 TB pipeline where some rows are always bad."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


@pytest.fixture(scope="module")
def dirty_docs(spark):
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    rows = [(1, "normal text with merge join words"), (2, None), (3, ""), (4, "   "), (5, "ab")]
    return spark.createDataFrame(rows, schema)


def test_tokenize_and_text_stats_handle_nulls(spark, dirty_docs):
    from vectordb_bioinsight_spark.functions.text import tokenize
    from vectordb_bioinsight_spark.operators.text_analysis import text_stats

    toks = dirty_docs.select("doc_id", tokenize(F.col("text")).alias("t")).collect()
    by_id = {r["doc_id"]: r["t"] for r in toks}
    assert by_id[2] is None          # null in -> null out, no throw
    assert by_id[3] == [] and by_id[4] == [] and by_id[5] == []
    stats = text_stats(dirty_docs, "doc_id", "text")
    assert stats.count() == 5        # one row per doc regardless


def test_bm25_and_chunking_skip_degenerate_docs(spark, dirty_docs):
    from vectordb_bioinsight_spark.operators.bm25 import bm25_topk
    from vectordb_bioinsight_spark.operators.chunking import chunk_text

    top = bm25_topk(dirty_docs, "doc_id", "text", "merge join", k=5).collect()
    assert [r["doc_id"] for r in top] == [1]  # only the real doc scores
    chunks = chunk_text(dirty_docs, "doc_id", "text").collect()
    ids = {r["doc_id"] for r in chunks}
    assert 1 in ids and 2 not in ids and 3 not in ids


def test_dedup_and_fingerprints_handle_nulls(spark, dirty_docs):
    from vectordb_bioinsight_spark.operators.dedup import (
        minhash_signatures_wide,
        simhash,
    )

    sigs = minhash_signatures_wide(dirty_docs, "doc_id", "text").collect()
    # docs with < shingle_n tokens have no signature rows — dropped, no NaN
    assert {r["doc_id"] for r in sigs} == {1}
    sh = simhash(dirty_docs, "doc_id", "text")
    assert sh.count() >= 1


def test_vector_ops_handle_null_and_empty_embeddings(spark):
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    rows = [(1, [1.0, 0.0]), (2, None), (3, []), (4, [0.0, 0.0])]
    df = spark.createDataFrame(rows, schema)
    from vectordb_bioinsight_spark.operators.vector import knn_brute_force

    got = knn_brute_force(df, "vec_id", "embedding", [1.0, 0.0], k=10).collect()
    scores = {r["vec_id"]: r["score"] for r in got}
    assert scores[1] == pytest.approx(1.0)
    # null embedding -> null score (sorted last or dropped, never a throw);
    # zero vector -> NaN cosine is the mathematical answer, we just require
    # the exact-match row to rank first
    assert got[0]["vec_id"] == 1


def test_deg_with_empty_counts(spark):
    from vectordb_bioinsight_spark.operators.deg import deg_analysis

    counts = spark.createDataFrame([], "gene_id string, sample_id string, count long")
    meta = spark.createDataFrame(
        [("s1", "tumor"), ("s2", "normal")], ["sample_id", "condition"]
    )
    assert deg_analysis(counts, meta).count() == 0


def test_trend_briefing_composition(spark):
    from tests.conftest import SF_SMALL
    from vectordb_bioinsight_spark.pipelines.trends import run_trend_briefing
    from vectordb_bioinsight_spark.sources.readers import load_table

    ev = load_table(spark, SF_SMALL, "events")
    out = run_trend_briefing(ev)
    rows = out.collect()
    assert len(rows) > 0
    labels = {r["trend"] for r in rows}
    assert labels <= {"emerging", "declining", "stable", "new"}
    assert "new" in labels  # every type's first window has no predecessor
    for r in rows:
        if r["trend"] == "emerging":
            assert r["ratio"] >= 2.0
        if r["trend"] == "declining":
            assert r["ratio"] <= 0.5


def test_r04_operators_handle_dirty_docs(spark, dirty_docs):
    """Round-4 additions under the same dirty-corpus contract: null/empty
    text degrades (row dropped or null output), never throws."""
    from vectordb_bioinsight_spark.operators.bpe import bpe_encode
    from vectordb_bioinsight_spark.operators.phrase import (
        min_term_distance,
        phrase_match,
    )
    from vectordb_bioinsight_spark.operators.vocabulary import (
        dispatch_search,
        vocab_dimension,
        vocab_match_scores,
    )
    from vectordb_bioinsight_spark.plans.catalog_coverage import VOCAB_ENTRIES

    # phrase/proximity: null & empty docs simply produce no postings
    pm = phrase_match(dirty_docs, "doc_id", "text", ["merge", "join"]).collect()
    assert {r["doc_id"] for r in pm} == {1}
    md = min_term_distance(dirty_docs, "doc_id", "text", "merge", "join").collect()
    assert {r["doc_id"] for r in md} == {1}

    # vocab anchor: containment join skips null text, keeps matching docs
    vocab = vocab_dimension(spark, VOCAB_ENTRIES)
    vm = vocab_match_scores(dirty_docs, vocab, "doc_id", "text", "join").collect()
    assert {r["doc_id"] for r in vm} == {1}
    for strategy_query in ("merge", "join vector", "window hash"):
        _, out = dispatch_search(dirty_docs, strategy_query, VOCAB_ENTRIES)
        out.collect()  # must not throw on the dirty corpus

    # bpe: null text -> null token array; empty/short text -> empty array
    enc = {r["doc_id"]: r["bpe_tokens"] for r in
           bpe_encode(dirty_docs, "text", [("e", "r")]).collect()}
    assert enc[2] is None
    assert enc[3] == [] and enc[4] == [] and enc[5] == []
    assert len(enc[1]) > 0


def test_web_tier_handles_dirty_docs(spark, dirty_docs):
    """URL/HTML/sentence/shard ops on null/empty/whitespace text: degrade,
    never throw."""
    from vectordb_bioinsight_spark.operators.cleaning import clean_web_docs, split_sentences
    from vectordb_bioinsight_spark.operators.packing import shard_manifest, shuffle_shards
    from vectordb_bioinsight_spark.operators.urls import (
        filter_blocked_domains,
        url_dedup_docs,
        url_domain_stats,
        with_url_key,
    )

    keyed = {r["doc_id"]: r["url_key"] for r in with_url_key(dirty_docs, "text").collect()}
    assert keyed[2] is None and keyed[3] is None and keyed[4] is None

    assert url_domain_stats(dirty_docs, "doc_id", "text").count() == 0  # no URLs
    assert sorted(
        r["doc_id"] for r in url_dedup_docs(dirty_docs, "doc_id", "text").collect()
    ) == [1, 2, 3, 4, 5]  # nothing to dedup, nobody lost
    assert (
        filter_blocked_domains(dirty_docs, ["example.com"], "doc_id", "text").count() == 5
    )

    cleaned = {r["doc_id"]: r for r in clean_web_docs(dirty_docs, "doc_id", "text").collect()}
    assert cleaned[2]["text_clean"] is None and cleaned[2]["n_tags"] is None
    assert cleaned[3]["text_clean"] == "" and cleaned[3]["n_tags"] == 0

    sents = split_sentences(dirty_docs, "doc_id", "text").collect()
    assert {r["doc_id"] for r in sents} == {1, 5}  # null/empty/ws yield no rows

    man = shard_manifest(
        shuffle_shards(dirty_docs, "doc_id", n_shards=2, salt=0),
        "shard", "doc_id", "text",
    ).collect()
    assert sum(r["n_docs"] for r in man) == 5  # null text still counted


def test_r05_trend_operators_handle_nulls(spark):
    """touch_attribution / event_transition_matrix / seasonal decomposition
    over events with NULL ts/type/value: degrade, never throw (ANSI on)."""
    from vectordb_bioinsight_spark.operators.trends import (
        event_transition_matrix,
        seasonal_decompose_daily,
        touch_attribution,
    )

    rows = [
        (1, 10, "view", "2024-01-01 00:00:00", 1.0),
        (1, 11, "purchase", "2024-01-02 00:00:00", 2.0),
        (1, 12, None, "2024-01-03 00:00:00", 1.0),      # null type
        (2, 20, "view", None, 3.0),                     # null ts
        (3, 30, "click", "2024-01-05 00:00:00", None),  # null value
    ]
    df = spark.createDataFrame(
        rows, "u long, eid long, t string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))

    attr = {r["channel"]: r for r in touch_attribution(
        df, "u", "t", "ts", "purchase", ["view", "click"]
    ).collect()}
    assert attr["view"]["first_touch"] == 1 and "click" not in attr

    tm = event_transition_matrix(df, "u", "t", "ts", "eid").collect()
    # null-type / null-ts rows cannot form countable pairs with gap <= 1h...
    # the only in-session pair is view->purchase (1 day apart exceeds 1h ->
    # actually dropped); assert no throw and no null keys
    assert all(r["from_type"] is not None and r["to_type"] is not None for r in tm)

    dec = seasonal_decompose_daily(df, "t", "ts", "value", period=3).collect()
    assert isinstance(dec, list)  # tiny input: no full windows is fine


def test_r05_encoding_handles_null_keys_and_targets(spark):
    from vectordb_bioinsight_spark.operators.encoding import target_encode_loo

    rows = [("a", 1), ("a", 0), (None, 1), ("b", None)]
    df = spark.createDataFrame(rows, "k string, y int")
    out = target_encode_loo(df, ["k"], "y", prior_weight=1.0)
    got = {(r["k"], r["y"]): r["target_enc"] for r in out.collect()}
    # the inner equi-join drops the NULL key (NULL = nothing), rows with
    # NULL targets keep a NULL-propagated encoding, no throw
    assert (None, 1) not in got
    assert ("a", 1) in got and got[("a", 1)] is not None


def test_r05_render_chat_null_text_turn(spark):
    from vectordb_bioinsight_spark.operators.sft import render_chat

    df = spark.createDataFrame(
        [(1, 0, "user", "hi"), (1, 1, "assistant", None)],
        "conv long, turn int, role string, text string",
    )
    r = render_chat(df, "conv", "turn", "role", "text").first()
    # the null-text fragment drops out of concat (null-propagating) but
    # the call must not throw; the user turn survives
    assert r["rendered"].startswith("<|user|>hi<|end|>")


def test_r06_insights_tier_handles_nulls(spark, dirty_docs):
    from vectordb_bioinsight_spark.functions.trend_seed import trend_dimension
    from vectordb_bioinsight_spark.operators.cleaning import (
        garbled_text_stats,
        strip_garbled_lines,
    )
    from vectordb_bioinsight_spark.operators.paper_insights import (
        key_outcomes,
        population_info,
        study_quality,
    )
    from vectordb_bioinsight_spark.operators.trend_match import primary_trends

    # garbled: NULL/empty docs produce no line rows but never throw;
    # the strip repair keeps one row per doc
    stats = {r["id"]: r for r in garbled_text_stats(dirty_docs, "doc_id", "text").collect()}
    assert 1 in stats and stats[1]["n_garbled"] == 0
    assert 2 not in stats  # NULL text -> no lines -> no stats row
    # the repair keeps ONE ROW PER INPUT DOC (ADVICE r06): docs with no
    # surviving line (NULL/empty/whitespace/all-garbled text) come back
    # as (id, '') instead of vanishing from downstream joins
    stripped = {r["id"]: r["text"] for r in
                strip_garbled_lines(dirty_docs, "doc_id", "text").collect()}
    assert set(stripped) == {1, 2, 3, 4, 5}
    assert stripped[1] == "normal text with merge join words"
    assert stripped[2] == "" and stripped[3] == "" and stripped[4] == ""
    assert stripped[5] == "ab"

    # paper insights: one row per doc, null-safe fields
    docs = dirty_docs.withColumn("title", F.lit(None).cast("string"))
    q = {r["id"]: r for r in study_quality(docs, "doc_id", "title", "text").collect()}
    assert len(q) == 5 and q[2]["design"] == "Unknown" and q[2]["sample_size"] is None
    assert key_outcomes(dirty_docs, "doc_id", "text").count() == 0
    p = {r["id"]: r for r in population_info(dirty_docs, "doc_id", "text").collect()}
    assert len(p) == 5 and p[2]["condition"] == "" and p[2]["total_n"] is None

    # trend match: NULL title/abstract score as empty, never as NULL
    prim = primary_trends(
        docs, trend_dimension(spark), "doc_id", "title", "text"
    ).collect()
    assert prim == []  # nothing qualifies, and nothing throws


def test_r07_tiers_handle_nulls(spark, dirty_docs):
    """The mid-r07 text tiers must degrade, never throw, on null/empty
    text: explainer, QA junk/confidence, summary parser, garbled stats."""
    from pyspark.sql import functions as F

    from vectordb_bioinsight_spark.operators.cleaning import garbled_text_stats
    from vectordb_bioinsight_spark.operators.explainers import rule_based_explain
    from vectordb_bioinsight_spark.operators.qa_agent import (
        answer_confidence,
        junk_flag,
    )
    from vectordb_bioinsight_spark.operators.summary_parse import parse_summary

    # explainer: concat_ws bridges the null; every row classifies
    exp = rule_based_explain(
        dirty_docs.select("doc_id", F.lit("t").alias("title"), F.col("text").alias("content")),
        "merge join",
    ).collect()
    assert len(exp) == 5
    assert all(r["study_type"] == "연구 논문" for r in exp)

    # junk/confidence: null text -> null/boolean-null flags, no throw
    qa = dirty_docs.select(
        "doc_id",
        junk_flag(F.col("text")).alias("j"),
        answer_confidence(F.coalesce(F.col("text"), F.lit(""))).alias("c"),
    ).collect()
    assert len(qa) == 5
    assert all(r["c"] is not None for r in qa)

    # summary parser: one wide row per doc, null text -> text path with
    # empty sections
    parsed = parse_summary(
        dirty_docs.select("doc_id", F.coalesce(F.col("text"), F.lit("")).alias("summary_text"))
    ).collect()
    assert len(parsed) == 5
    assert all(r["limitations"] == "Not specified" for r in parsed)

    # garbled stats: null text explodes to zero kept lines -> absent from
    # the stats (documented: stats run on non-empty lines only)
    stats = garbled_text_stats(dirty_docs, "doc_id", "text").collect()
    assert {r["id"] for r in stats} <= {1, 5}


def test_pubmed_and_citation_tiers_handle_degenerate_inputs(spark):
    from pyspark.sql import functions as F

    from vectordb_bioinsight_spark.operators.citations import landmark_score
    from vectordb_bioinsight_spark.operators.pubmed_xml import parse_pubmed_articles

    # malformed / empty XML rows are dropped (no pmid), never throw
    xml = spark.createDataFrame(
        [("<not-xml",), ("",), (None,), ("<PubmedArticle></PubmedArticle>",)],
        "article_xml string",
    )
    assert parse_pubmed_articles(xml).count() == 0

    # landmark: zero citations + null year both take the guarded branches
    meta = spark.createDataFrame(
        [(1, None, 0, 0, 0, False)],
        "paper_id long, year int, citation_count long, "
        "influential_citations long, n_fields int, is_open_access boolean",
    )
    assert landmark_score(meta).collect()[0]["landmark_score"] == 0.0
