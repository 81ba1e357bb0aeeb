"""URL toolkit unit tests (operators/urls.py): normalization rules one by
one on hand-built URLs, the registered-domain cc-SLD approximation, and
the URL-keyed dedup contract. Catalog-level DuckDB parity for the same
expressions runs in test_oracle_parity (url_domain_stats, url_dedup_docs).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.urls import (
    extract_urls,
    normalize_url,
    registered_domain,
    url_dedup_docs,
    url_domain_stats,
    url_host,
)


def _norm(spark, url: str) -> str:
    return (
        spark.createDataFrame([(url,)], "u string")
        .select(normalize_url(F.col("u")).alias("n"))
        .first()["n"]
    )


@pytest.mark.parametrize(
    ("raw", "want"),
    [
        # case + port + www + trailing slash
        ("https://WWW.Example.COM:443/Articles/", "https://example.com/Articles"),
        # path case is PRESERVED (paths are case-sensitive; hosts are not)
        ("http://Host.ORG/CaseSensitive/Path", "http://host.org/CaseSensitive/Path"),
        # fragment dropped
        ("http://a.io/p#section-2", "http://a.io/p"),
        # tracking params dropped, real params kept, order preserved
        (
            "https://x.com/q?utm_source=feed&id=7&utm_medium=rss&v=3",
            "https://x.com/q?id=7&v=3",
        ),
        ("https://x.com/q?gclid=abc&fbclid=def&ref=tw", "https://x.com/q"),
        # bare host
        ("https://example.org", "https://example.org"),
        # empty query after '?' vanishes
        ("https://x.com/p?", "https://x.com/p"),
    ],
)
def test_normalize_url_rules(spark, raw, want):
    assert _norm(spark, raw) == want


@pytest.mark.parametrize(
    ("host", "want"),
    [
        ("example.com", "example.com"),
        ("news.example.com", "example.com"),
        ("a.b.news.example.com", "example.com"),
        ("blog.sample.co.uk", "sample.co.uk"),
        ("lab.phys.ac.jp", "phys.ac.jp"),
        # 'co' before a LONG tld is not a cc extension (co.com is registrable)
        ("shop.co.com", "co.com"),
        ("localhost", "localhost"),
        ("a.io", "a.io"),
    ],
)
def test_registered_domain(spark, host, want):
    got = (
        spark.createDataFrame([(host,)], "h string")
        .select(registered_domain(F.col("h")).alias("d"))
        .first()["d"]
    )
    assert got == want


def test_extract_urls_strips_glued_punctuation(spark):
    df = spark.createDataFrame(
        [(1, "see https://a.io/x. and http://b.co/y?z=1, done; no-url text")],
        "doc_id long, text string",
    )
    got = sorted(r["url"] for r in extract_urls(df, "doc_id", "text").collect())
    assert got == ["http://b.co/y?z=1", "https://a.io/x"]


def test_url_dedup_keeps_min_id_and_urlless_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "dup https://A.io/x?utm_source=a"),
            (2, "dup https://a.io/x"),  # same canonical as doc 1
            (3, "unique https://a.io/other"),
            (4, "no url here"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in url_dedup_docs(df, "doc_id", "text").collect())
    assert kept == [1, 3, 4]


def test_url_domain_stats_shape(spark):
    df = spark.createDataFrame(
        [
            (1, "x https://news.example.com/a and https://blog.example.com/b"),
            (2, "y https://example.com/a"),
            (3, "z http://other.org"),
        ],
        "doc_id long, text string",
    )
    rows = {r["domain"]: r for r in url_domain_stats(df, "doc_id", "text").collect()}
    assert rows["example.com"]["n_urls"] == 3
    assert rows["example.com"]["n_docs"] == 2
    assert rows["example.com"]["n_canonical"] == 3
    assert rows["other.org"]["n_urls"] == 1


def test_url_host_strips_port_and_www(spark):
    df = spark.createDataFrame([("https://WWW.X.dev:8443/p",)], "u string")
    assert df.select(url_host(F.col("u")).alias("h")).first()["h"] == "x.dev"


def test_url_ops_are_pure_projections(spark):
    """The extract+normalize tier must stay scan-local: no shuffle, no
    Python UDF in the optimized plan."""
    df = spark.createDataFrame([(1, "t https://a.io/x")], "doc_id long, text string")
    ext = extract_urls(df, "doc_id", "text").select(
        normalize_url(F.col("url")), registered_domain(url_host(F.col("url")))
    )
    plan = ext._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_filter_blocked_domains(spark):
    from vectordb_bioinsight_spark.operators.urls import filter_blocked_domains

    df = spark.createDataFrame(
        [
            (1, "ok https://news.example.com/a"),     # example.com blocked
            (2, "ok https://fine.org/b"),
            (3, "no links at all"),
            (4, "two https://fine.org/x and https://bad.co.uk/y"),  # one hit kills
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"]
        for r in filter_blocked_domains(
            df, ["example.com", "bad.co.uk"], "doc_id", "text"
        ).collect()
    )
    assert kept == [2, 3]


def test_filter_blocked_domains_broadcasts(spark):
    from vectordb_bioinsight_spark.operators.urls import filter_blocked_domains

    df = spark.createDataFrame([(1, "x https://a.io/p")], "doc_id long, text string")
    plan = (
        filter_blocked_domains(df, ["a.io"], "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
