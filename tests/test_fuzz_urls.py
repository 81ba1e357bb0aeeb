"""Property-based cross-engine fuzz for the URL toolkit: random URLs
assembled from hostile components (mixed-case hosts, ports, www, nested
subdomains, cc-TLDs, tracking params, empty params, fragments, glued
punctuation, multiple URLs per doc) normalized by BOTH the Spark
expressions (operators/urls.py) and the DuckDB twin SQL
(plans/catalog_cleaning.py) and compared row-for-row — the same
discipline test_fuzz_cross_engine applies to the relational tier.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.urls import (
    extract_urls,
    normalize_url,
    registered_domain,
    url_host,
)
from vectordb_bioinsight_spark.plans.catalog_cleaning import (
    _CANON_SQL,
    _DOMAIN_SQL,
    _URL_PARTS_SQL,
)

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

label = st.sampled_from(["Example", "WWW", "blog", "CDN", "a", "x9", "news"])
tld = st.sampled_from(["com", "org", "co.uk", "io", "ac.jp", "dev", "co"])
host_strategy = st.builds(
    lambda labs, t: ".".join(labs + [t]),
    st.lists(label, min_size=1, max_size=3),
    tld,
)
param = st.sampled_from(
    ["utm_source=x", "utm_medium=rss", "id=7", "v=3", "gclid=z", "ref=t", "q=hello", ""]
)
url_strategy = st.builds(
    lambda scheme, host, port, segs, slashes, params, frag: (
        scheme
        + "://"
        + host
        + port
        + ("/" + "/".join(segs) if segs else "")
        + "/" * slashes
        + ("?" + "&".join(params) if params else "")
        + frag
    ),
    st.sampled_from(["http", "https"]),
    host_strategy,
    st.sampled_from(["", ":443", ":8080"]),
    st.lists(st.sampled_from(["Path", "p", "x1"]), min_size=0, max_size=2),
    st.integers(min_value=0, max_value=2),
    st.lists(param, min_size=0, max_size=3),
    st.sampled_from(["", "#frag", "#a:b"]),
)
doc_strategy = st.builds(
    lambda urls, punct: " see ".join([""] + [u + punct for u in urls]).strip(),
    st.lists(url_strategy, min_size=0, max_size=3),
    st.sampled_from(["", ".", ",", "!?", ";"]),
)


@given(docs=st.lists(doc_strategy, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_url_pipeline_matches_duckdb(spark, docs):
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    sdf = spark.createDataFrame(pdf)
    got = (
        extract_urls(sdf, "doc_id", "text")
        .select(
            "doc_id",
            normalize_url(F.col("url")).alias("canonical"),
            registered_domain(url_host(F.col("url"))).alias("domain"),
        )
        .toPandas()
        .sort_values(["doc_id", "canonical", "domain"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.execute(
        f"""
        WITH raw AS (
          SELECT doc_id, unnest(regexp_extract_all(text, 'https?://[^\\s<>"]+')) AS u0
          FROM docs
        ),
        u AS (SELECT doc_id, regexp_replace(u0, '[.,;:!?]+$', '') AS url FROM raw),
        parts AS ({_URL_PARTS_SQL} FROM u)
        SELECT doc_id, {_CANON_SQL} AS canonical, {_DOMAIN_SQL} AS domain
        FROM parts
        ORDER BY doc_id, canonical, domain
        """
    ).df().reset_index(drop=True)
    con.close()
    assert len(got) == len(want), f"{len(got)} Spark rows vs {len(want)} DuckDB"
    for col in ("doc_id", "canonical", "domain"):
        assert got[col].tolist() == want[col].tolist(), col
