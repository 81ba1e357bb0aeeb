"""URL extraction, normalization, and domain accounting — the web-corpus
hygiene tier every crawl-derived training pipeline runs before anything
else (CCNet shards by domain; C4 and Gopher apply URL/domain blocklists;
RefinedWeb dedups by normalized URL before content dedup, because a
canonical-URL match is the cheapest duplicate signal there is).

Everything here is a pure JVM projection (regexp + array expressions) —
no UDF, no shuffle until the caller aggregates, so the whole tier rides
the same corpus scan as the other scan-local text gates.

Reference parity note: the reference keeps source URLs as metadata on
ingested papers (backend/app/api/routes/crawler.py:48,406 accepts and
stores `url` fields verbatim — DOI/PubMed/PMC URLs) but never normalizes
them; this module is the scale-out generalization that makes URL-keyed
dedup well-defined.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: raw URL token — scheme through the first whitespace/angle/quote; kept
#: deliberately identical on the DuckDB side (catalog twin) so both
#: engines extract the same spans
URL_RX = 'https?://[^\\s<>"]+'

#: trailing sentence punctuation glued to a URL by prose ("see http://x.")
TRAIL_RX = "[.,;:!?]+$"

#: query parameters that identify a CLICK, not a resource — dropping them
#: is what makes URL-equality a duplicate signal (RefinedWeb §3.1 does the
#: same before URL dedup)
TRACKING_PARAM_RX = "^(utm_[a-z]+|fbclid|gclid|ref)="

#: second-level labels that act as TLD extensions (co.uk, com.au, ac.jp…):
#: when the host ends in <label>.<2-letter-cc>, the registered domain is
#: three labels, not two. A deliberate, documented approximation of the
#: public-suffix list — deterministic and dependency-free.
_CC_SLD = ("ac", "co", "com", "edu", "gov", "net", "org")


def url_scheme(url: Column) -> Column:
    """Lower-cased scheme ('http' / 'https')."""
    return F.lower(F.regexp_extract(url, "^(https?)://", 1))


def url_host(url: Column) -> Column:
    """Lower-cased host with the port and a leading 'www.' stripped."""
    hostport = F.lower(F.regexp_extract(url, "^https?://([^/?#]+)", 1))
    return F.regexp_replace(F.regexp_replace(hostport, ":[0-9]+$", ""), "^www\\.", "")


def url_path(url: Column) -> Column:
    """Path component (no query/fragment), trailing slashes stripped."""
    path = F.regexp_extract(url, "^https?://[^/?#]+([^?#]*)", 1)
    return F.regexp_replace(path, "/+$", "")


def url_query_filtered(url: Column) -> Column:
    """Query string with tracking parameters removed, original order and
    separators preserved ('' when nothing survives)."""
    q = F.regexp_extract(url, "\\?([^#]*)", 1)
    kept = F.filter(
        F.split(q, "&"),
        lambda p: (~p.rlike(TRACKING_PARAM_RX)) & (p != F.lit("")),
    )
    return F.array_join(kept, "&")


def normalize_url(url: Column) -> Column:
    """Canonical form: lower scheme+host, no port, no 'www.', no fragment,
    no trailing path slash, tracking params dropped. Two page loads that
    differ only in click provenance normalize to the SAME string — the
    property URL-keyed dedup needs."""
    qn = url_query_filtered(url)
    return F.concat(
        url_scheme(url),
        F.lit("://"),
        url_host(url),
        url_path(url),
        F.when(qn != "", F.concat(F.lit("?"), qn)).otherwise(F.lit("")),
    )


def registered_domain(host: Column) -> Column:
    """The registrable domain of a host: last two labels, or last THREE
    when the second-to-last is a cc-TLD extension label (co.uk, ac.jp —
    see ``_CC_SLD``). Hosts with fewer than three labels pass through as
    their last two (or themselves)."""
    labels = F.split(host, "\\.")
    two = F.array_join(F.slice(labels, -2, 2), ".")
    three = F.array_join(F.slice(labels, -3, 3), ".")
    is_cc = (
        (F.size(labels) >= 3)
        & F.element_at(labels, -2).isin(*_CC_SLD)
        & (F.length(F.element_at(labels, -1)) == 2)
    )
    return F.when(F.size(labels) <= 1, host).otherwise(F.when(is_cc, three).otherwise(two))


def extract_urls(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per URL occurrence: (id, url) with glued sentence
    punctuation stripped. Scan-local (regexp_extract_all + explode)."""
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_RX), F.lit(0))
    return df.select(
        F.col(id_col),
        F.explode(urls).alias("_raw"),
    ).select(
        id_col,
        F.regexp_replace(F.col("_raw"), TRAIL_RX, "").alias("url"),
    )


def url_domain_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-registered-domain corpus accounting: URL occurrences, distinct
    docs, distinct canonical URLs — the table a domain blocklist / shard
    planner reads. One scan-local extract+normalize projection, one
    domain-keyed map-side-combinable groupBy.

    Output: (domain, n_urls, n_docs, n_canonical), ordered n_urls DESC.
    """
    u = extract_urls(df, id_col, text_col).select(
        F.col(id_col),
        normalize_url(F.col("url")).alias("canonical"),
        registered_domain(url_host(F.col("url"))).alias("domain"),
    )
    return (
        u.groupBy("domain")
        .agg(
            F.count("*").cast("long").alias("n_urls"),
            F.countDistinct(id_col).cast("long").alias("n_docs"),
            F.countDistinct("canonical").cast("long").alias("n_canonical"),
        )
        .orderBy(F.desc("n_urls"), F.asc("domain"))
    )


def url_dedup_docs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """URL-keyed document dedup (RefinedWeb stage 1): keep the lowest-id
    document per canonical first-URL; docs with no URL all survive.
    The dedup key is the canonical URL's 64-bit hash — 8 bytes shuffled
    per doc, never the text."""
    keyed = with_url_key(df, text_col, "_ukey")
    winners = (
        keyed.filter(F.col("_ukey").isNotNull())
        .groupBy("_ukey")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    no_url = keyed.filter(F.col("_ukey").isNull()).select(id_col)
    keep = winners.unionByName(no_url)
    return df.join(keep, id_col, "left_semi")


def with_url_key(df: DataFrame, text_col: str, out_col: str = "url_key") -> DataFrame:
    """Adds the 64-bit canonical-first-URL key (NULL when the text has no
    URL) — computed ONCE at ingest and persisted, so every later
    URL-dedup pass is a join on an 8-byte column instead of a corpus
    re-extraction."""
    from vectordb_bioinsight_spark.functions.hashing import portable_hash64

    first_url = F.regexp_replace(
        F.regexp_extract(F.col(text_col), URL_RX, 0), TRAIL_RX, ""
    )
    return df.withColumn(
        out_col,
        F.when(first_url == "", F.lit(None).cast("long")).otherwise(
            portable_hash64(normalize_url(first_url))
        ),
    )


def filter_blocked_domains(
    df: DataFrame,
    blocklist: DataFrame | list[str],
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Drop documents whose text links to ANY blocked registrable domain
    (the C4/Gopher blocklist gate). The blocklist is a dimension —
    broadcast; the doc side is the scan-local extract+domain projection;
    the whole gate is one broadcast left-anti join, no corpus shuffle.

    ``blocklist``: a one-column DataFrame (``domain``) or a plain list of
    registrable domains.
    """
    spark = df.sparkSession
    if not isinstance(blocklist, DataFrame):
        blocklist = spark.createDataFrame([(d,) for d in blocklist], "domain string")
    hit_docs = (
        extract_urls(df, id_col, text_col)
        .select(F.col(id_col), registered_domain(url_host(F.col("url"))).alias("domain"))
        .join(F.broadcast(blocklist.select("domain").distinct()), "domain", "left_semi")
        .select(id_col)
        .distinct()
    )
    return df.join(hit_docs, id_col, "left_anti")
