"""Catalog entries for the corpus-cleaning tier (operators/cleaning.py).

PII redaction, C4-style line-quality filtering, and Dolma-style global line
dedup, each hash-checked against a DuckDB twin on the synthetic `documents`
table. The synthetic corpus has no newlines and no real PII, so:

* `pii_redact` PLANTS deterministic PII (email/phone/IP/SSN derived from
  doc_id) identically on both engines, then checks the detection counts and
  the md5 of the masked text — the regex machinery is what is under test;
* the line ops derive deterministic fixed-width 6-token "lines"
  (`operators.cleaning.token_lines`) identically on both engines — the
  word-soup corpus gives a healthy mix of dropped short/degenerate lines
  and cross-document duplicate lines (measured: ~212 duplicated 6-token
  lines, max doc-frequency 7, at sf0.01).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_bioinsight_spark.functions.hashing import PORTABLE_HASH64_DUCKDB
from vectordb_bioinsight_spark.operators.cleaning import (
    PII_PATTERNS,
    global_line_dedup,
    line_quality_flags,
    reassemble_documents,
    redact_pii,
    token_lines,
)
from vectordb_bioinsight_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# pii_redact
# ---------------------------------------------------------------------------


def _plant_pii(docs):
    """Append deterministic doc_id-derived PII to every document (and a
    second email to every third doc, so counts are not constant)."""
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com tel 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit("-1234 host 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 id 123-45-6789"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" cc a@b.io")).otherwise(F.lit("")),
        ).alias("text"),
    )


def q_pii_redact(spark, sf_dir):
    """PII detection + masking (C4/Dolma hygiene tier): counts per kind on
    the original text, md5 of the fully masked text. Pure JVM projection —
    see operators/cleaning.py:redact_pii."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    red = redact_pii(_plant_pii(docs), "doc_id", "text")
    return red.select(
        "doc_id",
        "n_email",
        "n_phone",
        "n_ipv4",
        "n_ssn",
        F.md5("text_redacted").alias("redacted_md5"),
    )


_PLANT_SQL = (
    "text || ' contact u' || doc_id::VARCHAR || '@example.com tel 555-' || "
    "lpad((doc_id % 10000)::VARCHAR, 4, '0') || '-1234 host 10.0.' || "
    "(doc_id % 256)::VARCHAR || '.7 id 123-45-6789' || "
    "CASE WHEN doc_id % 3 = 0 THEN ' cc a@b.io' ELSE '' END"
)

_E_RX, _E_MASK = PII_PATTERNS["email"]
_P_RX, _P_MASK = PII_PATTERNS["phone"]
_I_RX, _I_MASK = PII_PATTERNS["ipv4"]
_S_RX, _S_MASK = PII_PATTERNS["ssn"]

_REDACT_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace(t, "
    + f"'{_E_RX}', '{_E_MASK}', 'g'), "
    + f"'{_P_RX}', '{_P_MASK}', 'g'), "
    + f"'{_I_RX}', '{_I_MASK}', 'g'), "
    + f"'{_S_RX}', '{_S_MASK}', 'g')"
)

SQL_PII_REDACT = f"""
WITH p AS (
  SELECT doc_id, {_PLANT_SQL} AS t FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(t, '{_E_RX}'))::INT AS n_email,
       len(regexp_extract_all(t, '{_P_RX}'))::INT AS n_phone,
       len(regexp_extract_all(t, '{_I_RX}'))::INT AS n_ipv4,
       len(regexp_extract_all(t, '{_S_RX}'))::INT AS n_ssn,
       md5({_REDACT_SQL}) AS redacted_md5
FROM p
"""

# ---------------------------------------------------------------------------
# line_quality_stats
# ---------------------------------------------------------------------------

_WPL = 6  # words per synthetic line
_MIN_WORDS = 4
_MAX_SHARE = 0.5


def q_line_quality_stats(spark, sf_dir):
    """C4-style line filtering over deterministic 6-token lines: per-doc
    kept/total counts. Rules: >=4 words, no banned substring, modal token
    <= half the line. See operators/cleaning.py:line_quality_flags."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    lines = token_lines(docs, "doc_id", "text", _WPL)
    flagged = line_quality_flags(lines, min_words=_MIN_WORDS, max_top_token_share=_MAX_SHARE)
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.round(F.sum(F.col("keep").cast("double")) / F.count("*"), 6).alias("kept_ratio"),
    )


_LINES_CTE = f"""
d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
l AS (
  SELECT doc_id, i::INT AS line_no, toks[(i*{_WPL}+1):((i+1)*{_WPL})] AS ltoks
  FROM d, unnest(generate_series(0, CAST(ceil(len(toks)/{_WPL}.0) AS INT) - 1)) AS t(i)
),
nz AS (
  SELECT doc_id, line_no, ltoks, len(ltoks) AS n_words,
         array_to_string(ltoks, ' ') AS line
  FROM l WHERE trim(array_to_string(ltoks, ' ')) <> ''
)"""

SQL_LINE_QUALITY_STATS = f"""
WITH {_LINES_CTE},
tok AS (SELECT doc_id, line_no, unnest(ltoks) AS tok FROM nz),
tc AS (
  SELECT doc_id, line_no, max(cnt) AS max_cnt FROM (
    SELECT doc_id, line_no, tok, count(*) AS cnt FROM tok GROUP BY doc_id, line_no, tok
  ) GROUP BY doc_id, line_no
),
flag AS (
  SELECT nz.doc_id,
         CASE WHEN n_words >= {_MIN_WORDS}
               AND NOT (lower(line) LIKE '%javascript%'
                        OR lower(line) LIKE '%lorem ipsum%'
                        OR line LIKE '%{{%')
               AND max_cnt::DOUBLE / n_words <= {_MAX_SHARE}
              THEN 1 ELSE 0 END AS keep
  FROM nz JOIN tc USING (doc_id, line_no)
)
SELECT doc_id, count(*)::BIGINT AS n_lines, sum(keep)::BIGINT AS n_kept,
       round(sum(keep)::DOUBLE / count(*), 6) AS kept_ratio
FROM flag GROUP BY doc_id
"""

# ---------------------------------------------------------------------------
# line_dedup_global
# ---------------------------------------------------------------------------

_MAX_DF = 2


def q_line_dedup_global(spark, sf_dir):
    """Dolma-style global line dedup over the same 6-token lines: drop lines
    present in > 2 distinct docs, reassemble in order, hash the result.
    Shuffle keys are 8-byte line hashes — see operators/cleaning.py:
    global_line_dedup."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    lines = token_lines(docs, "doc_id", "text", _WPL)
    survivors = global_line_dedup(lines, max_doc_freq=_MAX_DF)
    rebuilt = reassemble_documents(survivors)
    return rebuilt.select(
        "doc_id", "n_lines_kept", F.md5("text_clean").alias("clean_md5")
    )


_LINE_KEY = PORTABLE_HASH64_DUCKDB.format(expr="lower(trim(line))")

SQL_LINE_DEDUP_GLOBAL = f"""
WITH {_LINES_CTE},
freq AS (
  SELECT {_LINE_KEY} AS k, count(DISTINCT doc_id) AS df
  FROM nz GROUP BY 1
),
surv AS (
  SELECT doc_id, line_no, line FROM nz
  WHERE {_LINE_KEY} NOT IN (SELECT k FROM freq WHERE df > {_MAX_DF})
)
SELECT doc_id, count(*)::BIGINT AS n_lines_kept,
       md5(string_agg(line, chr(10) ORDER BY line_no)) AS clean_md5
FROM surv GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# domain_boilerplate — CCNet-style per-source boilerplate removal
# ---------------------------------------------------------------------------

# The synthetic corpus has no newlines, so the fixture PLANTS newline-
# delimited source-derived footers identically on both engines:
#   * every doc: a copyright footer        -> 100% of source docs -> cut
#   * every doc_id % 2 == 0: a subscribe   -> ~50% of source docs -> cut
#   * every doc_id % 5 == 0: an editor     ->  20% of source docs -> KEPT
# With min_docs=2, max_doc_frac=0.3 the op must cut exactly the first two
# and keep the third plus every (unique) original body line.
_BOILER_MIN_DOCS = 2
_BOILER_FRAC = 0.3


def _plant_footers(docs):
    return docs.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.lit("\nall rights reserved by "),
            F.col("source"),
            F.lit(" inc"),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(F.lit("\nsubscribe to the "), F.col("source"), F.lit(" newsletter")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.lit("\neditor pick from "), F.col("source"), F.lit(" team")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


def q_domain_boilerplate(spark, sf_dir):
    """Per-domain boilerplate line removal (CCNet/Dolma hygiene tier): lines
    in >= 2 docs AND > 30% of the SAME source's docs are cut; the 20%-
    frequency planted line and all unique body lines survive. Shuffle keys
    are (source, 8-byte line hash) — see operators/cleaning.py:
    domain_boilerplate_dedup."""
    from vectordb_bioinsight_spark.operators.cleaning import (
        domain_boilerplate_dedup,
        split_lines,
    )

    docs = load_table(spark, sf_dir, "documents")
    planted = _plant_footers(docs)
    lines = split_lines(planted, "doc_id", "text").join(
        planted.select("doc_id", "source"), "doc_id"
    )
    survivors = domain_boilerplate_dedup(
        lines, "source", min_docs=_BOILER_MIN_DOCS, max_doc_frac=_BOILER_FRAC
    )
    rebuilt = reassemble_documents(survivors.select("doc_id", "line_no", "line"))
    return rebuilt.select(
        "doc_id", "n_lines_kept", F.md5("text_clean").alias("clean_md5")
    )


_FOOTER_PLANT_SQL = (
    "text || chr(10) || 'all rights reserved by ' || source || ' inc' || "
    "CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'subscribe to the ' || source || ' newsletter' ELSE '' END || "
    "CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'editor pick from ' || source || ' team' ELSE '' END"
)

_BLINE_KEY = PORTABLE_HASH64_DUCKDB.format(expr="lower(trim(line))")

SQL_DOMAIN_BOILERPLATE = f"""
WITH p AS (
  SELECT doc_id, source, {_FOOTER_PLANT_SQL} AS t FROM documents
), arr AS (
  SELECT doc_id, source, string_split(t, chr(10)) AS ls FROM p
), l AS (
  SELECT doc_id, source, unnest(range(0, len(ls)))::INT AS line_no,
         unnest(ls) AS line
  FROM arr
), nz AS (
  SELECT * FROM l WHERE trim(line) <> ''
), f AS (
  SELECT source, {_BLINE_KEY} AS k, count(DISTINCT doc_id) AS df
  FROM nz GROUP BY 1, 2
), sd AS (
  SELECT source, count(DISTINCT doc_id) AS n FROM nz GROUP BY 1
), boiler AS (
  SELECT f.source, f.k FROM f JOIN sd USING (source)
  WHERE df >= {_BOILER_MIN_DOCS} AND df > {_BOILER_FRAC} * n
), surv AS (
  SELECT doc_id, line_no, line FROM nz
  WHERE NOT EXISTS (
    SELECT 1 FROM boiler b
    WHERE b.source = nz.source AND b.k = {_BLINE_KEY}
  )
)
SELECT doc_id, count(*)::BIGINT AS n_lines_kept,
       md5(string_agg(line, chr(10) ORDER BY line_no)) AS clean_md5
FROM surv GROUP BY doc_id
"""


def q_span_cut_docs(spark, sf_dir):
    """Apply step of ExactSubstr dedup: cut every cross-doc repeated 8-gram
    span (catalog `repeated_spans`) out of every doc's normalized token
    stream (aggressive mode). Runs the FUSED detect+cut chain — one corpus
    scan + one tokenizer pass shared by both stages via a disk-spillable
    persisted token projection (the r02 plan tokenized twice)."""
    from vectordb_bioinsight_spark.operators.cleaning import span_cut_docs

    docs = load_table(spark, sf_dir, "documents")
    return span_cut_docs(docs, "doc_id", "text", n=8, min_docs=2)


def _sql_span_cut_docs() -> str:
    from vectordb_bioinsight_spark.plans.catalog_text import SQL_REPEATED_SPANS, _TOK3

    return f"""
WITH spans AS ({SQL_REPEATED_SPANS}),
toks AS (
  SELECT doc_id, unnest(range(0, len(tk)))::BIGINT AS pos, unnest(tk) AS tok
  FROM (SELECT doc_id, {_TOK3} AS tk FROM documents)
), kept AS (
  SELECT t.doc_id, t.pos, t.tok FROM toks t
  WHERE NOT EXISTS (
    SELECT 1 FROM spans s
    WHERE s.doc_id = t.doc_id AND t.pos BETWEEN s.span_start AND s.span_end
  )
), total AS (
  -- from the input rows, not the exploded stream: zero-token docs must
  -- still appear in the output as (id, '', 0, 0) — mirrors the operator
  SELECT doc_id, len({_TOK3})::BIGINT AS n_tokens FROM documents
), rebuilt AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
         count(*)::BIGINT AS n_kept
  FROM kept GROUP BY 1
)
SELECT t.doc_id, coalesce(r.clean_text, '') AS clean_text, t.n_tokens,
       (t.n_tokens - coalesce(r.n_kept, 0))::BIGINT AS n_removed
FROM total t LEFT JOIN rebuilt r USING (doc_id)
"""


SQL_SPAN_CUT_DOCS = _sql_span_cut_docs()


# ---------------------------------------------------------------------------
# url_domain_stats / url_dedup_docs — web-corpus URL hygiene (operators/urls.py)
# ---------------------------------------------------------------------------
# The synthetic corpus has no URLs, so both entries PLANT deterministic
# doc_id-derived URLs (mixed case, ports, www, tracking params, fragments,
# cc-TLDs, glued punctuation) identically on both engines — the
# normalization machinery is what is under test.


def _plant_urls(docs):
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" see https://WWW.Example.COM:443/Articles/"),
                    (F.col("doc_id") % 40).cast("string"),
                    F.lit("/?utm_source=feed&id="),
                    (F.col("doc_id") % 7).cast("string"),
                ),
            )
            .when(
                F.col("doc_id") % 5 == 1,
                F.concat(
                    F.lit(" via http://blog.sample.co.uk/post/"),
                    (F.col("doc_id") % 25).cast("string"),
                    F.lit("#frag"),
                ),
            )
            .when(F.col("doc_id") % 5 == 2, F.lit(" at https://cdn.assets.org/lib.js?v=3&gclid=xyz."))
            .when(F.col("doc_id") % 5 == 3, F.lit(" from https://news.example.com/today/"))
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" and https://example.org")).otherwise(F.lit("")),
        ).alias("text"),
    )


_PLANT_URL_SQL = (
    "text || CASE doc_id % 5 "
    "WHEN 0 THEN ' see https://WWW.Example.COM:443/Articles/' || (doc_id % 40)::VARCHAR || '/?utm_source=feed&id=' || (doc_id % 7)::VARCHAR "
    "WHEN 1 THEN ' via http://blog.sample.co.uk/post/' || (doc_id % 25)::VARCHAR || '#frag' "
    "WHEN 2 THEN ' at https://cdn.assets.org/lib.js?v=3&gclid=xyz.' "
    "WHEN 3 THEN ' from https://news.example.com/today/' "
    "ELSE '' END || "
    "CASE WHEN doc_id % 3 = 0 THEN ' and https://example.org' ELSE '' END"
)


def q_url_domain_stats(spark, sf_dir):
    """Per-registered-domain URL accounting (CCNet/RefinedWeb hygiene
    stage): extract, canonicalize (case, port, www, fragment, trailing
    slash, tracking params), registrable-domain rollup — see
    operators/urls.py."""
    from vectordb_bioinsight_spark.operators.urls import url_domain_stats

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return url_domain_stats(_plant_urls(docs), "doc_id", "text")


# DuckDB twins of the operators/urls.py expressions (same regexes, same
# cc-SLD approximation)
_URL_PARTS_SQL = """
  SELECT doc_id,
    lower(regexp_extract(url, '^(https?)://', 1)) AS scheme,
    regexp_replace(regexp_replace(lower(regexp_extract(url, '^https?://([^/?#]+)', 1)), ':[0-9]+$', ''), '^www\\.', '') AS host,
    regexp_replace(regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1), '/+$', '') AS path,
    array_to_string(list_filter(string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                    x -> NOT regexp_matches(x, '^(utm_[a-z]+|fbclid|gclid|ref)=') AND x <> ''), '&') AS q
"""

_CANON_SQL = "scheme || '://' || host || path || CASE WHEN q <> '' THEN '?' || q ELSE '' END"

_DOMAIN_SQL = """
  CASE WHEN len(string_split(host, '.')) <= 1 THEN host
       WHEN len(string_split(host, '.')) >= 3
            AND string_split(host, '.')[-2] IN ('ac','co','com','edu','gov','net','org')
            AND length(string_split(host, '.')[-1]) = 2
       THEN array_to_string(string_split(host, '.')[-3:], '.')
       ELSE array_to_string(string_split(host, '.')[-2:], '.') END
"""

SQL_URL_DOMAIN_STATS = f"""
WITH p AS (SELECT doc_id, {_PLANT_URL_SQL} AS t FROM documents),
raw AS (
  SELECT doc_id, unnest(regexp_extract_all(t, 'https?://[^\\s<>"]+')) AS u0 FROM p
),
u AS (SELECT doc_id, regexp_replace(u0, '[.,;:!?]+$', '') AS url FROM raw),
parts AS ({_URL_PARTS_SQL} FROM u),
canon AS (
  SELECT doc_id, {_CANON_SQL} AS canonical, {_DOMAIN_SQL} AS domain FROM parts
)
SELECT domain, count(*)::BIGINT AS n_urls, count(DISTINCT doc_id)::BIGINT AS n_docs,
       count(DISTINCT canonical)::BIGINT AS n_canonical
FROM canon GROUP BY domain
ORDER BY n_urls DESC, domain
"""


def q_url_dedup_docs(spark, sf_dir):
    """URL-keyed document dedup (RefinedWeb stage 1): one survivor per
    canonical first-URL, URL-less docs all pass — the cheapest duplicate
    signal, run before any content dedup."""
    from vectordb_bioinsight_spark.operators.urls import url_dedup_docs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    out = url_dedup_docs(_plant_urls(docs).join(docs.select("doc_id", "source"), "doc_id"), "doc_id", "text")
    return out.select("doc_id", "source").orderBy("doc_id")


SQL_URL_DEDUP_DOCS = f"""
WITH p AS (SELECT doc_id, {_PLANT_URL_SQL} AS t FROM documents),
first_u AS (
  SELECT doc_id, regexp_replace(regexp_extract(t, 'https?://[^\\s<>"]+', 0), '[.,;:!?]+$', '') AS url
  FROM p
),
parts AS ({_URL_PARTS_SQL} FROM first_u WHERE url <> ''),
canon AS (SELECT doc_id, {_CANON_SQL} AS canonical FROM parts),
winners AS (SELECT min(doc_id) AS doc_id FROM canon GROUP BY canonical),
keep AS (
  SELECT doc_id FROM winners
  UNION ALL
  SELECT doc_id FROM first_u WHERE url = ''
)
SELECT d.doc_id, d.source FROM documents d JOIN keep USING (doc_id)
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# web_clean_docs — HTML strip + entity decode + mojibake repair
# (operators/cleaning.py: strip_html / fix_mojibake / clean_web_docs)
# ---------------------------------------------------------------------------
# The corpus is plain text, so the entry PLANTS deterministic HTML wrapping
# and mojibake damage identically on both engines; under test are the
# strip/decode/repair chains themselves (regexes restricted to the RE2
# subset, literal replaces in one pinned order).


def _plant_html(docs):
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("<p>"),
            F.col("text"),
            F.lit("</p>"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(
                    F.lit('<script type="text/javascript">var x=1;</script><b>bold&amp;strong</b> rank &lt;'),
                    (F.col("doc_id") % 9).cast("string"),
                    F.lit("&gt;"),
                ),
            )
            .when(F.col("doc_id") % 4 == 1, F.lit("<!-- nav --><br/>they&#39;re here&nbsp;now"))
            .when(F.col("doc_id") % 4 == 2, F.lit("<style>.a{color:red}</style>donâ€™t say â€œhiâ€“byeâ€"))
            .otherwise(F.lit(" cafÃ© naÃ¯ve resumÃ©")),
        ).alias("text"),
    )


_PLANT_HTML_SQL = (
    "'<p>' || text || '</p>' || CASE doc_id % 4 "
    "WHEN 0 THEN '<script type=\"text/javascript\">var x=1;</script><b>bold&amp;strong</b> rank &lt;' || (doc_id % 9)::VARCHAR || '&gt;' "
    "WHEN 1 THEN '<!-- nav --><br/>they&#39;re here&nbsp;now' "
    "WHEN 2 THEN '<style>.a{color:red}</style>donâ€™t say â€œhiâ€“byeâ€' "
    "ELSE ' cafÃ© naÃ¯ve resumÃ©' END"
)


def q_web_clean_docs(spark, sf_dir):
    """Web-text repair chain: tag counts, HTML→plain with entity decode,
    mojibake fix — the projection every crawl-derived corpus runs before
    any quality gate reads the text."""
    from vectordb_bioinsight_spark.operators.cleaning import clean_web_docs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = clean_web_docs(_plant_html(docs), "doc_id", "text")
    return out.select(
        "doc_id", "n_tags", "mojibake_fixed", F.md5("text_clean").alias("clean_md5")
    )


def _sql_web_clean() -> str:
    from vectordb_bioinsight_spark.operators.cleaning import HTML_ENTITIES, MOJIBAKE_MAP

    strip = "regexp_replace(t, '(?is)<script[^>]*>.*?</script>', '', 'g')"
    strip = f"regexp_replace({strip}, '(?is)<style[^>]*>.*?</style>', '', 'g')"
    strip = f"regexp_replace({strip}, '(?s)<!--.*?-->', '', 'g')"
    strip = f"regexp_replace({strip}, '(?i)<br\\s*/?>|</p\\s*>', chr(10), 'g')"
    strip = f"regexp_replace({strip}, '<[^>]+>', '', 'g')"
    for ent, ch in HTML_ENTITIES:
        e, c = ent.replace("'", "''"), ch.replace("'", "''")
        strip = f"replace({strip}, '{e}', '{c}')"
    strip = f"regexp_replace({strip}, '[ \\t]+', ' ', 'g')"
    strip = f"regexp_replace({strip}, '^\\s+|\\s+$', '', 'g')"
    fixed = "stripped"
    for bad, good in MOJIBAKE_MAP:
        b, g = bad.replace("'", "''"), good.replace("'", "''")
        fixed = f"replace({fixed}, '{b}', '{g}')"
    return f"""
WITH p AS (SELECT doc_id, {_PLANT_HTML_SQL} AS t FROM documents),
s AS (
  SELECT doc_id,
         len(regexp_extract_all(t, '<[^>]+>'))::INT AS n_tags,
         {strip} AS stripped
  FROM p
)
SELECT doc_id, n_tags,
       CASE WHEN {fixed} <> stripped THEN 1 ELSE 0 END::INT AS mojibake_fixed,
       md5({fixed}) AS clean_md5
FROM s
"""


SQL_WEB_CLEAN_DOCS = _sql_web_clean()


# ---------------------------------------------------------------------------
# sentence_split_docs — abbreviation-aware sentence segmentation
# (operators/cleaning.py: split_sentences)
# ---------------------------------------------------------------------------
# The corpus has no punctuation, so the entry PLANTS sentences with
# abbreviations, multiple terminators, and an unterminated tail fragment.


def _plant_sentences(docs):
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("Intro number "),
            (F.col("doc_id") % 6).cast("string"),
            F.lit(". Dr. Smith et al. said e.g. it works!  Right? "),
            F.substring(F.col("text"), 1, 30 + (F.col("doc_id") % 20).cast("int")),
        ).alias("text"),
    )


_PLANT_SENT_SQL = (
    "'Intro number ' || (doc_id % 6)::VARCHAR || "
    "'. Dr. Smith et al. said e.g. it works!  Right? ' || "
    "substr(text, 1, 30 + (doc_id % 20))"
)


def q_sentence_split_docs(spark, sf_dir):
    """Sentence segmentation (protect-split-restore, RE2-portable): one
    row per sentence with contiguous 0-based sent_no; abbreviations keep
    their periods, the unterminated tail survives as a fragment."""
    from vectordb_bioinsight_spark.operators.cleaning import split_sentences

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return split_sentences(_plant_sentences(docs), "doc_id", "text")


def _sql_sentence_split() -> str:
    from vectordb_bioinsight_spark.operators.cleaning import SENTENCE_ABBREVIATIONS

    prot = "t"
    for abbr in SENTENCE_ABBREVIATIONS:
        a = abbr.replace("'", "''")  # escape quotes FIRST, then splice the
        # chr(1) concat pieces so they stay SQL, not literal text
        repl = "'" + a.replace(".", "' || chr(1) || '") + "'"
        prot = f"replace({prot}, '{a}', {repl})"
    return f"""
WITH p AS (SELECT doc_id, {_PLANT_SENT_SQL} AS t FROM documents),
arr AS (
  SELECT doc_id,
         list_filter(
           list_transform(regexp_extract_all({prot}, '[^.!?]+[.!?]*'),
                          s -> trim(replace(s, chr(1), '.'))),
           s -> s <> '') AS sents
  FROM p
)
SELECT doc_id,
       unnest(range(0, len(sents)))::BIGINT AS sent_no,
       unnest(sents) AS sentence
FROM arr
"""


SQL_SENTENCE_SPLIT_DOCS = _sql_sentence_split()


_GARBLE_LINE = "lfsr pdbgk clfs jcj sosrh fsrg hTh"


def q_garbled_docs(spark, sf_dir):
    """Per-document garbled-text (TeX-font mojibake) profile
    (operators/cleaning.py::garbled_text_stats — the reference's
    GarbledTextDetector scoring, pdf_parser.py:116-206, as one JVM
    expression tree): the scanned-ingest triage view that decides
    re-OCR-vs-drop before text reaches the quality ladder. The synthetic
    corpus is clean, so every 7th doc gets one planted TeX-garble line —
    the DETECTION branch earns driver-hash coverage, not just the
    all-clean verdict."""
    from vectordb_bioinsight_spark.operators.cleaning import garbled_text_stats

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit("\n" + _GARBLE_LINE)),
        ).otherwise(F.col("text")),
    )
    return garbled_text_stats(docs, "doc_id", "text")


def _sql_garbled() -> str:
    from vectordb_bioinsight_spark.operators.cleaning import (
        GARBLED_PATTERNS,
        _UNUSUAL_SEQ,
    )

    strip = r"^[.,;:()\[\]{}]+|[.,;:()\[\]{}]+$"
    wl = f"lower(regexp_replace(w, '{strip}', '', 'g'))"
    pats = "|".join(GARBLED_PATTERNS)
    # the word-score CASE tree; DuckDB lambdas have no let-binding, so the
    # stripped-lowered word expression repeats inline
    word_score = f"""(
      CASE WHEN length({wl}) >= 2 THEN
        (CASE WHEN length({wl}) >= 4
              AND length(regexp_replace({wl}, '[^b-df-hj-np-tv-z]', '', 'g')) > 0
              AND (length({wl}) - length(regexp_replace({wl}, '[aeiou]', '', 'g')))::DOUBLE
                  / length({wl}) < 0.15
         THEN 2 ELSE 0 END)
        + (CASE WHEN regexp_matches({wl}, '{pats}') THEN 3 ELSE 0 END)
        + (CASE WHEN length(w) >= 3 AND regexp_matches(w, '[a-z][A-Z][a-z]')
           THEN 2 ELSE 0 END)
      ELSE 0 END)"""
    return f"""
WITH src AS (
  SELECT doc_id AS id,
         CASE WHEN doc_id % 7 = 0 THEN text || chr(10) || '{_GARBLE_LINE}'
              ELSE text END AS text
  FROM documents
), lines AS (
  SELECT id, regexp_replace(l, '^\\s+|\\s+$', '', 'g') AS t
  FROM (SELECT id, unnest(string_split(text, chr(10))) AS l FROM src)
  WHERE length(regexp_replace(l, '^\\s+|\\s+$', '', 'g')) > 0
), flagged AS (
  SELECT id,
         (length(t) >= 10 AND (
            list_sum(list_transform(
              list_filter(string_split_regex(t, '\\s+'), w -> length(w) > 0),
              w -> {word_score}
            ))::DOUBLE
            / greatest(len(list_filter(string_split_regex(t, '\\s+'), w -> length(w) > 0)), 1)
            > 0.3
            OR len(regexp_extract_all(t, '{_UNUSUAL_SEQ}')) >= 2
         )) AS g
  FROM lines
)
SELECT id, count(*)::BIGINT AS n_lines,
       sum(g::INT)::BIGINT AS n_garbled,
       round(sum(g::INT)::DOUBLE / count(*), 6) AS garbled_frac
FROM flagged GROUP BY id
"""


SQL_GARBLED_DOCS = _sql_garbled()
