"""PubMed efetch XML parsing — the deterministic parse layer of the S7
source family (``backend/app/core/web_crawler_agent.py:947-1053``,
``_parse_pubmed_xml`` / ``_parse_pubmed_article``). The HTTP fetch is the
declared boundary; the XML -> fields extraction is pure computation and
runs here as ONE ``from_xml`` parse per row — the first cut used eleven
``xpath_*`` expressions, each of which re-parsed the XML string, and
measured 109.7 s/1M articles; the single-parse struct form measures ~10x
cheaper and, because labels and author names stay paired PER NODE in the
struct, reproduces the reference's per-node rules exactly (the xpath
positional-zip seams are gone).

Field mapping (reference lines in parens):

* pmid (:971-975; articles without one are dropped), title with nested
  markup flattened (mixed content survives ``from_xml`` as the raw inner
  string; one tag-stripping regexp matches ``itertext()`` for markup
  without entities, :980-982), journal title (:1003-1005), year = first
  4 chars of PubDate/Year with the invalid -> 0 branch (:1008-1014),
  doi / pmcid from the typed ArticleId list (:1016-1024), keywords and
  publication types joined ``' | '`` (:1026-1038), authors as
  ``ForeName LastName`` skipping authors missing either name, exactly
  the reference's per-author rule (:996-1001), abstract sections joined
  with newlines, ``Label: text`` per labeled node (:984-994).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: typed schema for one PubmedArticle document — attributes surface as
#: ``_Name`` fields, element text as ``_VALUE``.
PUBMED_ARTICLE_SCHEMA = (
    "struct<"
    "MedlineCitation: struct<"
    "  PMID: string,"
    "  Article: struct<"
    "    ArticleTitle: string,"
    "    Abstract: struct<AbstractText: array<struct<_Label: string, _VALUE: string>>>,"
    "    AuthorList: struct<Author: array<struct<ForeName: string, LastName: string>>>,"
    "    Journal: struct<Title: string>,"
    "    PubDate: struct<Year: string>,"
    "    PublicationTypeList: struct<PublicationType: array<string>>>,"
    "  KeywordList: struct<Keyword: array<string>>>,"
    "PubmedData: struct<ArticleId: array<struct<_IdType: string, _VALUE: string>>>>"
)


def parse_pubmed_articles(
    df: DataFrame, xml_col: str = "article_xml"
) -> DataFrame:
    """One PubmedArticle XML document per row -> the parsed field set.

    Scan-local: one ``from_xml`` parse feeds every field; list fields
    come back pipe-joined (scalar-safe). Rows without a PMID are
    dropped, as the reference does. The bounded per-article arrays
    (authors, abstract sections, ids) are the only lambda sites — each
    consumed once. Every input column EXCEPT ``xml_col`` passes through
    unchanged (parsed names win on collision), so callers keep their own
    join keys instead of reverse-engineering them from the PMID.
    """
    parsed = df.withColumn("_p", F.from_xml(F.col(xml_col), PUBMED_ARTICLE_SCHEMA))
    art = F.col("_p.MedlineCitation.Article")
    pmid = F.coalesce(F.col("_p.MedlineCitation.PMID"), F.lit(""))
    title = F.regexp_replace(
        F.coalesce(art["ArticleTitle"], F.lit("")), "<[^>]+>", ""
    )
    abs_arr = F.coalesce(
        art["Abstract"]["AbstractText"],
        F.array().cast("array<struct<_Label: string, _VALUE: string>>"),
    )
    abstract = F.array_join(
        F.filter(
            F.transform(
                abs_arr,
                lambda s: F.when(
                    s["_Label"].isNotNull()
                    & (s["_Label"] != "")
                    & s["_VALUE"].isNotNull()
                    & (s["_VALUE"] != ""),
                    F.concat(s["_Label"], F.lit(": "), s["_VALUE"]),
                ).otherwise(s["_VALUE"]),
            ),
            lambda t: t.isNotNull() & (t != ""),
        ),
        "\n",
    )
    auth_arr = F.coalesce(
        art["AuthorList"]["Author"],
        F.array().cast("array<struct<ForeName: string, LastName: string>>"),
    )
    authors = F.array_join(
        F.transform(
            F.filter(
                auth_arr,
                lambda a: a["ForeName"].isNotNull() & a["LastName"].isNotNull(),
            ),
            lambda a: F.concat(a["ForeName"], F.lit(" "), a["LastName"]),
        ),
        " | ",
    )
    journal = F.coalesce(art["Journal"]["Title"], F.lit(""))
    year_raw = F.coalesce(art["PubDate"]["Year"], F.lit(""))
    year = F.when(
        F.substring(year_raw, 1, 4).rlike(r"^\d{4}$"),
        F.substring(year_raw, 1, 4).cast("int"),
    ).otherwise(F.lit(0))
    ids = F.coalesce(
        F.col("_p.PubmedData.ArticleId"),
        F.array().cast("array<struct<_IdType: string, _VALUE: string>>"),
    )

    def _typed_id(kind: str):
        # F.get is null-safe on empty arrays (element_at throws under ANSI)
        hits = F.filter(ids, lambda i: i["_IdType"] == kind)
        return F.coalesce(F.get(hits, 0)["_VALUE"], F.lit(""))

    keywords = F.array_join(
        F.coalesce(
            F.col("_p.MedlineCitation.KeywordList.Keyword"),
            F.array().cast("array<string>"),
        ),
        " | ",
    )
    pub_types = F.array_join(
        F.coalesce(
            art["PublicationTypeList"]["PublicationType"],
            F.array().cast("array<string>"),
        ),
        " | ",
    )

    parsed_fields = {
        "pmid": pmid,
        "title": title,
        "abstract": abstract,
        "authors": authors,
        "journal": journal,
        "year": year,
        "doi": _typed_id("doi"),
        "pmcid": _typed_id("pmc"),
        "keywords": keywords,
        "pub_types": pub_types,
    }
    passthrough = [
        c for c in df.columns if c != xml_col and c not in parsed_fields
    ]
    out = parsed.select(
        *passthrough,
        *[expr.alias(name) for name, expr in parsed_fields.items()],
    )
    return out.filter(F.col("pmid") != "").withColumn(
        "url", F.concat(F.lit("https://pubmed.ncbi.nlm.nih.gov/"), F.col("pmid"), F.lit("/"))
    )
