"""PubMed efetch XML parsing — the deterministic parse layer of the S7
source family (``backend/app/core/web_crawler_agent.py:947-1053``,
``_parse_pubmed_xml`` / ``_parse_pubmed_article``). The HTTP fetch is the
declared boundary; the XML -> fields extraction is pure computation and
runs here as JVM ``xpath_*`` expressions over an xml string column — no
Python XML parsing on the hot path.

Field mapping (reference lines in parens):

* pmid (:971-975, articles without one are dropped), title with nested
  markup flattened (xpath ``string()`` semantics == ``itertext()``,
  :980-982), journal title (:1003-1005), year = first 4 chars of
  PubDate/Year (:1008-1014), doi / pmcid from the typed ArticleId list
  (:1016-1024), keywords and publication types joined ``' | '``
  (:1026-1038), authors as ``ForeName LastName`` (:996-1001), abstract
  sections joined with newlines, ``Label: text`` when labeled
  (:984-994).

Two documented seams vs the reference (both about per-node pairing,
which literal-path xpath cannot index dynamically): an Author missing a
ForeName drops the WHOLE row's author pairing to the positional zip (the
reference skips just that author), and a document mixing labeled and
unlabeled AbstractText sections falls back to all-unlabeled (the
reference labels per node). Feeds with uniform structure — which PubMed
efetch emits — parse identically; the port test pins both seams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_pubmed_articles(
    df: DataFrame, xml_col: str = "article_xml"
) -> DataFrame:
    """One PubmedArticle XML document per row -> the parsed field set.

    Scan-local: every field is one ``xpath``/``xpath_string`` expression;
    list fields come back pipe-joined (scalar-safe). Rows without a PMID
    are dropped, as the reference does.
    """
    x = F.col(xml_col)
    pmid = F.xpath_string(x, F.lit("//MedlineCitation//PMID"))
    title = F.xpath_string(x, F.lit("string(//Article//ArticleTitle)"))
    journal = F.xpath_string(x, F.lit("//Article//Journal/Title"))
    year_raw = F.xpath_string(x, F.lit("//Article//PubDate/Year"))
    year = F.when(
        F.substring(year_raw, 1, 4).rlike(r"^\d{4}$"),
        F.substring(year_raw, 1, 4).cast("int"),
    ).otherwise(F.lit(0))
    doi = F.xpath_string(x, F.lit("//ArticleId[@IdType='doi']"))
    pmcid = F.xpath_string(x, F.lit("//ArticleId[@IdType='pmc']"))
    keywords = F.array_join(
        F.xpath(x, F.lit("//MedlineCitation//Keyword/text()")), " | "
    )
    pub_types = F.array_join(
        F.xpath(x, F.lit("//Article//PublicationTypeList/PublicationType/text()")),
        " | ",
    )
    fore = F.xpath(x, F.lit("//Article//Author/ForeName/text()"))
    last = F.xpath(x, F.lit("//Article//Author/LastName/text()"))
    authors = F.when(
        F.size(fore) == F.size(last),
        F.array_join(
            F.zip_with(fore, last, lambda f, l: F.concat(f, F.lit(" "), l)), " | "
        ),
    ).otherwise(F.lit(""))
    abs_texts = F.xpath(x, F.lit("//Article//AbstractText/text()"))
    abs_labels = F.xpath(x, F.lit("//Article//AbstractText/@Label"))
    abstract = F.when(
        F.size(abs_labels) == F.size(abs_texts),
        F.array_join(
            F.zip_with(
                abs_labels, abs_texts, lambda lb, tx: F.concat(lb, F.lit(": "), tx)
            ),
            "\n",
        ),
    ).otherwise(F.array_join(abs_texts, "\n"))

    out = df.select(
        pmid.alias("pmid"),
        title.alias("title"),
        abstract.alias("abstract"),
        authors.alias("authors"),
        journal.alias("journal"),
        year.alias("year"),
        doi.alias("doi"),
        pmcid.alias("pmcid"),
        keywords.alias("keywords"),
        pub_types.alias("pub_types"),
    )
    return out.filter(F.col("pmid") != "").withColumn(
        "url", F.concat(F.lit("https://pubmed.ncbi.nlm.nih.gov/"), F.col("pmid"), F.lit("/"))
    )
