"""PubMed XML parse (operators/pubmed_xml.py) — pinned against an
ElementTree port of web_crawler_agent.py:963-1053, including the two
documented positional-zip seams."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from vectordb_bioinsight_spark.operators.pubmed_xml import parse_pubmed_articles


def _port(xml_text):
    article = ET.fromstring(xml_text)
    medline = article.find(".//MedlineCitation")
    if medline is None:
        return None
    pmid_elem = medline.find(".//PMID")
    pmid = pmid_elem.text if pmid_elem is not None else ""
    if not pmid:
        return None
    article_elem = medline.find(".//Article")
    if article_elem is None:
        return None
    title_elem = article_elem.find(".//ArticleTitle")
    title = "".join(title_elem.itertext()) if title_elem is not None else ""
    abstract_parts = []
    for at in article_elem.findall(".//AbstractText"):
        label = at.get("Label", "")
        text = "".join(at.itertext()) or ""
        if label and text:
            abstract_parts.append(f"{label}: {text}")
        elif text:
            abstract_parts.append(text)
    abstract = "\n".join(abstract_parts)
    authors = []
    for author in article_elem.findall(".//Author"):
        ln, fn = author.find("LastName"), author.find("ForeName")
        if ln is not None and fn is not None:
            authors.append(f"{fn.text} {ln.text}")
    journal_elem = article_elem.find(".//Journal/Title")
    journal = journal_elem.text if journal_elem is not None else ""
    year = 0
    year_elem = article_elem.find(".//PubDate/Year")
    if year_elem is not None and year_elem.text:
        try:
            year = int(year_elem.text[:4])
        except ValueError:
            pass
    doi = pmcid = ""
    for id_elem in article.findall(".//ArticleId"):
        if id_elem.get("IdType") == "doi":
            doi = id_elem.text or ""
        elif id_elem.get("IdType") == "pmc":
            pmcid = id_elem.text or ""
    keywords = [kw.text for kw in medline.findall(".//Keyword") if kw.text]
    pub_types = [
        pt.text
        for pt in article_elem.findall(".//PublicationTypeList/PublicationType")
        if pt.text
    ]
    return {
        "pmid": pmid, "title": title, "abstract": abstract,
        "authors": " | ".join(authors), "journal": journal, "year": year,
        "doi": doi, "pmcid": pmcid, "keywords": " | ".join(keywords),
        "pub_types": " | ".join(pub_types),
        "url": f"https://pubmed.ncbi.nlm.nih.gov/{pmid}/",
    }


def _article(pmid="101", title="T <i>x</i> end", abstract="", authors="", year="2019",
             ids="", kws=""):
    return (
        "<PubmedArticle><MedlineCitation>"
        + (f"<PMID>{pmid}</PMID>" if pmid else "")
        + "<Article>"
        + f"<ArticleTitle>{title}</ArticleTitle>"
        + abstract
        + f"<AuthorList>{authors}</AuthorList>"
        + "<Journal><Title>J One</Title></Journal>"
        + f"<PubDate><Year>{year}</Year></PubDate>"
        + "<PublicationTypeList><PublicationType>Journal Article</PublicationType></PublicationTypeList>"
        + "</Article>"
        + kws
        + "</MedlineCitation><PubmedData>"
        + ids
        + "</PubmedData></PubmedArticle>"
    )


_CASES = [
    _article(pmid="101"),  # nested markup in title
    _article(
        pmid="102",
        abstract='<Abstract><AbstractText Label="AIM">a1</AbstractText>'
        '<AbstractText Label="RESULT">a2</AbstractText></Abstract>',
        authors="<Author><ForeName>Ann</ForeName><LastName>Lee</LastName></Author>"
        "<Author><ForeName>Bo</ForeName><LastName>Kim</LastName></Author>",
        ids='<ArticleId IdType="doi">10.1/x</ArticleId>'
        '<ArticleId IdType="pmc">PMC9</ArticleId>',
        kws="<KeywordList><Keyword>k1</Keyword><Keyword>k2</Keyword></KeywordList>",
    ),
    _article(pmid="103", abstract="<Abstract><AbstractText>plain</AbstractText></Abstract>"),
    _article(pmid="104", year="n.d."),  # invalid year -> 0
    _article(pmid=""),                  # dropped
]


def test_parse_matches_elementtree_port(spark):
    df = spark.createDataFrame([(x,) for x in _CASES], "article_xml string")
    got = {r["pmid"]: r.asDict() for r in parse_pubmed_articles(df).collect()}
    kept = 0
    for xml_text in _CASES:
        want = _port(xml_text)
        if want is None:
            continue
        kept += 1
        g = got[want["pmid"]]
        for k, v in want.items():
            assert g[k] == v, (want["pmid"], k, v, g[k])
    assert len(got) == kept  # the pmid-less article was dropped


def test_per_node_rules_match_reference(spark):
    # an author missing ForeName is skipped, the complete one kept —
    # the reference's exact per-author rule (the from_xml struct keeps
    # names paired per node; the old xpath zip seam is gone)
    mixed_authors = _article(
        pmid="201",
        authors="<Author><LastName>Solo</LastName></Author>"
        "<Author><ForeName>Ann</ForeName><LastName>Lee</LastName></Author>",
    )
    # mixed labeled/unlabeled abstracts label per node, exactly the
    # reference's branch
    mixed_abs = _article(
        pmid="202",
        abstract='<Abstract><AbstractText Label="AIM">a1</AbstractText>'
        "<AbstractText>a2</AbstractText></Abstract>",
    )
    df = spark.createDataFrame([(mixed_authors,), (mixed_abs,)], "article_xml string")
    got = {r["pmid"]: r.asDict() for r in parse_pubmed_articles(df).collect()}
    assert got["201"]["authors"] == _port(mixed_authors)["authors"] == "Ann Lee"
    assert got["202"]["abstract"] == _port(mixed_abs)["abstract"] == "AIM: a1\na2"
