"""News prioritization: weighted scoring, categorization, headline pick.

The reference's ``NewsPrioritizer`` (bio-daily-briefing/src/
prioritizer.py:30-287) ranks the daily briefing's multi-source news
feed with a deterministic additive score — source weight + type weight
+ one-shot bonuses for hot keywords / big-pharma mentions / high-impact
journals / "first|breakthrough|novel" + a recency ladder — then buckets
items into regulatory/clinical/research/preprints and picks the
headline through a seven-tier preference ladder (approvals first,
safety warnings second, phase-3-positive third, ...).

Spark-first shape: the weight tables are broadcast-free literal maps
compiled into ONE ``when``-ladder expression per row; the bonus lists
are `exists` probes over array literals (first hit only, matching the
reference's ``break``); the headline pick is tier assignment + one
global top-1 (TakeOrderedAndProject, no full sort).

Deviations (documented): recency is measured against an explicit
``as_of`` date column/literal instead of ``datetime.now()`` (determinism
— the reference's wall-clock read is a harness hazard, not semantics);
score ties in ranking break on the id column (the reference's stable
sort keeps arbitrary input order); date parsing is STRICT zero-padded
ISO (yyyy-MM-dd) — the reference's strptime also accepts non-padded
'1998-6-1', which here scores no recency bonus like any other
unparseable date.

The keyword/company/journal lists are this engine's own selections of
the same PUBLIC entities the reference enumerates (trending drug
classes, largest pharmaceutical companies, highest-impact journals) —
overlap is inevitable because both name the canonical sets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "SOURCE_WEIGHTS",
    "TYPE_WEIGHTS",
    "HOT_KEYWORDS",
    "BIG_PHARMA",
    "HIGH_IMPACT_JOURNALS",
    "priority_scores",
    "categorize_news",
    "select_headline",
]

#: additive source weight (prioritizer.py:33-40); unknown source -> 20
SOURCE_WEIGHTS: "dict[str, int]" = {
    "FDA": 100,
    "ClinicalTrials": 80,
    "PubMed": 60,
    "bioRxiv": 50,
    "medRxiv": 50,
}

#: additive type weight (prioritizer.py:42-61); unknown type -> 10
TYPE_WEIGHTS: "dict[str, int]" = {
    "drug_approval": 150,
    "biologics_approval": 150,
    "rejection": 120,
    "safety_warning": 130,
    "designation": 80,
    "phase3_positive": 140,
    "phase3_negative": 130,
    "phase3_completed": 100,
    "new_trial": 70,
    "stopped": 110,
    "research": 50,
    "preprint": 40,
}

#: one-shot +30 (prioritizer.py:63-75) — trending drug classes/targets
HOT_KEYWORDS: "list[str]" = [
    "glp-1", "semaglutide", "tirzepatide",
    "crispr", "gene therapy", "gene editing",
    "car-t", "cell therapy", "mrna",
    "antibody-drug conjugate", "adc",
    "checkpoint inhibitor", "pd-1", "pd-l1",
    "bispecific", "obesity", "alzheimer",
    "first-in-class", "breakthrough", "novel",
]

#: one-shot +25 (prioritizer.py:77-82) — largest pharma companies
BIG_PHARMA: "list[str]" = [
    "pfizer", "novartis", "roche", "eli lilly", "lilly", "novo nordisk",
    "merck", "astrazeneca", "johnson & johnson", "sanofi", "gsk",
    "abbvie", "gilead", "amgen", "moderna", "biontech", "regeneron",
    "vertex", "bristol-myers",
]

#: one-shot +40 on the journal field (prioritizer.py:84-92)
HIGH_IMPACT_JOURNALS: "list[str]" = [
    "nature", "science", "cell", "lancet",
    "new england journal of medicine", "nejm", "jama", "bmj",
    "nature medicine", "nature biotechnology",
    "journal of clinical oncology", "blood", "circulation",
]


def _map_ladder(col: Column, table: "dict[str, int]", default: int) -> Column:
    out = F.lit(default)
    for k, v in table.items():
        out = F.when(col == k, F.lit(v)).otherwise(out)
    return out


def _any_contains(text: Column, terms: "list[str]") -> Column:
    arr = F.array(*[F.lit(t) for t in terms])
    return F.exists(arr, lambda t: F.contains(text, t))


def priority_scores(
    news: DataFrame,
    id_col: str,
    source_col: str,
    type_col: str,
    title_col: str,
    summary_col: str,
    journal_col: str,
    date_col: str,
    as_of: str,
) -> DataFrame:
    """calculate_priority (prioritizer.py:94-153) as one expression:
    source + type weights, the four one-shot bonuses, and the recency
    ladder against ``as_of`` (ISO date literal). Unparseable dates score
    no recency bonus, exactly like the reference's except-pass. Output:
    input columns + priority_score."""
    text = F.lower(
        F.concat_ws(
            " ",
            F.coalesce(F.col(title_col), F.lit("")),
            F.coalesce(F.col(summary_col), F.lit("")),
        )
    )
    score = _map_ladder(F.coalesce(F.col(source_col), F.lit("")), SOURCE_WEIGHTS, 20)
    score = score + _map_ladder(F.coalesce(F.col(type_col), F.lit("")), TYPE_WEIGHTS, 10)
    score = score + F.when(_any_contains(text, HOT_KEYWORDS), 30).otherwise(0)
    score = score + F.when(_any_contains(text, BIG_PHARMA), 25).otherwise(0)
    journal = F.lower(F.coalesce(F.col(journal_col), F.lit("")))
    score = score + F.when(_any_contains(journal, HIGH_IMPACT_JOURNALS), 40).otherwise(0)
    score = score + F.when(
        F.contains(text, F.lit("first"))
        | F.contains(text, F.lit("breakthrough"))
        | F.contains(text, F.lit("novel")),
        50,
    ).otherwise(0)
    days_old = F.datediff(
        F.lit(as_of).cast("date"),
        F.try_to_timestamp(F.substring(F.coalesce(F.col(date_col), F.lit("")), 1, 10),
                           F.lit("yyyy-MM-dd")).cast("date"),
    )
    # the <= ladders deliberately catch FUTURE dates too (days_old < 0
    # lands in the <= 1 branch), matching the reference's elif chain
    score = score + (
        F.when(days_old == 0, 30)
        .when(days_old <= 1, 20)
        .when(days_old <= 3, 10)
        .otherwise(0)
    )
    return news.withColumn("priority_score", score.cast("int"))


def categorize_news(news: DataFrame, source_col: str, type_col: str) -> Column:
    """The category ladder (categorize_news, prioritizer.py:245-287) as
    a column: FDA -> regulatory, ClinicalTrials -> clinical, bioRxiv/
    medRxiv or a 'preprint' type -> preprints, else research."""
    src = F.coalesce(F.col(source_col), F.lit(""))
    typ = F.lower(F.coalesce(F.col(type_col), F.lit("")))
    return (
        F.when(src == "FDA", "regulatory")
        .when(src == "ClinicalTrials", "clinical")
        .when(src.isin("bioRxiv", "medRxiv"), "preprints")
        .when(F.contains(typ, F.lit("preprint")), "preprints")
        .otherwise("research")
    )


def select_headline(
    scored: DataFrame, id_col: str, source_col: str, type_col: str
) -> DataFrame:
    """The seven-tier headline ladder (select_headline,
    prioritizer.py:170-243): FDA approvals > FDA warnings/rejections >
    phase-3 positives > any clinical > research > preprints > any
    regulatory. One tier column + one global top-1 (lowest tier, then
    highest priority, id tie-break) — TakeOrderedAndProject, never a
    full sort."""
    cat = categorize_news(scored, source_col, type_col)
    typ = F.lower(F.coalesce(F.col(type_col), F.lit("")))
    tier = (
        F.when((cat == "regulatory") & F.contains(typ, F.lit("approval")), 1)
        .when(
            (cat == "regulatory")
            & (
                F.contains(typ, F.lit("warning"))
                | F.contains(typ, F.lit("safety"))
                | F.contains(typ, F.lit("reject"))
            ),
            2,
        )
        .when((cat == "clinical") & F.contains(typ, F.lit("positive")), 3)
        .when(cat == "clinical", 4)
        .when(cat == "research", 5)
        .when(cat == "preprints", 6)
        .when(cat == "regulatory", 7)
    )
    return (
        scored.withColumn("tier", tier)
        .filter(F.col("tier").isNotNull())
        .orderBy(F.col("tier").asc(), F.col("priority_score").desc(), F.col(id_col).asc())
        .limit(1)
    )


#: common drug-name patterns (fda_fetcher.py:211-217) — first match wins
DRUG_PATTERNS: "list[str]" = [
    r"(semaglutide|tirzepatide|liraglutide)",
    r"(lecanemab|donanemab|aducanumab)",
    r"(pembrolizumab|nivolumab)",
]


def _title_words(s: Column) -> Column:
    """Per-whitespace-word title case (the engine's portable stand-in
    for str.title(); deviation documented in operators/paper_insights)."""
    return F.concat_ws(
        " ",
        F.transform(
            F.split(s, r"\s+", -1),
            lambda w: F.concat(F.upper(F.substring(w, 1, 1)), F.substring(w, 2, 2_000_000)),
        ),
    )


def classify_feed_items(
    feed: DataFrame, title_col: str, summary_col: str, feed_name_col: str
) -> DataFrame:
    """FDA feed-item classification + metadata extraction
    (fda_fetcher.py:173-222): the news-type keyword ladder over the
    lowered title (approvals split biologics/drug, warnings/recalls,
    rejections, designations, advisory; else the feed name), the first
    big-pharma company mention, and the first drug-name pattern hit —
    all scan-local expressions. Adds (news_type, company, drug_name)."""
    title = F.lower(F.coalesce(F.col(title_col), F.lit("")))
    text = F.lower(
        F.concat_ws(
            " ",
            F.coalesce(F.col(title_col), F.lit("")),
            F.coalesce(F.col(summary_col), F.lit("")),
        )
    )
    news_type = (
        F.when(
            F.contains(title, F.lit("approv")),
            F.when(
                F.contains(title, F.lit("biologic")) | F.contains(title, F.lit("bla")),
                "biologics_approval",
            ).otherwise("drug_approval"),
        )
        .when(
            F.contains(title, F.lit("warning"))
            | F.contains(title, F.lit("safety"))
            | F.contains(title, F.lit("recall")),
            "safety_warning",
        )
        .when(
            F.contains(title, F.lit("complete response")) | F.contains(title, F.lit("reject")),
            "rejection",
        )
        .when(
            F.contains(title, F.lit("breakthrough"))
            | F.contains(title, F.lit("fast track"))
            | F.contains(title, F.lit("accelerated")),
            "designation",
        )
        .when(
            F.contains(title, F.lit("advisory")) | F.contains(title, F.lit("committee")),
            "advisory",
        )
        .otherwise(F.col(feed_name_col))
    )
    company = F.lit("")
    for c in reversed(BIG_PHARMA):
        company = F.when(F.contains(text, F.lit(c)), _title_words(F.lit(c))).otherwise(company)
    drug = F.lit("")
    for p in reversed(DRUG_PATTERNS):
        got = F.regexp_extract(text, p, 1)
        drug = F.when(got != "", _title_words(got)).otherwise(drug)
    return feed.withColumns(
        {"news_type": news_type, "company": company, "drug_name": drug}
    )
