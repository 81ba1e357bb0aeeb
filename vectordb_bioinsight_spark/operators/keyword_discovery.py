"""Dynamic keyword discovery: n-gram extraction, ranking, growth split.

The reference's dynamic-trends surface (backend/app/api/routes/
dynamic_trends.py:75-505) discovers trending keywords WITHOUT a
predefined list: 1-3-gram candidates from lowered, punctuation-cleaned
text (unigrams past a stopword wall, bigrams unless BOTH words are
stopwords, trigrams only around priority terms), a meaningfulness
filter (min count, no digits, no 4-char shorts, no bigram stopwords, no
stopword-boundary n-grams unless a priority term rides inside, 2x score
boost for priority terms), and a two-period growth split (emerging
> +30%, declining < -30%, else stable; zero-baseline growth is +100
when present now, emerging also when strictly new or > +50).

Spark-first shape: counting is one keyword groupBy and the growth split
is a full-outer join of two period count tables. Candidate generation
has TWO equivalent kernels (property-pinned identical in
tests/test_keyword_discovery.py): the pure-expression tree
(:func:`extract_keywords` — split + filtered transforms over the token
array) and the Arrow-batched :func:`extract_keywords_arrow`, which is
the default in :func:`keyword_counts`. The expression tree is the
exception to "built-ins first": every closure here is an interpreted
HOF (CodegenFallback, no CSE), and the r08 A/B measured the Arrow
kernel 7.2x faster (4.68 s -> 0.65 s per 50k docs, identical output) —
a python set lookup beats an interpreted 120-way alternation regex per
word. The stopword/priority tables ride in array literals / a broadcast
frozenset (KB-scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "BIO_STOPWORDS",
    "PRIORITY_TERMS",
    "BIGRAM_STOPWORDS",
    "extract_keywords",
    "extract_keywords_arrow",
    "keyword_counts",
    "meaningful_keywords",
    "keyword_growth",
]

#: the discovery stopword wall (dynamic_trends.py:75-109 tiers)
BIO_STOPWORDS = {
    "the", "and", "for", "with", "this", "that", "from", "were", "was", "are",
    "been", "have", "has", "had", "will", "would", "could", "should", "may",
    "can", "not", "but", "all", "some", "any", "each", "more", "most", "other",
    "than", "then", "only", "also", "such", "both", "into", "over", "after",
    "before", "between", "through", "during", "under", "about", "however",
    "these", "those", "their", "there", "here", "where", "when", "which",
    "while", "being", "because", "very", "well", "first", "second",
    "study", "studies", "analysis", "results", "result", "effect", "effects",
    "role", "using", "based", "novel", "new", "recent", "review", "case",
    "report", "reports", "patients", "patient", "treatment", "treatments",
    "clinical", "data", "group", "method", "methods", "approach", "research",
    "findings", "outcomes", "outcome", "associated", "association",
    "relationship", "impact", "evidence", "showed", "model", "models",
    "development", "evaluation", "assessment", "compared", "total", "mean",
    "average", "median", "standard", "significantly",
    "disease", "diseases", "disorder", "disorders", "syndrome", "condition",
    "therapy", "therapies", "diagnosis", "prognosis", "risk", "factor",
    "factors", "mechanism", "mechanisms", "pathway", "pathways",
    "high", "low", "increased", "decreased", "human", "animal", "cell",
    "cells", "tissue", "tissues", "level", "levels", "expression", "higher",
    "activity", "function", "potential", "significant", "important", "lower",
    "conclusion", "conclusions", "background", "objective", "objectives",
    "purpose", "aim", "aims", "introduction", "abstract", "keywords",
}

#: terms that force trigram capture and double a keyword's score
#: (dynamic_trends.py:111-124 — the field's canonical technology list)
PRIORITY_TERMS = {
    "crispr", "car-t", "mrna", "single-cell", "spatial", "organoid",
    "multiomics", "proteomics", "metabolomics", "epigenomics",
    "machine learning", "deep learning", "artificial intelligence",
    "neural network", "transformer", "foundation model",
    "immunotherapy", "checkpoint", "microbiome", "gut-brain",
    "liquid biopsy", "ctdna", "exosome", "nanoparticle",
    "gene editing", "base editing", "prime editing",
}

#: bigram stopword phrases (dynamic_trends.py:166-172)
BIGRAM_STOPWORDS = {
    "in the", "of the", "to the", "on the", "for the", "at the",
    "and the", "is the", "was the", "are the", "be the", "by the",
    "as the", "it is", "we have", "we found", "our study", "this study",
    "in this", "of this", "to this", "in our", "of our",
}


def _arr(terms) -> Column:
    return F.array(*[F.lit(t) for t in sorted(terms)])


def extract_keywords(text: Column, min_length: int = 3) -> Column:
    """extract_keywords_from_text (dynamic_trends.py:127-159) as one
    expression: lower + strip [^\\w\\s-] + split; unigrams past the
    stopword wall, bigrams unless both halves are stopwords (and >= 6
    chars), trigrams only when a priority term appears inside. Returns
    the keyword array WITH multiplicity (the reference appends).

    Perf shape (probed at 50k docs, re-shaped r07): stopword membership
    is ONE anchored alternation regex per word, evaluated ONCE into a
    flag array; the whole build runs inside a transform-over-a-SINGLETON
    let-binding that evaluates the token array, the flag array and the
    re-joined text exactly once per row — interpreted HOFs get no
    common-subexpression elimination, so the previous shape re-tokenized
    the document for every slice (and a naive doc-level priority
    prefilter would re-tokenize 26x, once per probed term — measured,
    it DOUBLED the runtime before the binding). The trigram priority
    sweep is two-stage (VERDICT r06 task 4): the 26 contains probes run
    once per doc against the re-joined words (every trigram is a
    substring of that re-join, so a trigram hit implies a doc hit), and
    prio-positive docs sweep only the matched-term SUBSET (typically 1-2
    terms) via a second nested singleton binding; priority-free docs
    skip the trigram build entirely."""
    import re as _re

    prio = _arr(PRIORITY_TERMS)
    stop_re = "^(?:" + "|".join(_re.escape(s) for s in sorted(BIO_STOPWORDS)) + ")$"
    cleaned = F.regexp_replace(F.lower(F.coalesce(text, F.lit(""))), r"[^\w\s-]", " ")
    words_expr = F.filter(F.split(cleaned, r"\s+", -1), lambda w: F.length(w) > 0)
    ctx = F.array(
        F.struct(
            words_expr.alias("w"),
            F.transform(
                words_expr,
                lambda w: F.struct(w.alias("w"), w.rlike(stop_re).alias("s")),
            ).alias("t"),
            F.concat_ws(" ", words_expr).alias("j"),
        )
    )

    def _build(c: Column) -> Column:
        words, toks, joined = c["w"], c["t"], c["j"]
        unis = F.filter(
            F.transform(
                toks,
                lambda x: F.when((F.length(x["w"]) >= min_length) & ~x["s"], x["w"]),
            ),
            lambda w: w.isNotNull(),
        )
        n = F.size(words)
        bigrams = F.filter(
            F.zip_with(
                F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: F.when(
                    ~a["s"] | ~b["s"], F.concat_ws(" ", a["w"], b["w"])
                ),
            ),
            lambda g: g.isNotNull() & (F.length(g) >= 6),
        )
        tri_all = F.zip_with(
            F.zip_with(
                F.slice(words, 1, F.greatest(n - 2, F.lit(0))),
                F.slice(words, 2, F.greatest(n - 2, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
            F.slice(words, 3, F.greatest(n - 2, F.lit(0))),
            lambda ab, c2: F.concat_ws(" ", ab, c2),
        )
        trigrams = F.flatten(
            F.transform(
                F.array(F.filter(prio, lambda p: F.contains(joined, p))),
                lambda dp: F.when(
                    F.size(dp) > 0,
                    F.filter(
                        tri_all, lambda t: F.exists(dp, lambda p: F.contains(t, p))
                    ),
                ).otherwise(F.array().cast("array<string>")),
            )
        )
        return F.concat(unis, bigrams, trigrams)

    return F.flatten(F.transform(ctx, _build))


def extract_keywords_arrow(text: Column, min_length: int = 3) -> Column:
    """Arrow-batched twin of :func:`extract_keywords` — IDENTICAL output
    (property-pinned in tests/test_keyword_discovery.py; sample-verified
    on the live corpus), ~7x the throughput (module docstring A/B). The
    per-word stopword probe is a python frozenset lookup instead of the
    interpreted anchored-alternation regex, and the n-gram slices are
    list windows instead of interpreted zip_with chains.

    Locale caveat: python ``str.lower`` + ``re.ASCII`` classes match the
    Java defaults the expression kernel uses; the divergence surface is
    the same locale-sensitive unicode casing already documented on
    functions/text.tokenize (out of the portable contract)."""
    import re as _re

    stop = frozenset(BIO_STOPWORDS)
    prio = sorted(PRIORITY_TERMS)
    clean_re = _re.compile(r"[^\w\s-]", _re.ASCII)
    ws_re = _re.compile(r"\s+", _re.ASCII)

    def _one(t: str) -> list[str]:
        cleaned = clean_re.sub(" ", (t or "").lower())
        words = [w for w in ws_re.split(cleaned) if w]
        flags = [w in stop for w in words]
        out = [w for w, s in zip(words, flags) if len(w) >= min_length and not s]
        for i in range(len(words) - 1):
            if not flags[i] or not flags[i + 1]:
                g = words[i] + " " + words[i + 1]
                if len(g) >= 6:
                    out.append(g)
        joined = " ".join(words)
        dp = [p for p in prio if p in joined]
        if dp:
            for i in range(len(words) - 2):
                t3 = words[i] + " " + words[i + 1] + " " + words[i + 2]
                if any(p in t3 for p in dp):
                    out.append(t3)
        return out

    def _extract(*cols):  # no type hints: postponed annotations break
        (texts,) = cols  # pandas_udf's hint inference under __future__
        return texts.map(_one)

    return F.pandas_udf(_extract, "array<string>")(text)


def keyword_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus keyword frequencies: explode the candidates (with
    multiplicity, matching the reference's Counter) and count. Runs the
    Arrow kernel (:func:`extract_keywords_arrow`) — the measured 7x
    winner over the expression tree on this, the corpus-scan hot path."""
    return (
        df.select(F.explode(extract_keywords_arrow(F.col(text_col))).alias("keyword"))
        .groupBy("keyword")
        .agg(F.count("*").cast("long").alias("n"))
    )


def meaningful_keywords(counts: DataFrame, min_count: int = 3) -> DataFrame:
    """filter_meaningful_keywords (dynamic_trends.py:161-211): the
    min-count gate, digit/short/stopword/bigram-stopword skips, the
    stopword-boundary rule with its priority-term exception, and the 2x
    priority boost. Output: (keyword, n, score)."""
    prio = _arr(PRIORITY_TERMS)
    kw = F.col("keyword")
    words = F.split(kw, " ", -1)
    has_prio = F.exists(prio, lambda p: F.contains(kw, p))
    # membership probes are isin (one InSet hash probe), not
    # array_contains (an O(|stopwords|) array scan per row — and this
    # filter is pushed below the count aggregate, so it runs once per
    # exploded keyword OCCURRENCE); same null semantics, same values (r10)
    boundary_bad = (
        (F.size(words) >= 2)
        & (
            F.element_at(words, 1).isin(*BIO_STOPWORDS)
            | F.element_at(words, -1).isin(*BIO_STOPWORDS)
        )
        & ~has_prio
    )
    keep = (
        (F.col("n") >= min_count)
        & ~kw.rlike(r"^\d+$")
        & (F.length(kw) >= 4)
        & ~kw.isin(*BIO_STOPWORDS)
        & ~kw.isin(*BIGRAM_STOPWORDS)
        & ~boundary_bad
    )
    return counts.filter(keep).select(
        "keyword", "n",
        F.when(has_prio, F.col("n") * 2).otherwise(F.col("n")).cast("long").alias("score"),
    )


def keyword_growth(
    recent: DataFrame, previous: DataFrame, min_either: int = 2
) -> DataFrame:
    """analyze_keyword_growth's split (dynamic_trends.py:455-496): full
    outer join of the two period counts, stopword/short skips, the
    low-frequency gate (both periods under ``min_either``), growth rate
    with the zero-baseline=+100 rule, is_emerging = strictly-new or
    > +50, and the band label (> +30 emerging / < -30 declining / else
    stable). Output: (keyword, recent_count, previous_count,
    growth_rate, is_emerging, band)."""
    r = recent.select("keyword", F.col("n").alias("recent_count"))
    p = previous.select("keyword", F.col("n").alias("previous_count"))
    j = (
        r.join(p, "keyword", "full_outer")
        .withColumn("recent_count", F.coalesce("recent_count", F.lit(0)))
        .withColumn("previous_count", F.coalesce("previous_count", F.lit(0)))
        .filter(~F.col("keyword").isin(*BIO_STOPWORDS) & (F.length("keyword") >= 4))
        .filter(
            (F.col("recent_count") >= min_either)
            | (F.col("previous_count") >= min_either)
        )
    )
    growth = F.when(
        F.col("previous_count") > 0,
        (F.col("recent_count") - F.col("previous_count"))
        / F.col("previous_count") * 100.0,
    ).otherwise(
        F.when(F.col("recent_count") > 0, F.lit(100.0)).otherwise(F.lit(0.0))
    )
    is_emerging = (
        (F.col("recent_count") > 0) & (F.col("previous_count") == 0)
    ) | (growth > 50)
    band = (
        F.when(growth > 30, "emerging")
        .when(growth < -30, "declining")
        .otherwise("stable")
    )
    return j.select(
        "keyword", "recent_count", "previous_count",
        F.round(growth, 1).alias("growth_rate"),
        is_emerging.alias("is_emerging"),
        band.alias("band"),
    )
