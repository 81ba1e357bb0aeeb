"""Text kernels — tokenizer, stopwords, quality features, fingerprints.

Tokenizer semantics match the reference's BM25 tokenizer exactly
(backend/app/core/embeddings.py:175-182): lowercase, alphanumeric runs
(``\\b[a-z0-9]+\\b``), keep tokens with length > 2. Everything is a JVM-side
expression (split + higher-order filter) — the tokenize of a 100 TB corpus is
an embarrassingly parallel projection with no Python involved.

The paired ``*_DUCKDB`` templates generate byte-identical results in DuckDB so
text operators are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.functions.hashing import quote_name

#: Minimal deterministic English stopword list (engine-owned; the reference
#: carries its own ad-hoc list at backend/app/utils/trend_analyzer.py:216-230).
STOPWORDS = (
    "the and for are but not you all can had her was one our out day get has him "
    "his how man new now old see two way who boy did its let put say she too use "
    "that with have this will your from they know want been good much some time "
    "very when come here just like long make many more only over such take than "
    "them well were what"
).split()


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokenize_spark_sql(expr: str, min_len: int = 3) -> str:
    """Spark SQL text computing the exact :func:`tokenize` expression tree —
    the single-parse fast path (see tokenize's str branch)."""
    return f"filter(split(lower({expr}), '[^a-z0-9]+'), t -> length(t) >= {min_len})"


def tokenize(col: Column | str, min_len: int = 3) -> Column:
    """array<string> of lowercase alnum tokens with length >= min_len.

    Cross-engine contract (fuzz-pinned in tests/test_fuzz_cross_engine.py):
    byte-identical to :func:`tokenize_duckdb` for ASCII and Latin-1 text.
    Known divergence outside it: Java ``lower`` maps U+0130 'İ' to
    'i'+combining-dot (splitting the token) where DuckDB maps it to plain
    'i' — locale-sensitive casing is out of the portable contract; strip or
    transliterate such input upstream when it matters.

    A plain column NAME takes the single-``F.expr``-parse fast path: the
    py4j-composed filter/split/lower/lambda tree costs ~59 round trips
    (~15 ms) per call against ~0.5 ms for one parse of the identical tree
    (r10 microbench; the helper is on ~30 query-build paths). Composed
    Column inputs keep the Column-API branch — value-identical either way
    (pinned in tests/test_sql_fastpath_twins.py)."""
    if isinstance(col, str) and (q := quote_name(col)) is not None:
        return F.expr(tokenize_spark_sql(q, min_len))
    return F.filter(
        F.split(F.lower(_c(col)), "[^a-z0-9]+"),
        lambda t: F.length(t) >= min_len,
    )


def tokenize_duckdb(expr: str, min_len: int = 3) -> str:
    """DuckDB expression producing the identical token array."""
    return (
        f"list_filter(regexp_split_to_array(lower({expr}), '[^a-z0-9]+'), "
        f"t -> length(t) >= {min_len})"
    )


def token_count(col: Column | str) -> Column:
    """Whitespace-token count — the cheap 'token counting' primitive.
    Column-name inputs take the single-parse fast path (see tokenize)."""
    if isinstance(col, str) and (q := quote_name(col)) is not None:
        # '\\\\s+' in the SQL text: the SQL string-literal parser unescapes
        # one level, leaving the \s+ regex the Column branch passes directly
        return F.expr(
            f"size(filter(split({q}, '\\\\s+'), t -> length(t) > 0))"
        )
    return F.size(F.filter(F.split(_c(col), "\\s+"), lambda t: F.length(t) > 0))


#: the exact character set of the regex class [a-z0-9A-Z ] — punct_ratio
#: deletes these via translate() instead of regexp_replace: byte-identical
#: results (finite ASCII set == the class), but NO regex engine. That
#: matters beyond style: a StringSplit and a RegExpReplace evaluated in
#: the SAME interpreted projection alternate pathologically (measured
#: 23 s/1M docs vs 0.7 s for either alone — probe r04), so the quality
#: expression that combines tokenize() with punct_ratio() was paying 17x
#: until punct left the regex engine entirely (40 s -> 2.3 s /1M docs).
_ALNUM_SPACE = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 "
)


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space (quality signal)."""
    c = _c(col)
    stripped = F.translate(c, _ALNUM_SPACE, "")
    return F.when(F.length(c) > 0, F.length(stripped) / F.length(c)).otherwise(F.lit(0.0))


def shingles_from_tokens(toks: Column | str, n: int = 3) -> Column:
    """Shingles from a precomputed token-array column (use this when the
    token array is already a named column — avoids re-evaluating the
    tokenizer regex once per referenced position). Column-name inputs take
    the single-parse fast path (see tokenize); integer index arithmetic is
    exact, so the simplified offsets are value-identical to the Column
    branch (pinned in tests/test_sql_fastpath_twins.py)."""
    if isinstance(toks, str) and (t := quote_name(toks)) is not None:
        parts = ", ".join(f"element_at({t}, i + {j + 1})" for j in range(n))
        return F.expr(
            f"CASE WHEN (size({t}) - {n - 1}) <= 0 THEN array() "
            f"ELSE transform(sequence(0, size({t}) - {n}), "
            f"i -> concat_ws(' ', {parts})) END"
        )
    k = F.size(toks) - (n - 1)
    return F.when(k <= 0, F.array()).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
        )
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as strings ('w1 w2 w3'), for MinHash / Jaccard.

    Built from the token array with ``transform`` over index positions —
    stays JVM-side.
    """
    return shingles_from_tokens(tokenize(_c(col)), n)


def shingles_duckdb(toks_expr: str, n: int = 3) -> str:
    """DuckDB expression matching :func:`shingles`, given a token-array
    expression (1-based list indexing). Use with a CTE that computes the token
    array once: ``SELECT {shingles_duckdb('toks')} FROM (SELECT {tokenize_duckdb('text')} AS toks ...)``.
    """
    parts = " || ' ' || ".join(f"{toks_expr}[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN length({toks_expr}) < {n} THEN []::VARCHAR[] "
        f"ELSE list_transform(range(1, length({toks_expr}) - {n - 1} + 1), i -> {parts}) END"
    )


#: GPT-2-style pretokenizer core (letter runs / digit runs / punctuation
#: runs, each with an optional leading space) — the public BPE pretokenize
#: regex family, restricted to constructs Java regex and RE2 (DuckDB) parse
#: identically so counts are cross-engine exact.
BPE_SPLIT_REGEX = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish token-count estimate: number of pretokenizer matches
    (letter/digit/punct runs). A subword tokenizer only ever splits these
    further, so this is the standard cheap lower-bound token budget used in
    corpus accounting; whitespace counting (:func:`token_count`) is the
    even cheaper upper-level twin."""
    return F.regexp_count(_c(col), F.lit(BPE_SPLIT_REGEX))


def bpe_token_count_duckdb(expr: str) -> str:
    """DuckDB expression matching :func:`bpe_token_count` exactly."""
    return f"len(regexp_extract_all({expr}, ' ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+'))"


def contains_any(col: Column | str, words: "list[str]") -> Column:
    """OR-fold of substring containment — the shared keyword-wall helper
    (one definition for the explainer/scoring/QA/upload ladders, which
    each re-implemented the same fold before the r07 review). Empty word
    lists are False (no wall matches nothing)."""
    text = _c(col)
    expr = F.lit(False)
    for w in words:
        expr = expr | text.contains(w)
    return expr
