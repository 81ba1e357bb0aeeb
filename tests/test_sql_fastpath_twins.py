"""Value-equality pins for the r10 single-parse SQL fast paths.

The shared expression helpers (tokenize / token_count / shingles /
dot_product / l2_norm / l2_distance / cosine_similarity / portable_hash64 /
mulmod_affine_p61) gained a branch that renders the SAME expression tree as
one F.expr parse when given a plain column name — ~10-50x cheaper to build
than the py4j-composed Column tree (guide §5: the driver should do almost
no work; plan-build was 39% of the r10 bench suite). These tests pin the
fast path value-identical to the Column-API path on adversarial inputs
(regex metacharacters, empty/NULL, zero vectors, unicode), so a rendering
drift can never silently change query results.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _pairs(df, fast_col, slow_col):
    rows = df.select(
        fast_col.alias("fast"), slow_col.alias("slow")
    ).collect()
    assert rows, "fixture produced no rows"
    for r in rows:
        assert r["fast"] == r["slow"], (r["fast"], r["slow"])


@pytest.fixture(scope="module")
def texts(spark):
    rows = [
        (1, "The quick brown fox; jumps-over 42 lazy dogs!!"),
        (2, ""),
        (3, None),
        (4, "a bb ccc dddd  \t eeeee\nff"),
        (5, "MiXeD CaSe 'quotes' \"double\" `backtick` \\backslash"),
        (6, "x" * 500),
        (7, "tab\tsep\tand nbsp words here"),
    ]
    return spark.createDataFrame(rows, "id long, text string")


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (1, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
        (2, [0.0, 0.0, 0.0], [1.0, -1.0, 2.0]),  # zero-norm side
        (3, [1e-8, 2e300, -3.5], [7.25, 0.125, 9.0]),
        (4, [0.1, 0.2, 0.3], [0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "id long, a array<double>, b array<double>")


def test_tokenize_twin(texts):
    from vectordb_bioinsight_spark.functions.text import tokenize

    _pairs(texts, tokenize("text"), tokenize(F.col("text")))
    _pairs(texts, tokenize("text", min_len=1), tokenize(F.col("text"), min_len=1))


def test_token_count_twin(texts):
    from vectordb_bioinsight_spark.functions.text import token_count

    _pairs(texts, token_count("text"), token_count(F.col("text")))


def test_shingles_twin(texts):
    from vectordb_bioinsight_spark.functions.text import (
        shingles_from_tokens,
        tokenize,
    )

    toked = texts.select("id", tokenize("text").alias("toks"))
    for n in (2, 3, 5):
        _pairs(
            toked,
            shingles_from_tokens("toks", n),
            shingles_from_tokens(F.col("toks"), n),
        )


def test_vector_kernel_twins(vecs):
    from vectordb_bioinsight_spark.functions.vector import (
        cosine_similarity,
        dot_product,
        l2_distance,
        l2_norm,
    )

    _pairs(vecs, dot_product("a", "b"), dot_product(F.col("a"), F.col("b")))
    _pairs(vecs, l2_norm("a"), l2_norm(F.col("a")))
    _pairs(vecs, l2_distance("a", "b"), l2_distance(F.col("a"), F.col("b")))
    _pairs(
        vecs,
        cosine_similarity("a", "b"),
        cosine_similarity(F.col("a"), F.col("b")),
    )


def test_portable_hash64_twin(texts):
    from vectordb_bioinsight_spark.functions.hashing import portable_hash64

    _pairs(
        texts.filter(F.col("text").isNotNull()),
        portable_hash64("text"),
        portable_hash64(F.col("text")),
    )


def test_mulmod_affine_sql_twin(spark):
    from vectordb_bioinsight_spark.functions.hashing import (
        MINHASH_PERMS,
        mulmod_affine_p61,
        mulmod_affine_p61_sql,
    )

    # hashes across the full 60-bit domain incl. boundary values
    hs = [0, 1, (1 << 30) - 1, 1 << 30, (1 << 60) - 1, 123456789012345678 % (1 << 60)]
    df = spark.createDataFrame([(h,) for h in hs], "h long")
    for a, b in MINHASH_PERMS[:4] + MINHASH_PERMS[30:32]:
        _pairs(
            df,
            F.expr(mulmod_affine_p61_sql("`h`", a, b)),
            mulmod_affine_p61(F.col("h"), a, b),
        )


def test_quote_name_escapes_backticks_and_rejects_dots(spark):
    """ADVICE r10: a backtick in a column name must not break the fast-path
    parse (escaped by doubling), and dotted names must fall back to the
    Column branch (F.col('a.b') resolves struct field b, not a literal
    name) — both branches stay value-identical."""
    from vectordb_bioinsight_spark.functions.hashing import portable_hash64, quote_name
    from vectordb_bioinsight_spark.functions.text import token_count, tokenize

    assert quote_name("a.b") is None
    assert quote_name("we`ird") == "`we``ird`"

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, None)], "id long, `we``ird` string"
    )
    got = df.select(
        tokenize("we`ird").alias("toks"),
        token_count("we`ird").alias("n"),
        portable_hash64("we`ird").alias("h"),
        tokenize(F.col("`we``ird`")).alias("toks_col"),
        token_count(F.col("`we``ird`")).alias("n_col"),
        portable_hash64(F.col("`we``ird`")).alias("h_col"),
    ).collect()
    for r in got:
        assert r["toks"] == r["toks_col"]
        assert r["n"] == r["n_col"]
        assert r["h"] == r["h_col"]

    # dotted access keeps struct-field semantics through the helpers
    s = spark.createDataFrame([(1, ("alpha beta gamma",))], "id long, a struct<b string>")
    row = s.select(
        tokenize("a.b").alias("toks"), tokenize(F.col("a.b")).alias("toks_col")
    ).collect()[0]
    assert row["toks"] == row["toks_col"] == ["alpha", "beta", "gamma"]
