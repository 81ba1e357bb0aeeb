"""Unit tests for the corpus-cleaning tier (operators/cleaning.py):
PII redaction, line splitting, C4 line-quality rules, global line dedup,
and ordered reassembly — all on hand-built fixtures with known answers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.cleaning import (
    global_line_dedup,
    line_quality_filter,
    line_quality_flags,
    reassemble_documents,
    redact_pii,
    split_lines,
    token_lines,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestRedactPii:
    def test_masks_and_counts(self, spark):
        df = _docs(
            spark,
            [
                (1, "mail me at jane.doe+x@lab.example.org or 555-867-5309 now"),
                (2, "server 192.168.0.1 and ssn 123-45-6789"),
                (3, "clean text with no pii at all"),
            ],
        )
        out = {r["doc_id"]: r for r in redact_pii(df, "doc_id", "text").collect()}
        assert (out[1]["n_email"], out[1]["n_phone"]) == (1, 1)
        assert out[1]["text_redacted"] == "mail me at <EMAIL> or <PHONE> now"
        assert (out[2]["n_ipv4"], out[2]["n_ssn"]) == (1, 1)
        assert out[2]["text_redacted"] == "server <IP> and ssn <ID>"
        assert out[3]["text_redacted"] == "clean text with no pii at all"
        assert out[3]["n_email"] == out[3]["n_phone"] == out[3]["n_ipv4"] == 0

    def test_multiple_matches_counted(self, spark):
        df = _docs(spark, [(1, "a@b.co c@d.io e@f.org")])
        row = redact_pii(df, "doc_id", "text").collect()[0]
        assert row["n_email"] == 3
        assert row["text_redacted"] == "<EMAIL> <EMAIL> <EMAIL>"


class TestLineFrames:
    def test_split_lines_drops_blank(self, spark):
        df = _docs(spark, [(1, "first line\n\n  \nsecond line")])
        rows = split_lines(df, "doc_id", "text").orderBy("line_no").collect()
        assert [(r["line_no"], r["line"]) for r in rows] == [
            (0, "first line"),
            (3, "second line"),
        ]

    def test_token_lines_fixed_width(self, spark):
        df = _docs(spark, [(1, "a b c d e f g h")])
        rows = token_lines(df, "doc_id", "text", 3).orderBy("line_no").collect()
        assert [r["line"] for r in rows] == ["a b c", "d e f", "g h"]


class TestLineQuality:
    def test_rules(self, spark):
        lines = spark.createDataFrame(
            [
                (1, 0, "this line has plenty of words"),  # keep
                (2, 0, "too short"),  # < min_words
                (3, 0, "buy buy buy buy now now"),  # modal token 4/6 > 0.5
                (4, 0, "enable javascript to view this page"),  # banned
                (5, 0, "spam spam other words here ok"),  # modal 2/6 <= 0.5: keep
            ],
            "doc_id long, line_no int, line string",
        )
        flags = {
            r["doc_id"]: r["keep"]
            for r in line_quality_flags(lines, min_words=5).collect()
        }
        assert flags == {1: True, 2: False, 3: False, 4: False, 5: True}
        kept = line_quality_filter(lines, min_words=5).collect()
        assert sorted(r["doc_id"] for r in kept) == [1, 5]
        assert set(kept[0].asDict()) == {"doc_id", "line_no", "line"}

    def test_top_token_share_value(self, spark):
        lines = spark.createDataFrame(
            [(1, 0, "x x x y y z")], "doc_id long, line_no int, line string"
        )
        row = line_quality_flags(lines).collect()[0]
        assert row["n_words"] == 6
        assert row["top_token_share"] == 0.5


class TestGlobalLineDedup:
    def test_threshold_and_normalization(self, spark):
        # "Nav Bar" appears (case/space-varied) in 3 docs -> dropped at df>2;
        # "unique N" lines survive; "shared" appears in only 2 docs -> kept.
        lines = spark.createDataFrame(
            [
                (1, 0, "Nav Bar"),
                (1, 1, "unique one"),
                (2, 0, "nav bar"),
                (2, 1, "shared tail"),
                (3, 0, "  NAV BAR  "),
                (3, 1, "shared tail"),
            ],
            "doc_id long, line_no int, line string",
        )
        kept = global_line_dedup(lines, max_doc_freq=2).collect()
        kept_set = {(r["doc_id"], r["line"].strip()) for r in kept}
        assert kept_set == {
            (1, "unique one"),
            (2, "shared tail"),
            (3, "shared tail"),
        }
        assert set(kept[0].asDict()) == {"doc_id", "line_no", "line"}

    def test_reassemble_preserves_order(self, spark):
        lines = spark.createDataFrame(
            [(1, 2, "c"), (1, 0, "a"), (1, 1, "b"), (2, 5, "only")],
            "doc_id long, line_no int, line string",
        )
        out = {r["doc_id"]: r for r in reassemble_documents(lines).collect()}
        assert out[1]["text_clean"] == "a\nb\nc"
        assert out[1]["n_lines_kept"] == 3
        assert out[2]["text_clean"] == "only"


class TestPlanShape:
    def test_no_python_udfs_in_cleaning_plans(self, spark):
        """The whole tier must stay JVM-side (SCALING.md rule 7)."""
        df = _docs(spark, [(1, "a b c d e f g h")])
        lines = token_lines(df, "doc_id", "text", 3)
        full = reassemble_documents(
            global_line_dedup(line_quality_filter(lines, min_words=1), max_doc_freq=5)
        )
        plan = full._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        red = redact_pii(df, "doc_id", "text")
        plan2 = red._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan2 and "ArrowEvalPython" not in plan2


def test_compression_ratio_matches_python_zlib(spark):
    import zlib

    from vectordb_bioinsight_spark.operators.text_analysis import (
        compression_ratio_scores,
    )

    texts = {
        1: "word " * 200,                      # highly repetitive: low ratio
        2: "The quick brown fox jumps over the lazy dog. " * 4,
        3: "",                                 # empty: ratio 0 by convention
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    rows = {r["doc_id"]: r for r in compression_ratio_scores(df, "doc_id", "text").collect()}
    for did, t in texts.items():
        raw = t.encode("utf-8")
        assert rows[did]["n_bytes"] == len(raw)
        assert rows[did]["n_compressed"] == len(zlib.compress(raw, 6))
        exp = round(len(zlib.compress(raw, 6)) / len(raw), 4) if raw else 0.0
        assert rows[did]["compression_ratio"] == exp
    assert rows[1]["compression_ratio"] < 0.1 < rows[2]["compression_ratio"]


def test_bigram_logprob_flags_shuffled_text(spark):
    from vectordb_bioinsight_spark.operators.text_analysis import bigram_logprob_scores

    # 20 docs share a coherent transition structure; one doc uses the SAME
    # vocabulary with scrambled transitions -> rare bigrams -> lower logprob
    coherent = "alpha beta gamma delta epsilon zeta " * 5
    scrambled = "zeta gamma alpha epsilon beta delta " * 5
    rows = [(i, coherent) for i in range(20)] + [(99, scrambled)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bigram_logprob_scores(df, "doc_id", "text").collect()}
    assert out[99]["avg_logprob"] < out[0]["avg_logprob"]
    assert out[99]["perplexity"] > out[0]["perplexity"]
    assert out[0]["n_bigrams"] == 29


class TestDomainBoilerplate:
    def test_per_source_threshold(self, spark):
        """A footer in 100% of src A is cut FROM src A ONLY; the same text
        in 1 of 4 docs of src B is legitimate prose there and survives.
        The absolute min_docs floor protects tiny sources."""
        from vectordb_bioinsight_spark.operators.cleaning import domain_boilerplate_dedup

        rows = []
        # src A: 4 docs, every one carries "visit our shop" -> df=4 = 100%
        for d in range(4):
            rows += [(d, 0, "visit our shop", "A"), (d, 1, f"body A {d}", "A")]
        # src B: 4 docs, only doc 10 mentions the same phrase -> df=1 = 25%
        rows += [(10, 0, "visit our shop", "B"), (10, 1, "body B ten", "B")]
        for d in (11, 12, 13):
            rows += [(d, 0, f"body B {d}", "B")]
        # src C: 2 docs sharing a line -> df=2 = 100% but min_docs=3 spares it
        rows += [(20, 0, "tiny shared", "C"), (21, 0, "tiny shared", "C")]
        lines = spark.createDataFrame(
            rows, "doc_id long, line_no int, line string, source string"
        )
        kept = domain_boilerplate_dedup(
            lines, "source", min_docs=3, max_doc_frac=0.5
        ).collect()
        kept_set = {(r["doc_id"], r["line"]) for r in kept}
        assert (0, "visit our shop") not in kept_set          # cut in A
        assert (10, "visit our shop") in kept_set             # survives in B
        assert (20, "tiny shared") in kept_set                # min_docs floor
        assert all((d, f"body A {d}") in kept_set for d in range(4))

    def test_normalized_matching(self, spark):
        """Case/whitespace variants hash to the same line key."""
        from vectordb_bioinsight_spark.operators.cleaning import domain_boilerplate_dedup

        lines = spark.createDataFrame(
            [(1, 0, "Nav Bar", "s"), (2, 0, "  nav bar ", "s"), (3, 0, "x y", "s")],
            "doc_id long, line_no int, line string, source string",
        )
        kept = domain_boilerplate_dedup(lines, "source", min_docs=2, max_doc_frac=0.5)
        assert {r["line"] for r in kept.collect()} == {"x y"}


# ---------------------------------------------------------------------------
# Web-text repair (strip_html / fix_mojibake / clean_web_docs)
# ---------------------------------------------------------------------------


def _clean_one(spark, text: str) -> str:
    from vectordb_bioinsight_spark.operators.cleaning import strip_html

    return (
        spark.createDataFrame([(text,)], "t string")
        .select(strip_html(F.col("t")).alias("c"))
        .first()["c"]
    )


@pytest.mark.parametrize(
    ("raw", "want"),
    [
        ("<p>Hello <b>world</b></p>", "Hello world"),
        # script/style bodies vanish wholly, non-greedy across tags
        ("a<script>if(x<2){y()}</script>b<script>z</script>c", "ab\nc" if False else "abc"),
        ("a<style>.x{color:red}</style>b", "ab"),
        ("keep<!-- secret comment -->going", "keepgoing"),
        # br and /p become newlines; tag case-insensitive
        ("one<BR/>two</P>three", "one\ntwo\nthree"),
        # entity decode, &amp; LAST so &amp;lt; stays a literal "&lt;"
        ("x &lt;tag&gt; &quot;q&quot; it&#39;s a&nbsp;b &amp;lt;", 'x <tag> "q" it\'s a b &lt;'),
        # space squeeze + trim
        ("  a \t  b  ", "a b"),
    ],
)
def test_strip_html_rules(spark, raw, want):
    assert _clean_one(spark, raw) == want


def test_fix_mojibake_sequences(spark):
    from vectordb_bioinsight_spark.operators.cleaning import fix_mojibake

    raw = "donâ€™t â€œquoteâ€“dash cafÃ© niÃ±oÂ here"
    got = (
        spark.createDataFrame([(raw,)], "t string")
        .select(fix_mojibake(F.col("t")).alias("f"))
        .first()["f"]
    )
    assert got == "don’t “quote–dash café niño here"


def test_clean_web_docs_counts_and_flag(spark):
    from vectordb_bioinsight_spark.operators.cleaning import clean_web_docs

    df = spark.createDataFrame(
        [(1, "<p>plain</p>"), (2, "donâ€™t <b>x</b>")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in clean_web_docs(df, "doc_id", "text").collect()}
    assert rows[1]["n_tags"] == 2 and rows[1]["mojibake_fixed"] == 0
    assert rows[2]["n_tags"] == 2 and rows[2]["mojibake_fixed"] == 1
    assert rows[2]["text_clean"] == "don’t x"


def test_clean_web_docs_is_scan_local(spark):
    from vectordb_bioinsight_spark.operators.cleaning import clean_web_docs

    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, text string")
    plan = clean_web_docs(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# Sentence segmentation (split_sentences)
# ---------------------------------------------------------------------------


def _sents(spark, text: str) -> list[str]:
    from vectordb_bioinsight_spark.operators.cleaning import split_sentences

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = split_sentences(df, "doc_id", "text").orderBy("sent_no").collect()
    assert [r["sent_no"] for r in rows] == list(range(len(rows)))  # contiguous
    return [r["sentence"] for r in rows]


def test_split_sentences_basic(spark):
    assert _sents(spark, "One. Two! Three? Four") == ["One.", "Two!", "Three?", "Four"]


def test_split_sentences_abbreviations_survive(spark):
    got = _sents(spark, "Dr. Smith et al. agree e.g. here. Next one.")
    assert got == ["Dr. Smith et al. agree e.g. here.", "Next one."]


def test_split_sentences_terminator_runs_and_blanks(spark):
    # '!?' glues to its sentence; whitespace-only fragments vanish without
    # leaving sent_no gaps
    assert _sents(spark, "Wait!? Sure...   ") == ["Wait!?", "Sure..."]


def test_split_sentences_empty_and_no_terminator(spark):
    assert _sents(spark, "just a fragment") == ["just a fragment"]
    assert _sents(spark, "") == []


def test_split_sentences_scan_local(spark):
    from vectordb_bioinsight_spark.operators.cleaning import split_sentences

    df = spark.createDataFrame([(1, "A. B.")], "doc_id long, text string")
    plan = split_sentences(df, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_nfc_normalize_unifies_dedup_keys(spark):
    """Composed and decomposed 'café' must hash identically after NFC —
    the miss-mode un-normalized dedup silently has."""
    from vectordb_bioinsight_spark.functions.hashing import portable_hash64
    from vectordb_bioinsight_spark.operators.cleaning import nfc_normalize

    composed = "café menu"
    decomposed = "café menu"
    assert composed != decomposed  # truly different strings on the way in
    df = spark.createDataFrame(
        [(1, composed), (2, decomposed), (3, None)], "doc_id long, text string"
    )
    out = df.select(
        "doc_id",
        nfc_normalize(F.col("text")).alias("norm"),
    ).withColumn("h", portable_hash64(F.col("norm")))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["norm"] == rows[2]["norm"] == composed
    assert rows[1]["h"] == rows[2]["h"]
    assert rows[3]["norm"] is None  # nulls pass through


def test_rake_hand_computed(spark):
    """RAKE on the canonical toy: 'deep learning models ... deep learning'
    — deg/freq arithmetic checked by hand, stopwords split phrases, top-n
    and tie order deterministic."""
    from vectordb_bioinsight_spark.operators.text_analysis import (
        rake_keyphrases,
    )

    # candidates: [deep learning models], [deep learning]
    # freq: deep 2, learning 2, models 1
    # deg:  deep 3+2=5, learning 5, models 3
    # wscore: deep 2.5, learning 2.5, models 3.0
    # scores: 'deep learning models' 8.0; 'deep learning' 5.0
    text = "deep learning models and the deep learning"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = rake_keyphrases(df, "doc_id", "text", top_n=5).orderBy("rank").collect()
    assert [(r["phrase"], r["score"]) for r in out] == [
        ("deep learning models", 8.0),
        ("deep learning", 5.0),
    ]
    assert out[0]["n_words"] == 3 and out[0]["rank"] == 1


def test_rake_short_and_stop_words_never_in_phrases(spark):
    from vectordb_bioinsight_spark.operators.text_analysis import (
        rake_keyphrases,
    )
    from vectordb_bioinsight_spark.functions.text import STOPWORDS

    df = spark.createDataFrame(
        [(1, "the quick brown fox and a very lazy dog runs it")],
        "doc_id long, text string",
    )
    out = rake_keyphrases(df, "doc_id", "text", top_n=10).collect()
    for r in out:
        for w in r["phrase"].split():
            assert len(w) >= 3 and w not in STOPWORDS


# ---------------------------------------------------------------- garbled
def _garbled_reference(line: str) -> bool:
    """Pure-python port of GarbledTextDetector.is_garbled
    (pdf_parser.py:116-206) as the independent oracle."""
    import re

    if len(line.strip()) < 10:
        return False
    words = line.split()
    if not words:
        return False
    patterns = ["lfs", "pdb", "bgk", "hth", "lfsr", "pdbgk", "jcj",
                "clfs", "fsrj", "fsrg", "sosrh", "map of", "1/4 p", "j2c"]

    def score(word: str) -> int:
        wl = word.lower().strip(".,;:()[]{}")
        if len(wl) < 2:
            return 0
        s = 0
        if len(wl) >= 4:
            vowels = sum(1 for c in wl if c in "aeiou")
            consonants = sum(1 for c in wl if c.isalpha() and c not in "aeiou")
            if consonants > 0 and vowels / len(wl) < 0.15:
                s += 2
        if any(p in wl for p in patterns):
            s += 3
        if len(word) >= 3 and re.search(r"[a-z][A-Z][a-z]", word):
            s += 2
        return s

    if sum(score(w) for w in words) / max(len(words), 1) > 0.3:
        return True
    unusual = len(re.findall(
        r"[;:]\s*[a-z]\s*[;:]|1/4\s+[a-z]|[a-z]\s*<\s*[a-z]{2,}\s*>", line))
    return unusual >= 2


GARBLED_CASES = [
    "lfsr pdbgk clfs jcj sosrh fsrg",            # TeX-garble fragments
    "xkcd qwrtz bcdfg hjklm npqrst vwxyz",       # vowel-free junk
    "the hTh oddity aTb repeats cDc everywhere", # mixed-case flips
    "results ; a : b ; c : significance",        # unusual sequences
    "This is a perfectly ordinary sentence about results.",
    "short",
    "Methods and materials were described previously in section two.",
    "",
    "   ",
    "a1 b2 c3 d4 e5 f6",
]


def test_garbled_line_flag_matches_reference_port(spark):
    from vectordb_bioinsight_spark.operators.cleaning import garbled_line_flag

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(GARBLED_CASES)], "i long, line string"
    )
    got = {r["i"]: r["g"] for r in df.select(
        "i", garbled_line_flag(F.col("line")).alias("g")
    ).collect()}
    for i, s in enumerate(GARBLED_CASES):
        assert got[i] == _garbled_reference(s), (i, s)
    # sanity: the crafted garbled lines DO flag and the clean ones don't
    assert got[0] and got[1] and got[3]
    assert not got[4] and not got[6]


def test_garbled_arrow_kernel_matches_expression_kernel(spark):
    """The Arrow kernel (the garbled stats/strip default since r08) must
    flag exactly the lines the expression tree flags — the fixed cases
    plus a fragment/punctuation/case fuzz."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vectordb_bioinsight_spark.operators.cleaning import (
        garbled_line_flag,
        garbled_line_flag_arrow,
    )

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(GARBLED_CASES)], "i long, line string"
    )
    rows = df.select(
        "i", "line",
        garbled_line_flag(F.col("line")).alias("e"),
        garbled_line_flag_arrow(F.col("line")).alias("a"),
    ).collect()
    for r in rows:
        assert r["e"] == r["a"], (r["line"], r["e"], r["a"])

    piece = st.sampled_from(
        ["lfs", "pdbgk", "hTh", "the", "results", ";", ":", "a", "1/4",
         "p", "(bgk)", "x<yz>", "bcdfg", "ordinary", "", "  ", "\t"]
    )

    @given(st.lists(piece, min_size=0, max_size=14))
    @settings(max_examples=15, deadline=None)
    def fuzz(parts):
        line = " ".join(parts)
        row = (
            spark.range(1)
            .select(
                garbled_line_flag(F.lit(line)).alias("e"),
                garbled_line_flag_arrow(F.lit(line)).alias("a"),
            )
            .first()
        )
        assert row["e"] == row["a"], (line, row["e"], row["a"])

    fuzz()


def test_strip_garbled_lines_keeps_order_and_drops_junk(spark):
    from vectordb_bioinsight_spark.operators.cleaning import (
        garbled_text_stats,
        strip_garbled_lines,
    )

    text = (
        "A clean first line about methods.\n"
        "lfsr pdbgk clfs jcj sosrh fsrg\n"
        "A clean closing line about results."
    )
    df = spark.createDataFrame(
        [(1, text), (2, "all good here today"),
         (3, "lfsr pdbgk clfs jcj sosrh fsrg hTh bCd qzx")],
        "doc_id long, text string")
    out = {r["id"]: r["text"] for r in
           strip_garbled_lines(df, "doc_id", "text").collect()}
    assert out[1] == ("A clean first line about methods.\n"
                      "A clean closing line about results.")
    assert out[2] == "all good here today"
    # an ALL-garbled doc still emits its row, as empty text (ADVICE r06)
    assert out[3] == ""
    stats = {r["id"]: r for r in
             garbled_text_stats(df, "doc_id", "text").collect()}
    assert stats[1]["n_lines"] == 3 and stats[1]["n_garbled"] == 1
    assert stats[1]["garbled_frac"] == pytest.approx(round(1 / 3, 6))
    assert stats[2]["n_garbled"] == 0


def test_garbled_flag_fuzz_vs_reference_port(spark):
    """Seeded fuzz: 400 random lines mixing clean words, TeX-garble
    fragments, vowel-free junk, case flips and punctuation runs — the
    Spark expression tree must agree with the pure-python reference port
    on every one (single job, not per-example)."""
    import random

    from vectordb_bioinsight_spark.operators.cleaning import (
        GARBLED_PATTERNS,
        garbled_line_flag,
    )

    rng = random.Random(20260815)
    clean = ["the", "results", "significant", "methods", "analysis",
             "tumor", "expression", "data", "observed", "between", "a", "of"]
    junk = ["bcdfgh", "qwrtz", "xkcd", "mnpqrs", "zz", "q"]
    flips = ["hTh", "aTb", "cDc", "xYz", "AbC"]
    punct = ["; a :", "1/4 p", "a < bc >", ";", ":", "(", ")", "[x]", "{y}"]

    def make_line() -> str:
        n = rng.randint(0, 14)
        pools = [clean, junk, flips, list(GARBLED_PATTERNS), punct]
        weights = [10, 2, 2, 2, 2]
        words = [rng.choices(pools, weights)[0] for _ in range(n)]
        toks = [rng.choice(p) for p in words]
        if rng.random() < 0.3:
            toks = ["  "] + toks + [" "]
        return " ".join(toks)

    lines = [make_line() for _ in range(400)]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(lines)], "i long, line string"
    )
    got = {r["i"]: r["g"] for r in df.select(
        "i", garbled_line_flag(F.col("line")).alias("g")
    ).collect()}
    flagged = 0
    for i, s in enumerate(lines):
        assert got[i] == _garbled_reference(s), (i, repr(s))
        flagged += got[i]
    # the generator must actually exercise BOTH branches
    assert 0 < flagged < len(lines)
