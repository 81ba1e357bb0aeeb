"""BPE tokenizer tier: train against a pure-Python Sennrich replay, encode
path equivalence (replace chain == UDF), determinism, and the zero-shuffle
encode plan."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vectordb_bioinsight_spark.operators.bpe import (
    EOW,
    bpe_encode,
    bpe_encode_udf,
    bpe_train,
)
from vectordb_bioinsight_spark.sources.readers import load_table

CORPUS = [
    "low lower lowest newer new newest wider wide low low new",
    "low lower new newer wide wider the the the",
    "slow slower slowest wide wide new low the",
]


def _reference_bpe(texts: list[str], n_merges: int, min_pair_count: int = 2):
    """Sennrich et al. 2016 fig. 1, verbatim: vocab of space-joined symbol
    sequences, argmax pair by (count desc, pair asc), merge everywhere."""
    vocab = Counter()
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            if len(w) >= 3:  # the engine's tokenize() min_len
                vocab[" ".join(list(w) + [EOW])] += 1
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for word, n in vocab.items():
            syms = word.split(" ")
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (l, r), _n = best
        merges.append((l, r))
        pat = re.compile(r"(?<!\S)" + re.escape(f"{l} {r}") + r"(?!\S)")
        vocab = Counter(
            {pat.sub(f"{l}{r}", word): n for word, n in vocab.items()}
        )
    return merges


def _reference_encode(text: str, merges) -> list[str]:
    out = []
    for w in re.findall(r"[a-z0-9]+", text.lower()):
        if len(w) < 3:
            continue
        syms = list(w) + [EOW]
        for l, r in merges:
            i, merged = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            syms = merged
        out.extend(s[: -len(EOW)] if s.endswith(EOW) else s for s in syms)
    return [s for s in out if s]


def _docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_train_matches_sennrich_replay(spark):
    got = bpe_train(_docs(spark), "text", n_merges=20)
    want = _reference_bpe(CORPUS, 20)
    assert got == want, (got, want)
    assert len(got) >= 10  # non-vacuous: the corpus supports many merges


def test_train_deterministic_under_repartition(spark):
    df = _docs(spark)
    m1 = bpe_train(df, "text", n_merges=10)
    m2 = bpe_train(df.repartition(7), "text", n_merges=10)
    assert m1 == m2


def test_encode_matches_reference_and_udf_path(spark):
    df = _docs(spark)
    merges = bpe_train(df, "text", n_merges=12)
    expr = {r["doc_id"]: r["bpe_tokens"] for r in
            bpe_encode(df, "text", merges).collect()}
    udf = {r["doc_id"]: r["bpe_tokens"] for r in
           bpe_encode_udf(df, "text", merges).collect()}
    for i, t in enumerate(CORPUS):
        want = _reference_encode(t, merges)
        assert expr[i] == want, (i, expr[i], want)
        assert udf[i] == want, (i, udf[i], want)


def test_encode_roundtrips_text(spark):
    """Concatenating a word's subword tokens reconstructs the word — BPE is
    a segmentation, never lossy."""
    df = load_table(spark, SF_SMALL, "documents").limit(50)
    merges = bpe_train(df, "text", n_merges=16)
    rows = bpe_encode(df, "text", merges).select("doc_id", "text", "bpe_tokens").collect()
    for r in rows:
        words = [w for w in re.findall(r"[a-z0-9]+", r["text"].lower()) if len(w) >= 3]
        assert "".join(r["bpe_tokens"]) == "".join(words)


def test_encode_plan_is_scan_local(spark):
    """The replace-chain encode must add NO exchange — pure per-row
    expression work on the scan."""
    df = load_table(spark, SF_SMALL, "documents")
    merges = [("e", "r"), ("o", "w"), ("l", "ow")]
    plan = bpe_encode(df, "text", merges)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_train_stops_when_pairs_exhaust(spark):
    tiny = spark.createDataFrame([(1, "abc abc")], "doc_id long, text string")
    merges = bpe_train(tiny, "text", n_merges=50)
    # 'abc</w>' supports exactly 3 merges before it is one symbol
    assert len(merges) == 3


def test_encode_chained_same_pair_runs(spark):
    """Reviewer-caught regression: back-to-back occurrences of the SAME
    merged pair ('aaaa' under ('a','a'); 'banana' under ('a','n')) must
    merge greedily left-to-right in ONE pass on the replace-chain path,
    identically to the UDF path and the Sennrich reference."""
    df = spark.createDataFrame(
        [(0, "aaaa banana bananana")], "doc_id long, text string"
    )
    for merges in ([("a", "a")], [("a", "n")]):
        expr = bpe_encode(df, "text", merges, eow=False).first()["bpe_tokens"]
        udf = bpe_encode_udf(df, "text", merges, eow=False).first()["bpe_tokens"]
        want = _reference_encode_no_eow("aaaa banana bananana", merges)
        assert expr == want, (merges, expr, want)
        assert udf == want, (merges, udf, want)


def _reference_encode_no_eow(text: str, merges) -> list[str]:
    out = []
    for w in re.findall(r"[a-z0-9]+", text.lower()):
        if len(w) < 3:
            continue
        syms = list(w)
        for l, r in merges:
            i, merged = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            syms = merged
        out.extend(syms)
    return [s for s in out if s]


def test_train_handles_repeated_pair_words(spark):
    """Training on a corpus dominated by chained-pair words must match the
    Sennrich replay (the vocab replace uses the same wrapped form)."""
    corpus = ["banana bananas cabana", "banana banana aaaa"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = bpe_train(df, "text", n_merges=10)
    want = _reference_bpe(corpus, 10)
    assert got == want, (got, want)
