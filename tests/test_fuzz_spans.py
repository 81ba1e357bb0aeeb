"""Property fuzz: repeated_ngram_spans vs a direct Python re-implementation
on small random corpora (vocab tuned so cross-doc n-gram collisions are
common). Catches island-merge off-by-ones the fixtures can't."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from vectordb_bioinsight_spark.operators.dedup import repeated_ngram_spans

_N = 3  # shingle width under test


def _py_spans(docs: dict[int, list[str]], n: int, min_docs: int):
    shingles: dict[tuple, set] = {}
    for did, toks in docs.items():
        for p in range(max(0, len(toks) - n + 1)):
            shingles.setdefault(tuple(toks[p : p + n]), set()).add(did)
    dup = {s for s, dids in shingles.items() if len(dids) >= min_docs}
    out = []
    for did, toks in sorted(docs.items()):
        hits = [
            p
            for p in range(max(0, len(toks) - n + 1))
            if tuple(toks[p : p + n]) in dup
        ]
        span_id, prev = 0, None
        groups: dict[int, list[int]] = {}
        for p in hits:
            if prev is not None and p - prev > n:
                span_id += 1
            groups.setdefault(span_id, []).append(p)
            prev = p
        for sid, poss in groups.items():
            out.append((did, sid, poss[0], poss[-1] + n - 1, len(poss)))
    return sorted(out)


# tokens must survive the engine tokenizer (lowercase alnum, len >= 3)
_token = st.sampled_from([f"tok{c}" for c in "abcdefgh"])
_doc = st.lists(_token, min_size=0, max_size=12)


@settings(max_examples=15, deadline=None)
@given(st.lists(_doc, min_size=2, max_size=5))
def test_spans_match_python_oracle(spark, docs_tokens):
    docs = {i: toks for i, toks in enumerate(docs_tokens)}
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()], "doc_id long, text string"
    )
    got = sorted(
        (r["doc_id"], r["span_id"], r["span_start"], r["span_end"], r["n_dup_ngrams"])
        for r in repeated_ngram_spans(df, "doc_id", "text", n=_N, min_docs=2).collect()
    )
    assert got == _py_spans(docs, _N, 2)
