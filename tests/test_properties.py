"""Property-based tests (hypothesis) — an oracle-discipline upgrade over the
reference's fixture-only suite (SURVEY §5 'what's absent'). Each property
runs few examples (Spark round-trips are seconds each) but explores corners
fixtures never hit: ties, duplicates, empty groups, adversarial floats."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

pvals = st.lists(
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False), min_size=1, max_size=40
)


def _bh_reference(ps):
    """Pure-python BH (statsmodels algorithm): sort, p*n/rank, reverse cummin."""
    n = len(ps)
    order = sorted(range(n), key=lambda i: ps[i])
    adj = [0.0] * n
    running = 1.0
    for rank_from_end, idx in enumerate(reversed(order)):
        rank = n - rank_from_end
        running = min(running, ps[idx] * n / rank)
        adj[idx] = min(running, 1.0)
    return adj


@given(ps=pvals)
@settings(**SETTINGS)
def test_bh_adjust_matches_pure_python(spark, ps):
    from vectordb_bioinsight_spark.operators.stats import bh_adjust

    df = spark.createDataFrame([(i, p) for i, p in enumerate(ps)], ["id", "pvalue"])
    got = {r["id"]: r["padj"] for r in bh_adjust(df).collect()}
    want = _bh_reference(ps)
    for i, w in enumerate(want):
        assert got[i] == pytest.approx(w, abs=1e-12), (ps, i)


events = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)),  # (key, ts)
    min_size=0,
    max_size=30,
)


@given(left=events, right=events)
@settings(**SETTINGS)
def test_asof_join_matches_bruteforce(spark, left, right):
    from vectordb_bioinsight_spark.operators.joins import asof_join

    # unique (key, ts) on the right — the documented determinism precondition
    right = list({(k, t): (k, t) for k, t in right}.values())
    if not left:
        return
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], ["lid", "k", "ts"]
    )
    rdf = spark.createDataFrame(
        [(k, t, t * 10 + k) for k, t in right], ["k", "rts", "val"]
    ) if right else spark.createDataFrame([], "k int, rts int, val int")
    got = {
        r["lid"]: r["val"]
        for r in asof_join(ldf, rdf, on="k", left_ts="ts", right_ts="rts", value_cols=["val"]).collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [(rt, v) for (rk, rt, v) in ((rk, rt, rt * 10 + rk) for rk, rt in right) if rk == k and rt <= t]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (left, right, i)


texts = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Po", "Zs")),
    max_size=60,
)


@given(txts=st.lists(texts, min_size=1, max_size=10))
@settings(**SETTINGS)
def test_tokenizer_spark_matches_python(spark, txts):
    """The JVM tokenizer and the driver-side twin must agree — BM25 scores
    queries with the python twin against postings built with the JVM one."""
    from vectordb_bioinsight_spark.functions.text import tokenize
    from vectordb_bioinsight_spark.operators.bm25 import _tokenize_py

    df = spark.createDataFrame([(i, t) for i, t in enumerate(txts)], ["id", "txt"])
    got = {r["id"]: r["toks"] for r in df.select("id", tokenize(F.col("txt")).alias("toks")).collect()}
    for i, t in enumerate(txts):
        assert got[i] == _tokenize_py(t), repr(t)


@given(
    vals=st.lists(
        st.tuples(st.booleans(), st.integers(-50, 50)), min_size=4, max_size=40
    )
)
@settings(**SETTINGS)
def test_wilcoxon_z_matches_closed_form(spark, vals):
    from tests.test_scoring_stats import _wilcoxon_exact
    from vectordb_bioinsight_spark.operators.stats import wilcoxon_rank_sum

    a = [float(v) for g, v in vals if g]
    b = [float(v) for g, v in vals if not g]
    df = spark.createDataFrame(
        [("k", 1 if g else 0, float(v)) for g, v in vals], ["key", "grp", "val"]
    )
    out = wilcoxon_rank_sum(df, ["key"], "grp", "val").collect()
    if not a or not b or len(set(a + b)) == 1:
        assert out == []  # degenerate keys must be dropped, never NaN
        return
    u, z = _wilcoxon_exact(a, b)
    if not math.isfinite(z):
        assert out == []
        return
    assert len(out) == 1
    assert out[0]["u_stat"] == pytest.approx(round(u, 4), abs=1e-6)
    assert out[0]["z"] == pytest.approx(round(z, 6), abs=1e-5)


@given(
    hs=st.lists(st.integers(min_value=0, max_value=(1 << 60) - 1), min_size=1, max_size=24),
    perm_idx=st.integers(min_value=0, max_value=63),
)
@settings(**SETTINGS)
def test_mulmod_affine_p61_matches_bigint_arithmetic(spark, hs, perm_idx):
    """The 64-bit-safe affine permutation equals (a*h+b) mod 2^61-1 computed
    with unbounded Python integers, for any 60-bit input."""
    from vectordb_bioinsight_spark.functions.hashing import (
        MINHASH_PERMS,
        P61,
        mulmod_affine_p61,
    )

    a, b = MINHASH_PERMS[perm_idx]
    df = spark.createDataFrame([(h,) for h in hs], ["h"])
    got = [
        r["y"]
        for r in df.select(mulmod_affine_p61(F.col("h"), a, b).alias("y"), "h")
        .orderBy("h")
        .collect()
    ]
    want = [(a * h + b) % P61 for h in sorted(hs)]
    assert got == want


@given(
    vals=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_winsorize_matches_pure_python(spark, vals):
    """Winsorized values equal the pure-python lower-discrete-quantile clamp
    for arbitrary grouped floats (ties, duplicates, negatives)."""
    from vectordb_bioinsight_spark.operators.stats import winsorize_by_group

    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(vals)], "id long, g string, v double"
    )
    got = {r["id"]: r["v_w"] for r in winsorize_by_group(df, ["g"], "v").collect()}

    def q(sorted_vs, frac):
        rank = max(1, math.ceil(frac * len(sorted_vs)))
        return sorted_vs[rank - 1]

    by_g: dict[str, list[float]] = {}
    for _i, (g, v) in enumerate(vals):
        by_g.setdefault(g, []).append(v)
    for i, (g, v) in enumerate(vals):
        vs = sorted(by_g[g])
        lo, hi = q(vs, 0.05), q(vs, 0.95)
        assert got[i] == pytest.approx(min(max(v, lo), hi), abs=1e-9), (vals, i)


@given(
    terms=st.lists(st.sampled_from(list("abcdefgh")), min_size=1, max_size=60),
    width=st.sampled_from([4, 16, 64]),
)
@settings(**SETTINGS)
def test_cms_overestimate_property(spark, terms, width):
    """For ANY term multiset and sketch width: est >= exact, and est ==
    exact when no other term shares all of a term's buckets."""
    from collections import Counter

    from vectordb_bioinsight_spark.operators.sketches import cms_build, cms_estimate

    df = spark.createDataFrame([(t,) for t in terms], "term string")
    sketch = cms_build(df, "term", width=width, depth=3)
    est = {
        r["term"]: r["cms_est"]
        for r in cms_estimate(sketch, df.distinct(), "term", width, 3).collect()
    }
    exact = Counter(terms)
    for t, n in exact.items():
        assert est[t] >= n, (terms, width, t)


@given(
    weights=st.lists(
        st.floats(min_value=0.001, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=30,
    ),
    k=st.integers(min_value=1, max_value=10),
)
@settings(**SETTINGS)
def test_weighted_sample_matches_pure_python(spark, weights, k):
    """The deterministic A-ES draw equals its pure-python replay exactly."""
    from vectordb_bioinsight_spark.operators.sampling import weighted_hash_sample

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "id long, w double"
    )
    got = [r["id"] for r in weighted_hash_sample(df, "id", "w", k=k).collect()]

    import hashlib

    def key(i, w):
        h = int(hashlib.md5(f"11|{i}".encode()).hexdigest()[:15], 16)
        return round(math.log((h + 1) / float(1 << 60)) / w, 6)

    want = sorted(range(len(weights)), key=lambda i: (-key(i, weights[i]), i))[:k]
    assert got == want, (weights, k)


word = st.sampled_from(["aaa", "bbb", "ccc", "ddd", "xyz"])
docs_strategy = st.lists(
    st.lists(word, min_size=0, max_size=12).map(" ".join), min_size=1, max_size=6
)


@given(texts=docs_strategy, p1=word, p2=word)
@settings(**SETTINGS)
def test_phrase_match_equals_python_scan(spark, texts, p1, p2):
    """Anchor-trick phrase matching == a literal python window scan over the
    same token stream, for arbitrary docs and any 2-term phrase (including
    repeated-term phrases like ('aaa','aaa'))."""
    from vectordb_bioinsight_spark.operators.phrase import phrase_match

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {(r["doc_id"], r["start_pos"]) for r in
           phrase_match(df, "doc_id", "text", [p1, p2]).collect()}
    want = set()
    for i, t in enumerate(texts):
        toks = t.split()
        for p in range(len(toks) - 1):
            if toks[p] == p1 and toks[p + 1] == p2:
                want.add((i, p))
    assert got == want


def _funnel_reference(events, steps):
    """Pure-python reach-chain: reach[0] = min ts of steps[0]; reach[i] =
    min ts of steps[i] strictly after reach[i-1]. Returns n_users per step."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, t, ts in events:
        by_user[u].append((ts, t))
    counts = [0] * len(steps)
    for evs in by_user.values():
        reach = None
        for i, step in enumerate(steps):
            cands = [ts for ts, t in evs
                     if t == step and (i == 0 or (reach is not None and ts > reach))]
            if not cands:
                break
            reach = min(cands)
            counts[i] += 1
    return {i + 1: c for i, c in enumerate(counts)}


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),          # user
            st.sampled_from(["a", "b", "c", "x"]),          # type (x = noise)
            st.integers(min_value=0, max_value=20),         # ts (seconds; ties likely)
        ),
        min_size=0,
        max_size=60,
    )
)
@settings(**SETTINGS)
def test_funnel_fold_matches_reach_chain_reference(spark, events):
    """The r05 single-pass fold must equal the per-step reach-chain
    definition on arbitrary event soup — ties, duplicates, repeated
    steps, absent users, empty input."""
    from vectordb_bioinsight_spark.operators.trends import funnel_conversion

    steps = ["a", "b", "c"]
    df = spark.createDataFrame(
        [(u, t, ts) for u, t, ts in events] or [(99, "zz", 0)],
        "u long, t string, sec long",
    ).withColumn("ts", F.timestamp_seconds("sec"))
    got = {r["step"]: r["n_users"] for r in
           funnel_conversion(df, "u", "t", "ts", steps).collect()}
    want = _funnel_reference(events, steps)
    assert got == want


def _transitions_reference(events, gap_s):
    """Pure-python in-session consecutive pairs: per user sort by (ts, id),
    count (from, to) where gap <= gap_s."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, eid, t, ts in events:
        by_user[u].append((ts, eid, t))
    counts = defaultdict(int)
    for evs in by_user.values():
        evs.sort()
        for (ts1, _i1, t1), (ts2, _i2, t2) in zip(evs, evs[1:]):
            if ts2 - ts1 <= gap_s:
                counts[(t1, t2)] += 1
    return dict(counts)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),      # user
            st.integers(min_value=0, max_value=999),    # event id (ties broken)
            st.sampled_from(["a", "b", "c"]),           # type
            st.integers(min_value=0, max_value=50),     # ts seconds
        ),
        min_size=0,
        max_size=50,
        unique_by=lambda e: e[1],                       # unique event ids
    )
)
@settings(**SETTINGS)
def test_transition_matrix_matches_reference(spark, events):
    from vectordb_bioinsight_spark.operators.trends import event_transition_matrix

    df = spark.createDataFrame(
        [(u, i, t, ts) for u, i, t, ts in events] or [(9, 0, "z", 0)],
        "u long, eid long, t string, sec long",
    ).withColumn("ts", F.timestamp_seconds("sec"))
    got = {(r["from_type"], r["to_type"]): r["n"] for r in
           event_transition_matrix(df, "u", "t", "ts", "eid", session_gap_s=10).collect()}
    assert got == _transitions_reference(events, 10)


def _funnel_depth_reference(user_events, n_steps, gap_s):
    """Exhaustive feasibility DP: reach[j] is True iff a full chain of
    steps 1..s_j with strict time order and per-hop gap <= gap_s ends at
    event j. Independent of the engine's latest-reach fold."""
    evs = sorted(set(user_events))  # the fold dedups exact (ts, step) repeats
    reach = [False] * len(evs)
    best = 0
    for j, (t, s) in enumerate(evs):
        if s == 1:
            reach[j] = True
        else:
            for i, (t2, s2) in enumerate(evs[:j]):
                if s2 == s - 1 and reach[i] and t > t2 and t - t2 <= gap_s:
                    reach[j] = True
                    break
        if reach[j]:
            best = max(best, s)
    return best


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),     # user
            st.integers(min_value=1, max_value=3),     # step index 1..3
            st.integers(min_value=0, max_value=40),    # ts seconds
        ),
        min_size=0,
        max_size=40,
    ),
    st.sampled_from([5, 12, 1000]),                    # conversion window
)
@settings(**SETTINGS)
def test_windowed_funnel_matches_exhaustive_chain_dp(spark, events, gap):
    """The windowed funnel's latest-reach fold must count exactly the users
    with a qualifying chain (ADVICE r05: greedy-earliest undercounted)."""
    from collections import defaultdict

    from vectordb_bioinsight_spark.operators.trends import funnel_conversion

    steps = ["s1", "s2", "s3"]
    df = spark.createDataFrame(
        [(u, steps[s - 1], ts) for u, s, ts in events] or [(9, "zz", 0)],
        "u long, t string, sec long",
    ).withColumn("ts", F.timestamp_seconds("sec"))
    got = {r["step"]: r["n_users"] for r in funnel_conversion(
        df, "u", "t", "ts", steps, max_gap_s=gap
    ).collect()}
    per_user = defaultdict(list)
    for u, s, ts in events:
        per_user[u].append((ts, s))
    depths = [_funnel_depth_reference(evs, 3, gap) for evs in per_user.values()]
    want = {i + 1: sum(1 for d in depths if d >= i + 1) for i in range(3)}
    assert got == want, (events, gap)
