"""Unit tests for operator edge cases not covered by the oracle-parity suite."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vectordb_bioinsight_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures_wide,
    ngram_jaccard_pairs,
)
from vectordb_bioinsight_spark.operators.joins import asof_join, range_join_bucketed
from vectordb_bioinsight_spark.operators.relational import dedup_exact, prevalence_filter, top_k
from vectordb_bioinsight_spark.operators.stats import bh_adjust
from vectordb_bioinsight_spark.operators.vector import knn_brute_force, knn_lsh


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (1, 20, 101), (2, 5, 102), (3, 7, 103)], ["k", "t", "lid"]
    ).select("k", F.col("t").alias("lt"), "lid")
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 15, "b"), (2, 6, "c")], ["k", "t", "v"]
    ).select("k", F.col("t").alias("rt"), "v")
    out = asof_join(left, right, on="k", left_ts="lt", right_ts="rt", value_cols=["v"])
    got = {r["lid"]: r["v"] for r in out.collect()}
    # equal timestamp IS visible (<=); no match -> null; later right ignored
    assert got == {100: "a", 101: "b", 102: None, 103: None}


def test_bh_adjust_matches_statsmodels(spark):
    try:
        from statsmodels.stats.multitest import multipletests
    except ImportError:
        pytest.skip("statsmodels not installed")
    pvals = [0.01, 0.02, 0.02, 0.9, 0.004, 0.5, 0.02]
    df = spark.createDataFrame([(i, p) for i, p in enumerate(pvals)], ["i", "pvalue"])
    got = {r["i"]: r["padj"] for r in bh_adjust(df).collect()}
    _, want, _, _ = multipletests(pvals, method="fdr_bh")
    for i, w in enumerate(want):
        assert math.isclose(got[i], w, rel_tol=1e-12), (i, got[i], w)


def test_bh_adjust_scaled_matches_windowed(spark):
    """The range-partitioned BH (no single-partition window) must agree with
    the windowed reference implementation exactly — including ties and a
    partition count far larger than needed (forces tiny/empty ranges)."""
    import random

    from vectordb_bioinsight_spark.operators.stats import bh_adjust_scaled

    rng = random.Random(42)
    pvals = [round(rng.random(), 3) for _ in range(997)]  # 3dp -> many ties
    pvals += [0.5, 0.5, 0.5]  # explicit tie block
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pvals)], ["i", "pvalue"]
    ).repartition(13)
    want = {r["i"]: r["padj"] for r in bh_adjust(df).collect()}
    got = {r["i"]: r["padj"] for r in bh_adjust_scaled(df, num_partitions=8).collect()}
    assert got.keys() == want.keys()
    for i in want:
        assert math.isclose(got[i], want[i], rel_tol=0, abs_tol=0), (i, got[i], want[i])


def test_topk_deterministic_under_ties(spark):
    df = spark.createDataFrame([(i, 1.0) for i in range(100)], ["id", "score"])
    out1 = [r["id"] for r in top_k(df, [F.desc("score")], 5, [F.asc("id")]).collect()]
    out2 = [r["id"] for r in top_k(df.repartition(7), [F.desc("score")], 5, [F.asc("id")]).collect()]
    assert out1 == out2 == [0, 1, 2, 3, 4]


def test_dedup_exact_deterministic_representative(spark):
    df = spark.createDataFrame(
        [("k1", 5, "z"), ("k1", 3, "a"), ("k2", 9, "m")], ["key", "n", "s"]
    )
    out = {r["key"]: (r["n"], r["s"]) for r in dedup_exact(df, ["key"]).collect()}
    assert out == {"k1": (3, "a"), "k2": (9, "m")}


def test_prevalence_filter(spark):
    rows = [("g1", f"s{i}", 10) for i in range(8)] + [("g1", "s8", 0), ("g1", "s9", 0)]
    rows += [("g2", f"s{i}", 10 if i < 3 else 0) for i in range(10)]
    df = spark.createDataFrame(rows, ["gene", "sample", "count"])
    kept = prevalence_filter(df, "gene", "sample", "count", min_value=1, min_fraction=0.5)
    assert {r["gene"] for r in kept.select("gene").distinct().collect()} == {"g1"}


def test_range_join_bucketed(spark):
    points = spark.createDataFrame([(1, 5.0), (2, 15.0), (3, 25.0)], ["pid", "x"])
    intervals = spark.createDataFrame(
        [(10, 0.0, 10.0), (20, 12.0, 30.0)], ["iid", "lo", "hi"]
    )
    out = range_join_bucketed(points, intervals, "x", "lo", "hi", bucket_width=8.0)
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert got == [(1, 10), (2, 20), (3, 20)]


def test_minhash_lsh_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away tonight"
    near = base.replace("runs", "walks")
    far = "completely different words about spark queries and columnar analytics engines"
    df = spark.createDataFrame([(1, base), (2, near), (3, far)], ["doc_id", "text"])
    sig = minhash_signatures_wide(df, "doc_id", "text", num_hashes=16)
    pairs = {(r["doc1"], r["doc2"]) for r in lsh_candidate_pairs(sig, "doc_id", 16, bands=8).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ngram_jaccard_with_candidates(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g z"), (3, "q w e r t y u i")],
        ["doc_id", "text"],
    )
    # min_len=3 tokenizer drops 1-char tokens; use 3+-char words instead
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),
            (3, "one two three four five six seven eight"),
        ],
        ["doc_id", "text"],
    )
    pairs = ngram_jaccard_pairs(df, "doc_id", "text", shingle_n=2, min_jaccard=0.3)
    got = {(r["doc1"], r["doc2"]): r["jaccard"] for r in pairs.collect()}
    assert (1, 2) in got and got[(1, 2)] > 0.5
    assert all(p == (1, 2) for p in got)


def test_knn_lsh_subset_of_bruteforce_bucket(spark):
    import random

    rng = random.Random(7)
    dim = 8
    vecs = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(200)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    q = vecs[0][1]
    exact = [r["vec_id"] for r in knn_brute_force(df, "vec_id", "embedding", q, k=5).collect()]
    approx = [r["vec_id"] for r in knn_lsh(df, "vec_id", "embedding", q, dim, k=5, num_planes=4).collect()]
    assert exact[0] == 0  # self is nearest under cosine
    assert 0 in approx  # query's own bucket contains itself
    assert len(approx) <= 5


def test_knn_ivf_full_probe_equals_exact(spark):
    from vectordb_bioinsight_spark.operators.vector import knn_ivf, knn_join
    from vectordb_bioinsight_spark.sources.readers import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)  # 5 queries
    exact = knn_join(queries, emb, "vec_id", "vec_id", "embedding", k=10)
    ivf_full = knn_ivf(emb, queries, "vec_id", "vec_id", "embedding",
                       k=10, n_cells=8, n_probe=8)
    e = {(r["query_id"], r["cand_id"]) for r in exact.collect()}
    f = {(r["query_id"], r["cand_id"]) for r in ivf_full.collect()}
    assert e == f  # probing every cell degrades to exact brute force


def test_knn_ivf_partial_probe_recall(spark):
    from vectordb_bioinsight_spark.operators.vector import knn_ivf, knn_join
    from vectordb_bioinsight_spark.sources.readers import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = knn_join(queries, emb, "vec_id", "vec_id", "embedding", k=10)
    approx = knn_ivf(emb, queries, "vec_id", "vec_id", "embedding",
                     k=10, n_cells=8, n_probe=3)
    e = {(r["query_id"], r["cand_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["cand_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall  # probes 3/8 of cells; near neighbors cluster


def test_bm25_batch_consistent_with_single(spark):
    from vectordb_bioinsight_spark.operators.bm25 import bm25_batch, bm25_topk
    from vectordb_bioinsight_spark.sources.readers import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    qtext = "merge join filter"
    queries = spark.createDataFrame([(0, qtext)], ["query_id", "query_text"])
    single = [(r["doc_id"], r["score"]) for r in bm25_topk(docs, "doc_id", "text", qtext, k=10).collect()]
    batch = [
        (r["doc_id"], r["score"])
        for r in bm25_batch(docs, "doc_id", "text", queries, k=10)
        .orderBy("rank")
        .collect()
    ]
    assert single == batch


def test_knn_join_gemm_matches_expression_path(spark):
    """The GEMM scale twin returns the same neighbour sets and (to 1e-6)
    the same scores as the expression-fold knn_join, across metrics."""
    import numpy as np

    from vectordb_bioinsight_spark.operators.vector import knn_join, knn_join_gemm

    rng = np.random.default_rng(7)
    vecs = [(int(i), [float(x) for x in rng.normal(size=16)]) for i in range(300)]
    df = spark.createDataFrame(vecs, ["vid", "vec"])
    queries = df.filter(F.col("vid") % 60 == 0)
    for metric in ["cosine", "dot", "l2"]:
        a = knn_join(queries, df, "vid", "vid", "vec", k=5, metric=metric).collect()
        b = knn_join_gemm(queries, df, "vid", "vid", "vec", k=5, metric=metric).collect()
        ka = {(r["query_id"], r["rank"]): (r["cand_id"], r["score"]) for r in a}
        kb = {(r["query_id"], r["rank"]): (r["cand_id"], r["score"]) for r in b}
        assert ka.keys() == kb.keys(), metric
        for key in ka:
            assert ka[key][0] == kb[key][0], (metric, key)
            assert abs(ka[key][1] - kb[key][1]) < 2e-6, (metric, key)


def test_knn_join_gemm_guards_and_edges(spark):
    import pytest as _pytest

    from vectordb_bioinsight_spark.operators.vector import knn_join_gemm

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [1.0, 1.0]), (3, [0.5, 0.1])],
        ["vid", "vec"],
    )
    # zero-norm candidate never surfaces under cosine; self-match excluded
    out = knn_join_gemm(df.filter("vid = 0"), df, "vid", "vid", "vec", k=3).collect()
    ids = [r["cand_id"] for r in out]
    assert 1 not in ids and 0 not in ids
    # the query-side guard raises instead of silently truncating
    with _pytest.raises(ValueError, match="max_queries"):
        knn_join_gemm(df, df, "vid", "vid", "vec", k=1, max_queries=2)


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    """SWA winnowing guarantee: documents sharing a token run of length
    >= window+k-1 (here 6) share at least one fingerprint; disjoint docs
    share none."""
    from vectordb_bioinsight_spark.operators.text_analysis import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6-token shared run
    docs = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five six"),
            (2, f"seven eight nine ten {shared} eleven"),
            (3, "totally different words with nothing common here at all"),
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(docs, "doc_id", "text", k=3, window=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared run must produce a shared fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])


def test_project_2d_geometry_and_guard(spark):
    """PCA-2 map: a 1-D manifold in 4-D collapses to the x axis; coords are
    z-normalized like the reference (vector_store.py:637) and deterministic."""
    from vectordb_bioinsight_spark.operators.vector import project_2d

    rows = [(i, [float(i), 2.0 * i, -i + 3.0, 0.5]) for i in range(12)]
    df = spark.createDataFrame(rows, ["id", "v"])
    got = {r["id"]: (r["x"], r["y"]) for r in project_2d(df, "id", "v").collect()}
    xs = [got[i][0] for i in range(12)]
    ys = [got[i][1] for i in range(12)]
    # x strictly ordered along the planted direction (sign fixed by the
    # largest-loading convention), y degenerate noise
    assert xs == sorted(xs) or xs == sorted(xs, reverse=True)
    assert max(abs(v) for v in ys) < 1e-5
    # z-normalized: mean 0, std 1
    import statistics

    assert abs(statistics.fmean(xs)) < 1e-6
    assert statistics.pstdev(xs) == pytest.approx(1.0, abs=1e-3)
    # deterministic across invocations
    again = {r["id"]: (r["x"], r["y"]) for r in project_2d(df, "id", "v").collect()}
    assert again == got
    with pytest.raises(ValueError, match="max_rows"):
        project_2d(df, "id", "v", max_rows=5)


def test_contamination_check_finds_planted_overlap(spark):
    """A corpus doc quoting a >= window+k-1 token run from a benchmark doc
    MUST be flagged (the winnowing guarantee); disjoint docs must not."""
    from vectordb_bioinsight_spark.operators.text_analysis import contamination_check

    bench_text = (
        "which element has the chemical symbol au answer gold because the "
        "latin name aurum gives the abbreviation used in the periodic table"
    )
    contaminated = (
        "today we review trivia sources and note that which element has the "
        "chemical symbol au answer gold because the latin name aurum appears "
        "verbatim in many scraped pages"
    )
    clean = (
        "fully unrelated discussion of streaming watermarks window joins "
        "and state stores in modern dataflow systems with no quoted text"
    )
    corpus = spark.createDataFrame(
        [(10, contaminated), (11, clean)], ["doc_id", "text"]
    )
    bench = spark.createDataFrame([(1, bench_text)], ["doc_id", "text"])
    got = {(r["doc_id"], r["bench_id"]): r["n_shared"] for r in
           contamination_check(corpus, bench, "doc_id", "text").collect()}
    assert (10, 1) in got and got[(10, 1)] >= 2
    assert not any(d == 11 for d, _ in got)


class TestFunnelAndSkewProfile:
    def test_funnel_strict_ordering(self, spark):
        """A user whose purchase precedes their view must not count as
        converted at step 3."""
        from vectordb_bioinsight_spark.operators.trends import funnel_conversion

        rows = [
            (1, "signup", "2024-01-01 00:00:00"),
            (1, "view", "2024-01-02 00:00:00"),
            (1, "purchase", "2024-01-03 00:00:00"),   # full funnel
            (2, "signup", "2024-01-01 00:00:00"),
            (2, "purchase", "2024-01-02 00:00:00"),   # purchase before any view
            (2, "view", "2024-01-03 00:00:00"),
            (3, "view", "2024-01-01 00:00:00"),       # never signed up
        ]
        df = spark.createDataFrame(rows, "u long, t string, ts string").withColumn(
            "ts", F.to_timestamp("ts")
        )
        got = {
            r["step_name"]: (r["n_users"], r["conversion"])
            for r in funnel_conversion(df, "u", "t", "ts", ["signup", "view", "purchase"]).collect()
        }
        assert got == {"signup": (2, 1.0), "view": (2, 1.0), "purchase": (1, 0.5)}

    def test_funnel_emits_zero_rows_for_unreached_steps(self, spark):
        """A step nobody reaches still emits a row with n_users = 0 (the
        SQL twin's count-over-empty-CTE shape, ADVICE r03); an empty step-1
        yields NULL conversions, never a divide-by-zero."""
        from vectordb_bioinsight_spark.operators.trends import funnel_conversion

        rows = [
            (1, "signup", "2024-01-01 00:00:00"),
            (2, "signup", "2024-01-01 00:00:00"),
        ]
        df = spark.createDataFrame(rows, "u long, t string, ts string").withColumn(
            "ts", F.to_timestamp("ts")
        )
        got = {
            r["step_name"]: (r["n_users"], r["conversion"])
            for r in funnel_conversion(
                df, "u", "t", "ts", ["signup", "view", "purchase"]
            ).collect()
        }
        assert got == {"signup": (2, 1.0), "view": (0, 0.0), "purchase": (0, 0.0)}
        # empty FIRST step: all counts 0, conversion NULL (0/0), no error
        empty = {
            r["step_name"]: (r["n_users"], r["conversion"])
            for r in funnel_conversion(
                df, "u", "t", "ts", ["login", "view"]
            ).collect()
        }
        assert empty == {"login": (0, None), "view": (0, None)}

    def test_winsorize_and_robust_keep_all_null_groups(self, spark):
        """A group whose values are ALL NULL has no fitted bounds, but its
        rows must pass through with NULL outputs (ADVICE r03: the inner
        join silently dropped them)."""
        from vectordb_bioinsight_spark.operators.stats import (
            robust_scale_by_group,
            winsorize_by_group,
        )

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("a", 100.0), ("n", None), ("n", None)],
            "g string, v double",
        )
        w = winsorize_by_group(df, ["g"], "v").collect()
        assert len(w) == 5
        null_rows = [r for r in w if r["g"] == "n"]
        assert len(null_rows) == 2
        assert all(r["v_w"] is None and r["clipped"] is None for r in null_rows)
        r = robust_scale_by_group(df, ["g"], "v").collect()
        assert len(r) == 5
        assert all(x["robust_z"] is None for x in r if x["g"] == "n")

    def test_skew_profile_flags_hot_key(self, spark):
        from vectordb_bioinsight_spark.operators.skew import key_skew_profile

        rows = [(0,)] * 90 + [(i,) for i in range(1, 11)]
        df = spark.createDataFrame(rows, "k long")
        top = key_skew_profile(df, ["k"], top_n=3).collect()
        assert top[0]["k"] == 0 and top[0]["rank"] == 1
        assert abs(top[0]["share"] - 0.9) < 1e-9
        assert abs(top[0]["skew_ratio"] - 0.9 * 11) < 1e-6

    def test_robust_scale_zero_mad_is_null(self, spark):
        from vectordb_bioinsight_spark.operators.stats import robust_scale_by_group

        df = spark.createDataFrame([("a", 5.0)] * 4 + [("b", 1.0), ("b", 2.0), ("b", 9.0)], "g string, v double")
        out = {(r["g"], r["v"]): r["robust_z"] for r in robust_scale_by_group(df, ["g"], "v").collect()}
        assert out[("a", 5.0)] is None          # constant group: MAD 0
        assert out[("b", 2.0)] == 0.0           # the median itself


class TestTrendsR04:
    def test_rolling_anomalies_flags_planted_spike(self, spark):
        """A 10x spike after a flat baseline must flag; the flat days must
        not; days without a full 7-day baseline are excluded."""
        from vectordb_bioinsight_spark.operators.trends import rolling_anomalies

        rows = []
        for d in range(1, 16):
            v = 1000.0 if d == 12 else (100.0 + (d % 3))  # tiny jitter, one spike
            rows.append(("click", f"2024-01-{d:02d} 00:00:00", v))
        df = spark.createDataFrame(rows, "t string, ts string, value double").withColumn(
            "ts", F.to_timestamp("ts")
        )
        out = {str(r["day"]): r for r in
               rolling_anomalies(df, "t", "ts", "value", window_rows=7).collect()}
        assert "2024-01-07" not in out          # incomplete baseline dropped
        assert out["2024-01-12"]["is_anomaly"] is True
        assert out["2024-01-12"]["zscore"] > 2
        flats = [r for d, r in out.items() if d not in ("2024-01-12", "2024-01-13",
                                                        "2024-01-14", "2024-01-15")]
        assert flats and all(not r["is_anomaly"] for r in flats)
        # the day AFTER the spike compares against a baseline containing it:
        # a LOW z is expected, not an anomaly (self-exclusion contract)
        assert out["2024-01-13"]["is_anomaly"] is False

    def test_rolling_anomalies_flat_series_yields_null_zscore(self, spark):
        """An 11-day CONSTANT series has a zero-stddev trailing window on
        every full-baseline day; under the session's ANSI default the
        zscore division must yield NULL (nullif guard), never
        DIVIDE_BY_ZERO, and no day may flag (ADVICE r04, high)."""
        from vectordb_bioinsight_spark.operators.trends import rolling_anomalies

        rows = [("flat", f"2024-02-{d:02d} 00:00:00", 50.0) for d in range(1, 12)]
        df = spark.createDataFrame(rows, "t string, ts string, value double").withColumn(
            "ts", F.to_timestamp("ts")
        )
        out = rolling_anomalies(df, "t", "ts", "value", window_rows=7).collect()
        assert len(out) == 4  # days 8..11 have a full baseline
        for r in out:
            assert r["base_std"] == 0.0
            assert r["zscore"] is None
            assert r["is_anomaly"] is False

    def test_cohort_retention_counts(self, spark):
        """Hand-built two-cohort history: retention fractions must be exact
        and week offsets must survive an ISO year boundary."""
        from vectordb_bioinsight_spark.operators.trends import cohort_retention

        rows = [
            # cohort A: first seen week of 2023-12-25 (crosses new year)
            (1, "2023-12-26 12:00:00"), (2, "2023-12-27 12:00:00"),
            (1, "2024-01-02 12:00:00"),                     # active offset 1
            (1, "2024-01-09 12:00:00"), (2, "2024-01-10 12:00:00"),  # offset 2
            # cohort B: first seen week of 2024-01-08
            (3, "2024-01-08 12:00:00"),
            (3, "2024-01-16 12:00:00"),                     # offset 1
        ]
        df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
            "ts", F.to_timestamp("ts")
        )
        got = {(str(r["cohort_week"]), r["week_offset"]): (r["n_active"], r["cohort_size"], r["retention"])
               for r in cohort_retention(df, "user_id", "ts").collect()}
        assert got[("2023-12-25", 0)] == (2, 2, 1.0)
        assert got[("2023-12-25", 1)] == (1, 2, 0.5)
        assert got[("2023-12-25", 2)] == (2, 2, 1.0)
        assert got[("2024-01-08", 0)] == (1, 1, 1.0)
        assert got[("2024-01-08", 1)] == (1, 1, 1.0)


class TestTrendsR05:
    def test_touch_attribution_models(self, spark):
        """Hand-built journeys: user 1 view->click->purchase (first=view,
        last=click, linear split 0.5/0.5); user 2 click-only then purchase;
        user 3 touches AFTER purchase (no credit); user 4 never converts."""
        from vectordb_bioinsight_spark.operators.trends import touch_attribution

        rows = [
            (1, "view",     "2024-01-01 00:00:00"),
            (1, "click",    "2024-01-02 00:00:00"),
            (1, "purchase", "2024-01-03 00:00:00"),
            (2, "click",    "2024-01-01 00:00:00"),
            (2, "purchase", "2024-01-02 00:00:00"),
            (3, "purchase", "2024-01-01 00:00:00"),
            (3, "view",     "2024-01-02 00:00:00"),
            (4, "view",     "2024-01-01 00:00:00"),
        ]
        df = spark.createDataFrame(rows, "u long, t string, ts string").withColumn(
            "ts", F.to_timestamp("ts")
        )
        out = {r["channel"]: r for r in touch_attribution(
            df, "u", "t", "ts", "purchase", ["view", "click"]
        ).collect()}
        assert set(out) == {"view", "click"}
        assert out["view"]["first_touch"] == 1 and out["view"]["last_touch"] == 0
        assert out["click"]["first_touch"] == 1 and out["click"]["last_touch"] == 2
        assert out["view"]["linear"] == 0.5
        assert out["click"]["linear"] == 1.5
        assert out["view"]["touched_users"] == 1 and out["click"]["touched_users"] == 2
        # decayed: u1's click (1 day before conv) outweighs the view (2
        # days before) under the 7d half-life; per-user shares sum to 1
        import math
        w_view = math.exp(-math.log(2) * 2 * 86400 / (7 * 86400))
        w_click = math.exp(-math.log(2) * 1 * 86400 / (7 * 86400))
        assert out["view"]["decayed"] == round(w_view / (w_view + w_click), 6)
        assert out["click"]["decayed"] == round(w_click / (w_view + w_click) + 1.0, 6)
        assert round(out["view"]["decayed"] + out["click"]["decayed"], 5) == 2.0

    def test_seasonal_decompose_recovers_planted_weekly_shape(self, spark):
        """total = 100 + 10*(is_monday) over 4 weeks: trend ~100 + 10/7,
        seasonal ~+10-ish on Mondays (zero-centered), residual ~0;
        total == trend + seasonal + residual exactly by construction."""
        from vectordb_bioinsight_spark.operators.trends import seasonal_decompose_daily
        import datetime as dt

        rows = []
        d0 = dt.date(2024, 1, 1)  # a Monday
        for i in range(28):
            day = d0 + dt.timedelta(days=i)
            v = 100.0 + (10.0 if day.weekday() == 0 else 0.0)
            rows.append(("m", f"{day} 00:00:00", v))
        df = spark.createDataFrame(rows, "k string, ts string, value double").withColumn(
            "ts", F.to_timestamp("ts")
        )
        out = seasonal_decompose_daily(df, "k", "ts", "value", period=7).collect()
        assert len(out) == 22  # 28 days - 6 edge days without a full window
        for r in out:
            assert r["total"] == pytest.approx(
                r["trend"] + r["seasonal"] + r["residual"], abs=2e-4
            )
            assert abs(r["residual"]) < 0.5
        mondays = [r for r in out if r["day"].weekday() == 0]
        others = [r for r in out if r["day"].weekday() != 0]
        assert mondays and min(r["seasonal"] for r in mondays) > 8.0
        assert max(abs(r["seasonal"]) for r in others) < 2.0

    def test_event_transition_matrix_counts_and_probs(self, spark):
        """Sessions: u1 a->b->a (one session), then a gap > 1h breaks the
        chain; transitions crossing the gap must not count."""
        from vectordb_bioinsight_spark.operators.trends import event_transition_matrix

        rows = [
            (1, 10, "a", "2024-01-01 10:00:00"),
            (1, 11, "b", "2024-01-01 10:10:00"),
            (1, 12, "a", "2024-01-01 10:20:00"),
            (1, 13, "c", "2024-01-01 13:00:00"),   # > 1h after -> new session
            (2, 20, "a", "2024-01-01 09:00:00"),
            (2, 21, "b", "2024-01-01 09:30:00"),
        ]
        df = spark.createDataFrame(rows, "u long, eid long, t string, ts string").withColumn(
            "ts", F.to_timestamp("ts")
        )
        out = {(r["from_type"], r["to_type"]): (r["n"], r["p"]) for r in
               event_transition_matrix(df, "u", "t", "ts", "eid").collect()}
        # a->b twice (u1, u2); the only other in-session pair is b->a (u1);
        # a->c crosses the >1h gap and must neither count nor enter the
        # P(to|from) denominator
        assert out[("a", "b")] == (2, 1.0)
        assert out[("b", "a")] == (1, 1.0)
        assert ("a", "c") not in out
        assert len(out) == 2
        # P(to|from) sums to 1 within each from
        froms = {}
        for (f_, _t), (_n, p) in out.items():
            froms[f_] = froms.get(f_, 0.0) + p
        for s in froms.values():
            assert abs(s - 1.0) < 1e-6

    def test_kaplan_meier_hand_computed(self, spark):
        """4 users: lifetimes 0w(churn), 1w(churn), 2w(censored-at-horizon),
        0w but active in final week (censored). KM arithmetic by hand."""
        from vectordb_bioinsight_spark.operators.trends import kaplan_meier_weeks

        rows = [
            # u1: one day only, long ago -> week 0, churned
            (1, "2024-01-01 00:00:00"), (1, "2024-01-02 00:00:00"),
            # u2: 8-day span ending 22 days before horizon -> week 1, churned
            (2, "2024-01-01 00:00:00"), (2, "2024-01-09 00:00:00"),
            # u3: spans to the horizon (Jan 31) -> week 4, censored
            (3, "2024-01-01 00:00:00"), (3, "2024-01-31 00:00:00"),
            # u4: active only in the final week -> week 0, censored
            (4, "2024-01-30 00:00:00"), (4, "2024-01-31 00:00:00"),
        ]
        df = spark.createDataFrame(rows, "u long, ts string").withColumn(
            "ts", F.to_timestamp("ts")
        )
        out = {r["week"]: r for r in kaplan_meier_weeks(df, "u", "ts").collect()}
        # week 0: risk 4, churn 1 (u1), censor 1 (u4) -> S = 3/4
        assert out[0]["n_risk"] == 4 and out[0]["n_churned"] == 1
        assert out[0]["n_censored"] == 1
        assert out[0]["survival"] == 0.75
        # week 1: risk 2 (u2, u3), churn 1 (u2) -> S = 0.75 * 0.5 = 0.375
        assert out[1]["n_risk"] == 2 and out[1]["survival"] == 0.375
        # week 4: risk 1 (u3), censored -> S unchanged
        assert out[4]["n_risk"] == 1 and out[4]["n_churned"] == 0
        assert out[4]["survival"] == 0.375

    def test_kaplan_meier_total_churn_pins_zero(self, spark):
        """A week that churns its entire risk set pins survival at 0 for
        every later week (the ln(0)-skipping hazard)."""
        from vectordb_bioinsight_spark.operators.trends import kaplan_meier_weeks

        rows = [
            (1, "2024-01-01 00:00:00"),                               # week 0 churn
            (2, "2024-01-01 00:00:00"), (2, "2024-01-02 00:00:00"),   # week 0 churn
            (3, "2024-01-01 00:00:00"), (3, "2024-03-01 00:00:00"),   # week 8 censored
        ]
        df = spark.createDataFrame(rows, "u long, ts string").withColumn(
            "ts", F.to_timestamp("ts")
        )
        out = {r["week"]: r for r in kaplan_meier_weeks(df, "u", "ts").collect()}
        # week 0: risk 3, churn 2 -> S = 1/3; week 8: censored, S stays 1/3
        assert out[0]["survival"] == round(1 / 3, 6)
        assert out[8]["survival"] == round(1 / 3, 6)

    def test_rfm_scores_hand_computed(self, spark):
        """5 users, distinct metrics: exact quintile ranks, recency
        inverted (most recent = 5), monetary/frequency ascending."""
        from vectordb_bioinsight_spark.operators.trends import rfm_scores

        rows = []
        for i, (day, n_ev, val) in enumerate(
            [(1, 1, 10.0), (5, 2, 20.0), (10, 3, 30.0), (15, 4, 40.0), (20, 5, 50.0)]
        ):
            for j in range(n_ev):
                rows.append((i, f"2024-01-{day:02d} 0{j}:00:00", val / n_ev))
        df = spark.createDataFrame(rows, "u long, ts string, value double").withColumn(
            "ts", F.to_timestamp("ts")
        )
        out = {r["user"]: r for r in rfm_scores(df, "u", "ts", "value").collect()}
        # user 4: most recent, most frequent, highest spend -> 5/5/5
        assert (out[4]["r_score"], out[4]["f_score"], out[4]["m_score"]) == (5, 5, 5)
        # user 0: oldest, least frequent, least spend -> 1/1/1
        assert (out[0]["r_score"], out[0]["f_score"], out[0]["m_score"]) == (1, 1, 1)
        assert out[4]["recency_days"] == 0 and out[0]["recency_days"] == 19
        assert [out[i]["f_score"] for i in range(5)] == [1, 2, 3, 4, 5]

    def test_funnel_time_bounded_conversion_window(self, spark):
        """max_gap_s: a step landing outside the conversion window of the
        previous reach must not count; inside it must."""
        from vectordb_bioinsight_spark.operators.trends import funnel_conversion

        rows = [
            (1, "signup", "2024-01-01 00:00:00"),
            (1, "view", "2024-01-01 00:30:00"),      # within 1h of signup
            (2, "signup", "2024-01-01 00:00:00"),
            (2, "view", "2024-01-01 02:00:00"),      # outside 1h window
        ]
        df = spark.createDataFrame(rows, "u long, t string, ts string").withColumn(
            "ts", F.to_timestamp("ts")
        )
        bounded = {r["step_name"]: r["n_users"] for r in funnel_conversion(
            df, "u", "t", "ts", ["signup", "view"], max_gap_s=3600
        ).collect()}
        assert bounded == {"signup": 2, "view": 1}
        unbounded = {r["step_name"]: r["n_users"] for r in funnel_conversion(
            df, "u", "t", "ts", ["signup", "view"]
        ).collect()}
        assert unbounded == {"signup": 2, "view": 2}

    def test_funnel_windowed_restarts_from_later_anchor(self, spark):
        """ADVICE r05: A@0, A@50, B@100 with max_gap_s=60 — the earliest
        anchor (A@0) is out of window, but the A@50 -> B@100 chain
        qualifies: depth must be 2, and a 3-step chain must re-anchor
        through the middle step the same way."""
        from vectordb_bioinsight_spark.operators.trends import funnel_conversion

        rows = [
            (1, "a", 0), (1, "a", 50), (1, "b", 100),
            # user 2: qualifying chain a@0 -> b@30 -> c@200 is out of
            # window at c, but b@150 (within 60 of NOTHING: a@0 expired,
            # a@100 -> b@150 -> c@200 qualifies end-to-end)
            (2, "a", 0), (2, "b", 30), (2, "a", 100), (2, "b", 150), (2, "c", 200),
            # user 3: no qualifying chain (b before any a, c expired)
            (3, "b", 10), (3, "a", 20), (3, "c", 300),
        ]
        df = spark.createDataFrame(rows, "u long, t string, off long").withColumn(
            "ts", F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_dt_interval(
                secs=F.col("off").cast("double"))
        )
        out = {r["step_name"]: r["n_users"] for r in funnel_conversion(
            df, "u", "t", "ts", ["a", "b", "c"], max_gap_s=60
        ).collect()}
        assert out == {"a": 3, "b": 2, "c": 1}

    def test_rolling_active_users_accuracy(self, spark):
        """HLL rolling actives vs exact sliding-window distincts: within
        the sketch's accuracy envelope on a planted 60-day history, and
        exactly consistent day-to-day (supersets never shrink below the
        daily floor)."""
        from vectordb_bioinsight_spark.operators.trends import rolling_active_users
        import datetime as dt

        rows = []
        d0 = dt.date(2024, 1, 1)
        for i in range(60):
            day = d0 + dt.timedelta(days=i)
            # 50 stable users + 20 rotating per day
            for u in range(50):
                rows.append((u, f"{day} 08:00:00"))
            for u in range(1000 + i * 20, 1000 + i * 20 + 20):
                rows.append((u, f"{day} 09:00:00"))
        df = spark.createDataFrame(rows, "u long, ts string").withColumn(
            "ts", F.to_timestamp("ts")
        )
        out = {r["day"]: r for r in rolling_active_users(df, "u", "ts", window_days=7).collect()}
        assert len(out) == 60
        last = out[d0 + dt.timedelta(days=59)]
        assert last["daily_active"] == 70
        # exact 7-day actives = 50 stable + 7*20 rotating = 190
        assert abs(last["rolling_active"] - 190) / 190 < 0.05
        first = out[d0]
        assert abs(first["rolling_active"] - 70) / 70 < 0.05
        for r in out.values():
            assert r["rolling_active"] >= r["daily_active"] * 0.95

    def test_holt_linear_hand_computed(self, spark):
        """Series 10,12,14 with alpha .5 beta .3: level/trend/forecast by
        hand (l1=10,t1=0 -> l=11,t=.3 -> l=12.65,t=.705 -> f=13.355);
        single-day keys return the init state."""
        from vectordb_bioinsight_spark.operators.trends import holt_linear

        rows = [("a", f"2024-01-0{d} 00:00:00", v)
                for d, v in [(1, 10.0), (2, 12.0), (3, 14.0)]]
        rows.append(("solo", "2024-01-01 00:00:00", 7.0))
        df = spark.createDataFrame(rows, "k string, ts string, value double").withColumn(
            "ts", F.to_timestamp("ts")
        )
        out = {r["key"]: r for r in
               holt_linear(df, "k", "ts", "value", 0.5, 0.3, 1).collect()}
        assert out["a"]["level"] == 12.65 and out["a"]["trend"] == 0.705
        assert out["a"]["forecast"] == 13.355 and out["a"]["n_days"] == 3
        assert out["solo"]["level"] == 7.0 and out["solo"]["trend"] == 0.0
        assert out["solo"]["forecast"] == 7.0


def test_item_cf_topk_cosine_and_rank(spark):
    """Hand-built baskets: cosine normalization and per-item rank order.
    Baskets: {A,B} x3, {A,C} x2, {B,C} x1... with min_cooc=2 only AB and
    AC survive; sim(A,B) = 3/sqrt(5*4), sim(A,C) = 2/sqrt(5*3)."""
    import math

    from vectordb_bioinsight_spark.operators.joins import item_cf_topk

    rows = []
    b = 0
    for _ in range(3):
        rows += [(b, "A"), (b, "B")]; b += 1
    for _ in range(2):
        rows += [(b, "A"), (b, "C")]; b += 1
    rows += [(b, "B"), (b, "C")]; b += 1
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {(r["item"], r["neighbor"]): r for r in
           item_cf_topk(df, "item", "basket", k=5, min_cooc=2).collect()}
    # n_A=5, n_B=4, n_C=3
    assert out[("A", "B")]["similarity"] == round(3 / math.sqrt(5 * 4), 6)
    assert out[("A", "C")]["similarity"] == round(2 / math.sqrt(5 * 3), 6)
    assert out[("A", "B")]["rank"] == 1 and out[("A", "C")]["rank"] == 2
    assert ("B", "C") not in out          # cooc 1 < min_cooc
    assert out[("B", "A")]["rank"] == 1 and out[("C", "A")]["rank"] == 1


def test_cooccurrence_edges_basket_cap(spark, caplog):
    """max_basket_size truncates deterministically (first N in item sort
    order), logs the truncation, and leaves in-cap inputs byte-identical
    to the uncapped path."""
    import logging

    from vectordb_bioinsight_spark.operators.joins import cooccurrence_edges

    # basket 0: items a..e (5 items); basket 1: items a,b (in cap)
    rows = [(0, x) for x in "abcde"] + [(1, "a"), (1, "b")]
    df = spark.createDataFrame(rows, "basket long, item string")

    uncapped = {(r["item1"], r["item2"]): r["weight"]
                for r in cooccurrence_edges(df, "item", "basket",
                                            max_basket_size=None).collect()}
    in_cap = {(r["item1"], r["item2"]): r["weight"]
              for r in cooccurrence_edges(df, "item", "basket",
                                          max_basket_size=5).collect()}
    assert in_cap == uncapped                     # in-cap: identical

    with caplog.at_level(logging.WARNING,
                         logger="vectordb_bioinsight_spark.operators.joins"):
        capped = {(r["item1"], r["item2"]): r["weight"]
                  for r in cooccurrence_edges(df, "item", "basket",
                                              max_basket_size=3).collect()}
        # basket 0 keeps a,b,c (item order); basket 1 untouched
        assert capped == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}
        # the truncation warning comes from the observation watcher thread
        # (the cap is lazy, ADVICE r06) — give it a moment to fire
        import time

        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and not any(
            "max_basket_size=3 truncated 1 context" in m for m in caplog.messages
        ):
            time.sleep(0.05)
    assert any("max_basket_size=3 truncated 1 context" in m
               for m in caplog.messages)


def test_maxsim_self_doc_wins_and_maxsim_semantics(spark):
    """The doc containing the query vectors scores ~n_qtok (each token's
    max cosine = 1 against itself); MaxSim takes the max per token, not
    the sum over doc vectors."""
    from vectordb_bioinsight_spark.operators.vector import maxsim_topk

    docs = spark.createDataFrame(
        [
            (1, [1.0, 0.0]), (1, [0.0, 1.0]),        # doc 1 = the query itself
            (2, [1.0, 0.0]), (2, [1.0, 0.0]),        # duplicates must not double-count
            (3, [-1.0, 0.0]), (3, [0.0, -1.0]),      # anti-aligned
        ],
        "doc long, embedding array<double>",
    )
    query = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "qtok long, embedding array<double>"
    )
    out = {r["doc"]: r for r in
           maxsim_topk(docs, query, "doc", "embedding", k=3).collect()}
    assert out[1]["score"] == 2.0 and out[1]["rank"] == 1
    assert out[2]["score"] == 1.0        # max per token: 1 (tok0) + 0 (tok1)
    # doc 3: each token's max is the ORTHOGONAL doc vector's 0, not the
    # anti-aligned one's -1 — MaxSim takes the max, so score 0
    assert out[3]["score"] == 0.0 and out[3]["rank"] == 3


def test_lagged_cross_correlation_detects_lead(spark):
    """Series B = series A shifted by +2 days: corr at lag +2 must be ~1,
    corr at lag 0 far lower."""
    import datetime as dt

    from vectordb_bioinsight_spark.operators.trends import lagged_cross_correlation

    d0 = dt.date(2024, 1, 1)
    vals = [float((i * 13) % 7 + (i % 3)) for i in range(30)]
    rows = []
    for i, v in enumerate(vals):
        rows.append(("a", f"{d0 + dt.timedelta(days=i)} 00:00:00", v))
        rows.append(("b", f"{d0 + dt.timedelta(days=i + 2)} 00:00:00", v))
    df = spark.createDataFrame(rows, "k string, ts string, value double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {r["lag"]: r["corr"] for r in
           lagged_cross_correlation(df, "k", "ts", "value", max_lag=3).collect()}
    assert out[2] == 1.0
    assert abs(out[0]) < 0.6
    assert set(out) == set(range(-3, 4))


class TestHoltBacktest:
    def test_matches_per_cutoff_retraining(self, spark):
        """The fold-accumulated one-step forecasts must equal retraining
        holt on every prefix (the rolling-origin definition), and
        MAE/sMAPE must equal the pure-python computation."""
        import datetime as dt

        from vectordb_bioinsight_spark.operators.trends import holt_backtest

        vals = [10.0, 12.0, 9.0, 15.0, 14.0, 20.0, 18.0, 25.0]
        d0 = dt.date(2024, 1, 1)
        rows = [
            ("a", dt.datetime.combine(d0 + dt.timedelta(days=i), dt.time(9)), v)
            for i, v in enumerate(vals)
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")

        def holt_prefix(series):
            l, t = series[0], 0.0
            for x in series[1:]:
                nl = 0.5 * x + 0.5 * (l + t)
                nt = 0.3 * (nl - l) + 0.7 * t
                l, t = nl, nt
            return l + t

        n_eval = 4
        fcs = [holt_prefix(vals[: j]) for j in range(1, len(vals))]
        actual = vals[-n_eval:]
        fc_tail = fcs[-n_eval:]
        mae = sum(abs(a - f) for a, f in zip(actual, fc_tail)) / n_eval
        smape = (
            sum(2 * abs(a - f) / (abs(a) + abs(f)) for a, f in zip(actual, fc_tail))
            / n_eval
        )
        out = holt_backtest(df, "k", "ts", "v", 0.5, 0.3, n_eval).first()
        assert out["n_days"] == len(vals) and out["n_eval"] == n_eval
        assert abs(out["mae"] - round(mae, 6)) < 1e-9
        assert abs(out["smape"] - round(smape, 6)) < 1e-9

    def test_single_day_key_dropped(self, spark):
        import datetime as dt

        from vectordb_bioinsight_spark.operators.trends import holt_backtest

        df = spark.createDataFrame(
            [("a", dt.datetime(2024, 1, 1, 9), 5.0)],
            "k string, ts timestamp, v double",
        )
        assert holt_backtest(df, "k", "ts", "v").count() == 0

    def test_eval_window_clamps_to_available(self, spark):
        import datetime as dt

        from vectordb_bioinsight_spark.operators.trends import holt_backtest

        rows = [
            ("a", dt.datetime(2024, 1, 1 + i, 9), float(i)) for i in range(3)
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        out = holt_backtest(df, "k", "ts", "v", n_eval=99).first()
        assert out["n_eval"] == 2  # only 2 one-step forecasts exist


def test_holt_conformal_coverage_and_rank_rule(spark):
    """The interval half-width equals the ceil((1-mc)(m+1))-th smallest
    |one-step residual| (pure-python replay), bounds = forecast +- q,
    and too-few-days keys report NULL bounds."""
    import datetime as dt

    from vectordb_bioinsight_spark.operators.trends import holt_conformal

    vals = [10.0, 12.0, 9.0, 15.0, 14.0, 20.0, 18.0, 25.0, 23.0, 30.0]
    d0 = dt.date(2024, 1, 1)
    rows = [
        ("a", dt.datetime.combine(d0 + dt.timedelta(days=i), dt.time(9)), v)
        for i, v in enumerate(vals)
    ] + [("tiny", dt.datetime(2024, 1, 1, 9), 5.0), ("tiny", dt.datetime(2024, 1, 2, 9), 6.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")

    l, t, fcs = vals[0], 0.0, []
    for x in vals[1:]:
        fcs.append(l + t)
        nl = 0.5 * x + 0.5 * (l + t)
        nt = 0.3 * (nl - l) + 0.7 * t
        l, t = nl, nt
    resid = sorted(abs(a - f) for a, f in zip(vals[1:], fcs))
    m = len(resid)
    import math

    q = resid[math.ceil(0.8 * (m + 1)) - 1]
    out = {r["key"]: r for r in holt_conformal(df, "k", "ts", "v", miscoverage=0.2).collect()}
    r = out["a"]
    assert r["n_cal"] == m
    assert abs(r["q_resid"] - round(q, 6)) < 1e-9
    assert abs(r["lo"] - round(l + t - q, 6)) < 1e-6
    assert abs(r["hi"] - round(l + t + q, 6)) < 1e-6
    # 1 calibration point cannot support 80% coverage: ceil(.8*2)=2 > 1
    tiny = out["tiny"]
    assert tiny["n_cal"] == 1 and tiny["q_resid"] is None and tiny["lo"] is None


def test_theil_sen_robust_to_outlier_day(spark):
    """A clean linear series recovers its exact slope; spiking ONE day
    leaves Theil-Sen unchanged while OLS moves substantially."""
    import datetime as dt

    from vectordb_bioinsight_spark.operators.trends import (
        daily_ols_trend,
        theil_sen_trend,
    )

    d0 = dt.date(2024, 1, 1)

    def frame(vals):
        rows = [
            ("a", dt.datetime.combine(d0 + dt.timedelta(days=i), dt.time(9)), v)
            for i, v in enumerate(vals)
        ]
        return spark.createDataFrame(rows, "k string, ts timestamp, v double")

    clean = [10.0 + 2.0 * i for i in range(15)]
    ts = theil_sen_trend(frame(clean), "k", "ts", "v").first()
    assert ts["slope"] == 2.0 and ts["intercept"] == 10.0
    assert ts["n_pairs"] == 15 * 14 // 2

    # spike an END day — the center day sits at x = x-bar where OLS is
    # insensitive by construction (caught by this test's first version)
    spiked = list(clean)
    spiked[14] = 500.0
    ts2 = theil_sen_trend(frame(spiked), "k", "ts", "v").first()
    ols2 = daily_ols_trend(frame(spiked), "k", "ts", "v").first()
    assert abs(ts2["slope"] - 2.0) < 0.1          # robust
    assert abs(ols2["slope"] - 2.0) > 1.0          # dragged
