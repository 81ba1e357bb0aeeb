"""Scoring ladders (V8/M8) and the UDF p-value tiers (Wilcoxon normal
approximation, hypergeometric enrichment) against exact closed forms."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.scoring import (
    blend_scores,
    checklist_score,
    ladder_score,
    rerank_blend,
)
from vectordb_bioinsight_spark.operators.stats import (
    enrichment_contingency,
    enrichment_pvalues,
    wilcoxon_pvalues,
    wilcoxon_rank_sum,
)


def test_ladder_score_highest_threshold_wins(spark):
    df = spark.range(1).select(
        ladder_score(F.lit(350.0), [(200.0, 10.0), (300.0, 20.0)]).alias("hi"),
        ladder_score(F.lit(250.0), [(200.0, 10.0), (300.0, 20.0)]).alias("mid"),
        ladder_score(F.lit(50.0), [(200.0, 10.0), (300.0, 20.0)]).alias("lo"),
    )
    row = df.first()
    assert (row["hi"], row["mid"], row["lo"]) == (20.0, 10.0, 0.0)


def test_checklist_and_blend(spark):
    df = spark.createDataFrame([(1, 5.0, 100.0), (2, 0.0, 50.0), (3, 10.0, 0.0)], ["id", "a", "b"])
    out = blend_scores(df, {"a": 0.6, "b": 0.4}, minmax_normalize=True)
    got = {r["id"]: r["blended_score"] for r in out.collect()}
    # a in [0,10] -> id1=0.5, b in [0,100] -> id1=1.0 => 0.6*0.5+0.4*1.0
    assert got[1] == pytest.approx(0.7)
    assert got[3] == pytest.approx(0.6)
    flags = df.select(checklist_score([(F.col("a") > 1, 2.0), (F.col("b") > 60, 1.5)]).alias("s"))
    # id1: a>1 and b>60 -> 3.5; id2: neither -> 0; id3: a>1 only -> 2.0
    assert [r["s"] for r in flags.orderBy("s").collect()] == [0.0, 2.0, 3.5]


def test_rerank_blend_resorts(spark):
    df = spark.createDataFrame(
        [(1, 0.9, 0.1), (2, 0.5, 0.9), (3, 0.1, 0.5)], ["id", "orig", "rerank"]
    )
    out = rerank_blend(df, "orig", "rerank", orig_weight=0.3, top_k=2, order_tiebreak=["id"])
    ids = [r["id"] for r in out.collect()]
    # normalized blends: id1=0.3, id2=0.85, id3=0.35 -> rerank dominates
    assert ids == [2, 3]


def _wilcoxon_exact(values_a, values_b):
    """Closed-form tie-corrected z (the operator's spec)."""
    allv = sorted(values_a + values_b)
    ranks = {}
    i = 0
    while i < len(allv):
        j = i
        while j < len(allv) and allv[j] == allv[i]:
            j += 1
        ranks[allv[i]] = (i + 1 + j) / 2.0
        i = j
    n_a, n_b = len(values_a), len(values_b)
    n = n_a + n_b
    r_a = sum(ranks[v] for v in values_a)
    u = r_a - n_a * (n_a + 1) / 2.0
    from collections import Counter

    tie_sum = sum(t**3 - t for t in Counter(allv).values())
    var = n_a * n_b / 12.0 * ((n + 1) - tie_sum / (n * (n - 1)))
    return u, (u - n_a * n_b / 2.0) / math.sqrt(var)


def test_wilcoxon_rank_sum_exact(spark):
    a = [1.0, 3.0, 5.0, 5.0, 9.0]
    b = [2.0, 4.0, 5.0, 8.0]
    rows = [("g", 1, v) for v in a] + [("g", 0, v) for v in b]
    df = spark.createDataFrame(rows, ["key", "grp", "val"])
    out = wilcoxon_rank_sum(df, ["key"], "grp", "val").collect()
    assert len(out) == 1
    u, z = _wilcoxon_exact(a, b)
    assert out[0]["u_stat"] == pytest.approx(round(u, 4))
    assert out[0]["z"] == pytest.approx(round(z, 6), abs=1e-6)
    withp = wilcoxon_pvalues(wilcoxon_rank_sum(df, ["key"], "grp", "val")).first()
    want_p = 2 * 0.5 * math.erfc(abs(z) / math.sqrt(2))
    assert withp["pvalue"] == pytest.approx(want_p, rel=1e-5)


def test_wilcoxon_drops_degenerate_keys(spark):
    rows = [("one_group", 1, 1.0), ("one_group", 1, 2.0),
            ("all_tied", 1, 3.0), ("all_tied", 0, 3.0)]
    df = spark.createDataFrame(rows, ["key", "grp", "val"])
    assert wilcoxon_rank_sum(df, ["key"], "grp", "val").count() == 0


def test_enrichment_pvalues_exact(spark):
    from math import comb

    rows = (
        [("s1", True)] * 8 + [("s1", False)] * 2
        + [("s2", True)] * 2 + [("s2", False)] * 18
    )
    df = spark.createDataFrame(rows, ["grp", "flag"])
    out = {r["grp"]: r for r in enrichment_pvalues(enrichment_contingency(df, "grp", "flag")).collect()}
    N, n = 30, 10
    for g, K in [("s1", 10), ("s2", 20)]:
        k = out[g]["overlap"]
        want = sum(comb(K, j) * comb(N - K, n - j) for j in range(k, min(K, n) + 1)) / comb(N, n)
        assert out[g]["pvalue"] == pytest.approx(want, rel=1e-10)
    assert out["s1"]["fold_enrichment"] == pytest.approx(round((8 / 10) / (10 / 30), 6))


def test_anova_f_matches_numpy(spark):
    from vectordb_bioinsight_spark.operators.stats import anova_f, anova_pvalues

    rng = np.random.default_rng(5)
    groups = {"g1": rng.normal(0, 1, 12), "g2": rng.normal(0.8, 1, 15), "g3": rng.normal(-0.5, 1.2, 9)}
    rows = [("k", g, float(v)) for g, vals in groups.items() for v in vals]
    df = spark.createDataFrame(rows, ["key", "grp", "val"])
    out = anova_pvalues(anova_f(df, ["key"], "grp", "val")).first()
    # numpy closed form
    allv = np.concatenate(list(groups.values()))
    grand = allv.mean()
    k, N = len(groups), len(allv)
    ssb = sum(len(v) * (v.mean() - grand) ** 2 for v in groups.values())
    ssw = sum(((v - v.mean()) ** 2).sum() for v in groups.values())
    f_want = (ssb / (k - 1)) / (ssw / (N - k))
    assert out["f_stat"] == pytest.approx(round(f_want, 6), abs=1e-6)
    # p-value via the engine's own f_sf pinned against the identity with
    # betainc (betainc itself is pinned against mpmath in test_special)
    from vectordb_bioinsight_spark.functions.special import f_sf

    # the operator rounds f_stat to 6dp before the p-value UDF
    assert out["pvalue"] == pytest.approx(float(f_sf(round(f_want, 6), k - 1, N - k)), rel=1e-9)
    assert 0.0 < out["pvalue"] < 0.05  # planted group separation is real


def test_anova_f_drops_degenerate(spark):
    from vectordb_bioinsight_spark.operators.stats import anova_f

    rows = [("one_group", "a", 1.0), ("one_group", "a", 2.0),
            ("no_var", "a", 3.0), ("no_var", "b", 3.0)]
    df = spark.createDataFrame(rows, ["key", "grp", "val"])
    assert anova_f(df, ["key"], "grp", "val").count() == 0


def test_blend_scores_bounded_input_matches_agg_strategy(spark):
    """The window-bounds strategy (bounded_input=True) must give exactly the
    same blended scores as the agg+crossJoin strategy, including the
    degenerate constant-column case (0.5 fallback)."""
    from vectordb_bioinsight_spark.operators.scoring import blend_scores

    rows = [(1, 10.0, 3.0), (2, 20.0, 1.0), (3, 15.0, 1.0), (4, 10.0, 9.0)]
    df = spark.createDataFrame(rows, ["id", "a", "b"])
    want = {
        r["id"]: r["s"]
        for r in blend_scores(df, {"a": 0.3, "b": 0.7}, out_col="s").collect()
    }
    got = {
        r["id"]: r["s"]
        for r in blend_scores(
            df, {"a": 0.3, "b": 0.7}, out_col="s", bounded_input=True
        ).collect()
    }
    assert got == want
    # constant column -> 0.5 fallback on both strategies
    const = spark.createDataFrame([(1, 5.0, 1.0), (2, 5.0, 2.0)], ["id", "a", "b"])
    for bounded in (False, True):
        out = {
            r["id"]: r["s"]
            for r in blend_scores(
                const, {"a": 1.0}, out_col="s", bounded_input=bounded
            ).collect()
        }
        assert out == {1: 0.5, 2: 0.5}


class TestGseaPrerank:
    def test_top_concentrated_set_scores_near_one(self, spark):
        """All members at the very top of the ranking -> ES ~= 1 at the
        last member's rank; a uniformly interleaved set scores far lower."""
        from vectordb_bioinsight_spark.operators.stats import gsea_prerank_es

        genes = [(i, float(100 - i)) for i in range(100)]  # rank == i+1
        ranked = spark.createDataFrame(genes, "gene long, stat double")
        mem = spark.createDataFrame(
            [("top", i) for i in range(5)] + [("spread", i) for i in range(0, 100, 20)],
            "gene_set string, gene long",
        )
        out = {r["gene_set"]: r for r in gsea_prerank_es(ranked, "gene", "stat", mem, "gene_set").collect()}
        top = out["top"]
        assert top["n_hits"] == 5 and top["rank_at_peak"] == 5
        assert top["es"] > 0.9
        assert abs(out["spread"]["es"]) < top["es"]

    def test_es_matches_python_replay(self, spark):
        from vectordb_bioinsight_spark.operators.stats import gsea_prerank_es

        import random

        rng = random.Random(5)
        genes = [(i, round(rng.uniform(1, 50), 2)) for i in range(40)]
        members = sorted(rng.sample(range(40), 8))
        ranked = spark.createDataFrame(genes, "gene long, stat double")
        mem = spark.createDataFrame([("s", g) for g in members], "gene_set string, gene long")
        [row] = gsea_prerank_es(ranked, "gene", "stat", mem, "gene_set").collect()

        order = sorted(genes, key=lambda t: (-t[1], t[0]))
        nr = sum(abs(s) for g, s in order if g in set(members))
        miss = -1.0 / (40 - 8)
        run, best, best_rank = 0.0, 0.0, 1
        for rank, (g, s) in enumerate(order, start=1):
            run += abs(s) / nr if g in set(members) else miss
            r6 = round(run, 6)
            if abs(r6) > abs(best) + 1e-12:
                best, best_rank = r6, rank
        assert row["es"] == best and row["rank_at_peak"] == best_rank

    def test_scaled_twin_matches_fixed_exactly(self, spark):
        """gsea_prerank_es_scaled (two-phase rank + hits-only compressed
        walk) must reproduce the fixed version row-for-row, including the
        edge shapes: a set whose members all miss the ranking, an all-hits
        set, interleaved sets, and a set with zero-stat members."""
        import random

        from vectordb_bioinsight_spark.operators.stats import (
            gsea_prerank_es,
            gsea_prerank_es_scaled,
        )

        rng = random.Random(11)
        n = 300
        genes = [(i, round(rng.uniform(-20, 50), 3)) for i in range(n)]
        ranked = spark.createDataFrame(genes, "gene long, stat double")
        mem_rows = (
            [("interleaved", g) for g in rng.sample(range(n), 40)]
            + [("top_heavy", g) for g in range(12)]
            + [("all_hits", g) for g in range(n)]
            + [("ghost", g) for g in range(n, n + 5)]  # none in the ranking
        )
        mem = spark.createDataFrame(mem_rows, "gene_set string, gene long")
        fixed = {r["gene_set"]: r for r in gsea_prerank_es(ranked, "gene", "stat", mem, "gene_set").collect()}
        scaled = {r["gene_set"]: r for r in gsea_prerank_es_scaled(
            ranked, "gene", "stat", mem, "gene_set", num_partitions=7
        ).collect()}
        # the fixed version cannot see the ghost set's walk (its members
        # never join the grid... it CAN: set_ids cross join) — compare all
        assert set(scaled) == set(fixed)
        for k in fixed:
            f, s = fixed[k], scaled[k]
            assert (s["n_genes"], s["n_hits"]) == (f["n_genes"], f["n_hits"]), k
            assert s["es"] == f["es"], (k, s["es"], f["es"])
            assert s["rank_at_peak"] == f["rank_at_peak"], (k, s, f)


class TestKruskalWallis:
    def test_matches_pure_python_replay(self, spark):
        import collections

        import numpy as np

        from vectordb_bioinsight_spark.operators.stats import kruskal_wallis

        rng = np.random.default_rng(3)
        rows = []
        for key in ["k1", "k2"]:
            for g in range(4):
                for _ in range(30):
                    rows.append(
                        (key, f"g{g}", float(rng.integers(0, 15) + (2 if g == 1 and key == "k1" else 0)))
                    )
        df = spark.createDataFrame(rows, "key string, grp string, v double")
        got = {r["key"]: r["h_stat"] for r in kruskal_wallis(df, ["key"], "grp", "v").collect()}

        def kw(groups):
            allv = sorted(v for grp in groups for v in grp)
            n = len(allv)
            ranks, tie_sum, i = {}, 0.0, 0
            while i < len(allv):
                j = i
                while j < len(allv) and allv[j] == allv[i]:
                    j += 1
                t = j - i
                ranks[allv[i]] = (i + j + 1) / 2.0
                tie_sum += t**3 - t
                i = j
            s = sum((sum(ranks[v] for v in grp)) ** 2 / len(grp) for grp in groups)
            h = 12.0 / (n * (n + 1)) * s - 3 * (n + 1)
            return h / (1 - tie_sum / (n**3 - n))

        data = collections.defaultdict(lambda: collections.defaultdict(list))
        for k, g, v in rows:
            data[k][g].append(v)
        for k in data:
            want = round(kw([data[k][g] for g in sorted(data[k])]), 6)
            assert got[k] == want, k

    def test_all_tied_key_dropped(self, spark):
        from vectordb_bioinsight_spark.operators.stats import kruskal_wallis

        df = spark.createDataFrame(
            [("k", "a", 1.0)] * 3 + [("k", "b", 1.0)] * 3, "key string, grp string, v double"
        )
        assert kruskal_wallis(df, ["key"], "grp", "v").count() == 0


class TestR05Stats:
    def test_ab_test_summary_closed_form(self, spark):
        """Hand-built arms: rates and pooled z vs scipy-style arithmetic."""
        import math

        from vectordb_bioinsight_spark.operators.stats import ab_test_summary

        rows = [("A", 1)] * 30 + [("A", 0)] * 70 + [("B", 1)] * 45 + [("B", 0)] * 55
        df = spark.createDataFrame(rows, "arm string, conv int")
        out = {r["arm"]: r for r in ab_test_summary(df, "arm", "conv").collect()}
        assert out["A"]["n"] == 100 and out["A"]["rate"] == 0.3
        assert out["B"]["rate"] == 0.45
        p = 75 / 200
        se = math.sqrt(p * (1 - p) * (1 / 100 + 1 / 100))
        want_z = round((0.3 - 0.45) / se, 6)
        assert out["A"]["z_stat"] == want_z == out["B"]["z_stat"]

    def test_ab_test_degenerate_pool_yields_null_z(self, spark):
        from vectordb_bioinsight_spark.operators.stats import ab_test_summary

        df = spark.createDataFrame(
            [("A", 0)] * 5 + [("B", 0)] * 5, "arm string, conv int"
        )
        out = ab_test_summary(df, "arm", "conv").collect()
        assert all(r["z_stat"] is None for r in out)

    def test_cusum_matches_python_oracle_and_flags_shift(self, spark):
        """30 flat days then a +2-sigma-ish shift: CUSUM must alarm after
        the shift, never before; the whole trace must equal the
        pure-python recursion."""
        from vectordb_bioinsight_spark.operators.stats import cusum_changepoints

        vals = [100.0 + (i % 2) for i in range(30)] + [106.0 + (i % 2) for i in range(15)]
        rows = [("m", f"2024-01-01 00:00:00", v) for v in []]
        import datetime as dt
        d0 = dt.date(2024, 1, 1)
        rows = [("m", f"{d0 + dt.timedelta(days=i)} 00:00:00", v)
                for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k string, ts string, value double").withColumn(
            "ts", F.to_timestamp("ts")
        )
        got = {str(r["day"]): r for r in
               cusum_changepoints(df, "k", "ts", "value", drift=0.5, threshold=4.0).collect()}
        # python oracle
        import statistics
        m, s = statistics.mean(vals), statistics.stdev(vals)
        sp = sm = 0.0
        for i, v in enumerate(vals):
            z = (v - m) / s
            sp = max(0.0, sp + z - 0.5)
            sm = max(0.0, sm - z - 0.5)
            day = str(d0 + dt.timedelta(days=i))
            assert abs(got[day]["s_plus"] - round(sp, 4)) < 1e-9, day
            assert got[day]["alarm"] == (sp > 4.0 or sm > 4.0), day
        # with key-GLOBAL standardization a level shift alarms both
        # regimes (pre-shift sits below the global mean -> s_minus side;
        # post-shift above it -> s_plus side) — the directional check is
        # the meaningful one
        pre_plus = [got[str(d0 + dt.timedelta(days=i))]["s_plus"] for i in range(30)]
        post_plus = [got[str(d0 + dt.timedelta(days=i))]["s_plus"] for i in range(35, 45)]
        assert max(pre_plus) <= 4.0
        assert all(s > 4.0 for s in post_plus)
        assert all(got[str(d0 + dt.timedelta(days=i))]["alarm"] for i in range(35, 45))

    def test_cusum_flat_series_never_alarms(self, spark):
        from vectordb_bioinsight_spark.operators.stats import cusum_changepoints

        import datetime as dt
        d0 = dt.date(2024, 2, 1)
        rows = [("f", f"{d0 + dt.timedelta(days=i)} 00:00:00", 5.0) for i in range(10)]
        df = spark.createDataFrame(rows, "k string, ts string, value double").withColumn(
            "ts", F.to_timestamp("ts")
        )
        out = cusum_changepoints(df, "k", "ts", "value").collect()
        assert len(out) == 10 and not any(r["alarm"] for r in out)

    def test_bootstrap_rate_ci_sanity(self, spark):
        """CI brackets the point rate, is deterministic across runs, and
        tightens with more data."""
        from vectordb_bioinsight_spark.operators.stats import bootstrap_rate_ci

        small = spark.createDataFrame(
            [(i, 1 if i % 5 == 0 else 0) for i in range(100)], "id long, conv int"
        )
        big = spark.createDataFrame(
            [(i, 1 if i % 5 == 0 else 0) for i in range(2000)], "id long, conv int"
        )
        s1 = bootstrap_rate_ci(small, "conv", "id").first()
        s2 = bootstrap_rate_ci(small, "conv", "id").first()
        b = bootstrap_rate_ci(big, "conv", "id").first()
        assert s1 == s2                           # hash-deterministic
        assert s1["ci_lo"] <= s1["rate"] <= s1["ci_hi"]
        assert s1["rate"] == 0.2 and b["rate"] == 0.2
        assert (b["ci_hi"] - b["ci_lo"]) < (s1["ci_hi"] - s1["ci_lo"])
        assert 0.1 < s1["ci_lo"] < 0.2 < s1["ci_hi"] < 0.35
