"""Unit tests for the evaluation / drift / interval / linkage tier —
closed-form fixtures with hand- or sklearn-style-computable answers,
plus the edge cases the oracle-parity sweep can't plant (empty classes,
degenerate bins, identical samples, touching intervals, transitive
fuzzy chains)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.drift import ks_two_sample, psi_drift
from vectordb_bioinsight_spark.operators.evaluation import (
    calibration_bins,
    calibration_summary,
    confusion_at_thresholds,
    pr_curve,
    roc_auc,
)
from vectordb_bioinsight_spark.operators.intervals import (
    coverage_stats,
    merge_intervals,
    pareto_frontier,
)
from vectordb_bioinsight_spark.operators.linkage import (
    fuzzy_name_pairs,
    resolve_entities,
)


# ---------------------------------------------------------------- roc_auc
def test_roc_auc_perfect_and_reversed(spark):
    rows = [("g", 1, 10.0), ("g", 1, 9.0), ("g", 0, 2.0), ("g", 0, 1.0)]
    df = spark.createDataFrame(rows, ["k", "y", "s"])
    out = roc_auc(df, ["k"], "y", "s").collect()[0]
    assert out["auc"] == 1.0 and out["n_pos"] == 2 and out["n_neg"] == 2
    rev = roc_auc(df.withColumn("s", -F.col("s")), ["k"], "y", "s").collect()[0]
    assert rev["auc"] == 0.0


def test_roc_auc_all_tied_is_half_and_single_class_dropped(spark):
    tied = spark.createDataFrame(
        [("g", 1, 5.0), ("g", 0, 5.0), ("g", 1, 5.0), ("g", 0, 5.0)],
        ["k", "y", "s"],
    )
    assert roc_auc(tied, ["k"], "y", "s").collect()[0]["auc"] == 0.5
    one_class = spark.createDataFrame([("g", 1, 1.0), ("g", 1, 2.0)], ["k", "y", "s"])
    assert roc_auc(one_class, ["k"], "y", "s").count() == 0


def test_roc_auc_matches_pair_counting(spark):
    # AUC = P(score_pos > score_neg) + 0.5 P(tie) — brute-force the pairs
    pos = [3.0, 7.0, 7.0, 9.0]
    neg = [1.0, 7.0, 4.0]
    wins = sum(1.0 for p in pos for n in neg if p > n)
    ties = sum(1.0 for p in pos for n in neg if p == n)
    expected = (wins + 0.5 * ties) / (len(pos) * len(neg))
    df = spark.createDataFrame(
        [("g", 1, s) for s in pos] + [("g", 0, s) for s in neg], ["k", "y", "s"]
    )
    got = roc_auc(df, ["k"], "y", "s").collect()[0]["auc"]
    assert got == pytest.approx(expected, abs=1e-6)


# ---------------------------------------------------------------- pr_curve
def test_pr_curve_cumulates_and_bounds(spark):
    df = spark.createDataFrame(
        [(1, 0.9), (0, 0.8), (1, 0.7), (0, 0.3), (1, 0.3)], ["y", "s"]
    )
    rows = {r["score"]: r for r in pr_curve(df, "y", "s").collect()}
    assert rows[0.9]["cum_tp"] == 1 and rows[0.9]["precision"] == 1.0
    assert rows[0.8]["cum_fp"] == 1 and rows[0.8]["precision"] == 0.5
    # tie group at 0.3 lands in one row: all 5 rows cumulated
    assert rows[0.3]["cum_tp"] == 3 and rows[0.3]["recall"] == 1.0


# ------------------------------------------------------------- calibration
def test_calibration_bins_clamps_and_folds_top_edge(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (0, 1.2), (1, -0.5), (0, 0.05)], ["y", "p"]
    )
    rows = {r["bin"]: r for r in calibration_bins(df, "y", "p", n_bins=10).collect()}
    assert set(rows) == {0, 9}
    assert rows[9]["n"] == 2  # p=1.0 and clamped 1.2 fold into the last bin
    assert rows[0]["n"] == 2  # clamped -0.5 joins 0.05
    assert rows[9]["mean_prob"] == 1.0 and rows[9]["frac_pos"] == 0.5


def test_calibration_summary_matches_direct_brier(spark):
    data = [(1, 0.9), (0, 0.2), (1, 0.6), (0, 0.4), (1, 0.3)]
    df = spark.createDataFrame(data, ["y", "p"])
    out = calibration_summary(df, "y", "p", n_bins=5).collect()[0]
    brier = sum((p - y) ** 2 for y, p in data) / len(data)
    obar = sum(y for y, _ in data) / len(data)
    assert out["brier"] == pytest.approx(brier, abs=1e-6)
    assert out["uncertainty"] == pytest.approx(obar * (1 - obar), abs=1e-6)
    # Murphy identity holds exactly when every bin holds one prediction
    # value; here bins {0.2,0.3}/{0.4}/{0.6}/{0.9} mix, so check the
    # decomposition's internal consistency instead: REL,RES >= 0
    assert out["reliability"] >= 0 and out["resolution"] >= 0


# --------------------------------------------------------------- confusion
def test_confusion_counts_and_null_precision(spark):
    df = spark.createDataFrame(
        [(1, 0.9), (1, 0.4), (0, 0.6), (0, 0.1)], ["y", "s"]
    )
    rows = {r["threshold"]: r for r in
            confusion_at_thresholds(df, "y", "s", [0.5, 2.0]).collect()}
    r5 = rows[0.5]
    assert (r5["tp"], r5["fp"], r5["fn"], r5["tn"]) == (1, 1, 1, 1)
    assert r5["precision"] == 0.5 and r5["recall"] == 0.5 and r5["f1"] == 0.5
    r2 = rows[2.0]  # nothing predicted positive -> precision NULL, recall 0
    assert r2["precision"] is None and r2["recall"] == 0.0


# -------------------------------------------------------------------- psi
def test_psi_identical_distributions_is_zero(spark):
    vals = [(float(i % 100),) for i in range(1000)]
    ref = spark.createDataFrame(vals, ["v"])
    out = psi_drift(ref, ref, "v", n_bins=10).collect()
    assert len(out) == 10
    assert out[0]["psi_total"] == pytest.approx(0.0, abs=1e-9)
    assert all(r["ref_n"] == r["cur_n"] for r in out)


def test_psi_empty_current_bin_uses_epsilon(spark):
    ref = spark.createDataFrame([(float(i),) for i in range(100)], ["v"])
    cur = spark.createDataFrame([(float(i),) for i in range(50)], ["v"])
    out = {r["bin"]: r for r in psi_drift(ref, cur, "v", n_bins=10).collect()}
    top = out[9]
    assert top["cur_n"] == 0 and top["cur_frac"] == pytest.approx(1e-6)
    assert math.isfinite(top["psi_term"]) and top["psi_term"] > 0
    total = out[0]["psi_total"]
    assert math.isfinite(total) and total > 0.5  # half the mass moved


def test_psi_nulls_surface_as_counts_not_bin0_mass(spark):
    """ADVICE r05: NULL values must not read as low-end drift — they are
    excluded from the bins and reported in ref_null/cur_null."""
    ref = spark.createDataFrame([(float(i),) for i in range(100)], ["v"])
    cur_clean = spark.createDataFrame([(float(i),) for i in range(100)], ["v"])
    cur_dirty = cur_clean.unionByName(
        spark.createDataFrame([(None,)] * 40, "v double")
    )
    clean = {r["bin"]: r for r in psi_drift(ref, cur_clean, "v", n_bins=10).collect()}
    dirty = {r["bin"]: r for r in psi_drift(ref, cur_dirty, "v", n_bins=10).collect()}
    # bins and PSI identical to the NULL-free batch; NULLs visible as a count
    assert all(dirty[b]["cur_n"] == clean[b]["cur_n"] for b in clean)
    assert dirty[0]["psi_total"] == pytest.approx(clean[0]["psi_total"], abs=1e-9)
    assert dirty[0]["cur_null"] == 40 and dirty[0]["ref_null"] == 0


def test_psi_bin_edges_come_from_reference(spark):
    ref = spark.createDataFrame([(float(i),) for i in range(1, 101)], ["v"])
    out = {r["bin"]: r for r in psi_drift(ref, ref, "v", n_bins=10).collect()}
    assert out[0]["lo"] is None and out[9]["hi"] is None
    assert out[0]["hi"] == pytest.approx(10.9, abs=1e-6)  # type-7 decile


# --------------------------------------------------------------------- ks
def test_ks_identical_zero_and_disjoint_one(spark):
    same = spark.createDataFrame(
        [(g, float(v)) for g in (0, 1) for v in range(50)], ["g", "v"]
    )
    r = ks_two_sample(same, "g", "v").collect()[0]
    assert r["d_stat"] == 0.0 and r["n_a"] == 50 and r["n_b"] == 50
    disjoint = spark.createDataFrame(
        [(1, float(v)) for v in range(10)] + [(0, float(v + 100)) for v in range(10)],
        ["g", "v"],
    )
    r2 = ks_two_sample(disjoint, "g", "v").collect()[0]
    assert r2["d_stat"] == 1.0 and r2["d_at_value"] == 9.0


# --------------------------------------------------------------- intervals
def test_merge_intervals_touching_nested_and_gapped(spark):
    rows = [
        ("a", 1, 5), ("a", 5, 8),      # touching -> one island
        ("a", 2, 3),                   # nested
        ("a", 10, 12),                 # gapped -> second island
        ("b", 1, 2),
    ]
    df = spark.createDataFrame(rows, ["k", "s", "e"])
    out = merge_intervals(df, ["k"], "s", "e").collect()
    a = [r for r in out if r["k"] == "a"]
    assert [(r["island"], r["start"], r["end"], r["n_intervals"]) for r in a] == [
        (1, 1, 8, 3), (2, 10, 12, 1),
    ]


def test_coverage_stats_numeric_units(spark):
    df = spark.createDataFrame(
        [("a", 0.0, 2.0), ("a", 5.0, 6.0)], ["k", "s", "e"]
    )
    r = coverage_stats(df, ["k"], "s", "e", unit_days=False).collect()[0]
    assert r["n_islands"] == 2 and r["covered"] == 3.0
    assert r["span"] == 6.0 and r["gaps"] == 3.0 and r["coverage"] == 0.5


def test_coverage_stats_day_units_inclusive(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [("a", dt.date(2024, 1, 1), dt.date(2024, 1, 3))], ["k", "s", "e"]
    )
    r = coverage_stats(df, ["k"], "s", "e", unit_days=True).collect()[0]
    assert r["covered"] == 3 and r["span"] == 3 and r["coverage"] == 1.0


# ---------------------------------------------------------------- frontier
def test_pareto_frontier_dominance_and_duplicates(spark):
    # (price, size): (1,5) and (3,9) on frontier; (2,4) dominated by (1,5);
    # (3,9) duplicated -> n_rows 2; (4,9) dominated by (3,9) (same size,
    # higher price); (1,4) dominated by (1,5) (same price, lower size)
    rows = [(1, 5), (2, 4), (3, 9), (3, 9), (4, 9), (1, 4)]
    df = spark.createDataFrame(rows, ["price", "size"])
    out = [(r["price"], r["size"], r["n_rows"])
           for r in pareto_frontier(df, "price", "size").collect()]
    assert out == [(1, 5, 1), (3, 9, 2)]


# ----------------------------------------------------------------- linkage
def test_fuzzy_pairs_respect_block_and_distance(spark):
    df = spark.createDataFrame(
        [("cold bolt",), ("old bolt",), ("bold gear",), ("cold ring",)],
        ["name"],
    )
    pairs = fuzzy_name_pairs(
        df, "name", lambda c: F.substring_index(c, " ", -1), max_dist=1
    ).collect()
    got = {(r["name_a"], r["name_b"]): r["dist"] for r in pairs}
    # ring/gear blocks never meet the bolt block, whatever the distance
    assert got == {("cold bolt", "old bolt"): 1}


def test_resolve_entities_transitive_chain(spark):
    # cold-old and gold-old chain through 'old bolt' -> one cluster with
    # canonical = min name 'cold bolt'; singleton maps to itself
    df = spark.createDataFrame(
        [("cold bolt",), ("old bolt",), ("gold bolt",), ("red ring",),
         ("cold bolt",)],
        ["name"],
    )
    out = {r["name"]: (r["canonical"], r["n"]) for r in resolve_entities(
        df, "name", lambda c: F.substring_index(c, " ", -1), max_dist=1
    ).collect()}
    assert out["cold bolt"] == ("cold bolt", 2)
    assert out["old bolt"][0] == "cold bolt"
    assert out["gold bolt"][0] == "cold bolt"
    assert out["red ring"] == ("red ring", 1)


def test_overlap_join_equals_naive_inequality_join(spark):
    """Bin-blocked overlap join == the naive inequality join on random
    intervals, across bin sizes (incl. bins much smaller than interval
    length, where each pair meets in MANY bins — owner-bin dedup must
    keep exactly one)."""
    import random

    from vectordb_bioinsight_spark.operators.intervals import (
        interval_overlap_join,
    )

    rng = random.Random(11)
    mk = lambda n, tag: [  # noqa: E731
        (rng.randint(0, 2), rng.randint(0, 200), 0, f"{tag}{i}")
        for i in range(n)
    ]
    rows_l = [(k, s, s + rng.randint(0, 40), t) for k, s, _, t in mk(60, "L")]
    rows_r = [(k, s, s + rng.randint(0, 40), t) for k, s, _, t in mk(60, "R")]
    left = spark.createDataFrame(rows_l, "key int, start long, end long, tag string")
    right = spark.createDataFrame(rows_r, "key int, start long, end long, tag string")

    naive = {
        (lk, lt, rt)
        for lk, ls, le, lt in rows_l
        for rk, rs, re_, rt in rows_r
        if lk == rk and ls <= re_ and rs <= le
    }
    for bin_size in (5, 32, 1000):
        got = interval_overlap_join(left, right, ["key"], bin_size=bin_size)
        pairs = [
            (r["key"], r["tag_l"], r["tag_r"], r["overlap"])
            for r in got.collect()
        ]
        assert len(pairs) == len(naive), f"bin={bin_size}: dup or missing pairs"
        assert {(k, a, b) for k, a, b, _ in pairs} == naive
        for k, a, b, ov in pairs:
            ls, le = next((s, e) for kk, s, e, t in rows_l if t == a)
            rs, re_ = next((s, e) for kk, s, e, t in rows_r if t == b)
            assert ov == min(le, re_) - max(ls, rs) + 1 and ov >= 1


def test_overlap_join_is_equi_join_no_nested_loop(spark):
    """The physical plan must contain NO BroadcastNestedLoopJoin or
    CartesianProduct — the whole point of bin blocking."""
    from vectordb_bioinsight_spark.operators.intervals import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, 0, 10), (1, 20, 30)], "key int, start long, end long"
    )
    right = spark.createDataFrame(
        [(1, 5, 25)], "key int, start long, end long"
    )
    df = interval_overlap_join(left, right, ["key"], bin_size=8)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_woe_iv_matches_pure_python(spark):
    import math

    from vectordb_bioinsight_spark.operators.encoding import woe_iv

    rows = [("a", 1)] * 8 + [("a", 0)] * 2 + [("b", 1)] * 1 + [("b", 0)] * 9 + [("c", 0)] * 5
    df = spark.createDataFrame(rows, "bucket string, y int")
    tp, tn = 9.0, 16.0
    expect = {}
    for bk, (p, n) in {"a": (8, 2), "b": (1, 9), "c": (0, 5)}.items():
        woe = math.log(((p + 0.5) / tp) / ((n + 0.5) / tn))
        iv = (p / tp - n / tn) * woe
        expect[bk] = (round(woe, 6), round(iv, 6))
    out = {r["bucket"]: r for r in woe_iv(df, "bucket", "y").collect()}
    for bk, (w, iv) in expect.items():
        assert abs(out[bk]["woe"] - w) < 1e-9
        assert abs(out[bk]["iv_contrib"] - iv) < 1e-9
    iv_total = round(sum(v[1] for v in expect.values()), 6)
    assert all(abs(r["iv_total"] - iv_total) < 1e-6 for r in out.values())
    # the empty-pos bucket 'c' is finite thanks to smoothing
    assert math.isfinite(out["c"]["woe"])


def test_session_paths_hand_fixture(spark):
    import datetime as dt

    from vectordb_bioinsight_spark.operators.trends import session_paths

    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    rows = [
        # user 1, session 1: a>b>c>d (only first 3 kept)
        (1, t0, "a", 1), (1, t0 + dt.timedelta(minutes=1), "b", 2),
        (1, t0 + dt.timedelta(minutes=2), "c", 3),
        (1, t0 + dt.timedelta(minutes=3), "d", 4),
        # user 1, session 2 (2h gap): a>b
        (1, t0 + dt.timedelta(hours=3), "a", 5),
        (1, t0 + dt.timedelta(hours=3, minutes=1), "b", 6),
        # user 2, one session: a>b>c
        (2, t0, "a", 7), (2, t0 + dt.timedelta(minutes=5), "b", 8),
        (2, t0 + dt.timedelta(minutes=6), "c", 9),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string, event_id long")
    out = {r["path"]: r for r in session_paths(df, "user_id", "ts", "event_type", "event_id").collect()}
    assert out["a>b>c"]["n_sessions"] == 2 and out["a>b>c"]["n_users"] == 2
    assert out["a>b"]["n_sessions"] == 1 and out["a>b"]["n_users"] == 1
    assert set(out) == {"a>b>c", "a>b"}


class TestDPAggregates:
    def test_noise_distribution_scale(self, spark):
        """Across many keys, the injected noise behaves like Laplace(b):
        mean ~0, mean |noise| ~ b, and higher epsilon means less noise."""
        import statistics

        from vectordb_bioinsight_spark.operators.privacy import dp_counts

        # 400 keys x 50 exact rows each
        rows = [(f"k{i:03d}",) for i in range(400) for _ in range(50)]
        df = spark.createDataFrame(rows, "k string")
        for eps, tol in ((1.0, 0.25), (10.0, 0.05)):
            out = dp_counts(df, ["k"], epsilon=eps, seed=7).collect()
            noise = [r["n_dp"] - 50 for r in out]
            assert abs(statistics.mean(noise)) < 3.0 / eps
            mad = statistics.mean(abs(x) for x in noise)
            # E|Laplace(b)| = b = 1/eps; rounding to int adds <= .5
            assert mad <= 1.0 / eps + 0.55, (eps, mad)

    def test_deterministic_and_seed_sensitive(self, spark):
        from vectordb_bioinsight_spark.operators.privacy import dp_counts

        df = spark.createDataFrame([(f"k{i}",) for i in range(40) for _ in range(9)], "k string")
        a = {r["k"]: r["n_dp"] for r in dp_counts(df, ["k"], seed=1).collect()}
        b = {r["k"]: r["n_dp"] for r in dp_counts(df, ["k"], seed=1).collect()}
        c = {r["k"]: r["n_dp"] for r in dp_counts(df, ["k"], seed=2).collect()}
        assert a == b
        assert a != c  # independent draw under a different seed

    def test_sum_clipping_bounds_sensitivity(self, spark):
        """An adversarial outlier row moves the DP sum by at most
        clip (plus nothing — noise is key-deterministic)."""
        from vectordb_bioinsight_spark.operators.privacy import dp_sum

        base = [("g", 10.0)] * 20
        df1 = spark.createDataFrame(base, "g string, v double")
        df2 = spark.createDataFrame(base + [("g", 1e9)], "g string, v double")
        s1 = dp_sum(df1, ["g"], "v", clip=50.0, epsilon=1.0).first()["sum_dp"]
        s2 = dp_sum(df2, ["g"], "v", clip=50.0, epsilon=1.0).first()["sum_dp"]
        assert abs(s2 - s1) <= 50.0 + 1e-6

    def test_guards(self, spark):
        import pytest as _pytest

        from vectordb_bioinsight_spark.operators.privacy import dp_counts, dp_sum

        df = spark.createDataFrame([("a", 1.0)], "g string, v double")
        with _pytest.raises(ValueError):
            dp_counts(df, ["g"], epsilon=0.0)
        with _pytest.raises(ValueError):
            dp_sum(df, ["g"], "v", clip=-1.0)


def test_nelson_aalen_matches_lifelines_arithmetic(spark):
    """Hand fixture: H(t) == sum d/n with end-of-data censoring, var
    == sum d/n^2 — checked against pure-python arithmetic."""
    import datetime as dt

    from vectordb_bioinsight_spark.operators.trends import nelson_aalen_weeks

    d0 = dt.datetime(2024, 1, 1, 9)
    rows = []
    # u1: weeks 0 (single day); u2,u3: ~2 weeks; u4 active till the end
    spans = {1: 0, 2: 15, 3: 15, 4: 30}
    for u, days in spans.items():
        rows += [(u, d0), (u, d0 + dt.timedelta(days=days))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r["week"]: r for r in nelson_aalen_weeks(df, "user_id", "ts").collect()}
    # week0: risk 4, churn 1 (u1); week2: risk 3, churn 2; week4: risk 1 censored
    assert out[0]["n_risk"] == 4 and out[0]["n_churned"] == 1
    assert abs(out[0]["cum_hazard"] - 0.25) < 1e-9
    assert abs(out[2]["cum_hazard"] - (0.25 + 2 / 3)) < 1e-6
    assert abs(out[2]["hazard_var"] - (1 / 16 + 2 / 9)) < 1e-6
    assert out[4]["n_censored"] == 1 and out[4]["n_churned"] == 0


def test_cumulative_gains_perfect_score_front_loads(spark):
    """A perfectly separating score captures 100% of positives in the
    top bucket(s); lift in bucket 1 ~ 1/positive-rate; final row is
    (1.0, 1.0, 1.0)."""
    from vectordb_bioinsight_spark.operators.trends import cumulative_gains

    rows = [(float(i), 1 if i >= 900 else 0) for i in range(1000)]
    df = spark.createDataFrame(rows, "s double, y int")
    out = {r["bucket"]: r for r in cumulative_gains(df, "y", "s").collect()}
    assert abs(out[1]["cum_capture"] - 1.0) < 1e-6
    assert abs(out[1]["lift"] - 1.0 / out[1]["cum_pop_share"]) < 1e-4
    last = out[max(out)]
    assert abs(last["cum_capture"] - 1.0) < 1e-9
    assert abs(last["cum_pop_share"] - 1.0) < 1e-9
    assert abs(last["lift"] - 1.0) < 1e-9


def test_shapley_attribution_hand_computed(spark):
    """2-channel exact lattice, worked by hand:
    {A}: 2 users 1 conv (v=.5); {B}: 1 user 0 conv (v=0);
    {A,B}: 2 users 2 conv (v=1); {}: 1 direct conv (v:=0).
    phi_A = .5*(.5-0) + .5*(1-0) = .75 ; phi_B = .5*0 + .5*(1-.5) = .25.
    Efficiency: phi_A + phi_B = v(grand) = 1."""
    import datetime as dt

    from vectordb_bioinsight_spark.operators.trends import shapley_attribution

    t0 = dt.datetime(2024, 1, 1, 9)
    rows = []

    def user(u, touches, converts):
        for i, ch in enumerate(touches):
            rows.append((u, ch, t0 + dt.timedelta(minutes=i)))
        if converts:
            rows.append((u, "buy", t0 + dt.timedelta(hours=1)))

    user(1, ["A"], True); user(2, ["A"], False)
    user(3, ["B"], False)
    user(4, ["A", "B"], True); user(5, ["B", "A"], True)
    user(6, [], True)  # direct conversion
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {
        r["channel"]: r
        for r in shapley_attribution(
            df, "user_id", "event_type", "ts", "buy", ["A", "B"]
        ).collect()
    }
    assert abs(out["A"]["shapley"] - 0.75) < 1e-9
    assert abs(out["B"]["shapley"] - 0.25) < 1e-9
    assert out["A"]["n_users_touched"] == 4 and out["B"]["n_users_touched"] == 3
    # post-conversion touches are excluded
    rows.append((6, "A", t0 + dt.timedelta(hours=2)))
    df2 = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out2 = {
        r["channel"]: r
        for r in shapley_attribution(
            df2, "user_id", "event_type", "ts", "buy", ["A", "B"]
        ).collect()
    }
    assert out2 == out


def test_log_rank_matches_pure_python(spark):
    """Log-rank z/chi2 equal a pure-python Mantel computation on a
    synthetic two-cohort lifetime table with censoring."""
    import datetime as dt
    import math
    import random

    from vectordb_bioinsight_spark.operators.trends import log_rank_test

    rng = random.Random(13)
    d0 = dt.date(2024, 1, 1)
    rows, lives = [], {}
    for u in range(120):
        grp = "a" if u % 2 == 0 else "b"
        # cohort b systematically longer-lived
        weeks = rng.randint(0, 5) + (3 if grp == "b" else 0)
        last = d0 + dt.timedelta(days=7 * weeks + rng.randint(0, 3))
        rows.append((u, grp, dt.datetime.combine(d0, dt.time(9))))
        rows.append((u, grp, dt.datetime.combine(last, dt.time(9))))
        lives[u] = (grp, last)
    df = spark.createDataFrame(rows, "user_id long, cohort string, ts timestamp")
    out = log_rank_test(df, "user_id", "ts", "cohort").first()

    max_day = max(l for _, l in lives.values())
    per = [
        ((l - d0).days // 7, g, 0 if (max_day - l).days < 7 else 1)
        for g, l in lives.values()
    ]
    weeks = sorted({w for w, _, _ in per})
    num = var = obs_a = exp_a = 0.0
    for w in weeks:
        r_a = sum(1 for ww, g, _ in per if ww >= w and g == "a")
        r_t = sum(1 for ww, g, _ in per if ww >= w)
        d_a = sum(c for ww, g, c in per if ww == w and g == "a")
        d_t = sum(c for ww, g, c in per if ww == w)
        if r_t <= 1 or d_t == 0:
            continue
        sh = r_a / r_t
        num += d_a - d_t * sh
        obs_a += d_a
        exp_a += d_t * sh
        var += d_t * sh * (1 - sh) * (r_t - d_t) / (r_t - 1)
    z = num / math.sqrt(var)
    assert out["group_a"] == "a" and out["n_a"] == 60 and out["n_b"] == 60
    assert out["observed_a"] == obs_a
    assert abs(out["expected_a"] - round(exp_a, 6)) < 1e-6
    assert abs(out["z"] - round(z, 6)) < 1e-6
    # cohort a churns earlier -> significantly positive z
    assert out["z"] > 2.0


def test_log_rank_group_constancy_guard(spark):
    import datetime as dt

    import pytest as _pytest

    from vectordb_bioinsight_spark.operators.trends import log_rank_test

    df = spark.createDataFrame(
        [(1, "a", dt.datetime(2024, 1, 1)), (1, "b", dt.datetime(2024, 1, 2))],
        "user_id long, cohort string, ts timestamp",
    )
    with _pytest.raises(ValueError, match="constant per user"):
        log_rank_test(df, "user_id", "ts", "cohort")


def test_silhouette_exact_matches_numpy_port(spark):
    """Exact silhouette vs a numpy port of the sklearn statistic
    (sc_pipeline_evaluator.py:911-953) on three planted gaussian blobs."""
    import numpy as np

    from vectordb_bioinsight_spark.operators.evaluation import (
        silhouette_exact,
        silhouette_simplified,
    )

    rng = np.random.default_rng(3)
    pts, labels = [], []
    for c, center in enumerate([(0, 0), (8, 1), (3, 9)]):
        for _ in range(25):
            pts.append(rng.normal(center, 1.0, 2))
            labels.append(c)
    pts = np.array(pts)
    # numpy port
    d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
    d = np.round(d, 6)  # the operators' 6-dp replay contract
    labels = np.array(labels)
    svals = []
    for i in range(len(pts)):
        same = (labels == labels[i]) & (np.arange(len(pts)) != i)
        a = d[i][same].mean()
        b = min(d[i][labels == c].mean() for c in set(labels) if c != labels[i])
        svals.append((b - a) / max(a, b))
    want = {
        int(c): round(float(np.mean([s for s, l in zip(svals, labels) if l == c])), 6)
        for c in set(labels)
    }
    df = spark.createDataFrame(
        [(i, [float(x) for x in p], int(l)) for i, (p, l) in enumerate(zip(pts, labels))],
        "id long, v array<double>, lbl int",
    )
    got = {r["label"]: r for r in silhouette_exact(df, "id", "v", "lbl").collect()}
    for c, s in want.items():
        assert got[c]["mean_silhouette"] == pytest.approx(s, abs=2e-6), c
        assert got[c]["n_points"] == 25
    # simplified: same well-separated blobs score high and agree in sign
    simp = {r["label"]: r["mean_silhouette"]
            for r in silhouette_simplified(df, "id", "v", "lbl").collect()}
    for c in want:
        assert simp[c] > 0.4
    # singleton cluster scores 0 (sklearn convention) in the exact form
    df2 = spark.createDataFrame(
        [(1, [0.0, 0.0], 0), (2, [1.0, 0.0], 0), (3, [9.0, 9.0], 1)],
        "id long, v array<double>, lbl int",
    )
    got2 = {r["label"]: r["mean_silhouette"]
            for r in silhouette_exact(df2, "id", "v", "lbl").collect()}
    assert got2[1] == 0.0


def test_classification_report_matches_python_port(spark):
    """Multiclass report vs a pure-python port of the sklearn formulas
    (robust_model_validation.py:30-31,201-216): random 4-class
    predictions including a class never predicted and one never true."""
    import random
    from collections import Counter

    from vectordb_bioinsight_spark.operators.evaluation import classification_report

    rng = random.Random(77)
    trues = [rng.choice(["a", "b", "c"]) for _ in range(400)]
    preds = [t if rng.random() < 0.7 else rng.choice(["a", "b", "d"])
             for t in trues]
    df = spark.createDataFrame(list(zip(trues, preds)), "t string, p string")
    got = {(r["scope"], r["metric"]): r["value"]
           for r in classification_report(df, "t", "p").collect()}

    labels = sorted(set(trues) | set(preds))
    tn, pn = Counter(trues), Counter(preds)
    tp = Counter(t for t, p in zip(trues, preds) if t == p)
    per = {}
    for l in labels:
        prec = tp[l] / pn[l] if pn[l] else 0.0
        rec = tp[l] / tn[l] if tn[l] else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        per[l] = (prec, rec, f1)
        assert got[(l, "precision")] == pytest.approx(round(prec, 6))
        assert got[(l, "recall")] == pytest.approx(round(rec, 6))
        assert got[(l, "f1")] == pytest.approx(round(f1, 6))
        assert got[(l, "support")] == tn[l]
    s = len(trues)
    c = sum(tp.values())
    assert got[("overall", "accuracy")] == pytest.approx(round(c / s, 6))
    assert got[("macro", "f1")] == pytest.approx(
        round(sum(f for _, _, f in per.values()) / len(labels), 6))
    assert got[("weighted", "f1")] == pytest.approx(
        round(sum(per[l][2] * tn[l] for l in labels) / s, 6))
    pt = sum(pn[l] * tn[l] for l in labels)
    pp = sum(pn[l] ** 2 for l in labels)
    tt = sum(tn[l] ** 2 for l in labels)
    mcc = (c * s - pt) / ((s * s - pp) * (s * s - tt)) ** 0.5
    assert got[("overall", "mcc")] == pytest.approx(round(mcc, 6), abs=1e-6)
    pe = pt / (s * s)
    kappa = (c / s - pe) / (1 - pe)
    assert got[("overall", "kappa")] == pytest.approx(round(kappa, 6), abs=1e-6)


def test_cluster_quality_indices_match_numpy_port(spark):
    """DB/CH vs numpy ports of the sklearn formulas on planted blobs."""
    import numpy as np

    from vectordb_bioinsight_spark.operators.evaluation import (
        cluster_variance_indices,
    )

    rng = np.random.default_rng(11)
    pts, labels = [], []
    for c, center in enumerate([(0, 0), (7, 2), (2, 8), (9, 9)]):
        for _ in range(20):
            pts.append(rng.normal(center, 1.2, 2))
            labels.append(c)
    pts, labels = np.array(pts), np.array(labels)
    ks = sorted(set(labels))
    cents = {c: pts[labels == c].mean(0) for c in ks}
    # per-point distances rounded 6 dp (the operators' replay contract)
    d_own = {c: np.round(np.sqrt(((pts[labels == c] - cents[c]) ** 2).sum(1)), 6)
             for c in ks}
    n, k = len(pts), len(ks)
    W = sum((d_own[c] ** 2).sum() for c in ks)
    grand = sum(cents[c] * (labels == c).sum() for c in ks) / n
    B = sum((labels == c).sum()
            * np.round(np.sqrt(((cents[c] - grand) ** 2).sum()), 6) ** 2 for c in ks)
    ch = (B / (k - 1)) / (W / (n - k))
    s = {c: d_own[c].mean() for c in ks}
    db = np.mean([
        max((s[i] + s[j]) / np.round(np.sqrt(((cents[i] - cents[j]) ** 2).sum()), 6)
            for j in ks if j != i)
        for i in ks
    ])
    df = spark.createDataFrame(
        [(i, [float(x) for x in p], int(l)) for i, (p, l) in enumerate(zip(pts, labels))],
        "id long, v array<double>, lbl int",
    )
    r = cluster_variance_indices(df, "id", "v", "lbl").collect()[0]
    assert r["n_points"] == n and r["n_clusters"] == k
    assert r["calinski_harabasz"] == pytest.approx(round(ch, 4), abs=1e-3)
    assert r["davies_bouldin"] == pytest.approx(round(db, 4), abs=1e-3)
