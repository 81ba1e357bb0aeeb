"""Numpy/scipy oracles for the network operators (SURVEY M2-M4) — the
iterative pieces (power-method eigenvector centrality) that have no single-SQL
DuckDB twin are exact-checked here instead."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators.network import (
    correlation_edges,
    correlation_pvalues,
    degree_centrality,
    eigenvector_centrality,
    hub_scores,
)

EDGES = [
    ("a", "b", 0.9),
    ("a", "c", 0.8),
    ("b", "c", 0.7),
    ("c", "d", 0.6),
    ("d", "e", 0.95),
]


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, ["entity1", "entity2", "corr"])


def _numpy_eig(edges, weighted=False, max_iter=20):
    nodes = sorted({u for e in edges for u in e[:2]})
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for u, v, w in edges:
        A[idx[u], idx[v]] = A[idx[v], idx[u]] = abs(w) if weighted else 1.0
    x = np.full(len(nodes), 1.0 / np.sqrt(len(nodes)))
    for _ in range(max_iter):
        x = A @ x
        x = x / np.linalg.norm(x)
    return dict(zip(nodes, x))


@pytest.mark.parametrize("weighted", [False, True])
def test_eigenvector_centrality_matches_numpy(spark, edges_df, weighted):
    got = {
        r["entity"]: r["eig_centrality"]
        for r in eigenvector_centrality(
            edges_df, weight_col="corr" if weighted else None
        ).collect()
    }
    want = _numpy_eig(EDGES, weighted=weighted)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-6)


def test_degree_centrality(spark, edges_df):
    got = {r["entity"]: r["degree"] for r in degree_centrality(edges_df).collect()}
    assert got == {"a": 2, "b": 2, "c": 3, "d": 2, "e": 1}


def test_hub_scores_ranking(spark, edges_df):
    rows = hub_scores(edges_df, top_k_hubs=2).orderBy(F.desc("hub_score")).collect()
    # c has max degree and max eigenvector centrality -> hub_score 1.0, rank 1
    assert rows[0]["entity"] == "c"
    assert rows[0]["hub_score"] == pytest.approx(1.0)
    assert sum(r["is_hub"] for r in rows) == 2
    # every node present exactly once
    assert sorted(r["entity"] for r in rows) == ["a", "b", "c", "d", "e"]


def test_correlation_edges_matches_numpy(spark):
    rng = np.random.default_rng(7)
    n_ent, n_dim = 6, 12
    X = rng.normal(size=(n_ent, n_dim))
    X[1] = X[0] * 2 + rng.normal(scale=0.01, size=n_dim)  # planted high corr
    rows = [
        (f"e{i}", f"d{j}", float(X[i, j])) for i in range(n_ent) for j in range(n_dim)
    ]
    prof = spark.createDataFrame(rows, ["entity", "dim", "value"])
    got = {
        (r["entity1"], r["entity2"]): r["corr"]
        for r in correlation_edges(prof, "entity", "dim", "value", min_abs_corr=0.0).collect()
    }
    C = np.corrcoef(X)
    assert len(got) == n_ent * (n_ent - 1) // 2
    for (a, b), r in got.items():
        i, j = int(a[1:]), int(b[1:])
        assert r == pytest.approx(round(C[i, j], 6), abs=1e-6)
    assert got[("e0", "e1")] > 0.99


def test_correlation_pvalues_matches_scipy(spark):
    scipy_stats = pytest.importorskip("scipy.stats")
    rows = [("a", "b", 10, 0.8), ("a", "c", 25, -0.4), ("b", "c", 50, 0.1)]
    edges = spark.createDataFrame(rows, ["entity1", "entity2", "n_dims", "corr"])
    got = correlation_pvalues(edges).collect()
    for r in got:
        n, rr = r["n_dims"], r["corr"]
        t = rr * np.sqrt((n - 2) / (1 - rr * rr))
        p = 2 * scipy_stats.t.sf(abs(t), n - 2)
        assert r["t_stat"] == pytest.approx(t, rel=1e-9)
        assert r["pvalue"] == pytest.approx(p, rel=1e-6)


def test_connected_components_two_triangles(spark):
    from vectordb_bioinsight_spark.operators.network import connected_components

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y"), ("y", "z"), ("x", "z")],
        ["entity1", "entity2"],
    )
    got = {r["entity"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "x"}


def test_connected_components_fast_path_matches_distributed(spark):
    """The collected union-find fast path must produce exactly the
    distributed hash-min labels (component = min reachable id), including
    on chains (worst case for propagation) and integer ids."""
    import random

    from vectordb_bioinsight_spark.operators.network import connected_components

    rng = random.Random(7)
    edges = [(i, i + 1) for i in range(0, 20)]  # one long chain
    edges += [(100 + rng.randrange(30), 100 + rng.randrange(30)) for _ in range(40)]
    df = spark.createDataFrame(edges, ["entity1", "entity2"])
    fast = {r["entity"]: r["component"] for r in connected_components(df).collect()}
    dist = {
        r["entity"]: r["component"]
        for r in connected_components(df, collect_below=0).collect()
    }
    assert fast == dist
    # chain fully collapses to its min id
    assert all(fast[i] == 0 for i in range(21))


def test_label_propagation_two_cliques(spark):
    from itertools import combinations

    from vectordb_bioinsight_spark.operators.network import label_propagation

    clique1 = [f"a{i}" for i in range(4)]
    clique2 = [f"b{i}" for i in range(4)]
    edges = [list(p) for p in combinations(clique1, 2)] + [
        list(p) for p in combinations(clique2, 2)
    ] + [["a0", "b0"]]  # single bridge
    df = spark.createDataFrame(edges, ["entity1", "entity2"])
    got = {r["entity"]: r["cluster"] for r in label_propagation(df, max_iter=5).collect()}
    # each clique converges to one label; the bridge does not merge them
    assert len({got[v] for v in clique1}) == 1
    assert len({got[v] for v in clique2}) == 1
    assert got["a1"] != got["b1"]


def test_betweenness_path_and_star(spark):
    from vectordb_bioinsight_spark.operators.network import betweenness_exact_collected

    path = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["entity1", "entity2"]
    )
    got = {r["entity"]: r["betweenness"] for r in betweenness_exact_collected(path).collect()}
    assert got == {"a": 0.0, "b": 2.0, "c": 2.0, "d": 0.0}
    star = spark.createDataFrame(
        [("hub", "s1"), ("hub", "s2"), ("hub", "s3")], ["entity1", "entity2"]
    )
    got = {r["entity"]: r["betweenness"] for r in betweenness_exact_collected(star).collect()}
    assert got["hub"] == 3.0  # C(3,2) leaf pairs
    assert got["s1"] == 0.0


def test_betweenness_guard(spark):
    from vectordb_bioinsight_spark.operators.network import betweenness_exact_collected

    edges = spark.createDataFrame([(str(i), str(i + 1)) for i in range(10)], ["entity1", "entity2"])
    with pytest.raises(ValueError, match="no silent truncation"):
        betweenness_exact_collected(edges, max_nodes=5)


def test_grn_ridge_matches_numpy(spark):
    from vectordb_bioinsight_spark.operators.grn import grn_ridge

    rng = np.random.default_rng(3)
    n_samp = 30
    regs = {"R1": rng.normal(size=n_samp), "R2": rng.normal(size=n_samp)}
    # planted: T1 = 2*R1 - R2 + noise ; T2 = pure noise
    targets = {
        "T1": 2.0 * regs["R1"] - regs["R2"] + rng.normal(scale=0.01, size=n_samp),
        "T2": rng.normal(size=n_samp),
    }
    rows = [
        (g, f"s{i:02d}", float(v))
        for g, vals in {**regs, **targets}.items()
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, ["gene_id", "sample_id", "value"])
    got = {
        (r["target"], r["regulator"]): r["coef"]
        for r in grn_ridge(df, ["R1", "R2"], lam=1.0).collect()
    }
    # numpy oracle: same standardization + closed form
    X = np.column_stack([regs["R1"], regs["R2"]])
    Xz = (X - X.mean(0)) / X.std(0)
    for t, y in targets.items():
        ys = (y - y.mean()) / y.std()
        beta = np.linalg.solve(Xz.T @ Xz + np.eye(2), Xz.T @ ys)
        assert got[(t, "R1")] == pytest.approx(round(beta[0], 6), abs=1e-6)
        assert got[(t, "R2")] == pytest.approx(round(beta[1], 6), abs=1e-6)
    # planted structure recovered: strong positive R1, negative R2 for T1
    assert got[("T1", "R1")] > 0.5
    assert got[("T1", "R2")] < -0.2
    assert abs(got[("T2", "R1")]) < 0.5


def test_laplacian_spectrum_known_graphs(spark):
    from vectordb_bioinsight_spark.operators.network import laplacian_spectrum

    # complete graph K4: normalized Laplacian eigenvalues {0, 4/3, 4/3, 4/3};
    # unnormalized {0, 4, 4, 4} -> algebraic connectivity 4
    from itertools import combinations

    k4 = spark.createDataFrame(
        [list(p) for p in combinations(["a", "b", "c", "d"], 2)], ["entity1", "entity2"]
    )
    got = laplacian_spectrum(k4)
    assert got["eigenvalues"][0] == pytest.approx(0.0, abs=1e-9)
    for v in got["eigenvalues"][1:]:
        assert v == pytest.approx(4.0 / 3.0, abs=1e-6)
    assert got["algebraic_connectivity"] == pytest.approx(4.0, abs=1e-6)
    # disconnected graph: two zero eigenvalues -> spectral gap 0, connectivity 0
    two = spark.createDataFrame([("a", "b"), ("c", "d")], ["entity1", "entity2"])
    got2 = laplacian_spectrum(two)
    assert got2["spectral_gap"] == pytest.approx(0.0, abs=1e-9)
    assert got2["algebraic_connectivity"] == pytest.approx(0.0, abs=1e-9)
    with pytest.raises(ValueError, match="no silent truncation"):
        laplacian_spectrum(k4, max_nodes=2)


def test_correlation_edges_block_matches_pair_join(spark):
    """The BlockMatrix scale path equals the pair-join path on a complete
    matrix (incl. zero-variance exclusion and thresholding)."""
    import numpy as np

    from vectordb_bioinsight_spark.operators.network import (
        correlation_edges,
        correlation_edges_block,
    )

    rng = np.random.default_rng(11)
    base = rng.normal(size=30)
    rows = []
    for g in range(8):
        prof = base * (1 if g % 2 == 0 else -1) + rng.normal(scale=0.5 + g * 0.3, size=30)
        if g == 7:
            prof = np.zeros(30)  # zero-variance entity must be dropped
        rows += [(f"g{g}", int(dd), float(x)) for dd, x in enumerate(prof)]
    df = spark.createDataFrame(rows, ["gene", "dim", "val"])
    a = correlation_edges(df, "gene", "dim", "val", min_abs_corr=0.2)
    b = correlation_edges_block(df, "gene", "dim", "val", min_abs_corr=0.2)
    ka = {(r["entity1"], r["entity2"]): (r["n_dims"], r["corr"]) for r in a.collect()}
    kb = {(r["entity1"], r["entity2"]): (r["n_dims"], r["corr"]) for r in b.collect()}
    assert ka.keys() == kb.keys()
    for key in ka:
        assert ka[key][0] == kb[key][0]
        assert abs(ka[key][1] - kb[key][1]) < 2e-6, key


def test_closeness_path_and_star(spark):
    from vectordb_bioinsight_spark.operators.network import closeness_exact_collected

    # path a-b-c-d-e: closed-form wf_improved closeness by position
    path = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], ["entity1", "entity2"]
    )
    got = {r["entity"]: r["closeness"] for r in closeness_exact_collected(path).collect()}
    assert got["a"] == pytest.approx(4 / 10, abs=1e-6)
    assert got["b"] == pytest.approx(4 / 7, abs=1e-6)
    assert got["c"] == pytest.approx(4 / 6, abs=1e-6)
    assert got["e"] == pytest.approx(4 / 10, abs=1e-6)
    # star: center 1.0, each leaf (3/5)*(3/3)
    star = spark.createDataFrame(
        [("hub", "s1"), ("hub", "s2"), ("hub", "s3")], ["entity1", "entity2"]
    )
    got = {r["entity"]: r["closeness"] for r in closeness_exact_collected(star).collect()}
    assert got["hub"] == pytest.approx(1.0)
    assert got["s1"] == pytest.approx(0.6, abs=1e-6)


def test_closeness_disconnected_matches_networkx_convention(spark):
    from vectordb_bioinsight_spark.operators.network import closeness_exact_collected

    # components {a-b} and {c-d-e}; n=5 — wf_improved scales by (r-1)/(n-1)
    df = spark.createDataFrame(
        [("a", "b"), ("c", "d"), ("d", "e")], ["entity1", "entity2"]
    )
    got = {r["entity"]: r["closeness"] for r in closeness_exact_collected(df).collect()}
    assert got["a"] == pytest.approx((1 / 1) * (1 / 4), abs=1e-6)
    assert got["c"] == pytest.approx((2 / 3) * (2 / 4), abs=1e-6)
    assert got["d"] == pytest.approx((2 / 2) * (2 / 4), abs=1e-6)


def test_closeness_collect_guard(spark, edges_df):
    from vectordb_bioinsight_spark.operators.network import closeness_exact_collected

    with pytest.raises(ValueError, match="collect bound"):
        closeness_exact_collected(edges_df, max_nodes=2)


def test_hub_scores_full_star_blend(spark):
    """Star center: sole candidate at min_degree=2 -> every norm is 1 ->
    hub_score = 0.35+0.30+0.25+0.10 = 1.0 (the reference blend weights)."""
    from vectordb_bioinsight_spark.operators.network import hub_scores_full

    star = spark.createDataFrame(
        [("hub", "s1"), ("hub", "s2"), ("hub", "s3")], ["entity1", "entity2"]
    )
    rows = hub_scores_full(star, top_k_hubs=1, min_degree=2).collect()
    assert len(rows) == 1 and rows[0]["entity"] == "hub"
    assert rows[0]["hub_score"] == pytest.approx(1.0)
    assert rows[0]["degree"] == 3 and rows[0]["is_hub"]
    assert rows[0]["betweenness"] == pytest.approx(3.0)  # C(3,2) leaf pairs
    assert rows[0]["closeness"] == pytest.approx(1.0)


def test_hub_scores_full_fallback_all_nodes(spark):
    """No node reaches min_degree=5 -> candidates fall back to ALL nodes
    (agent2_network.py:262-266)."""
    from vectordb_bioinsight_spark.operators.network import hub_scores_full

    path = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], ["entity1", "entity2"]
    )
    rows = hub_scores_full(path, top_k_hubs=2, min_degree=5).collect()
    assert len(rows) == 5  # fallback keeps everyone
    by_ent = {r["entity"]: r for r in rows}
    # middle of the path dominates every metric -> blend 1.0
    assert by_ent["c"]["hub_score"] == pytest.approx(1.0)
    # path betweenness closed form: i*(n-1-i)
    assert by_ent["b"]["betweenness"] == pytest.approx(3.0)
    assert by_ent["c"]["betweenness"] == pytest.approx(4.0)
    assert sum(r["is_hub"] for r in rows) == 2


def test_cluster_connectivity_ratio_to_random(spark):
    from vectordb_bioinsight_spark.operators.network import cluster_connectivity

    # two 3-cliques bridged by one edge; a third isolated pair of clusters
    edges = [
        ("a1", "a2"), ("a1", "a3"), ("a2", "a3"),
        ("b1", "b2"), ("b1", "b3"), ("b2", "b3"),
        ("a1", "b1"),  # the bridge
        ("c1", "c2"),
    ]
    e = spark.createDataFrame(edges, ["entity1", "entity2"])
    cl = spark.createDataFrame(
        [(x, x[0].upper()) for x in "a1 a2 a3 b1 b2 b3 c1 c2".split()],
        ["entity", "cluster"],
    )
    got = {(r["cluster_a"], r["cluster_b"]): r for r in cluster_connectivity(e, cl).collect()}
    # expected inter(A,B) under uniform wiring: 3*3*8/(8*7/2) = 2.571 ->
    # observed 1 edge -> connectivity ~0.389, above the 0.05 threshold
    assert ("A", "B") in got and got[("A", "B")]["n_edges"] == 1
    import pytest as pt

    assert got[("A", "B")]["connectivity"] == pt.approx(1 / (3 * 3 * 8 / 28), abs=1e-6)
    # no A-C or B-C edges at all -> absent
    assert ("A", "C") not in got and ("B", "C") not in got


def test_pagerank_matches_numpy_recurrence(spark):
    """pagerank == the same damped recurrence run in numpy (star + tail
    graph, 10 iterations, 6 dp)."""
    import numpy as np

    from vectordb_bioinsight_spark.operators.network import pagerank

    edges = [("hub", x) for x in ("a", "b", "c", "d")] + [("d", "e"), ("e", "f")]
    e = spark.createDataFrame(edges, ["entity1", "entity2"])
    got = {r["entity"]: r["pagerank"] for r in pagerank(e, 0.85, 10).collect()}

    nodes = sorted({u for p in edges for u in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    adj = np.zeros((n, n))
    for u, v in edges:
        adj[idx[u], idx[v]] = adj[idx[v], idx[u]] = 1.0
    deg = adj.sum(axis=1)
    pr = np.full(n, 1.0 / n)
    for _ in range(10):
        pr = (1 - 0.85) / n + 0.85 * adj.T @ (pr / deg)
    for v in nodes:
        assert got[v] == round(float(pr[idx[v]]), 6), v
    # the hub dominates; its degree-1 leaves are the minimum
    assert got["hub"] == max(got.values()) and got["a"] == min(got.values())


class TestKCore:
    def test_planted_peel_cascade(self, spark):
        """Path tail hanging off a triangle: the 2-core is exactly the
        triangle, and reaching it needs an ITERATIVE cascade (peeling t1
        drops t2's degree below 2, and so on) — one round is not enough,
        which is what the fixed-round unroll must cover."""
        from vectordb_bioinsight_spark.operators.network import kcore_peel

        edges = [("a", "b"), ("b", "c"), ("c", "a"),          # triangle
                 ("a", "t1"), ("t1", "t2"), ("t2", "t3")]     # pendant path
        df = spark.createDataFrame(edges, "s string, d string")
        out = {r["node"]: r["core_degree"] for r in
               kcore_peel(df, "s", "d", k=2, rounds=4).collect()}
        assert out == {"a": 2, "b": 2, "c": 2}
        # insufficient rounds leave the over-approximation (documented):
        partial = {r["node"] for r in kcore_peel(df, "s", "d", k=2, rounds=1).collect()}
        assert {"a", "b", "c"} < partial

    def test_complete_graph_is_its_own_core(self, spark):
        from itertools import combinations

        from vectordb_bioinsight_spark.operators.network import kcore_peel

        nodes = [f"n{i}" for i in range(5)]
        df = spark.createDataFrame(list(combinations(nodes, 2)), "s string, d string")
        out = {r["node"]: r["core_degree"] for r in
               kcore_peel(df, "s", "d", k=4, rounds=2).collect()}
        assert out == {n: 4 for n in nodes}
        assert kcore_peel(df, "s", "d", k=5, rounds=2).count() == 0


class TestLinkPrediction:
    def test_scores_match_networkx_style_reference(self, spark):
        """Square + chord fixture, hand-checked: non-edge (1,3) of square
        1-2-3-4 has CN {2,4}, Jaccard 2/2=1, AA 1/ln2+1/ln2 when degrees
        are 2."""
        import math

        from vectordb_bioinsight_spark.operators.network import link_prediction

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (1, 4)], "item1 int, item2 int"
        )
        out = {(r["u"], r["v"]): r for r in link_prediction(edges).collect()}
        assert set(out) == {(1, 3), (2, 4)}
        r = out[(1, 3)]
        assert r["cn"] == 2 and r["jaccard"] == 1.0
        assert abs(r["aa"] - 2 / math.log(2)) < 1e-5

    def test_matches_bruteforce_on_random_graph(self, spark):
        """All three scores equal a pure-python neighborhood computation
        on a random graph (existing edges excluded)."""
        import math
        import random

        from vectordb_bioinsight_spark.operators.network import link_prediction

        rng = random.Random(17)
        edges = sorted(
            {
                tuple(sorted(rng.sample(range(12), 2)))
                for _ in range(30)
            }
        )
        nbrs: dict[int, set[int]] = {}
        for a, b in edges:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        expect = {}
        nodes = sorted(nbrs)
        for i, u in enumerate(nodes):
            for v in nodes[i + 1 :]:
                if v in nbrs[u]:
                    continue
                common = nbrs[u] & nbrs[v]
                if not common:
                    continue
                cn = len(common)
                expect[(u, v)] = (
                    cn,
                    round(cn / len(nbrs[u] | nbrs[v]), 6),
                    round(sum(1 / math.log(len(nbrs[w])) for w in common), 6),
                )
        df = spark.createDataFrame(edges, "item1 int, item2 int")
        got = {
            (r["u"], r["v"]): (r["cn"], r["jaccard"], r["aa"])
            for r in link_prediction(df).collect()
        }
        assert got.keys() == expect.keys()
        for k in expect:
            assert got[k][0] == expect[k][0]
            assert abs(got[k][1] - expect[k][1]) < 1e-6
            assert abs(got[k][2] - expect[k][2]) < 1e-6

    def test_max_degree_drops_hub_wedges_only(self, spark):
        """A star hub above the cap contributes no wedges, but its
        degree still counts in Jaccard denominators."""
        from vectordb_bioinsight_spark.operators.network import link_prediction

        # hub 0 connects to 1..5; plus chain 1-6, 2-6 (center 6, deg 2)
        rows = [(0, i) for i in range(1, 6)] + [(1, 6), (2, 6)]
        edges = spark.createDataFrame(rows, "item1 int, item2 int")
        capped = {
            (r["u"], r["v"]): r
            for r in link_prediction(edges, max_degree=3).collect()
        }
        # hub-0-centered wedges (e.g. (1,3),(2,5)...) are gone; only
        # wedges through sub-cap centers survive: (1,2) via 6, and (0,6)
        # via centers 1 and 2
        assert set(capped) == {(1, 2), (0, 6)}
        r = capped[(1, 2)]
        # deg(1)=2 (0 and 6), deg(2)=2 -> union 3 with cn 1
        assert r["cn"] == 1 and abs(r["jaccard"] - round(1 / 3, 6)) < 1e-9
        r06 = capped[(0, 6)]
        # hub degree STILL counts in the denominator: 2/(5+2-2)
        assert r06["cn"] == 2 and abs(r06["jaccard"] - 0.4) < 1e-9


def test_association_rules_hand_computed(spark):
    """3 baskets: {x,y}, {x,y}, {x,z} — rule x->y: n_ab 2, conf 2/3,
    lift (2/3)/(2/3)=1.0; y->x: conf 1.0, lift 1.0/(3/3)=1.0;
    x->z filtered by min_cooc 2."""
    from vectordb_bioinsight_spark.operators.joins import association_rules

    rows = [("x", 1), ("y", 1), ("x", 2), ("y", 2), ("x", 3), ("z", 3)]
    df = spark.createDataFrame(rows, "item string, basket int")
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(df, "item", "basket", min_cooc=2).collect()
    }
    assert set(out) == {("x", "y"), ("y", "x")}
    xy = out[("x", "y")]
    assert xy["n_ab"] == 2 and xy["n_a"] == 3 and xy["n_b"] == 2
    assert abs(xy["support"] - round(2 / 3, 6)) < 1e-9
    assert abs(xy["confidence"] - round(2 / 3, 6)) < 1e-9
    assert abs(xy["lift"] - 1.0) < 1e-6
    yx = out[("y", "x")]
    assert yx["confidence"] == 1.0 and abs(yx["lift"] - 1.0) < 1e-6


class TestPersonalizedPageRank:
    def test_restart_concentrates_at_seed_and_fast_equals_distributed(self, spark):
        from vectordb_bioinsight_spark.operators.network import (
            personalized_pagerank,
        )

        # barbell: clique a0-a1-a2 — bridge — clique b0-b1-b2; seed a0
        edges = spark.createDataFrame(
            [("a0", "a1"), ("a1", "a2"), ("a0", "a2"),
             ("a2", "b0"), ("b0", "b1"), ("b1", "b2"), ("b0", "b2")],
            "entity1 string, entity2 string",
        )
        fast = {r["entity"]: r["ppr"]
                for r in personalized_pagerank(edges, ["a0"]).collect()}
        dist = {r["entity"]: r["ppr"]
                for r in personalized_pagerank(edges, ["a0"], collect_below=0).collect()}
        assert fast == dist
        # total mass ~1 (walk with restart conserves probability)
        assert abs(sum(fast.values()) - 1.0) < 1e-3
        # seed side dominates: a-nodes outrank the far clique's b1/b2
        assert fast["a0"] == max(fast.values())
        assert min(fast["a1"], fast["a2"]) > max(fast["b1"], fast["b2"])

    def test_empty_sources_guard(self, spark):
        import pytest as _pytest

        from vectordb_bioinsight_spark.operators.network import (
            personalized_pagerank,
        )

        edges = spark.createDataFrame([("a", "b")], "entity1 string, entity2 string")
        with _pytest.raises(ValueError):
            personalized_pagerank(edges, [])


def test_pagerank_dense_graph_edge_bound_routes_distributed(spark, monkeypatch):
    """A graph under the NODE cap but over the EDGE budget must refuse the
    driver route (VERDICT r10 item 2: the node probe alone left a dense
    under-cap graph free to collect O(n²) edge rows) — and the distributed
    loop it falls back to must produce the identical scores."""
    from vectordb_bioinsight_spark.operators import network
    from vectordb_bioinsight_spark.operators.network import (
        _small_graph_rows,
        _symmetrize,
        pagerank,
    )

    # complete graph K6: 6 nodes, 15 undirected edges -> 30 directed rows
    nodes = [f"n{i}" for i in range(6)]
    edges = [(a, b) for i, a in enumerate(nodes) for b in nodes[i + 1:]]
    e = spark.createDataFrame(edges, "entity1 string, entity2 string")

    driver_route = {r["entity"]: r["pagerank"] for r in pagerank(e, 0.85, 5).collect()}

    monkeypatch.setattr(network, "_EDGE_ROWS_BELOW", 10)
    # probe refuses: 6 <= collect_below but 30 directed rows > 10
    assert _small_graph_rows(_symmetrize(e), collect_below=2048) == (None, None)
    distributed = {r["entity"]: r["pagerank"] for r in pagerank(e, 0.85, 5).collect()}

    assert distributed == driver_route
    # K6 is vertex-transitive: every node gets exactly 1/6
    assert set(distributed.values()) == {round(1.0 / 6.0, 6)}
