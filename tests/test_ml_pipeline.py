"""M9/M10 capability: leak-free group split + Spark ML classifier on the
embeddings table; S3 section structuring."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vectordb_bioinsight_spark.operators.ml_pipeline import embedding_classifier, group_split
from vectordb_bioinsight_spark.sources.readers import load_table, sections_from_text


def test_group_split_deterministic_and_disjoint(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    tr1, te1 = group_split(emb, "vec_id", test_frac=0.25)
    tr2, te2 = group_split(emb, "vec_id", test_frac=0.25)
    assert tr1.count() + te1.count() == emb.count()
    assert te1.count() == te2.count()
    ids_tr = {r["vec_id"] for r in tr1.select("vec_id").collect()}
    ids_te = {r["vec_id"] for r in te1.select("vec_id").collect()}
    assert not ids_tr & ids_te
    # rough proportions
    assert 0.1 < len(ids_te) / (len(ids_tr) + len(ids_te)) < 0.4


def test_embedding_classifier_beats_chance(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    train, test = group_split(emb, "vec_id", test_frac=0.25)
    scorer = embedding_classifier(train, pca_k=16)
    acc_train = scorer.accuracy(train)
    acc_test = scorer.accuracy(test)
    n_labels = emb.select("label").distinct().count()
    assert acc_train > 2.0 / n_labels, acc_train
    # generalization only needs to beat chance — embeddings may be weakly
    # label-separable in the synthetic data
    assert acc_test > 1.0 / n_labels, acc_test
    scored = scorer.transform(test)
    assert "prediction" in scored.columns and scored.count() == test.count()


def _separable_df(spark, n=240, dims=8, seed=5):
    """Binary-label data where dim 0 carries the signal and the rest is
    noise — the shape that makes attribution/importance rankings testable."""
    import numpy as np

    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, dims))
    y = (x[:, 0] > 0).astype(int)
    x[:, 0] += 2.0 * (2 * y - 1)  # widen the margin
    return spark.createDataFrame(
        [(i, row.tolist(), int(lbl)) for i, (row, lbl) in enumerate(zip(x, y))],
        "vec_id long, embedding array<double>, label int",
    )


def test_ensemble_accuracy_band_and_agreement(spark):
    """M10 ensemble analog: soft-vote of N seeded bagged members must sit in
    the single-model accuracy band (>= member - 5pp), agreement must be a
    valid fraction of members, and every row gets a confidence band."""
    from vectordb_bioinsight_spark.operators.ml_pipeline import ensemble_classifier

    df = _separable_df(spark)
    train, test = group_split(df, "vec_id", test_frac=0.3)
    single = embedding_classifier(train, max_iter=25)
    ens = ensemble_classifier(train, n_models=3, bag_fraction=0.8, max_iter=25)
    acc_single = single.accuracy(test)
    acc_ens = ens.accuracy(test, "vec_id")
    assert acc_ens >= acc_single - 0.05, (acc_ens, acc_single)
    assert acc_ens > 0.8  # strongly separable by construction
    scored = ens.transform(test, "vec_id").collect()
    assert len(scored) == test.count()
    for r in scored:
        assert r["agreement"] in (0.0, 1 / 3, 2 / 3, 1.0) or abs(
            r["agreement"] * 3 - round(r["agreement"] * 3)
        ) < 1e-4
        assert r["confidence"] in ("high", "medium", "low")
        assert 0.0 <= r["mean_prob"] <= 1.0


def test_linear_attribution_ranks_signal_feature_first(spark):
    from vectordb_bioinsight_spark.operators.ml_pipeline import (
        linear_feature_attribution,
    )

    df = _separable_df(spark)
    scorer = embedding_classifier(df, max_iter=25)
    attr = linear_feature_attribution(scorer, df).collect()
    assert attr[0]["feature"] == 0, [(r["feature"], r["mean_abs_contrib"]) for r in attr[:3]]
    assert attr[0]["mean_abs_contrib"] > 2 * attr[-1]["mean_abs_contrib"]


def test_permutation_importance_detects_signal_feature(spark):
    from vectordb_bioinsight_spark.operators.ml_pipeline import permutation_importance

    df = _separable_df(spark)
    scorer = embedding_classifier(df, max_iter=25)
    imp = {r["feature"]: r["importance"] for r in
           permutation_importance(scorer, df, "embedding", "label", dims=[0, 3]).collect()}
    assert imp[0] > 0.2, imp          # breaking the signal dim hurts a lot
    assert imp[0] > imp[3] + 0.1, imp  # noise dim barely matters


def test_sections_from_text(spark):
    rows = [
        (1, "Introduction\nThis is the intro body.\n\nMethods\nWe did things.\n\n" + "x" * 100),
        (2, "no blank lines single section"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = sections_from_text(df, "doc_id", "text").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    d1 = sorted(by_doc[1], key=lambda r: r["section_idx"])
    assert [r["header"] for r in d1[:2]] == ["Introduction", "Methods"]
    assert d1[1]["body"].startswith("Methods")
    assert d1[2]["header"] == ""  # 100-char line: too long for a header
    assert len(by_doc[2]) == 1


def test_centroid_permutation_importance_detects_signal_feature(spark):
    """Planted signal: dim 0 fully determines the label, dims 1-3 are
    deterministic pseudo-noise — permuting dim 0 must crater accuracy
    (top importance), permuting a noise dim must not. Fully relational,
    so this is the hash-oracle-able M10 explanation member."""
    from vectordb_bioinsight_spark.operators.ml_pipeline import (
        centroid_permutation_importance,
    )

    rows = []
    for i in range(200):
        label = i % 2
        noise = [((i * 7 + j * 13) % 11 - 5.0) / 10.0 for j in range(3)]
        rows.append((i, [10.0 * label - 5.0] + noise, label))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = {r["feature"]: r for r in
           centroid_permutation_importance(
               df, "vec_id", "embedding", "label", dims=[0, 2], n_buckets=16
           ).collect()}
    assert out[1]["base_accuracy"] == 1.0
    # cyclic shift within even/odd-mixed buckets moves ~half the signal
    # values across classes -> large drop
    assert out[1]["importance"] > 0.3
    assert abs(out[3]["importance"]) < 0.05
    assert out[1]["importance"] > out[3]["importance"]


def test_centroid_importance_one_pass_matches_per_pass_reference(spark):
    """r11 one-pass restructure pin: the feature-tagged single scoring
    chain must reproduce the per-pass reference EXACTLY — same per-feature
    accuracies — on data with ties and an untested middle dim (the
    x_perm-is-NULL band the feature==dim predicate must never select)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vectordb_bioinsight_spark.functions.hashing import portable_hash64
    from vectordb_bioinsight_spark.operators.ml_pipeline import (
        centroid_permutation_importance,
    )

    rows = []
    for i in range(120):
        label = i % 3
        # dim0 signal, dim1 untested, dim2 tied-heavy, dim3 anti-signal
        rows.append(
            (i, [float(label), (i % 5) / 2.0, float(i % 2), -float(label)], label)
        )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    dims, n_buckets = [0, 2, 3], 8

    # per-pass reference, computed inline exactly like the pre-r11 operator
    ex = df.select(
        F.col("vec_id").alias("id"), F.col("label").alias("y"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim0", "x"),
    ).select("id", "y", (F.col("dim0") + 1).alias("dim"), "x")
    centroids = ex.groupBy(F.col("y").alias("label_c"), "dim").agg(
        F.round(F.avg("x"), 6).alias("c")
    )

    def accuracy(frame):
        d2 = (
            frame.join(F.broadcast(centroids), "dim")
            .groupBy("id", "y", "label_c")
            .agg(F.round(F.sum((F.col("x") - F.col("c")) ** 2), 6).alias("dist"))
        )
        w = Window.partitionBy("id").orderBy(F.asc("dist"), F.asc("label_c"))
        pred = d2.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
        return pred.agg(
            F.round(F.avg((F.col("label_c") == F.col("y")).cast("double")), 6)
        ).collect()[0][0]

    h = portable_hash64(F.col("id").cast("string"))
    expected = {}
    base = accuracy(ex)
    for d in dims:
        wp = Window.partitionBy(F.pmod(h, F.lit(n_buckets))).orderBy(h, F.col("id"))
        sub = ex.filter(F.col("dim") == d + 1).withColumn(
            "x", F.coalesce(F.lead("x", 1).over(wp), F.first("x").over(wp))
        )
        expected[d + 1] = accuracy(ex.filter(F.col("dim") != d + 1).unionByName(sub))

    got = {
        r["feature"]: r
        for r in centroid_permutation_importance(
            df, "vec_id", "embedding", "label", dims=dims, n_buckets=n_buckets
        ).collect()
    }
    assert set(got) == set(expected)
    for f, acc in expected.items():
        assert got[f]["base_accuracy"] == base
        assert got[f]["permuted_accuracy"] == acc
        assert got[f]["importance"] == round(base - acc, 6)
