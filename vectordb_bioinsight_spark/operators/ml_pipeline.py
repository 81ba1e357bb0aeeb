"""ML classification capability — SURVEY.md M9/M10.

The reference trains CatBoost ensembles on TCGA expression matrices
(ml/pancancer_classifier.py:702-1015) with a leak-free preprocessing pipeline
(ml/preprocessor.py:124-267: group-aware split → filter → CPM → log2 → HVG →
scale → PCA). The engine's native analog is a Spark ML ``Pipeline`` — the
model itself is a capability analog (logistic regression / any MLlib
classifier), because CatBoost parity is a model-weights question, not a
query-engine question; external models score distributively via pandas_udf
broadcast (SURVEY M10 mapping).

Key leak-free piece kept exactly: the GROUP-aware split — all rows of one
group (patient) land on the same side, decided by a salted portable hash, so
the split is deterministic and reproducible across engines/runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_split(
    df: DataFrame,
    group_col: str,
    test_frac: float = 0.25,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """GroupShuffleSplit analog (preprocessor.py:124-180): assign each GROUP
    (not row) to train/test by hashing group_id+seed — deterministic, no
    collect, no leakage of a group across the boundary.

    Returns (train, test)."""
    bucket = F.pmod(F.xxhash64(F.col(group_col).cast("string"), F.lit(seed)), F.lit(10000))
    test = df.filter(bucket < int(test_frac * 10000))
    train = df.filter(bucket >= int(test_frac * 10000))
    return train, test


def embedding_classifier(
    train: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    pca_k: int | None = None,
    max_iter: int = 50,
):
    """Fit the M9 pipeline natively: array→vector, standard-scale, optional
    PCA, logistic regression. Returns the fitted PipelineModel; score with
    ``model.transform(df)`` (adds prediction/probability columns) — the
    distributed inference path.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import PCA, StandardScaler
    from pyspark.ml.functions import array_to_vector

    prepared = train.withColumn("_features_raw", array_to_vector(F.col(vec_col).cast("array<double>")))
    stages = [
        StandardScaler(inputCol="_features_raw", outputCol="_scaled", withMean=True, withStd=True),
    ]
    feat_col = "_scaled"
    if pca_k is not None:
        stages.append(PCA(k=pca_k, inputCol="_scaled", outputCol="_pca"))
        feat_col = "_pca"
    stages.append(
        LogisticRegression(
            featuresCol=feat_col, labelCol=label_col, maxIter=max_iter, regParam=0.01
        )
    )
    model = Pipeline(stages=stages).fit(prepared)

    class _Scorer:
        """Wraps the PipelineModel so callers pass raw array<float> frames."""

        def __init__(self, m):
            self.model = m

        def transform(self, df: DataFrame) -> DataFrame:
            return self.model.transform(
                df.withColumn("_features_raw", array_to_vector(F.col(vec_col).cast("array<double>")))
            )

        def accuracy(self, df: DataFrame) -> float:
            scored = self.transform(df)
            agg = scored.agg(
                F.avg((F.col("prediction") == F.col(label_col).cast("double")).cast("double"))
            ).first()[0]
            return float(agg)

    return _Scorer(model)


def knn_label_probs(
    queries: DataFrame,
    candidates: DataFrame,
    query_id_col: str,
    cand_id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 5,
    path: str = "gemm",
) -> DataFrame:
    """Per-label soft probabilities from ONE kNN model: prob(label) =
    vote share among the top-k neighbors (votes/k), plus the summed cosine
    as the deterministic tiebreaker. One ensemble member for
    :func:`soft_vote_ensemble` — fully SQL-expressible, unlike a trained
    model, so the composed ensemble stays hash-oracle-able.

    Output: (query_id, label, prob, vote_score) — one row per label that
    received >= 1 vote; absent labels are implicit zeros.
    """
    from vectordb_bioinsight_spark.operators.vector import knn_join, knn_join_gemm

    join_fn = knn_join_gemm if path == "gemm" else knn_join
    neigh = join_fn(
        queries, candidates, query_id_col, cand_id_col, vec_col, k=k, metric="cosine"
    )
    labeled = neigh.join(
        candidates.select(F.col(cand_id_col).alias("cand_id"), F.col(label_col).alias("label")),
        "cand_id",
    )
    return labeled.groupBy("query_id", "label").agg(
        F.round(F.count("*") / F.lit(float(k)), 6).alias("prob"),
        F.round(F.sum("score"), 6).alias("vote_score"),
    )


def knn_vote_members(
    queries: DataFrame,
    candidates: DataFrame,
    query_id_col: str,
    cand_id_col: str,
    vec_col: str,
    label_col: str,
    ks: "tuple[int, ...]" = (3, 5, 7),
    path: str = "gemm",
) -> "list[DataFrame]":
    """All kNN ensemble members from ONE neighbor pass: the k=max(ks) result
    is a superset of every member (smaller-k neighbor sets are prefixes of
    the ranked list by construction), so one corpus scan + one top-k serves
    them all — per-member joins would re-score the corpus len(ks) times for
    identical prefixes (review finding r04). The shared neighbor table is
    lazily checkpointed so the union DAG materializes it once.

    Returns one (query_id, label, prob, vote_score) frame per k, ready for
    :func:`soft_vote_ensemble`.
    """
    from vectordb_bioinsight_spark.operators.vector import knn_join, knn_join_gemm

    join_fn = knn_join_gemm if path == "gemm" else knn_join
    neigh = join_fn(
        queries, candidates, query_id_col, cand_id_col, vec_col,
        k=max(ks), metric="cosine",
    ).localCheckpoint(eager=False)
    labeled = neigh.join(
        candidates.select(
            F.col(cand_id_col).alias("cand_id"), F.col(label_col).alias("label")
        ),
        "cand_id",
    )
    members = []
    for k in ks:
        members.append(
            labeled.filter(F.col("rank") <= k)
            .groupBy("query_id", "label")
            .agg(
                F.round(F.count("*") / F.lit(float(k)), 6).alias("prob"),
                F.round(F.sum("score"), 6).alias("vote_score"),
            )
        )
    return members


def soft_vote_ensemble(per_model: "list[DataFrame]") -> DataFrame:
    """Soft-vote ensemble aggregation with agreement + confidence bands —
    the Spark-native analog of the reference's CatBoost soft-vote ensemble
    (rnaseq_pipeline/ml/pancancer_classifier.py:702-1015: per-model
    probabilities averaged, ensemble label = argmax, agreement fraction and
    high/medium/low confidence bands attached per sample).

    Each input frame is one model's output: (query_id, label, prob,
    vote_score); labels a model omits count as prob 0. All arithmetic is
    engine-portable (rounded means, total-order tiebreaks), so an ensemble
    of SQL-expressible members (e.g. :func:`knn_label_probs`) is exactly
    hash-oracle-able — the trained-model residue (CatBoost weights, SHAP
    values) is a model-weights question, not a query-engine one (same
    boundary as M10's declared scope).

    Physical plan: one union (no shuffle) → per-(query,label) mean agg →
    two query-partitioned rank windows (model pick, ensemble pick) → one
    query-keyed agreement agg. Every shuffle is keyed by query_id; nothing
    global, nothing driver-side.

    Output: (query_id, predicted_label, mean_prob, agreement, confidence)
    where agreement = fraction of members whose own argmax equals the
    ensemble label and confidence buckets mean_prob at >= 0.8 'high' /
    >= 0.5 'medium' / else 'low' (the reference's band thresholds).
    """
    from pyspark.sql import Window

    n_models = len(per_model)
    if n_models < 1:
        raise ValueError("soft_vote_ensemble: need at least one model frame")
    tagged = None
    for i, m in enumerate(per_model):
        t = m.select(
            "query_id", "label", "prob", "vote_score", F.lit(i).alias("_model")
        )
        tagged = t if tagged is None else tagged.unionByName(t)

    # each member's own argmax (majority vote, knn_classify tiebreaks)
    wm = Window.partitionBy("_model", "query_id").orderBy(
        F.desc("prob"), F.desc("vote_score"), F.asc("label")
    )
    picks = (
        tagged.withColumn("_rn", F.row_number().over(wm))
        .filter(F.col("_rn") == 1)
        .select("query_id", F.col("label").alias("_pick"))
    )
    # ensemble argmax over per-label mean prob (absent rows are zeros, so
    # the mean divides by N, not by the number of voting members)
    means = tagged.groupBy("query_id", "label").agg(
        F.round(F.sum("prob") / F.lit(float(n_models)), 6).alias("mean_prob"),
        F.round(F.sum("vote_score"), 6).alias("_ts"),
    )
    we = Window.partitionBy("query_id").orderBy(
        F.desc("mean_prob"), F.desc("_ts"), F.asc("label")
    )
    winners = (
        means.withColumn("_rn", F.row_number().over(we))
        .filter(F.col("_rn") == 1)
        .select("query_id", F.col("label").alias("predicted_label"), "mean_prob")
    )
    agreement = (
        winners.join(picks, "query_id")
        .groupBy("query_id", "predicted_label", "mean_prob")
        .agg(
            F.round(
                F.sum((F.col("_pick") == F.col("predicted_label")).cast("double"))
                / F.lit(float(n_models)),
                6,
            ).alias("agreement")
        )
    )
    return agreement.select(
        "query_id",
        "predicted_label",
        "mean_prob",
        "agreement",
        F.when(F.col("mean_prob") >= 0.8, "high")
        .when(F.col("mean_prob") >= 0.5, "medium")
        .otherwise("low")
        .alias("confidence"),
    )


def ensemble_classifier(
    train: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    n_models: int = 5,
    bag_fraction: float = 0.8,
    seed: int = 42,
    max_iter: int = 50,
):
    """Seeded bagging ensemble of :func:`embedding_classifier` models — the
    trained-model tier of the M10 analog (pancancer_classifier.py:702-1015
    trains CatBoost folds and soft-votes them; here N logistic-regression
    members on hash-bagged subsets, soft-vote + agreement + bands).

    Bags are deterministic hash subsets (xxhash64(id-ish, seed+i)), so the
    whole ensemble retrains identically on any cluster layout. Scoring runs
    every member's distributed transform and reduces with the same
    agreement/confidence arithmetic as :func:`soft_vote_ensemble`.

    Returns an object with ``transform(df, id_col)`` →
    (id, prediction, mean_prob, agreement, confidence) and
    ``accuracy(df, id_col)``.
    """
    from pyspark.ml.functions import vector_to_array

    members = []
    for i in range(n_models):
        bucket = F.pmod(
            F.xxhash64(F.col(vec_col).cast("array<double>").cast("string"), F.lit(seed + i)),
            F.lit(10000),
        )
        bag = train.filter(bucket < int(bag_fraction * 10000))
        members.append(embedding_classifier(bag, vec_col, label_col, max_iter=max_iter))

    class _Ensemble:
        def __init__(self, ms):
            self.members = ms

        def transform(self, df: DataFrame, id_col: str) -> DataFrame:
            per_model = []
            for m in self.members:
                scored = m.transform(df).select(
                    F.col(id_col).alias("query_id"),
                    F.col("prediction").alias("label"),
                    # winning-class probability as both prob and tiebreak
                    F.round(F.array_max(vector_to_array("probability")), 6).alias("prob"),
                )
                per_model.append(scored.withColumn("vote_score", F.col("prob")))
            out = soft_vote_ensemble(per_model)
            return out.select(
                F.col("query_id").alias(id_col),
                F.col("predicted_label").alias("prediction"),
                "mean_prob",
                "agreement",
                "confidence",
            )

        def accuracy(self, df: DataFrame, id_col: str) -> float:
            scored = self.transform(df, id_col).join(
                df.select(F.col(id_col), F.col(label_col).cast("double").alias("_y")),
                id_col,
            )
            return float(
                scored.agg(
                    F.avg((F.col("prediction") == F.col("_y")).cast("double"))
                ).first()[0]
            )

    return _Ensemble(members)


def linear_feature_attribution(
    scorer,
    df: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-feature contribution for the logistic-regression member — the
    linear-model stand-in for the reference's SHAP explanation
    (pancancer_classifier.py:1091-1534): for a linear model the exact
    SHAP value of feature j is w_j * (x_j - mean_j), so mean |w_j*(x_j-x̄_j)|
    ranks features by global impact. One scan + one agg, no model calls.

    ``scorer`` is the :func:`embedding_classifier` result fitted with
    ``pca_k=None`` (in PCA space per-raw-feature weights are undefined).
    ``weight`` is the per-feature L2 norm of the coefficient matrix across
    classes (= |w| for binary); contributions use the model's OWN scaled
    features, reconstructed from the fitted scaler's mean/std.
    Output: (feature, weight, mean_abs_contrib) sorted by impact desc.
    """
    import numpy as np

    stages = scorer.model.stages
    if len(stages) != 2:
        raise ValueError("linear_feature_attribution requires pca_k=None")
    scaler, lr = stages
    mat = lr.coefficientMatrix.toArray()  # (n_classes, n_features)
    weights = np.sqrt((mat ** 2).sum(axis=0))
    s_mean = scaler.mean.toArray()
    s_std = scaler.std.toArray()
    arr = F.col(vec_col).cast("array<double>")
    exprs = []
    for j, w in enumerate(weights):
        std = float(s_std[j]) if s_std[j] else 1.0
        scaled = (F.element_at(arr, j + 1) - F.lit(float(s_mean[j]))) / F.lit(std)
        exprs.append(F.avg(F.abs(F.lit(float(w)) * scaled)).alias(f"_a{j}"))
    means = df.agg(*exprs).first()
    rows = []
    for j, w in enumerate(weights):
        contrib = means[f"_a{j}"]
        rows.append((j, float(w), float(contrib) if contrib is not None else 0.0))
    spark = df.sparkSession
    out = spark.createDataFrame(rows, "feature int, weight double, mean_abs_contrib double")
    return out.orderBy(F.desc("mean_abs_contrib"), F.asc("feature"))


def centroid_permutation_importance(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    dims: "list[int]",
    n_buckets: int = 64,
) -> DataFrame:
    """M10's explanation tier as pure relational algebra — permutation
    importance over a nearest-centroid classifier, every step deterministic
    arithmetic so the WHOLE attribution is hash-oracle-able (the analog of
    the reference's per-feature SHAP surface,
    rnaseq_pipeline/ml/pancancer_classifier.py:1091-1534, at the same
    boundary the ensemble drew: vote/agreement arithmetic in-engine,
    trained-model weights out; :func:`permutation_importance` covers the
    MLlib-scorer case, this covers the SQL-expressible one).

    Model: nearest centroid — class centroids from the UNPERMUTED data
    (avg per (label, dim), rounded 6 dp), prediction = argmin squared
    distance (rounded 6 dp; label-asc tiebreak). Importance(d) =
    base_accuracy − accuracy after breaking feature d's row alignment
    with a deterministic within-bucket cyclic shift: rows bucket by the
    PORTABLE HASH of id (functions/hashing.py — NOT ``id % n``: a modulo
    bucket stays correlated with any id-periodic structure in the data,
    e.g. labels striped by id parity, and the "permutation" then shuffles
    values among same-label rows, reporting zero importance for a real
    signal), each bucket's dim-d values rotate by one (lead + first_value
    over the hash-ordered bucket window) — the model stays fixed, only
    the evaluation column permutes, the standard permutation-importance
    contract.

    Scale shape (r11 one-pass form): explode once; centroids are a
    (labels × dims) broadcast dimension; the permutation windows are
    BUCKET-partitioned (no data-sized global window). Base and every
    permuted feature score through ONE join/agg/window chain over a
    feature-tagged (len(dims)+1)-way frame instead of len(dims)+1
    re-expanded scoring passes — same total rows aggregated (the old form
    pushed the full exploded frame through the chain once per pass), but
    one corpus scan instead of 2·len(dims)+1 (9 → 4 scans, ~15 → 6
    Exchanges at the catalog parameters), and one argmin window instead of
    len(dims)+1. Measured 1.9→1.1 s (sf0.1) / 5.0→2.7 s (10× corpus),
    row-identical output both scales: per (feature,id,label) the distance
    sums range over exactly the same 64 addends as the per-pass form.
    The final base-vs-permuted assembly is a window over the ≤len(dims)+1
    accuracy rows (bounded by the dims parameter, never by data).

    Output: (feature, base_accuracy, permuted_accuracy, importance) —
    feature is the 1-BASED dim index (matching SQL generate_subscripts),
    accuracies rounded 6 dp.
    """
    from pyspark.sql import Window

    from vectordb_bioinsight_spark.functions.hashing import portable_hash64

    ex = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("y"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim0", "x"),
    ).select("id", "y", (F.col("dim0") + 1).alias("dim"), "x")
    # labels x dims rows — materialize once (lazy checkpoint) so the
    # scoring chain's broadcast shares ONE centroid computation
    centroids = (
        ex.groupBy(F.col("y").alias("label_c"), "dim")
        .agg(F.round(F.avg("x"), 6).alias("c"))
        .localCheckpoint(eager=False)
    )

    fdims = [d + 1 for d in dims]
    h = portable_hash64(F.col("id").cast("string"))
    wp = Window.partitionBy(F.pmod(h, F.lit(n_buckets)), F.col("dim")).orderBy(
        h, F.col("id")
    )
    # x_perm only for the dims under test (same within-(bucket,dim) cyclic
    # shift the per-dim windows computed); untested dims never pay the
    # window and carry a NULL x_perm that feature==dim can never select
    sub = ex.filter(F.col("dim").isin(fdims)).withColumn(
        "x_perm", F.coalesce(F.lead("x", 1).over(wp), F.first("x").over(wp))
    )
    rest = ex.filter(~F.col("dim").isin(fdims)).withColumn(
        "x_perm", F.lit(None).cast("double")
    )
    # feature 0 = base (no dim replaced); feature f replaces dim f only
    tagged = (
        rest.unionByName(sub)
        .select(
            "*",
            F.explode(F.array(*[F.lit(f) for f in [0] + fdims])).alias("feature"),
        )
        .withColumn(
            "x_eff",
            F.when(F.col("feature") == F.col("dim"), F.col("x_perm")).otherwise(
                F.col("x")
            ),
        )
    )
    d2 = (
        tagged.join(F.broadcast(centroids), "dim")
        .groupBy("feature", "id", "y", "label_c")
        .agg(F.round(F.sum((F.col("x_eff") - F.col("c")) ** 2), 6).alias("dist"))
    )
    w = Window.partitionBy("feature", "id").orderBy(F.asc("dist"), F.asc("label_c"))
    pred = d2.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    acc = pred.groupBy("feature").agg(
        F.round(F.avg((F.col("label_c") == F.col("y")).cast("double")), 6).alias("acc")
    )
    wall = Window.partitionBy(F.lit(1))  # ≤ len(dims)+1 rows by construction
    return (
        acc.withColumn(
            "base_accuracy",
            F.max(F.when(F.col("feature") == 0, F.col("acc"))).over(wall),
        )
        .filter(F.col("feature") != 0)
        .select(
            F.col("feature"),
            "base_accuracy",
            F.col("acc").alias("permuted_accuracy"),
            F.round(F.col("base_accuracy") - F.col("acc"), 6).alias("importance"),
        )
    )


def permutation_importance(
    scorer,
    df: DataFrame,
    vec_col: str,
    label_col: str,
    dims: "list[int]",
    seed: int = 42,
    n_buckets: int = 64,
) -> DataFrame:
    """Model-agnostic permutation importance as a distributed agg: for each
    feature dim, break its row alignment by a deterministic within-bucket
    cyclic shift, rescore, and report the accuracy drop (the reference's
    feature_importances fallback when SHAP is unavailable,
    pancancer_classifier.py:1091-1534).

    The permutation is NOT a global shuffle: rows hash into ``n_buckets``
    groups, each group's dim values rotate by one (lead + first_value over
    the hash-ordered bucket window) — a valid derangement-ish permutation
    whose windows are all bucket-partitioned, so the plan scales.

    Output: (feature, base_accuracy, permuted_accuracy, importance).
    """
    from pyspark.sql import Window

    base_acc = scorer.accuracy(df)
    arr = F.col(vec_col).cast("array<double>")
    rows = []
    for d in dims:
        h = F.xxhash64(arr.cast("string"), F.lit(seed + d))
        b = F.pmod(h, F.lit(n_buckets))
        w = Window.partitionBy(b).orderBy(h)
        cur = F.element_at(arr, d + 1)
        shifted = F.coalesce(F.lead(cur, 1).over(w), F.first(cur).over(w))
        permuted = (
            df.withColumn("_shift", shifted)
            .withColumn(
                vec_col,
                F.expr(
                    f"transform(CAST({vec_col} AS array<double>), (x, i) -> "
                    f"CASE WHEN i = {d} THEN _shift ELSE x END)"
                ),
            )
            .drop("_shift")
        )
        perm_acc = scorer.accuracy(permuted)
        rows.append((d, round(base_acc, 6), round(perm_acc, 6), round(base_acc - perm_acc, 6)))
    spark = df.sparkSession
    return spark.createDataFrame(
        rows, "feature int, base_accuracy double, permuted_accuracy double, importance double"
    ).orderBy(F.desc("importance"), F.asc("feature"))


def kfold_assign(
    df: DataFrame,
    group_col: str,
    n_folds: int = 5,
    seed: int = 42,
    fold_col: str = "fold",
) -> DataFrame:
    """Group-aware k-fold assignment — the cross-validation counterpart of
    :func:`group_split`: every row of one group (patient, user, document
    cluster) lands in the SAME fold, decided by the salted portable hash
    of the group id, so folds are deterministic, leak-free across the
    fold boundary, and reproducible on any cluster layout (the
    GroupKFold analog of preprocessor.py:124-180's split discipline).

    Scan-local expression — zero shuffle; fold sizes are hash-uniform in
    expectation, not exactly equal (the price of statelessness)."""
    from vectordb_bioinsight_spark.functions.hashing import salted_hash64

    return df.withColumn(
        fold_col,
        F.pmod(salted_hash64(F.col(group_col).cast("string"), seed), F.lit(n_folds))
        .cast("int"),
    )


def shap_gene_stats(
    attributions: DataFrame,
    gene_col: str = "gene",
    shap_col: str = "shap_value",
    value_col: str = "feature_value",
) -> DataFrame:
    """SHAP aggregation — the deterministic half of the reference's
    explainer (``rnaseq_pipeline/ml/explainer.py:96-125, 168-246``; the
    SHAP values themselves come from the trained CatBoost model, a
    declared boundary; everything computed FROM the attribution matrix
    is ported here).

    Per gene over a long (sample, gene, shap, feature_value) table:
    ``mean_shap``, ``abs_mean_shap`` (the global-importance statistic,
    ``get_global_importance``), the status card's expression ``mean``/
    ``std`` (population, numpy ``.std()``), ``direction`` (the card's
    contributes-to-cancer vs maintains-normal split on mean_shap > 0),
    and ``rank`` — the card's exact rule: ``(global_importance >
    abs_mean_shap).sum() + 1``, i.e. STRICTLY-greater count over all
    genes including itself, so exact ties share the same rank.

    One gene-keyed aggregation; the rank is a window over the
    genes-sized aggregate (bounded). ``rank()`` on the descending sort
    IS the card's rule: ties share 1 + the count of strictly-greater
    rows.
    """
    per_gene = attributions.groupBy(gene_col).agg(
        F.round(F.avg(shap_col), 6).alias("mean_shap"),
        F.round(F.avg(F.abs(F.col(shap_col))), 6).alias("abs_mean_shap"),
        F.round(F.avg(value_col), 6).alias("mean_expr"),
        F.round(F.stddev_pop(value_col), 6).alias("std_expr"),
    )
    # strictly-greater count +1: rank() assigns ties the MINIMUM position,
    # which equals strict-superior-count + 1 exactly — the card's rule.
    w = Window.orderBy(F.col("abs_mean_shap").desc())
    return per_gene.withColumn("rank", F.rank().over(w)).withColumn(
        "direction",
        F.when(F.col("mean_shap") > 0, F.lit("up")).otherwise(F.lit("down")),
    )


def shap_top_genes_per_sample(
    attributions: DataFrame,
    sample_col: str = "sample_id",
    gene_col: str = "gene",
    shap_col: str = "shap_value",
    value_col: str = "feature_value",
    top_k: int = 20,
) -> DataFrame:
    """explainer.py:126-167 (``explain_sample``): per sample, the top-k
    genes by |SHAP| with direction (> 0 -> up) and the sample's total
    SHAP. Tie pin: equal |SHAP| resolves by gene id ascending (numpy's
    argsort order over the reference's unordered feature array is not
    replayable). One sample-keyed window."""
    w = Window.partitionBy(sample_col).orderBy(
        F.abs(F.col(shap_col)).desc(), F.col(gene_col).asc()
    )
    total = Window.partitionBy(sample_col)
    return (
        attributions.withColumn("rk", F.row_number().over(w))
        .withColumn("total_shap", F.round(F.sum(shap_col).over(total), 6))
        .filter(F.col("rk") <= top_k)
        .select(
            sample_col,
            gene_col,
            F.round(F.col(shap_col), 6).alias("shap_value"),
            F.when(F.col(shap_col) > 0, F.lit("up")).otherwise(F.lit("down")).alias("direction"),
            F.round(F.col(value_col), 6).alias("feature_value"),
            "rk",
            "total_shap",
        )
    )
