"""Classifier evaluation — ROC-AUC, PR curves, calibration, confusion
matrices over scored rows.

Reference parity: the reference trains and applies classifiers
(rnaseq_pipeline/ml/pancancer_classifier.py:214-420 fit/predict with
accuracy/F1 printouts, and the validation agent's precision/recall style
checks in rnaseq_pipeline/agents/agent4_validation.py:405-524) but
evaluates them driver-side with sklearn. The engine re-expresses the
metric arithmetic as distributed aggregations so a 100 TB scored corpus
can be evaluated in one pass: AUC from tie-averaged ranks (the
Mann-Whitney identity — same machinery as ``stats.wilcoxon_rank_sum``),
calibration/Brier from binned conditional aggregates, confusion tables
from one global conditional aggregation.

All outputs are deterministic and hash-oracle-able (no sampling, no
model state): given the same (label, score) pairs, every engine agrees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def roc_auc(
    df: DataFrame,
    key_cols: "list[str]",
    label_col: str,
    score_col: str,
) -> DataFrame:
    """Exact tie-aware ROC-AUC per key group via the Mann-Whitney identity:
    AUC = (R_pos − n_pos(n_pos+1)/2) / (n_pos · n_neg) with average ranks.

    Physical plan (the ``wilcoxon_rank_sum`` shape): tie groups are
    aggregated FIRST — groupBy (key, score) with map-side combine — so the
    rank window runs over distinct scores per key, not raw rows; the
    average rank of a tie group is (#smaller rows) + (t+1)/2 from one
    running-sum window. One agg shuffle + one bounded window + one tiny
    agg. At 100 TB the window input is bounded by score cardinality per
    key (round scores upstream if truly continuous).

    ``label_col`` must be boolean-like (1 = positive). Keys with an empty
    class are dropped (AUC undefined). Output: (key..., n_pos, n_neg, auc)
    with auc rounded 6 dp.
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    tied = df.groupBy(*key_cols, s.alias("_s")).agg(
        F.count("*").cast("double").alias("_t"),
        F.sum(y).cast("double").alias("_t_pos"),
    )
    w_cum = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_s").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = tied.withColumn(
        "_avg_r",
        F.coalesce(F.sum("_t").over(w_cum), F.lit(0.0)) + (F.col("_t") + 1.0) / 2.0,
    )
    agg = ranked.groupBy(*key_cols).agg(
        F.sum("_t_pos").alias("_np"),
        (F.sum("_t") - F.sum("_t_pos")).alias("_nn"),
        F.sum(F.col("_t_pos") * F.col("_avg_r")).alias("_r_pos"),
    )
    np_, nn = F.col("_np"), F.col("_nn")
    auc = (F.col("_r_pos") - np_ * (np_ + 1.0) / 2.0) / (np_ * nn)
    return agg.filter((np_ > 0) & (nn > 0)).select(
        *key_cols,
        np_.cast("long").alias("n_pos"),
        nn.cast("long").alias("n_neg"),
        F.round(auc, 6).alias("auc"),
    )


def pr_curve(
    df: DataFrame,
    label_col: str,
    score_col: str,
) -> DataFrame:
    """Precision/recall curve points at every distinct score threshold
    (predict positive iff score >= threshold), descending.

    Tie-grouped first (groupBy score → n, n_pos), then one ordered window
    for cumulative tp/fp — window input is bounded by score cardinality.
    The window is globally ordered by construction (a PR curve is a total
    order over thresholds); round/bucket scores upstream for wide data.

    Output: (score, cum_tp, cum_fp, precision, recall), rounded 6 dp.
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    tied = df.groupBy(s.alias("score")).agg(
        F.count("*").cast("long").alias("_n"),
        F.sum(y).cast("long").alias("_n_pos"),
    )
    w = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    total_pos = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum_tp = F.sum("_n_pos").over(w)
    cum_fp = F.sum(F.col("_n") - F.col("_n_pos")).over(w)
    all_pos = F.sum("_n_pos").over(total_pos)
    return tied.select(
        "score",
        cum_tp.alias("cum_tp"),
        cum_fp.alias("cum_fp"),
        F.round(cum_tp / F.nullif(cum_tp + cum_fp, F.lit(0)), 6).alias("precision"),
        F.round(cum_tp / F.nullif(all_pos, F.lit(0)), 6).alias("recall"),
    )


def calibration_bins(
    df: DataFrame,
    label_col: str,
    prob_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins: equal-width probability bins with per-bin
    count, mean predicted probability, observed positive rate, and gap.

    One groupBy on the bin index (n_bins rows out) — pure map-side
    combinable aggregation, the cheapest possible shape. Probabilities are
    clamped to [0, 1] before binning; the top edge folds into the last bin.

    Output: (bin, n, mean_prob, frac_pos, gap) ordered by bin; gap =
    mean_prob − frac_pos (positive = over-confident), rounded 6 dp.
    """
    p = F.least(F.greatest(F.col(prob_col).cast("double"), F.lit(0.0)), F.lit(1.0))
    y = F.col(label_col).cast("int")
    bin_ = F.least(F.floor(p * n_bins), F.lit(n_bins - 1)).cast("int")
    agg = df.groupBy(bin_.alias("bin")).agg(
        F.count("*").cast("long").alias("n"),
        F.avg(p).alias("_mp"),
        F.avg(y.cast("double")).alias("_fp"),
    )
    return agg.select(
        "bin",
        "n",
        F.round(F.col("_mp"), 6).alias("mean_prob"),
        F.round(F.col("_fp"), 6).alias("frac_pos"),
        F.round(F.col("_mp") - F.col("_fp"), 6).alias("gap"),
    ).orderBy("bin")


def calibration_summary(
    df: DataFrame,
    label_col: str,
    prob_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """One-row Brier score with Murphy's decomposition over equal-width
    bins: brier (raw mean squared error), reliability (Σ nₖ(p̄ₖ−ōₖ)²/N),
    resolution (Σ nₖ(ōₖ−ō)²/N), uncertainty (ō(1−ō)).

    Two tiny aggregations: per-bin partials (map-side combinable), then a
    single-row combine; the base rate ō folds out of the same partials, so
    no second scan. Output: (n, brier, reliability, resolution,
    uncertainty), rounded 6 dp.
    """
    p = F.least(F.greatest(F.col(prob_col).cast("double"), F.lit(0.0)), F.lit(1.0))
    y = F.col(label_col).cast("int").cast("double")
    bin_ = F.least(F.floor(p * n_bins), F.lit(n_bins - 1)).cast("int")
    per_bin = df.groupBy(bin_.alias("_b")).agg(
        F.count("*").cast("double").alias("_n"),
        F.avg(p).alias("_mp"),
        F.avg(y).alias("_fp"),
        F.sum((p - y) * (p - y)).alias("_se"),
        F.sum(y).alias("_pos"),
    )
    n_tot = F.sum("_n")
    obar = F.sum("_pos") / n_tot
    out = per_bin.agg(
        n_tot.cast("long").alias("n"),
        (F.sum("_se") / n_tot).alias("_brier"),
        (
            F.sum(F.col("_n") * (F.col("_mp") - F.col("_fp")) * (F.col("_mp") - F.col("_fp")))
            / n_tot
        ).alias("_rel"),
        obar.alias("_obar"),
        F.sum(F.col("_n") * F.col("_fp") * F.col("_fp")).alias("_sfp2"),
    )
    # resolution = Σ nₖ(ōₖ−ō)²/N = Σ nₖōₖ²/N − ō² (the cross term collapses
    # because Σ nₖōₖ = Nō) — lets both moments come from the one combine
    res = F.col("_sfp2") / F.col("n") - F.col("_obar") * F.col("_obar")
    return out.select(
        "n",
        F.round(F.col("_brier"), 6).alias("brier"),
        F.round(F.col("_rel"), 6).alias("reliability"),
        F.round(res, 6).alias("resolution"),
        F.round(F.col("_obar") * (1.0 - F.col("_obar")), 6).alias("uncertainty"),
    )


def confusion_at_thresholds(
    df: DataFrame,
    label_col: str,
    score_col: str,
    thresholds: "list[float]",
) -> DataFrame:
    """Confusion table + precision/recall/F1 at each threshold (predict
    positive iff score >= t).

    ONE global conditional aggregation — 4·|thresholds| sums over a single
    pass (the ``funnel_conversion`` counts shape), then the output rows are
    ``inline``d from the 1-row frame: no explode of the fact table, no
    per-threshold scan, no join. |thresholds| is bounded (an operator
    argument), so the agg row stays tiny at any data scale.

    Output: (threshold, tp, fp, fn, tn, precision, recall, f1) — NULL
    metric when its denominator is 0 (ANSI-safe via nullif), rounded 6 dp.
    """
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int")
    aggs = []
    for i, t in enumerate(thresholds):
        pred = (s >= F.lit(float(t))).cast("int")
        aggs += [
            F.sum(pred * y).cast("long").alias(f"_tp{i}"),
            F.sum(pred * (1 - y)).cast("long").alias(f"_fp{i}"),
            F.sum((1 - pred) * y).cast("long").alias(f"_fn{i}"),
            F.sum((1 - pred) * (1 - y)).cast("long").alias(f"_tn{i}"),
        ]
    counts = df.agg(*aggs)
    rows = []
    for i, t in enumerate(thresholds):
        tp, fp = F.col(f"_tp{i}"), F.col(f"_fp{i}")
        fn, tn = F.col(f"_fn{i}"), F.col(f"_tn{i}")
        prec = tp / F.nullif(tp + fp, F.lit(0))
        rec = tp / F.nullif(tp + fn, F.lit(0))
        f1 = 2.0 * tp / F.nullif(2 * tp + fp + fn, F.lit(0))
        rows.append(
            F.struct(
                F.lit(float(t)).alias("threshold"),
                tp.alias("tp"),
                fp.alias("fp"),
                fn.alias("fn"),
                tn.alias("tn"),
                F.round(prec, 6).alias("precision"),
                F.round(rec, 6).alias("recall"),
                F.round(f1, 6).alias("f1"),
            )
        )
    return counts.select(F.inline(F.array(*rows)))


# ------------------------------------------------------- clustering quality
def silhouette_simplified(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
) -> DataFrame:
    """Per-cluster SIMPLIFIED silhouette — the linear-time centroid form:
    a(i) = distance to the OWN cluster centroid, b(i) = min distance to
    any other centroid, s(i) = (b - a) / max(a, b) (0 for single-cluster
    inputs and zero-distance degenerates).

    Reference parity: the single-cell evaluator scores clustering with
    sklearn's silhouette and maps it to 0-100 via (s + 1) / 2 * 100
    (scripts/sc_pipeline_evaluator.py:911-959); the simplified form is
    the standard linear surrogate — at 100 TB the exact all-pairs
    statistic is a diagnostic for samples, not a corpus pass
    (:func:`silhouette_exact`).

    Plan: element-wise centroid aggregation (labels x dim rows), rebuilt
    to arrays and BROADCAST back — the corpus is touched once, scan-local
    per-point scoring, one label-keyed mean agg.

    Output: (label, n_points, mean_silhouette, eval_score) — 6/4 dp.
    """
    from vectordb_bioinsight_spark.functions.vector import l2_distance

    pts = df.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_lbl"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    cent = (
        pts.select("_lbl", F.posexplode("_v").alias("_pos", "_val"))
        .groupBy("_lbl", "_pos")
        .agg(F.avg("_val").alias("_m"))
        .groupBy("_lbl")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_m"))),
                lambda s: s["_m"],
            ).alias("_cent")
        )
    )
    joined = pts.crossJoin(
        F.broadcast(
            cent.groupBy().agg(
                F.collect_list(F.struct("_lbl", "_cent")).alias("_cents")
            )
        )
    )
    dists = joined.select(
        "_id",
        "_lbl",
        F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                c["_lbl"].alias("l"),
                # 6-dp distances: the statistic replays bit-for-bit in an
                # external SQL oracle; the 1e-6 perturbation is far below
                # any clustering-quality decision threshold
                F.round(l2_distance(F.col("_v"), c["_cent"]), 6).alias("d"),
            ),
        ).alias("_ds"),
    )
    a = F.element_at(
        F.filter(F.col("_ds"), lambda x: x["l"] == F.col("_lbl")), 1
    )["d"]
    b = F.array_min(
        F.transform(
            F.filter(F.col("_ds"), lambda x: x["l"] != F.col("_lbl")),
            lambda x: x["d"],
        )
    )
    s = F.when(
        b.isNull() | (F.greatest(a, b) == 0), F.lit(0.0)
    ).otherwise((b - a) / F.greatest(a, b))
    per_point = dists.select("_lbl", s.alias("_s"))
    agg = per_point.groupBy(F.col("_lbl").alias("label")).agg(
        F.count("*").cast("long").alias("n_points"),
        F.avg("_s").alias("_ms"),
    )
    return agg.select(
        "label",
        "n_points",
        F.round("_ms", 6).alias("mean_silhouette"),
        F.round((F.col("_ms") + 1.0) / 2.0 * 100.0, 4).alias("eval_score"),
    )


def silhouette_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
) -> DataFrame:
    """Per-cluster EXACT mean silhouette (the sklearn statistic,
    sc_pipeline_evaluator.py:911-953): a(i) = mean distance to the other
    points of i's cluster, b(i) = min over other clusters of the mean
    distance to that cluster, s(i) = (b - a) / max(a, b); singleton
    clusters score 0 (sklearn's convention).

    All-pairs by construction (one self-join, i != j) — O(n^2) distance
    evaluations, the small-sample diagnostic path; the corpus-scale
    surrogate is :func:`silhouette_simplified`.

    Output: (label, n_points, mean_silhouette, eval_score).
    """
    from vectordb_bioinsight_spark.functions.vector import l2_distance

    pts = df.select(
        F.col(id_col).alias("_id"),
        F.col(label_col).alias("_lbl"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    o = pts.select(
        F.col("_id").alias("_jid"),
        F.col("_lbl").alias("_jlbl"),
        F.col("_v").alias("_jv"),
    )
    pair_means = (
        pts.join(o, F.col("_id") != F.col("_jid"))
        .groupBy("_id", "_lbl", "_jlbl")
        # 6-dp per-pair distances (cross-engine replay; see simplified)
        .agg(F.avg(F.round(l2_distance("_v", "_jv"), 6)).alias("_md"))
    )
    per_point = pair_means.groupBy("_id", "_lbl").agg(
        F.max(F.when(F.col("_jlbl") == F.col("_lbl"), F.col("_md"))).alias("_a"),
        F.min(F.when(F.col("_jlbl") != F.col("_lbl"), F.col("_md"))).alias("_b"),
    )
    s = F.when(
        F.col("_a").isNull() | F.col("_b").isNull()
        | (F.greatest(F.col("_a"), F.col("_b")) == 0),
        F.lit(0.0),
    ).otherwise((F.col("_b") - F.col("_a")) / F.greatest(F.col("_a"), F.col("_b")))
    agg = per_point.groupBy(F.col("_lbl").alias("label")).agg(
        F.count("*").cast("long").alias("n_points"),
        F.avg(s).alias("_ms"),
    )
    return agg.select(
        "label",
        "n_points",
        F.round("_ms", 6).alias("mean_silhouette"),
        F.round((F.col("_ms") + 1.0) / 2.0 * 100.0, 4).alias("eval_score"),
    )


def classification_report(
    df: DataFrame,
    true_col: str,
    pred_col: str,
) -> DataFrame:
    """Multiclass classification report — the metric suite the
    reference's model-validation scripts compute with sklearn
    (scripts/robust_model_validation.py:30-31, 201-216: accuracy,
    per-class + macro/weighted precision/recall/F1, the multiclass
    Matthews correlation) plus Cohen's kappa, re-expressed as ONE
    confusion aggregation + bounded arithmetic.

    sklearn conventions: the label set is the UNION of true and
    predicted labels; zero-denominator precision/recall/F1 are 0; macro
    averages over the full union; weighted weights by true support;
    micro == accuracy for single-label multiclass. Multiclass MCC uses
    the c*s - sum(p_k t_k) identity; kappa = (po - pe) / (1 - pe).

    Scale: groupBy(true, pred) partial-aggregates map-side; everything
    after is classes^2-bounded. Output: (scope, metric, value) long rows
    — scope is the class label, 'macro', 'weighted' or 'overall'; value
    rounded 6 dp.
    """
    cm = (
        df.select(
            F.col(true_col).cast("string").alias("t"),
            F.col(pred_col).cast("string").alias("p"),
        )
        .groupBy("t", "p")
        .agg(F.count("*").cast("double").alias("n"))
        # the confusion table fans out to FIVE consumers (label union x2,
        # true/pred margins, diagonal) — materialize it once so the
        # corpus is scanned once, not per consumer (classes^2 rows; the
        # part_link_prediction checkpoint discipline)
        .localCheckpoint(eager=False)
    )
    labels = (
        cm.select(F.col("t").alias("lbl"))
        .unionByName(cm.select(F.col("p").alias("lbl")))
        .distinct()
    )
    per_class = (
        labels.join(
            cm.groupBy("t").agg(F.sum("n").alias("true_n")),
            labels["lbl"] == F.col("t"),
            "left",
        )
        .drop("t")
        .join(
            cm.groupBy("p").agg(F.sum("n").alias("pred_n")),
            F.col("lbl") == F.col("p"),
            "left",
        )
        .drop("p")
        .join(
            cm.filter(F.col("t") == F.col("p")).select(
                F.col("t").alias("_d"), F.col("n").alias("tp")
            ),
            F.col("lbl") == F.col("_d"),
            "left",
        )
        .drop("_d")
        .select(
            "lbl",
            F.coalesce("true_n", F.lit(0.0)).alias("true_n"),
            F.coalesce("pred_n", F.lit(0.0)).alias("pred_n"),
            F.coalesce("tp", F.lit(0.0)).alias("tp"),
        )
    )
    prec = F.when(F.col("pred_n") > 0, F.col("tp") / F.col("pred_n")).otherwise(0.0)
    rec = F.when(F.col("true_n") > 0, F.col("tp") / F.col("true_n")).otherwise(0.0)
    f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0)
    scored = per_class.select(
        "lbl", "true_n", "pred_n", "tp",
        prec.alias("prec"), rec.alias("rec"), f1.alias("f1"),
    )
    class_rows = scored.select(
        F.col("lbl").alias("scope"),
        F.explode(
            F.array(
                F.struct(F.lit("precision").alias("metric"), F.round("prec", 6).alias("value")),
                F.struct(F.lit("recall").alias("metric"), F.round("rec", 6).alias("value")),
                F.struct(F.lit("f1").alias("metric"), F.round("f1", 6).alias("value")),
                F.struct(F.lit("support").alias("metric"), F.col("true_n").alias("value")),
            )
        ).alias("mv"),
    ).select("scope", F.col("mv.metric"), F.col("mv.value"))
    total = scored.agg(
        F.sum("tp").alias("c"),
        F.sum("true_n").alias("s"),
        F.sum(F.col("pred_n") * F.col("true_n")).alias("pt"),
        F.sum(F.col("pred_n") * F.col("pred_n")).alias("pp"),
        F.sum(F.col("true_n") * F.col("true_n")).alias("tt"),
        F.avg("prec").alias("macro_p"),
        F.avg("rec").alias("macro_r"),
        F.avg("f1").alias("macro_f1"),
        (F.sum(F.col("f1") * F.col("true_n")) / F.sum("true_n")).alias("w_f1"),
        (F.sum(F.col("prec") * F.col("true_n")) / F.sum("true_n")).alias("w_p"),
        (F.sum(F.col("rec") * F.col("true_n")) / F.sum("true_n")).alias("w_r"),
    )
    s = F.col("s")
    mcc_den = F.sqrt((s * s - F.col("pp")) * (s * s - F.col("tt")))
    mcc = F.when(mcc_den > 0, (F.col("c") * s - F.col("pt")) / mcc_den).otherwise(0.0)
    pe = F.col("pt") / (s * s)
    kappa = F.when(pe < 1.0, (F.col("c") / s - pe) / (1 - pe)).otherwise(0.0)
    summary_rows = total.select(
        F.explode(
            F.array(
                F.struct(F.lit("overall").alias("scope"), F.lit("accuracy").alias("metric"),
                         F.round(F.col("c") / s, 6).alias("value")),
                F.struct(F.lit("overall").alias("scope"), F.lit("mcc").alias("metric"),
                         F.round(mcc, 6).alias("value")),
                F.struct(F.lit("overall").alias("scope"), F.lit("kappa").alias("metric"),
                         F.round(kappa, 6).alias("value")),
                F.struct(F.lit("macro").alias("scope"), F.lit("precision").alias("metric"),
                         F.round("macro_p", 6).alias("value")),
                F.struct(F.lit("macro").alias("scope"), F.lit("recall").alias("metric"),
                         F.round("macro_r", 6).alias("value")),
                F.struct(F.lit("macro").alias("scope"), F.lit("f1").alias("metric"),
                         F.round("macro_f1", 6).alias("value")),
                F.struct(F.lit("weighted").alias("scope"), F.lit("precision").alias("metric"),
                         F.round("w_p", 6).alias("value")),
                F.struct(F.lit("weighted").alias("scope"), F.lit("recall").alias("metric"),
                         F.round("w_r", 6).alias("value")),
                F.struct(F.lit("weighted").alias("scope"), F.lit("f1").alias("metric"),
                         F.round("w_f1", 6).alias("value")),
            )
        ).alias("r")
    ).select("r.scope", "r.metric", "r.value")
    return class_rows.unionByName(summary_rows)


def cluster_variance_indices(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
) -> DataFrame:
    """Davies-Bouldin and Calinski-Harabasz in ONE linear pass — the two
    centroid-based clustering-quality indices that complete the
    evaluator family next to :func:`silhouette_simplified` (the
    reference scores clustering quality in its single-cell evaluator,
    sc_pipeline_evaluator.py:908-959; sklearn's index trio is the
    standard instrument).

    * CH = (B / (k-1)) / (W / (n-k)): between/within SQUARED-distance
      dispersion — cluster-aggregable exactly (no sqrt inside sums).
    * DB = mean over clusters of max_j (s_i + s_j) / d_ij with
      s_i = mean distance to the own centroid and d_ij the
      centroid-centroid distance — the pairwise stage is k^2-bounded.

    Distances round 6 dp (the cross-engine replay contract). Plan: one
    corpus scan into per-label (n, s_i, W_i) aggregates against
    broadcast centroids; everything after is k-bounded.

    Output: one row (n_points, n_clusters, calinski_harabasz,
    davies_bouldin) rounded 4 dp; both NULL for k < 2.
    """
    from vectordb_bioinsight_spark.functions.vector import l2_distance

    pts = df.select(
        F.col(label_col).alias("_lbl"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    cent = (
        pts.select("_lbl", F.posexplode("_v").alias("_pos", "_val"))
        .groupBy("_lbl", "_pos")
        .agg(F.avg("_val").alias("_m"))
        .groupBy("_lbl")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_m"))),
                lambda s: s["_m"],
            ).alias("_cent")
        )
        .localCheckpoint(eager=False)
    )
    dist = F.round(l2_distance("_v", "_cent"), 6)
    per_label = (
        pts.join(F.broadcast(cent), "_lbl")
        .groupBy("_lbl")
        .agg(
            F.count("*").cast("long").alias("_n"),
            F.avg(dist).alias("_s"),
            F.sum(dist * dist).alias("_w"),
        )
        # k-bounded, five consumers (grand mean, totals, B-term, both DB
        # pair sides) — materialize so the corpus is scanned once for it
        .localCheckpoint(eager=False)
    )
    # grand centroid: size-weighted mean of the label centroids per
    # dimension (== the global element-wise mean), as PLAIN aggregates so
    # both engines compute the same simple k-term sums (a collect-fold
    # would sum in partition order — nondeterministic even within Spark)
    grand_long = (
        cent.select("_lbl", F.posexplode("_cent").alias("_pos", "_cm"))
        .join(per_label.select("_lbl", "_n"), "_lbl")
        .groupBy("_pos")
        .agg((F.sum(F.col("_cm") * F.col("_n")) / F.sum("_n")).alias("_gm"))
    )
    grand_arr = grand_long.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_pos", "_gm"))),
            lambda s: s["_gm"],
        ).alias("_g")
    )
    totk = per_label.agg(
        F.sum("_n").alias("_tot"), F.count("*").cast("long").alias("_k")
    )
    grand = totk.crossJoin(F.broadcast(grand_arr))
    stats = per_label.join(cent, "_lbl").crossJoin(F.broadcast(grand))
    b_term = F.col("_n").cast("double") * F.pow(
        F.round(l2_distance("_cent", "_g"), 6), 2
    )
    totals = stats.agg(
        F.sum("_w").alias("W"),
        F.sum(b_term).alias("B"),
        F.max("_tot").alias("n"),
        F.max("_k").alias("k"),
    )
    # DB: k^2 centroid-pair stage
    a = per_label.join(cent, "_lbl").select(
        F.col("_lbl").alias("_i"), F.col("_s").alias("_si"), F.col("_cent").alias("_ci")
    )
    b = per_label.join(cent, "_lbl").select(
        F.col("_lbl").alias("_j"), F.col("_s").alias("_sj"), F.col("_cent").alias("_cj")
    )
    rij = (
        a.join(b, F.col("_i") != F.col("_j"))
        .select(
            "_i",
            (
                (F.col("_si") + F.col("_sj"))
                / F.nullif(F.round(l2_distance("_ci", "_cj"), 6), F.lit(0.0))
            ).alias("_r"),
        )
        .groupBy("_i")
        .agg(F.max("_r").alias("_rmax"))
        .agg(F.avg("_rmax").alias("DB"))
    )
    return totals.crossJoin(rij).select(
        F.col("n").alias("n_points"),
        F.col("k").alias("n_clusters"),
        F.round(
            F.when(
                (F.col("k") > 1) & (F.col("W") > 0),
                (F.col("B") / (F.col("k") - 1)) / (F.col("W") / (F.col("n") - F.col("k"))),
            ),
            4,
        ).alias("calinski_harabasz"),
        F.round(F.when(F.col("k") > 1, F.col("DB")), 4).alias("davies_bouldin"),
    )
