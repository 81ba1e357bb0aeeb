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

from pyspark.sql import DataFrame
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
