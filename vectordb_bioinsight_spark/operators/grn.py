"""Gene-regulatory-network inference — SURVEY.md M6.

Reference: per-target sparse regression over regulator expressions
(ml/network_enhancer.py:237-328) — one sklearn ElasticNet fit per target,
embarrassingly parallel over targets. The engine's shape:

* the REGULATOR design matrix is small by construction (the reference caps
  candidate regulators; a design matrix is regulators × samples, KBs) — it is
  built once driver-side and broadcast into the UDF closure;
* the TARGETS stay distributed: ``applyInPandas`` grouped by target gene runs
  one closed-form ridge solve per group (numpy — no sklearn in this
  environment; ridge is the L2 member of the reference's elastic-net family).

Scale: 10⁴ targets × a capped regulator set = 10⁴ independent tiny solves —
a perfectly even shuffle on gene_id. The design-matrix broadcast is the same
pattern as a model broadcast for inference UDFs (SURVEY §4.3(4)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_REGULATORS = 1000
MAX_SAMPLES = 10000


def grn_ridge(
    expr_long: DataFrame,
    regulators: list[str],
    gene_col: str = "gene_id",
    sample_col: str = "sample_id",
    value_col: str = "value",
    lam: float = 1.0,
    min_abs_coef: float = 0.0,
) -> DataFrame:
    """Per-target ridge regression against a broadcast regulator matrix.

    Output: (target, regulator, coef) — coef rounded 6 dp, |coef| >
    min_abs_coef (the reference keeps nonzero coefficients as directed
    edges). Targets appearing in ``regulators`` are excluded (self-loops).
    Columns are standardized (z-score) before the solve, matching the
    reference's preprocessing; ridge: β = (XᵀX + λI)⁻¹ Xᵀy.
    """
    if len(regulators) > MAX_REGULATORS:
        raise ValueError(f"{len(regulators)} regulators > cap {MAX_REGULATORS}")
    reg_pdf = (
        expr_long.filter(F.col(gene_col).isin(list(regulators)))
        .select(gene_col, sample_col, F.col(value_col).cast("double").alias("v"))
        .toPandas()
    )
    X_wide = reg_pdf.pivot(index=sample_col, columns=gene_col, values="v").sort_index()
    if len(X_wide) > MAX_SAMPLES:
        raise ValueError(f"{len(X_wide)} samples > cap {MAX_SAMPLES}")
    reg_names = [r for r in sorted(regulators) if r in X_wide.columns]
    X_wide = X_wide[reg_names]

    import numpy as np

    Xv = X_wide.to_numpy(dtype=float)
    mu, sd = Xv.mean(axis=0), Xv.std(axis=0)
    sd = np.where(sd == 0, 1.0, sd)
    Xz = (Xv - mu) / sd
    sample_order = {s: i for i, s in enumerate(X_wide.index)}
    n_reg = len(reg_names)

    schema = "target string, regulator string, coef double"

    def fit(pdf):  # one target group
        import numpy as _np
        import pandas as _pd

        tgt = pdf[gene_col].iloc[0]
        y = _np.zeros(len(sample_order))
        seen = _np.zeros(len(sample_order), dtype=bool)
        for s, v in zip(pdf[sample_col], pdf[value_col]):
            i = sample_order.get(s)
            if i is not None:
                y[i], seen[i] = float(v), True
        if not seen.all():  # target must cover every design-matrix sample
            return _pd.DataFrame(columns=["target", "regulator", "coef"])
        ys = y - y.mean()
        sdy = y.std()
        if sdy > 0:
            ys = ys / sdy
        beta = _np.linalg.solve(Xz.T @ Xz + lam * _np.eye(n_reg), Xz.T @ ys)
        out = _pd.DataFrame({"target": tgt, "regulator": reg_names, "coef": _np.round(beta, 6)})
        return out[out["coef"].abs() > min_abs_coef]

    targets = expr_long.filter(~F.col(gene_col).isin(list(regulators)))
    return targets.groupBy(gene_col).applyInPandas(fit, schema)
