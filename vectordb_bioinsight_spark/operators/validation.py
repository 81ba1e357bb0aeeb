"""Data-quality expectations — the contract-check tier every production
table crosses before anything downstream trusts it (the
"great-expectations" pattern, engine-native): declare row rules, get one
violation ledger back.

Scale shape: every ROW-LEVEL rule compiles to one conditional sum inside
a SINGLE aggregation over a single scan — adding a rule adds an
expression, never a pass. Uniqueness rules are the exception (inherently
a groupBy); each adds one key-keyed aggregation. The ledger itself is
rule-cardinality rows, inlined from the one-row aggregate exactly like
the funnel's step counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: rule tuples accepted by :func:`table_expectations`:
#:   ("not_null", col)
#:   ("range", col, lo, hi)          # inclusive bounds; None = unbounded
#:   ("accepted", col, [values])
#:   ("regex", col, pattern)         # full-match expectation
#:   ("unique", [cols])
Rule = tuple


def _row_violation(rule: Rule) -> "tuple[str, str, Column]":
    kind = rule[0]
    if kind == "not_null":
        _, col = rule
        return kind, col, F.col(col).isNull()
    if kind == "range":
        _, col, lo, hi = rule
        v: Column = F.lit(False)
        if lo is not None:
            v = v | (F.col(col) < lo)
        if hi is not None:
            v = v | (F.col(col) > hi)
        # NULLs are not range violations (not_null is its own rule)
        return kind, col, F.coalesce(v, F.lit(False))
    if kind == "accepted":
        _, col, values = rule
        return kind, col, F.coalesce(~F.col(col).isin(list(values)), F.lit(False))
    if kind == "regex":
        _, col, pattern = rule
        return kind, col, F.coalesce(~F.col(col).rlike(pattern), F.lit(False))
    raise ValueError(f"unknown rule kind: {kind}")


def table_expectations(df: DataFrame, rules: "list[Rule]") -> DataFrame:
    """Evaluate every rule and return the violation ledger:
    (rule, column, n_violations, n_rows, passed) — one row per rule,
    ``passed`` iff zero violations. Row rules share ONE scan; each
    ``unique`` rule adds one groupBy whose violation count is the number
    of surplus rows among fully-NON-NULL keys (keyed rows − distinct
    keys): count_distinct skips NULL-keyed rows, so counting them on the
    total side would report a spurious violation per NULL (ADVICE r05) —
    NULL keys are not duplicates; cover them with ``not_null``."""
    row_rules = [r for r in rules if r[0] != "unique"]
    uniq_rules = [r for r in rules if r[0] == "unique"]

    out = None
    if row_rules:
        aggs = [F.count("*").cast("long").alias("_n")]
        for i, r in enumerate(row_rules):
            _, _, viol = _row_violation(r)
            aggs.append(F.sum(viol.cast("long")).cast("long").alias(f"_v{i}"))
        one = df.agg(*aggs)
        ledger = F.array(
            *[
                F.struct(
                    F.lit(r[0]).alias("rule"),
                    F.lit(str(r[1])).alias("column"),
                    F.coalesce(F.col(f"_v{i}"), F.lit(0)).cast("long").alias("n_violations"),
                    F.col("_n").alias("n_rows"),
                )
                for i, r in enumerate(row_rules)
            ]
        )
        out = one.select(F.inline(ledger))
    for r in uniq_rules:
        _, cols = r
        keyed = F.lit(True)
        for c in cols:
            keyed = keyed & F.col(c).isNotNull()
        u = df.agg(
            F.count("*").cast("long").alias("_n"),
            F.coalesce(F.sum(keyed.cast("long")), F.lit(0)).cast("long").alias("_k"),
            F.count_distinct(*[F.col(c) for c in cols]).cast("long").alias("_d"),
        ).select(
            F.lit("unique").alias("rule"),
            F.lit(",".join(cols)).alias("column"),
            (F.col("_k") - F.col("_d")).cast("long").alias("n_violations"),
            F.col("_n").alias("n_rows"),
        )
        out = u if out is None else out.unionByName(u)
    if out is None:
        raise ValueError("table_expectations: no rules given")
    return out.withColumn("passed", F.col("n_violations") == 0)


def fk_violations(
    fact: DataFrame,
    fact_col: str,
    dim: DataFrame,
    dim_col: str,
) -> DataFrame:
    """Referential-integrity check: fact rows whose key has no match in
    the dimension (NULL keys excluded — cover them with not_null).
    Broadcast anti-join when the dimension is broadcast-sized; the
    violating ROWS come back (bounded by the violation count), so the
    caller can quarantine them, not just count them."""
    keys = dim.select(F.col(dim_col).alias(fact_col)).distinct()
    return fact.filter(F.col(fact_col).isNotNull()).join(
        keys, fact_col, "left_anti"
    )
