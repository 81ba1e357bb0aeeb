"""Variant annotation & driver prediction — SURVEY M13 / S5 / S6.

Reference: rule-based driver scoring over parsed VCF/MAF variants
(agent_variant.py:237-351): hotspot match (+40), COSMIC presence (up to
+20), effect impact (×15), TSG+LoF (+15), oncogene+activating-hotspot
(+10); driver when score >= 50, capped at 100.

Engine shape: every rule is a column expression over a variants DataFrame;
hotspots / gene roles are broadcast dimension tables (the reference's
in-code dicts become rows — at scale these come from snapshot tables, the
S9 pattern). Evidence strings are built with concat_ws over conditional
fragments, matching the reference's evidence list semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: LoF effect substrings (agent_variant.py:278-283)
LOF_EFFECTS = ("frameshift", "nonsense", "stop_gained", "splice_donor",
               "splice_acceptor", "start_lost")

#: effect -> impact weight (EFFECT_IMPACT analog, agent_variant.py:268-276)
EFFECT_IMPACT = {
    "frameshift": 1.0,
    "nonsense": 1.0,
    "stop_gained": 1.0,
    "splice": 0.9,
    "missense": 0.6,
    "inframe": 0.5,
    "synonymous": 0.1,
}
DEFAULT_IMPACT = 0.3


def parse_vcf_info(variants: DataFrame, info_col: str = "info") -> DataFrame:
    """Extract typed DP / AF fields from the raw VCF INFO string
    (agent_variant.py:414-517's key=value parse as regexp columns)."""
    # regexp_extract yields '' when the key is absent; ANSI cast('') throws,
    # so try_cast -> NULL (the reference treats missing INFO keys as None)
    return variants.withColumn(
        "dp", F.regexp_extract(F.col(info_col), r"DP=(\d+)", 1).try_cast("int")
    ).withColumn(
        "af", F.regexp_extract(F.col(info_col), r"AF=([0-9.]+)", 1).try_cast("double")
    )


def effect_impact(effect_col: str = "effect") -> "F.Column":
    """Impact weight ladder over the effect string (first matching key)."""
    e = F.lower(F.col(effect_col))
    expr = F.lit(DEFAULT_IMPACT)
    # build inside-out so earlier (stronger) keys win
    for key, w in reversed(list(EFFECT_IMPACT.items())):
        expr = F.when(e.contains(key), F.lit(w)).otherwise(expr)
    return expr


def is_lof(effect_col: str = "effect") -> "F.Column":
    e = F.lower(F.col(effect_col))
    pred = F.lit(False)
    for lof in LOF_EFFECTS:
        pred = pred | e.contains(lof)
    return pred


def driver_scores(
    variants: DataFrame,
    hotspots: DataFrame,
    gene_roles: DataFrame,
    driver_threshold: float = 50.0,
) -> DataFrame:
    """M13 driver prediction as expressions + broadcast joins.

    ``variants``: (gene, aa_change, effect, vaf, in_cosmic boolean, ...).
    ``hotspots``: dimension (gene, aa_change). ``gene_roles``: (gene, role)
    with role in {TSG, Oncogene}.

    Output adds: is_hotspot, role, driver_score (0-100), is_driver,
    evidence (';'-joined fragments, reference's evidence list).
    """
    hs = hotspots.select("gene", "aa_change").withColumn("_hs", F.lit(True))
    withhs = variants.join(F.broadcast(hs), ["gene", "aa_change"], "left").na.fill(
        {"_hs": False}
    )
    withrole = withhs.join(F.broadcast(gene_roles), "gene", "left").na.fill(
        {"role": "Unknown"}
    )
    hotspot_pts = F.when(F.col("_hs"), 40.0).otherwise(0.0)
    cosmic_pts = F.when(F.col("in_cosmic"), 20.0).otherwise(0.0)
    effect_pts = effect_impact() * 15.0
    tsg_lof_pts = F.when((F.col("role") == "TSG") & is_lof(), 15.0).otherwise(0.0)
    onco_act_pts = F.when(
        (F.col("role") == "Oncogene")
        & (F.lower(F.col("effect")) == "missense")
        & F.col("_hs"),
        10.0,
    ).otherwise(0.0)
    score = F.least(
        F.lit(100.0),
        hotspot_pts + cosmic_pts + effect_pts + tsg_lof_pts + onco_act_pts,
    )
    evidence = F.concat_ws(
        ";",
        F.when(F.col("_hs"), F.concat(F.lit("hotspot:"), F.col("gene"), F.lit(" "), F.col("aa_change"))),
        F.when(F.col("in_cosmic"), F.lit("cosmic")),
        F.when((F.col("role") == "TSG") & is_lof(), F.lit("tsg_lof")),
        F.when(F.col("vaf") >= 0.3, F.lit("clonal_vaf")),
    )
    return (
        withrole.withColumn("driver_score", F.round(score, 4))
        .withColumn("is_driver", F.col("driver_score") >= driver_threshold)
        .withColumn("evidence", evidence)
        .withColumnRenamed("_hs", "is_hotspot")
    )
