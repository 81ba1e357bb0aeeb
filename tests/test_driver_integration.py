"""Integrated driver scoring (operators/driver_integration.py) vs a pure
python port of the reference ladder (agent_integrated_driver.py:533-634)."""

import random

import pytest

from vectordb_bioinsight_spark.operators.driver_integration import (
    CANDIDATE_THRESHOLD,
    CONFIRMED_DRIVER_THRESHOLD,
    HIGH_CONFIDENCE_THRESHOLD,
    ONCOGENES,
    TSG_GENES,
    integrated_driver_scores,
)


def _port(profile):
    """_calculate_integrated_score, ported (:533-634)."""
    score = 0.0
    gene = profile.get("gene", "")
    has_mutation = profile.get("has_mutation", False)
    if has_mutation:
        score += min(30, profile.get("mutation_driver_score", 0) * 0.5)
        if profile.get("is_hotspot"):
            score += 15
        if profile.get("mutation_vaf", 0) >= 0.3:
            score += 5
    has_expr = profile.get("has_expr", False)
    if has_expr:
        l2 = abs(profile.get("log2fc", 0))
        padj = profile.get("padj", 1)
        direction = profile.get("direction", "")
        if l2 > 2:
            score += 15
        elif l2 > 1.5:
            score += 12
        elif l2 > 1:
            score += 8
        if padj < 0.001:
            score += 10
        elif padj < 0.01:
            score += 7
        elif padj < 0.05:
            score += 4
        role = "TSG" if gene in TSG_GENES else (
            "Oncogene" if gene in ONCOGENES else "Unknown")
        consistent = (direction == "up" if role == "Oncogene"
                      else direction == "down" if role == "TSG" else True)
        if consistent and role != "Unknown":
            score += 5
    if profile.get("is_hub"):
        score += min(15, profile.get("hub_score", 0) * 25)
    if has_mutation and has_expr:
        score += 10
    score = min(100, score)
    if score >= CONFIRMED_DRIVER_THRESHOLD:
        cls = "confirmed_driver" if (has_mutation and has_expr) else "high_confidence"
    elif score >= HIGH_CONFIDENCE_THRESHOLD:
        cls = "high_confidence"
    elif score >= CANDIDATE_THRESHOLD:
        cls = "candidate"
    elif has_mutation:
        cls = "mutation_only"
    elif has_expr:
        cls = "expression_only"
    else:
        cls = "insufficient_evidence"
    return round(score, 4), cls


def test_fuzz_vs_reference_port(spark):
    """120 random gene profiles (real role-table symbols mixed with
    synthetics, evidence channels dropped at random) in one Spark job."""
    rng = random.Random(9)
    pool = list(TSG_GENES[:6]) + list(ONCOGENES[:6]) + [f"G{i}" for i in range(30)]
    deg_rows, hub_rows, mut_rows, want = [], [], [], {}
    for i, g in enumerate(rng.sample(pool, 40)):
        prof = {"gene": g}
        if rng.random() < 0.7:
            l2 = round(rng.uniform(-3, 3), 2)
            padj = rng.choice([0.0005, 0.004, 0.02, 0.3, 0.9])
            deg_rows.append((g, l2, padj))
            prof.update(has_expr=True, log2fc=l2, padj=padj,
                        direction="up" if l2 > 0 else "down")
        if rng.random() < 0.5:
            hs = round(rng.uniform(0, 1), 2)
            hub_rows.append((g, hs))
            prof.update(is_hub=True, hub_score=hs)
        if rng.random() < 0.6:
            n = rng.randrange(1, 3)
            best_ds, best_vaf, any_hot = 0.0, 0.0, False
            for _ in range(n):
                ds = round(rng.uniform(0, 95), 1)
                vaf = round(rng.uniform(0, 0.6), 2)
                hot = rng.random() < 0.3
                mut_rows.append((g, ds, vaf, hot, f"p.X{i}"))
                best_ds, best_vaf = max(best_ds, ds), max(best_vaf, vaf)
                any_hot = any_hot or hot
            prof.update(has_mutation=True, mutation_driver_score=best_ds,
                        mutation_vaf=best_vaf, is_hotspot=any_hot)
        if len(prof) > 1:
            want[g] = _port(prof)

    deg = spark.createDataFrame(deg_rows or [("ZZ", 0.0, 1.0)],
                                "gene string, log2fc double, padj double")
    hub = spark.createDataFrame(hub_rows or [("ZZ", 0.0)],
                                "gene string, hub_score double")
    muts = spark.createDataFrame(
        mut_rows or [("ZZ", 0.0, 0.0, False, "")],
        "gene string, driver_score double, vaf double, is_hotspot boolean,"
        " amino_acid_change string",
    )
    got = {r["gene"]: r for r in integrated_driver_scores(deg, hub, muts).collect()}
    for g, (score, cls) in want.items():
        assert got[g]["score"] == pytest.approx(score, abs=1e-9), g
        assert got[g]["classification"] == cls, (g, got[g], score, cls)


def test_branch_semantics(spark):
    """Crafted rows: confirmed needs both omics at >= 80; ENSG ids drop;
    mutation-only / expression-only floors; role consistency both ways."""
    deg = spark.createDataFrame(
        [
            ("KRAS", 2.5, 0.0005),      # oncogene up: 15+10+5
            ("TP53", -2.5, 0.0005),     # TSG down: 15+10+5
            ("tp53x", 0.2, 0.9),        # unknown role, tiny evidence
            ("ENSG000123", 3.0, 0.001), # dropped
        ],
        "gene string, log2fc double, padj double",
    )
    muts = spark.createDataFrame(
        [("KRAS", 90.0, 0.5, True, "p.G12D"), ("NF1", 20.0, 0.1, False, "")],
        "gene string, driver_score double, vaf double, is_hotspot boolean,"
        " amino_acid_change string",
    )
    got = {r["gene"]: r for r in integrated_driver_scores(deg, None, muts).collect()}
    assert "ENSG000123" not in got
    # KRAS: mut 30+15+5 + expr 15+10+5 + multi 10 = 90 -> confirmed
    assert got["KRAS"]["score"] == 90.0
    assert got["KRAS"]["classification"] == "confirmed_driver"
    assert got["KRAS"]["hotspot_variant"] == "p.G12D"
    # TP53: expr only 15+10+5 = 30 -> below candidate -> expression_only
    assert got["TP53"]["score"] == 30.0
    assert got["TP53"]["classification"] == "expression_only"
    # NF1: mutation only 10 -> mutation_only
    assert got["NF1"]["score"] == 10.0
    assert got["NF1"]["classification"] == "mutation_only"
    assert got["TP53X"]["classification"] == "expression_only"


def _two_track_port(data, db):
    """_score_known_drivers / _score_novel_drivers, ported
    (driver_predictor.py:764-943) + get_literature_support (:403-448)."""
    def lit_support(d):
        if d.get("is_cosmic_tier1"):
            return "well_established"
        if d.get("is_intogen") or d.get("is_pancancer") or d.get("is_cosmic_tier2") \
           or d.get("in_gene_roles") or d.get("is_emerging_regulator"):
            return "emerging"
        return "uncharacterized"

    out = {}
    for g, gd in data.items():
        d = db.get(g, {})
        if d.get("is_known"):
            cosmic = 0 if d.get("cosmic_tier") is None else (
                25 if d["cosmic_tier"] == "Tier1" else 15)
            score = (cosmic + min(25, d.get("tcga_freq", 0) * 50)
                     + (25 if abs(gd["log2fc"]) > 2 else 20 if abs(gd["log2fc"]) > 1
                        else 10 if abs(gd["log2fc"]) > 0.5 else 0)
                     + (15 if gd["padj"] < 0.001 else 12 if gd["padj"] < 0.01
                        else 8 if gd["padj"] < 0.05 else 0)
                     + (10 if gd["is_hub"] else 0))
            out[g] = ("known", round(score, 4))
        else:
            if abs(gd["log2fc"]) < 1.0 or gd["padj"] > 0.05:
                continue
            l2 = abs(gd["log2fc"])
            score = ((30 if l2 > 3 else 25 if l2 > 2 else 20 if l2 > 1.5
                      else 15 if l2 > 1 else 0)
                     + (30 if gd["is_hub"] else 20 if gd["hub_score"] > 0.5
                        else 10 if gd["hub_score"] > 0.3 else 0)
                     + (20 if gd["padj"] < 0.0001 else 15 if gd["padj"] < 0.001
                        else 10 if gd["padj"] < 0.01 else 5 if gd["padj"] < 0.05 else 0)
                     + min(10, gd["pathway_count"] * 2)
                     + (10 if gd["db_matched"] else 0))
            if score < 40:
                continue
            out[g] = ("candidate_regulator", round(score, 4))
    return out


def test_two_track_fuzz_vs_port(spark):
    from vectordb_bioinsight_spark.operators.driver_integration import (
        two_track_driver_scores,
    )

    rng = random.Random(17)
    data, db = {}, {}
    gd_rows, db_rows = [], []
    for i in range(80):
        g = f"Z{i}"
        gd = dict(
            log2fc=round(rng.uniform(-4, 4), 2),
            padj=rng.choice([0.00005, 0.0005, 0.005, 0.03, 0.3]),
            is_hub=rng.random() < 0.4,
            hub_score=round(rng.uniform(0, 1), 2),
            pathway_count=rng.randrange(0, 9),
            db_matched=rng.random() < 0.5,
        )
        data[g] = gd
        gd_rows.append((g, gd["log2fc"], gd["padj"],
                        "up" if gd["log2fc"] > 0 else "down", gd["is_hub"],
                        gd["hub_score"], gd["pathway_count"], gd["db_matched"]))
        if rng.random() < 0.8:
            tier = rng.choice(["Tier1", "Tier2", None])
            d = dict(
                is_known=rng.random() < 0.4,
                cosmic_tier=tier,
                tcga_freq=round(rng.uniform(0, 0.8), 3),
                is_cosmic_tier1=tier == "Tier1",
                is_cosmic_tier2=tier == "Tier2",
                is_intogen=rng.random() < 0.3,
                is_pancancer=rng.random() < 0.3,
                in_gene_roles=rng.random() < 0.5,
                is_emerging_regulator=rng.random() < 0.2,
            )
            db[g] = d
            db_rows.append((g, d["is_known"], tier, "Oncogene", d["tcga_freq"], 1,
                            ["V600E"] if rng.random() < 0.5 else [],
                            d["is_intogen"], d["is_pancancer"], ["LUAD"],
                            d["is_cosmic_tier1"], d["is_cosmic_tier2"],
                            d["in_gene_roles"], d["is_emerging_regulator"]))
    gene_data = spark.createDataFrame(
        gd_rows,
        "gene string, log2fc double, padj double, direction string,"
        " is_hub boolean, hub_score double, pathway_count int, db_matched boolean",
    )
    driver_db = spark.createDataFrame(
        db_rows,
        "gene string, is_known boolean, cosmic_tier string, cosmic_role string,"
        " tcga_freq double, tcga_count long, hotspots array<string>,"
        " is_intogen boolean, is_pancancer boolean, pancancer_cancers array<string>,"
        " is_cosmic_tier1 boolean, is_cosmic_tier2 boolean, in_gene_roles boolean,"
        " is_emerging_regulator boolean",
    )
    got = {r["gene"]: (r["track"], r["score"]) for r in
           two_track_driver_scores(gene_data, driver_db).collect()}
    want = _two_track_port(data, db)
    assert got == want
