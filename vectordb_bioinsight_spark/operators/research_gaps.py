"""Research-gap mining: gap-sentence extraction + opportunity scoring.

The reference's research-gaps surface (backend/app/api/routes/
research_gaps.py:95-303) mines "what we don't know yet" out of
abstracts: four regex families (future-research calls, unclear
mechanisms, lacking data, emerging questions) select sentences, each
cleaned/truncated to 300 chars, kept only over 50 chars, capped at 5
per type; a gap's priority combines min(100, ratio*1000) with a
sweet-spot evidence ladder (moderate counts beat both noise and
well-known territory) and an inverse-volume ladder, weighted
0.4/0.35/0.25.

Spark-first shape: sentence splitting uses a marker-insert + split
(equivalent to the reference's lookbehind split, which RE2 can't
replay), the per-(sentence, gap-type) match is one regexp over the
alternation of the family's patterns, and the per-doc cap is a
row_number window. The scoring ladders are one expression per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["GAP_PATTERNS", "gap_sentences", "gap_priority_scores"]

#: gap-type -> regex family (research_gaps.py:95-120)
GAP_PATTERNS: "dict[str, list[str]]" = {
    "future_research": [
        r"future (?:research|studies|investigations?) (?:is|are|should|will|need)",
        r"(?:further|more) (?:research|studies|investigation) (?:is|are) (?:needed|required|warranted)",
        r"warrants? further (?:investigation|study|research)",
        r"remains? to be (?:determined|elucidated|investigated|clarified)",
    ],
    "unclear_mechanism": [
        r"(?:mechanism|pathway) (?:remains?|is) (?:unclear|unknown|poorly understood)",
        r"underlying (?:mechanism|cause) (?:is|remains?) not (?:fully )? understood",
        r"(?:exact|precise) (?:mechanism|pathway) (?:is|has) not been (?:identified|determined)",
        r"how .+ (?:remains|is) (?:unclear|unknown)",
    ],
    "lacking_data": [
        r"(?:limited|scarce|insufficient) (?:data|evidence|studies)",
        r"(?:lack|absence) of (?:clinical|experimental) (?:data|evidence)",
        r"(?:few|limited) studies have (?:examined|investigated|explored)",
        r"(?:no|little) (?:data|evidence) (?:exists?|is available)",
    ],
    "emerging_question": [
        r"(?:whether|if) .+ (?:remains|is) (?:unclear|unknown|to be determined)",
        r"(?:it is|remains?) (?:unclear|unknown) (?:whether|if|how)",
        r"(?:the|a) (?:question|issue) of .+ (?:remains|is) (?:open|unresolved)",
        r"(?:controversial|debated) (?:whether|if)",
    ],
}

#: marker-insert split: '([.!?])\s+' -> '$1<US>' then split — equivalent
#: to the reference's lookbehind split re.split(r'(?<=[.!?])\s+', ...)
#: (research_gaps.py:223), which RE2 cannot replay
_SENT_MARK = "\x1f"  # unit separator, never in corpus text


def split_sentences_portable(text: Column) -> Column:
    return F.split(
        F.regexp_replace(text, r"([.!?])\s+", "$1" + _SENT_MARK), _SENT_MARK, -1
    )


def gap_sentences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_per_type: int = 5,
    min_len: int = 50,
    max_len: int = 300,
) -> DataFrame:
    """extract_gap_sentences (research_gaps.py:221-238) across all four
    gap families: sentences matching ANY of a family's patterns,
    trimmed, truncated to ``max_len``, kept over ``min_len``, first
    ``max_per_type`` per (doc, type) in sentence order. Output:
    (id, gap_type, gap_idx, sentence)."""
    from pyspark.sql import Window

    sent = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            split_sentences_portable(F.coalesce(F.col(text_col), F.lit("")))
        ).alias("sent_idx", "sentence"),
    )
    per_type = []
    for gap_type, pats in GAP_PATTERNS.items():
        alt = "(?i)" + "|".join(f"(?:{p})" for p in pats)
        clean = F.substring(F.trim("sentence"), 1, max_len)
        per_type.append(
            sent.filter(F.regexp_like("sentence", F.lit(alt)))
            .select(
                "id", "sent_idx",
                F.lit(gap_type).alias("gap_type"),
                clean.alias("clean"),
            )
            .filter(F.length("clean") > min_len)
        )
    allg = per_type[0]
    for p in per_type[1:]:
        allg = allg.unionAll(p)
    w = Window.partitionBy("id", "gap_type").orderBy("sent_idx")
    return (
        allg.withColumn("gap_idx", F.row_number().over(w))
        .filter(F.col("gap_idx") <= max_per_type)
        .select("id", "gap_type", F.col("gap_idx").cast("int"), F.col("clean").alias("sentence"))
    )


def gap_priority_scores(
    gaps: DataFrame,
    ratio_col: str = "gap_ratio",
    evidence_col: str = "evidence_count",
    total_col: str = "total_papers",
) -> DataFrame:
    """calculate_priority_score (research_gaps.py:272-301): ratio scaled
    x1000 capped at 100; a sweet-spot evidence ladder (<5: 30, <20: 80,
    <50: 60, else 40 — moderate evidence beats noise AND saturation);
    an inverse-volume ladder (<100: 90, <500: 70, <2000: 50, else 30);
    weighted 0.4/0.35/0.25, rounded 1 dp. Adds priority_score."""
    ratio_score = F.least(F.lit(100.0), F.col(ratio_col) * 1000)
    ev = F.col(evidence_col)
    evidence_score = (
        F.when(ev < 5, 30).when(ev < 20, 80).when(ev < 50, 60).otherwise(40)
    )
    tot = F.col(total_col)
    volume_score = (
        F.when(tot < 100, 90).when(tot < 500, 70).when(tot < 2000, 50).otherwise(30)
    )
    return gaps.withColumn(
        "priority_score",
        F.round(
            ratio_score * 0.4 + evidence_score * 0.35 + volume_score * 0.25, 1
        ),
    )
