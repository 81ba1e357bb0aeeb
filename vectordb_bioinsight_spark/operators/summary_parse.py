"""Structured-summary parsing — the reference's LLM-response parser
(``backend/app/core/summarizer.py:374-484``, ``_parse_summary`` +
``_set_section``) as a distributed fold.

The LLM call itself is a declared boundary; its OUTPUT parsing is
deterministic and is what this module ports:

* JSON path (``:391-417``): extract a fenced ```json block (else the
  first brace-to-last-brace span), parse, and read the upper-case field
  names. Spark's ``from_json`` stands in for ``json.loads`` — both
  reject the same planted payloads; exotic JSON accepted by one parser
  and not the other is out of scope and documented here.
* Text path (``:420-469``): a line-at-a-time fold — section markers
  (the 6-section, ~28-marker table, case-insensitive ``startswith``),
  bullet/number cleanup, content accumulation, and the
  later-marker-overwrites rule (``_set_section`` is called once per
  marker occurrence, so a repeated section keeps only its LAST block).

  Two PINNED deviations from the reference fold, shared by both kernels
  and the DuckDB twin (ADVICE r09 — recorded so a parity audit doesn't
  rediscover them):

  - **Empty re-instance does not overwrite**: the reference's
    ``_set_section`` flush fires even with empty content, so
    ``'RESULTS:\\nfoo\\nRESULTS:'`` ends with ``''`` there; here a block
    needs >= 1 non-empty content line to overwrite, so it keeps ``'foo'``.
  - **ASCII-space trim only**: the reference strips all whitespace
    (``line.strip()``); both kernels strip ASCII spaces (``F.trim`` /
    ``.strip(' ')``), so a ``\\r`` left by CRLF input survives in content
    and can defeat a marker match. Feed ``\\n``-normalized text.

Distributed shape — two kernels, values pinned identical
(tests/test_summary_parse.py):

* ``kernel="arrow"`` (default since r09): the fold is per-DOCUMENT, so it
  needs no explode and no shuffle at all — one Arrow-batched scalar
  pandas_udf folds each summary into a 6-field section struct in a single
  scan-local pass (SCALING rule 40 coda: a 28-marker × per-line rule
  ladder re-evaluated as expression ``when`` chains is exactly the
  interpreted-HOF shape the Arrow kernels replaced; here the expression
  form ALSO paid a |corpus|-lines doc-keyed exchange that the kernel
  deletes outright).
* ``kernel="expression"``: explode lines with position, one doc-keyed
  window assigns each line to its most recent marker (a running marker
  count, so repeated sections become distinct instances), one groupBy
  assembles each instance's content in line order, and a per-(doc,
  section) window keeps the last instance. All shuffles doc-keyed. This
  form is the DuckDB-replay anchor the catalog twin mirrors and the
  property tests pin the Arrow kernel against.
"""

from __future__ import annotations

import re as _re

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vectordb_bioinsight_spark.operators import check_kernel

#: summarizer.py:426-433 — section marker table (dict order = match
#: priority; within a section, list order).
SECTION_MARKERS: dict[str, list[str]] = {
    "purpose": ["PURPOSE:", "PURPOSE", "**PURPOSE**", "**PURPOSE:**"],
    "methods": ["METHODS:", "METHODS", "**METHODS**", "**METHODS:**", "METHODOLOGY:"],
    "results": ["RESULTS:", "RESULTS", "**RESULTS**", "**RESULTS:**", "FINDINGS:"],
    "conclusions": ["CONCLUSIONS:", "CONCLUSIONS", "**CONCLUSIONS**", "**CONCLUSIONS:**", "CONCLUSION:"],
    "key_findings": ["KEY_FINDINGS:", "KEY FINDINGS:", "**KEY FINDINGS**", "**KEY_FINDINGS:**"],
    "limitations": ["LIMITATIONS:", "LIMITATIONS", "**LIMITATIONS**", "**LIMITATIONS:**"],
}

#: the JSON payload fields read at summarizer.py:405-414 that this
#: operator surfaces (list-valued KEY_FINDINGS is pipe-joined).
_JSON_SCHEMA = (
    "PURPOSE string, METHODS string, RESULTS string, CONCLUSIONS string, "
    "KEY_FINDINGS array<string>, LIMITATIONS string"
)

_SECTIONS = ["purpose", "methods", "results", "conclusions", "key_findings", "limitations"]

#: summarizer.py:457 — bullet/number prefixes stripped from list lines.
_BULLET_STRIP = r"^[-•*0-9. ]+"


#: python mirror of the expression bullet test / strip (Java and Python
#: regex agree on these finite classes — the rule-29 argument).
_BULLET_RE = _re.compile(r"^(-|•|\*|1\.|2\.|3\.)")
_BULLET_STRIP_RE = _re.compile(_BULLET_STRIP)

#: precompiled (section, MARKER_UPPER, len) rows in reference priority
#: order — first match wins, same net order as _marker_match's reversed
#: when-chain.
_MARKER_ROWS = [
    (sec, mk.upper(), len(mk))
    for sec, markers in SECTION_MARKERS.items()
    for mk in markers
]


def _py_text_sections(text: "str | None") -> "dict[str, str | None]":
    """The per-document twin of the expression fold. Whitespace handling
    mirrors the expression form EXACTLY: F.trim strips ASCII spaces only,
    so this uses ``.strip(' ')``, not ``.strip()`` — a ``\\r`` left by
    CRLF text must survive (or not) identically in both kernels."""
    out: dict[str, str | None] = {s: None for s in _SECTIONS}
    if text is None:
        return out
    cur: "str | None" = None
    buf: list[str] = []

    def flush() -> None:
        # the expression form emits a block only when the instance has
        # >= 1 non-empty content line, then keeps the MAX-instance block
        # per section — forward flush-overwrite-if-nonempty is the same
        if cur is not None and buf:
            out[cur] = (" | " if cur == "key_findings" else " ").join(buf)

    for raw in text.split("\n"):
        line = raw.strip(" ")
        lu = line.upper()
        hit = next((m for m in _MARKER_ROWS if lu.startswith(m[1])), None)
        if hit is not None:
            flush()
            cur, buf = hit[0], []
            rem = line[hit[2]:].strip(" ")
            if rem:
                buf.append(rem)
        elif cur is not None:  # preamble (before any marker) is dropped
            c = _BULLET_STRIP_RE.sub("", line) if _BULLET_RE.match(line) else line
            if c:
                buf.append(c)
    flush()
    return out


def _sections_struct_udf():
    """Arrow-batched scalar UDF: summary text -> struct of the 6 sections
    (NULL field = section absent, the long form's missing row)."""
    from pyspark.sql.functions import pandas_udf

    schema = ", ".join(f"{s} string" for s in _SECTIONS)

    @pandas_udf(schema)
    def _fold(texts: pd.Series) -> pd.DataFrame:
        rows = [_py_text_sections(t) for t in texts]
        return pd.DataFrame(rows, columns=_SECTIONS, dtype="object")

    return _fold


def _marker_match(line: Column) -> tuple[Column, Column]:
    """First matching (section, marker length) for a line, reference
    order; NULLs when no marker matches."""
    upper = F.upper(line)
    section = F.lit(None).cast("string")
    mlen = F.lit(None).cast("int")
    for sec, markers in reversed(list(SECTION_MARKERS.items())):
        for marker in reversed(markers):
            hit = upper.startswith(marker.upper())
            section = F.when(hit, F.lit(sec)).otherwise(section)
            mlen = F.when(hit, F.lit(len(marker))).otherwise(mlen)
    return section, mlen


def parse_summary_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "summary_text",
    kernel: str = "arrow",
) -> DataFrame:
    """summarizer.py:420-469 — the text-path fold, one row per
    (document, section) that actually appeared; content space-joined in
    line order (key_findings items joined with ' | '). ``kernel`` picks
    the shuffle-free Arrow fold (default; module docstring) or the
    exploded-window expression tree it is property-tested against."""
    check_kernel(kernel)
    if kernel == "arrow":
        folded = df.select(
            id_col, _sections_struct_udf()(F.col(text_col)).alias("_ts")
        )
        pairs = F.array(
            *[
                F.struct(F.lit(s).alias("section"), F.col("_ts")[s].alias("content"))
                for s in _SECTIONS
            ]
        )
        return (
            folded.select(id_col, F.explode(pairs).alias("_p"))
            .filter(F.col("_p.content").isNotNull())
            .select(id_col, F.col("_p.section").alias("section"), F.col("_p.content").alias("content"))
        )
    lines = df.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("line", F.trim("line"))
    section, mlen = _marker_match(F.col("line"))
    marked = lines.withColumn("_sec", section).withColumn("_mlen", mlen)

    w = Window.partitionBy(id_col).orderBy("pos")
    # instance id: how many marker lines seen so far (0 = preamble, dropped)
    inst = F.sum(F.when(F.col("_sec").isNotNull(), 1).otherwise(0)).over(w)
    cur_sec = F.last(F.col("_sec"), ignorenulls=True).over(w)
    staged = marked.withColumn("_inst", inst).withColumn("_cursec", cur_sec)

    is_marker = F.col("_sec").isNotNull()
    remaining = F.trim(F.col("line").substr(F.col("_mlen") + 1, F.lit(1 << 20)))
    is_bullet = F.col("line").rlike(r"^(-|•|\*|1\.|2\.|3\.)")
    cleaned = F.regexp_replace(F.col("line"), _BULLET_STRIP, "")
    content = F.when(is_marker, remaining).otherwise(
        F.when(is_bullet, cleaned).otherwise(F.col("line"))
    )
    kept = (
        staged.filter(F.col("_inst") > 0)
        .withColumn("_content", content)
        .filter(F.col("_content") != "")
    )
    # join with a sentinel, then pick the section's separator: space for
    # prose sections (the reference's ' '.join), ' | ' for key_findings
    # (a list in the reference, pipe-joined for the scalar-safe output)
    blocks = kept.groupBy(id_col, "_inst").agg(
        F.first("_cursec").alias("section"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "_content"))),
                lambda s: s["_content"],
            ),
            "\x1f",
        ).alias("_joined"),
    )
    sep = F.when(F.col("section") == "key_findings", F.lit(" | ")).otherwise(F.lit(" "))
    blocks = blocks.withColumn(
        "content", F.replace(F.col("_joined"), F.lit("\x1f"), sep)
    )
    # later marker occurrence overwrites: keep the max-instance block
    w2 = Window.partitionBy(id_col, "section").orderBy(F.col("_inst").desc())
    return (
        blocks.withColumn("_rk", F.row_number().over(w2))
        .filter(F.col("_rk") == 1)
        .select(id_col, "section", "content")
    )


def parse_summary(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "summary_text",
    kernel: str = "arrow",
) -> DataFrame:
    """summarizer.py:374-469 — full parser: JSON path first, text-path
    fallback, one WIDE row per document (sections as columns,
    key_findings pipe-joined, ``parsed_from`` records the path).

    ``kernel="arrow"`` (default) computes the text-path sections with the
    per-document Arrow fold as one more column on the same scan — the
    whole parser becomes a ZERO-exchange plan (the expression form paid
    an explode + doc-keyed window + pivot + self-join, all to express a
    per-row computation)."""
    check_kernel(kernel)
    fenced = F.regexp_extract(
        F.col(text_col), r"(?s)```(?:json)?\s*(\{.*?\})\s*```", 1
    )
    raw_json = F.regexp_extract(F.col(text_col), r"(?s)(\{.*\})", 1)
    json_str = F.when(fenced != "", fenced).otherwise(raw_json)
    parsed = F.from_json(json_str, _JSON_SCHEMA)
    # the reference falls back to text parsing only on JSONDecodeError —
    # an empty {} still takes the JSON path (with default field values).
    # from_json is PERMISSIVE (all-null struct on malformed input), so
    # validity comes from try_parse_json, which nulls out like json.loads
    # raises.
    json_ok = (json_str != "") & F.try_parse_json(json_str).isNotNull()
    base = df.select(
        id_col,
        F.col(text_col),
        json_ok.alias("_json_ok"),
        F.coalesce(parsed["PURPOSE"], F.lit("")).alias("_j_purpose"),
        F.coalesce(parsed["METHODS"], F.lit("")).alias("_j_methods"),
        F.coalesce(parsed["RESULTS"], F.lit("")).alias("_j_results"),
        F.coalesce(parsed["CONCLUSIONS"], F.lit("")).alias("_j_conclusions"),
        F.coalesce(
            F.array_join(parsed["KEY_FINDINGS"], " | "), F.lit("")
        ).alias("_j_key_findings"),
        F.coalesce(parsed["LIMITATIONS"], F.lit("Not specified")).alias("_j_limitations"),
    )
    if kernel == "arrow":
        # no explode/pivot/join: the section struct is one more column on
        # the same scan. JSON-path rows feed NULL into the fold (the
        # kernel's text-is-None early-out) so a JSON-heavy corpus doesn't
        # pay the per-row text parse for rows whose struct fields the
        # final select never reads (ADVICE r09).
        joined = base.withColumn(
            "_ts",
            _sections_struct_udf()(F.when(~F.col("_json_ok"), F.col(text_col))),
        )
        for s in _SECTIONS:
            joined = joined.withColumn(s, F.col("_ts")[s])
    else:
        text_rows = parse_summary_text(
            base.filter(~F.col("_json_ok")), id_col, text_col, kernel=kernel
        )
        text_wide = text_rows.groupBy(id_col).pivot("section", _SECTIONS).agg(
            F.first("content")
        )
        for s in _SECTIONS:
            if s not in text_wide.columns:  # pragma: no cover - pivot fills all
                text_wide = text_wide.withColumn(s, F.lit(None).cast("string"))
        joined = base.join(text_wide, id_col, "left")
    default_lim = F.lit("Not specified")
    return joined.select(
        id_col,
        F.when(F.col("_json_ok"), F.lit("json")).otherwise(F.lit("text")).alias("parsed_from"),
        F.when(F.col("_json_ok"), F.col("_j_purpose")).otherwise(F.coalesce("purpose", F.lit(""))).alias("purpose"),
        F.when(F.col("_json_ok"), F.col("_j_methods")).otherwise(F.coalesce("methods", F.lit(""))).alias("methods"),
        F.when(F.col("_json_ok"), F.col("_j_results")).otherwise(F.coalesce("results", F.lit(""))).alias("results"),
        F.when(F.col("_json_ok"), F.col("_j_conclusions")).otherwise(F.coalesce("conclusions", F.lit(""))).alias("conclusions"),
        F.when(F.col("_json_ok"), F.col("_j_key_findings")).otherwise(F.coalesce("key_findings", F.lit(""))).alias("key_findings"),
        F.when(F.col("_json_ok"), F.col("_j_limitations")).otherwise(F.coalesce("limitations", default_lim)).alias("limitations"),
    )
