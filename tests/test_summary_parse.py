"""Structured-summary parser (operators/summary_parse.py) — pinned against
a direct python port of summarizer.py:374-484 (_parse_summary +
_set_section), JSON path and text path."""

from __future__ import annotations

import json
import re

from vectordb_bioinsight_spark.operators.summary_parse import (
    SECTION_MARKERS,
    parse_summary,
)


def _port(summary_text):
    out = {
        "purpose": "", "methods": "", "results": "", "conclusions": "",
        "key_findings": [], "limitations": "Not specified",
    }
    m = re.search(r"```(?:json)?\s*(\{.*?\})\s*```", summary_text, re.DOTALL)
    js = m.group(1) if m else None
    if js is None:
        m = re.search(r"\{.*\}", summary_text, re.DOTALL)
        js = m.group(0) if m else None
    if js:
        try:
            data = json.loads(js)
            out["purpose"] = data.get("PURPOSE", "")
            out["methods"] = data.get("METHODS", "")
            out["results"] = data.get("RESULTS", "")
            out["conclusions"] = data.get("CONCLUSIONS", "")
            out["key_findings"] = data.get("KEY_FINDINGS", [])
            out["limitations"] = data.get("LIMITATIONS", "Not specified")
            return "json", out
        except (json.JSONDecodeError, AttributeError):
            pass
    sections = {}
    cur, content = None, []
    for line in summary_text.split("\n"):
        line = line.strip()
        lu = line.upper()
        found, remaining = None, ""
        for sec, markers in SECTION_MARKERS.items():
            for mk in markers:
                if lu.startswith(mk.upper()):
                    found, remaining = sec, line[len(mk):].strip()
                    break
            if found:
                break
        if found:
            if cur:
                sections[cur] = content
            cur, content = found, ([remaining] if remaining else [])
        elif line.startswith(("-", "•", "*", "1.", "2.", "3.")):
            c = line.lstrip("-•*0123456789. ")
            if c:
                content.append(c)
        elif line:
            content.append(line)
    if cur:
        sections[cur] = content
    for sec, c in sections.items():
        out[sec] = c if sec == "key_findings" else " ".join(c)
    return "text", out


_TEXTS = [
    # fenced JSON with list findings
    'Header noise\n```json\n{"PURPOSE": "study X", "KEY_FINDINGS": ["a", "b"],'
    ' "LIMITATIONS": "small n"}\n```\ntrailing',
    # raw JSON
    '{"METHODS": "RNA-seq", "RESULTS": "up"}',
    # empty JSON still takes the JSON path (reference json.loads succeeds)
    "{}",
    # text path: markers, bullets, repeated RESULTS (later overwrites)
    "PURPOSE: find Y\nsecond line\nMETHODS\n- step one\n- step two\n"
    "RESULTS: good\nKEY FINDINGS:\n- f1\n• f2\nLIMITATIONS: few\n"
    "RESULTS: overwritten better",
    # bold markers, METHODOLOGY alias, numbered bullets, dropped preamble
    "preamble dropped\n**PURPOSE:** bold purpose\nMETHODOLOGY: alt marker\n"
    "1. numbered\n3. third",
    # no markers at all -> every section empty/default
    "no markers at all, plain text",
    # malformed JSON falls back to text parsing (json.loads raises)
    "broken json {not valid} but PURPOSE: fallback works",
    # marker with empty remaining; blank lines do not split sections
    "CONCLUSIONS:\n\nfirst\n\nsecond",
]


import pytest


@pytest.mark.parametrize("kernel", ["arrow", "expression"])
def test_parse_summary_matches_port(spark, kernel):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS)], "doc_id int, summary_text string"
    )
    got = {r["doc_id"]: r.asDict() for r in parse_summary(df, kernel=kernel).collect()}
    for i, t in enumerate(_TEXTS):
        pfrom, want = _port(t)
        g = got[i]
        kf = want["key_findings"]
        exp = {
            "parsed_from": pfrom,
            "purpose": want["purpose"],
            "methods": want["methods"],
            "results": want["results"],
            "conclusions": want["conclusions"],
            "key_findings": " | ".join(kf) if isinstance(kf, list) else kf,
            "limitations": want["limitations"],
        }
        for k, v in exp.items():
            gv = g[k] or ""
            assert (v or "") == gv, (i, k, v, gv)


def test_arrow_kernel_matches_expression_kernel(spark):
    """r09 kernel pin: the shuffle-free Arrow fold and the exploded-window
    expression tree must agree row-for-row — on the hand cases, on CRLF
    text (F.trim strips ASCII spaces only; the twin must too), and on
    adversarial marker/bullet shapes."""
    from vectordb_bioinsight_spark.operators.summary_parse import parse_summary_text

    extra = [
        "PURPOSE: x\r\nMETHODS:\r\n- a\r\n",      # CRLF: \r must survive both kernels
        "RESULTS:\nfirst block\nRESULTS:\n\n",       # later EMPTY instance of a section
        "  PURPOSE:   spaced   \nKEY FINDINGS:\n• k1\n* k2\n2. k3",
        "**LIMITATIONS:** bold\nCONCLUSION: alias",
        "PURPOSE\nno colon marker form",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS + extra)],
        "doc_id int, summary_text string",
    )
    for fn in (parse_summary, parse_summary_text):
        a = sorted(map(tuple, fn(df, kernel="arrow").collect()))
        e = sorted(map(tuple, fn(df, kernel="expression").collect()))
        assert a == e, (fn.__name__, a, e)
