"""Every reference citation in the package must resolve to a real file.

Provenance comments (reference file:line in docstrings) are load-bearing
in this repo — the parity audit follows them — so a citation to a file
that does not exist in /root/reference is a documentation bug (VERDICT
r04 found one: a urls.py cite of a non-existent paper_ingest.py). Same
discipline as test_queries_md.py: mechanically enforce what the docs
claim. Skips cleanly when the reference checkout is absent (CI without
the fixture tree).
"""

from __future__ import annotations

import os
import re
from pathlib import Path

import pytest

_REFERENCE = Path("/root/reference")
_PACKAGE = Path(__file__).resolve().parent.parent / "vectordb_bioinsight_spark"

#: reference top-level trees that citations may point into
_CITE_RE = re.compile(
    r"(?:backend|rnaseq_pipeline|bio-daily-briefing)/[A-Za-z0-9_/.-]+\.py"
)


def _cited_paths() -> "dict[str, list[str]]":
    cites: dict[str, list[str]] = {}
    for py in sorted(_PACKAGE.rglob("*.py")):
        text = py.read_text(encoding="utf-8")
        for m in _CITE_RE.findall(text):
            cites.setdefault(m, []).append(str(py.relative_to(_PACKAGE.parent)))
    return cites


@pytest.mark.skipif(not _REFERENCE.is_dir(), reason="reference checkout absent")
def test_every_cited_reference_path_exists():
    missing = {
        path: sorted(set(where))
        for path, where in _cited_paths().items()
        if not (_REFERENCE / path).is_file()
    }
    assert not missing, (
        "citations to non-existent reference files (fix the docstring or "
        f"the path): {missing}"
    )


def test_citation_scan_finds_the_corpus():
    """Guard the guard: the regex must actually be matching the package's
    citation idiom — if a refactor changed the comment style, this floor
    keeps the resolution test from passing vacuously."""
    assert len(_cited_paths()) >= 10
