"""Operators — SURVEY.md §2.2-§2.10.

Each operator is a composable function ``DataFrame -> DataFrame`` with a
declared output schema, an oracle test, and scale notes in its docstring.
"""

from __future__ import annotations


def check_kernel(kernel: str) -> None:
    """Validate a dual-kernel operator's ``kernel=`` argument. Rejects
    typos like 'Arrow'/'arow' instead of silently running the
    measured-slower expression path (results would be identical, so
    nothing downstream would ever flag the mistake)."""
    if kernel not in ("arrow", "expression"):
        raise ValueError(f"kernel must be 'arrow' or 'expression', got {kernel!r}")
