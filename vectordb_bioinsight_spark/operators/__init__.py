"""Operators — SURVEY.md §2.2-§2.10.

Each operator is a composable function ``DataFrame -> DataFrame`` with a
declared output schema, an oracle test, and scale notes in its docstring.
"""
