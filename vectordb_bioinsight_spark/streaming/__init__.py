"""Structured Streaming re-expression of the reference's trend/briefing path
— SURVEY.md §2.11."""
