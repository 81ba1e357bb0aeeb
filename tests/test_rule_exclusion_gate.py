"""Rule-exclusion identity gate (VERDICT r10 item 6): the session-wide
InferFiltersFromGenerate/InferFiltersFromConstraints exclusion
(session.py) rests on the argument that those rules only add predicates
for rows the plan discards anyway. This gate proves it empirically every
round: every catalog entry's value hash must be IDENTICAL with the
exclusion and with stock Spark rules.

Runs scripts/audit_rule_exclusion.py in a SUBPROCESS (needs two fresh
SparkSessions with different excludedRules configs). release_gate tier:
full-catalog x 2 sessions is ~8 min, far past the per-change budget —
run with `python -m pytest tests/ -m release_gate -q` each round.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.release_gate
def test_catalog_results_identical_with_and_without_rule_exclusion():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(_REPO, "scripts", "audit_rule_exclusion.py"),
            "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=_REPO,
    )
    tail = "\n".join(proc.stdout.splitlines()[-5:])
    assert proc.returncode == 0, (
        f"rule-exclusion changed some query's result (or an entry errored):\n{tail}\n"
        f"stderr tail: {proc.stderr[-500:]}"
    )
    assert "MISMATCHED: []" in proc.stdout, tail
    assert "ERRORS: []" in proc.stdout, tail
