"""Zero-row vacuity gate (VERDICT r08 task 5): every catalog entry must
return at least one row at ALL THREE SFs — a hash oracle over an empty
result proves nothing, and both failure directions have now happened:

* small-SF-empty: the r08 census (sf0.01) caught basket_rules and
  wealthy_inactive_customers (thresholds nothing in the synthetic data
  could clear); the r09 census caught dominant_shippers (a single-nation
  pin over ~10 qualifying suppliers — empty at sf0.001 by lottery).
* LARGE-SF-empty: the r09 census caught important_parts (a fixed fraction
  of a growing total selects nothing once the part count dilutes every
  share) and part_link_prediction (raw-partkey pair collisions fall
  ~1/parts^2, so the weight>=2 wedge graph vanishes at sf0.1) — entries
  whose driver rows at sf0.01 were genuine but whose semantics died at
  10x. Exactly the scale-up class this repo exists to catch.
* ALL-NULL COLUMN (r10, VERDICT r09 task 2): the same vacuity one column
  at a time — the r10 census caught cohort_log_rank (zero log-rank
  deaths at EVERY SF, so observed_a/expected_a/z/chi2 were NULL
  everywhere) and ab_conversion (pooled conversion rate 1.0 -> z_stat
  NULL everywhere), both re-planted with SF-invariant-density arguments
  (SCALING rule 46 r10 coda).

Runs scripts/audit_zero_rows.py in a SUBPROCESS (its own 32-cpu session —
cpus=32 passed explicitly, like the partitioning-stability gate) over
sf0.001 + sf0.01 + sf0.1; ONE aggregate job per entry per SF covers both
the zero-row and the all-NULL-column check.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.release_gate
def test_no_catalog_entry_is_empty_at_any_sf():
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts", "audit_zero_rows.py")],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=_REPO,
    )
    tail = "\n".join(proc.stdout.splitlines()[-6:])
    assert proc.returncode == 0, (
        f"vacuous (zero-row) or erroring catalog entries detected:\n{tail}\n"
        f"stderr tail: {proc.stderr[-500:]}"
    )
    assert "EMPTY: []" in proc.stdout, tail
    assert "ALLNULL: []" in proc.stdout, tail
    assert "ERRORS: []" in proc.stdout, tail
