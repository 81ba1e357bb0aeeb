"""Partitioning-stability gate (VERDICT r07 task 6): the FP-accumulation
flake guard that caught seasonal_decompose and shap_gene_stats_dims now
runs every round by construction, not by checklist.

Runs scripts/audit_partition_stability.py in a SUBPROCESS — the audit
needs two fresh SparkSessions with different shuffle-partition/cpu
settings, which would tear down this suite's shared session-scoped
fixture if run in-process. The script exits non-zero and lists the
unstable queries when any catalog entry's value-hash differs across
partitionings (SCALING rule 44).
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.release_gate
def test_all_catalog_entries_partitioning_stable():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(_REPO, "scripts", "audit_partition_stability.py"),
            "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=_REPO,
    )
    tail = "\n".join(proc.stdout.splitlines()[-5:])
    assert proc.returncode == 0, (
        f"partitioning-unstable or erroring catalog entries detected:\n{tail}\n"
        f"stderr tail: {proc.stderr[-500:]}"
    )
    assert "UNSTABLE: []" in proc.stdout, tail
    # identical crashes hash equal — the script reports them separately
    # so an entry that raises under BOTH settings still fails the gate
    assert "ERRORS: []" in proc.stdout, tail
