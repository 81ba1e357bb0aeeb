#!/usr/bin/env python
"""Rule-exclusion identity audit (VERDICT r10 item 6): run EVERY catalog
query once with the engine's default optimizer-rule exclusion
(InferFiltersFromGenerate / InferFiltersFromConstraints excluded,
session.py) and once with STOCK Spark rules, and compare each query's
value hash across the two sessions.

The exclusion's safety argument is that those rules only ever ADD
predicates for rows a Generate/join discards anyway, so results are
identical; this audit makes the argument empirical over the whole catalog
instead of resting on the "derived join keys are non-null by construction"
prose in session.py. A future entry that violates the assumption (e.g. a
null-heavy scan-level join key whose null rows the inferred isnotnull
would have dropped EARLIER than the join — never later, so identity still
holds; or a genuinely semantics-dependent inferred filter) fails loudly
here instead of drifting silently.

    python scripts/audit_rule_exclusion.py [sf_dir]

Exits non-zero and lists mismatching queries. Gate:
tests/test_rule_exclusion_gate.py (release_gate tier, subprocess — needs
two fresh SparkSessions with different excludedRules configs).
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from scripts.audit_partition_stability import run_all  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # run_all reads the exclusion from the environment via get_session:
    # default = the engine's exclusion; "" = stock Spark rules
    os.environ.pop("SPARK_GRAFT_EXCLUDED_RULES", None)
    a = run_all(sf_dir, parts=8, cpus=8)
    os.environ["SPARK_GRAFT_EXCLUDED_RULES"] = ""
    b = run_all(sf_dir, parts=8, cpus=8)
    os.environ.pop("SPARK_GRAFT_EXCLUDED_RULES", None)
    mismatched = sorted(n for n in a if a[n] != b.get(n))
    errors = sorted(
        n for n in set(a) | set(b)
        if str(a.get(n, "")).startswith("ERR:") or str(b.get(n, "")).startswith("ERR:")
    )
    print(f"checked: {len(a)}")
    print(f"MISMATCHED: {mismatched}")
    print(f"ERRORS: {errors}")
    return 1 if (mismatched or errors) else 0


if __name__ == "__main__":
    raise SystemExit(main())
