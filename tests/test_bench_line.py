"""The bench stdout line must ALWAYS fit the driver's 2000-char tail
window — BENCH_r05..r07 were recorded as parsed:null because the full
record front-truncated out of it. These tests pin the degradation ladder
in bench.compact_line at the current suite size and at sizes far past it,
so growing HEADLINE can never silently lose a round's artifact again.

No Spark session: compact_line is pure dict/json arithmetic.
"""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from bench import HEADLINE, STDOUT_BUDGET, compact_line

HOST = {"idle_pct": 89.3, "steal_pct": 0.02, "load1": 2.7, "load1_max": 5.9}


def _line(n_queries: int, name_len: int = 10) -> str:
    # ~15-char names mirror the real HEADLINE distribution (mean ~15)
    timings = {f"q{'x' * name_len}{i:04d}": 1.234 + i * 0.01 for i in range(n_queries)}
    return compact_line(timings, round(sum(timings.values()), 3), 0.1, 14.5, 94.5, HOST)


def test_current_suite_fits_with_host_telemetry():
    # the REAL suite names at realistic magnitudes — the exact line the
    # driver will parse next round must fit WITH the telemetry intact
    timings = {name: 0.5 + (i % 40) * 0.1 for i, name in enumerate(HEADLINE)}
    line = compact_line(timings, round(sum(timings.values()), 3), 0.1, 14.5, 94.5, HOST)
    assert len(line) <= STDOUT_BUDGET
    d = json.loads(line)
    assert d["host"] == HOST, "telemetry should survive at the current suite size"
    assert len(d["queries"]) == len(HEADLINE)


def test_diagnostics_drop_before_timing_fields():
    # scan upward to the first size where the budget binds: host must be
    # the first casualty, with every per-query timing still present at 2dp
    for n in range(len(HEADLINE), len(HEADLINE) + 60):
        line = _line(n)
        d = json.loads(line)
        assert len(line) <= STDOUT_BUDGET
        if "host" not in d:
            assert "queries" in d and len(d["queries"]) == n, (
                "host must be dropped before any query timing degrades"
            )
            break
    else:  # pragma: no cover - would mean the budget never binds
        raise AssertionError("field-drop rung never exercised")


def test_far_oversized_suites_still_fit_and_stay_parseable():
    for n in (120, 200, 400):
        line = _line(n)
        assert len(line) <= STDOUT_BUDGET, n
        d = json.loads(line)
        assert d["metric"] == "headline_suite_total"
        assert d["value"] > 0
        if "queries_truncated_to_slowest" in d:
            # last-resort rung: the kept set is the slowest queries
            kept = d["queries"]
            assert len(kept) == d["queries_truncated_to_slowest"]
            assert min(kept.values()) >= 1.2


def test_empty_suite_degenerate_but_valid():
    line = compact_line({}, 0.0, 0.1, 0.0, 0.0, HOST)
    d = json.loads(line)
    assert d["queries"] == {} and len(line) <= STDOUT_BUDGET
