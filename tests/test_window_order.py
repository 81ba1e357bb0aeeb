"""Driver-window rotation gate (VERDICT r09 task 4): CATALOG's key order
must equal the canonical order COMPUTED from the CORRECTNESS_r*.json
artifacts (stalest green driver row first, pinned kernel re-earns at the
head, the rows-only park at the bottom) — the rotation schedule was
comment-enforced by hand through r09, the same silently-breakable
convention class the r08 advice killed for ``MIN_CLUSTERS``.

The evidence set is pinned to ``gen_window_order.AS_OF_ROUND`` so a new
driver artifact landing mid-round cannot flip this test; the first act of
each round's rotation is bumping AS_OF_ROUND and re-running
scripts/rotate_catalog.py.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from scripts.gen_window_order import (
    PINNED_FIRST,
    WINDOW,
    canonical_order,
    latest_green_rounds,
)
from vectordb_bioinsight_spark.plans.catalog import CATALOG


def test_catalog_order_is_canonical():
    assert list(CATALOG) == canonical_order(CATALOG), (
        "CATALOG key order diverges from the generated stalest-first order; "
        "run: python scripts/rotate_catalog.py"
    )


def test_window_is_oracle_backed_and_stalest_first():
    """No window slot may score as a no_oracle error, and every entry
    inside the window must be at least as stale as every entry outside it
    (pins exempt — they re-earn on kernel changes, not staleness)."""
    names = list(CATALOG)
    latest = latest_green_rounds()
    window, below = names[:WINDOW], names[WINDOW:]
    assert all(CATALOG[n][1] is not None for n in window)
    max_in = max(latest.get(n, 0) for n in window if n not in PINNED_FIRST)
    min_out = min(
        latest.get(n, 0) for n in below if CATALOG[n][1] is not None
    )
    assert max_in <= min_out, (max_in, min_out)


def test_pins_have_reasons():
    for name, reason in PINNED_FIRST.items():
        assert name in CATALOG
        assert len(reason) > 10, f"pin {name} needs a written reason"
