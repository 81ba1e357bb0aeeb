"""Generate the canonical driver-window ordering from CORRECTNESS_r*.json.

The external driver hash-checks roughly the FIRST 50 entries of
``plans/catalog.py::CATALOG`` each round, so the dict's key order IS the
rotation schedule. Through r09 that order was comment-enforced by hand —
the same convention class the r08 advice killed for ``MIN_CLUSTERS``
(VERDICT r09 task 4). This script makes it computed:

* **Evidence**: an entry's round-of-record is the latest round whose
  ``CORRECTNESS_r*.json`` shows ``hash_match: true`` for it, considering
  artifacts up to ``AS_OF_ROUND`` only (so a new driver artifact landing
  mid-round cannot silently change what the gate asserts — bump
  ``AS_OF_ROUND`` when rotating for the next round).
* **Canonical order**: ``PINNED_FIRST`` (kernel/planted-input re-earns,
  each with a written reason) first, then every other oracle-backed entry
  stalest-first (round-of-record ascending, name ascending within a
  round), then the rows-only-by-design park (alphabetical, so no window
  slot ever scores as a ``no_oracle`` error).

``tests/test_window_order.py`` asserts CATALOG's key order matches this
exactly; ``scripts/rotate_catalog.py`` rewrites catalog.py to it.

Usage:
    python scripts/gen_window_order.py          # print the order
    python scripts/gen_window_order.py --check  # exit 1 on CATALOG mismatch
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Rounds of evidence the current CATALOG order is rotated against. Bump
#: this (and re-run scripts/rotate_catalog.py) when rotating for a new
#: round; leaving it pinned keeps the pytest gate deterministic even after
#: the driver writes the next CORRECTNESS artifact.
AS_OF_ROUND = 10

#: Entries whose kernel or planted inputs changed AFTER their latest driver
#: row, so they re-earn at the head of the next window regardless of
#: staleness (the rule of record in the verify protocol). name -> reason.
#: (The r10 pins — summary_parse_docs, cohort_log_rank, ab_conversion —
#: all re-earned green in CORRECTNESS_r10 and rotate back into staleness
#: order.)
PINNED_FIRST: dict[str, str] = {
    # r11: semdedup's GEMM loser kernel now re-rounds decision-boundary
    # cosines with exact decimal HALF_UP (ADVICE r10 — np.round half-even
    # could flip keep/drop on a 6-dp dyadic half), so both consumers'
    # r10 rows predate the kernel and re-earn.
    "semdedup": "GEMM kernel HALF_UP boundary re-round (ADVICE r10)",
    "semdedup_auto": "GEMM kernel HALF_UP boundary re-round (ADVICE r10)",
    # r11: item_cf_topk restructured (score canonical edges once, explode
    # to both directions — VERDICT r10 item 4).
    "item_cf_parts": "item_cf_topk union->explode restructure (VERDICT r10 item 4)",
    # r11: the small-graph driver route gained the 2^22 edge-collect bound
    # (VERDICT r10 item 2) — routing, not math, but both pagerank
    # consumers' rows predate the routing kernel and re-earn.
    "part_ppr": "pagerank driver-route edge bound (VERDICT r10 item 2)",
    "pagerank_words": "pagerank driver-route edge bound (VERDICT r10 item 2)",
}

#: The driver verifies roughly this many entries per round.
WINDOW = 50


def latest_green_rounds(as_of: int = AS_OF_ROUND) -> dict[str, int]:
    """name -> latest round (<= as_of) with a hash-green driver row."""
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        rnd = int(m.group(1))
        if rnd > as_of:
            continue
        with open(path, encoding="utf-8") as fh:
            data = json.load(fh)
        for name, row in data.items():
            if row.get("hash_match") is True:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def canonical_order(catalog: dict[str, tuple] | None = None) -> list[str]:
    if catalog is None:
        from vectordb_bioinsight_spark.plans.catalog import CATALOG as catalog
    latest = latest_green_rounds()
    oracle_backed = [n for n, (_fn, sql) in catalog.items() if sql is not None]
    parked = sorted(n for n, (_fn, sql) in catalog.items() if sql is None)
    pinned = [n for n in PINNED_FIRST if n in catalog]
    missing = [n for n in PINNED_FIRST if n not in catalog]
    if missing:
        raise ValueError(f"PINNED_FIRST names not in CATALOG: {missing}")
    rest = sorted(
        (n for n in oracle_backed if n not in PINNED_FIRST),
        key=lambda n: (latest.get(n, 0), n),
    )
    return pinned + rest + parked


def main() -> int:
    from vectordb_bioinsight_spark.plans.catalog import CATALOG

    order = canonical_order(CATALOG)
    if "--check" in sys.argv[1:]:
        actual = list(CATALOG)
        if actual != order:
            first_bad = next(
                i for i, (a, b) in enumerate(zip(actual, order)) if a != b
            )
            print(
                f"CATALOG order diverges from canonical at index {first_bad}: "
                f"catalog={actual[first_bad]!r} canonical={order[first_bad]!r} "
                f"(run scripts/rotate_catalog.py)"
            )
            return 1
        print(f"OK: CATALOG order is canonical ({len(order)} entries, as_of=r{AS_OF_ROUND:02d})")
        return 0
    latest = latest_green_rounds()
    for i, name in enumerate(order):
        rnd = latest.get(name, 0)
        tag = "pin" if name in PINNED_FIRST else (f"r{rnd:02d}" if rnd else "park")
        marker = "  <-- window ends" if i == WINDOW - 1 else ""
        print(f"{i + 1:3d} {tag} {name}{marker}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
