"""Rewrite plans/catalog.py's CATALOG dict into the canonical window order.

The order comes from scripts/gen_window_order.py (stalest-first from the
CORRECTNESS_r*.json artifacts, PINNED_FIRST re-earns at the head, the
rows-only park at the bottom); this script is the mechanical half — it
extracts each entry's value expression with ast source segments and
re-emits the dict body with per-round section markers and the window-end
marker, leaving everything outside the dict braces untouched. Run it after
bumping AS_OF_ROUND / editing PINNED_FIRST each round; the pytest gate
(tests/test_window_order.py) fails until the rewrite lands.

Usage:
    python scripts/rotate_catalog.py [--dry-run]
"""

from __future__ import annotations

import ast
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.gen_window_order import (  # noqa: E402
    AS_OF_ROUND,
    PINNED_FIRST,
    WINDOW,
    canonical_order,
    latest_green_rounds,
)

_CATALOG_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "vectordb_bioinsight_spark",
    "plans",
    "catalog.py",
)

_PARK_COMMENT = """\
    # rows-only-by-design park (principled exemptions — label_map_2d:
    # the 2D projection is a declared driver-side boundary;
    # compression_ratio: zlib is not expressible in DuckDB SQL, pinned
    # by unit tests vs Python zlib instead):
"""


def main() -> int:
    with open(_CATALOG_PATH, encoding="utf-8") as fh:
        src = fh.read()
    tree = ast.parse(src)
    dict_node = None
    for node in ast.walk(tree):
        if isinstance(node, ast.AnnAssign) and getattr(node.target, "id", "") == "CATALOG":
            dict_node = node.value
            break
    if not isinstance(dict_node, ast.Dict):
        print("CATALOG dict literal not found")
        return 1

    values: dict[str, str] = {}
    rows_only: set[str] = set()
    for key_node, val_node in zip(dict_node.keys, dict_node.values):
        name = ast.literal_eval(key_node)
        seg = ast.get_source_segment(src, val_node)
        # normalize multi-line tuples to one line
        seg = re.sub(r"\s+", " ", seg).strip().rstrip(",")
        values[name] = seg
        # rows-only park = the tuple's SECOND element is the literal None,
        # read from the AST (not a source-text heuristic, which a trailing
        # comma or reformat would break)
        if (
            isinstance(val_node, ast.Tuple)
            and len(val_node.elts) == 2
            and isinstance(val_node.elts[1], ast.Constant)
            and val_node.elts[1].value is None
        ):
            rows_only.add(name)

    fake_catalog = {
        n: (None, None if n in rows_only else "x") for n in values
    }
    order = canonical_order(fake_catalog)
    if set(order) != set(values):
        print("order/catalog key mismatch")
        return 1

    latest = latest_green_rounds()
    lines: list[str] = []
    lines.append(
        f"    # === ORDER IS GENERATED: scripts/rotate_catalog.py, evidence as of"
        f" r{AS_OF_ROUND:02d} ===\n"
    )
    prev_tag: str | None = None
    for i, name in enumerate(order):
        if name in PINNED_FIRST:
            tag = "pinned re-earn"
            if tag != prev_tag:
                lines.append("    # kernel/planted-input re-earns (gen_window_order.PINNED_FIRST):\n")
        elif name in rows_only:
            tag = "park"
            if tag != prev_tag:
                lines.append(_PARK_COMMENT)
        else:
            tag = f"r{latest.get(name, 0):02d}"
            if tag != prev_tag:
                lines.append(f"    # latest green driver row: {tag}\n")
        prev_tag = tag
        entry = f'    "{name}": {values[name]},\n'
        if len(entry) > 100:
            inner = values[name][1:-1]
            parts = [p.strip() for p in inner.split(",") if p.strip()]
            entry = (
                f'    "{name}": (\n'
                + "".join(f"        {p},\n" for p in parts)
                + "    ),\n"
            )
        lines.append(entry)
        if i == WINDOW - 1:
            lines.append(
                f"    # --- driver window ends here (~{WINDOW} entries) ---\n"
            )

    src_lines = src.splitlines(keepends=True)
    # byte offsets of dict_node start and end
    def offset(lineno: int, col: int) -> int:
        return sum(len(l) for l in src_lines[: lineno - 1]) + col

    start = offset(dict_node.lineno, dict_node.col_offset)
    end = offset(dict_node.end_lineno, dict_node.end_col_offset)
    new_src = src[: start + 1] + "\n" + "".join(lines) + "}" + src[end:]

    if "--dry-run" in sys.argv[1:]:
        print("".join(lines[:12]))
        print(f"... {len(order)} entries")
        return 0
    with open(_CATALOG_PATH, "w", encoding="utf-8") as fh:
        fh.write(new_src)
    print(f"rewrote {_CATALOG_PATH}: {len(order)} entries, window={WINDOW}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
