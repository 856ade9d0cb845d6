"""Generate COVERAGE.md's query -> certification map from the enforced
window layout (r9 'next round' #7: the per-operator accounting was
hand-maintained prose and could drift from the layout the tests pin).

The single source of truth is `__spark_entry__` (declared query order +
the `_FAMILIES` digest registry) — the same objects
`test_driver_signs_every_declared_query` proves exhaustive (round 13:
every query is in-window or a digest member; the STANDALONE escape
hatch is gone). This script renders them as a markdown table between
the BEGIN/END markers in COVERAGE.md; `tests/test_coverage_map.py`
regenerates the block and fails if the committed doc drifted.

    python scripts/gen_coverage_map.py          # rewrite COVERAGE.md in place
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

BEGIN = "<!-- BEGIN GENERATED: query-certification-map (scripts/gen_coverage_map.py) -->"
END = "<!-- END GENERATED: query-certification-map -->"

WINDOW = 50


def build_block() -> str:
    import __spark_entry__ as entry

    names = list(entry.queries())
    member_of: dict[str, str] = {}
    # the digest->family registry IS the layout's single source of
    # truth (round 13): test_families_registry_matches_declared_digests
    # asserts it equals the declared digests
    families = entry._FAMILIES
    for digest, members in families.items():
        for m in members:
            member_of[m] = digest

    lines = [
        BEGIN,
        "",
        f"_{len(names)} declared queries; window = first {WINDOW} slots the",
        "driver certifies per round. Generated — edit the layout (in",
        "`__spark_entry__.py` / `tests/test_window_layout.py`) and rerun",
        "`python scripts/gen_coverage_map.py`; `tests/test_coverage_map.py`",
        "fails when this block drifts from the enforced layout._",
        "",
        "| # | query | certification | driver window |",
        "|---|---|---|---|",
    ]
    for i, q in enumerate(names, start=1):
        if q in families:
            cert = f"family digest ({len(families[q])} members re-certified per hash-match)"
        elif q in member_of:
            cert = f"member of `{member_of[q]}`"
        elif i <= WINDOW:
            cert = "standalone oracle (in-window)"
        else:  # unreachable while the layout test passes
            cert = "UNACCOUNTED"
        win = f"slot {i}" if i <= WINDOW else "judge replay (51+)"
        if q in member_of and i > WINDOW:
            win += f"; digest in window"
        lines.append(f"| {i} | `{q}` | {cert} | {win} |")
    lines += ["", END]
    return "\n".join(lines)


def main() -> int:
    path = os.path.join(REPO, "COVERAGE.md")
    with open(path) as f:
        doc = f.read()
    block = build_block()
    if BEGIN in doc:
        pre, _, rest = doc.partition(BEGIN)
        _, _, post = rest.partition(END)
        doc = pre + block + post
    else:
        doc = doc.rstrip() + "\n\n## Query certification map (generated)\n\n" + block + "\n"
    with open(path, "w") as f:
        f.write(doc)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
