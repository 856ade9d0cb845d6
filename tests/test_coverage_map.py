"""COVERAGE.md's query-certification map must equal the enforced layout.

r9 'next round' #7: the per-operator accounting in COVERAGE.md was
hand-maintained prose that could drift from the layout
`test_window_layout.py` pins. The map is now GENERATED
(`scripts/gen_coverage_map.py`) from `__spark_entry__`'s declared
queries + the _FAMILIES digest registry; this test regenerates
the block and fails when the committed doc lags — the fix is rerunning
the generator, never hand-editing the block.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

import gen_coverage_map as gen


def test_generated_block_matches_committed_doc():
    doc = (REPO / "COVERAGE.md").read_text()
    assert gen.BEGIN in doc and gen.END in doc, (
        "COVERAGE.md lost its generated query-certification-map block"
    )
    committed = doc.split(gen.BEGIN, 1)[1].split(gen.END, 1)[0]
    fresh = gen.build_block()
    want = fresh.split(gen.BEGIN, 1)[1].split(gen.END, 1)[0]
    assert committed == want, (
        "COVERAGE.md's query map drifted from the enforced layout — "
        "rerun `python scripts/gen_coverage_map.py` and commit"
    )


def test_generated_block_accounts_for_every_query():
    block = gen.build_block()
    import __spark_entry__ as entry

    assert "UNACCOUNTED" not in block
    for q in entry.queries():
        assert f"`{q}`" in block
