"""scripts/coverage_counts.py must stamp the live round, not a
hardcoded vintage (VERDICT r11 what's-wrong #2)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from coverage_counts import current_round


def test_current_round_tracks_newest_correctness_file(tmp_path):
    for n in (1, 2, 11):
        (tmp_path / f"CORRECTNESS_r{n:02d}.json").write_text("{}")
    assert current_round(str(tmp_path)) == 11
    (tmp_path / "CORRECTNESS_r12.json").write_text("{}")
    assert current_round(str(tmp_path)) == 12


def test_current_round_empty_dir_is_zero(tmp_path):
    assert current_round(str(tmp_path)) == 0


def test_repo_label_is_not_hardcoded():
    src = (Path(__file__).resolve().parent.parent / "scripts" / "coverage_counts.py").read_text()
    assert "Round-6 state" not in src
    assert "Round-{current_round()}" in src
