"""Docs must carry registry-derived counts (round-5 verdict: hand-edited
totals drifted). ``scripts/gen_counts.py`` stamps them; this guard fails
the suite whenever README.md / COVERAGE.md disagree with the registry."""

from __future__ import annotations

import re
from pathlib import Path

from global_market_index_etl_spark.plans import REGISTRY

REPO = Path(__file__).resolve().parent.parent

TOTAL = len(REGISTRY)
ORACLED = sum(1 for q in REGISTRY.values() if q.oracle is not None)


def test_coverage_totals_match_registry():
    text = (REPO / "COVERAGE.md").read_text()
    m = re.search(
        r"(\d+) declared queries — (\d+) with full DuckDB oracles, "
        r"(\d+) rows-only",
        text,
    )
    assert m, "COVERAGE.md totals line missing"
    assert (int(m.group(1)), int(m.group(2)), int(m.group(3))) == (
        TOTAL,
        ORACLED,
        TOTAL - ORACLED,
    ), "COVERAGE.md totals drifted — run scripts/gen_counts.py"


def test_baseline_counts_match_registry():
    """Round-7 verdict item 7: BASELINE.md's registry counts froze while
    the registry moved — now stamped by gen_counts.py and guarded here."""
    text = (REPO / "BASELINE.md").read_text()
    m = re.search(
        r"(\d+) declared queries — (\d+) with full DuckDB oracles, "
        r"(\d+) rows-only",
        text,
    )
    assert m, "BASELINE.md totals line missing"
    assert (int(m.group(1)), int(m.group(2)), int(m.group(3))) == (
        TOTAL,
        ORACLED,
        TOTAL - ORACLED,
    ), "BASELINE.md totals drifted — run scripts/gen_counts.py"


def test_readme_counts_match_registry():
    text = (REPO / "README.md").read_text()
    m = re.search(r"(\d+) declared queries, (\d+) with full DuckDB oracles", text)
    assert m, "README.md query-count phrase missing"
    assert (int(m.group(1)), int(m.group(2))) == (TOTAL, ORACLED), (
        "README.md counts drifted — run scripts/gen_counts.py"
    )


def test_readme_test_count_matches_collection():
    """Round-11 verdict: the pytest count was quoted three ways in one
    round (618/624/628) because prose stamps weren't guarded. The README
    figure is stamped by scripts/gen_counts.py from `pytest
    --collect-only`; this guard re-collects and fails the suite when the
    stamp drifts. (BASELINE.md's round narratives quote historical counts
    for their own rounds — only README's current-state figure is pinned.)"""
    import subprocess
    import sys

    text = (REPO / "README.md").read_text()
    m = re.search(r"\((\d+) tests —", text)
    assert m, "README.md test-count phrase missing"
    stamped = int(m.group(1))
    out = subprocess.run(
        [
            sys.executable, "-m", "pytest", "tests/", "--collect-only",
            "-q", "-p", "no:cacheprovider",
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    c = re.search(r"(\d+) tests collected", out)
    assert c, f"could not parse collection output:\n{out[-300:]}"
    assert stamped == int(c.group(1)), (
        f"README.md says {stamped} tests but collection finds {c.group(1)} "
        "— run scripts/gen_counts.py"
    )
