"""SURVEY.md §2 ⇄ registry consistency gate.

The coverage contract says every §2 checklist line is a ``queries()``
key (oracle-checked unless marked *rows-only*). This test keeps the
doc and the registry from drifting as either grows.
"""

from __future__ import annotations

import pathlib
import re

from bireme_spark import registry

_SURVEY = pathlib.Path(__file__).resolve().parent.parent / "SURVEY.md"


def _survey_names() -> dict[str, bool]:
    """name → rows-only? for every '- [x] `name`' line in §2."""
    text = _SURVEY.read_text()
    sec2 = text.split("## §2", 1)[1].split("\n## §3", 1)[0]
    out: dict[str, bool] = {}
    for line in sec2.splitlines():
        m = re.match(r"- \[x\] `([a-z0-9_]+)`(.*)", line.strip())
        if m:
            out[m.group(1)] = "rows-only" in m.group(2)
    return out


def test_every_survey_line_is_a_registered_query():
    survey = _survey_names()
    q = set(registry.queries())
    missing = sorted(set(survey) - q)
    assert not missing, f"SURVEY §2 lines without a queries() entry: {missing}"


def test_every_registered_query_has_a_survey_line():
    survey = _survey_names()
    q = set(registry.queries())
    undocumented = sorted(q - set(survey))
    assert not undocumented, f"queries() entries missing from SURVEY §2: {undocumented}"


def test_survey_headline_count_matches_bench():
    """§6's 'N headline queries' sentence must track bench.py's
    HEADLINE list — the count drifted twice (r6: 158, r7: 189)."""
    import sys

    sys.path.insert(0, str(_SURVEY.parent))
    try:
        import bench
    finally:
        sys.path.pop(0)
    text = _SURVEY.read_text()
    m = re.search(r"`bench\.py` at repo root: (\d+) headline queries", text)
    assert m, "SURVEY §6 headline-count sentence not found"
    assert int(m.group(1)) == len(bench.HEADLINE), (
        f"SURVEY §6 says {m.group(1)} headline queries; "
        f"bench.HEADLINE has {len(bench.HEADLINE)}"
    )


def test_rows_only_marking_matches_oracle_presence():
    survey = _survey_names()
    oracles = set(registry.oracle_sql())
    # a line NOT marked rows-only must have an oracle; marked lines must not
    wrong_unmarked = sorted(
        n for n, ro in survey.items() if not ro and n not in oracles
    )
    wrong_marked = sorted(n for n, ro in survey.items() if ro and n in oracles)
    assert not wrong_unmarked, f"no oracle but not marked rows-only: {wrong_unmarked}"
    assert not wrong_marked, f"marked rows-only but has an oracle: {wrong_marked}"
