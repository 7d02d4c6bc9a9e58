#!/usr/bin/env python
"""Keep SURVEY.md's closing numbers honest.

SURVEY.md carries a machine-readable marker line::

    <!-- CHECK: rows=162 queries=136 oracles=132 tests=256 -->

This script asserts those numbers against ground truth — the §2 table
rows actually present in SURVEY.md, the live ``QUERIES``/``ORACLE``
registries, and (standalone mode only) the pytest collection count —
so a round's claimed coverage can't silently drift from the code.

Run standalone (``python scripts/check_survey.py``) or via the pytest
wrapper in ``tests/test_operators.py`` (which skips the subprocess
test-count check; the count is self-evident in the same run).
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MARKER = re.compile(
    r"<!-- CHECK: rows=(\d+) queries=(\d+) oracles=(\d+) tests=(\d+) -->"
)


def survey_claims() -> dict[str, int]:
    text = open(os.path.join(REPO, "SURVEY.md")).read()
    m = MARKER.search(text)
    assert m, "SURVEY.md is missing its '<!-- CHECK: ... -->' marker line"
    claims = dict(zip(("rows", "queries", "oracles", "tests"), map(int, m.groups())))
    row_nums = [int(n) for n in re.findall(r"^\|\s*(\d+)\s*\|", text, re.M)]
    assert len(row_nums) == len(set(row_nums)), "duplicate §2 row numbers"
    claims["_actual_rows"] = len(row_nums)
    claims["_max_row"] = max(row_nums)
    return claims


def check(include_test_count: bool = True) -> None:
    claims = survey_claims()
    assert claims["_actual_rows"] == claims["rows"], (
        f"SURVEY claims {claims['rows']} §2 rows; tables contain {claims['_actual_rows']}"
    )
    assert claims["_max_row"] == claims["rows"], (
        f"§2 numbering is not dense: max row {claims['_max_row']} != count {claims['rows']}"
    )

    from sift_spark.oracle import ORACLE
    from sift_spark.queries import QUERIES

    assert len(QUERIES) == claims["queries"], (
        f"SURVEY claims {claims['queries']} queries; registry has {len(QUERIES)}"
    )
    assert len(ORACLE) == claims["oracles"], (
        f"SURVEY claims {claims['oracles']} oracles; registry has {len(ORACLE)}"
    )
    orphans = set(ORACLE) - set(QUERIES)
    assert not orphans, f"oracles without a queries() twin: {sorted(orphans)}"

    if include_test_count:
        import subprocess

        out = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
            cwd=REPO, capture_output=True, text=True, timeout=300,
        ).stdout
        m = re.search(r"(\d+) tests collected", out)
        assert m, f"could not parse pytest collection output: {out[-500:]}"
        assert int(m.group(1)) == claims["tests"], (
            f"SURVEY claims {claims['tests']} tests; pytest collects {m.group(1)}"
        )


if __name__ == "__main__":
    check(include_test_count=True)
    print("SURVEY.md closing numbers match the live registry.")
