#!/usr/bin/env python
"""Regenerate the SURVEY §2 id -> catalog entry index inside
docs/COVERAGE.md (see nba_spurs_etl_spark/plans/coverage_map.py).

Usage: python scripts/gen_coverage_map.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from nba_spurs_etl_spark.plans import coverage_map  # noqa: E402


def main() -> int:
    block = coverage_map.write_index(REPO)
    n = sum(1 for line in block.splitlines() if line.startswith("| "))
    uncovered = block.count("**UNCOVERED**")
    print(f"wrote docs/COVERAGE.md index: {n - 1} ids, "
          f"{uncovered} uncovered")
    return 1 if uncovered else 0


if __name__ == "__main__":
    sys.exit(main())
