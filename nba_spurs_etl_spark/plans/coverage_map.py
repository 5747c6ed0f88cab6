"""SURVEY §2 coverage index, derived from registry group tags.

VERDICT r08 item 8: the §2 coverage table must not be able to drift
from the catalog. This module is the single source of truth that maps
every operator id in SURVEY.md §2 (S1..S15, P1..P10, J1..J8, A1..A9,
W1..W4, O1..O2, U1..U3, F1..F8, plus the section-level extensions
2.9/2.10/2.11) to the catalog entries whose ``group`` string carries
the tag — or, for the handful of ids whose semantics cannot execute
inside the driver harness (object-store sinks, JDBC-style loaders), to
the named pytest that gates them. ``scripts/gen_coverage_map.py``
renders the index into ``docs/COVERAGE.md`` between markers, and
``tests/test_plans.py`` asserts (a) every SURVEY §2 id is covered by a
registry tag or a TEST_GATED row, (b) every TEST_GATED test name still
exists, and (c) the rendered block in COVERAGE.md is current.

Tag grammar in ``register(group=...)``: a token ``2.3-J2/J3/J7``
declares ids J2, J3, J7 (the section prefix is for the human reader;
the letter disambiguates the id); bare section tokens (``2.4``,
``2.9``) declare section-level coverage used by the 2.9/2.10/2.11
extension rows.
"""

from __future__ import annotations

import os
import re

#: §2 ids that are deliberately gated by pytest, not by a catalog
#: entry: their semantics involve side effects (object-store writes,
#: PK-raise on a sink, pipeline drop+reload lifecycle) that the
#: driver's read-only query harness cannot express. Each maps to the
#: test (tests/test_pipeline.py) that executes it end-to-end; the
#: coverage test asserts the names stay real.
TEST_GATED: dict[str, str] = {
    "S8": "test_object_store_scheme_roundtrip",
    "S9": "test_entity_roundtrip_format_agnostic",
    "S12": "test_pk_validation_raises_on_duplicates",
    "S13": "test_pipeline_gold_matches_direct",
    "S14": "test_pipeline_gold_matches_direct",
    "S15": "test_pipeline_gold_matches_direct",
    # F6 (lower() key fold) runs inside every silver loader, but its
    # contract (first-record-wins, mapping table) is pinned here:
    "F6": "test_normalize_first_wins_and_projection",
}

_ID_RE = re.compile(r"^[SPJAWOUF]\d+$")
_ROW_RE = re.compile(r"^\|\s*([SPJAWOUF]\d+(?:/[SPJAWOUF]?\d+)*)\s*\|")
_SECTIONS = ("2.9", "2.10", "2.11")


def survey_ids(survey_path: str) -> list[str]:
    """Every operator id declared in SURVEY.md §2.1-§2.8 tables (in
    document order), plus the section-level extension ids 2.9-2.11.
    Combined rows like ``S13`` vs ``J3/J4`` expand to their parts."""
    ids: list[str] = []
    in_s2 = False
    with open(survey_path, encoding="utf-8") as f:
        for line in f:
            if line.startswith("## "):
                in_s2 = line.startswith("## 2.")
                continue
            if not in_s2:
                continue
            m = _ROW_RE.match(line)
            if not m:
                continue
            prefix = ""
            for part in m.group(1).split("/"):
                if _ID_RE.match(part):
                    ids.append(part)
                    prefix = part[0]
                elif part.isdigit() or (part and part[1:].isdigit()):
                    # 'J3/J4' style: second part may drop the letter
                    ids.append(prefix + part if part.isdigit() else part)
    ids.extend(_SECTIONS)
    seen: set[str] = set()
    return [i for i in ids if not (i in seen or seen.add(i))]


def expand_group_tags(group: str) -> set[str]:
    """Ids declared by one registry ``group`` string (see grammar in
    the module docstring). Bare section tokens map to themselves."""
    out: set[str] = set()
    for tok in group.split():
        if tok in _SECTIONS:
            out.add(tok)
            continue
        m = re.match(r"^2\.\d+-(.+)$", tok)
        if not m:
            continue
        for part in m.group(1).split("/"):
            if _ID_RE.match(part):
                out.add(part)
    return out


def registry_id_index() -> dict[str, list[str]]:
    """id -> sorted catalog entry names whose group declares it."""
    from .catalog import registry

    idx: dict[str, list[str]] = {}
    for name, entry in registry().items():
        for i in expand_group_tags(entry.group):
            idx.setdefault(i, []).append(name)
    return {i: sorted(ns) for i, ns in idx.items()}


BEGIN_MARK = "<!-- BEGIN GENERATED S2 TAG INDEX (scripts/gen_coverage_map.py) -->"
END_MARK = "<!-- END GENERATED S2 TAG INDEX -->"


def render_index(survey_path: str) -> str:
    """The generated markdown block (markers included)."""
    idx = registry_id_index()
    lines = [
        BEGIN_MARK,
        "",
        "## §2 id → catalog entry index (generated — do not edit)",
        "",
        "Derived from every registered entry's `group` tags by",
        "`scripts/gen_coverage_map.py`; `tests/test_plans.py` fails if",
        "this block is stale or any SURVEY §2 id loses coverage.",
        "Ids marked *pytest* are side-effecting (sinks, pipeline",
        "lifecycle) and are gated by the named test instead of a",
        "catalog entry.",
        "",
        "| §2 id | gated by |",
        "|---|---|",
    ]
    for i in survey_ids(survey_path):
        entries = idx.get(i, [])
        gates = ", ".join(f"`{n}`" for n in entries)
        if i in TEST_GATED:
            t = f"*pytest* `{TEST_GATED[i]}`"
            gates = f"{gates}, {t}" if gates else t
        lines.append(f"| {i} | {gates or '**UNCOVERED**'} |")
    lines += ["", END_MARK]
    return "\n".join(lines)


def write_index(repo_root: str) -> str:
    """Rewrite the generated block inside docs/COVERAGE.md (appended
    at the end on first run). Returns the rendered block."""
    survey = os.path.join(repo_root, "SURVEY.md")
    coverage = os.path.join(repo_root, "docs", "COVERAGE.md")
    block = render_index(survey)
    with open(coverage, encoding="utf-8") as f:
        doc = f.read()
    if BEGIN_MARK in doc:
        pre = doc[: doc.index(BEGIN_MARK)]
        post = doc[doc.index(END_MARK) + len(END_MARK):]
        doc = pre + block + post
    else:
        doc = doc.rstrip() + "\n\n" + block + "\n"
    with open(coverage, "w", encoding="utf-8") as f:
        f.write(doc)
    return block
