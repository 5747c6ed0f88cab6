"""Silver-load normalization semantics (reference S10/S11).

The reference lowercases every JSON key, renames via COLUMN_MAPPINGS,
and derives the table's column set from the FIRST sanitized record —
extra keys in later records are silently dropped, missing keys become
NULL (``/root/reference/dags/spurs_historic_games.py:363-409``).

Spark's JSON reader unions keys across records and sorts field names,
so both behaviors are re-expressed explicitly:

- ``normalize_columns``: lowercase + rename + order-preserving dedup
  (first occurrence wins — duplicate post-fold names collide exactly
  like the reference's dict comprehension, where the LAST write wins;
  we keep the FIRST and document the divergence: deterministic under
  Spark's sorted column order).
- ``project_to_schema``: restrict/extend to a declared column list
  (missing -> NULL), the "first record wins" contract made explicit —
  at scale you pin the schema, you don't sniff row one of a terabyte
  of JSON.

Note on the reference's COLUMN_MAPPINGS: the 'SEASON' entry is dead
code — lookups happen on the lowercased key (SURVEY §1.2) — so only
'season_year' -> 'season' is live here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COLUMN_MAPPINGS = {"season_year": "season"}


def normalized_name(col: str) -> str:
    low = col.lower()
    return COLUMN_MAPPINGS.get(low, low)


def normalize_columns(df: DataFrame) -> DataFrame:
    """Lowercase + rename every column; drop later duplicates.

    Selection is positional (via a temporary unique rename): with
    case-variant duplicate keys (PLAYER_ID vs Player_Id) a by-name
    select is ambiguous under Spark's case-insensitive resolution —
    exactly the collision the reference's key-fold produces.
    """
    tmp = df.toDF(*[f"_pos_{i}" for i in range(len(df.columns))])
    seen: set[str] = set()
    cols = []
    for i, c in enumerate(df.columns):
        name = normalized_name(c)
        if name in seen:
            continue
        seen.add(name)
        cols.append(F.col(f"_pos_{i}").alias(name))
    return tmp.select(*cols)


def project_to_schema(df: DataFrame, columns: list[str]) -> DataFrame:
    """Select exactly ``columns``: extras dropped, missing NULL strings
    (the reference's record.get(col) materialization, dags:406-409)."""
    have = set(df.columns)
    return df.select(
        *[
            F.col(c) if c in have else F.lit(None).cast("string").alias(c)
            for c in columns
        ]
    )
