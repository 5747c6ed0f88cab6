"""All-tables-empty differential parity.

Each edge-fuzz campaign (tests/test_fuzz_differential.py) truncates
ONE salt-rotated table per sweep; rounds r06-r07 walked all 10 tables
that way. This module pins the remaining combination — EVERY table
empty at once — and pins it DETERMINISTICALLY (no salt), so the class
can never rotate out of CI. Empty inputs are routine at scale: an
empty date partition, a first-run landing zone, a filter that matches
nothing upstream. The engine contract is empty-in-empty-out (or the
oracle-matched scalar row for global aggregates), never an analysis
error or a driver crash.

Budget scheme mirrors the fuzzer: the entries with a recorded
empty-input find run ALWAYS (the pinned list below); the rest of the
oracled batch pool rotates with SPARK_GRAFT_FUZZ_SALT at
SPARK_GRAFT_FUZZ_N per run, and a full-pool sweep (N>=999) covers
everything including the stream twins.
"""

from __future__ import annotations

import os
import zlib

import duckdb
import pytest

from nba_spurs_etl_spark.plans.catalog import registry
from nba_spurs_etl_spark.sources.catalog import TESTDATA_TABLES

from .test_fuzz_differential import (
    _EXCLUDE_PREFIXES,
    _STREAM_TWINS,
    N_ENTRIES,
    SALT,
    _diff_one,
    _materialize,
)

# the directory name embeds a fingerprint of the table list AND the
# source parquet mtimes, so a future round that adds a table, renames
# one, or regenerates testdata with a changed schema can never diff
# against a stale cached copy — the old dir is simply never looked at
# again (ADVICE r07 item 1)
from .conftest import SF_CORRECT  # noqa: E402


def _empty_dir_name() -> str:
    parts = []
    for t in sorted(TESTDATA_TABLES):
        path = f"{SF_CORRECT}/{t}.parquet"
        try:
            parts.append(f"{t}:{os.path.getmtime(path)}")
        except OSError:
            parts.append(f"{t}:?")
    return "/tmp/spark_graft_empty_all_%08x" % zlib.crc32(
        ",".join(parts).encode()
    )


EMPTY_DIR = _empty_dir_name()

# Entries with a recorded empty-input divergence or crash (fix-site
# comments cite the campaign): these run on every CI invocation.
_PINNED = [
    "lineitem_median_twophase",  # r07a: k=0 UnboundLocalError
    "rollup_orders",  # r07k: ANSI grand-total row vs Spark's none
    "cube_orders",  # r07k: same class
    "grouping_sets_orders",  # r07k: same class
    "schema_evolution_read",  # r07k: SUM(flag) NULL vs COUNT FILTER 0
    "orders_month_spine_recursive",  # r07k: raise vs NULL anchor row
    "stream_scd2_apply",  # r07b: empty changelog (None+None)//2
    "similarity_topk_ivf",  # r06: empty codebook sample
    "similarity_topk_pq",  # r06: same class
    "text_bpe_merges",  # r06: NULL-winner rounds on empty corpus
]


def _build_empty_tables(con: duckdb.DuckDBPyConnection) -> None:
    # the _materialize fixture has already created each table from the
    # pristine sf0.01 parquet; emptying preserves the exact schema
    for t in TESTDATA_TABLES:
        con.sql(f"DELETE FROM {t}")


@pytest.fixture(scope="session")
def empty_dir() -> str:
    if not os.path.isdir(EMPTY_DIR):
        _materialize(EMPTY_DIR, _build_empty_tables)
    return EMPTY_DIR


def _batch_pool():
    return [
        q
        for q in registry().values()
        if q.oracle is not None and not q.name.startswith(_EXCLUDE_PREFIXES)
    ]


def _pinned():
    byname = registry()
    return [byname[n] for n in _PINNED if n in byname]


def _rotating():
    pinned = set(_PINNED)
    cands = [q for q in _batch_pool() if q.name not in pinned]
    cands.sort(
        key=lambda q: (zlib.crc32(f"{SALT}:empty-all:{q.name}".encode()), q.name)
    )
    return cands[:N_ENTRIES]


@pytest.mark.parametrize("q", _pinned(), ids=lambda q: q.name)
def test_empty_all_pinned(spark, empty_dir, q):
    _diff_one(spark, empty_dir, q, "all-empty")


@pytest.mark.parametrize("q", _rotating(), ids=lambda q: q.name)
def test_empty_all_rotating(spark, empty_dir, q):
    _diff_one(spark, empty_dir, q, "all-empty")


@pytest.mark.parametrize(
    "q",
    [q for q in _STREAM_TWINS if q.name not in _PINNED],
    ids=lambda q: q.name,
)
def test_empty_all_stream_drain(spark, empty_dir, q):
    if N_ENTRIES < 999:
        pytest.skip("all-empty stream drains run in full-pool sweeps only")
    try:
        _diff_one(spark, empty_dir, q, "all-empty-stream")
    except ValueError as e:
        if "comparison region is undefined" in str(e):
            # join twins raise loudly when a whole event class is
            # absent — documented contract (see test_fuzz_stream_drain)
            pytest.skip(str(e))
        raise
