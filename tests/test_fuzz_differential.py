"""Seeded differential fuzzing over the DuckDB-oracle suite.

The round-4 review sweep kept finding the same CLASS of bug by hand:
engine-semantics divergence on degenerate data — NULL contracts
(ANSI DIVIDE_BY_ZERO vs DuckDB NULL, NaN ranking), empty groups,
duplicate keys, missing dimension rows. This harness finds that class
mechanically: it builds a deterministically perturbed copy of the
sf0.01 tables and re-runs a salt-rotated subset of the oracled catalog
entries through BOTH engines on the perturbed data, comparing with the
same multiset rule as tests/test_parity.py.

Perturbations (all keyed by DuckDB ``hash()`` over the row's primary
key — no RNG state, same parquet bytes for both engines every run):

- **NULL injection**: every non-PK column goes NULL on ~1/37 of rows
  (per-column phase so different columns hit different rows).
- **Duplicate keys**: ~1/41 of rows re-appended verbatim (duplicate
  PKs downstream of every join/dedup/groupBy).
- **Empty/orphan slices**: one nation row deleted (orphaning its
  customers/suppliers through every join), and one event_type deleted
  wholesale (empty-group behavior for funnels/sessionizers).

The entry subset rotates with ``SPARK_GRAFT_FUZZ_SALT`` (default
changes per round in this file) so successive rounds sweep different
catalog regions; any entry that diverges gets pinned by a regular
parity/oracle fix, not by editing the fuzz harness.

Excluded by design: ``gold_``/``silver_`` (synthesized NBA fixtures —
they never read these tables), ``stream_`` (rate/file streams +
checkpoints; covered by their own exactly-once tests), and rows-only
entries (no oracle to diff against).
"""

from __future__ import annotations

import os
import zlib

import duckdb
import pytest

from nba_spurs_etl_spark.plans.catalog import registry
from nba_spurs_etl_spark.sources.catalog import TESTDATA_TABLES

from .conftest import SF_CORRECT
from .test_parity import rows_to_multiset

SALT = os.environ.get("SPARK_GRAFT_FUZZ_SALT", "r05")
# default 24 keeps one rotation inside CI time; SPARK_GRAFT_FUZZ_N=999
# sweeps the whole candidate pool (~10 min) for a full audit
N_ENTRIES = int(os.environ.get("SPARK_GRAFT_FUZZ_N", "24"))
FUZZ_DIR = f"/tmp/spark_graft_fuzz_{SALT}"

# first column of each table is its (semantically non-nullable) PK;
# l_linenumber completes lineitem's composite PK
_PK = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

_EXCLUDE_PREFIXES = ("gold_", "silver_", "stream_", "quality_")


def _pk_expr(table: str) -> str:
    return " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in _PK[table])


def _build_fuzz_tables(dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            src = f"{SF_CORRECT}/{t}.parquet"
            con.sql(f"CREATE TABLE {t} AS SELECT * FROM read_parquet('{src}')")
            cols = [r[0] for r in con.sql(f"DESCRIBE {t}").fetchall()]
            key = _pk_expr(t)
            for c in cols:
                if c in _PK[t]:
                    continue
                con.sql(
                    f"UPDATE {t} SET {c} = NULL "
                    f"WHERE hash({key} || ':{c}:{SALT}') % 37 = 0"
                )
            con.sql(
                f"INSERT INTO {t} SELECT * FROM {t} "
                f"WHERE hash({key} || ':dup:{SALT}') % 41 = 0"
            )
        # orphan slice: one nation vanishes; its customers/suppliers
        # dangle through every downstream join
        con.sql("DELETE FROM nation WHERE n_nationkey = 7")
        # empty-group slice: one event_type vanishes wholesale
        et = con.sql(
            "SELECT event_type FROM events WHERE event_type IS NOT NULL "
            f"ORDER BY hash(event_type || ':{SALT}'), event_type LIMIT 1"
        ).fetchone()[0]
        con.sql(f"DELETE FROM events WHERE event_type = '{et}'")
        for t in TESTDATA_TABLES:
            con.sql(
                f"COPY {t} TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
    finally:
        con.close()


@pytest.fixture(scope="session")
def fuzz_dir() -> str:
    marker = os.path.join(FUZZ_DIR, "_built")
    if not os.path.exists(marker):
        _build_fuzz_tables(FUZZ_DIR)
        with open(marker, "w") as f:
            f.write("ok")
    return FUZZ_DIR


def _subset():
    cands = [
        q
        for q in registry().values()
        if q.oracle is not None and not q.name.startswith(_EXCLUDE_PREFIXES)
    ]
    cands.sort(key=lambda q: (zlib.crc32(f"{SALT}:{q.name}".encode()), q.name))
    return cands[:N_ENTRIES]


@pytest.mark.parametrize("q", _subset(), ids=lambda q: q.name)
def test_fuzz_differential(spark, fuzz_dir, q):
    sdf = q.builder(spark, fuzz_dir)
    spark_names = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            con.sql(
                f"CREATE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{fuzz_dir}/{t}.parquet')"
            )
        rel = con.sql(q.oracle)
        duck_names = list(rel.columns)
        duck_rows = rel.fetchall()
    finally:
        con.close()

    assert sorted(spark_names) == sorted(duck_names), (
        f"{q.name}: column mismatch spark={spark_names} duck={duck_names}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{q.name}: rowcount spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_ms = rows_to_multiset(spark_names, spark_rows)
    d_ms = rows_to_multiset(duck_names, duck_rows)
    if s_ms != d_ms:
        only_s = list((s_ms - d_ms).items())[:5]
        only_d = list((d_ms - s_ms).items())[:5]
        pytest.fail(
            f"{q.name}: value mismatch on fuzzed data\n"
            f"  spark-only: {only_s}\n  duck-only: {only_d}"
        )
