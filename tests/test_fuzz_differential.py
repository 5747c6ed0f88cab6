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

Round-6 adds a second fuzzed copy (``test_fuzz_edge``) for the two
classes the r05 campaign left untested:

- **Empty table**: one salt-rotated table is truncated ENTIRELY —
  empty scans, empty joins sides, empty aggregation inputs, and any
  driver-side ``collect()[0]`` on a vanished input.
- **Extreme values**: ~1/53 of rows get type-keyed edge values in
  non-PK columns — 0 / -1 / ±10^15 for numerics (float-precision
  edges, sign flips inside SUM/AVG/stddev), '' / quote+unicode /
  4 KB strings for VARCHAR (tokenizer, LIKE, split paths), epoch and
  far-future-but-ns-safe dates/timestamps (window/sessionize bounds).

The entry subset rotates with ``SPARK_GRAFT_FUZZ_SALT`` (default
changes per round in this file) so successive rounds sweep different
catalog regions; any entry that diverges gets pinned by a regular
parity/oracle fix, not by editing the fuzz harness.

Excluded from the salt-rotated BATCH subsets: ``gold_``/``silver_``
(synthesized NBA fixtures — they never read these tables) and
rows-only entries (no oracle to diff against). ``stream_`` twins run
through their own dedicated drain tests below (round 7): one drain
per oracled stream twin per campaign on the perturbed copy, plus the
edge copy in full-pool sweeps.
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

SALT = os.environ.get("SPARK_GRAFT_FUZZ_SALT", "r07")
# default 24 keeps one rotation inside CI time; SPARK_GRAFT_FUZZ_N=999
# sweeps the whole candidate pool (~10 min) for a full audit
N_ENTRIES = int(os.environ.get("SPARK_GRAFT_FUZZ_N", "24"))
FUZZ_DIR = f"/tmp/spark_graft_fuzz_{SALT}"
EDGE_DIR = f"/tmp/spark_graft_fuzz_edge_{SALT}"

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


def _build_fuzz_tables(con) -> None:
    for t in TESTDATA_TABLES:
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
    # bound parameter: a sampled value containing a quote must not be
    # able to break (or rewrite) the statement
    con.execute("DELETE FROM events WHERE event_type = ?", [et])


# type-keyed extreme values: edges of each type's plausible domain, NOT
# engine-limit values — BIGINT-overflowing magnitudes or NaN/inf would
# diverge on documented engine-contract grounds (ANSI overflow vs
# HUGEINT), drowning real finds in contract noise. The DOUBLE extreme
# is a dyadic rational (exact in binary AND in decimal(·,2)) sized so
# even TRIPLE products of extremes (q1's price*(1-disc)*(1+tax))
# summed over the table stay below both DuckDB's decimal-mul width cap
# and the 2^53-unscaled decimal->double exactness envelope documented
# at functions/scalar.dbig — above either, the engines legitimately
# error/1-ulp-diverge on documented contract grounds, not bugs
# (measured: 12345678.25 overflowed DuckDB's DECIMAL(18) mul on q3).
# First find of this campaign: 1024.5 overflows the TPC-H-mirroring
# DECIMAL(4,2) discount casts (ANSI error on both engines) — widened
# to DECIMAL(12,2) repo-wide.
_EXTREMES: dict[str, list] = {
    # INT32 min probes ANSI negation/abs edges; max probes widening
    "INTEGER": [0, -1, 2147483647, -2147483648],
    "BIGINT": [0, -1, 2147483647, -2147483648],
    "DOUBLE": [0.0, -1.0, 1024.5],
    "VARCHAR": ["", "O'Brien \"Q\" é", "x" * 4096],
    # epoch start, far future (ns-safe), and a .999999 microsecond
    # boundary (bucket/window truncation edges)
    "TIMESTAMP": [
        "1970-01-01 00:00:00",
        "2199-12-31 23:59:59",
        "1999-12-31 23:59:59.999999",
    ],
}


def _build_edge_tables(con) -> None:
    # one salt-rotated table truncated ENTIRELY (empty-input class);
    # index-by-hash spreads successive salts across tables (the crc-min
    # form picked events for both r06 and r06b)
    tables = sorted(TESTDATA_TABLES)
    empty_t = tables[zlib.crc32(f"{SALT}:empty".encode()) % len(tables)]
    for t in TESTDATA_TABLES:
        if t == empty_t:
            con.sql(f"DELETE FROM {t}")
            continue
        key = _pk_expr(t)
        for name, typ in [
            (r[0], r[1]) for r in con.sql(f"DESCRIBE {t}").fetchall()
        ]:
            if name in _PK[t]:
                continue
            if typ == "FLOAT[]":
                # zero vector, dimensions preserved: zero-norm edges in
                # every cosine/normalization path without breaking the
                # fixed-dim contract LSH/IVF legitimately enforce
                con.sql(
                    f"UPDATE {t} SET {name} = list_transform({name}, "
                    f"x -> CAST(0.0 AS FLOAT)) "
                    f"WHERE hash({key} || ':zv:{SALT}') % 53 = 1"
                )
                continue
            for i, v in enumerate(_EXTREMES.get(typ, [])):
                con.execute(
                    f"UPDATE {t} SET {name} = ? "
                    f"WHERE hash({key} || ':x{i}:{name}:{SALT}') % 53 = 1",
                    [v],
                )


def _materialize(dst: str, builder) -> None:
    """Build fuzzed parquet copies atomically: write into a temp dir,
    then rename into place so concurrent pytest workers can never see
    (or double-build into) a half-written directory."""
    tmp = f"{dst}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            src = f"{SF_CORRECT}/{t}.parquet"
            con.sql(
                f"CREATE TABLE {t} AS SELECT * FROM read_parquet('{src}')"
            )
        builder(con)
        for t in TESTDATA_TABLES:
            con.sql(f"COPY {t} TO '{tmp}/{t}.parquet' (FORMAT PARQUET)")
    finally:
        con.close()
    try:
        os.rename(tmp, dst)
    except OSError:
        # another worker won the race; its directory is complete
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


@pytest.fixture(scope="session")
def fuzz_dir() -> str:
    if not os.path.isdir(FUZZ_DIR):
        _materialize(FUZZ_DIR, _build_fuzz_tables)
    return FUZZ_DIR


@pytest.fixture(scope="session")
def fuzz_edge_dir() -> str:
    if not os.path.isdir(EDGE_DIR):
        _materialize(EDGE_DIR, _build_edge_tables)
    return EDGE_DIR


def _subset(mode: str = ""):
    cands = [
        q
        for q in registry().values()
        if q.oracle is not None and not q.name.startswith(_EXCLUDE_PREFIXES)
    ]
    cands.sort(
        key=lambda q: (zlib.crc32(f"{SALT}:{mode}:{q.name}".encode()), q.name)
    )
    return cands[:N_ENTRIES]


def _diff_one(spark, data_dir, q, what: str) -> None:
    sdf = q.builder(spark, data_dir)
    spark_names = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            con.sql(
                f"CREATE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{data_dir}/{t}.parquet')"
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
            f"{q.name}: value mismatch on {what} data\n"
            f"  spark-only: {only_s}\n  duck-only: {only_d}"
        )


@pytest.mark.parametrize("q", _subset(), ids=lambda q: q.name)
def test_fuzz_differential(spark, fuzz_dir, q):
    _diff_one(spark, fuzz_dir, q, "fuzzed")


@pytest.mark.parametrize("q", _subset("edge"), ids=lambda q: q.name)
def test_fuzz_edge(spark, fuzz_edge_dir, q):
    _diff_one(spark, fuzz_edge_dir, q, "edge-fuzzed")


# Streaming twins (VERDICT r06 item 4): the batch subsets above never
# execute a stream's OWN prepared projection/state logic on perturbed
# data — the r06 ADVICE find (streaming twins missing the batch twins'
# NULL filters) lived exactly in that blind spot. Every stream_ entry
# is an ordinary catalog callable that drains a bounded file-source
# stream to a table, so the same _diff_one works: drain each oracled
# stream twin once per campaign on the NULL/dup/orphan copy. The
# edge copy (empty table + extreme values) runs in full-pool mode
# (SPARK_GRAFT_FUZZ_N>=999) — 15 extra drains are sweep-budget, not
# per-CI-run budget.
_STREAM_TWINS = sorted(
    (
        q
        for q in registry().values()
        if q.name.startswith("stream_") and q.oracle is not None
    ),
    key=lambda q: q.name,
)


@pytest.mark.parametrize("q", _STREAM_TWINS, ids=lambda q: q.name)
def test_fuzz_stream_drain(spark, fuzz_dir, q):
    try:
        _diff_one(spark, fuzz_dir, q, "fuzzed-stream")
    except ValueError as e:
        if "comparison region is undefined" in str(e):
            # the empty-event-type slice can delete a whole event
            # class (r07d deleted every 'purchase'); the join twins'
            # contract is to raise loudly there — in the stream an
            # absent side's watermark never advances, so no unmatched
            # row would ever flush and a silent empty-vs-oracle
            # mismatch would be worse than the raise
            pytest.skip(str(e))
        raise


# Watermark late-drop contract (r07 sweep find): the edge copy plants
# epoch-1970 and year-2199 timestamps in the SAME table, so the first
# micro-batch containing a far-future row advances the watermark ~230
# years and every later-arriving old row is dropped as late — CORRECT
# streaming semantics (the documented admission contract of
# withWatermark) that no final-cut SQL oracle can express, because the
# drop set depends on ARRIVAL order, not values. For the four twins
# that emit row-grain output keyed by event time, the edge drain
# therefore asserts the strongest order-free contract instead of
# equality: (a) no spurious and no duplicate emissions — the drained
# multiset is a SUB-multiset of the batch result; (b) every missing
# row is genuinely late-ELIGIBLE, i.e. its event time sits more than
# the 10-min watermark delay below the table's max event time (a row
# inside the final delay window can never have been late in any
# arrival order). The aggregate twins keep strict equality — they
# passed: late rows land in already-closed windows only under
# disorder larger than their drain's file split, which the pinned
# intake order avoids.
_EDGE_LATE_TOLERANT = {
    "stream_dedup": ("us",),
    "stream_dedup_within_watermark": ("us",),
    "stream_stream_join": ("click_us", "purchase_us"),
    "stream_stream_left_join": ("click_us", "purchase_us"),
}
_WM_DELAY_US = 600_000_000


@pytest.mark.parametrize("q", _STREAM_TWINS, ids=lambda q: q.name)
def test_fuzz_stream_drain_edge(spark, fuzz_edge_dir, q):
    if N_ENTRIES < 999:
        pytest.skip("edge-dir stream drains run in full-pool sweeps only")
    tol_cols = _EDGE_LATE_TOLERANT.get(q.name)
    if tol_cols is None:
        _diff_one(spark, fuzz_edge_dir, q, "edge-fuzzed-stream")
        return
    try:
        sdf = q.builder(spark, fuzz_edge_dir)
        spark_names = sdf.columns
        spark_rows = [tuple(r) for r in sdf.collect()]
    except ValueError as e:
        if "comparison region is undefined" in str(e):
            # the empty-table slice removed one whole event class; the
            # twin's contract raise IS the documented behavior there
            pytest.skip(str(e))
        raise
    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            con.sql(
                f"CREATE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{fuzz_edge_dir}/{t}.parquet')"
            )
        rel = con.sql(q.oracle)
        duck_names = list(rel.columns)
        duck_rows = rel.fetchall()
        max_us = con.sql(
            "SELECT CAST(MAX(epoch_us(ts)) AS BIGINT) FROM events"
        ).fetchone()[0]
    finally:
        con.close()
    assert sorted(spark_names) == sorted(duck_names), (
        f"{q.name}: column mismatch spark={spark_names} duck={duck_names}"
    )
    s_ms = rows_to_multiset(spark_names, spark_rows)
    d_ms = rows_to_multiset(duck_names, duck_rows)
    spurious = s_ms - d_ms
    assert not spurious, (
        f"{q.name}: drained rows not in the batch result (first 5): "
        f"{list(spurious.items())[:5]}"
    )
    missing = d_ms - s_ms
    if not missing:
        return
    # an empty events table (empty-table slice) cannot have missing
    # rows — both sides are empty and max_us is NULL; reaching here
    # with no max is a real bug, not late data
    assert max_us is not None, f"{q.name}: missing rows but empty events"
    # column positions of the event-time columns in the SORTED order
    # rows_to_multiset uses
    sorted_names = sorted(spark_names)
    idx = [sorted_names.index(c) for c in tol_cols]
    cutoff = max_us - _WM_DELAY_US
    for row, cnt in missing.items():
        ets = [row[i] for i in idx if row[i] is not None]
        assert ets and min(ets) < cutoff, (
            f"{q.name}: dropped row is NOT late-eligible "
            f"(event times {ets} vs cutoff {cutoff}): {row}"
        )
