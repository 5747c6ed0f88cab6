"""Driver-emulating oracle parity tests.

For every catalog query that declares a DuckDB oracle, run both sides at
sf0.01 and compare row count + column names + the order-insensitive
multiset of rows. Floats are compared bit-exactly first (the engine's
determinism contract: exact decimal arithmetic surfaced as double);
failures report the worst numeric deviation to distinguish real bugs
from ulp noise.
"""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import pytest

from nba_spurs_etl_spark.plans.catalog import registry

from .conftest import SF_CORRECT, duck_with_views

QUERIES_WITH_ORACLE = [q for q in registry().values() if q.oracle is not None]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    return v


def rows_to_multiset(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("q", QUERIES_WITH_ORACLE, ids=lambda q: q.name)
def test_oracle_parity(spark, q):
    sdf = q.builder(spark, SF_CORRECT)
    spark_names = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duck_with_views(SF_CORRECT)
    try:
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
            f"{q.name}: value mismatch\n  spark-only: {only_s}\n  duck-only: {only_d}"
        )
