"""Bucketed (co-located) joins: the zero-shuffle path for repeated
fact-to-fact joins.

At 100 TB the orders⋈customer / lineitem⋈orders joins dominate shuffle
volume. Writing both sides bucketed by the join key (same bucket count)
lets Spark's scan report the hash partitioning, so the sort-merge join
runs with NO Exchange on either side — the physical property this test
pins down, plus result equality against the plain shuffled join.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from nba_spurs_etl_spark.sources.catalog import load_table

from .conftest import SF_SMOKE


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", str(base / "orders"))
        .saveAsTable("bucketed_orders")
    )
    (
        cust.write.mode("overwrite")
        .bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", str(base / "customer"))
        .saveAsTable("bucketed_customer")
    )
    yield "bucketed_orders", "bucketed_customer"
    spark.sql("DROP TABLE IF EXISTS bucketed_orders")
    spark.sql("DROP TABLE IF EXISTS bucketed_customer")


def _joined(spark, t_orders, t_cust):
    return (
        spark.table(t_orders)
        .join(
            spark.table(t_cust),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


def test_bucketed_join_has_no_exchange(spark, bucketed):
    t_orders, t_cust = bucketed
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(
            spark.table(t_orders).join(
                spark.table(t_cust),
                F.col("o_custkey") == F.col("c_custkey"),
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange (" not in plan, plan  # both sides pre-partitioned
    assert "SelectedBucketsCount" in plan, plan


def test_bucketed_join_matches_shuffled_join(spark, bucketed):
    t_orders, t_cust = bucketed
    got = {tuple(r) for r in _joined(spark, t_orders, t_cust).collect()}
    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer")
    want = {
        tuple(r)
        for r in orders.join(
            cust, F.col("o_custkey") == F.col("c_custkey")
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .collect()
    }
    assert got == want
