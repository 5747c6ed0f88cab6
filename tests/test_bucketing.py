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


def test_zorder_layout_locality(spark, tmp_path_factory):
    """A z-ordered layout yields files whose min/max rectangles are
    tight in BOTH dimensions; a single-column sort leaves the other
    column's span near-global per file. Tight per-file spans are what
    parquet min/max pruning skips on, so mean span IS the layout's
    skipping power."""
    from nba_spurs_etl_spark.operators.layout import zorder_write

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("day_no"),
    )
    n_files = 16
    zdir = str(tmp_path_factory.mktemp("layout") / "zorder")
    ddir = str(tmp_path_factory.mktemp("layout") / "bydate")
    zorder_write(orders, "o_custkey", "day_no", zdir, n_files)
    (
        orders.repartitionByRange(n_files, "day_no")
        .sortWithinPartitions("day_no")
        .write.mode("overwrite")
        .parquet(ddir)
    )

    def mean_span(path: str, col: str) -> float:
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg((F.max(col) - F.min(col)).alias("span"))
        )
        rows = per_file.collect()
        return sum(r.span for r in rows) / len(rows)

    glob_cust = orders.agg(
        F.max("o_custkey") - F.min("o_custkey")
    ).first()[0]
    z_cust, d_cust = mean_span(zdir, "o_custkey"), mean_span(ddir, "o_custkey")
    # date-sorted files see ~the whole custkey range; z-ordered files
    # must cut it by at least 2x (typically ~4x at 16 files)
    assert d_cust > 0.8 * glob_cust, (d_cust, glob_cust)
    assert z_cust < 0.5 * glob_cust, (z_cust, glob_cust)
    # and the z layout still clusters days (span < global)
    glob_day = orders.agg(F.max("day_no") - F.min("day_no")).first()[0]
    assert mean_span(zdir, "day_no") < 0.7 * glob_day
