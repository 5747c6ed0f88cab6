"""Parquet source catalog for the driver testdata.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}``.

Scale notes: parquet scans here are the 100 TB path. Every query in
``plans.catalog`` projects explicit columns and filters early so
Catalyst pushes predicates + prunes columns into the scan
(verify with ``df.explain('formatted')`` → PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    # The driver imports __spark_entry__ with a plain session (no conf
    # pins). epoch_us()'s NTZ->timestamp cast is value-preserving only
    # under a UTC session zone, so pin it here — the one chokepoint every
    # catalog query loads through — rather than trusting the host tz.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _events_ts_is_nanos(path: str) -> bool:
    """Footer sniff: does this events layout carry TIMESTAMP(NANOS)?
    (round-1 testdata did; later rounds write microseconds). Checked
    via pyarrow so the nanosAsLong conf is only ever touched for
    layouts that need it."""
    import glob

    import pyarrow.parquet as pq

    f = path
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            return False
        f = parts[0]
    try:
        schema = pq.ParquetFile(f).schema
    except Exception:
        return False
    for i in range(len(schema)):
        col = schema.column(i)
        if col.name == "ts":
            # the PARQUET schema, not the arrow view: Spark-written
            # INT96 timestamps surface as timestamp[ns] in the arrow
            # schema too, but Spark reads them natively — only the
            # INT64 Timestamp(nanos) logical type needs nanosAsLong
            return (
                col.physical_type == "INT64"
                and "nanos" in str(col.logical_type).lower()
            )
    return False


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """events.parquet MAY carry TIMESTAMP(NANOS), which Spark's
    vectorized parquet reader rejects. For such layouts (sniffed from
    the footer), read nanos as long and convert to a microsecond
    TimestampType column — same truncation DuckDB applies when a
    client fetches its ns timestamps, so oracles agree.

    The nanosAsLong conf is session-wide and deliberately NOT restored
    after the read: the returned DataFrame is lazy, and its bigint-ts
    scan plan needs the conf in effect whenever it later executes.
    The footer sniff confines that session-level change to sessions
    that actually load a nanos layout (none since round 1)."""
    from pyspark.sql import functions as F

    if not _events_ts_is_nanos(path):
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") != "bigint":
        return df  # belt and braces: only convert what nanosAsLong made
    # integer div — ns magnitudes (~1.7e18) overflow double precision
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
