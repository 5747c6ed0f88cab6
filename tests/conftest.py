from __future__ import annotations

import duckdb
import pytest

from nba_spurs_etl_spark.session import get_spark
from nba_spurs_etl_spark.sources.catalog import TESTDATA_TABLES

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    yield get_spark("nba-spurs-etl-spark-tests", shuffle_partitions=8)


def duck_with_views(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh DuckDB connection with the testdata tables as views —
    mirrors the driver's pre-registered-views environment."""
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con
