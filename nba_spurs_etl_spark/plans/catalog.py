"""Facade aggregating every registered catalog query.

Importing this module imports all query-definition modules (each
registers into ``plans.registry``); ``__spark_entry__`` re-exports
``queries()`` / ``oracles()`` from here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Unconditional imports: a broken module must fail loudly here, not
# silently shrink the driver-visible query surface.
from . import analytics_ext  # noqa: F401
from . import gold_fixture  # noqa: F401
from . import olap_ext  # noqa: F401
from . import pipeline_ext  # noqa: F401
from . import stream_queries  # noqa: F401
from . import tpch_classic  # noqa: F401
from . import tpch_core  # noqa: F401
from . import tpch_more  # noqa: F401

from .registry import oracles, queries, registry  # noqa: E402

__all__ = ["entry_query", "oracles", "queries", "registry"]

ENTRY_QUERY = "summary_rank"


def entry_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship query (driver smoke check)."""
    return queries()[ENTRY_QUERY](spark, sf_dir)
