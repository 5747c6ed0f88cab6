#!/usr/bin/env python
"""Streaming-LSH index growth probe: per-batch apply cost as the
persisted band index grows.

Feeds K successive 5k-doc batches (sf0.1 documents, doc_id-offset per
batch so replicas form cross-batch near-dup cliques — adversarial for
the index join) through StreamingLshDedup.apply_batch and times each.
The question at 100 TB: does batch N's cost grow with the INDEX (bad:
per-batch rescan) or with the batch + its true matches (good)? The
index lives in parquet; the bucket join reads it per batch, so cost
has a linear scan component locally — the documented mitigation is a
(band, bkey)-bucketed layout so the join prunes to matching buckets.
This probe quantifies the local slope. Results in docs/SCALE.md.

Usage: python scripts/stream_index_probe.py [K]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nba_spurs_etl_spark.session import get_spark  # noqa: E402
from nba_spurs_etl_spark.streaming.dedup_stream import (  # noqa: E402
    StreamingLshDedup,
)

SRC = "/root/testdata/sf0.1"


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("stream-index-probe")
    base = spark.read.parquet(f"{SRC}/documents.parquet").select(
        "doc_id", "text"
    ).localCheckpoint(eager=True)
    n = base.count()
    work = tempfile.mkdtemp(prefix="lsh_index_probe_")
    try:
        dedup = StreamingLshDedup(spark, work)
        for bid in range(k):
            batch = base.withColumn(
                "doc_id", F.col("doc_id") + bid * 10_000_000
            )
            t0 = time.perf_counter()
            dedup.apply_batch(batch, bid)
            dt = time.perf_counter() - t0
            idx_rows = dedup.index().count()
            pair_rows = (
                spark.read.parquet(
                    os.path.join(dedup.pairs_dir, f"bid={bid}")
                ).count()
            )
            print(
                f"batch {bid}: docs={n} t={dt:.2f}s "
                f"index_rows={idx_rows} new_pairs={pair_rows}"
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
