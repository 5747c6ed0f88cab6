"""Streaming novelty scoring against a GROWING gram index.

The ingestion-time twin of ``operators.curation.ngram_novelty``: a
document FEED is scored continuously, each micro-batch against every
gram seen before it (a seeded reference corpus plus all earlier
batches), then its own grams join the index — the "dedup-aware
ingestion" shape that lets a pipeline route near-verbatim arrivals to
a low-priority mixture bucket the moment they land, instead of
re-scoring the whole corpus nightly.

per micro-batch (``foreachBatch``):
1. explode the batch's distinct word n-grams (md5-folded to longs);
2. score: per-doc known_grams = grams present in the index-so-far
   (this batch's OWN bid excluded, so a foreachBatch retry that died
   after its index write cannot count a doc's grams as already seen);
3. append the batch's distinct grams to the index.

Both sinks are ``bid=<batch_id>`` partition directories with
per-directory overwrite — the idempotent-retry layout shared with
``dedup_stream.StreamingLshDedup``. Semantics depend on batch
boundaries BY DESIGN (novelty is relative to what arrived earlier):
the multi-batch contract is pinned by an explicit-batches pytest
against the batch operator applied cumulatively; the catalog entry
streams the corpus as ONE batch over a seeded static reference, which
makes the drained result exactly equal to the batch
``corpus_ngram_novelty`` (full shared oracle).

Scale: the index is a parquet table of distinct (gh, bid) longs — at
100 TB lay it out bucketed by gh so the per-batch membership join
co-locates; per-batch cost is O(|batch grams|) plus the index probe,
never a corpus rescan (same growth shape the LSH stream probe measured
flat — docs/SCALE.md).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.curation import hashed_grams


class StreamingNovelty:
    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
    ):
        self.spark = spark
        self.index_dir = os.path.join(work_dir, "gram_index")
        self.scores_dir = os.path.join(work_dir, "scores")
        self.id_col = id_col
        self.text_col = text_col
        self.n = n

    # -- sinks ------------------------------------------------------------

    def _has_data(self, path: str) -> bool:
        return os.path.isdir(path) and any(
            e.startswith("bid=") for e in os.listdir(path)
        )

    def scores(self) -> DataFrame:
        if not self._has_data(self.scores_dir):
            # a not-yet-fed sink reads as empty (accessor contract
            # shared with StreamingLshDedup.pairs/index)
            return self.spark.createDataFrame(
                [], "doc long, n_grams bigint, known_grams bigint, novelty double"
            )
        return self.spark.read.parquet(self.scores_dir).select(
            "doc", "n_grams", "known_grams", "novelty"
        )

    def _batch_grams(self, batch_df: DataFrame) -> DataFrame:
        return hashed_grams(
            batch_df,
            F.col(self.text_col),
            self.n,
            F.col(self.id_col).alias("doc"),
        )

    def seed(self, reference: DataFrame, text_col: str | None = None) -> None:
        """Load a static reference corpus as the index's first entry
        (bid=-1): every later batch scores against it plus whatever
        streamed before that batch."""
        grams = hashed_grams(
            reference, F.col(text_col or self.text_col), self.n
        ).distinct()
        grams.write.mode("overwrite").parquet(
            os.path.join(self.index_dir, "bid=-1")
        )

    # -- the micro-batch apply --------------------------------------------

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        grams = self._batch_grams(batch_df).localCheckpoint(eager=True)
        if self._has_data(self.index_dir):
            idx = (
                self.spark.read.parquet(self.index_dir)
                .filter(F.col("bid") != batch_id)
                .select("gh")
                .distinct()
                .withColumn("known", F.lit(1))
            )
        else:
            idx = self.spark.createDataFrame([], "gh long, known int")
        counts = (
            grams.join(idx, "gh", "left")
            .groupBy("doc")
            .agg(
                F.count(F.lit(1)).alias("n_grams"),
                F.count("known").alias("known_grams"),
            )
        )
        scores = (
            batch_df.select(F.col(self.id_col).alias("doc"))
            .join(counts, "doc", "left")
            .select(
                "doc",
                F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
                F.coalesce("known_grams", F.lit(0)).alias("known_grams"),
                F.when(
                    F.coalesce("n_grams", F.lit(0)) > 0,
                    F.lit(1.0)
                    - F.col("known_grams").cast("double")
                    / F.col("n_grams"),
                ).alias("novelty"),
            )
        )
        scores.write.mode("overwrite").parquet(
            os.path.join(self.scores_dir, f"bid={batch_id}")
        )
        grams.select("gh").distinct().write.mode("overwrite").parquet(
            os.path.join(self.index_dir, f"bid={batch_id}")
        )

    def attach(self, docs_stream: DataFrame, checkpoint: str):
        """Start the availableNow drain; caller awaits termination."""
        return (
            docs_stream.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
