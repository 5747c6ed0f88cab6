"""Similarity search over embedding columns (array<float>).

Baseline: exact brute-force cosine top-k (broadcast the query set,
score distributed, per-query top-k via partitioned window — no global
sort). Scale path: sign-LSH bucketing (IVF-style candidate pruning) so
each query only scores its bucket.

Everything is built-in functions (zip_with/aggregate — JVM-side lambda
codegen, no Python in the hot path). The dot product is a sequential
left fold in double so DuckDB's list_reduce reproduces it bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine


def brute_force_topk(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query.

    queries is expected to be small (broadcast); the score space is
    |Q| x |C| rows, pruned to top-k per query by a window partitioned
    on the query id — scales with candidate partitioning, never a
    single-task sort.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = candidates.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id", "cand_id", cosine(F.col("qv"), F.col("cv")).alias("cos_sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "cos_sim", F.col("rnk").cast("int").alias("rnk"))
    )


def lsh_bucket(vec: Column, planes: int = 8) -> Column:
    """Sign-pattern bucket key from the first ``planes`` components.

    A deterministic stand-in for random-hyperplane LSH (components of a
    trained embedding are near-orthogonal directions already): bit i =
    sign(vec[i]). Cross-engine exact (no RNG), which keeps the oracle
    checkable; swap in hashed random planes for production skew control.
    """
    bits = [
        F.when(F.element_at(vec, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def lsh_topk(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    planes: int = 8,
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's bucket.

    The bucket equi-join replaces the cross join — at 1B vectors with
    256 buckets, each query scores ~1/256th of the corpus. Recall is
    tunable via ``planes`` (fewer planes = bigger buckets) or by
    multi-probing neighbor buckets.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    c = candidates.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id", "cand_id", cosine(F.col("qv"), F.col("cv")).alias("cos_sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "cos_sim", F.col("rnk").cast("int").alias("rnk"))
    )
