"""Similarity search over embedding columns (array<float>).

Baseline: exact brute-force cosine top-k (broadcast the query set,
score distributed, per-query top-k via partitioned window — no global
sort). Scale path: sign-LSH bucketing (IVF-style candidate pruning) so
each query only scores its bucket.

Everything is built-in functions (zip_with/aggregate — JVM-side
evaluation, no Python in the hot path). The dot product is a sequential
left fold in double so DuckDB's list_reduce reproduces it bit-exactly;
vector norms are hoisted (computed once per row, not once per pair) —
the quotient dot/(nrm_a*nrm_b) is the identical expression tree either
way, so results don't change, only the fold count does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _dot


def lsh_bucket(vec: Column, planes: int = 8) -> Column:
    """Sign-pattern bucket key from the first ``planes`` components.

    A deterministic stand-in for random-hyperplane LSH (components of a
    trained embedding are near-orthogonal directions already): bit i =
    sign(vec[i]). Cross-engine exact (no RNG), which keeps the oracle
    checkable; swap in hashed random planes for production skew control.
    Bucket count = 2^planes: scale planes UP with corpus size (candidate
    cost) and DOWN when recall matters more than latency.
    """
    bits = [
        F.when(F.element_at(vec, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def _sides(
    candidates: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    planes: int | None,
) -> tuple[DataFrame, DataFrame]:
    v = F.col(vec_col)

    def prep(df: DataFrame, role: str) -> DataFrame:
        cols = [
            F.col(id_col).alias(f"{role}_id"),
            v.alias(f"{role}v"),
            F.sqrt(_dot(v, v)).alias(f"{role}n"),
        ]
        if planes is not None:
            cols.append(lsh_bucket(v, planes).alias("bucket"))
        return df.select(*cols)

    return prep(candidates, "cand"), prep(queries, "query")


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "cand_id", "cos_sim", F.col("rnk").cast("int").alias("rnk"))
    )


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
    c, q = _sides(candidates, queries, id_col, vec_col, planes=None)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            (
                _dot(F.col("queryv"), F.col("candv"))
                / (F.col("queryn") * F.col("candn"))
            ).alias("cos_sim"),
        )
    )
    return _rank_topk(scored, k)


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
    2^planes buckets, each query scores ~1/2^planes of the corpus.
    Recall is tunable via ``planes`` or by multi-probing neighbor
    buckets.
    """
    c, q = _sides(candidates, queries, id_col, vec_col, planes=planes)
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            (
                _dot(F.col("queryv"), F.col("candv"))
                / (F.col("queryn") * F.col("candn"))
            ).alias("cos_sim"),
        )
    )
    return _rank_topk(scored, k)
