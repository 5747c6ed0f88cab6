"""Graph operators over pair lists (duplicate graphs, link graphs).

Companions to ``dedup.connected_components``: the engine's iterative-
algorithm surface. Everything here is driver-loop iteration over
DataFrames with bounded lineage — the Pregel-shaped workloads that
don't fit one SQL statement but are a dozen lines of DataFrame algebra.

Determinism contract: ranks are INTEGER fixed-point (BIGINT), updated
with floor division — integer sums are order-independent, so results
are bit-identical across partitionings, retries, and engines (a
float PageRank would drift per-partition-order). The DuckDB oracle
unrolls the fixed iteration count as chained CTEs (aggregation is not
allowed in a recursive CTE term, and k is small by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: global fixed-point scale: initial rank per node
PR_SCALE = 1_000_000_000


def integer_pagerank(
    pairs: DataFrame,
    iterations: int = 3,
    scale: int = PR_SCALE,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """Deterministic integer PageRank over an undirected pair list.

    rank_{k+1}(v) = base + (damp_num * SUM_{u~v} (rank_k(u) // deg(u)))
    // damp_den, with base = scale * (damp_den - damp_num) // damp_den —
    the classic damped update in pure BIGINT floor arithmetic. On a
    near-dup pair graph the high ranks are the hub documents (mass
    boilerplate) — a curation signal the pair list alone doesn't give.

    Scale: per iteration, one broadcast-or-shuffle join of ranks onto
    the (src, dst, deg) edge frame plus one dst-keyed partial-agg
    shuffle — contributions are 8-byte longs, map-side combined. The
    edge frame is lazily localCheckpoint'ed once so the pair-generation
    subtree (e.g. minhash banding) does not re-run per iteration; k is
    fixed and small, so lineage depth stays bounded without per-round
    checkpoints.
    """
    fwd = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ed = edges.join(deg, "src").localCheckpoint(eager=False)
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(scale).cast("long").alias("rank")
    )
    base = scale * (damp_den - damp_num) // damp_den
    for _ in range(iterations):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .select("dst", F.expr("rank div d").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        # every node of an undirected pair graph has >= 1 in-edge, so
        # the contribution frame covers the full node set each round
        ranks = contrib.select(
            F.col("dst").alias("node"),
            F.expr(f"{base} + ({damp_num} * s) div {damp_den}").alias("rank"),
        )
    return ranks.select("node", F.col("rank").cast("long").alias("rank"))
