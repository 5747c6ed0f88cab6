"""Deterministic sampling / split-assignment operators.

A training-data pipeline needs reproducible splits and per-stratum
downsampling that survive retries, re-partitioning, and incremental
re-runs. Spark's ``randomSplit``/``sample`` are seed-deterministic only
per-partitioning (they sample by partition+seed), so these operators
hash ROW IDENTITY instead: a doc lands in the same split on every run,
on any cluster layout, and the DuckDB oracle reproduces the decision
bit-for-bit (same md5 scheme as the dedup family).

Scale: split assignment is a pure row-local expression (zero shuffle).
Stratified sampling joins a per-stratum rate table — broadcast, so it
adds no shuffle either; the rate table is by construction tiny (one row
per language/source/bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import md5_long


def split_bucket(id_col: str, salt: str = "split", buckets: int = 100) -> F.Column:
    """Stable bucket in [0, buckets) from the salted md5 of the row id."""
    return (
        md5_long(F.concat(F.lit(salt + "_"), F.col(id_col).cast("string")))
        % buckets
    )


def split_label(
    id_col: str,
    train_pct: int = 90,
    valid_pct: int = 5,
    salt: str = "split",
) -> F.Column:
    """The train/validation/test label expression (column-level, for
    composed pipelines that attach the split without a join)."""
    b = split_bucket(id_col, salt)
    # NULL ids hash to a NULL bucket: both when() branches skip, and a
    # bare otherwise('test') would silently dump every bad-id row into
    # the TEST split (eval contamination). A NULL split keeps them
    # visible — filter or fail upstream.
    return (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + valid_pct, F.lit("validation"))
        .when(b.isNotNull(), F.lit("test"))
    )


def assign_splits(
    df: DataFrame,
    id_col: str,
    train_pct: int = 90,
    valid_pct: int = 5,
    salt: str = "split",
) -> DataFrame:
    """(id, bucket, split): hash-stable train/validation/test assignment.

    The salt namespaces the hash so a later re-split (new salt) is
    independent of the old one — re-rolling the split does not
    correlate with the previous assignment.
    """
    b = split_bucket(id_col, salt)
    split = split_label(id_col, train_pct, valid_pct, salt)
    return df.select(
        F.col(id_col).alias("doc"),
        b.cast("bigint").alias("bucket"),
        split.alias("split"),
    )


def assign_splits_leakage_safe(
    df: DataFrame,
    id_col: str,
    groups: DataFrame,
    train_pct: int = 90,
    valid_pct: int = 5,
    salt: str = "lsplit",
) -> DataFrame:
    """(doc, component, bucket, split): train/validation/test where
    every member of a near-dup GROUP lands in the SAME split.

    Plain per-row hash splitting leaks: two near-identical documents
    hash independently, so one lands in train and its twin in test —
    the evaluation then scores memorization. Here the bucket hashes
    the GROUP label (a connected component over dup pairs, e.g.
    ``dedup.connected_components`` of MinHash-LSH candidates), so the
    whole cluster moves together; docs outside any pair are singleton
    groups labeled by their own id. This is decontamination's
    preventive twin: instead of scrubbing leaked pairs after the
    split, the split itself cannot separate them.

    Scale: one key-partitioned left join of the corpus against the
    (doc, component) frame (components are bounded-round iterative —
    see connected_components); the split itself stays a row-local
    expression. NULL ids keep the ``split_label`` contract: NULL
    split, never a silent dump into test.
    """
    lab = (
        df.select(F.col(id_col).alias("doc"))
        .join(
            groups.select(
                F.col("doc").alias("_gd"), F.col("component").alias("_gc")
            ),
            F.col("doc") == F.col("_gd"),
            "left",
        )
        .select(
            "doc", F.coalesce(F.col("_gc"), F.col("doc")).alias("component")
        )
    )
    return lab.select(
        "doc",
        "component",
        split_bucket("component", salt).cast("bigint").alias("bucket"),
        split_label("component", train_pct, valid_pct, salt).alias("split"),
    )


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates_permille: dict[str, int],
    default_permille: int = 1000,
    salt: str = "samp",
) -> DataFrame:
    """Deterministic per-stratum downsample (rates in permille).

    Broadcast-joins a tiny stratum->rate table, keeps a row iff its
    salted id hash mod 1000 falls under the stratum's rate — the usual
    move to rebalance an over-represented language/source before
    training. Returns the surviving (doc, stratum, keep_permille).
    """
    spark = df.sparkSession
    rates = spark.createDataFrame(
        list(rates_permille.items()), f"{stratum_col} string, keep_permille int"
    )
    h = (
        md5_long(F.concat(F.lit(salt + "_"), F.col(id_col).cast("string"))) % 1000
    )
    return (
        df.join(F.broadcast(rates), stratum_col, "left")
        .select(
            F.col(id_col).alias("doc"),
            F.col(stratum_col).alias("stratum"),
            F.coalesce("keep_permille", F.lit(default_permille)).alias(
                "keep_permille"
            ),
            h.alias("h"),
        )
        .filter(F.col("h") < F.col("keep_permille"))
        .drop("h")
    )


_TWO60 = float(1 << 60)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    fraction: float,
    salt: str = "wsamp",
) -> DataFrame:
    """Deterministic weight-proportional (Poisson) sample.

    Row i is kept iff ``u_i < w_i * (fraction * n / W)`` with
    ``u_i = md5(salt_id)/2^60`` — inclusion probability proportional to
    weight, expected sample size ``fraction * n``. The usual move for
    quality-weighted corpus downsampling (keep high-quality docs more
    often) without an RNG: the decision is pure IEEE multiply/compare
    over hash-uniform doubles (no pow/log whose libm rounding could
    diverge across engines), so retries, repartitioning and the DuckDB
    oracle all reproduce the identical sample.

    Scale: the global (n, total_weight) scalar is one map-combined agg
    broadcast back over the rows; the keep decision is row-local —
    no data shuffle at any size. Rows with ``w_i * f * n / W >= 1``
    are always kept (heavy-row saturation, standard for Poisson
    sampling).
    """
    w = F.col(weight_col)
    stats = df.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(w.cast("decimal(18,2)")).cast("double").alias("_tw"),
    )
    u = (
        md5_long(F.concat(F.lit(salt + "_"), F.col(id_col).cast("string")))
        .cast("double")
        / F.lit(_TWO60)
    )
    p = w * (F.lit(fraction) * F.col("_n") / F.col("_tw"))
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("p_incl", p)
        .filter(u < F.col("p_incl"))
        .drop("_n", "_tw")
    )


def weighted_sample_exact_k(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "aes",
) -> DataFrame:
    """Exact-k weighted sampling without replacement (Efraimidis &
    Spirakis A-ES, "Weighted random sampling with a reservoir", IPL
    2006): rank every row by ``key = ln(u) / w`` with hash-uniform
    ``u ∈ (0, 1]`` and keep the global top ``k`` — the classic
    monotone transform of ``u^(1/w)``, under which each row's
    inclusion probability is exactly its A-ES reservoir probability.

    Deterministic like every sampler here: ``u`` derives from the
    salted md5 of the row id, so retries, repartitionings, and the
    DuckDB oracle select the identical k rows (60-bit hashes make key
    collisions ~2^-60; ties still break on id for full determinism).
    Rows with non-positive weight are excluded (ln(u)/w flips sign —
    documented contract, matching the Poisson sampler's w>0 domain).

    Scale: ``orderBy(key).limit(k)`` compiles to
    ``TakeOrderedAndProject`` — per-partition top-k + a driver merge of
    ``partitions × k`` rows, never a global sort; the only libm call
    (ln) is row-local JVM codegen.
    """
    w = F.col(weight_col).cast("double")
    u = (
        md5_long(
            F.concat(F.lit(salt + "_"), F.col(id_col).cast("string"))
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(_TWO60)
    key = F.log(u) / w
    return (
        df.filter(w > 0)
        .withColumn("es_key", key)
        .orderBy(F.col("es_key").desc(), F.col(id_col).asc())
        .limit(k)
        # es_key stays internal, matching the per-group twin: the
        # SELECTION is ulp-robust, the raw libm double is not — the
        # output schema is exactly the input's
        .drop("es_key")
    )


def weighted_sample_exact_k_per_group(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    group_col: str,
    k: int,
    salt: str = "aesg",
) -> DataFrame:
    """A-ES exact-k weighted sampling WITHIN each group: top ``k``
    rows per ``group_col`` by the same ln(u)/w rank as
    ``weighted_sample_exact_k`` — per-stratum weighted downsampling
    (e.g. k best-quality docs per source/language) in one pass.

    Scale: one shuffle keyed by the group, then a row_number window —
    rank state is O(1) per row; per-group skew is the usual window
    skew, bounded by the group's row count (salt the group key first
    if one group dominates). Deterministic like the global form, so
    the oracle reselects identical rows; es_key stays internal
    (libm-ulp discipline — the SELECTION is robust, the double isn't).
    """
    w = F.col(weight_col).cast("double")
    u = (
        md5_long(
            F.concat(F.lit(salt + "_"), F.col(id_col).cast("string"))
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(_TWO60)
    key = F.log(u) / w
    win = Window.partitionBy(group_col).orderBy(
        key.desc(), F.col(id_col).asc()
    )
    return (
        df.filter(w > 0)
        .withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )
