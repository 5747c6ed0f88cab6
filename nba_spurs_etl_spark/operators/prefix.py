"""Distributed global prefix sums (running totals over a TOTAL order).

The engine's other running sums are per-key windows
(`plans.olap_ext.rolling_7d_customer_revenue`, gaps-and-islands) —
Spark parallelizes those by the partition key. A *global* running sum
has no partition key, and the naive form

    W = Window.orderBy(...)            # no partitionBy
    df.withColumn("run", F.sum(x).over(W))

collapses the whole dataset into ONE task (Spark even warns). The
curation operators sidestep this by packing per shard key
(`operators/curation.py:111`); this module solves the global form
properly with the classic two-phase scan:

1. split the total order into ``num_buckets`` ordered intervals using
   DETERMINISTIC quantile boundaries of the leading order component
   (``percentile_approx`` — a deterministic sketch, no RNG; the
   boundary list is bucket-count-sized driver metadata, like the IVF
   centroids in `operators/similarity.py`);
2. per-bucket local running sums — parallel windows keyed by the
   bucket id, ONE data-scale hash shuffle;
3. per-bucket totals -> exclusive prefix offsets (a window over
   |buckets| rows — scheduler-scale, not data-scale);
4. broadcast the offsets back on the bucket id and add.

The resulting physical plan (pinned by ``tests/test_plans.py``)
carries exactly ONE data-scale shuffle — hashpartitioning(bucket) under
the local window. The per-bucket totals never ride that shuffle:
Catalyst plans them as a partial HashAggregate directly over a second
column-pruned scan, so their exchange moves |buckets|×tasks partial
rows, not data. Cost model: two scans (one pruned to bucket+value, one
for the boundary sketch pruned to the bucket column), one data shuffle,
one broadcast. At 100 TB on 1000 executors this is exactly how MPP
engines run ``SUM() OVER (ORDER BY ...)``.

Why not ``repartitionByRange`` + ``spark_partition_id``? The ranged
frame is consumed twice (local window + partials), and when the
optimizer does NOT reuse the exchange each instance re-runs
``RangePartitioner``'s reservoir sampling with a different RDD-id
seed — the two sides can disagree about partition boundaries and the
offsets silently misalign. Explicit literal boundaries make bucket
assignment a pure row-local expression: reuse becomes an optimization,
not a correctness requirement.

Correctness contract: ``order_cols`` must be a TOTAL order (include a
unique tiebreak key), and rows equal on the leading component always
land in the same bucket, so no tie ever straddles a boundary. Use an
exact value type (decimal / integer) for bit-equality with the
sequential SQL form — bucket-major addition is a reassociation, exact
for decimals, not for doubles.

No reference analog (the reference's only window functions are
partitioned ranks, ``/root/reference/dbt/models/*.sql``); this is a
scale-enabling extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def quantile_bounds_and_aggs(
    df: DataFrame,
    bucket_on: Column,
    num_buckets: int,
    aggs: dict[str, Column],
):
    """Deterministic quantile boundary list of ``bucket_on`` PLUS any
    caller-supplied scalar aggregates, from ONE probe job (r11
    optimization): callers needing a scalar of the same frame (total
    row count for a rank, a grand total for a share denominator) used
    to pay a separate full-scan pass — all are aggregates over the
    same scan, so fusing them removes whole passes (guide §1.2).
    Returns (bounds, row) with the aggregates under their dict keys.
    """
    if "__qb_bounds" in aggs:
        raise ValueError("agg name '__qb_bounds' is reserved")
    probs = [i / num_buckets for i in range(1, num_buckets)]
    row = df.select(
        # collision-proof internal alias: a caller agg named like the
        # bounds column would win the duplicate-name Row lookup and
        # silently swap results (r11 review find)
        F.percentile_approx(bucket_on, probs, 10_000).alias("__qb_bounds"),
        *[c.alias(k) for k, c in aggs.items()],
    ).first()
    bounds = sorted(
        {b for b in (row["__qb_bounds"] or []) if b is not None}
    )
    return bounds, row


def quantile_bounds_and_count(
    df: DataFrame, bucket_on: Column, num_buckets: int
) -> tuple[list, int]:
    """(bounds, COUNT(*)) — see :func:`quantile_bounds_and_aggs`."""
    bounds, row = quantile_bounds_and_aggs(
        df, bucket_on, num_buckets, {"n": F.count(F.lit(1))}
    )
    return bounds, int(row["n"])


def bucket_col(bucket_on: Column, bounds: list) -> Column:
    """Ordered bucket id (0..len(bounds)) from a precomputed boundary
    list (see :func:`quantile_bounds_and_count`)."""
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(bucket_on > F.lit(b), 1).otherwise(0)
    return bucket


def quantile_buckets(
    df: DataFrame, bucket_on: Column, num_buckets: int
) -> Column:
    """Ordered bucket id (0..num_buckets-1) from deterministic quantile
    boundaries of a NUMERIC expression that is non-decreasing in the
    intended order's leading component.

    Boundary values are actual data quantiles, deduplicated — a
    low-cardinality leading component yields fewer (possibly 1)
    buckets, degrading parallelism but never correctness.
    """
    bounds, _ = quantile_bounds_and_count(df, bucket_on, num_buckets)
    return bucket_col(bucket_on, bounds)


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value: Column | str,
    out_col: str = "running_sum",
    bucket_on: Column | str | None = None,
    num_buckets: int | None = None,
    bounds: list | None = None,
) -> DataFrame:
    """Append ``out_col`` = SUM(value) OVER (ORDER BY order_cols ROWS
    UNBOUNDED PRECEDING) without a single-task global window.

    ``bucket_on``: numeric expression non-decreasing in
    ``order_cols[0]`` (defaults to the column itself — pass an explicit
    cast for non-numeric leading columns, e.g. a date's day number).
    ``bounds``: optional precomputed boundary list (see
    :func:`global_running_sums`).
    """
    return global_running_sums(
        df, order_cols, {out_col: value}, bucket_on, num_buckets, bounds
    )


def global_running_sums(
    df: DataFrame,
    order_cols: list[str],
    values: dict[str, Column | str],
    bucket_on: Column | str | None = None,
    num_buckets: int | None = None,
    bounds: list | None = None,
) -> DataFrame:
    """Multi-column form of :func:`global_running_sum`: one bucketing
    pass (one boundary sketch, one data shuffle, one offsets
    broadcast) carries ANY number of running sums — chaining the
    single-column form would re-bucket and re-shuffle per column.
    ``values`` maps output column name -> summed expression.

    ``bounds``: precomputed boundary list (from
    :func:`quantile_bounds_and_count`) — callers that already probed
    the column (e.g. to fuse a COUNT into the same job) pass it to
    skip this function's own probe pass.
    """
    cols = {
        name: (F.col(v) if isinstance(v, str) else v)
        for name, v in values.items()
    }
    if bucket_on is None:
        bucket_on = F.col(order_cols[0])
    elif isinstance(bucket_on, str):
        bucket_on = F.col(bucket_on)
    if num_buckets is None:
        num_buckets = df.sparkSession.sparkContext.defaultParallelism

    if bounds is None:
        bounds, _ = quantile_bounds_and_count(df, bucket_on, num_buckets)
    bucketed = df.withColumn("_bkt", bucket_col(bucket_on, bounds))
    local_w = (
        Window.partitionBy("_bkt")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_local = bucketed
    for name, v in cols.items():
        with_local = with_local.withColumn(
            f"_local_{name}", F.sum(v).over(local_w)
        )
    # per-bucket totals over the SAME hashpartitioning(_bkt) exchange the
    # window uses (ReuseExchange dedupes); |buckets| rows out
    partials = bucketed.groupBy("_bkt").agg(
        *[F.sum(v).alias(f"_btotal_{name}") for name, v in cols.items()]
    )
    off_w = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = partials.select(
        "_bkt",
        *[
            F.sum(f"_btotal_{name}").over(off_w).alias(f"_offset_{name}")
            for name in cols
        ],
    )
    out = with_local.join(F.broadcast(offsets), "_bkt")
    for name in cols:
        loc, off = F.col(f"_local_{name}"), F.col(f"_offset_{name}")
        # NULL algebra must match the sequential window exactly:
        # SUM() OVER is NULL only until the first non-null value
        # appears ANYWHERE in the prefix. loc is NULL iff this
        # bucket's prefix is all-NULL; off is NULL iff every earlier
        # bucket total is NULL (bucket 0 included — the off_w frame is
        # empty there). A plain loc + coalesce(off, 0) would return
        # NULL for a later bucket whose own prefix is all-NULL even
        # when earlier buckets carried real values.
        out = out.withColumn(
            name,
            F.when(loc.isNull() & off.isNull(), F.lit(None)).otherwise(
                F.coalesce(loc, F.lit(0)) + F.coalesce(off, F.lit(0))
            ),
        )
    return out.drop(
        "_bkt",
        *[f"_local_{name}" for name in cols],
        *[f"_offset_{name}" for name in cols],
    )


def interval_concurrency(
    df: DataFrame,
    start: Column,
    end: Column,
    order_tiebreak: Column,
    num_buckets: int | None = None,
) -> DataFrame:
    """Sweep-line concurrency: for every interval boundary, how many
    intervals [start, end) are open just after it.

    Classic event-sweep: explode each interval into (+1 at start, -1 at
    end) boundary rows, then a global running sum over (time, delta,
    tiebreak). Half-open semantics: at equal timestamps the -1 sorts
    before the +1 (delta ascending), so an interval ending exactly when
    another starts never double-counts.

    ``start``/``end`` must be numeric (e.g. epoch microseconds), so the
    time axis doubles as the bucket expression. Returns
    (t, delta, tb, concurrency); built on ``global_running_sum``, so it
    inherits the two-phase scale shape.

    Degenerate intervals (end <= start) are DROPPED: [t, t) is empty
    under half-open semantics, and emitting its boundaries would sort
    the -1 before its own +1 (the half-open tiebreak), reporting a
    transiently negative concurrency.
    """
    df = df.filter(end > start)
    boundaries = df.select(
        F.explode(
            F.array(
                F.struct(start.alias("t"), F.lit(1).alias("delta")),
                F.struct(end.alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("b"),
        order_tiebreak.alias("tb"),
    ).select("b.t", "b.delta", "tb")
    return global_running_sum(
        boundaries,
        ["t", "delta", "tb"],
        F.col("delta").cast("bigint"),
        out_col="concurrency",
        num_buckets=num_buckets,
    )


def exact_kth_smallest(
    df: DataFrame,
    value: Column | str,
    k: int,
    num_buckets: int = 64,
    takeordered_limit: int = 1_000_000,
) -> float:
    """Exact global k-th smallest value (1-based) without a global sort.

    The classic two-phase distributed selection: (1) histogram the
    column over deterministic quantile buckets (``quantile_buckets`` —
    boundary list is bounded driver metadata) and locate the bucket
    containing rank k from the <= num_buckets cumulative counts;
    (2) if the remaining in-bucket rank j is still large, RECURSE on
    that one bucket (re-histogram its narrower value range — one
    extra round per num_buckets-factor of data growth); once j fits
    ``takeordered_limit``, TakeOrdered the bucket and read off the
    j-th. Nothing ever globally sorts: each round is one map-combined
    aggregation over a geometrically-shrinking slice, and the final
    step touches rows via per-partition heaps. Constant-value buckets
    (un-splittable: every row equals the answer) short-circuit.

    A global ``Window.orderBy`` row_number would collapse the whole
    table into one task (the hazard `global_running_sum` documents);
    ``orderBy(...).limit(k)`` ships k rows through the driver merge.
    Both die at 100 TB; this does not.

    Contract: ``value`` must be non-null — engines disagree on null
    sort position (Spark ASC puts nulls first, DuckDB last), so a
    rank over a nullable column is not well-defined cross-engine.
    """
    if k < 1:
        # k=0 falls out of an empty input upstream ((0+1)//2 == 0) —
        # without this guard the bucket loop never binds its cursor
        # and dies with an UnboundLocalError instead of a contract
        # error (edge-fuzz find, r07a: lineitem truncated wholesale)
        raise ValueError(f"k={k} must be >= 1 (rank is 1-based)")
    v = F.col(value) if isinstance(value, str) else value
    return _kth_loop(df.select(v.alias("v")), k, num_buckets,
                     takeordered_limit)


def exact_kth_smallest_counting(
    df: DataFrame,
    value: Column | str,
    k_of_total,
    num_buckets: int = 64,
    takeordered_limit: int = 1_000_000,
) -> tuple[int, int, float | None]:
    """(n, k, value): :func:`exact_kth_smallest` for callers whose rank
    is a FUNCTION of the row count (median: k = (n+1)//2). The count
    is fused into the boundary-probe job (one aggregate computes the
    percentile sketch AND COUNT(*) over the same scan), and the first
    selection round reuses those boundaries — vs the separate
    ``df.count()`` + probe + histogram shape this removes one full
    pass over the data (guide §1.2). Returns (0, k_of_total(0), None)
    on empty input; ``value`` nullability contract is the caller's,
    as in :func:`exact_kth_smallest`.
    """
    v = F.col(value) if isinstance(value, str) else value
    d = df.select(v.alias("v"))
    bounds, n = quantile_bounds_and_count(d, F.col("v"), num_buckets)
    k = int(k_of_total(n))
    if n == 0:
        return 0, k, None
    if k < 1 or k > n:
        raise ValueError(f"k={k} out of range for n={n}")
    return n, k, _kth_loop(d, k, num_buckets, takeordered_limit, bounds)


def _kth_loop(
    d: DataFrame,
    k: int,
    num_buckets: int,
    takeordered_limit: int,
    bounds: list | None = None,
) -> float:
    """Shared selection loop: ``d`` is the single-column ("v") frame,
    ``bounds`` optionally carries round 1's precomputed boundary list
    (from a probe job that also computed the caller's COUNT)."""
    j = k
    while True:
        if bounds is None:
            bounds, _ = quantile_bounds_and_count(
                d, F.col("v"), num_buckets
            )
        b = bucket_col(F.col("v"), bounds)
        bounds = None  # later rounds re-probe their narrowed slice
        dd = d.select("v", b.alias("b"))
        hist = sorted(
            (r["b"], r["c"])
            for r in dd.groupBy("b").agg(F.count(F.lit(1)).alias("c")).collect()
        )
        total = sum(c for _, c in hist)
        if j > total:
            raise ValueError(f"k={k} exceeds row count")
        cum = 0
        for bid, c in hist:
            if cum + c >= j:
                j -= cum
                bucket = dd.filter(F.col("b") == bid).select("v")
                break
            cum += c
        # recurse while the bucket is still big AND splittable (a
        # constant-value bucket cannot split — but then every row IS
        # the answer)
        if c <= takeordered_limit or len(hist) == 1:
            if len(hist) == 1 and c > takeordered_limit:
                mn, mx = bucket.agg(
                    F.min("v").alias("mn"), F.max("v").alias("mx")
                ).collect()[0]
                if mn == mx:
                    return mn
                # Percentile boundaries can collapse without the bucket
                # being constant — a default/sentinel-heavy column where
                # >= (num_buckets-1)/num_buckets of rows share the max.
                # Peel the max class instead of falling through to a
                # driver-side TakeOrdered of up to j rows (the exact
                # melt the contract above forbids): if rank j lands in
                # the max class the answer IS mx; otherwise recurse on
                # the strictly-smaller v < mx slice.
                # lazy checkpoint + count: the count materializes the
                # checkpoint (full scan) in ONE job, and the next
                # round's histogram (when rank j falls short) reads
                # the cached slice
                lo = bucket.filter(F.col("v") < mx).localCheckpoint(
                    eager=False
                )
                n_lo = lo.count()
                if j > n_lo:
                    return mx
                d = lo
                continue
            row = (
                bucket.orderBy("v")
                .limit(j)
                .orderBy(F.col("v").desc())
                .limit(1)
                .collect()
            )
            return row[0]["v"]
        d = bucket.localCheckpoint(eager=False)
