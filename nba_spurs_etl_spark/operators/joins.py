"""Join operators beyond plain equi-joins: as-of joins.

Spark has no native as-of join; the scalable composition here is the
union + sort + last-ignore-nulls window ("merge-asof as a window"):

1. union left (probe) and right (reference) rows, tagged by side;
2. one shuffle partitioned by key, sorted by (time, side, tiebreak);
3. carry the most recent right payload forward with
   last(ignorenulls=True) over an unbounded-preceding frame;
4. keep the left rows.

Cost: ONE shuffle of |L|+|R| rows — no range-condition join explosion,
no per-key driver loops. Skewed keys behave like any windowed op
(AQE skew handling; or pre-salt by coarse time bucket so one key's
timeline splits across tasks with boundary handoff).

At equal timestamps the right row sorts first → inclusive backward
semantics (match at t <= t_left), matching DuckDB's ASOF JOIN
(the oracle in plans/olap_ext.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload: dict[str, str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_time <= left_time (per key).

    ``payload`` maps right-column -> output-column. ``right_tiebreak``
    makes the choice among equal right timestamps deterministic
    (highest tiebreak wins).

    The payload rides as ONE struct, not per-column last() calls: the
    struct of the matched right row is non-NULL even when its FIELDS
    are NULL, so (a) a latest match whose value is NULL yields NULL
    (DuckDB ASOF semantics) instead of resurrecting a superseded older
    value, and (b) multiple payload columns always come from the SAME
    right row — per-column ignorenulls carries could stitch fields
    from different rows. Right rows with NULL time are excluded up
    front: NULL <= t is not a match (they would otherwise sort first
    and act as a universal earliest match). Right rows with a NULL KEY
    are excluded too: an SQL equi/ASOF join never matches NULL = NULL,
    but the window-partition composition would happily group all
    NULL-key rows together and "match" them (differential-fuzzer
    find); NULL-key LEFT rows stay and yield a NULL payload, exactly
    like DuckDB's ASOF LEFT JOIN.
    """
    lcols = left.columns
    rtypes = dict(right.dtypes)
    pl_type = (
        "struct<"
        + ",".join(f"`{out}`:{rtypes[src]}" for src, out in payload.items())
        + ">"
    )
    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tb"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(pl_type).alias("_pl"),
    )
    r = right.filter(
        F.col(right_time).isNotNull() & F.col(key).isNotNull()
    ).select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        (F.col(right_tiebreak).cast("long") if right_tiebreak else F.lit(0))
        .alias("_tb"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        F.struct(
            *[F.col(src).alias(out) for src, out in payload.items()]
        ).alias("_pl"),
    )
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_t"), F.asc("_side"), F.asc_nulls_last("_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_side",
        *lcols,
        F.last("_pl", ignorenulls=True).over(w).alias("_pl"),
    )
    return carried.filter(F.col("_side") == 1).select(
        *lcols,
        *[F.col(f"_pl.{out}").alias(out) for out in payload.values()],
    )


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_time: str,
    start: str,
    end: str,
    bucket_width: int,
) -> DataFrame:
    """Point-in-interval (range) join via time bucketing.

    Spark has no native range join; the naive key-only equi-join +
    filter degenerates when one key has many intervals/points. The
    scalable composition: explode each interval into the fixed-width
    buckets it covers, bucket each point once, equi-join on
    (key, bucket), then apply the exact containment predicate. Each
    point matches an interval in exactly one bucket (its own), so no
    dedup pass is needed. Cost scales with |points| + |intervals| x
    (span/bucket_width), and the join key (key, bucket) spreads a hot
    key's timeline across tasks.

    ``point_time``/``start``/``end`` are integer (e.g. epoch-us)
    columns; ``end`` is exclusive.
    """
    # degenerate intervals (end <= start) contain nothing under the
    # exclusive-end contract — and worse, Spark's sequence() auto-steps
    # -1 when start > stop, so one corrupt inverted interval would
    # explode into a DESCENDING run of millions of phantom bucket rows
    intervals = intervals.filter(F.col(end) > F.col(start))
    # integer `div`, not `/`: epoch-us magnitudes overflow double
    # precision and a boundary-adjacent point would mis-bucket
    ivals = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.expr(f"{start} div {bucket_width}"),
                F.expr(f"({end} - 1) div {bucket_width}"),
            )
        ),
    )
    pts = points.withColumn(
        "_bucket", F.expr(f"{point_time} div {bucket_width}")
    )
    cond = (
        (pts[key] == ivals[key])
        & (pts["_bucket"] == ivals["_bucket"])
        & (pts[point_time] >= ivals[start])
        & (pts[point_time] < ivals[end])
    )
    return pts.join(ivals, cond).drop(ivals[key]).drop("_bucket")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    num_salts: int = 8,
) -> DataFrame:
    """Inner equi-join with the big side's hot keys pre-split by salt.

    A shuffled hash join sends every row of one key to ONE reducer; a
    key holding 1% of 100 TB is a 1 TB task. Salting splits each key
    across ``num_salts`` reducers: the big side derives a salt from a
    content hash of its own row (deterministic and retry-stable — no
    rand(), which would make recomputed tasks disagree with their
    first run), the small side replicates each row once per salt, and
    the join runs on (key, salt). Result set is provably identical to
    the plain join; cost is num_salts-way duplication of the SMALL
    side only.

    AQE's skew-join (on in session.py) is the runtime fix for skew it
    can SEE at shuffle time; explicit salting is the planned-ahead
    form for keys known hot a priori (the celebrity user, the null
    key, the default enum) and the only option under non-AQE engines
    or stream-static joins where AQE is disabled.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(num_salts))
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i).cast("long") for i in range(num_salts)])),
    )
    joined = b.join(
        s,
        (b[big_key] == s[small_key]) & (b["__salt"] == s["__salt"]),
    )
    return joined.drop(b["__salt"]).drop(s["__salt"])


def grid_radius_join(
    left: DataFrame,
    right: DataFrame,
    left_x: str,
    left_y: str,
    right_x: str,
    right_y: str,
    radius: int,
) -> DataFrame:
    """All (left, right) pairs within euclidean ``radius``, via grid
    bucketing — the spatial join Spark lacks natively, in the only
    shape that survives 100 TB (a cross join + distance filter does
    not plan a join at all; it plans a cartesian).

    Coordinates are INTEGER fixed-point (e.g. centi-units), any sign:
    cells come from pure-integer FLOOR division ``(x - pmod(x, w)) div
    w`` (``pmod`` is non-negative, so the numerator is the largest
    multiple of ``w`` <= x and the ``div`` is exact). With floor
    cells, |dx| <= radius puts every in-radius pair in adjacent cells
    by construction — no sign precondition. (Truncating ``div``
    happens to be absorbed by the 3x3 explode too — the +1 shift it
    applies to negative non-multiples cannot produce a 2-cell gap
    within the radius — but that takes a case analysis; floor makes
    it a one-line invariant.) Cell width =
    ``radius``: any pair within the radius differs by at most one cell
    per axis, so the LEFT side explodes into its 3x3 neighbor cells,
    the right side buckets ONCE, the candidate join is a plain
    equi-join on (cell_x, cell_y), and the exact refine
    ``dx^2 + dy^2 <= radius^2`` runs in pure BIGINT — bit-exact in any
    engine, no float geometry anywhere. Each qualifying pair matches
    in exactly ONE cell (the right point's own), so no dedup pass.

    Cost: 9x duplication of the left side's narrow (key, cell) rows,
    one shuffle on the cell key; density skew (a hot city cell) spreads
    across the 9-cell neighborhood and is AQE-splittable since the
    cell key is the shuffle key. Output carries ``dist2`` (the exact
    squared distance) alongside every input column.
    """
    w = int(radius)
    if w <= 0:
        # radius 0 would put 'div 0' in every cell expression: NULL
        # cells (or an ANSI DIVIDE_BY_ZERO deep in the plan) and a
        # silently empty join — name the misconfiguration instead
        raise ValueError(f"grid_radius_join requires radius > 0; got {radius}")
    r2 = w * w

    def cell(col: str):
        # integer floor-division (BIGINT-exact — F.floor(x / w) would
        # round-trip through DOUBLE and lose exactness past 2^53)
        return F.expr(f"({col} - pmod({col}, {w})) div {w}")

    off = F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))
    l = (
        left.withColumn("_dx", off)
        .withColumn("_dy", off)
        .select(
            "*",
            (cell(left_x) + F.col("_dx")).alias("_cx"),
            (cell(left_y) + F.col("_dy")).alias("_cy"),
        )
        .drop("_dx", "_dy")
        .alias("l")
    )
    r = right.select(
        "*",
        cell(right_x).alias("_cx"),
        cell(right_y).alias("_cy"),
    ).alias("r")
    ddx = F.col(f"l.{left_x}") - F.col(f"r.{right_x}")
    ddy = F.col(f"l.{left_y}") - F.col(f"r.{right_y}")
    dist2 = ddx * ddx + ddy * ddy
    joined = l.join(
        r,
        (F.col("l._cx") == F.col("r._cx"))
        & (F.col("l._cy") == F.col("r._cy"))
        & (dist2 <= F.lit(r2)),
    )
    return (
        joined.withColumn("dist2", dist2.cast("long"))
        .drop(l["_cx"]).drop(l["_cy"]).drop(r["_cx"]).drop(r["_cy"])
    )
