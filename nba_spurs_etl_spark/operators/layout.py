"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

Reference analog: none (single-node Postgres heap tables). At 100 TB,
parquet min/max row-group stats only prune scans when the file layout
CLUSTERS the filtered columns; sorting by one column destroys locality
for every other. A Z-order key interleaves the bits of two columns so
that a range-sort by the key yields files whose min/max rectangles are
tight in BOTH dimensions — the standard multi-dim skipping layout
(Delta/Iceberg OPTIMIZE ZORDER; here it is ~15 lines of pure bit
arithmetic, no engine support needed).

Scale mechanics: the z-key is a narrow per-row expression (codegen'd
bit ops, no shuffle); the layout write is ONE repartitionByRange on
the key (range exchange + local sort) — the same cost as any sorted
write. Readers do nothing special: tight per-file min/max on the
clustered columns makes the stock parquet filter pushdown skip files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_z(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    x's bit i lands at position 2i, y's at 2i+1. Pure codegen-side
    shift/and/or — identical arithmetic is expressible in any SQL
    dialect, which keeps the DuckDB oracles exact."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + (
            F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def morton_z_sql(x: str, y: str, bits: int = 16) -> str:
    """DuckDB twin of :func:`morton_z` (kept adjacent for parity)."""
    # every term fully parenthesized: DuckDB's `+` binds tighter than
    # `<<`, so a bare `a << i + b << j` cascades the shifts
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def norm_to_bits(c: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Linear-scale an integer column into [0, 2^bits): EXACT integer
    arithmetic ((c-mn)*(2^bits-1) div (mx-mn)), so Spark and any SQL
    oracle agree bit-for-bit.

    Why normalize at all: interleaving RAW values gives the dimension
    with more varying bits total control of the sort order (its high
    bits dominate every position), collapsing z-order into a
    single-column sort. Equal bit budgets per dimension restore the
    alternating-bit locality. Linear scaling assumes roughly uniform
    values; heavily skewed columns should use rank/range-id
    normalization instead (what table formats compute from sketches).
    """
    # decimal(38,0) arithmetic end-to-end: the (c-mn)*top product can
    # exceed both 2^53 (where a double-division quotient misrounds) and
    # 2^63 (where a long multiply wraps); decimal multiply/mod are
    # exact, and (num - num%span)/span divides exactly, so the scale-6
    # division result is integer-valued and the long cast is lossless.
    dec = "decimal(38,0)"
    top = F.lit((1 << bits) - 1).cast(dec)
    cd, mnd, mxd = c.cast(dec), mn.cast(dec), mx.cast(dec)
    span = mxd - mnd
    num = (cd - mnd) * top
    exact = (num - num % span) / span
    return F.when(mxd == mnd, F.lit(0).cast("long")).otherwise(
        exact.cast("long")
    )


def norm_to_bits_sql(c: str, mn: str, mx: str, bits: int) -> str:
    # HUGEINT mirrors the Spark decimal path: 128-bit exact multiply +
    # true integer floor division
    top = (1 << bits) - 1
    return (
        f"(CASE WHEN {mx} = {mn} THEN 0 "
        f"ELSE CAST((CAST({c} AS HUGEINT) - {mn}) * {top} "
        f"// (CAST({mx} AS HUGEINT) - {mn}) AS BIGINT) END)"
    )


def zorder_write(
    df: DataFrame, x: str | Column, y: str | Column, path: str,
    num_files: int, bits: int = 10,
) -> None:
    """Write ``df`` range-partitioned and sorted by the normalized
    z-key: each output file covers a compact rectangle of (x, y)
    space, so later scans filtering EITHER or BOTH columns skip most
    files on stock parquet min/max stats.

    The min/max used for normalization come from one scalar aggregate
    (index metadata, 4 numbers) — at 100 TB swap for stored table
    stats; the layout write itself is one range exchange + local sort,
    the cost of any sorted write.
    """
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    mnx, mxx, mny, mxy = df.agg(
        F.min(xc), F.max(xc), F.min(yc), F.max(yc)
    ).first()
    zed = df.withColumn(
        "_z",
        morton_z(
            norm_to_bits(xc, F.lit(mnx), F.lit(mxx), bits),
            norm_to_bits(yc, F.lit(mny), F.lit(mxy), bits),
            bits,
        ),
    )
    (
        zed.repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
