"""Data-layout operators: multi-dimensional clustering keys for the
lakehouse tables the pipeline writes.

Zone-map pruning (sources.zone_maps, dataquality's partition-stats
audit) only pays off when each file's min/max ranges are tight on the
columns queries filter by. A single-column sort tightens one column
and scrambles the rest; a Z-order (Morton) key interleaves the bits of
two columns so files cover small rectangles in BOTH dimensions — the
standard lakehouse `OPTIMIZE ... ZORDER BY (x, y)` layout.

Scale shape: the key is pure JVM bit arithmetic per row, and the
file assignment is a fixed-width prefix of the key — NO global sort or
window anywhere. Writing `repartitionByRange(zkey)` on a real cluster
produces the same file rectangles; here the prefix bucketing keeps the
whole layout closed-form so the DuckDB oracle replays it bit-for-bit.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton/Z-order interleave of two non-negative ints clamped to
    `bits` bits each: x occupies even bit positions, y odd — so a
    range of keys sharing a prefix covers an axis-aligned rectangle.
    Disjoint bit positions make `+` equal `|`, keeping the expression
    a plain integer sum both engines fold identically."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    mask = (1 << bits) - 1
    xm = x.cast("long").bitwiseAND(F.lit(mask))
    ym = y.cast("long").bitwiseAND(F.lit(mask))
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(lambda a, b: a + b, terms)


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    file_bits: int = 6,
) -> DataFrame:
    """Z-order file layout preview: assign each row to one of
    2**file_bits files by the Morton-key prefix and report per-file
    zone-map stats (row count, min/max of both dimensions). Tight
    per-file ranges on BOTH columns are the whole point — they are
    what lets zone-map pruning skip files for 2-D predicates.

    Returns (file_id, n_rows, x_min, x_max, y_min, y_max) ordered by
    nothing (the caller sorts if displaying)."""
    key = zorder_key(F.col(x_col), F.col(y_col), bits)
    staged = df.select(
        F.shiftright(key, 2 * bits - file_bits).alias("file_id"),
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
    )
    return staged.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("_x").alias("x_min"),
        F.max("_x").alias("x_max"),
        F.min("_y").alias("y_min"),
        F.max("_y").alias("y_max"),
    )


def zorder_sql_expr(x: str, y: str, bits: int = 16) -> str:
    """The DuckDB-dialect mirror of zorder_key — generated from the
    same loop so the two engines can never drift."""
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"(((({x} :: BIGINT) & {mask}) >> {i} & 1) << {2 * i})")
        terms.append(
            f"(((({y} :: BIGINT) & {mask}) >> {i} & 1) << {2 * i + 1})"
        )
    return "(" + " + ".join(terms) + ")"
