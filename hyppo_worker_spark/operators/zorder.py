"""Z-order (Morton) clustering: multi-dimensional data-skipping
layout for columnar exports.

A 100 TB table sorted by one key gives parquet/ORC min-max file stats
that prune scans on THAT key only; a query filtering the second key
reads everything. Interleaving the bits of both (range-scaled) keys
into one Morton code and clustering files by that code bounds every
file's extent in BOTH dimensions, so min-max pruning works for either
predicate — the layout trick behind Delta/Iceberg OPTIMIZE ZORDER
(public technique; Morton 1966), re-expressed as plain DataFrame
arithmetic:

- **scale**: each dimension maps linearly to ``bits``-bit integer
  space — ``(v - min) * (2^bits - 1) // span`` computed entirely in
  int64 (exact floor-div == DuckDB's ``//`` for any span under
  2^63/(2^bits-1), not just spans small enough for IEEE doubles);
  min/max ride a 1-row broadcast join (the engine's standard
  scalar pattern), keeping the whole layout one lazy plan;
- **interleave**: ``z = Σ_i (((x>>i)&1) << 2i) + (((y>>i)&1) <<
  (2i+1))`` — a fixed sum of shift/mask terms, identical int64
  results in any engine, so a DuckDB oracle reproduces every code and
  every file assignment bit-for-bit;
- **cluster**: the file id is the TOP bits of z (``z >> (2*bits -
  file_bits)``) — a pure function of the row, reproducible across
  cluster sizes and engines, unlike sampled range partitioning.

Scale shape: one aggregate for the min/max scalars, one shuffle keyed
by file id (the write repartition) — no global sort. Z codes are
near-uniform when the scaled inputs are; heavy single-value skew
shows up as a hot file id and is the caller's salting decision, the
same as for any write partitioning.

Relationship to ``operators.maintenance.zorder_by``: that is the
N-dimensional rewrite variant (driver-collected bounds folded in as
literals, sampled range partitioning — right for a maintenance job).
This module is the fully-IN-PLAN two-dim form: bounds ride a 1-row
broadcast join and the file id is a pure function of the row, which
is what makes the layout reproducible across engines/cluster sizes
and lets q50's DuckDB oracle verify it value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scale_to_bits(v: Column, vmin: Column, vmax: Column, bits: int) -> Column:
    """Map ``v`` in [vmin, vmax] to integer [0, 2^bits).

    Exact integer floor-div (ADVICE r4, completed r6): Spark's ``div``
    operator (``IntegralDivide``) stays in int64 end to end, matching
    the oracle's ``//`` for the full domain bound
    ``(vmax - vmin) * (2^bits - 1) < 2^63``. (The previous
    ``(num - pmod(num, span)) / span`` still widened the exactly-
    divisible numerator to DOUBLE, so for num > 2^53 the rounded
    numerator could yield quotient-1 — ADVICE r5.)
    """
    span = F.greatest(vmax - vmin, F.lit(1)).cast("long")
    num = ((v - vmin).cast("long") * F.lit((1 << bits) - 1)).cast("long")
    return F.call_function("div", num, span)


def scale_to_bits_sql(v: str, vmin: str, vmax: str, bits: int) -> str:
    """DuckDB twin of :func:`scale_to_bits` (floor-div == truncation
    for the non-negative operands this is defined on)."""
    return (
        f"((({v}) - ({vmin})) * {(1 << bits) - 1})"
        f" // greatest(({vmax}) - ({vmin}), 1)"
    )


def zvalue(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton-interleave two ``bits``-bit non-negative ints."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(1), 2 * i)
        z = z + F.shiftleft(
            F.shiftright(y.cast("long"), i).bitwiseAND(1), 2 * i + 1
        )
    return z


def zvalue_sql(x: str, y: str, bits: int = 8) -> str:
    """DuckDB twin of :func:`zvalue`."""
    terms = []
    for i in range(bits):
        terms.append(f"(((({x}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({y}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zfile_id(z: Column, *, bits: int = 8, file_bits: int = 6) -> Column:
    """Deterministic file/bucket id: the top ``file_bits`` bits of z."""
    return F.shiftright(z.cast("long"), 2 * bits - file_bits)


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    *,
    bits: int = 8,
    file_bits: int = 4,
    fmt: str = "parquet",
) -> None:
    """Export ``df`` clustered by the Morton code of (x_col, y_col):
    one directory partition per z-file id, rows inside sorted by z so
    row-group stats nest inside the file stats. Columns must be
    numeric (cast dates to day numbers first)."""
    agg = df.agg(
        F.min(x_col).alias("_xmin"),
        F.max(x_col).alias("_xmax"),
        F.min(y_col).alias("_ymin"),
        F.max(y_col).alias("_ymax"),
    )
    scaled = df.crossJoin(F.broadcast(agg))
    z = zvalue(
        scale_to_bits(F.col(x_col), F.col("_xmin"), F.col("_xmax"), bits),
        scale_to_bits(F.col(y_col), F.col("_ymin"), F.col("_ymax"), bits),
        bits,
    )
    out = scaled.withColumn("_z", z).withColumn(
        "zfile", zfile_id(F.col("_z"), bits=bits, file_bits=file_bits)
    )
    (
        out.repartition("zfile")
        .sortWithinPartitions("_z")
        .drop("_xmin", "_xmax", "_ymin", "_ymax", "_z")
        .write.mode("overwrite")
        .partitionBy("zfile")
        .format(fmt)
        .save(path)
    )
