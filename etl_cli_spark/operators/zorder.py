"""Z-order (Morton-curve) multi-column clustering.

``sort_by`` clustering gives tight parquet min/max stats on the LEADING
sort column only — a range predicate on the second column still touches
every file. Z-ordering interleaves the bits of several columns into one
Morton code and lays rows out along that curve, so every z-ordered
column gets partially-tight per-file/row-group stats and a
multi-dimension box predicate skips most of the table (the technique
behind Delta/Iceberg OPTIMIZE ZORDER, re-expressed as plain Spark
expressions — no table format required; parquet row-group pruning does
the skipping).

Mechanics (all JVM-side Column expressions, no UDFs):

1. one stats pass computes min/max per z column (the only extra scan);
2. each value scales linearly to an integer in [0, 2^bits);
3. bits interleave into a long z-value (``sum(bit_i << (i*k + j))``);
4. ``repartitionByRange`` on the z-value gives files DISJOINT z-ranges
   (the global layout — within-task sorting alone cannot do this),
   then ``sortWithinPartitions`` orders rows inside each file.

Linear min/max scaling is skew-sensitive (one outlier squashes the
range); pass explicit ``ranges`` to pin quantization, e.g. from known
domain bounds or approx quantiles. Supported types: numerics, dates,
timestamps.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_double(df: DataFrame, col: str) -> Column:
    dt = df.schema[col].dataType
    if isinstance(dt, T.DateType):
        return F.col(col).cast("timestamp").cast("double")
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.col(col).cast("double")
    if isinstance(dt, T.NumericType):
        return F.col(col).cast("double")
    raise TypeError(f"zorder column {col!r} has unsupported type {dt.simpleString()}")


def compute_ranges(df: DataFrame, cols: Sequence[str]) -> dict[str, tuple[float, float]]:
    """min/max quantization bounds per column, one aggregate pass.
    Persist these alongside a z-ordered table so later incremental
    writes can cluster with the SAME quantization without re-scanning."""
    aggs = []
    for c in cols:
        aggs += [F.min(_as_double(df, c)).alias(f"__mn_{c}"),
                 F.max(_as_double(df, c)).alias(f"__mx_{c}")]
    row = df.agg(*aggs).first()
    out = {}
    for c in cols:
        mn, mx = row[f"__mn_{c}"], row[f"__mx_{c}"]
        out[c] = (mn if mn is not None else 0.0, mx if mx is not None else 0.0)
    return out


def zorder_col(
    df: DataFrame,
    cols: Sequence[str],
    bits: int | None = None,
    ranges: Mapping[str, tuple[float, float]] | None = None,
) -> Column:
    """The Morton-code Column for ``cols`` (nulls sort first: code 0).

    ``bits`` per column defaults to the most that fit a signed long
    (63 // n_cols, capped at 16). ``ranges`` overrides the min/max
    quantization bounds per column; missing ones are computed in one
    aggregate over ``df``.
    """
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns (use sort_by for one)")
    if bits is None:
        bits = min(16, 63 // len(cols))
    if bits * len(cols) > 63:
        raise ValueError(f"{bits} bits x {len(cols)} cols overflows a long")
    ranges = dict(ranges or {})
    need = [c for c in cols if c not in ranges]
    if need:
        ranges.update(compute_ranges(df, need))

    k, top = len(cols), (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        mn, mx = ranges[c]
        span = (mx - mn) or 1.0
        scaled = F.floor((_as_double(df, c) - F.lit(mn)) / F.lit(span) * F.lit(float(top)))
        scaled = F.greatest(F.lit(0), F.least(F.lit(top), scaled))  # clamp out-of-range
        scaled = F.coalesce(scaled, F.lit(0)).cast("long")
        for i in range(bits):
            bit = F.shiftright(scaled, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return z


def zorder_frame(
    df: DataFrame,
    cols: Sequence[str],
    num_partitions: int | None = None,
    bits: int | None = None,
    ranges: Mapping[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """``df`` laid out along the Morton curve: range-partitioned on the
    z-value (disjoint z-ranges per output file) and sorted within each
    partition. Write the result as-is to get a z-clustered table."""
    z = zorder_col(df, cols, bits=bits, ranges=ranges)
    tagged = df.withColumn("__z", z)
    parted = (
        tagged.repartitionByRange(num_partitions, "__z")
        if num_partitions
        else tagged.repartitionByRange("__z")
    )
    return parted.sortWithinPartitions("__z").drop("__z")
