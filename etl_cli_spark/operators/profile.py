"""Column-level dataset profiling: the `info` pre-flight grown into a
real stats pass (null rates, cardinalities, ranges, lengths).

The reference's `--info` prints schema + count (base.py); pipelines
deciding whether a dataset is join-able/dedup-able/partition-able need
per-column facts. One pass over the data: every statistic is packed
into a single aggregate row (Catalyst evaluates all columns' aggregates
in one scan with map-side partials), then unpacked driver-side into one
row per column — the collect is exactly ONE row however wide the table.

``exact=False`` (default) uses HLL ``approx_count_distinct`` for
cardinalities — the right choice at 100 TB where exact distinct per
column would add a shuffle per column; ``exact=True`` computes exact
distincts (oracle-replayable, fine at test scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, exact: bool = False) -> DataFrame:
    """(column, dtype, n_rows, n_nonnull, n_distinct, min, max,
    avg_len) — one row per column, computed in one scan.

    min/max/avg_len are over the column's STRING form (portable across
    types; avg_len rounded to 6). Deterministic given ``exact=True``.
    """
    spark = df.sparkSession
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for f in df.schema.fields:
        c, name = F.col(f"`{f.name}`"), f.name
        s = c.cast("string")
        distinct = (
            F.count_distinct(c) if exact else F.approx_count_distinct(c)
        )
        aggs += [
            F.count(c).alias(f"__nn_{name}"),
            distinct.alias(f"__nd_{name}"),
            # min/max in the column's NATIVE order (numeric/temporal),
            # cast to string only for the portable output row
            F.min(c).cast("string").alias(f"__min_{name}"),
            F.max(c).cast("string").alias(f"__max_{name}"),
            F.round(F.avg(F.length(s)), 6).alias(f"__len_{name}"),
        ]
    row = df.agg(*aggs).collect()[0].asDict()
    out = [
        (
            f.name,
            f.dataType.simpleString(),
            row["__n"],
            row[f"__nn_{f.name}"],
            row[f"__nd_{f.name}"],
            row[f"__min_{f.name}"],
            row[f"__max_{f.name}"],
            float(row[f"__len_{f.name}"]) if row[f"__len_{f.name}"] is not None else None,
        )
        for f in df.schema.fields
    ]
    return spark.createDataFrame(
        out,
        "column string, dtype string, n_rows long, n_nonnull long, "
        "n_distinct long, min string, max string, avg_len double",
    )
