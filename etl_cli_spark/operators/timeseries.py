"""Time-series resampling with gap filling.

Beyond the reference's surface (the reference aggregates only rows that
exist — reference `base.py` query paths have no notion of an empty
bucket): regular-grid resampling emits a row for EVERY step between each
key's first and last observation, with configurable fill (zero /
forward-fill / constant / null) for the empty buckets — the shape
dashboards, anomaly detectors, and model feature pipelines need.

Scale shape: one groupBy on (key, bucket) with map-side combine, one
tiny per-key extent aggregate, a distributed ``sequence``+``explode``
grid (never a driver loop), one broadcast-friendly left join back, and
one per-key ordered window for forward fill. A runaway grid (huge span
/ tiny step) fails the job via a JVM-side guard instead of silently
exploding executors.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def time_bucket(ts_col: Column | str, step_seconds: int) -> Column:
    """Epoch-second bucket start (bigint): floor(epoch / step) * step.

    ``cast("timestamp")`` first, so TIMESTAMP_NTZ parquet columns work
    (session timezone is UTC in the session factory); ``unix_timestamp``
    truncates sub-second parts, which is floor for post-1970 data."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    step = int(step_seconds)
    epoch = F.unix_timestamp(c.cast("timestamp"))
    return F.floor(epoch / step).cast("bigint") * step


def resample(
    df: DataFrame,
    ts_col: str,
    step_seconds: int,
    by: Sequence[str] = (),
    aggs: Mapping[str, str] | None = None,
    fill: Mapping[str, object] | None = None,
    max_buckets_per_key: int = 2_000_000,
) -> DataFrame:
    """Aggregate onto a regular time grid and fill the gaps.

    - ``aggs``: out_col -> SQL aggregate expression (the
      :func:`~etl_cli_spark.streaming.stream.tumbling` convention),
      default ``{"n": "count(*)"}``.
    - ``fill``: out_col -> ``"ffill"`` (last non-null earlier bucket),
      ``"zero"``, a constant, or absent (stay null). Empty buckets are
      flagged ``is_gap = true`` either way. Fills apply ONLY to gap
      rows: a bucket that exists but whose aggregate is genuinely NULL
      (e.g. ``max(v)`` over all-NULL ``v``) keeps its NULL — gap
      detection rides an internal ``count(*)`` marker, never the user
      aggregates, so an all-NULL first aggregate cannot misflag a
      present bucket as a gap.
    - Grid rows run from each key's first to last bucket; keys never
      invent each other's range. ``max_buckets_per_key`` bounds the
      sequence length JVM-side (``assert_true``) so a mis-typed step
      fails the job instead of materializing a billion-row grid.

    Returns (by..., w_start timestamp, aggs..., is_gap).
    """
    step = int(step_seconds)
    if step <= 0:
        raise ValueError("resample needs step_seconds > 0")
    aggs = dict(aggs or {"n": "count(*)"})
    fill = dict(fill or {})
    for c in fill:
        if c not in aggs:
            raise ValueError(f"fill column {c!r} is not an output aggregate")
    grp = list(by)
    # __present is the gap marker: count(*) is non-NULL for every bucket
    # that has ANY source row, independent of what the user aggregates
    # compute (their first agg may be legitimately NULL in a present
    # bucket, e.g. max over an all-NULL column).
    agged = (
        df.withColumn("__bk", time_bucket(ts_col, step))
        .groupBy(*grp, "__bk")
        .agg(
            F.count(F.lit(1)).alias("__present"),
            *[F.expr(e).alias(c) for c, e in aggs.items()],
        )
    )
    extent = agged.groupBy(*grp).agg(
        F.min("__bk").alias("__lo"), F.max("__bk").alias("__hi")
    )
    n_buckets = (F.col("__hi") - F.col("__lo")) / F.lit(step) + 1
    guarded = extent.filter(
        F.coalesce(
            F.assert_true(
                n_buckets <= F.lit(int(max_buckets_per_key)),
                F.lit(
                    "resample grid exceeds max_buckets_per_key="
                    f"{max_buckets_per_key}; check step_seconds"
                ),
            ).cast("boolean"),
            F.lit(True),
        )
    )
    grid = guarded.select(
        *grp,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step))
        ).alias("__bk"),
    )
    joined = grid.join(agged, [*grp, "__bk"], "left")
    out_cols: list[Column] = [F.col(c) for c in grp]
    out_cols.append(F.timestamp_seconds(F.col("__bk")).alias("w_start"))
    w = (
        Window.partitionBy(*grp)
        .orderBy("__bk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_gap = F.col("__present").isNull()
    for c in aggs:
        how = fill.get(c)
        col = F.col(c)
        if how == "ffill":
            col = F.when(is_gap, F.last(col, ignorenulls=True).over(w)).otherwise(col)
        elif how == "zero":
            col = F.when(is_gap, F.lit(0)).otherwise(col)
        elif how is not None:
            col = F.when(is_gap, F.lit(how)).otherwise(col)
        out_cols.append(col.alias(c))
    out_cols.append(is_gap.alias("is_gap"))
    return joined.select(*out_cols)
