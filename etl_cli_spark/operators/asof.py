"""As-of and range (interval) joins — operators Spark's API lacks.

The reference has neither (its merger is a pure equi-join, SURVEY §2.4),
but any event/market/telemetry pipeline needs them, so the engine ships
both as compositions of built-in DataFrame ops:

- ``asof_join``: the union-marker pattern — one shuffle+sort, NO range
  explosion: union both sides with a side marker, sort by (key, ts,
  side) so right rows precede left rows at equal timestamps, then a
  running ``last(ignorenulls)`` carries the most recent right values
  onto each left row. Exactly one output row per left row, any key
  cardinality, O(n log n) within partitions.
- ``interval_join``: bucketed range join — both sides map to coarse
  time buckets (the right side explodes one row per overlapped bucket),
  equi-join on (key, bucket) — a shuffle Catalyst can plan — then the
  exact range predicate refines. Never a cross/theta join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SIDE, _TS = "__asof_side", "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str | None = None,
    rsuffix: str = "",
) -> DataFrame:
    """For each left row, values from the latest right row with
    ``right_ts <= left_ts`` (backward as-of, inclusive — DuckDB/pandas
    ``merge_asof`` semantics). Unmatched left rows keep nulls.

    ``rsuffix`` renames carried right columns that collide with left's.
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    rvals = [c for c in right.columns if c not in keys and c != right_ts]
    collisions = [c for c in rvals if c in left.columns]
    if collisions and not rsuffix:
        # an empty suffix would emit duplicate column names, making every
        # downstream name-based select ambiguous
        raise ValueError(
            f"asof_join: right columns {collisions} collide with left; "
            f"pass rsuffix (e.g. rsuffix='_right') to disambiguate"
        )
    out_names = {c: (f"{c}{rsuffix}" if c in left.columns else c) for c in rvals}

    l = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias(_SIDE),
        F.col(left_ts).alias(_TS),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rvals],
    )
    r = right.select(
        *[F.col(k) for k in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in keys],
        F.lit(0).alias(_SIDE),
        F.col(right_ts).alias(_TS),
        *[F.col(c).alias(f"__r_{c}") for c in rvals],
    )
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*", *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}") for c in rvals]
    )
    return filled.filter(F.col(_SIDE) == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__f_{c}").alias(out_names[c]) for c in rvals],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    start_col: str,
    end_col: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """Rows where ``left_ts`` falls in right's ``[start_col, end_col]``
    (inclusive), equi-matched on ``on``. One output row per matching
    (left row, interval) pair.

    ``bucket`` sizes the coarse time grid; pick ~the typical interval
    length so each interval explodes to O(1) buckets.
    """
    keys = [on] if isinstance(on, str) else list(on)
    secs = _parse_duration_seconds(bucket)
    lb = left.withColumn("__bkt", (F.unix_timestamp(F.col(left_ts)) / secs).cast("long"))
    rb = right.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / secs).cast("long"),
                (F.unix_timestamp(F.col(end_col)) / secs).cast("long"),
            )
        ),
    )
    joined = lb.join(rb, on=keys + ["__bkt"], how="inner").drop("__bkt")
    return joined.filter(
        (F.col(left_ts) >= F.col(start_col)) & (F.col(left_ts) <= F.col(end_col))
    )


def _parse_duration_seconds(s: str) -> int:
    n, _, unit = s.strip().partition(" ")
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
            "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}
    if unit not in mult:
        raise ValueError(f"bucket must be '<n> second|minute|hour|day[s]', got {s!r}")
    return int(n) * mult[unit]
