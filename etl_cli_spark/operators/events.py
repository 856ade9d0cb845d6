"""Event-sequence analytics: funnels and retention cohorts.

Beyond the reference's surface (its events are just rows to move); these
are the standard product-analytics queries over an event stream, shaped
for Spark:

- funnel: per-step ordered-conversion via min-timestamp-after-previous
  joins — every join is a per-user equi-join (shuffle on user_id only),
  never a sequence scan of the whole stream per step;
- retention: two aggregations over (user, day) pairs; the wide exchange
  carries (user_id, date) pairs, not events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap_seconds: int | None = None,
    skew: str | None = None,
    salt_factor: int = 16,
) -> DataFrame:
    """Ordered conversion funnel: users who did step1, then step2 AFTER
    their first step1, then step3 after that first step2, ...

    ``max_gap_seconds`` additionally requires each step to happen within
    that many seconds of the previous stage's qualifying event (the
    "converted within an hour" product question); None = unbounded.

    Returns (step, stage, n_users) with stage = 1-based position.
    "First occurrence after the previous stage's first occurrence" is
    the deterministic textbook semantics (no windowing ambiguity), and
    each stage is one filtered aggregate + one equi-join on the user.

    Skew: the per-stage groupBys are safe under hot users (map-side
    partial aggregation combines a hot user's events before the
    shuffle), but the events-side of each stage JOIN hashes on user_id —
    a user owning half the events lands on one task in a plain
    sort-merge join. AQE's skew-join split (on in the engine session)
    covers that at runtime; ``skew='salt'`` forces it deterministically
    via :func:`etl_cli_spark.operators.skew.salted_join`, spreading each
    hot user over ``salt_factor`` tasks (the per-user stage frame is
    replicated salt_factor times — it is one narrow row per user).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    if skew not in (None, "salt"):
        raise ValueError(f"skew must be None or 'salt', got {skew!r}")
    stages: list[tuple[str, DataFrame]] = []
    prev: DataFrame | None = None
    for step in steps:
        ev = df.filter(F.col(type_col) == step)
        if prev is None:
            cur = ev.groupBy(user_col).agg(F.min(ts_col).alias("__t"))
        else:
            after_prev = F.col(ts_col) > F.col("__pt")
            if max_gap_seconds is not None:
                after_prev = after_prev & (
                    F.unix_timestamp(F.col(ts_col))
                    - F.unix_timestamp(F.col("__pt"))
                    <= max_gap_seconds
                )
            prev_sel = prev.select(user_col, F.col("__t").alias("__pt"))
            if skew == "salt":
                from .skew import salted_join

                joined = salted_join(ev, prev_sel, user_col, "inner", salt_factor)
            else:
                joined = ev.join(prev_sel, user_col)
            cur = (
                joined.filter(after_prev)
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("__t"))
            )
        stages.append((step, cur))
        prev = cur
    spark = df.sparkSession
    out = None
    for i, (step, cur) in enumerate(stages):
        row = cur.agg(
            F.lit(step).alias("step"),
            F.lit(i + 1).alias("stage"),
            F.count(F.lit(1)).alias("n_users"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: users grouped by first-activity day; for each
    (cohort_day, day_offset) the count of distinct users active then.

    Classic triangle table. Two shuffles total: the distinct (user, day)
    projection and the cohort join+agg — both over narrow key pairs.
    """
    day = F.to_date(F.col(ts_col))
    first = df.groupBy(user_col).agg(F.min(day).alias("cohort"))
    active = df.select(F.col(user_col), day.alias("__day")).distinct()
    return (
        active.join(first, user_col)
        .groupBy(
            "cohort",
            F.datediff(F.col("__day"), F.col("cohort")).cast("long").alias("day_offset"),
        )
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def session_paths(
    df: DataFrame,
    n: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    gap_minutes: int = 30,
    top_k: int = 20,
    sep: str = " > ",
    distinct_per_session: bool = False,
) -> DataFrame:
    """Top event-type paths: the most common length-``n`` step sequences
    inside sessions (flow analysis — "view > click > purchase").

    Plan: sessionize (one window per user), collect each session's
    ordered type sequence (array_sort over (ts, id, type) structs — the
    per-session array, bounded by session length, never the user's full
    history), slide an n-gram window over it (narrow explode), count.
    The heavy exchange carries (path, 1) pairs; sessions with fewer than
    ``n`` events contribute nothing.

    The count is OCCURRENCES: a path repeated inside one session counts
    each time (``n_occurrences``). Pass ``distinct_per_session=True`` to
    count each path at most once per session instead (array_distinct on
    the per-session gram list before exploding).
    """
    from ..streaming.stream import sessionize

    s = sessionize(df, ts_col, gap_minutes, user_col, tiebreak=(id_col,))
    seq = (
        s.groupBy(user_col, "session_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(ts_col, id_col, type_col))
            ).alias("__evs")
        )
        .select(F.transform("__evs", lambda e: e[type_col]).alias("__types"))
    )
    count = F.size("__types") - F.lit(n - 1)
    grams = F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.array_join(F.slice("__types", i, n), sep),
        ),
    ).otherwise(F.array().cast("array<string>"))
    if distinct_per_session:
        grams = F.array_distinct(grams)
    return (
        seq.select(F.explode(grams).alias("path"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "path")
        .limit(top_k)
    )


def attribution(
    df: DataFrame,
    conversion: str,
    model: str = "last",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    lookback_seconds: int | None = None,
) -> DataFrame:
    """Single-touch attribution: for every ``conversion`` event, the
    non-conversion event of the same user that gets the credit —
    ``model="last"`` (last touch strictly before the conversion) or
    ``"first"`` (first touch, optionally within ``lookback_seconds``).

    One window over (user, time): the prior-touch lookup is
    ``last/first(ignorenulls)`` over a frame ending one row (or the
    lookback range) before the conversion — the event stream shuffles
    once on ``user_col`` and never self-joins. Conversions with no
    prior touch attribute to NULL (visible, not dropped).

    Returns (id_col, user_col, conv_ts, attributed_event_id,
    attributed_type).
    """
    from pyspark.sql.window import Window

    if model not in ("last", "first"):
        raise ValueError("attribution model must be 'last' or 'first'")
    epoch = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    touch = F.when(
        F.col(type_col) != conversion,
        F.struct(F.col(id_col).alias("i"), F.col(type_col).alias("t")),
    )
    if lookback_seconds is None:
        w = (
            Window.partitionBy(user_col)
            .orderBy(epoch, F.col(id_col))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        pick = (
            F.last(touch, ignorenulls=True)
            if model == "last"
            else F.first(touch, ignorenulls=True)
        )
    else:
        # RANGE frame allows only one numeric sort key, so same-second
        # touches have no defined physical order — last()/first() would be
        # nondeterministic across shuffles. max/min over a struct ordered
        # as (epoch, id, type) is order-independent: the frame membership
        # is set by epoch alone, the winner by the full lexicographic key.
        w = (
            Window.partitionBy(user_col)
            .orderBy(epoch)
            .rangeBetween(-int(lookback_seconds), -1)
        )
        ordered = F.when(
            F.col(type_col) != conversion,
            F.struct(
                epoch.alias("e"),
                F.col(id_col).alias("i"),
                F.col(type_col).alias("t"),
            ),
        )
        picked = (F.max if model == "last" else F.min)(ordered).over(w)
    if lookback_seconds is not None:
        out = (
            df.withColumn("__touch", picked)
            .filter(F.col(type_col) == conversion)
            .select(
                F.col(id_col),
                F.col(user_col),
                F.col(ts_col).alias("conv_ts"),
                F.col("__touch.i").alias("attributed_event_id"),
                F.col("__touch.t").alias("attributed_type"),
            )
        )
        return out
    out = (
        df.withColumn("__touch", pick.over(w))
        .filter(F.col(type_col) == conversion)
        .select(
            F.col(id_col),
            F.col(user_col),
            F.col(ts_col).alias("conv_ts"),
            F.col("__touch.i").alias("attributed_event_id"),
            F.col("__touch.t").alias("attributed_type"),
        )
    )
    return out
