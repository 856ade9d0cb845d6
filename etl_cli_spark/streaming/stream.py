"""Event-time windowing + streaming surface.

The reference has no native streaming (SURVEY §2.10); its closest
analogue is the contid micro-batch loop (incremental.py). The engine
still exposes the full Structured-Streaming-shaped surface over event
tables because in Spark these are built-ins: ``window`` /
``session_window`` / ``withWatermark``. The same window helpers work in
both batch (over the events fixture) and streaming (readStream) plans —
identical Catalyst expressions.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def _with_watermark(df: DataFrame, ts_col: str, watermark: str) -> DataFrame:
    """``withWatermark`` requires TIMESTAMP (ltz); parquet written with
    ``isAdjustedToUTC=false`` reads back as TIMESTAMP_NTZ, which Spark
    rejects as an event-time column (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE).
    Cast NTZ to the session-zone timestamp (UTC in the session factory)
    so every helper accepts either parquet timestamp encoding."""
    try:
        is_ntz = isinstance(df.schema[ts_col].dataType, TimestampNTZType)
    except KeyError:
        is_ntz = False
    if is_ntz:
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df.withWatermark(ts_col, watermark)


def tumbling(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_by: Sequence[str] = (),
    aggs: Mapping[str, str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling event-time window aggregation (batch or streaming df).

    Output exposes ``w_start``/``w_end`` as plain timestamp columns.
    """
    if watermark:
        df = _with_watermark(df, ts_col, watermark)
    exprs = [F.expr(e).alias(n) for n, e in dict(aggs).items()]
    out = df.groupBy(F.window(ts_col, duration), *group_by).agg(*exprs)
    return out.select(
        F.col("window.start").alias("w_start"),
        F.col("window.end").alias("w_end"),
        *group_by,
        *[F.col(n) for n in dict(aggs)],
    )


def sliding(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_by: Sequence[str] = (),
    aggs: Mapping[str, str] = (),
    watermark: str | None = None,
) -> DataFrame:
    if watermark:
        df = _with_watermark(df, ts_col, watermark)
    exprs = [F.expr(e).alias(n) for n, e in dict(aggs).items()]
    out = df.groupBy(F.window(ts_col, duration, slide), *group_by).agg(*exprs)
    return out.select(
        F.col("window.start").alias("w_start"),
        F.col("window.end").alias("w_end"),
        *group_by,
        *[F.col(n) for n in dict(aggs)],
    )


def session(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_by: Sequence[str] = (),
    aggs: Mapping[str, str] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Session windows (gap-based). Works on batch and streaming frames."""
    if watermark:
        df = _with_watermark(df, ts_col, watermark)
    exprs = [F.expr(e).alias(n) for n, e in dict(aggs).items()]
    out = df.groupBy(F.session_window(ts_col, gap), *group_by).agg(*exprs)
    return out.select(
        F.col("session_window.start").alias("w_start"),
        F.col("session_window.end").alias("w_end"),
        *group_by,
        *[F.col(n) for n in dict(aggs)],
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    gap_minutes: int,
    user_col: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Batch sessionization: lag + gap>threshold -> cumulative session id.

    The classic two-window pattern (no session_window needed in batch):
    mark rows starting a new session, then running-sum the marks.
    """
    from pyspark.sql.window import Window

    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    gap_s = gap_minutes * 60
    new_session = F.when(
        prev.isNull() | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)) > gap_s), 1
    ).otherwise(0)
    return df.withColumn("__new_s", new_session).withColumn(
        "session_id",
        F.sum("__new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("__new_s")


def sessionize_scalable(
    df: DataFrame,
    ts_col: str,
    gap_minutes: int,
    user_col: str,
    tiebreak: Sequence[str] = (),
    chunk_hours: int = 24,
) -> DataFrame:
    """Sessionize with hot-user skew protection. Same output contract as
    :func:`sessionize` (identical session ids).

    Plain ``sessionize`` windows over ``partitionBy(user)`` — a hot user
    owning half the events serializes half the table onto ONE task, and
    AQE cannot split a running window. Here the window partitions by
    (user, time-chunk), so a hot user's events spread over as many tasks
    as they span chunks; a boundary pass then stitches sessions that
    cross chunk edges:

    1. local pass — lag/cumsum windows over (user, chunk): every chunk's
       first event is tentatively a session start;
    2. per-chunk summary (one narrow row per (user, chunk): mark count +
       min/max ts) windowed per user ORDER BY chunk — tiny relative to
       the events;
    3. a chunk "connects" to its predecessor when the boundary gap is
       within threshold: its first tentative mark is retracted, shifting
       the chunk's local ids by -1; session_id = running corrected marks
       of prior chunks + local cumsum - connect.

    The per-user state that remains serial is one row per CHUNK, not per
    event — bounded by time range / chunk_hours regardless of event
    volume. Cost vs plain sessionize: one extra (user, chunk) shuffle
    for the summary join.
    """
    from pyspark.sql.window import Window

    gap_s = gap_minutes * 60
    chunk_s = chunk_hours * 3600
    ts_long = F.unix_timestamp(F.col(ts_col))
    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak]

    ev = df.withColumn("__chunk", F.floor(ts_long / F.lit(chunk_s)))
    wc = Window.partitionBy(user_col, "__chunk").orderBy(*order)
    prev = F.lag(ts_col).over(wc)
    local_mark = F.when(
        prev.isNull() | ((ts_long - F.unix_timestamp(prev)) > gap_s), 1
    ).otherwise(0)
    ev = ev.withColumn("__mark", local_mark).withColumn(
        "__local_id", F.sum("__mark").over(wc.rowsBetween(Window.unboundedPreceding, 0))
    )

    summary = ev.groupBy(user_col, "__chunk").agg(
        F.sum("__mark").alias("__n_marks"),
        F.min(ts_long).alias("__first"),
        F.max(ts_long).alias("__last"),
    )
    wu = Window.partitionBy(user_col).orderBy("__chunk")
    prev_last = F.lag("__last").over(wu)
    connect = F.when(
        prev_last.isNotNull() & ((F.col("__first") - prev_last) <= gap_s), 1
    ).otherwise(0)
    summary = summary.withColumn("__connect", connect).withColumn(
        "__prior",
        F.coalesce(
            F.sum(F.col("__n_marks") - F.col("__connect")).over(
                wu.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )

    out = ev.join(
        summary.select(user_col, "__chunk", "__connect", "__prior"),
        [user_col, "__chunk"],
    ).withColumn(
        "session_id", F.col("__prior") + F.col("__local_id") - F.col("__connect")
    )
    return out.drop("__chunk", "__mark", "__local_id", "__connect", "__prior")


def stream_events(
    spark,
    path: str,
    schema,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
):
    """readStream over a parquet directory (file-based micro-batching)."""
    return _with_watermark(
        spark.readStream.schema(schema).parquet(path), ts_col, watermark
    )


def stateful_running_totals(
    stream_df: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Custom stateful streaming operator: per-key running (count, sum)
    maintained across micro-batches via ``applyInPandasWithState``.

    The reference has no streaming at all (SURVEY §2.10); this is the
    engine's template for operators Spark's built-in windows can't
    express — arbitrary per-key state, Arrow-batched (pandas) per group.
    Emits one row per key per micro-batch with the cumulative totals.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = f"{key_col} long, n long, total double"
    state_schema = "n long, total double"

    def fn(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [total]})

    return stream_df.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_dedup(
    stream_df: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
) -> DataFrame:
    """Streaming exact dedup: first occurrence of each key wins across
    micro-batches.

    With ``ts_col`` (requires a watermark upstream, e.g. from
    ``stream_events``), state for a key is dropped once the watermark
    passes it — ``dropDuplicatesWithinWatermark`` — so state stays
    bounded at 100 TB/day ingest: the dedup window is the watermark, not
    forever. Without ``ts_col`` the state grows with distinct keys
    (exactly-once over the whole stream; only for bounded key spaces).
    """
    if ts_col is not None:
        return stream_df.dropDuplicatesWithinWatermark(keys)
    return stream_df.dropDuplicates(keys)


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a streaming query to completion over the currently-available
    input (local smoke path): memory sink + processAllAvailable."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-stream event-time interval join: match right-side rows to
    left-side rows with the same ``on`` key whose timestamp falls in
    [left_ts + lower, left_ts + upper] — "attach the purchase that
    happened within an hour of the click", continuously.

    Both sides get the watermark (required: Spark bounds each side's
    join state with the watermark + the time-range condition, so state
    is dropped once no future match is possible — without the interval
    bound a stream-stream join's state grows forever). ``how`` supports
    inner and left_outer (outer emits non-matches only after the
    watermark closes their window — the documented Structured Streaming
    contract). Right-side non-key columns are prefixed to avoid
    collisions. The same plan works in batch (the oracle shape: a plain
    range equi+theta join).

    Scale: the join shuffles both streams on the key; state per key is
    bounded by (upper - lower + watermark) of event time, so sizing the
    interval IS sizing the state store.
    """
    lw = _with_watermark(left, left_ts, watermark)
    rw = _with_watermark(right, right_ts, watermark)
    # prefix EVERY right column, the key included: an outer join must
    # not return two same-named key columns (AMBIGUOUS_REFERENCE for
    # any downstream select); inner mode drops the redundant copy
    rw = rw.select(*[F.col(c).alias(f"{right_prefix}{c}") for c in rw.columns])
    r_on, r_ts = f"{right_prefix}{on}", f"{right_prefix}{right_ts}"
    cond = (
        (lw[on] == rw[r_on])
        & (F.col(r_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower}"))
        & (F.col(r_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    joined = lw.join(rw, cond, how)
    return joined.drop(r_on) if how == "inner" else joined
