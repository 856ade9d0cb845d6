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
        df = df.withWatermark(ts_col, watermark)
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
        df = df.withWatermark(ts_col, watermark)
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
        df = df.withWatermark(ts_col, watermark)
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


def stream_events(
    spark,
    path: str,
    schema,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
):
    """readStream over a parquet directory (file-based micro-batching)."""
    return spark.readStream.schema(schema).parquet(path).withWatermark(ts_col, watermark)


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
