from __future__ import annotations

from pyspark.sql import functions as F

from etl_cli_spark.operators.asof import asof_join, interval_join


def _ts(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    for c, t in [(f.name, f.dataType.simpleString()) for f in df.schema.fields]:
        if c.endswith("_s"):
            df = df.withColumn(c[:-2], F.to_timestamp(c)).drop(c)
    return df


def test_asof_join_backward_inclusive(spark):
    trades = _ts(spark, [
        (1, "2024-01-01 10:00:05", 100.0),
        (1, "2024-01-01 10:00:00", 99.0),   # exactly at a quote ts
        (1, "2024-01-01 09:00:00", 98.0),   # before any quote
        (2, "2024-01-01 10:00:10", 50.0),
    ], ["sym", "ts_s", "px"])
    quotes = _ts(spark, [
        (1, "2024-01-01 10:00:00", 1.0),
        (1, "2024-01-01 10:00:04", 2.0),
        (1, "2024-01-01 10:00:06", 3.0),
        (2, "2024-01-01 10:00:01", 9.0),
    ], ["sym", "ts_s", "bid"])

    out = asof_join(trades, quotes, on="sym", left_ts="ts")
    got = {(r.sym, str(r.ts)): r.bid for r in out.collect()}
    assert out.count() == trades.count()  # exactly one row per left row
    assert got[(1, "2024-01-01 10:00:05")] == 2.0   # latest quote <= ts
    assert got[(1, "2024-01-01 10:00:00")] == 1.0   # inclusive at equality
    assert got[(1, "2024-01-01 09:00:00")] is None  # no earlier quote
    assert got[(2, "2024-01-01 10:00:10")] == 9.0


def test_asof_join_suffix_on_collision(spark):
    l = _ts(spark, [(1, "2024-01-01 00:00:01", 5.0)], ["k", "ts_s", "v"])
    r = _ts(spark, [(1, "2024-01-01 00:00:00", 7.0)], ["k", "ts_s", "v"])
    out = asof_join(l, r, on="k", left_ts="ts", rsuffix="_r")
    row = out.first()
    assert row.v == 5.0 and row.v_r == 7.0


def test_interval_join(spark):
    events = _ts(spark, [
        (1, "2024-01-01 10:30:00", "a"),
        (1, "2024-01-01 13:00:00", "b"),
        (2, "2024-01-01 10:30:00", "c"),
    ], ["uid", "ts_s", "tag"])
    windows = _ts(spark, [
        (1, "2024-01-01 10:00:00", "2024-01-01 11:00:00", "w1"),
        (1, "2024-01-01 12:00:00", "2024-01-01 12:59:00", "w2"),
        (2, "2024-01-01 00:00:00", "2024-01-02 00:00:00", "w3"),
    ], ["uid", "start_s", "end_s", "wname"])

    out = interval_join(events, windows, on="uid", left_ts="ts",
                        start_col="start", end_col="end", bucket="1 hour")
    got = {(r.tag, r.wname) for r in out.collect()}
    assert got == {("a", "w1"), ("c", "w3")}  # 'b' misses w2 by a minute


def test_interval_join_matches_plain_theta(spark, engine):
    # cross-check the bucketed plan against the naive theta join on real data
    ev = engine.read("events", ["_fields=user_id,ts,event_id"])
    iv = (
        engine.read("events", ["event_type=purchase", "_fields=user_id,ts"])
        .withColumn("start", F.col("ts") - F.expr("INTERVAL 30 MINUTES"))
        .withColumnRenamed("ts", "end").select("user_id", "start", "end")
    )
    fast = interval_join(ev, iv, on="user_id", left_ts="ts",
                         start_col="start", end_col="end", bucket="30 minutes")
    naive = ev.join(iv, "user_id").filter((F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end")))
    assert fast.count() == naive.count()
