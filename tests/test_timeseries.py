"""Regular-grid resampling with gap filling (operators/timeseries.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_cli_spark.operators.timeseries import resample, time_bucket


@pytest.fixture()
def series(spark):
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    # key "a": observations in minutes 0, 1, 5 (gap at 2, 3, 4)
    for m, v in [(0, 10.0), (1, 20.0), (5, 50.0)]:
        rows.append(("a", base + dt.timedelta(minutes=m), v))
    # key "b": single observation — grid must be exactly one bucket
    rows.append(("b", base + dt.timedelta(minutes=2), 7.0))
    return spark.createDataFrame(rows, ["k", "ts", "v"])


def test_resample_fills_gaps(spark, series):
    out = resample(
        series, "ts", 60, by=["k"],
        aggs={"n": "count(*)", "s": "sum(v)"},
        fill={"n": "zero", "s": "ffill"},
    )
    rows = {(r.k, r.w_start.minute): r for r in out.collect()}
    assert len(rows) == 7  # a: minutes 0..5 (6 buckets), b: 1 bucket
    assert rows[("a", 2)].n == 0 and rows[("a", 2)].is_gap
    assert rows[("a", 2)].s == 20.0  # forward-filled from minute 1
    assert rows[("a", 5)].s == 50.0 and not rows[("a", 5)].is_gap
    assert rows[("b", 2)].n == 1 and not rows[("b", 2)].is_gap


def test_resample_keys_keep_own_range(spark, series):
    out = resample(series, "ts", 60, by=["k"]).collect()
    b_rows = [r for r in out if r.k == "b"]
    assert len(b_rows) == 1  # b never inherits a's span


def test_resample_constant_and_null_fill(spark, series):
    out = resample(
        series, "ts", 60, by=["k"],
        aggs={"n": "count(*)", "s": "sum(v)"},
        fill={"s": -1.0},  # n left null on gaps
    )
    gap = next(r for r in out.collect() if r.k == "a" and r.w_start.minute == 3)
    assert gap.s == -1.0 and gap.n is None and gap.is_gap


def test_resample_no_groups(spark, series):
    out = resample(series.drop("k"), "ts", 120, aggs={"n": "count(*)"}, fill={"n": "zero"})
    rows = sorted((r.w_start.minute, r.n) for r in out.collect())
    assert rows == [(0, 2), (2, 1), (4, 1)]


def test_resample_null_agg_in_present_bucket_not_a_gap(spark):
    """A present bucket whose FIRST user aggregate is legitimately NULL
    (max over an all-NULL column) must not be flagged is_gap, and fills
    must not overwrite its genuine NULL — gap detection rides an
    internal count(*) marker, never the user aggregates."""
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        ("a", base + dt.timedelta(minutes=0), 10.0),
        ("a", base + dt.timedelta(minutes=1), None),  # present, all-NULL v
        ("a", base + dt.timedelta(minutes=3), 30.0),  # minute 2 is a real gap
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = resample(
        df, "ts", 60, by=["k"],
        aggs={"m": "max(v)", "n": "count(*)"},
        fill={"m": "ffill", "n": "zero"},
    )
    got = {r.w_start.minute: r for r in out.collect()}
    assert not got[1].is_gap and got[1].n == 1
    assert got[1].m is None  # genuine NULL survives the ffill directive
    assert got[2].is_gap and got[2].n == 0
    assert got[2].m == 10.0  # gap forward-fills the last NON-NULL value


def test_resample_grid_guard(spark, series):
    with pytest.raises(Exception, match="max_buckets_per_key"):
        resample(series, "ts", 1, by=["k"], max_buckets_per_key=10).collect()


def test_resample_rejects_bad_args(spark, series):
    with pytest.raises(ValueError):
        resample(series, "ts", 0)
    with pytest.raises(ValueError):
        resample(series, "ts", 60, aggs={"n": "count(*)"}, fill={"missing": "zero"})


def test_time_bucket_on_ntz(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, 30, 29),)], ["ts"]
    ).select(F.col("ts").cast("timestamp_ntz").alias("ts"))
    b = df.select(time_bucket("ts", 1800).alias("b")).first()["b"]
    assert b == int(dt.datetime(2024, 1, 1, 0, 30, tzinfo=dt.timezone.utc).timestamp())
