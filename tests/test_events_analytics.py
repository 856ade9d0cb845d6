"""Funnel and retention-cohort analytics (operators/events.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from etl_cli_spark.operators.events import funnel, retention


def _ev(uid, t, typ):
    return (uid, dt.datetime(2024, 1, 1) + dt.timedelta(hours=t), typ)


@pytest.fixture()
def crafted(spark):
    rows = [
        # u1 converts fully in order
        _ev(1, 0, "view"), _ev(1, 1, "click"), _ev(1, 2, "purchase"),
        # u2: purchase BEFORE click -> stops at click stage
        _ev(2, 0, "view"), _ev(2, 2, "click"), _ev(2, 1, "purchase"),
        # u3: clicked but never viewed -> not even in stage 1
        _ev(3, 0, "click"), _ev(3, 1, "purchase"),
        # u4: view only
        _ev(4, 5, "view"),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_ordered_semantics(crafted):
    got = {r.step: (r.stage, r.n_users) for r in funnel(crafted, ["view", "click", "purchase"]).collect()}
    assert got == {"view": (1, 3), "click": (2, 2), "purchase": (3, 1)}


def test_funnel_requires_steps(crafted):
    with pytest.raises(ValueError, match="at least one"):
        funnel(crafted, [])


def test_retention_triangle(spark):
    rows = [
        _ev(1, 0, "view"), _ev(1, 24, "view"), _ev(1, 49, "view"),   # d0, d1, d2
        _ev(2, 24, "view"), _ev(2, 72, "view"),                      # cohort d1: d0, d2
        _ev(1, 1, "click"),                                          # same day dup: no double count
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {(str(r.cohort), r.day_offset): r.n_users for r in retention(df).collect()}
    assert got == {
        ("2024-01-01", 0): 1, ("2024-01-01", 1): 1, ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1, ("2024-01-02", 2): 1,
    }


def test_funnel_max_gap(crafted):
    # u1 converts view(0h) -> click(1h) -> purchase(2h); a 30-minute gap
    # cap breaks every transition, a 2-hour cap keeps them all
    tight = {r.step: r.n_users for r in funnel(
        crafted, ["view", "click", "purchase"], max_gap_seconds=1800
    ).collect()}
    loose = {r.step: r.n_users for r in funnel(
        crafted, ["view", "click", "purchase"], max_gap_seconds=7200
    ).collect()}
    assert tight == {"view": 3, "click": 0, "purchase": 0}
    assert loose == {"view": 3, "click": 2, "purchase": 1}
