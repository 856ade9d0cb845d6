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


# ---------------------------------------------------------------------------
# hot-user skew guards (round-2 ADVICE task: one user owning 50% of events)
# ---------------------------------------------------------------------------


@pytest.fixture()
def hot_user_events(spark):
    """User 0 owns half of all events; 50 normal users share the rest.
    Timestamps spread over ~20 days so chunked sessionization has many
    chunks to parallelize the hot user across."""
    rows = []
    for i in range(500):
        rows.append(_ev(0, i * 0.9, ["view", "click", "purchase"][i % 3]))
    for u in range(1, 51):
        for i in range(10):
            rows.append(_ev(u, u + i * 2.5, ["view", "click", "purchase"][i % 3]))
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_salted_matches_plain(hot_user_events):
    steps = ["view", "click", "purchase"]
    plain = {r.step: (r.stage, r.n_users) for r in funnel(hot_user_events, steps).collect()}
    salted = {
        r.step: (r.stage, r.n_users)
        for r in funnel(hot_user_events, steps, skew="salt", salt_factor=8).collect()
    }
    assert salted == plain
    assert plain["view"][1] == 51  # every user views


def test_funnel_salt_spreads_hot_user(hot_user_events):
    """Plan-level evidence: the salted stage join hashes on (user, salt),
    so the hot user cannot land on a single shuffle partition."""
    df = funnel(hot_user_events, ["view", "click"], skew="salt", salt_factor=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__etl_salt" in plan


def test_funnel_rejects_unknown_skew(hot_user_events):
    with pytest.raises(ValueError, match="skew"):
        funnel(hot_user_events, ["view"], skew="shuffle")


def test_sessionize_scalable_matches_plain(hot_user_events):
    from etl_cli_spark.streaming.stream import sessionize, sessionize_scalable

    plain = {
        (r.user_id, r.ts, r.event_type): r.session_id
        for r in sessionize(hot_user_events, "ts", 30, "user_id").collect()
    }
    # chunk_hours=6 -> the hot user's 500 events span ~75 chunks
    chunked = {
        (r.user_id, r.ts, r.event_type): r.session_id
        for r in sessionize_scalable(
            hot_user_events, "ts", 30, "user_id", chunk_hours=6
        ).collect()
    }
    assert chunked == plain
    assert len(chunked) == hot_user_events.count()


def test_sessionize_scalable_sessions_cross_chunks(spark):
    """A single unbroken session spanning several chunk boundaries must
    keep ONE session id; a real gap inside one chunk must still split."""
    from etl_cli_spark.streaming.stream import sessionize_scalable

    rows = (
        # one event every 20 min for 10 hours -> one session over 10 chunks
        [(1, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=20 * i), "a") for i in range(30)]
        # same chunk, 2h gap -> two sessions
        + [(2, dt.datetime(2024, 1, 1, 0, 0), "a"), (2, dt.datetime(2024, 1, 1, 2, 0), "a")]
    )
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = sessionize_scalable(df, "ts", 30, "user_id", chunk_hours=1)
    u1 = {r.session_id for r in got.filter("user_id = 1").collect()}
    u2 = sorted(r.session_id for r in got.filter("user_id = 2").collect())
    assert u1 == {1}
    assert u2 == [1, 2]


def test_sessionize_scalable_partitions_by_chunk(hot_user_events):
    """Explain-level evidence: the event-level window partitions on
    (user, chunk), never on the bare user."""
    from etl_cli_spark.streaming.stream import sessionize_scalable

    df = sessionize_scalable(hot_user_events, "ts", 30, "user_id", chunk_hours=6)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "__chunk" in plan


def test_session_paths_hand_computed(spark):
    from etl_cli_spark.operators.events import session_paths

    rows = []
    # user 1: one session  view->click->buy->view  (ts 0,60,120,180 s)
    for i, t in enumerate(["view", "click", "buy", "view"]):
        rows.append((1, i, t, i * 60))
    # user 2: two sessions split by a 2h gap: view->click | view->click->buy
    for i, t in enumerate(["view", "click"]):
        rows.append((2, 10 + i, t, i * 60))
    for i, t in enumerate(["view", "click", "buy"]):
        rows.append((2, 20 + i, t, 7200 + 60 + i * 60))
    df = spark.createDataFrame(rows, "user_id long, event_id long, event_type string, sec long").selectExpr(
        "user_id", "event_id", "event_type", "timestamp_seconds(sec) AS ts"
    )
    got = {r.path: r.n_occurrences for r in session_paths(df, n=2).collect()}
    assert got["view > click"] == 3  # all three sessions
    assert got["click > buy"] == 2
    assert got["buy > view"] == 1
    trigrams = {r.path: r.n_occurrences for r in session_paths(df, n=3).collect()}
    assert trigrams["view > click > buy"] == 2  # the 2-event session contributes nothing


def test_attribution_last_and_first(spark):
    import datetime as dt

    from etl_cli_spark.operators.events import attribution

    base = dt.datetime(2024, 5, 1, 12, 0, 0)
    rows = [
        # user 1: view -> click -> purchase -> click -> purchase
        (1, base + dt.timedelta(minutes=0), 1, "view", 0.0, ""),
        (2, base + dt.timedelta(minutes=5), 1, "click", 0.0, ""),
        (3, base + dt.timedelta(minutes=9), 1, "purchase", 9.0, ""),
        (4, base + dt.timedelta(minutes=20), 1, "click", 0.0, ""),
        (5, base + dt.timedelta(minutes=30), 1, "purchase", 5.0, ""),
        # user 2: purchase with no prior touch
        (6, base, 2, "purchase", 1.0, ""),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    last = {r.event_id: r for r in attribution(ev, "purchase", model="last").collect()}
    assert last[3].attributed_event_id == 2 and last[3].attributed_type == "click"
    assert last[5].attributed_event_id == 4
    assert last[6].attributed_event_id is None
    first = {r.event_id: r for r in attribution(ev, "purchase", model="first").collect()}
    assert first[3].attributed_event_id == 1 and first[5].attributed_event_id == 1


def test_attribution_lookback_window(spark):
    import datetime as dt

    import pytest

    from etl_cli_spark.operators.events import attribution

    base = dt.datetime(2024, 5, 1, 12, 0, 0)
    rows = [
        (1, base, 1, "view", 0.0, ""),
        (2, base + dt.timedelta(hours=3), 1, "click", 0.0, ""),
        (3, base + dt.timedelta(hours=3, minutes=30), 1, "purchase", 1.0, ""),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    # 1h lookback: only the click is in range; the view is too old
    out = attribution(ev, "purchase", model="first", lookback_seconds=3600).collect()
    assert out[0].attributed_event_id == 2
    with pytest.raises(ValueError):
        attribution(ev, "purchase", model="bogus")


def test_attribution_lookback_same_second_ties_deterministic(spark):
    """Several touches inside the SAME epoch second: the RANGE frame
    admits them all, and the pick must be order-independent (max/min of
    the (epoch, id, type) struct), never physical row order — shuffling
    the input rows must not change the answer."""
    import datetime as dt

    from etl_cli_spark.operators.events import attribution

    base = dt.datetime(2024, 5, 1, 12, 0, 0)
    touches = [
        (eid, base, 1, typ, 0.0, "")
        for eid, typ in [(4, "view"), (2, "click"), (9, "scroll"), (7, "hover")]
    ]
    conv = [(100, base + dt.timedelta(seconds=30), 1, "purchase", 1.0, "")]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    for ordering in (touches + conv, list(reversed(touches)) + conv):
        ev = spark.createDataFrame(ordering, cols).repartition(8)
        last = attribution(ev, "purchase", model="last", lookback_seconds=60).collect()
        first = attribution(ev, "purchase", model="first", lookback_seconds=60).collect()
        assert last[0].attributed_event_id == 9  # max (epoch, id)
        assert first[0].attributed_event_id == 2  # min (epoch, id)
