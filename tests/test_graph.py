"""PageRank (operators/graph.py)."""

from __future__ import annotations

import pytest

from etl_cli_spark.operators.graph import pagerank


def test_pagerank_hand_computed_star(spark):
    """3 nodes all pointing at a hub: hub rank highest; spokes equal;
    ranks sum to ~1 (dangling hub redistributes)."""
    edges = spark.createDataFrame([(1, 0), (2, 0), (3, 0)], "src long, dst long")
    pr = {r.node: r.rank for r in pagerank(edges, iters=10).collect()}
    assert pr[0] > pr[1]
    assert pr[1] == pr[2] == pr[3]
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-6)


def test_pagerank_cycle_uniform(spark):
    """A directed cycle is perfectly symmetric: uniform ranks 1/N."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    pr = {r.node: r.rank for r in pagerank(edges, iters=8).collect()}
    assert all(v == pytest.approx(0.25, abs=1e-8) for v in pr.values())


def test_pagerank_mass_conserved_with_dangling(spark):
    edges = spark.createDataFrame(
        [(1, 10), (2, 10), (2, 11), (3, 12)], "src long, dst long"
    )
    pr = pagerank(edges, iters=6)
    total = sum(r.rank for r in pr.collect())
    assert total == pytest.approx(1.0, abs=1e-6)


def test_pagerank_tol_stops_early_identical_ranks(spark):
    """On a cycle the ranks are uniform from round 1, so tol= stops
    after round 2 (first measurable zero delta) with ranks IDENTICAL to
    the full fixed-iteration run — convergence is an early exit, never
    a different answer."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    full = {r.node: r.rank for r in pagerank(edges, iters=20).collect()}
    early = {r.node: r.rank for r in pagerank(edges, iters=20, tol=1e-12).collect()}
    assert early == full


def test_pagerank_tol_respects_iter_cap(spark):
    """A tolerance no round can reach still stops at the iters cap and
    matches the fixed-round protocol exactly."""
    edges = spark.createDataFrame(
        [(1, 10), (2, 10), (2, 11), (3, 12)], "src long, dst long"
    )
    fixed = {r.node: r.rank for r in pagerank(edges, iters=4).collect()}
    capped = {r.node: r.rank for r in pagerank(edges, iters=4, tol=0.0).collect()}
    assert capped == fixed
