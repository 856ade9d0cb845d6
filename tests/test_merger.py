from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_cli_spark.operators.merger import merge, parse_keys
from etl_cli_spark.spec import MergerSpec


def test_parse_keys():
    assert parse_keys(("k",)) == [("k", "k")]
    assert parse_keys(("a:b", "c")) == [("a", "b"), ("c", "c")]
    with pytest.raises(ValueError):
        parse_keys(())


@pytest.fixture(scope="module")
def src(spark):
    return spark.createDataFrame(
        [(1, "s1", 10.0), (2, "s2", 20.0), (3, None, 30.0)],
        ["k", "name", "val"],
    )


@pytest.fixture(scope="module")
def mrg(spark):
    # k=1 has two matches; k=3 none; k=9 merger-only
    return spark.createDataFrame(
        [(1, "m1a", "x1"), (1, "m1b", "x1b"), (2, None, "x2"), (9, "m9", "x9")],
        ["k", "name", "extra"],
    )


def test_left_default_keeps_unmatched(src, mrg):
    out = merge(src, mrg, MergerSpec(ds="m", keys=("k",)))
    assert out.filter("k = 3").count() == 1
    # k=1 multiplies (2 matches)
    assert out.filter("k = 1").count() == 2


def test_require_match_inner(src, mrg):
    out = merge(src, mrg, MergerSpec(ds="m", keys=("k",), require_match=True))
    assert sorted(r.k for r in out.select("k").distinct().collect()) == [1, 2]


def test_require_no_match_anti(src, mrg):
    out = merge(src, mrg, MergerSpec(ds="m", keys=("k",), require_no_match=True))
    assert [r.k for r in out.collect()] == [3]
    assert out.columns == src.columns  # source columns only


def test_match_one_dedupes(src, mrg):
    out = merge(src, mrg, MergerSpec(ds="m", keys=("k",), match_one=True, match_one_order=("extra",)))
    assert out.filter("k = 1").count() == 1
    # deterministic pick: extra asc -> 'x1' row
    assert out.filter("k = 1").collect()[0].extra == "x1"


def test_direction_m2s_merger_wins(src, mrg):
    out = merge(src, mrg, MergerSpec(ds="m", keys=("k",), merge_direction="m2s", match_one=True,
                                     match_one_order=("extra",)))
    d = {r.k: r.name for r in out.collect()}
    assert d[1] == "m1a"      # merger overwrote source
    assert d[2] == "s2"       # merger value null -> source kept (dict-update)
    assert d[3] is None       # unmatched -> source value


def test_direction_s2m_source_wins(src, mrg):
    out = merge(src, mrg, MergerSpec(ds="m", keys=("k",), merge_direction="s2m", match_one=True,
                                     match_one_order=("extra",)))
    d = {r.k: r.name for r in out.collect()}
    assert d[1] == "s1"
    assert d[3] is None


def test_merge_as_nests(src, mrg):
    out = merge(src, mrg, MergerSpec(ds="m", keys=("k",), merge_as="matched", match_one=True,
                                     match_one_order=("extra",)))
    assert "matched" in out.columns
    rows = {r.k: r.matched for r in out.collect()}
    assert rows[1].extra == "x1"
    assert rows[3] is None  # no match -> null struct, not struct of nulls


def test_mq_prefilter(src, mrg):
    out = merge(src, mrg, MergerSpec(ds="m", keys=("k",), query=("extra=x1b",), require_match=True))
    assert [r.extra for r in out.collect()] == ["x1b"]


def test_strict_match_null_safe(spark):
    s = spark.createDataFrame([(None, "s")], "k int, a string")
    m = spark.createDataFrame([(None, "m")], "k int, b string")
    loose = merge(s, m, MergerSpec(ds="m", keys=("k",)))
    assert loose.collect()[0].b is None  # null != null
    strict = merge(s, m, MergerSpec(ds="m", keys=("k",), strict_match=True))
    assert strict.collect()[0].b == "m"


def test_different_key_names(spark, engine):
    orders = engine.read("orders")
    cust = engine.read("customer")
    out = merge(orders, cust, MergerSpec(ds="c", keys=("o_custkey:c_custkey",), require_match=True))
    assert out.count() == orders.count()  # every order has a customer
    assert "c_name" in out.columns and "c_custkey" not in out.columns


def test_broadcast_hint(spark, engine):
    orders = engine.read("orders")
    cust = engine.read("customer")
    out = merge(orders, cust, MergerSpec(ds="c", keys=("o_custkey:c_custkey",), broadcast=True))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan
