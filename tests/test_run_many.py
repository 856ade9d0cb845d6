"""Wildcard fan-out: per-source jobs vs the union-by-name single job."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from etl_cli_spark.engine import Engine
from etl_cli_spark.spec import make_spec


@pytest.fixture()
def shard_root(spark):
    """Three parquet shards `sh_a/sh_b/sh_c` splitting one orders slice;
    sh_c lacks the o_orderpriority column (schema drift across shards)."""
    from conftest import SF_DIR

    tmp = tempfile.mkdtemp(prefix="etl_fanout_")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").limit(300).cache()
    cols = orders.columns
    orders.filter("o_orderkey % 3 = 0").write.parquet(os.path.join(tmp, "sh_a.parquet"))
    orders.filter("o_orderkey % 3 = 1").write.parquet(os.path.join(tmp, "sh_b.parquet"))
    orders.filter("o_orderkey % 3 = 2").drop("o_orderpriority").write.parquet(
        os.path.join(tmp, "sh_c.parquet")
    )
    orders.unpersist()
    yield tmp, cols
    shutil.rmtree(tmp, ignore_errors=True)


def test_per_source_mode_one_job_per_match(spark, shard_root):
    root, _ = shard_root
    eng = Engine(spark, root)
    spec = make_spec("sh_*", ["o_orderstatus=F"], target="out/*", op="create")
    results = eng.run_many(spec)
    assert len(results) == 3
    for name in ("sh_a", "sh_b", "sh_c"):
        assert eng.read(f"out/{name}").count() > 0


def test_union_mode_single_job_same_rows(spark, shard_root):
    root, _ = shard_root
    eng = Engine(spark, root)
    spec = make_spec("sh_*", ["o_orderstatus=F"])
    per_src = eng.run_many(spec)
    union = eng.run_many(spec, mode="union")
    assert len(per_src) == 3 and len(union) == 1
    n_split = sum(r.df.count() for r in per_src)
    assert union[0].df.count() == n_split
    # same keys land, just via one plan (missing column null-filled)
    keys_union = {r.o_orderkey for r in union[0].df.select("o_orderkey").collect()}
    keys_split = set()
    for r in per_src:
        keys_split |= {x.o_orderkey for x in r.df.select("o_orderkey").collect()}
    assert keys_union == keys_split


def test_union_mode_null_fills_missing_columns(spark, shard_root):
    root, cols = shard_root
    eng = Engine(spark, root)
    res = eng.run_many(make_spec("sh_*"), mode="union", provenance_col="_src")[0]
    assert set(res.df.columns) == set(cols) | {"_src"}
    # sh_c rows carry null o_orderpriority; their provenance says so
    nulls = res.df.filter("o_orderpriority IS NULL")
    assert nulls.count() > 0
    assert {r._src for r in nulls.select("_src").distinct().collect()} == {"sh_c"}


def test_union_mode_limit_is_global(spark, shard_root):
    root, _ = shard_root
    eng = Engine(spark, root)
    res = eng.run_many(make_spec("sh_*", ["_limit=5"]), mode="union")
    assert res[0].df.count() == 5  # per_source would give up to 15


def test_union_mode_single_target_write(spark, shard_root):
    root, _ = shard_root
    eng = Engine(spark, root)
    eng.run_many(
        make_spec("sh_*", ["o_orderstatus=F"], target="out/all_f", op="create"),
        mode="union",
    )
    got = eng.read("out/all_f")
    want = eng.run_many(make_spec("sh_*", ["o_orderstatus=F"]), mode="union")[0].df
    assert got.count() == want.count()


def test_union_mode_rejects_templated_target(spark, shard_root):
    root, _ = shard_root
    eng = Engine(spark, root)
    with pytest.raises(ValueError, match="non-templated"):
        eng.run_many(make_spec("sh_*", target="out/*", op="create"), mode="union")


def test_run_many_rejects_unknown_mode(spark, shard_root):
    root, _ = shard_root
    with pytest.raises(ValueError, match="mode"):
        Engine(spark, root).run_many(make_spec("sh_*"), mode="parallel")


def test_cli_fanout_union(spark, shard_root, capsys):
    """--fanout union through the CLI: one result line, one target."""
    root, _ = shard_root
    from etl_cli_spark.cli import main

    rc = main([
        "--root", root, "-s", "sh_*", "-q", "o_orderstatus=F",
        "-t", "out/cli_union", "--op", "create", "--fanout", "union",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count("rows") == 1
    assert Engine(spark, root).read("out/cli_union").count() > 0
