from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_cli_spark.catalog import drop_ds, drop_ns, ls_ns
from etl_cli_spark.operators.aggregate import aggregate, exact_sum
from etl_cli_spark.operators.diff import diff


def test_diff_symmetric(spark):
    a = spark.createDataFrame([(1,), (2,), (2,), (3,)], ["x"])
    b = spark.createDataFrame([(2,), (3,), (4,)], ["x"])
    out = diff(a, b)
    got = sorted((r.x, r._diff_side) for r in out.collect())
    assert got == [(1, "left"), (2, "left"), (4, "right")]


def test_diff_context_projection(engine):
    a = engine.read("orders", ["o_totalprice__gt=100000"])
    b = engine.read("orders", ["o_totalprice__gt=200000"])
    out = diff(a, b, context=["o_orderkey"])
    assert out.filter("_diff_side = 'right'").count() == 0
    assert out.count() == a.count() - b.count()


def test_aggregate_groupby_having(engine):
    li = engine.read("lineitem")
    out = aggregate(
        li,
        group_by=["l_returnflag"],
        aggs={"n": "count(*)", "sq": exact_sum("l_quantity")},
        having="n > 10",
    )
    rows = out.collect()
    assert all(r.n > 10 for r in rows)
    assert {"l_returnflag", "n", "sq"} == set(out.columns)


def test_aggregate_rollup_and_cube(engine):
    li = engine.read("lineitem")
    g = aggregate(li, ["l_returnflag", "l_linestatus"], {"n": "count(*)"}).count()
    r = aggregate(li, ["l_returnflag", "l_linestatus"], {"n": "count(*)"}, mode="rollup").count()
    c = aggregate(li, ["l_returnflag", "l_linestatus"], {"n": "count(*)"}, mode="cube").count()
    assert r > g and c > r


def test_aggregate_pivot(engine):
    li = engine.read("lineitem")
    out = aggregate(li, ["l_returnflag"], {"n": "count(*)"}, pivot=("l_linestatus", ["O", "F"]))
    assert set(out.columns) == {"l_returnflag", "O_n", "F_n"} or set(out.columns) == {
        "l_returnflag",
        "O",
        "F",
    }


def test_catalog_ls_drop(tmp_path, spark):
    (tmp_path / "ns1").mkdir()
    spark.range(3).write.parquet(str(tmp_path / "ns1" / "t1.parquet"))
    spark.range(3).write.parquet(str(tmp_path / "ns1" / "t2.parquet"))
    assert ls_ns(str(tmp_path), "ns1") == ["t1", "t2"]
    assert drop_ds(str(tmp_path), "ns1", "t1", confirm=lambda m: True)
    assert ls_ns(str(tmp_path), "ns1") == ["t2"]
    # ns drop refuses without confirm
    assert not drop_ns(str(tmp_path), "ns1")
    assert drop_ns(str(tmp_path), "ns1", confirm=lambda m: True)
    assert ls_ns(str(tmp_path), "ns1") == []


def test_transformer_chain(engine):
    from etl_cli_spark.functions.registry import apply_chain

    df = engine.read("customer")
    out = apply_chain(
        df,
        ["with_column:bal2,c_acctbal * 2", "filter:bal2 > 5000", "upper:c_mktsegment", "drop:c_nationkey"],
    )
    assert "c_nationkey" not in out.columns
    row = out.first()
    assert row.bal2 == pytest.approx(row.c_acctbal * 2)


def test_merge_rules_by_name(spark, engine):
    # registry-resolved merge policy (--mrules by name)
    res = engine.etl(
        "customer",
        transformers=["rename:c_name,name"],
        merger="nation",
        mtr=["rename:n_name,name"],
        mkeys="c_nationkey:n_nationkey",
        mmd="m2s",
        mrules="prefer_nonnull",
    )
    row = res.df.filter("c_custkey = 1").first()
    assert row.name.startswith("NATION_")  # merger value won


def test_env_var_spec_defaults(monkeypatch):
    from etl_cli_spark.spec import make_spec

    monkeypatch.setenv("SPARK_ETL__OP", "upsert")
    monkeypatch.setenv("SPARK_ETL__WORKERS", "7")
    monkeypatch.setenv("SPARK_ETL__BATCH_SIZE", "5000")
    spec = make_spec("src", target="out/t", pk="id")
    assert spec.target.op == "upsert"
    assert spec.workers == 7
    assert spec.batch_size == 5000
    # explicit args beat env
    spec2 = make_spec("src", target="out/t", op="delete", pk="id", workers=2)
    assert spec2.target.op == "delete"
    assert spec2.workers == 2


def test_batch_size_controls_file_count(spark, tmp_path):
    from etl_cli_spark.operators.writeops import ParquetTable

    df = spark.range(1000).coalesce(1)
    t = ParquetTable(spark, str(tmp_path / "t.parquet"), max_records_per_file=100)
    t.append(df)
    import os

    files = [f for f in os.listdir(t.path) if f.endswith(".parquet")]
    assert len(files) >= 10


def test_salted_join_matches_plain_join(spark):
    from etl_cli_spark.operators.skew import salted_join

    # heavily skewed left side: 900 rows of key 1, few others
    big = spark.createDataFrame(
        [(1, i) for i in range(900)] + [(2, 0), (3, 0)], ["k", "v"]
    )
    dim = spark.createDataFrame([(1, "a"), (2, "b"), (4, "d")], ["k", "name"])

    plain = big.join(dim, "k", "inner")
    salted = salted_join(big, dim, "k", "inner", salt_factor=8)
    assert salted.count() == plain.count() == 901
    assert sorted(salted.columns) == sorted(plain.columns)
    a = {tuple(r) for r in salted.collect()}
    b = {tuple(r) for r in plain.collect()}
    assert a == b

    left = salted_join(big, dim, "k", "left", salt_factor=4)
    assert left.count() == big.count()


def test_hot_keys(spark):
    from etl_cli_spark.operators.skew import hot_keys

    df = spark.createDataFrame([(1,)] * 500 + [(2,)] * 10 + [(3,)] * 5, ["k"])
    hk = hot_keys(df, "k", min_share=0.5)
    assert [r.k for r in hk.collect()] == [1]


def test_mmd_required_with_merger():
    from etl_cli_spark.spec import make_spec

    with pytest.raises(ValueError, match="mmd"):
        make_spec("orders", merger="customer", mkeys="o_custkey:c_custkey")
    # env overlay still satisfies the requirement
    import os

    os.environ["SPARK_ETL__MMD"] = "s2m"
    try:
        spec = make_spec("orders", merger="customer", mkeys="o_custkey:c_custkey")
        assert spec.merger.merge_direction == "s2m"
    finally:
        del os.environ["SPARK_ETL__MMD"]


def test_salted_join_rejects_outer(spark, engine):
    from etl_cli_spark.operators.skew import salted_join

    o = engine.read("orders")
    c = engine.read("customer")
    with pytest.raises(ValueError, match="big-side-preserving"):
        salted_join(o, c, on="o_custkey", how="right")
    with pytest.raises(ValueError, match="big-side-preserving"):
        salted_join(o, c, on="o_custkey", how="full")


def test_asof_join_collision_raises(spark, engine):
    from etl_cli_spark.operators.asof import asof_join

    ev = engine.read("events", ["event_type=click", "_fields=event_id,user_id,ts,value"])
    pur = engine.read("events", ["event_type=purchase", "_fields=user_id,ts,value"])
    with pytest.raises(ValueError, match="collide"):
        asof_join(ev, pur, on="user_id", left_ts="ts")
    out = asof_join(ev, pur, on="user_id", left_ts="ts", rsuffix="_right")
    assert "value_right" in out.columns


def test_sql_sees_datasets_created_after_first_call(spark, tmp_path):
    from etl_cli_spark.engine import Engine

    eng = Engine(spark, str(tmp_path))
    spark.range(3).toDF("a").write.parquet(f"{tmp_path}/first.parquet")
    assert eng.sql("SELECT count(*) AS n FROM first").first().n == 3
    # a dataset created AFTER the first .sql() call must be visible too
    spark.range(5).toDF("b").write.parquet(f"{tmp_path}/second.parquet")
    assert eng.sql("SELECT count(*) AS n FROM second").first().n == 5


def test_sql_two_roots_no_clobber(spark, tmp_path):
    from etl_cli_spark.engine import Engine

    r1, r2 = tmp_path / "r1", tmp_path / "r2"
    spark.range(2).toDF("x").write.parquet(f"{r1}/ds.parquet")
    spark.range(7).toDF("x").write.parquet(f"{r2}/ds.parquet")
    e1, e2 = Engine(spark, str(r1)), Engine(spark, str(r2))
    assert e1.sql("SELECT count(*) AS n FROM ds").first().n == 2
    assert e2.sql("SELECT count(*) AS n FROM ds").first().n == 7
    # back to the first root: views re-registered, not stale
    assert e1.sql("SELECT count(*) AS n FROM ds").first().n == 2


def test_sql_sees_overwritten_dataset(spark, tmp_path):
    """In-place overwrite (same name, new files) must invalidate the cached
    view — the fingerprint keys on directory mtimes, not just names."""
    from etl_cli_spark.engine import Engine

    eng = Engine(spark, str(tmp_path))
    spark.range(4).toDF("a").write.parquet(f"{tmp_path}/ds.parquet")
    assert eng.sql("SELECT count(*) AS n FROM ds").first().n == 4
    spark.range(9).toDF("a").write.mode("overwrite").parquet(f"{tmp_path}/ds.parquet")
    assert eng.sql("SELECT count(*) AS n FROM ds").first().n == 9


def test_sql_fingerprint_caches_between_calls(spark, tmp_path):
    """No writes between two sql() calls → the second call must not
    re-register (no per-query parquet-footer reads at scale)."""
    from etl_cli_spark.engine import Engine, _catalog_fingerprint

    eng = Engine(spark, str(tmp_path))
    spark.range(3).toDF("a").write.parquet(f"{tmp_path}/ds.parquet")
    eng.sql("SELECT 1").collect()
    state = getattr(spark, "_etl_sql_state", None)
    assert state == (str(tmp_path), _catalog_fingerprint(str(tmp_path)))
    eng.sql("SELECT count(*) AS n FROM ds").collect()
    assert getattr(spark, "_etl_sql_state") is state  # untouched, not rebuilt


def test_schema_drift_mergeschema_read(spark, tmp_path):
    """SURVEY §7 hard-part (d): schema drift across parquet files —
    mergeSchema passes through Engine.read options and unions the
    schemas (missing columns null-filled)."""
    from etl_cli_spark.engine import Engine

    p = f"{tmp_path}/drift.parquet"
    spark.createDataFrame([(1, "a")], "id long, x string").write.mode("append").parquet(p)
    spark.createDataFrame([(2, "b", 9.5)], "id long, x string, y double").write.mode(
        "append"
    ).parquet(p)
    eng = Engine(spark, str(tmp_path))
    got = eng.read("drift", mergeSchema="true")
    assert set(got.columns) == {"id", "x", "y"}
    rows = {r.id: (r.x, r.y) for r in got.collect()}
    assert rows[1] == ("a", None) and rows[2] == ("b", 9.5)


def test_sql_catalog_ttl_skips_relisting(spark, tmp_path, monkeypatch):
    """With a ttl, back-to-back sql() calls walk the catalog ONCE; an
    engine-side write invalidates instantly even inside the window."""
    import etl_cli_spark.engine as engmod
    from etl_cli_spark.engine import Engine

    eng = Engine(spark, str(tmp_path), catalog_ttl=300.0)
    spark.range(3).toDF("a").write.parquet(f"{tmp_path}/ds.parquet")

    walks = {"n": 0}
    real_fp = engmod._catalog_fingerprint

    def counting_fp(root, depth=3):
        walks["n"] += 1
        return real_fp(root, depth)

    monkeypatch.setattr(engmod, "_catalog_fingerprint", counting_fp)
    assert eng.sql("SELECT count(*) AS n FROM ds").first().n == 3
    assert eng.sql("SELECT count(*) AS n FROM ds").first().n == 3
    assert walks["n"] == 1  # second call served from the ttl cache

    # engine-side write -> dirty flag -> next sql() re-lists immediately
    eng.etl("ds", target="ds2", op="create")
    assert eng.sql("SELECT count(*) AS n FROM ds2").first().n == 3
    assert walks["n"] == 2


def test_sql_sees_namespaced_hive_append(spark, tmp_path):
    """Append into <root>/<ns>/<name>/<part=val>/ writes files at depth 4
    with no dirent change at depth <= 2 — the depth-3 fingerprint (plus
    the ParquetTable dataset-dir utime) must still invalidate the cached
    view (ADVICE r2)."""
    from etl_cli_spark.engine import Engine
    from etl_cli_spark.operators.writeops import ParquetTable

    eng = Engine(spark, str(tmp_path))
    t = ParquetTable(
        spark, f"{tmp_path}/ns/ds.parquet", partition_by=("p",)
    )
    t.append(spark.range(4).selectExpr("id", "id % 2 AS p"))
    assert eng.sql("SELECT count(*) AS n FROM ns_ds").first().n == 4
    t.append(spark.range(6).selectExpr("id + 100 AS id", "id % 2 AS p"))
    assert eng.sql("SELECT count(*) AS n FROM ns_ds").first().n == 10


def test_profile_columns_exact(spark, engine):
    from etl_cli_spark.operators.profile import profile_columns

    o = engine.read("orders")
    prof = {r.column: r for r in profile_columns(o, exact=True).collect()}
    assert set(prof) == set(o.columns)
    n = o.count()
    assert all(prof[c].n_rows == n for c in prof)
    assert prof["o_orderkey"].n_distinct == n  # pk
    assert prof["o_orderstatus"].n_distinct == 3
    assert prof["o_orderkey"].min == "0"
    assert prof["o_orderstatus"].dtype == "string"


def test_profile_cli_describe(tmp_path, capsys):
    import json as _json

    from etl_cli_spark.cli import main

    rc = main(["-s", "region", "--root", "/root/testdata/sf0.001", "--describe",
               "--master", "local[2]"])
    assert rc == 0
    lines = [_json.loads(ln) for ln in capsys.readouterr().out.strip().splitlines()]
    assert {r["column"] for r in lines} == {"r_regionkey", "r_name"}
    assert all(r["n_rows"] == 5 for r in lines)


def test_multiset_diff_reserved_name_collision(spark):
    """r9 advice: _multiset_diff's helper columns must not collide with
    real input columns named __o/__n/__oc/__nc/__k — and the diff must
    keep exceptAll's multiset (per-occurrence) semantics over them."""
    from etl_cli_spark.operators.writeops import _multiset_diff

    rows = [(1, "a"), (1, "a"), (2, "b")]
    old = spark.createDataFrame(rows, ["__oc", "__k"])
    new = spark.createDataFrame([(1, "a"), (3, "c"), (3, "c")], ["__oc", "__k"])
    added, removed = _multiset_diff(old, new)
    assert sorted(map(tuple, added.collect())) == [(3, "c"), (3, "c")]
    assert sorted(map(tuple, removed.collect())) == [(1, "a"), (2, "b")]
    # by-name alignment: new's projection order drift must not matter
    added2, removed2 = _multiset_diff(old, new.select("__k", "__oc"))
    assert sorted(map(tuple, added2.collect())) == [(3, "c"), (3, "c")]
    assert sorted(map(tuple, removed2.collect())) == [(1, "a"), (2, "b")]
