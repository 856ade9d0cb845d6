"""Value-partitioned (hive layout on a real column, e.g. a date) write
ops: update-family ops rewrite only the partitions their source rows
live in; untouched partition files stay byte-identical on disk.

Valid only when the partition column is part of the pk (a row can then
never change partition); otherwise ops fall back to the full staged
rewrite."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_cli_spark.operators.writeops import ParquetTable, apply_write_op
from etl_cli_spark.spec import TargetSpec


def _snapshot(path):
    snap = {}
    for root, _, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            with open(p, "rb") as fh:
                snap[os.path.relpath(p, path)] = fh.read()
    return snap


@pytest.fixture()
def part_orders(spark, engine, tmp_path):
    """Orders partitioned by o_orderstatus (stands in for a date column);
    pk = (o_orderkey, o_orderstatus) so the partition col is pk-contained."""
    t = ParquetTable(
        spark, str(tmp_path / "orders_v.parquet"), partition_by=("o_orderstatus",)
    )
    t.append(engine.read("orders"))
    return t


PK = ("o_orderkey", "o_orderstatus")


def test_value_layout_roundtrip(part_orders, engine):
    assert part_orders.value_layout == ("o_orderstatus",)
    assert part_orders.layout is None
    assert part_orders.read().count() == engine.read("orders").count()


def test_upsert_touches_only_source_partitions(spark, engine, part_orders):
    orders = engine.read("orders")
    before = _snapshot(part_orders.path)
    src = (
        orders.filter("o_orderstatus = 'F' AND o_orderkey < 200")
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1.0))
    )
    n_src = src.count()
    assert n_src > 0
    out = apply_write_op(src, part_orders, TargetSpec(ds="t", op="upsert", pk=PK))
    assert out.count() == orders.count()  # pure update, no new pks
    after = _snapshot(part_orders.path)
    # every file OUTSIDE o_orderstatus=F is byte-identical
    untouched = {k for k in before if "o_orderstatus=F" not in k and k.endswith(".parquet")}
    assert untouched and all(before[k] == after[k] for k in untouched)
    # and the F partition was really rewritten with the new values
    got = part_orders.read().filter("o_orderstatus='F' AND o_orderkey < 200")
    base = orders.filter("o_orderstatus='F' AND o_orderkey < 200")
    assert got.agg(F.sum("o_totalprice")).first()[0] == pytest.approx(
        base.agg(F.sum("o_totalprice") + F.count("*")).first()[0]
    )


def test_delete_can_empty_a_partition(spark, engine, part_orders):
    src = engine.read("orders").filter("o_orderstatus = 'P'")
    n_p = src.count()
    assert n_p > 0
    apply_write_op(src, part_orders, TargetSpec(ds="t", op="delete", pk=PK))
    left = part_orders.read()
    assert left.filter("o_orderstatus = 'P'").count() == 0
    assert left.count() == engine.read("orders").count() - n_p
    # the drained partition directory is gone, not a stale leftover
    assert not any(
        e.startswith("o_orderstatus=P") for e in os.listdir(part_orders.path)
    )


def test_insert_prunes_and_appends(spark, engine, part_orders):
    orders = engine.read("orders")
    dup = orders.filter("o_orderkey < 50")
    new = dup.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10_000_000))
    out = apply_write_op(
        dup.unionByName(new),
        part_orders,
        TargetSpec(ds="t", op="insert", pk=PK),
    )
    assert out.count() == orders.count() + new.count()


def test_partition_col_not_in_pk_falls_back(spark, engine, tmp_path):
    """pk without the partition col -> rows could change partition, so the
    scoped path must NOT be used (full rewrite still yields correct state)."""
    t = ParquetTable(
        spark, str(tmp_path / "orders_v2.parquet"), partition_by=("o_orderstatus",)
    )
    orders = engine.read("orders")
    t.append(orders)
    # move every 'P' order to status 'F' — the row changes partition
    src = orders.filter("o_orderstatus = 'P'").withColumn("o_orderstatus", F.lit("F"))
    n_moved = src.count()
    apply_write_op(src, t, TargetSpec(ds="t", op="upsert", pk=("o_orderkey",)))
    got = t.read()
    assert got.filter("o_orderstatus = 'P'").count() == 0
    assert got.count() == orders.count()  # moved, not duplicated
    assert got.filter("o_orderstatus = 'F'").count() == (
        orders.filter("o_orderstatus = 'F'").count() + n_moved
    )


def test_bucket_and_partition_mutually_exclusive(spark, tmp_path):
    with pytest.raises(ValueError, match="mutually exclusive"):
        ParquetTable(
            spark, str(tmp_path / "x.parquet"),
            bucket_by=("a",), partition_by=("b",),
        )


def test_scoped_read_partition_prunes(spark, part_orders):
    """The pruned target read must show PartitionFilters on the partition
    column — file groups outside the touched values are never opened."""
    df = part_orders.read_value_partitions("o_orderstatus", ["F"])
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan and "o_orderstatus" in plan


def test_touched_values_guards(spark, engine):
    from etl_cli_spark.operators.writeops import _touched_values

    orders = engine.read("orders")
    assert set(_touched_values(orders, "o_orderstatus")) == {"F", "O", "P"}
    # nulls -> decline the scoped path
    from pyspark.sql import functions as F

    with_null = orders.withColumn(
        "s", F.when(F.col("o_orderkey") == 1, None).otherwise(F.col("o_orderstatus"))
    )
    assert _touched_values(with_null, "s") is None
    # hive-dir-ambiguous encodings -> decline
    weird = spark.createDataFrame([("a=b",), ("ok",)], "s string")
    assert _touched_values(weird, "s") is None
    # cardinality cap -> decline
    wide = spark.range(5000).select(F.col("id").alias("s"))
    assert _touched_values(wide, "s") is None
