from __future__ import annotations

import pytest

from etl_cli_spark.operators.writeops import ParquetTable, apply_write_op
from etl_cli_spark.spec import TargetSpec


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["id", "status", "amount"],
    )


@pytest.fixture()
def table(spark, tmp_path, base):
    t = ParquetTable(spark, str(tmp_path / "tgt.parquet"))
    t.append(base)
    return t


def rows(df):
    return sorted((r.id, r.status, r.amount) for r in df.collect())


def test_create_appends(spark, tmp_path, base):
    t = ParquetTable(spark, str(tmp_path / "t.parquet"))
    apply_write_op(base, t, TargetSpec(ds="t", op="create"))
    apply_write_op(base.limit(1), t, TargetSpec(ds="t", op="create"))
    assert t.read().count() == 4


def test_insert_is_idempotent(spark, table, base):
    spec = TargetSpec(ds="t", op="insert", pk=("id",))
    extra = spark.createDataFrame([(3, "dup", 99.0), (4, "d", 40.0)], base.columns)
    out = apply_write_op(extra, table, spec)
    assert rows(out) == [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)]
    # second run adds nothing
    out2 = apply_write_op(extra, table, spec)
    assert out2.count() == 4


def test_update_only_touches_matched(spark, table, base):
    src = spark.createDataFrame([(2, "B!", 99.0), (7, "new", 1.0)], base.columns)
    out = apply_write_op(src, table, TargetSpec(ds="t", op="update", pk=("id",)))
    assert rows(out) == [(1, "a", 10.0), (2, "B!", 99.0), (3, "c", 30.0)]  # 7 NOT inserted


def test_upsert_updates_and_inserts(spark, table, base):
    src = spark.createDataFrame([(2, "B!", 99.0), (7, "new", 1.0)], base.columns)
    out = apply_write_op(src, table, TargetSpec(ds="t", op="upsert", pk=("id",)))
    assert rows(out) == [(1, "a", 10.0), (2, "B!", 99.0), (3, "c", 30.0), (7, "new", 1.0)]


def test_delete_by_pk(spark, table, base):
    src = spark.createDataFrame([(1,), (3,)], ["id"])
    out = apply_write_op(src, table, TargetSpec(ds="t", op="delete", pk=("id",)))
    assert [r.id for r in out.collect()] == [2]


def test_tq_scopes_update(spark, table, base):
    # only rows with amount < 15 may be touched
    src = spark.createDataFrame([(1, "hit", 0.0), (2, "miss", 0.0)], base.columns)
    out = apply_write_op(src, table, TargetSpec(ds="t", op="update", pk=("id",), query=("amount__lt=15",)))
    assert rows(out) == [(1, "hit", 0.0), (2, "b", 20.0), (3, "c", 30.0)]


def test_tq_scopes_delete(spark, table, base):
    src = spark.createDataFrame([(1,), (2,)], ["id"])
    out = apply_write_op(src, table, TargetSpec(ds="t", op="delete", pk=("id",), query=("amount__lt=15",)))
    assert sorted(r.id for r in out.collect()) == [2, 3]


def test_index_full_row_replace(spark, table, base):
    # index: matched row fully replaced; column absent in source -> null
    src = spark.createDataFrame([(2, "IDX")], ["id", "status"])
    out = apply_write_op(src, table, TargetSpec(ds="t", op="index", pk=("id",)))
    got = {r.id: (r.status, r.amount) for r in out.collect()}
    assert got[2] == ("IDX", None)
    assert got[1] == ("a", 10.0)


def test_upsert_into_missing_target(spark, tmp_path, base):
    t = ParquetTable(spark, str(tmp_path / "none.parquet"))
    out = apply_write_op(base, t, TargetSpec(ds="t", op="upsert", pk=("id",)))
    assert out.count() == 3


def test_dry_run_writes_nothing(spark, table, base):
    src = spark.createDataFrame([(2, "B!", 99.0)], base.columns)
    out = apply_write_op(src, table, TargetSpec(ds="t", op="update", pk=("id",), dry_run=True))
    assert rows(out)[1] == (2, "B!", 99.0)
    assert rows(table.read()) == rows(base)  # untouched


def test_pk_dedupe_guard(spark, table, base):
    # duplicate pks in source must not multiply target rows
    src = spark.createDataFrame([(2, "x", 1.0), (2, "y", 2.0)], base.columns)
    out = apply_write_op(src, table, TargetSpec(ds="t", op="upsert", pk=("id",)))
    assert out.count() == 3
