"""Property-based tests (SURVEY §5.3) for the under-specified semantics:
merge-direction field precedence, insert idempotence, incremental-loop
convergence. Example counts are small — each example is a Spark job."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_cli_spark.operators.merger import merge
from etl_cli_spark.spec import MergerSpec, TargetSpec

maybe_int = st.one_of(st.none(), st.integers(min_value=-100, max_value=100))
SETTINGS = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(
    src_vals=st.lists(maybe_int, min_size=3, max_size=3),
    mrg_vals=st.lists(maybe_int, min_size=2, max_size=2),
    direction=st.sampled_from(["m2s", "s2m"]),
)
@SETTINGS
def test_merge_direction_precedence(spark, src_vals, mrg_vals, direction):
    """dict-update semantics: winner's value when present, else loser's;
    unmatched source rows always keep source values."""
    # key 1 matches, key 2 doesn't; column 'x' conflicts
    src = spark.createDataFrame(
        [(1, src_vals[0]), (2, src_vals[1]), (3, src_vals[2])], "k int, x int"
    )
    mrg = spark.createDataFrame([(1, mrg_vals[0]), (9, mrg_vals[1])], "k int, x int")
    out = merge(src, mrg, MergerSpec(ds="m", keys=("k",), merge_direction=direction))
    rows = {r.k: r.x for r in out.collect()}
    sv, mv = src_vals[0], mrg_vals[0]
    expected_matched = (mv if mv is not None else sv) if direction == "m2s" else (
        sv if sv is not None else mv
    )
    assert rows[1] == expected_matched
    assert rows[2] == src_vals[1]  # unmatched: source value untouched
    assert rows[3] == src_vals[2]


@given(keys=st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=12, unique=True))
@SETTINGS
def test_insert_idempotent(spark, tmp_path_factory, keys):
    """Running the same insert twice adds nothing the second time."""
    from etl_cli_spark.operators.writeops import ParquetTable, apply_write_op

    path = str(tmp_path_factory.mktemp("prop") / "t.parquet")
    t = ParquetTable(spark, path)
    src = spark.createDataFrame([(k, f"v{k}") for k in keys], ["id", "v"])
    spec = TargetSpec(ds="t", op="insert", pk=("id",))
    first = apply_write_op(src, t, spec).count()
    second = apply_write_op(src, t, spec).count()
    assert first == len(keys)
    assert second == len(keys)  # no growth


@given(
    n_rows=st.integers(min_value=1, max_value=40),
    limit=st.integers(min_value=1, max_value=15),
)
@SETTINGS
def test_incremental_loop_exactly_once(spark, tmp_path_factory, n_rows, limit):
    """Fixpoint reached; every record processed exactly once for any
    batch_limit."""
    from etl_cli_spark.streaming.incremental import incremental_loop

    path = str(tmp_path_factory.mktemp("prop") / "bm.parquet")
    seen: list[int] = []

    def source():
        return spark.range(n_rows).withColumnRenamed("id", "rid")

    def process(batch):
        seen.extend(r.rid for r in batch.collect())

    stats = incremental_loop(spark, source, process, path, ["rid"], batch_limit=limit)
    assert stats.converged
    assert sorted(seen) == list(range(n_rows))  # exactly once, all of them
    assert stats.passes == -(-n_rows // limit)  # ceil
