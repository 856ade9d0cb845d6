"""Write operations: the sink-side "DML" (create/insert/update/upsert/
delete/index).

Semantics from /root/reference/etl_cli/etl.py:13 (OPS) and :199-248
(compilation): ``insert`` = create + skip_by anti-join (etl.py:208-210),
``--pk`` is the merge/identity key (etl.py:222-232), ``--tq`` scopes
which target rows an op may touch (etl.py:242-243).

Physical strategy: Delta-style MERGE without Delta — a staged parquet
rewrite. The new target state is computed as one Catalyst plan
(join/anti-join/union of target x source), written to a staging
directory, then atomically swapped in. On a real deployment the same
planner drives ``MERGE INTO`` on Delta/Iceberg (row-level ops, no full
rewrite); the op -> plan mapping is identical. At 100 TB, update-family
ops join target x source on pk — a shuffle on pk both sides unless the
source is dimension-sized (then broadcast); partitioned targets only
rewrite touched partitions (future work, noted in ROADMAP).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..dsl import compile_query
from ..spec import TargetSpec

_TS_COL = "_etl_ts"
_T, _S = "__etl_tgt", "__etl_srcw"


class ParquetTable:
    """A parquet-directory dataset with atomic staged-rewrite semantics.

    ``max_records_per_file`` carries the reference's write batch size
    (``batch_size``, base.py:269; 100k for s3, etl.py:133) into Spark's
    file-sizing knob.
    """

    def __init__(self, spark: SparkSession, path: str, max_records_per_file: int | None = None):
        self.spark = spark
        self.path = path
        self.max_records_per_file = max_records_per_file

    def _writer(self, df: DataFrame):
        w = df.write
        if self.max_records_per_file:
            w = w.option("maxRecordsPerFile", self.max_records_per_file)
        return w

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def read(self) -> DataFrame | None:
        return self.spark.read.parquet(self.path) if self.exists() else None

    def append(self, df: DataFrame) -> None:
        self._writer(df).mode("append").parquet(self.path)

    def overwrite(self, df: DataFrame) -> None:
        """Full-state replace via stage + atomic swap (safe self-reference)."""
        staged = f"{self.path}.__staged_{uuid.uuid4().hex[:8]}"
        self._writer(df).mode("overwrite").parquet(staged)
        backup = f"{self.path}.__old_{uuid.uuid4().hex[:8]}"
        if os.path.exists(self.path):
            os.rename(self.path, backup)
        os.rename(staged, self.path)
        if os.path.exists(backup):
            shutil.rmtree(backup)

    def drop(self) -> None:
        if self.exists():
            shutil.rmtree(self.path)


def _scope(spec: TargetSpec) -> Column:
    """--tq: predicate restricting which target rows the op touches."""
    q = compile_query(spec.query)
    return q.predicate if q.predicates else F.lit(True)


def _pk_cond(pk: tuple[str, ...]) -> Column:
    cond = None
    for k in pk:
        term = F.col(f"{_T}.{k}").eqNullSafe(F.col(f"{_S}.{k}"))
        cond = term if cond is None else (cond & term)
    return cond


def apply_write_op(src: DataFrame, table: ParquetTable, spec: TargetSpec) -> DataFrame:
    """Apply the write op; returns the new target state DataFrame.

    ``src`` is the pipeline output (already merged/transformed/projected).
    """
    if spec.fields:
        src = src.select(*spec.fields)
    if spec.drop:
        table.drop()

    op = spec.op
    if op == "create":
        if spec.dry_run:
            return src
        table.append(src)
        return table.read()

    if op == "insert":
        # insert only rows whose skip_by (default pk) key is absent in target
        keys = list(spec.skip_by or spec.pk)
        if not keys:
            raise ValueError("insert requires skip_by or pk")
        tgt = table.read()
        new_rows = src if tgt is None else src.join(
            tgt.select(*keys).dropDuplicates(keys), on=keys, how="left_anti"
        )
        if spec.dry_run:
            return new_rows
        table.append(new_rows)
        return table.read()

    if not spec.pk:
        raise ValueError(f"op {op!r} requires a pk")
    pk = list(spec.pk)
    src = src.dropDuplicates(pk)  # engine-enforced pk dedupe (etl.py:230-235)
    tgt = table.read()

    if tgt is None:
        if op in ("upsert", "index"):
            if spec.dry_run:
                return src
            table.append(src)
            return table.read()
        # update/delete against a missing target is a no-op
        return src.limit(0)

    # evaluate the --tq scope on the target BEFORE the join so its column
    # references never collide with same-named source columns
    tgt = tgt.withColumn("__etl_scope", _scope(spec))
    t, s = tgt.alias(_T), src.alias(_S)
    in_scope = F.col(f"{_T}.__etl_scope")
    cond = _pk_cond(spec.pk)
    shared = [c for c in tgt.columns if c in src.columns and c not in pk]
    set_cols = list(spec.overwrite_fields) if spec.overwrite_fields else shared
    if spec.skip_timestamp:
        set_cols = [c for c in set_cols if c != _TS_COL]

    if op == "delete":
        # keep target rows NOT (in scope AND pk-matched by source); the
        # same null-safe pk condition as the update family, so a null-pk
        # source row matches null-pk target rows consistently everywhere
        skeys = src.select(*pk).dropDuplicates(pk).alias(_S)
        hit = t.join(skeys, cond, how="left_semi").filter(in_scope)
        new_state = tgt.exceptAll(hit) if spec.query else t.join(
            skeys, cond, how="left_anti"
        )
    elif op in ("update", "upsert", "index"):
        s = src.withColumn("__etl_hit", F.lit(True)).alias(_S)
        joined = t.join(s, cond, "left")
        matched = F.col(f"{_S}.__etl_hit").isNotNull()
        touch = matched & in_scope
        out = []
        for c in [c for c in tgt.columns if c != "__etl_scope"]:
            tv = F.col(f"{_T}.{c}")
            if op == "index":
                # full-row replace: every column taken from source (null if absent)
                sv = F.col(f"{_S}.{c}") if c in src.columns else F.lit(None).cast(tgt.schema[c].dataType)
                out.append(F.when(touch, sv).otherwise(tv).alias(c) if c not in pk else tv.alias(c))
            elif c in set_cols:
                out.append(F.when(touch, F.col(f"{_S}.{c}")).otherwise(tv).alias(c))
            else:
                out.append(tv.alias(c))
        updated = joined.select(*out)
        if op in ("upsert", "index"):
            # null-safe anti (same _pk_cond as the matched join): otherwise a
            # null-pk source row that null-safe-matched a target row would be
            # both updated and re-appended
            new_keys = src.alias(_S).join(
                tgt.select(*pk).dropDuplicates(pk).alias(_T), cond, how="left_anti"
            )
            aligned = new_keys.select(
                *[
                    (F.col(c) if c in src.columns else F.lit(None).cast(tgt.schema[c].dataType)).alias(c)
                    for c in tgt.columns
                    if c != "__etl_scope"
                ]
            )
            new_state = updated.unionByName(aligned)
        else:
            new_state = updated
    else:  # pragma: no cover
        raise ValueError(f"unknown op {op!r}")

    new_state = new_state.drop("__etl_scope")
    if spec.dry_run:
        return new_state
    table.overwrite(new_state)
    return table.read()
