"""Job log + metrics: the engine's answer to the reference's job store.

The reference records every job server-side and exposes it through
``get_job_status`` / ``poll_job`` (/root/reference/etl_cli/base.py:345-392;
``uid='last'`` resolves via ``_sort=-uid`` at base.py:353-354) plus a
per-target write log (``target.log_ds = 'logs.<target>'``,
etl.py:193-195). Here the job log is itself a dataset (parquet under
``<root>/logs/job``), so it is queryable with the same engine — the
reference's ``--job-poll``/``--jq`` becomes an ordinary DSL query.

Counters mirror the reference's poll payload (base.py:376-381):
``sprogress/tprogress/total`` -> rows_in/rows_out, ``sspeed`` ->
rows_per_sec, plus wall-clock duration and status.
"""

from __future__ import annotations

import datetime as _dt
import os
import time
import uuid
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

LOG_SCHEMA = T.StructType(
    [
        T.StructField("uid", T.StringType()),
        T.StructField("seq", T.LongType()),          # monotonic; _sort=-seq == 'last'
        T.StructField("started_at", T.TimestampType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("status", T.StringType()),     # succeeded | failed
        T.StructField("source", T.StringType()),
        T.StructField("target", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("rows_in", T.LongType()),
        T.StructField("rows_out", T.LongType()),
        T.StructField("rows_per_sec", T.DoubleType()),
        T.StructField("error", T.StringType()),
        T.StructField("contid", T.StringType()),     # job-chain id (--contid)
        T.StructField("msg", T.StringType()),        # job comment (--msg, base.py:131)
    ]
)


@dataclass
class JobRecord:
    uid: str
    seq: int
    started_at: float
    duration_sec: float
    status: str
    source: str
    target: str | None
    op: str | None
    rows_in: int | None
    rows_out: int | None
    error: str | None = None
    contid: str | None = None
    msg: str | None = None


_RECORD_LOCK = __import__("threading").Lock()

_ARROW_LOG_SCHEMA = None  # built lazily so pyarrow import stays off the module path


def _arrow_log_schema():
    global _ARROW_LOG_SCHEMA
    if _ARROW_LOG_SCHEMA is None:
        import pyarrow as pa

        _ARROW_LOG_SCHEMA = pa.schema(
            [
                ("uid", pa.string()),
                ("seq", pa.int64()),
                ("started_at", pa.timestamp("us", tz="UTC")),
                ("duration_sec", pa.float64()),
                ("status", pa.string()),
                ("source", pa.string()),
                ("target", pa.string()),
                ("op", pa.string()),
                ("rows_in", pa.int64()),
                ("rows_out", pa.int64()),
                ("rows_per_sec", pa.float64()),
                ("error", pa.string()),
                ("contid", pa.string()),
                ("msg", pa.string()),
            ]
        )
    return _ARROW_LOG_SCHEMA


class JobLog:
    """Parquet-backed job log under ``<root>/<ns>/job``."""

    def __init__(self, spark: SparkSession, root: str, ns: str = "logs"):
        self.spark = spark
        self.path = os.path.join(root, ns, "job")

    def record(self, rec: JobRecord) -> None:
        """Append one record as its own uniquely-named parquet file,
        written driver-side with pyarrow — NOT through Spark's file
        committer. ``run_async`` worker threads record concurrently with
        the main thread; Spark's committer stages every write in a shared
        ``<path>/_temporary`` dir, so two in-flight appends to the same
        path can delete each other's attempt dirs (round-2 ADVICE). A
        unique filename per record plus a driver-local write has no shared
        staging state; the process lock additionally serializes makedirs
        and keeps same-process records ordered on disk."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        rps = (
            rec.rows_in / rec.duration_sec
            if rec.rows_in is not None and rec.duration_sec > 0
            else None
        )
        started = _dt.datetime.fromtimestamp(rec.started_at, tz=_dt.timezone.utc)
        cols = [
            [rec.uid], [rec.seq], [started], [rec.duration_sec], [rec.status],
            [rec.source], [rec.target], [rec.op], [rec.rows_in], [rec.rows_out],
            [rps], [rec.error], [rec.contid], [rec.msg],
        ]
        table = pa.table(dict(zip(_arrow_log_schema().names, cols)), schema=_arrow_log_schema())
        fname = f"part-{rec.seq:012d}-{uuid.uuid4().hex}.parquet"
        with _RECORD_LOCK:
            os.makedirs(self.path, exist_ok=True)
            pq.write_table(table, os.path.join(self.path, fname))

    def frame(self) -> DataFrame:
        return self.spark.read.schema(LOG_SCHEMA).parquet(self.path)

    def job_status(self, uid: str = "last") -> dict[str, Any] | None:
        """base.py:349-364: fetch one job; 'last' = highest seq. A uid can
        have several records (running -> terminal); the latest wins."""
        df = self.frame()
        if uid != "last":
            df = df.filter(F.col("uid") == uid)
        row = df.orderBy(F.desc("seq")).limit(1).collect()
        return row[0].asDict() if row else None

    def poll(self, uid: str, interval: float = 0.5, timeout: float = 600.0) -> dict[str, Any]:
        """Poll until the job reaches a terminal state (the reference's
        poll_job loop, base.py:366-392)."""
        deadline = time.time() + timeout
        while True:
            st = self.job_status(uid)
            if st and st["status"] in ("succeeded", "failed"):
                return st
            if time.time() > deadline:
                raise TimeoutError(f"job {uid} still {st['status'] if st else 'unknown'}")
            time.sleep(interval)

    def history(self, source: str | None = None, limit: int = 100) -> DataFrame:
        df = self.frame()
        if source:
            df = df.filter(F.col("source") == source)
        return df.orderBy(F.desc("seq")).limit(limit)


def observed_value(obs, name: str) -> int | None:
    """Fetch one metric from a ``pyspark.sql.Observation`` WITHOUT the
    blocking ``.get`` — ``getRowOrEmpty`` waits at most ~100ms, so a plan
    whose action never ran (e.g. a short-circuited ``limit(0)``) yields
    None instead of hanging the job log."""
    if obs is None:
        return None
    try:
        opt = obs._jo.getRowOrEmpty()
        if opt.isDefined():
            v = opt.get().getAs(name)
            return int(v) if v is not None else None
    except Exception:
        return None
    return None


def new_uid() -> str:
    return uuid.uuid4().hex[:12]


def next_seq() -> int:
    # epoch-millis is monotonic enough for a single driver; collisions only
    # matter for 'last' resolution, where ties are broken arbitrarily
    return int(time.time() * 1000)
