from __future__ import annotations

import shutil
import tempfile

import pytest

from etl_cli_spark.engine import Engine


@pytest.fixture()
def work_root():
    from conftest import SF_DIR

    tmp = tempfile.mkdtemp(prefix="etl_metrics_")
    for t in ("region", "nation", "orders", "customer"):
        shutil.copy(f"{SF_DIR}/{t}.parquet", f"{tmp}/{t}.parquet")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def test_job_log_records_and_status(spark, work_root):
    eng = Engine(spark, work_root, job_log=True)
    res = eng.etl("orders", query=["o_orderstatus=F"], target="out/f_orders", op="create")
    assert "job_uid" in res.metrics

    st = eng.job_log.job_status("last")
    assert st is not None
    assert st["status"] == "succeeded"
    assert st["source"] == "orders"
    assert st["op"] == "create"
    assert st["rows_out"] > 0
    # rows_in comes from the source-plan Observation (one execution, no
    # extra pass), which makes rows_per_sec (the reference's sspeed) real
    assert st["rows_in"] == st["rows_out"]
    assert st["rows_per_sec"] is not None and st["rows_per_sec"] > 0

    by_uid = eng.job_log.job_status(res.metrics["job_uid"])
    assert by_uid is not None and by_uid["uid"] == res.metrics["job_uid"]


def test_job_log_single_execution_and_rows_in(spark, work_root):
    """The job log must not re-execute the pipeline to get its counters."""
    from pyspark.sql import functions as F

    from etl_cli_spark.functions.registry import register

    acc = spark.sparkContext.accumulator(0)

    @F.udf("int")
    def _tick(x):
        acc.add(1)
        return x

    # keep the udf column in the output so it can't be pruned away
    register("tick_probe", lambda col="o_orderkey": (lambda df: df.withColumn("probe", _tick(F.col(col)))))

    eng = Engine(spark, work_root, job_log=True)
    res = eng.etl(
        "orders", query=["o_orderstatus=F"], transformers=["tick_probe"],
        target="out/probe_orders", op="create",
    )
    n = res.metrics["rows_out"]
    assert n > 0 and res.metrics["rows_in"] == n
    # one execution of the source plan: the write. rows_out came from the
    # target's parquet metadata, rows_in from the Observation.
    assert acc.value == n

    st = eng.job_log.job_status("last")
    assert st["rows_in"] == n and st["rows_per_sec"] > 0


def test_job_log_no_target_counts_once(spark, work_root):
    eng = Engine(spark, work_root, job_log=True)
    res = eng.etl("orders", query=["o_orderstatus=F"])
    st = eng.job_log.job_status("last")
    assert st["target"] is None
    assert st["rows_in"] == st["rows_out"] == res.metrics["rows_out"] > 0


def test_job_log_failure_recorded(spark, work_root):
    eng = Engine(spark, work_root, job_log=True)
    with pytest.raises(Exception):
        eng.etl("nope_missing", target="out/x", op="create")
    st = eng.job_log.job_status("last")
    assert st["status"] == "failed"
    assert st["error"]


def test_job_log_history_ordered(spark, work_root):
    eng = Engine(spark, work_root, job_log=True)
    eng.etl("region", target="out/r1", op="create")
    eng.etl("nation", target="out/n1", op="create")
    hist = eng.job_log.history(limit=10).collect()
    assert len(hist) == 2
    assert hist[0].seq >= hist[1].seq  # newest first
    assert hist[0].source == "nation"


def test_engine_info(spark, work_root):
    from etl_cli_spark.spec import make_spec

    eng = Engine(spark, work_root)
    spec = make_spec("orders", query=["o_orderstatus=F"], target="out/t", op="upsert", pk="o_orderkey")
    inf = eng.info(spec)
    assert inf["source"].endswith("orders")
    assert inf["op"] == "upsert"
    assert inf["pk"] == ["o_orderkey"]
    assert inf["source_total"] > 0
    assert "Scan" in inf["plan"] or "FileScan" in inf["plan"]


def test_engine_sql_views(spark, work_root):
    eng = Engine(spark, work_root)
    out = eng.sql(
        "SELECT c_mktsegment, count(*) AS n FROM orders "
        "JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"
    )
    rows = out.collect()
    assert len(rows) >= 1 and all(r.n > 0 for r in rows)


def test_settings_roundtrip(spark, work_root):
    eng = Engine(spark, work_root)
    assert eng.get_setting("max_docs") is None
    assert eng.get_setting("max_docs", 5) == 5
    eng.set_setting("max_docs", 1000)
    assert eng.get_setting("max_docs") == 1000
    eng.set_setting("max_docs", 2000)  # latest wins, history retained
    assert eng.get_setting("max_docs") == 2000
    eng.set_setting("mode", "fast")
    from etl_cli_spark.settings import Settings

    assert Settings(spark, work_root).all() == {"max_docs": 2000, "mode": "fast"}


def test_settings_cli(spark, work_root, capsys):
    from etl_cli_spark.cli import main

    assert main(["--root", work_root, "--set-setting", "answer=42"]) == 0
    assert main(["--root", work_root, "--get-setting", "answer"]) == 0
    assert capsys.readouterr().out.strip() == '"42"'
    assert main(["--root", work_root, "--get-setting", "missing"]) == 1


def test_per_target_write_log(spark, work_root):
    eng = Engine(spark, work_root)
    eng.etl(
        "orders", query=["o_orderstatus=F"],
        target="out/logged_orders", op="create",
        log_ds="logs", log="o_orderkey,o_totalprice",
    )
    log = eng.read("logs/out-logged_orders")
    assert set(log.columns) == {"o_orderkey", "o_totalprice", "_etl_log_ts"}
    n = eng.read("orders", ["o_orderstatus=F"]).count()
    assert log.count() == n
    # a second run appends to the same per-target log
    eng.etl(
        "orders", query=["o_orderstatus=F"],
        target="out/logged_orders", op="create",
        log_ds="logs", log="o_orderkey,o_totalprice",
    )
    assert eng.read("logs/out-logged_orders").count() == 2 * n


def test_write_log_default_exclusions(spark, work_root):
    eng = Engine(spark, work_root)
    eng.etl("region", target="out/r_logged", op="create", log_ds="logs")
    name = "out-r_logged"
    log = eng.read(f"logs/{name}")
    assert "_etl_log_ts" in log.columns
    assert log.count() == eng.read("region").count()


def test_run_async_and_poll(spark, work_root):
    from etl_cli_spark.spec import make_spec

    eng = Engine(spark, work_root, job_log=True)
    spec = make_spec("orders", query=["o_orderstatus=F"], target="out/async_t", op="create")
    uid = eng.run_async(spec)
    st0 = eng.job_log.job_status(uid)
    assert st0 is not None and st0["status"] in ("running", "succeeded")
    st = eng.job_log.poll(uid, interval=0.2, timeout=120)
    assert st["status"] == "succeeded"
    assert st["rows_out"] > 0 and st["rows_in"] == st["rows_out"]
    assert eng.read("out/async_t").count() == st["rows_out"]


def test_run_async_failure_is_recorded(spark, work_root):
    from etl_cli_spark.spec import make_spec

    eng = Engine(spark, work_root, job_log=True)
    uid = eng.run_async(make_spec("missing_ds_xyz", target="out/fail_t", op="create"))
    st = eng.job_log.poll(uid, interval=0.2, timeout=120)
    assert st["status"] == "failed" and st["error"]


def test_job_log_concurrent_records(spark, work_root):
    """run_async workers record from daemon threads while the main thread
    records too; every record must land (unique-file pyarrow writes, no
    shared Spark committer staging dir to clobber)."""
    import threading
    import time as _time

    from etl_cli_spark.metrics import JobLog, JobRecord

    log = JobLog(spark, work_root)
    n_threads, per_thread = 8, 5
    errors = []

    def _write(tid):
        try:
            for i in range(per_thread):
                log.record(
                    JobRecord(
                        uid=f"job-{tid}-{i}",
                        seq=tid * per_thread + i,
                        started_at=_time.time(),
                        duration_sec=0.1,
                        status="succeeded",
                        source="orders",
                        target=None,
                        op="create",
                        rows_in=10,
                        rows_out=10,
                    )
                )
        except Exception as ex:  # pragma: no cover - failure detail
            errors.append(ex)

    threads = [threading.Thread(target=_write, args=(t,)) for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    df = log.frame()
    assert df.count() == n_threads * per_thread
    assert df.select("uid").distinct().count() == n_threads * per_thread
    # status lookups still work over the pyarrow-written files
    st = log.job_status("last")
    assert st["status"] == "succeeded" and st["seq"] == n_threads * per_thread - 1


def test_settings_skip_drifted_part_file(spark, work_root, tmp_path):
    """A part file with a drifted schema (hand-dropped, or an older
    layout) must be SKIPPED by the driver-side lookup, not raise —
    the Spark read path would have schema-coerced it the same way
    (round-7 ADVICE hardening)."""
    import os

    from etl_cli_spark.settings import Settings

    s = Settings(spark, work_root)
    s.set("alpha", 1)
    # drop a parquet file with entirely different columns into the dir
    import pyarrow as pa
    import pyarrow.parquet as pq

    bad = pa.table({"who": ["x"], "n": [1]})
    pq.write_table(bad, os.path.join(s.path, "part-drifted.parquet"))
    # and a non-parquet stray
    with open(os.path.join(s.path, "junk.parquet"), "wb") as f:
        f.write(b"not a parquet file")
    assert s.get("alpha") == 1
    assert s.all() == {"alpha": 1}


def test_settings_compaction_bounds_part_files(spark, work_root):
    """set() compacts past COMPACT_AFTER part files so lookup cost is
    O(distinct settings), not O(write history); latest values survive
    compaction exactly."""
    from etl_cli_spark.settings import Settings

    s = Settings(spark, work_root)
    s.COMPACT_AFTER = 6
    for i in range(9):
        s.set(f"k{i % 3}", i)
    assert len(s._part_files()) <= 7  # compacted at least once
    assert s.all() == {"k0": 6, "k1": 7, "k2": 8}


def test_settings_write_is_atomic_under_crash(spark, work_root, monkeypatch):
    """A crash mid-write must never leave a truncated part under its
    FINAL name (r8, round-7 ADVICE): _write_rows goes to a dot-temp
    then os.replace()s into place. Simulated crash: pq.write_table
    writes half the bytes then raises — the store must still return
    the previous value and list no stray temp or torn part."""
    import os

    import pyarrow.parquet as pq

    from etl_cli_spark.settings import Settings

    s = Settings(spark, work_root)
    s.set("alpha", 1)

    real_write = pq.write_table

    def torn_write(table, where, *a, **k):
        with open(where, "wb") as f:
            f.write(b"PAR1\x00torn")  # plausible prefix, invalid file
        raise OSError("disk full (injected)")

    monkeypatch.setattr(pq, "write_table", torn_write)
    try:
        s.set("alpha", 2)
    except OSError:
        pass
    monkeypatch.setattr(pq, "write_table", real_write)
    # previous value intact; the torn file never reached a final name
    assert s.get("alpha") == 1
    assert all(not fn.startswith(".") for fn in s._part_files())
    stray = [fn for fn in os.listdir(s.path) if fn.endswith(".tmp")]
    # torn temp may remain (crash debris) but must be invisible to reads
    assert s.all() == {"alpha": 1}, f"torn write leaked into reads: {stray}"


def test_settings_unreadable_part_warns(spark, work_root):
    """An unreadable part is skipped WITH a warning (not silently) so a
    torn or foreign file gets a human look before compact() removes
    it."""
    import os
    import warnings

    from etl_cli_spark.settings import Settings

    s = Settings(spark, work_root)
    s.set("alpha", 1)
    with open(os.path.join(s.path, "part-torn.parquet"), "wb") as f:
        f.write(b"PAR1\x00nope")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert s.get("alpha") == 1
    assert any("skipping unreadable part" in str(x.message) for x in w)


def test_job_msg_recorded_and_polled(spark, work_root):
    """--msg (reference base.py:131 "job comment for tracking") lands in
    the job-log record and comes back through job_status / poll; jobs
    without a msg record null; async jobs carry it on every record
    (running AND terminal); SPARK_ETL__MSG env default applies."""
    eng = Engine(spark, work_root, job_log=True)
    res = eng.etl("orders", query=["_limit=3"], target="out/msg1",
                  op="create", msg="backfill run #42")
    st = eng.job_log.job_status(res.metrics["job_uid"])
    assert st["msg"] == "backfill run #42"

    res2 = eng.etl("orders", query=["_limit=3"], target="out/msg2", op="create")
    assert eng.job_log.job_status(res2.metrics["job_uid"])["msg"] is None

    from etl_cli_spark.spec import make_spec

    uid = eng.run_async(make_spec("orders", query=["_limit=2"], msg="async note"))
    st = eng.job_log.poll(uid, interval=0.1, timeout=120)
    assert st["status"] == "succeeded" and st["msg"] == "async note"
    frame = eng.job_log.frame()
    from pyspark.sql import functions as F

    msgs = [r.msg for r in frame.filter(F.col("uid") == uid).collect()]
    assert msgs and all(m == "async note" for m in msgs)

    import os

    os.environ["SPARK_ETL__MSG"] = "env default"
    try:
        assert make_spec("orders").msg == "env default"
        assert make_spec("orders", msg="explicit wins").msg == "explicit wins"
    finally:
        del os.environ["SPARK_ETL__MSG"]
