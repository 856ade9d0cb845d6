"""Units for bench.py's noise-containment helpers (no Spark needed).

Round-10 additions (VERDICT r9 "what's wrong #2/#3" + ADVICE):
- ``central_spread`` centers its 3-sample window on the published
  median index, so noisy-flagging is symmetric for even sample counts;
- ``_load_anchors`` anchors each row to its median over the 3 newest
  same-sf artifacts (one polluted round can't become the anchor), reads
  both raw bench lines and driver-wrapped ``{"parsed": ...}`` round
  artifacts, and skips artifacts at a different sf;
- the artifact publishes ``anchor_outlier`` / ``failed`` (covered by
  integration via the driver's per-round BENCH_r{N}.json).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def test_central_spread_window_straddles_published_median():
    # published median of 4 samples is s[2]; the window must include it
    # AND its slow neighbor — [1,1,1,9] publishes 1.0 but the 9 sits in
    # the median's neighborhood, so the row should flag/retry
    assert bench.central_spread([1.0, 1.0, 1.0, 9.0]) > 2.0
    # symmetric case: one FAST outlier among slow runs publishes 9.0
    # with a stable neighborhood — must NOT flag (pre-fix it did,
    # while the mirror case above did not)
    assert bench.central_spread([1.0, 9.0, 9.0, 9.0]) == 1.0
    # odd counts: central three
    assert bench.central_spread([1.0, 2.0, 2.0, 2.0, 50.0]) == 1.0
    assert bench.central_spread([1.0, 1.0, 5.0]) == 5.0


def _write(tmp, name, payload):
    (tmp / name).write_text(json.dumps(payload))


def test_load_anchors_median_over_three_rounds(tmp_path):
    # r9 is polluted (3.03s); the anchor must be the cross-round median
    _write(tmp_path, "BENCH_r07.json", {"sf": 0.1, "queries": {"q": 0.70}})
    _write(tmp_path, "BENCH_r08.json", {"sf": 0.1, "queries": {"q": 0.80}})
    _write(tmp_path, "BENCH_r09.json", {"parsed": {"sf": 0.1, "queries": {"q": 3.03}}})
    src, anchors = bench._load_anchors(str(tmp_path), 0.1)
    assert anchors == {"q": 0.80}
    assert set(src.split(",")) == {"BENCH_r07.json", "BENCH_r08.json", "BENCH_r09.json"}


def test_load_anchors_only_newest_three_and_sf_gate(tmp_path):
    for n, v in [(5, 9.0), (6, 9.0), (7, 1.0), (8, 1.0), (9, 1.0)]:
        _write(tmp_path, f"BENCH_r0{n}.json", {"sf": 0.1, "queries": {"q": v}})
    src, anchors = bench._load_anchors(str(tmp_path), 0.1)
    assert anchors == {"q": 1.0} and "BENCH_r05" not in src
    # artifact at a different sf is skipped entirely
    _write(tmp_path, "BENCH_SF1.json", {"sf": 0.5, "queries": {"q": 2.0}})
    src1, anchors1 = bench._load_anchors(str(tmp_path), 1.0)
    assert anchors1 == {} and src1 == ""
    # unknown sf tier: no anchors, never an exception
    assert bench._load_anchors(str(tmp_path), 0.01) == ("", {})


def test_load_anchors_even_count_uses_central_pair_mean(tmp_path):
    # VERDICT r10 "what's wrong #2": with exactly 2 prior artifacts the
    # old sorted(ts)[len//2] anchored to the SLOWER member, loosening
    # the 2.5x outlier trigger when history is thinnest. Even counts
    # must anchor to the central-pair mean.
    _write(tmp_path, "BENCH_r08.json", {"sf": 0.1, "queries": {"q": 1.0}})
    _write(tmp_path, "BENCH_r09.json", {"sf": 0.1, "queries": {"q": 3.0}})
    _, anchors = bench._load_anchors(str(tmp_path), 0.1)
    assert anchors == {"q": 2.0}
    # a row present in only ONE artifact (odd count) anchors to that value
    _write(tmp_path, "BENCH_r09.json", {"sf": 0.1, "queries": {"q": 3.0, "r": 5.0}})
    _, anchors2 = bench._load_anchors(str(tmp_path), 0.1)
    assert anchors2 == {"q": 2.0, "r": 5.0}


def test_load_anchors_ignores_failed_rows_and_garbage(tmp_path):
    _write(
        tmp_path,
        "BENCH_r09.json",
        {"sf": 0.1, "queries": {"good": 1.5, "failed_row": -1.0, "zero": 0}},
    )
    (tmp_path / "BENCH_r08.json").write_text("{not json")
    _, anchors = bench._load_anchors(str(tmp_path), 0.1)
    assert anchors == {"good": 1.5}


def test_monotone_drift_flags_slow_creep_the_anchor_misses(tmp_path):
    # VERDICT r11 next-round #2: strip_repeated_spans rose
    # 1.32 -> 1.56 -> 1.76 over r9-r11 (+18%, +12%) with zero flags —
    # each step passed the 2.5x anchor trigger. With the current run
    # continuing the climb, the row must flag.
    for n, v in [(9, 1.321), (10, 1.563), (11, 1.758)]:
        _write(tmp_path, f"BENCH_r{n:02d}.json",
               {"sf": 0.1, "queries": {"spans": v, "flat": 0.5}})
    hist = bench._load_history(str(tmp_path), 0.1)
    assert hist["spans"] == [1.321, 1.563, 1.758]  # oldest -> newest
    flags = bench.monotone_drift(hist, {"spans": 1.95, "flat": 0.5})
    assert "spans" in flags and flags["spans"] >= 1.3
    assert "flat" not in flags
    # the drift can also live entirely in HISTORY (current run flat):
    # the r9->r11 window itself is strictly rising >=10%/step
    flags2 = bench.monotone_drift(hist, {"spans": 1.70})
    assert "spans" in flags2


def test_monotone_drift_needs_three_rising_points():
    # one recovery round breaks the window — bpe_train's
    # 4.08 -> 3.34 -> 4.11 (r9-r11) shape must NOT flag
    hist = {"bpe": [4.075, 3.343, 4.109]}
    assert bench.monotone_drift(hist, {"bpe": 4.2}) == {}
    # sub-threshold steps (+9%) never flag even when monotone
    hist3 = {"q": [1.0, 1.09]}
    assert bench.monotone_drift(hist3, {"q": 1.18}) == {}
    # thin history (< 2 prior rounds) can't form a window
    assert bench.monotone_drift({"q": [1.0]}, {"q": 2.0}) == {}
    assert bench.monotone_drift({}, {"q": 2.0}) == {}
    # failed rows (-1) are ignored
    assert bench.monotone_drift({"q": [1.0, 1.2]}, {"q": -1.0}) == {}


def test_prior_drift_flags_read_newest_same_sf_artifact(tmp_path):
    """Round-13 mechanical drift response, step 1: rows the PREVIOUS
    round's monotone_drift flagged are read back so the next run gives
    them the full retry budget and publishes their sample band."""
    _write(tmp_path, "BENCH_r11.json",
           {"sf": 0.1, "queries": {"q": 1.0},
            "monotone_drift": {"old_flag": 1.4}})
    _write(tmp_path, "BENCH_r12.json",
           {"parsed": {"sf": 0.1, "queries": {"q": 1.0},
                       "monotone_drift": {"spans": 1.33}}})
    # only the NEWEST artifact's flags count (r11's old_flag is stale)
    assert bench._prior_drift_flags(str(tmp_path), 0.1) == {"spans"}


def test_prior_drift_flags_tolerate_absence_and_garbage(tmp_path):
    # no artifacts at all
    assert bench._prior_drift_flags(str(tmp_path), 0.1) == set()
    # newest artifact has no monotone_drift field (pre-r12 shape)
    _write(tmp_path, "BENCH_r10.json", {"sf": 0.1, "queries": {"q": 1.0}})
    assert bench._prior_drift_flags(str(tmp_path), 0.1) == set()
    # null field
    _write(tmp_path, "BENCH_r11.json",
           {"sf": 0.1, "queries": {"q": 1.0}, "monotone_drift": None})
    assert bench._prior_drift_flags(str(tmp_path), 0.1) == set()


def test_anchor_retry_is_strictly_tighter_than_flag():
    """r12's agg_q1 published +61% with zero in-run retries: the retry
    trigger equaled the 2.5x flag threshold, so every mover between
    1.5x and 2.5x sailed through unsampled. The retry trigger must sit
    strictly below the flag threshold and catch the 1.61x case."""
    assert bench.ANCHOR_RETRY_RATIO < bench.ANCHOR_FLAG_RATIO
    assert bench.ANCHOR_RETRY_RATIO <= 1.61 <= bench.ANCHOR_FLAG_RATIO


def test_calibrate_parallel_is_a_real_32_way_shuffle(spark):
    """The r13 parallel probe must actually exercise the shuffle path
    (32 input partitions -> exchange -> final aggregate) and return a
    positive wall time — otherwise it degenerates back into the
    single-reduce job that under-measured the parallel slow mode."""
    # the probe's plan: input RDD has 32 partitions and the aggregate
    # goes through an exchange
    df = (
        spark.range(0, 1_000, 1, 32)
        .selectExpr("id % 997 AS k", "id * 3 + 1 AS v")
        .groupBy("k").agg({"v": "sum"})
    )
    assert df.rdd.getNumPartitions() >= 1
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
    t = bench.calibrate_parallel(spark)
    assert isinstance(t, float) and t > 0


def test_loaded_run_classifier_reads_probe_bracket():
    # round-14 (VERDICT r13 item 2): classification from the artifact's
    # own parallel probes — min of the pre/post bracket vs the band
    assert bench._is_loaded_run(
        {"calibration_parallel_sec": 0.24, "calibration_parallel_pre_sec": 0.41}
    )
    # one quiet probe means the box had the fast mode during the run
    assert not bench._is_loaded_run(
        {"calibration_parallel_sec": 0.24, "calibration_parallel_pre_sec": 0.06}
    )
    # explicit marker wins even without probes
    assert bench._is_loaded_run({"loaded_run": True})
    # pre-r13 artifacts (no probes) classify quiet
    assert not bench._is_loaded_run({"calibration_sec": 0.05})


def test_load_anchors_skip_loaded_runs(tmp_path):
    # a loaded round's inflated medians must not become anchors: with a
    # quiet artifact available, only it contributes
    _write(tmp_path, "BENCH_r11.json",
           {"sf": 0.1, "queries": {"q": 0.35},
            "calibration_parallel_sec": 0.06,
            "calibration_parallel_pre_sec": 0.05})
    _write(tmp_path, "BENCH_r12.json",
           {"sf": 0.1, "queries": {"q": 0.36},
            "calibration_parallel_sec": 0.07,
            "calibration_parallel_pre_sec": 0.06})
    _write(tmp_path, "BENCH_r13.json",
           {"sf": 0.1, "queries": {"q": 0.56},
            "calibration_parallel_sec": 0.24,
            "calibration_parallel_pre_sec": 0.41})
    src, anchors = bench._load_anchors(str(tmp_path), 0.1)
    assert anchors == {"q": 0.355}
    assert "BENCH_r13.json" not in src


def test_load_anchors_fall_back_when_all_runs_loaded(tmp_path):
    # all-loaded history: a stale inflated anchor still beats none (the
    # retry/flag ratio needs a denominator); the source marks the fallback
    for n, v in [(12, 0.5), (13, 0.6)]:
        _write(tmp_path, f"BENCH_r{n}.json",
               {"sf": 0.1, "queries": {"q": v},
                "calibration_parallel_sec": 0.3,
                "calibration_parallel_pre_sec": 0.3})
    src, anchors = bench._load_anchors(str(tmp_path), 0.1)
    assert anchors == {"q": 0.55}
    assert "!loaded" in src


def test_load_history_keeps_loaded_runs(tmp_path):
    # drift detection reads the REAL series (mechanical response
    # adjudicates box state); only anchors exclude loaded rounds
    _write(tmp_path, "BENCH_r12.json",
           {"sf": 0.1, "queries": {"q": 1.0},
            "calibration_parallel_sec": 0.3,
            "calibration_parallel_pre_sec": 0.3})
    _write(tmp_path, "BENCH_r13.json", {"sf": 0.1, "queries": {"q": 1.2}})
    assert bench._load_history(str(tmp_path), 0.1) == {"q": [1.0, 1.2]}
