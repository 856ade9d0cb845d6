"""Adjudicate the r13 merger_left +54% cross-round drift with code.

VERDICT r13 next-round #2: merger_left published 0.361 s (r12) ->
0.557 s (r13), an all-time high against its 0.338-0.386 four-round
band, with ZERO code changes on the merger path (git diff
a277a27..HEAD touched only 7 operator files, none in this closure),
the plan still the broadcast join PLANS.md records, and the r13
parallel probe reading 0.24/0.41 s vs the ~0.05-0.07 quiet band —
i.e. the run was in the documented degraded-shuffle mode. This script
applies the agg_q1 adjudication protocol:

  1. PROVE arm equality mechanically: diff every file changed between
     the r12 driver commit and HEAD against merger_left's import
     closure (operators/merger.py + spec/dsl + the engine read path)
     and the query function itself (AST-extracted source of
     ``__spark_entry__._q_merger_left``); fail loudly on overlap.
  2. Run the measurement: R repeats of the exact bench row
     (merger_left at sf0.1 through the noop sink) bracketed by BOTH
     bench calibration jobs, so today's band can be placed against the
     published medians r10 0.338 / r11 0.386 / r12 0.361 / r13 0.557.

Usage: python scripts/merger_left_ab.py [sf_dir] [repeats]
Writes one JSON line; paste the verdict into SCALE.md.
"""
from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

R12_REF = "a277a27"  # round-12 driver commit (BENCH_r12 vintage)

# import closure of the bench row: the merger operator, the spec/dsl it
# compiles, and the read path Engine.read drives
CLOSURE = (
    "etl_cli_spark/operators/merger.py",
    "etl_cli_spark/engine.py",
    "etl_cli_spark/session.py",
    "etl_cli_spark/spec.py",
    "etl_cli_spark/sources/registry.py",
    "etl_cli_spark/sources/http_bulk.py",
    "etl_cli_spark/dsl.py",
    "etl_cli_spark/uri.py",
    "etl_cli_spark/schemas.py",
    "etl_cli_spark/settings.py",
    "etl_cli_spark/flatten.py",
    "etl_cli_spark/functions/registry.py",
)

FUNC_CLOSURE = (("__spark_entry__.py", "_q_merger_left"),)


def changed_since_ref() -> list[str]:
    out = subprocess.run(
        ["git", "diff", "--name-only", f"{R12_REF}..HEAD"],
        cwd=ROOT, capture_output=True, text=True, check=True,
    )
    return [f for f in out.stdout.splitlines() if f.strip()]


def _fn_source(ref: str, path: str, name: str) -> str | None:
    import ast

    src = subprocess.run(
        ["git", "show", f"{ref}:{path}"],
        cwd=ROOT, capture_output=True, text=True, check=True,
    ).stdout
    for node in ast.walk(ast.parse(src)):
        if isinstance(node, ast.FunctionDef) and node.name == name:
            return ast.get_source_segment(src, node)
    return None


def func_closure_diffs() -> list[str]:
    return [
        f"{path}::{name}"
        for path, name in FUNC_CLOSURE
        if _fn_source(R12_REF, path, name) != _fn_source("HEAD", path, name)
    ]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 9

    changed = changed_since_ref()
    overlap = sorted(set(changed) & set(CLOSURE)) + func_closure_diffs()
    if overlap:
        print(f"ARMS DIFFER — closure changed since {R12_REF}: {overlap}")
        print("fall back to the two-worktree alternating protocol")
        return 1

    from etl_cli_spark.engine import Engine
    from etl_cli_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="merger_left_ab")
    eng = Engine(spark, sf_dir)
    eng.read("orders").count()  # warm scans, as bench does
    eng.read("customer").count()

    def calibrate() -> float:
        best = -1.0
        for _ in range(3):
            c0 = time.perf_counter()
            spark.range(50_000_000).selectExpr("sum(id * 3 + 1) AS s").collect()
            dt = time.perf_counter() - c0
            best = dt if best < 0 else min(best, dt)
        return round(best, 3)

    def calibrate_parallel() -> float:
        best = -1.0
        for _ in range(3):
            c0 = time.perf_counter()
            (
                spark.range(0, 50_000_000, 1, 32)
                .selectExpr("id % 997 AS k", "id * 3 + 1 AS v")
                .groupBy("k").agg({"v": "sum"})
                .selectExpr("sum(`sum(v)`) AS s").collect()
            )
            dt = time.perf_counter() - c0
            best = dt if best < 0 else min(best, dt)
        return round(best, 3)

    cal_pre, cal_par_pre = calibrate(), calibrate_parallel()
    fn = entrymod.queries()["merger_left"]
    times: list[float] = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    cal_post, cal_par_post = calibrate(), calibrate_parallel()

    s = sorted(times)
    out = {
        "arms": "byte-identical (git-diff-proven)",
        "r12_ref": R12_REF,
        "changed_files_since_r12": len(changed),
        "closure_overlap": overlap,
        "sf_dir": sf_dir,
        "repeats": repeats,
        "times": times,
        "band_min": s[0],
        "median": s[len(s) // 2],
        "band_max": s[-1],
        "published": {"r10": 0.338, "r11": 0.386, "r12": 0.361, "r13": 0.557},
        "calibration_pre": cal_pre,
        "calibration_post": cal_post,
        "calibration_parallel_pre": cal_par_pre,
        "calibration_parallel_post": cal_par_post,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
