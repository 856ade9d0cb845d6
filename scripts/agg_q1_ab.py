"""Adjudicate the r12 agg_q1 +61% cross-round drift with code.

VERDICT r12 next-round #2: agg_q1 published 0.858 s (r11) -> 1.378 s
(r12) with zero aggregate-path code changes, alongside smaller
same-direction movers (weighted_sample +23%, ts_gap_fill +22%,
dsir_select +21%) — the signature of the documented session slow mode,
not a plan regression (PLANS.md shows the canonical scan -> partial
agg -> single exchange -> final agg both rounds). This script applies
the bpe_train adjudication protocol:

  1. PROVE arm equality mechanically: diff every file changed between
     the r11 driver commit and HEAD against agg_q1's import closure
     (operators/aggregate.py + the bench read path) and the query
     function itself (AST-extracted source of
     ``__spark_entry__._q_agg_q1``); fail loudly on overlap — if the
     timed region changed, a one-session A/B is the wrong tool.
  2. Run the measurement: R repeats of the exact bench row (agg_q1 at
     sf0.1 through the noop sink) bracketed by BOTH bench calibration
     jobs (single-reduce + the r13 32-way shuffle probe, since agg_q1
     IS shuffle-shaped), so today's band can be placed against the
     published medians r10 0.997 / r11 0.858 / r12 1.378 s.

Usage: python scripts/agg_q1_ab.py [sf_dir] [repeats]
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

R11_REF = "d940672"  # round-11 driver commit (BENCH_r11 vintage)

# import closure of the bench row: operators/aggregate.py and the read
# path Engine.read drives (registry/uri/dsl/schemas, session config)
CLOSURE = (
    "etl_cli_spark/operators/aggregate.py",
    "etl_cli_spark/engine.py",
    "etl_cli_spark/session.py",
    "etl_cli_spark/sources/registry.py",
    "etl_cli_spark/sources/http_bulk.py",
    "etl_cli_spark/dsl.py",
    "etl_cli_spark/uri.py",
    "etl_cli_spark/schemas.py",
    "etl_cli_spark/settings.py",
    "etl_cli_spark/flatten.py",
)

# files that changed for OTHER reasons but contribute only these
# functions to the timed region — pinned at function granularity
FUNC_CLOSURE = (("__spark_entry__.py", "_q_agg_q1"),)


def changed_since_r11() -> list[str]:
    out = subprocess.run(
        ["git", "diff", "--name-only", f"{R11_REF}..HEAD"],
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
        if _fn_source(R11_REF, path, name) != _fn_source("HEAD", path, name)
    ]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    changed = changed_since_r11()
    overlap = sorted(set(changed) & set(CLOSURE)) + func_closure_diffs()
    if overlap:
        print(f"ARMS DIFFER — closure changed since {R11_REF}: {overlap}")
        print("fall back to the two-worktree alternating protocol")
        return 1

    from etl_cli_spark.engine import Engine
    from etl_cli_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="agg_q1_ab")
    Engine(spark, sf_dir).read("lineitem").count()  # warm scan, as bench does

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
    fn = entrymod.queries()["agg_q1"]
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
        "r11_ref": R11_REF,
        "changed_files_since_r11": len(changed),
        "closure_overlap": overlap,
        "sf_dir": sf_dir,
        "repeats": repeats,
        "times": times,
        "band_min": s[0],
        "median": s[len(s) // 2],
        "band_max": s[-1],
        "published": {"r10": 0.997, "r11": 0.858, "r12": 1.378},
        "calibration_pre": cal_pre,
        "calibration_post": cal_post,
        "calibration_parallel_pre": cal_par_pre,
        "calibration_parallel_post": cal_par_post,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
