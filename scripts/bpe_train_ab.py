"""Adjudicate the r11 bpe_train +23% cross-round drift with code.

VERDICT r11 next-round #2 asked for a same-box r10-vs-r11 A/B (the
semantic_dedup_ab protocol). Step 0 of that protocol makes the two-arm
run degenerate: ``git diff f70bfef..HEAD`` over bpe_train's ENTIRE
import closure is empty — the r10 and HEAD arms are byte-identical, so
they compile the same plan and alternating them in one session would
measure the same code twice. This script therefore

  1. PROVES arm equality mechanically: diffs every changed file between
     the r10 tag and HEAD against the import closure of
     ``operators.bpe`` + the bench read path (engine/session/sources/
     dsl/uri/schemas/text) and fails loudly on overlap;
  2. runs the measurement anyway — R alternating repeats of the exact
     bench row (bpe_train, 30 merges, sf0.1 documents) bracketed by the
     bench's pure-CPU calibration job — so the published medians
     (r9 4.08 / r10 3.34 / r11 4.11 s) can be placed against today's
     box: if today's median sits at the r9/r11 level with calibration
     matching r11's 0.073 s, the r10 3.34 was the lucky-fast round and
     the "drift" is box throughput, not an engine slow mode.

Usage: python scripts/bpe_train_ab.py [sf_dir] [repeats]
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

R10_REF = "f70bfef"  # round-10 driver commit (BENCH_r10 vintage)

# import closure of the bench row: operators/bpe.py and everything the
# read path touches before it (Engine.read -> registry/uri/dsl/schemas,
# session config, operators/text.tokens)
CLOSURE = (
    "etl_cli_spark/operators/bpe.py",
    "etl_cli_spark/operators/text.py",
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

# files that changed since r10 for OTHER reasons but contribute only
# these functions to the timed region — pinned at function granularity
FUNC_CLOSURE = (
    ("__spark_entry__.py", "_q_bpe_train"),
    ("bench.py", "_bpe_train_1k"),
)


def changed_since_r10() -> list[str]:
    out = subprocess.run(
        ["git", "diff", "--name-only", f"{R10_REF}..HEAD"],
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
        if _fn_source(R10_REF, path, name) != _fn_source("HEAD", path, name)
    ]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    changed = changed_since_r10()
    overlap = sorted(set(changed) & set(CLOSURE)) + func_closure_diffs()
    if overlap:
        print(f"ARMS DIFFER — closure changed since {R10_REF}: {overlap}")
        print("fall back to the two-worktree alternating protocol")
        return 1

    from etl_cli_spark.engine import Engine
    from etl_cli_spark.operators.bpe import bpe_train
    from etl_cli_spark.session import get_spark

    spark = get_spark(app_name="bpe_train_ab")
    eng = Engine(spark, sf_dir)
    docs = eng.read("documents")
    docs.count()  # warm scan, as bench does

    def calibrate() -> float:
        best = -1.0
        for _ in range(3):
            c0 = time.perf_counter()
            spark.range(50_000_000).selectExpr("sum(id * 3 + 1) AS s").collect()
            dt = time.perf_counter() - c0
            best = dt if best < 0 else min(best, dt)
        return round(best, 3)

    cal_pre = calibrate()
    times: list[float] = []
    sigs: set[tuple] = set()
    for _ in range(repeats):
        t0 = time.perf_counter()
        merges = bpe_train(docs, n_merges=30, mode="spark")
        rows = merges.collect()
        times.append(round(time.perf_counter() - t0, 3))
        sigs.add(tuple(sorted(map(tuple, (r.asDict().items() for r in rows)))))
        spark.catalog.clearCache()
    cal_post = calibrate()

    s = sorted(times)
    out = {
        "arms": "byte-identical (git-diff-proven)",
        "r10_ref": R10_REF,
        "changed_files_since_r10": len(changed),
        "closure_overlap": overlap,
        "sf_dir": sf_dir,
        "repeats": repeats,
        "runs": times,
        "min": s[0], "med": s[len(s) // 2], "max": s[-1],
        "deterministic_output": len(sigs) == 1,
        "calibration_pre": cal_pre,
        "calibration_post": cal_post,
        "published": {"r9": 4.075, "r10": 3.343, "r11": 4.109},
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
