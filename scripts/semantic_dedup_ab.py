"""A/B: semantic_dedup pair strategies at the sf1 bench tier.

VERDICT r10 "what's wrong #3": semantic_dedup is the least-stable bench
row (documented up-to-~1.9x run-to-run variance, adjudicated — but not
proven — to JVM GC pressure from the per-pair ``zip_with`` dot's
O(pairs x dim) array garbage). This script settles it with code:

  column — the shipped per-pair zip_with dot (JVM, whole-stage codegen,
           one zipped array allocated per candidate pair)
  arrow  — per-cell applyInPandas kernel: pairwise dot matrix built as
           per-dimension outer products in index order (bit-identical
           raw dots), near-threshold candidates emitted, round-6
           HALF_UP filter left in Spark columns

Each arm runs R times in ONE JVM session (alternating, so box drift
hits both arms equally); kept sets are asserted identical every run.
Reports per-arm min/median/max — the spread IS the variance claim.

Usage: python scripts/semantic_dedup_ab.py [sf_dir] [repeats]
Writes one JSON line; paste into SCALE.md (pair-strategy section).
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from etl_cli_spark.engine import Engine
    from etl_cli_spark.operators.similarity import semantic_dedup
    from etl_cli_spark.session import get_spark

    spark = get_spark(app_name="semantic_dedup_ab")
    eng = Engine(spark, sf_dir)
    emb = eng.read("embeddings")
    n_rows = emb.count()  # also warms the scan
    n_clusters = max(16, n_rows // 128)  # bench-tier adaptive sizing

    times: dict[str, list[float]] = {"column": [], "arrow": []}
    kept_hash: dict[str, int] = {}
    for r in range(repeats):
        for strat in ("column", "arrow"):
            t0 = time.monotonic()
            kept = semantic_dedup(
                emb, n_clusters=n_clusters, threshold=0.4, pair_strategy=strat
            )
            h = (
                # xor-fold: order-independent and overflow-free under ANSI
                kept.select(
                    F.expr("bit_xor(xxhash64(vec_id, __cell))").alias("h"),
                    F.count("*").alias("c"),
                ).collect()[0]
            )
            times[strat].append(round(time.monotonic() - t0, 2))
            sig = (h["h"], h["c"])
            if strat in kept_hash:
                assert kept_hash[strat] == sig, f"{strat} unstable across runs"
            kept_hash[strat] = sig
    assert kept_hash["column"] == kept_hash["arrow"], (
        f"kept sets differ: {kept_hash}"
    )

    def stats(ts: list[float]) -> dict:
        s = sorted(ts)
        return {"min": s[0], "med": s[len(s) // 2], "max": s[-1], "runs": ts}

    out = {
        "sf_dir": sf_dir,
        "n_rows": n_rows,
        "n_clusters": n_clusters,
        "repeats": repeats,
        "kept_rows": kept_hash["column"][1],
        "kept_identical": True,
        "column": stats(times["column"]),
        "arrow": stats(times["arrow"]),
        "speedup_arrow_med": round(
            stats(times["column"])["med"] / max(stats(times["arrow"])["med"], 1e-9), 2
        ),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
