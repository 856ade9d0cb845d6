"""sf1 measurement: semantic_dedup sample-placed cells (refine_iters=0)
vs full-corpus-refined cells (refine_iters=2) — VERDICT r10 item #6.

The refined path exists for the web-scale regime where a bounded
driver sample cannot fill (let alone place) the paper's ~100k cells;
this records what refinement buys at a tier we CAN run: wall time,
cell fill, cluster balance (max/mean cell size — the within-cell pair
work is O(sum cell^2), so balance is the scale knob), and kept-set
size. Not a correctness gate (the two placements are different
clusterings by design; each path's correctness is oracle-pinned
separately), but the numbers belong in SCALE.md.

Usage: python scripts/semantic_refine_ab.py [sf_dir] [refine_iters]
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    refine_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pyspark.sql import functions as F

    from etl_cli_spark.engine import Engine
    from etl_cli_spark.operators.similarity import semantic_dedup
    from etl_cli_spark.session import get_spark

    spark = get_spark(app_name="semantic_refine_ab")
    eng = Engine(spark, sf_dir)
    emb = eng.read("embeddings")
    n_rows = emb.count()
    n_clusters = max(16, n_rows // 128)

    from etl_cli_spark.operators.similarity import ivf_index, kmeans_refine

    out: dict = {"sf_dir": sf_dir, "n_rows": n_rows, "n_clusters": n_clusters}
    for label, iters in (("sample", 0), (f"refine{refine_iters}", refine_iters)):
        # balance stats over the FULL assignment (pair work is
        # O(sum cell^2) — balance, not the kept set, is the scale knob)
        if iters:
            assigned, _ = kmeans_refine(emb, n_centroids=n_clusters, iters=iters)
        else:
            assigned, _ = ivf_index(emb, n_centroids=n_clusters, sample_size=2048)
        stats = (
            assigned.groupBy("__cell")
            .count()
            .agg(
                F.count("*").alias("filled"),
                F.max("count").alias("max_cell"),
                F.avg("count").alias("mean_cell"),
            )
            .collect()[0]
        )
        t0 = time.monotonic()
        kept = semantic_dedup(
            emb, n_clusters=n_clusters, threshold=0.4, refine_iters=iters
        )
        n_kept = kept.count()
        out[label] = {
            "sec": round(time.monotonic() - t0, 2),
            "kept": n_kept,
            "filled_cells": stats["filled"],
            "fill_pct": round(100.0 * stats["filled"] / n_clusters, 1),
            "max_cell": stats["max_cell"],
            "mean_cell": round(float(stats["mean_cell"]), 1),
        }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
