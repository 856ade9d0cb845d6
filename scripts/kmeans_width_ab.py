"""A/B: kmeans_refine mean strategies at PRODUCTION embedding width.

VERDICT r10 "what's wrong #1": the operator exists for the web-scale
regime (Abbas et al. 2023 SemDeDup: ~100k clusters over billion-vector
corpora at dim 768+) but had only ever run at the fixture's dim=64.
This script runs the sf1-scale protocol at dim=768 / K=1024 / 100k
vectors and times, per Lloyd iteration:

  wide  — one avg(element_at(vec, d)) aggregate column per dimension
          (768 generated agg fields: past spark.sql.codegen.maxFields
          = 100, so the wide agg runs INTERPRETED, not codegen'd)
  long  — posexplode(vec) -> groupBy(__cell, __pos).avg (narrow 2-key
          aggregate, stays in whole-stage codegen; the exchange is
          map-side-combined to <= K x dim rows per task)

and checks the two centroid sets are IDENTICAL after the protocol's
9-dp rounding (the two plans sum in different orders; the rounding is
what the cross-engine replay contract already relies on — a mismatch
here would be the documented residual boundary risk materializing).

Vectors are a pure function of (vec_id, dim) via xxhash64 so the run
is deterministic and generated JVM-side (no driver materialization).

Usage: python scripts/kmeans_width_ab.py [n_rows] [dim] [k] [iters]
Writes one JSON line; paste the numbers into SCALE.md.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    from pyspark.sql import functions as F

    from etl_cli_spark.operators.similarity import kmeans_refine
    from etl_cli_spark.session import get_spark

    spark = get_spark(app_name="kmeans_width_ab")
    # deterministic synthetic corpus: element d of row i is
    # pmod(xxhash64(i, d), 1000)/1000 — dyad-free but replayable
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda d: (
                    F.pmod(F.xxhash64(F.col("id"), d), F.lit(1000)) / F.lit(1000.0)
                ).cast("double"),
            ).alias("embedding"),
        )
        .repartition(32)
        .persist()
    )
    df.count()  # materialize once so both arms read the same cached input

    out: dict = {"n": n, "dim": dim, "k": k, "iters": iters}
    cents: dict[str, list] = {}
    for strat in ("long", "wide"):
        t0 = time.monotonic()
        cells, cent = kmeans_refine(
            df, n_centroids=k, iters=iters, mean_strategy=strat
        )
        n_cells = cells.select("__cell").distinct().count()
        out[f"{strat}_sec"] = round(time.monotonic() - t0, 2)
        out[f"{strat}_filled_cells"] = n_cells
        cents[strat] = cent
    out["centroids_identical"] = cents["long"] == cents["wide"]
    out["speedup_long_over_wide"] = (
        round(out["wide_sec"] / out["long_sec"], 2) if out["long_sec"] else None
    )
    print(json.dumps(out))
    df.unpersist()
    spark.stop()
    return 0 if out["centroids_identical"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
