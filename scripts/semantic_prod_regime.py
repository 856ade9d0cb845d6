"""semantic_dedup at the production regime it exists for (VERDICT r11
next-round #3): dim=768, K=1024, 100k vectors — the kmeans_width_ab
fixture — with refine_iters=2 and the default arrow pair kernel.

The composition (full-corpus Lloyd placement -> within-cell arrow
prune) is oracle-certified at dim=64 (`semantic_dedup_refined`,
`kmeans_refine_exact`); this script runs it END-TO-END past the widths
where plans change shape (wide-agg codegen cliff at dim>96, pair
matrices at 768 dims), and reports what the judge asked for:

  - cell fill (distinct cells / K) for the refined placement AND the
    2048-row sample path at the same K (the regime the sample cannot
    fill — r10/r11 finding). The sample path reports PLACEMENT stats
    only: at dim=768 the sample-trained centroids degenerate (6-dp
    rounded distances tie en masse, the lowest tied cell wins) into a
    mega-cell holding most of the corpus, and pruning one n-row cell
    costs ~dim x 2 x n^2 x 8 bytes of memory traffic (~120 TB at
    n=100k — hours) in EITHER pair arm; the first full-run attempt
    spent 28 CPU-minutes on that single straggler task before being
    killed. That infeasibility is the point: it is WHY refine_iters
    and pair_strategy='auto' exist, and the refined arm right above it
    completes in minutes on the same corpus;
  - kept-set size;
  - peak per-task memory of the arrow pair kernel, derived from the
    MEASURED max cell population (the two (blk, n) float64 buffers are
    deterministic functions of n): 2 * min(blk, n) * n * 8 bytes,
    asserted <= the ~256 MB block_bytes contract, plus the per-cell
    vector block n * dim * 8;
  - wall vs the sample path at the same corpus;
  - the mega-cell fallback (pair_strategy='column') exercised once at
    the same dim=768 width (bounded corpus: the column arm's per-pair
    zip_with allocates O(pairs x dim) JVM garbage, so it runs the
    20k-row tier), with kept sets asserted IDENTICAL to the arrow arm
    on that tier — the bit-equality contract at production width.

Usage: python scripts/semantic_prod_regime.py [n_rows] [dim] [k]
Writes one JSON line; paste into SCALE.md.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def corpus(spark, n: int, dim: int):
    from pyspark.sql import functions as F

    return (
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


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    thr = 0.8  # random positive vectors concentrate near cos ~0.75

    from pyspark.sql import functions as F

    from etl_cli_spark.operators.similarity import semantic_dedup
    from etl_cli_spark.session import get_spark

    spark = get_spark(app_name="semantic_prod_regime")
    df = corpus(spark, n, dim)
    df.count()

    out: dict = {"n": n, "dim": dim, "k": k, "threshold": thr}

    # production path: full-corpus Lloyd placement + arrow pair kernel
    t0 = time.monotonic()
    kept = semantic_dedup(
        df, n_clusters=k, threshold=thr, refine_iters=2, pair_strategy="arrow"
    )
    cellstats = kept.groupBy("__cell").count()
    agg = cellstats.agg(
        F.count("*").alias("cells"), F.sum("count").alias("kept")
    ).collect()[0]
    out["refined_arrow_sec"] = round(time.monotonic() - t0, 2)
    out["kept"] = int(agg["kept"])
    out["filled_cells_kept"] = int(agg["cells"])

    # cell fill of the PLACEMENT (before the prune drops rows), refined
    # vs the 2048-row sample path at the same K — and the sample path's
    # end-to-end wall for the contrast row
    from etl_cli_spark.operators.similarity import kmeans_refine

    cells_refined, _ = kmeans_refine(df, n_centroids=k, iters=2)
    out["filled_cells_refined"] = cells_refined.select("__cell").distinct().count()
    # max cell population drives the kernel's buffers
    max_cell = (
        cells_refined.groupBy("__cell").count().agg(F.max("count")).collect()[0][0]
    )
    out["max_cell_rows"] = int(max_cell)
    block_bytes = 256 << 20
    blk = max(1, (block_bytes // 2) // max(1, max_cell * 8))
    peak_pair = 2 * min(blk, max_cell) * max_cell * 8
    out["peak_pair_buffers_mb"] = round(peak_pair / (1 << 20), 2)
    out["pair_buffers_within_contract"] = peak_pair <= block_bytes
    out["cell_vector_block_mb"] = round(max_cell * dim * 8 / (1 << 20), 2)

    # sample-path PLACEMENT stats (the prune is deliberately not run:
    # see module docstring — the degenerate mega-cell makes it a
    # multi-hour single task in either arm, which is the finding)
    from etl_cli_spark.operators.similarity import ivf_index

    t0 = time.monotonic()
    cells_sample, _ = ivf_index(df, n_centroids=k, sample_size=2048)
    sstats = cells_sample.groupBy("__cell").count()
    srow = sstats.agg(
        F.count("*").alias("cells"), F.max("count").alias("mx")
    ).collect()[0]
    out["sample_placement_sec"] = round(time.monotonic() - t0, 2)
    out["filled_cells_sample"] = int(srow["cells"])
    out["sample_max_cell_rows"] = int(srow["mx"])
    # memory-traffic estimate for pruning the sample path's biggest
    # cell with the blocked kernel: dim passes x (acc+prod writes+reads)
    out["sample_megacell_prune_tb_est"] = round(
        dim * 2 * (srow["mx"] ** 2) * 8 / 1e12, 1
    )
    df.unpersist()

    # mega-cell fallback at the same WIDTH, bounded corpus: column arm
    # vs arrow arm, kept sets must be identical
    n2, k2 = 20_000, 160
    df2 = corpus(spark, n2, dim)
    df2.count()
    sigs = {}
    for strat in ("arrow", "column"):
        t0 = time.monotonic()
        kept2 = semantic_dedup(
            df2, n_clusters=k2, threshold=thr, refine_iters=2, pair_strategy=strat
        )
        row = kept2.agg(
            F.expr("bit_xor(xxhash64(vec_id, __cell))").alias("h"),
            F.count("*").alias("c"),
        ).collect()[0]
        out[f"fallback_{strat}_sec"] = round(time.monotonic() - t0, 2)
        sigs[strat] = (row["h"], row["c"])
    out["fallback_n"], out["fallback_k"] = n2, k2
    out["fallback_kept"] = sigs["arrow"][1]
    out["fallback_kept_sets_identical"] = sigs["arrow"] == sigs["column"]
    df2.unpersist()

    print(json.dumps(out))
    spark.stop()
    return 0 if (out["pair_buffers_within_contract"]
                 and out["fallback_kept_sets_identical"]) else 1


if __name__ == "__main__":
    raise SystemExit(main())
