"""Incremental-vs-full A/B for the persisted media-fingerprint index.

The index's reason to exist: an image-text corpus refreshes
incrementally, and re-decoding + re-banding the full history every
crawl drop is the full-corpus pass the text side already refuses to
run. This harness measures that directly at a scale where decode
dominates:

  arm FULL:    image_neardup over history ∪ batch (what a pipeline
               without the index must run every drop)
  arm INDEXED: media_neardup_indexed(batch) against the pre-built
               index (what the pipeline runs with it)

Both arms see the same corpus; the indexed arm's wall EXCLUDES the
one-time index build (reported separately — it amortizes over drops).
Cross-pair parity is asserted: the indexed probe must return exactly
the FULL arm's (new, old) pairs restricted to batch x history.

Usage: python scripts/media_index_scale.py [n_groups] [per_group] [batch_groups] [px_scale]
``px_scale`` multiplies the fixture dims (default 8 -> ~128x96
images): the oracle fixture's 16x12 thumbnails decode in microseconds,
which hides the decode term the index exists to amortize. Payloads are
PNG (real zlib inflate per decode) — BMP is a memcpy and shows no
decode term at all.
Writes one JSON line; paste readings into SCALE.md.
"""
from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> int:
    n_groups = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    per_group = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    batch_groups = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    px_scale = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    from pyspark.sql import functions as F

    from etl_cli_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        build_media_index,
        encode_png,
        image_neardup,
        media_neardup_indexed,
        neardup_dims,
        neardup_pixels,
    )
    from etl_cli_spark.session import get_spark

    spark = get_spark(app_name="media_index_scale")

    def rows_for(groups, members, id_base):
        rows = []
        for gi, g in enumerate(groups):
            w, h = neardup_dims(g)
            w, h = w * px_scale, h * px_scale
            for mi, m in enumerate(members):
                px = neardup_pixels(g, m, w, h)
                rows.append(
                    (id_base + gi * len(members) + mi, "image",
                     bytearray(encode_png(px)), (w, h, None, None, "png"))
                )
        return rows

    d = tempfile.mkdtemp(prefix="media_idx_scale_")
    hist_rows = rows_for(range(n_groups), range(per_group), 0)
    spark.createDataFrame(hist_rows, MEDIA_SCHEMA).repartition(32).write.parquet(
        f"{d}/hist"
    )
    # batch: one NEW member (m = per_group) of the first batch_groups
    batch_rows = rows_for(range(batch_groups), (per_group,), 1_000_000)
    spark.createDataFrame(batch_rows, MEDIA_SCHEMA).repartition(8).write.parquet(
        f"{d}/batch"
    )
    hist = spark.read.parquet(f"{d}/hist")
    batch = spark.read.parquet(f"{d}/batch")

    t0 = time.perf_counter()
    build_media_index(hist, f"{d}/idx", chunks=8, n_parts=64)
    build_s = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    full_pairs = image_neardup(
        hist.unionByName(batch), max_distance=6, chunks=8
    )
    full_cross = sorted(
        (r.b_id, r.a_id) for r in full_pairs.filter(
            (F.col("b_id") >= 1_000_000) & (F.col("a_id") < 1_000_000)
        ).collect()
    )
    full_s = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    idx_pairs = sorted(
        (r.new_id, r.old_id)
        for r in media_neardup_indexed(batch, f"{d}/idx", max_distance=6).collect()
    )
    indexed_s = round(time.perf_counter() - t0, 3)

    print(json.dumps({
        "history_images": len(hist_rows),
        "batch_images": len(batch_rows),
        "index_build_s": build_s,
        "full_rerun_s": full_s,
        "indexed_probe_s": indexed_s,
        "speedup": round(full_s / max(indexed_s, 1e-9), 1),
        "cross_pairs": len(idx_pairs),
        "parity": idx_pairs == full_cross,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
