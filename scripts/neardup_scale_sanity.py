"""Scale sanity for the multimodal near-dup family: run image_neardup
over a corpus ~80x the oracle fixture (default 500 groups x 4 members
= 2000 real encoded images) and report wall time, pair counts, and the
plan's join shape. The fingerprint join must stay a banded equi-join —
the point of the pigeonhole design is that pair-finding cost tracks the
number of FINGERPRINTS, never pixels.

Round 14: optional planted HOT CLASS — ``n_blank`` solid-color images
(every one dHashes to the SAME all-zero fingerprint, the real-crawl
blank-image degenerate key) and ``max_bucket_size`` to engage the
fingerprint_pairs guard. Guard off, the hot class forces an
O(n_blank^2/2) pair blow-up; guard on, it collapses to an O(n_blank)
star around the min-id rep with identical connectivity. This is the
SCALE.md A/B the round-13 verdict asked for.

Usage: python scripts/neardup_scale_sanity.py [n_groups] [per_group] [n_blank] [cap]
  cap = 0 means no guard (exact clique semantics).
Writes one JSON line; paste readings into SCALE.md.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> int:
    n_groups = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    per_group = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_blank = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    cap = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    import numpy as np
    from pyspark.sql import functions as F

    from etl_cli_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        image_neardup,
        neardup_dims,
        neardup_pixels,
    )
    from etl_cli_spark.session import get_spark

    spark = get_spark(app_name="neardup_scale_sanity")

    t0 = time.perf_counter()
    rows = []
    for g in range(n_groups):
        w, h = neardup_dims(g)
        for m in range(per_group):
            px = neardup_pixels(g, m, w, h)
            rows.append(
                (g * per_group + m, "image", bytearray(encode_bmp(px)),
                 (w, h, None, None, "bmp"))
            )
    n_clean = n_groups * per_group
    if n_blank:
        # one solid-color payload reused: every blank dHashes to the
        # all-zero fingerprint — the canonical crawl hot class
        blank = bytearray(encode_bmp(np.full((12, 16, 3), 200, dtype=np.uint8)))
        rows += [
            (n_clean + j, "image", blank, (16, 12, None, None, "bmp"))
            for j in range(n_blank)
        ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(32)
    build_s = round(time.perf_counter() - t0, 3)

    out = image_neardup(
        df, max_distance=6, chunks=8, max_bucket_size=cap or None
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    t1 = time.perf_counter()
    # counts, not collect: the unguarded hot-class arm is O(n_blank^2)
    n_pairs = out.count()
    in_group = out.filter(
        F.expr(
            f"a_id < {n_clean} AND b_id < {n_clean} "
            f"AND a_id div {per_group} = b_id div {per_group}"
        )
    ).count()
    blank_pairs = out.filter(
        F.expr(f"a_id >= {n_clean} OR b_id >= {n_clean}")
    ).count()
    wall_s = round(time.perf_counter() - t1, 3)

    expected_in_group = n_groups * per_group * (per_group - 1) // 2
    print(json.dumps({
        "n_images": n_clean + n_blank,
        "n_blank": n_blank,
        "max_bucket_size": cap or None,
        "fixture_build_s": build_s,
        "neardup_wall_s": wall_s,
        "n_pairs": n_pairs,
        "in_group_pairs": in_group,
        "expected_in_group": expected_in_group,
        "blank_class_pairs": blank_pairs,
        "expected_blank_star": max(n_blank - 1, 0),
        "expected_blank_clique": n_blank * (n_blank - 1) // 2,
        "cartesian_in_plan": "CartesianProduct" in plan,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
