"""Scale sanity for the multimodal near-dup family: run image_neardup
over a corpus ~80x the oracle fixture (default 500 groups x 4 members
= 2000 real encoded images) and report wall time, pair counts, and the
plan's join shape. The fingerprint join must stay a banded equi-join —
the point of the pigeonhole design is that pair-finding cost tracks the
number of FINGERPRINTS, never pixels.

Usage: python scripts/neardup_scale_sanity.py [n_groups] [per_group]
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

    import numpy as np

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
    df = spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(32)
    build_s = round(time.perf_counter() - t0, 3)

    out = image_neardup(df, max_distance=6, chunks=8)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    t1 = time.perf_counter()
    pairs = out.collect()
    wall_s = round(time.perf_counter() - t1, 3)

    in_group = sum(1 for r in pairs if r.a_id // per_group == r.b_id // per_group)
    expected_in_group = n_groups * per_group * (per_group - 1) // 2
    print(json.dumps({
        "n_images": n_groups * per_group,
        "fixture_build_s": build_s,
        "neardup_wall_s": wall_s,
        "n_pairs": len(pairs),
        "in_group_pairs": in_group,
        "expected_in_group": expected_in_group,
        "cross_group_pairs": len(pairs) - in_group,
        "cartesian_in_plan": "CartesianProduct" in plan,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
